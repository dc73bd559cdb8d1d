package graft

import graft.ext.SkewJoin
import org.apache.spark.sql.functions._

/** Salted skew join: result parity with the plain join, salt spread,
  * and two-phase aggregation equivalence on a deliberately skewed key
  * distribution (90% of rows on one key).
  */
class SkewJoinSpec extends SparkSuite {

  private lazy val skewed = {
    import spark.implicits._
    // key 0 holds 90% of rows; ids vary within the key group
    (1 to 2000).map(i => (if (i % 10 == 0) i % 7 + 1 else 0, i.toLong))
      .toDF("k", "id")
  }

  private lazy val dim = {
    import spark.implicits._
    (0 to 7).map(k => (k, s"name$k")).toDF("k", "name")
  }

  test("saltedInnerJoin == plain inner join") {
    val plain = skewed.join(dim, "k")
      .select("k", "id", "name").orderBy("id").collect()
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "k", Seq("id"))
      .select("k", "id", "name").orderBy("id").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("salt spreads the hot key over the full factor range") {
    val spread = skewed
      .withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .where(col("k") === 0)
      .select("__salt").distinct().count()
    assert(spread === 8)
  }

  test("twoPhaseCount == plain groupBy count") {
    val plain = skewed.groupBy("k").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val two = SkewJoin.twoPhaseCount(skewed, "k", Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(two === plain)
  }

  test("keySkew surfaces the hot key first") {
    val top = SkewJoin.keySkew(skewed, "k").head()
    assert(top.getInt(0) === 0)
    assert(top.getAs[Double]("share") > 0.8)
  }
}
