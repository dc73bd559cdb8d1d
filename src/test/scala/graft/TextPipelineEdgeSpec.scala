package graft

import org.apache.spark.sql.functions._

/** Edge cases for the round-5 text-pipeline expressions, asserted
  * against hand-computed values on inline frames (the oracle gate
  * covers the corpus; these pin the boundary behaviors the corpus
  * doesn't exercise).
  */
class TextPipelineEdgeSpec extends SparkSuite {

  import spark.implicits._

  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  test("PII regexes: multiple hits, string boundaries, adjacency") {
    val df = Seq(
      "a@b.co x@y.org",            // two emails, one at each boundary
      "1.2.3.4",                   // bare IP
      "v1.2.3.4x",                 // letters flank the digits: no \b transition, must NOT match
      "mail me: u@d.com at 10.0.0.1", // email then ip
      "no pii here").toDF("t")
    val out = df.select(
      regexp_count(col("t"), lit(emailRe)).as("e"),
      regexp_count(col("t"), lit(ipRe)).as("i"),
      regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
        ipRe, "<IP>").as("red"))
      .collect()
    assert(out(0).getInt(0) === 2)
    assert(out(0).getString(2) === "<EMAIL> <EMAIL>")
    assert(out(1).getInt(1) === 1)
    assert(out(1).getString(2) === "<IP>")
    // letters and digits are both word chars: v|1 and 4|x are not
    // \b transitions, so the embedded dotted-quad must not match
    assert(out(2).getInt(1) === 0)
    assert(out(3).getString(2) === "mail me: <EMAIL> at <IP>")
    assert(out(4).getString(2) === "no pii here")
  }

  test("repetition profile: single word, all-same, empty tokens") {
    val df = Seq((1L, "only"), (2L, "x x x x"), (3L, "a  b")).toDF("doc_id", "text")
    val words = df.select(col("doc_id"),
      explode(filter(split(col("text"), " "), w => w =!= "")).as("word"))
    val prof = words.groupBy("doc_id", "word").agg(count(lit(1)).as("f"))
      .groupBy("doc_id")
      .agg(sum(col("f")).as("n"), count(lit(1)).as("d"), max(col("f")).as("m"))
      .orderBy("doc_id").collect()
    assert(prof(0).getLong(1) === 1 && prof(0).getLong(3) === 1)
    assert(prof(1).getLong(1) === 4 && prof(1).getLong(2) === 1 && prof(1).getLong(3) === 4)
    assert(prof(2).getLong(1) === 2 && prof(2).getLong(2) === 2) // double space dropped
  }

  test("sequence packing: exact-budget doc starts its own bin boundary correctly") {
    // budget 4; tokens per doc: 3, 1, 4, 2 -> cum 3,4,8,10;
    // bin = (cum - toks) div 4 -> 0, 0, 1, 2
    val df = Seq((0L, 3L), (1L, 1L), (2L, 4L), (3L, 2L)).toDF("doc_id", "toks")
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val bins = df.withColumn("cum", sum(col("toks")).over(w))
      .select(col("doc_id"), ((col("cum") - col("toks")) / 4).cast("long").as("bin"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(bins === Seq(0L, 0L, 1L, 2L))
  }
}
