package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting can't apply (e.g. the skew is in a broadcast-
  * ineligible build side, or the runtime is pinned to static planning).
  *
  * Shape: the PROBE side gets a random-but-deterministic salt in
  * [0, factor); the BUILD side is replicated `factor` times with every
  * salt value; the join key becomes (key, salt). A key holding p% of
  * the probe rows now spreads over `factor` reducers instead of one —
  * at 1000 executors this is the difference between one straggler task
  * and an even stage.
  *
  * The salt is `pmod(hash(probe-row id cols), factor)` — deterministic
  * given the row, so retries/speculative tasks stay consistent (no
  * rand(), which breaks retry idempotence).
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with the RIGHT side
    * replicated. `saltOn` must deterministically vary within a key
    * group on the left (e.g. the left table's primary key columns).
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltOn: Seq[String],
      factor: Int = 8): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val salted = left.withColumn("__salt",
      pmod(hash(saltOn.map(col): _*), lit(factor)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skewed-key aggregation: two-phase count/sum split — partial agg on
    * (key, salt), final agg on key. Spark's hash aggregate already does
    * partial/final map-side combine for plain aggregates; this helper is
    * for HEAVY per-group state (e.g. collect_set-like work) where the
    * first phase must also spread one hot key over many reducers.
    */
  def twoPhaseCount(
      df: DataFrame,
      key: String,
      saltOn: Seq[String],
      factor: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(hash(saltOn.map(col): _*), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))

  /** The skew diagnostic: per-key row share of the top keys. */
  def keySkew(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / total)
      .orderBy(desc("n"))
      .limit(topK)
  }
}
