package graft

import graft.classify.IssueClassifier
import org.apache.spark.sql.functions._

/** CollapseRLikeOrChains optimizer rule: fires on >= 4 same-input rlike
  * disjunctions (the classifier shape), leaves smaller/mixed predicates
  * alone, and never changes results. The shared test session installs
  * GraftExtensions, so `optimizedPlan` shows the rewrite directly.
  */
class CollapseRLikeSpec extends SparkSuite {

  private def errorChain = IssueClassifier.matchesAnyError(col("m")) // 10 rlikes
  private def twoChain = col("m").rlike("a+") || col("m").rlike("b+")

  /** Parquet-backed so ConvertToLocalRelation cannot pre-evaluate the
    * filter before the plan is inspectable.
    */
  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("text").as("m"))

  private lazy val df = {
    import spark.implicits._
    Seq("Read timed out after 5000ms", "nothing", "GC pause of 1ms exceeded x",
      null.asInstanceOf[String]).toDF("m")
  }

  test("10-pattern rlike OR-chain is rewritten to one multi_match") {
    val plan = docs.where(errorChain).queryExecution.optimizedPlan
    val s = plan.toString
    assert(s.contains("multi_match"), s"expected multi_match in:\n$s")
    assert(!s.contains("RLIKE"), s"expected no residual RLIKE in:\n$s")
  }

  test("2-pattern chains are left untouched") {
    val s = docs.where(twoChain).queryExecution.optimizedPlan.toString
    assert(!s.contains("multi_match"))
  }

  test("mixed predicates: rlike sub-chain collapses, outer OR survives") {
    val mixed = errorChain || col("m").isNull
    val s = docs.where(mixed).queryExecution.optimizedPlan.toString
    assert(s.contains("multi_match") && s.contains("isnull"),
      s"expected collapsed sub-chain plus isnull in:\n$s")
    // result parity vs per-pattern evaluation (no Or-chain, rule idle)
    val expected = (IssueClassifier.errorPatterns.map { case (_, p) =>
      docs.where(col("m").rlike(p))
    } :+ docs.where(col("m").isNull)).reduce(_ unionByName _).distinct().count()
    assert(docs.where(mixed).count() === expected)
  }

  test("rewrite preserves results (incl. null input) vs per-pattern evaluation") {
    // evaluate each rlike separately (no Or-chain => rule can't fire)
    val perPattern = IssueClassifier.errorPatterns.map { case (_, p) =>
      df.select(col("m")).where(col("m").rlike(p))
    }.reduce(_ unionByName _).distinct().collect().map(_.getString(0)).toSet
    val chained = df.where(errorChain).collect().map(_.getString(0)).toSet
    assert(chained === perPattern)
  }
}
