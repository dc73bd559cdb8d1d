package graft

import graft.classify.IssueClassifier
import graft.functions.MultiMatch
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MultiMatch custom Expression: equivalence with the built-in 14-rlike
  * classifier, codegen path, and SQL registration via
  * SparkSessionExtensions.
  */
class MultiMatchSpec extends SparkSuite {

  private val fixtures = Seq(
    "Read timed out after 5000ms", // timeout
    "java.lang.OutOfMemoryError: Java heap space", // oom
    "coordinator timeout while handling request", // timeout + coordinator
    "heap pressure detected at 92%", // heap (warning)
    "slow query detected: SELECT * FROM ks.t", // slow_query
    "nothing interesting here", // none
    "GC pause of 1200ms exceeded threshold; dropped 42 messages") // gc+dropped

  test("issueMask bit i == rlike(pattern i) for every fixture and pattern") {
    import spark.implicits._
    val df = fixtures.toDF("msg")
    val maskCol = MultiMatch.issueMask(col("msg"))
    val rlikes = IssueClassifier.allPatterns.zipWithIndex.map {
      case ((_, _, p), i) => col("msg").rlike(p).as(s"r$i")
    }
    val rows = df.select((maskCol.as("mask") +: rlikes): _*).collect()
    rows.foreach { r =>
      val mask = r.getAs[Long]("mask")
      IssueClassifier.allPatterns.indices.foreach { i =>
        assert(((mask >> i) & 1L) === (if (r.getAs[Boolean](s"r$i")) 1L else 0L))
      }
    }
  }

  test("MultiMatch.issues ≡ IssueClassifier.issues on the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      IssueClassifier.issues(col("text")).as("a"),
      MultiMatch.issues(col("text")).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() === 0)
  }

  test("anyError / anyWarning agree with the rlike reductions") {
    import spark.implicits._
    val df = fixtures.toDF("msg")
    val diff = df.where(
      MultiMatch.anyError(col("msg")) =!=
        IssueClassifier.matchesAnyError(col("msg")) ||
        MultiMatch.anyWarning(col("msg")) =!=
          IssueClassifier.matchesAnyWarning(col("msg")))
    assert(diff.count() === 0)
  }

  test("expression works under whole-stage codegen AND interpreted eval") {
    import spark.implicits._
    val df = fixtures.toDF("msg")
    def masks(codegen: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(MultiMatch.issueMask(col("msg"))).collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(masks("CODEGEN_ONLY") === masks("NO_CODEGEN"))
  }

  test("SQL registration through SparkSessionExtensions") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = s2.sql(
        """SELECT multi_match('Read timed out', '(?i)timed out', 'nope') AS m,
          |       issue_mask('Read timed out after 5000ms') AS im""".stripMargin)
        .head()
      assert(row.getAs[Long]("m") === 1L)
      assert((row.getAs[Long]("im") & 1L) === 1L) // bit 0 = timeout
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
