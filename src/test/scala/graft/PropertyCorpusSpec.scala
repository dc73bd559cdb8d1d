package graft

import graft.analyze.ClusterAnalyzer
import graft.classify.IssueClassifier
import graft.parse.LogLineParser
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based corpus tests (SURVEY.md §5.2): generated log entries
  * exercised in one Spark pass per property (deterministic seed — the
  * generators drive data volume, Spark evaluates the property over the
  * whole generated relation at once).
  */
class PropertyCorpusSpec extends SparkSuite {

  private val seed = rng.Seed(42L)

  private def sample[T](g: Gen[Seq[T]]): Seq[T] =
    g.apply(Gen.Parameters.default, seed)
      .getOrElse(sys.error("generator failed"))

  // --- generators -----------------------------------------------------
  private val levelGen = Gen.oneOf("INFO", "WARN", "ERROR", "DEBUG", "TRACE")
  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val threadGen = for {
    n <- Gen.oneOf("ReadStage", "MutationStage", "GossipStage", "CompactionExecutor")
    i <- Gen.choose(0, 32)
  } yield s"$n-$i"
  private val clazzGen = Gen.oneOf(
    "org.apache.cassandra.db.ReadCommand", "o.a.c.HeapUtils",
    "org.apache.cassandra.net.MessagingService", "StatusLogger")
  private val fragmentGen = Gen.oneOf(
    "Read timed out after 5000ms", "java.lang.OutOfMemoryError: heap",
    "GC pause of 900ms exceeded threshold", "scanned 10000 tombstones warning",
    "dropped 7 mutation messages", "heap pressure detected",
    "slow query detected", "batch too large", "all good here",
    "streaming session failed", "connection to peer refused")
  private val msgGen = for {
    pre <- Gen.listOfN(3, wordGen)
    frag <- fragmentGen
  } yield (pre :+ frag).mkString(" ")

  private case class Entry(level: String, ts: String, thread: String,
      clazz: String, line: Int, message: String) {
    def format: String = s"$level [$ts] [$thread] $clazz:$line - $message"
  }

  private val entryGen = for {
    level <- levelGen
    s <- Gen.choose(0, 59)
    ms <- Gen.choose(0, 999)
    thread <- threadGen
    clazz <- clazzGen
    line <- Gen.choose(1, 9999)
    msg <- msgGen
  } yield Entry(level, f"2026-05-14 10:23:$s%02d,$ms%03d", thread, clazz, line, msg)

  // --- properties -----------------------------------------------------

  test("round-trip: parse(format(entry)) recovers every field (200 entries)") {
    import spark.implicits._
    val entries = sample(Gen.listOfN(200, entryGen))
    val df = entries.map(e =>
      (e.level, e.ts, e.thread, e.clazz, e.line.toString, e.message, e.format))
      .toDF("level0", "ts0", "thread0", "clazz0", "line0", "message0", "value")
      .withColumn("node", lit("n1"))
    val parsed = LogLineParser.parse(df)
    assert(parsed.count() === 200)
    val bad = parsed.where(
      col("level") =!= col("level0") || col("timestamp") =!= col("ts0") ||
        col("thread") =!= col("thread0") || col("clazz") =!= col("clazz0") ||
        col("line") =!= col("line0") || col("message") =!= col("message0"))
    assert(bad.count() === 0)
  }

  test("count invariants: errors <= parsed <= total_lines per node") {
    import spark.implicits._
    val entries = sample(Gen.listOfN(300, entryGen))
    val junk = Seq("", "  at java.base/java.lang.Thread.run(Thread.java:833)",
      "Caused by: java.io.IOException: boom", "\tat somewhere")
    val lines = entries.map(_.format) ++ junk ++ junk
    val df = lines.zipWithIndex
      .map { case (l, i) => (s"node${i % 3}", l) }.toDF("node", "value")
    val classified = ClusterAnalyzer.classify(df)
    val rows = ClusterAnalyzer.summary(classified).collect()
    val parsedPerNode = classified.where(col("parsed"))
      .groupBy("node").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val node = r.getString(0)
      val errors = r.getLong(1); val warnings = r.getLong(2)
      val total = r.getLong(3); val parsed = parsedPerNode.getOrElse(node, 0L)
      assert(errors <= parsed, s"$node errors<=parsed")
      assert(warnings <= parsed, s"$node warnings<=parsed")
      assert(parsed <= total, s"$node parsed<=total")
    }
  }

  test("classifier monotonicity: appending a matching fragment never removes labels") {
    import spark.implicits._
    val msgs = sample(Gen.listOfN(150, msgGen))
    val df = msgs.toDF("m")
      .withColumn("m2", concat(col("m"), lit(" and then Read timed out")))
    val rows = df.select(
      IssueClassifier.issues(col("m")).as("a"),
      IssueClassifier.issues(col("m2")).as("b")).collect()
    rows.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](0).toSet
      val b = r.getSeq[org.apache.spark.sql.Row](1).toSet
      assert(a.subsetOf(b), s"labels lost: ${a.diff(b)}")
      assert(b.exists(_.getString(1) == "timeout"))
    }
  }

  test("dual counting holds on generated corpora (ERROR level + warning pattern)") {
    import spark.implicits._
    val df = Seq(("n1", "ERROR [2026-05-14 10:00:00,000] [t-1] C:1 - slow query detected"))
      .toDF("node", "value")
    val s = ClusterAnalyzer.summary(ClusterAnalyzer.classify(df)).head()
    assert(s.getLong(1) === 1L && s.getLong(2) === 1L) // both error AND warning
  }
}
