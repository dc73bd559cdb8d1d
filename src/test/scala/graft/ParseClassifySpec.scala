package graft

import graft.classify.IssueClassifier
import graft.parse.LogLineParser
import org.apache.spark.sql.functions._

/** Pins the reference's parse/classify semantics
  * (`cassandra_log_analyzer.py:186-217`) — see FIXTURES.md §A.
  */
class ParseClassifySpec extends SparkSuite {
  import spark.implicits._

  private def parseOne(line: String) = {
    val df = Seq(("n1", 1L, line)).toDF("node", "line_number", "value")
    LogLineParser.parse(df).collect()
  }

  test("well-formed line parses into 7 string fields") {
    val rows = parseOne(
      "ERROR [2026-05-14 10:23:45,123] [ReadStage-2] org.apache.cassandra.db.ReadCommand:512 - Read timed out after 5000ms")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("level") == "ERROR")
    assert(r.getAs[String]("timestamp") == "2026-05-14 10:23:45,123")
    assert(r.getAs[String]("thread") == "ReadStage-2")
    assert(r.getAs[String]("clazz") == "org.apache.cassandra.db.ReadCommand")
    assert(r.getAs[String]("line") == "512") // stays a string (CLA:200)
    assert(r.getAs[String]("message") == "Read timed out after 5000ms")
  }

  test("stack-trace continuation and malformed lines are dropped") {
    assert(parseOne("java.lang.RuntimeException: boom").isEmpty)
    assert(parseOne("    at org.apache.cassandra.Foo.bar(Foo.java:1)").isEmpty)
    assert(parseOne("").isEmpty)
    // class containing a colon cannot satisfy ([^:]+):(\d+) — dropped,
    // identically under Python re and java.util.regex backtracking
    assert(parseOne("ERROR [t] [th] a:b:12 - x").isEmpty)
  }

  test("message keeps everything after the first ' - ' separator") {
    val r = parseOne("INFO [t1] [main] C:1 - a - b - c").head
    assert(r.getAs[String]("message") == "a - b - c")
  }

  test("each of the 14 fixture messages triggers exactly its pattern") {
    val fixtures = Seq( // FIXTURES.md §A.2
      "Read timed out after 5000ms" -> Seq(("ERROR", "timeout")),
      "java.lang.OutOfMemoryError: Java heap space" -> Seq(("ERROR", "oom")),
      "connection to /10.0.0.2 refused" -> Seq(("ERROR", "connection")),
      "compaction of table ks.t failed" -> Seq(("ERROR", "compaction")),
      "repair session failed on range" -> Seq(("ERROR", "repair")),
      "GC pause of 1200ms exceeded threshold" -> Seq(("ERROR", "gc")),
      "tombstone warning: scanned 10000 tombstones" -> Seq(("ERROR", "tombstone")),
      "dropped 42 mutation messages in last 5s" -> Seq(("ERROR", "dropped")),
      "UnavailableException: cannot achieve QUORUM" -> Seq(("ERROR", "unavailable")),
      "heap pressure detected at 92%" -> Seq(("WARNING", "heap")),
      "slow query detected: SELECT * FROM ks.t" -> Seq(("WARNING", "slow_query")),
      "batch too large: 128 statements" -> Seq(("WARNING", "batch")),
      "streaming session failed with peer /10.0.0.3" -> Seq(("WARNING", "streaming")))
    val df = fixtures.map(_._1).toDF("message")
      .withColumn("issues", IssueClassifier.issues(col("message")))
    val got = df.select("message", "issues").collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(i => (i.getString(0), i.getString(1)))).toMap
    fixtures.foreach { case (msg, expected) =>
      assert(got(msg) == expected, s"for message: $msg")
    }
  }

  test("multi-pattern message emits one issue per pattern, in dict order") {
    val df = Seq("coordinator timeout while handling request").toDF("message")
      .withColumn("issues", IssueClassifier.issues(col("message")))
    val issues = df.select("issues").collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(i => (i.getString(0), i.getString(1)))
    // timeout comes before coordinator in ERROR_PATTERNS order (CLA:38-49)
    assert(issues == Seq(("ERROR", "timeout"), ("ERROR", "coordinator")))
  }

  test("classification is case-insensitive and unanchored (re.search parity)") {
    val df = Seq("prefix TIMED OUT suffix").toDF("message")
    assert(df.where(IssueClassifier.matchesAnyError(col("message"))).count() == 1)
  }

  test("dual counting: a line can be both error and warning (CLA:245-251)") {
    val df = Seq(("INFO", "slow query detected and request timed out"))
      .toDF("level", "message")
    val r = df.select(
      IssueClassifier.isError(col("level"), col("message")).as("e"),
      IssueClassifier.isWarning(col("level"), col("message")).as("w")).collect().head
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("WARN level counts as warning even with no pattern match (CLA:249)") {
    val df = Seq(("WARN", "plain warning with no pattern")).toDF("level", "message")
    val r = df.select(
      IssueClassifier.isError(col("level"), col("message")).as("e"),
      IssueClassifier.isWarning(col("level"), col("message")).as("w")).collect().head
    assert(!r.getBoolean(0) && r.getBoolean(1))
  }
}
