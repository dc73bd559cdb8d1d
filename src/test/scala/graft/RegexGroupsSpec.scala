package graft

import graft.functions.RegexGroups
import graft.parse.LogLineParser
import org.apache.spark.sql.functions._

/** RegexGroups single-pass extraction ≡ per-group regexp_extract on the
  * log-corpus parse pattern, plus no-match null and eval-path parity.
  */
class RegexGroupsSpec extends SparkSuite {

  private val p = LogLineParser.anchored

  private lazy val lines = {
    import spark.implicits._
    Seq(
      "ERROR [2026-05-14 10:00:01,002] [ReadStage-2] o.a.c.db.ReadCommand:512 - Read timed out",
      "WARN  [2026-05-14 10:00:03,004] [main] o.a.c.Batch:5 - batch too large",
      "INFO [ts] [t] C:1 - ",
      "this line does not parse",
      "").toDF("line")
  }

  test("element_at(groups, i) == regexp_extract per group on matched lines") {
    val matched = lines.where(col("line").rlike(p))
    val gr = RegexGroups(col("line"), p)
    val checks = (1 to 6).map { i =>
      (element_at(gr, i) === regexp_extract(col("line"), p, i)).as(s"g$i")
    }
    val rows = matched.select(checks: _*).collect()
    assert(rows.nonEmpty && rows.forall(r => (0 until 6).forall(r.getBoolean)))
  }

  test("no match yields a null array; parsed flag mirrors rlike") {
    val flags = lines.select(
      RegexGroups(col("line"), p).isNotNull.as("a"),
      col("line").rlike(p).as("b"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(flags.forall { case (a, b) => a == b })
  }

  test("codegen and interpreted paths agree") {
    def vals(mode: String): Seq[Seq[String]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try lines.select(RegexGroups(col("line"), p))
        .collect().map(r =>
          if (r.isNullAt(0)) null else r.getSeq[String](0).toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(vals("CODEGEN_ONLY") === vals("NO_CODEGEN"))
  }
}
