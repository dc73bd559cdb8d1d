package graft

import org.apache.spark.sql.functions._

/** Unit pins for the q205 URL canonicalizer on adversarial inputs the
  * fixture weave doesn't produce — each rule exercised in isolation so
  * a future regex edit that breaks one normalization fails here, not
  * as an oracle-hash mystery.
  */
class CrawlOpsSpec extends SparkSuite {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    graft.queries.CrawlOpsQueries.canonicalize(df)
      .orderBy("doc_id").select("canonical_url")
      .collect().map(_.getString(0)).toSeq
  }

  test("case, default port, www, fragment, tracking params all normalize") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b?utm_source=x&q=1#frag")
      === Seq("example.com/A/b?q=1"))
    assert(canon("http://www.example.com:80/x") === Seq("example.com/x"))
  }

  test("path case is preserved; host case is not") {
    assert(canon("https://EXAMPLE.com/CaseSensitivePath")
      === Seq("example.com/CaseSensitivePath"))
  }

  test("non-default and cross-scheme ports survive") {
    assert(canon("https://example.com:8443/x", "http://example.com:443/x")
      === Seq("example.com:8443/x", "example.com:443/x"))
  }

  test("empty path normalizes to /; query on empty path survives") {
    assert(canon("https://example.com", "https://example.com?a=1#f")
      === Seq("example.com/", "example.com/?a=1"))
  }

  test("params sort; tracking-only query drops the separator entirely") {
    assert(canon("https://example.com/p?z=9&a=1&utm_campaign=c&m=5")
      === Seq("example.com/p?a=1&m=5&z=9"))
    assert(canon("https://example.com/p?utm_source=a&gclid=g1&fbclid=f")
      === Seq("example.com/p"))
  }

  test("the eight woven variants of one landing page merge to one key") {
    import spark.implicits._
    val docs = (0L until 4L).toDF("doc_id")
    val woven = docs.select(col("doc_id"), explode(array(
      concat(lit("HTTPS://WWW.Site"), expr("doc_id div 4 % 23"),
        lit(".COM:443/p/"), expr("doc_id div 4"),
        lit("?utm_source=s"), col("doc_id") % 3,
        lit("&id="), expr("doc_id div 4 % 101"),
        lit("#f"), col("doc_id") % 7),
      concat(lit("http://site"), expr("doc_id div 4 % 23"),
        lit(".com/p/"), expr("doc_id div 4"),
        lit("?id="), expr("doc_id div 4 % 101"),
        lit("&gclid=g"), col("doc_id")))).as("url"))
    val keys = graft.queries.CrawlOpsQueries.canonicalize(woven)
      .select("canonical_url").distinct().collect().map(_.getString(0))
    assert(keys.toSeq === Seq("site0.com/p/0?id=0"))
  }
}
