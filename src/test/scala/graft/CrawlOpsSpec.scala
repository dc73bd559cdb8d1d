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

  test("canonical invariants hold on generated adversarial URLs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    val label = Gen.listOfN(4, Gen.frequency(
      8 -> Gen.alphaChar, 2 -> Gen.numChar)).map(_.mkString)
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "Https")
      www <- Gen.oneOf("", "www.", "WWW.")
      h1 <- label; h2 <- label
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.listOf(label).map(_.take(3))
      params <- Gen.someOf(Seq("utm_source=x", "utm_campaign=yy", "gclid=g1",
        "fbclid=f", "z=9", "a=1", "m=5", "q=hello")).map(scala.util.Random.shuffle(_))
      frag <- Gen.oneOf("", "#sec", "#a/b?c=1")
    } yield s"$scheme://$www$h1.$h2.com$port" +
      segs.map("/" + _).mkString +
      (if (params.isEmpty) "" else params.mkString("?", "&", "")) + frag
    val urls = sample(urlGen, 250)
    val canonical = canon(urls: _*)
    for ((u, c) <- urls.zip(canonical)) {
      assert(!c.contains("#"), s"fragment survived: $u -> $c")
      assert(!c.contains("utm_") && !c.contains("gclid") && !c.contains("fbclid"),
        s"tracking param survived: $u -> $c")
      val host = c.takeWhile(ch => ch != '/' && ch != '?')
      assert(host == host.toLowerCase, s"host case survived: $u -> $c")
      assert(!host.startsWith("www."), s"www survived: $u -> $c")
      // scheme-AWARE default-port stripping: only the scheme's own
      // default is a no-op port (an :80 on https is a real port)
      val scheme = u.takeWhile(_ != ':').toLowerCase
      if (scheme == "https")
        assert(!host.endsWith(":443"), s"default port survived: $u -> $c")
      if (scheme == "http")
        assert(!host.endsWith(":80"), s"default port survived: $u -> $c")
      if (c.contains("?")) {
        val ps = c.substring(c.indexOf('?') + 1).split("&").toSeq
        assert(ps == ps.sorted && ps.forall(_.nonEmpty),
          s"params unsorted/empty: $u -> $c")
      }
      assert(!c.endsWith("?"), s"bare separator: $u -> $c")
    }
  }

  test("canonicalization is a projection: re-canonicalizing is identity") {
    // prefixing any canonical form with a scheme and re-running the
    // chain must reproduce it byte-for-byte (lowercase host, no www,
    // no default port, no tracking params, sorted params — all fixed
    // points). Uses the woven corpus shapes plus handwritten edges.
    val cs = canon(
      "HTTPS://WWW.Site7.COM:443/p/9?utm_source=s1&id=42#f3",
      "http://site7.com/p/9?id=42&gclid=g7",
      "https://example.com", "https://example.com?b=2&a=1#x")
    assert(canon(cs.map("https://" + _): _*) === cs)
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
