package graft.tools

import graft.functions.TextFunctions._
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the slow bench queries (not part of
  * the driver contract; run manually while optimizing).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n1 = f
      val t1 = System.nanoTime(); val n2 = f
      val t2 = System.nanoTime()
      println(f"[prof] $name%-28s cold=${(t1 - t0) / 1e9}%6.3f warm=${(t2 - t1) / 1e9}%6.3f rows=$n1%d/$n2%d")
      spark.catalog.clearCache()
    }

    /** Full-plan execution — .count() would prune final projections. */
    def exec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // warm the session
    Tables(spark, sfDir, "documents").count()

    val hashArr = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), array_distinct(
        graft.functions.ShingleHash(tokens(col("text")), 3)).as("hs"))

    time("hashArrays")(hashArr.count())
    time("minhash-sig")(hashArr.select(col("doc_id"),
      graft.functions.MinHashSig(col("hs")).as("sig")).where(col("sig").isNotNull).count())
    time("simhash-pack")(hashArr.select(col("doc_id"),
      graft.functions.SimHashPack(col("hs")).as("sh")).where(col("sh").isNotNull).count())

    // q28 candidate stage without the final distinct/orderBy
    {
      val sh = hashArr.select(col("doc_id"),
        graft.functions.SimHashPack(col("hs")).as("sh"))
        .where(col("sh").isNotNull).cache()
      val chunkStructs = (0 until simhashChunks).map { c =>
        struct(lit(c).as("ci"), simhashChunk(col("sh"), c).as("cv"))
      }
      val chunks = sh.select(col("doc_id"), col("sh"),
        explode(array(chunkStructs: _*)).as("ck"))
        .select(col("doc_id"), col("sh"), col("ck.ci"), col("ck.cv"))
      time("q28-chunk-join-raw")(chunks.as("a")
        .join(chunks.as("b"),
          col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
            col("a.doc_id") < col("b.doc_id")).count())
      sh.unpersist()
    }

    val full = graft.SparkEntry.queries
    Seq("q26_ngram_jaccard", "q27_minhash_lsh", "q28_simhash",
      "q33_sessionize", "q38_tfidf_terms").foreach { q =>
      time(q)(exec(full(q)(spark, sfDir)))
    }

    // q26 gram stage alone
    time("q26-grams")(Tables(spark, sfDir, "documents")
      .where(col("doc_id") % 5 === 0 && col("doc_id") < 2500)
      .select(col("doc_id"), explode(array_distinct(
        transform(when(length(col("text")) >= 4,
          sequence(lit(1), length(col("text")) - 3)),
          i => substr(lower(col("text")), i, lit(4))))).as("g")).count())

    spark.stop()
  }
}
