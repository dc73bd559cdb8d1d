package graft.ingest

import graft.analyze.ClusterAnalyzer
import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** The engine's replacement for the reference's session-global
  * `logs_storage: dict[node_key -> file content]`
  * (`cassandra_log_analyzer.py:336`): an explicit catalog of named raw
  * line DataFrames, with the parse+classify relation computed once and
  * cached (the reference recomputes it on every analytical call —
  * `cassandra_log_analyzer.py:745,808,831,847`).
  *
  * Key semantics preserved (SURVEY.md §7.4.5):
  *  - SSH-style loads are keyed `{node}_{type}`
  *    (`cassandra_log_analyzer.py:661,671`); manual/inline loads use the
  *    BARE node name — `log_type` is accepted but ignored in the key
  *    (`:729`);
  *  - `split('\n')` keeps a trailing empty line, which counts in
  *    `total_lines` (`:231,:730,:262`) — we split with limit -1;
  *  - node iteration order = insertion order (LinkedHashMap).
  */
final class LogCatalog(val spark: SparkSession) {

  private val storage = mutable.LinkedHashMap.empty[String, DataFrame]
  private var cachedClassified: Option[DataFrame] = None

  private def invalidate(): Unit = synchronized {
    cachedClassified.foreach(_.unpersist())
    cachedClassified = None
  }

  private def linesDf(nodeKey: String, lines: Seq[String]): DataFrame = {
    val rows = lines.zipWithIndex.map { case (l, i) => Row(nodeKey, (i + 1).toLong, l) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), Schemas.rawLine)
  }

  /** `load_logs` (`cassandra_log_analyzer.py:724-736`): inline content
    * under the BARE node name. Returns (line count incl. trailing empty,
    * total node keys) — the tool's reported numbers.
    */
  def loadInline(nodeName: String, content: String): (Long, Int) = synchronized {
    val lines = content.split("\n", -1).toSeq // Python str.split('\n') parity
    storage(nodeName) = linesDf(nodeName, lines)
    invalidate()
    (lines.size.toLong, storage.size)
  }

  /** Load raw content under an EXPLICIT node key — the landing point
    * for [[RemoteFetcher]] fetches (SSH-style `{node}_{type}` keys,
    * `cassandra_log_analyzer.py:661,671`). Same `split('\n', -1)`
    * parity as [[loadInline]].
    */
  def loadContent(nodeKey: String, content: String): (Long, Int) = synchronized {
    val lines = content.split("\n", -1).toSeq
    storage(nodeKey) = linesDf(nodeKey, lines)
    invalidate()
    (lines.size.toLong, storage.size)
  }

  /** `load_logs_from_ssh`-shaped load from a (local or staged) file path,
    * keyed `{node}_{type}` (`cassandra_log_analyzer.py:661,671`).
    * `tailLines` mirrors the reference's remote `tail -n N` limit
    * pushdown (`:136-137`) — only the last N lines enter the engine.
    *
    * Reads via `wholetext` + split so the trailing-newline empty line is
    * preserved exactly like `cat file | split('\n')`. Parity path — for
    * the 100 TB tier use [[loadDistributed]].
    */
  def loadFile(nodeName: String, logType: String, path: String,
               tailLines: Option[Int] = None): (Long, Int) = synchronized {
    val content = spark.read.option("wholetext", "true").text(path)
      .collect().map(_.getString(0)).mkString("\n")
    val all = content.split("\n", -1).toSeq
    // Emulate remote `tail -n N`: last N CONTENT lines; the trailing
    // empty element from a final newline survives the tail (tail's
    // output still ends with '\n'), exactly like the reference's
    // split of the tail output (`cassandra_log_analyzer.py:136-137,662`).
    val lines = tailLines.fold(all) { n =>
      val (body, trailer) =
        if (all.nonEmpty && all.last.isEmpty) (all.dropRight(1), Seq(""))
        else (all, Seq.empty[String])
      body.takeRight(n) ++ trailer
    }
    val key = s"${nodeName}_$logType"
    storage(key) = linesDf(key, lines)
    invalidate()
    (lines.size.toLong, storage.size)
  }

  /** Scale-path file load: `spark.read.text` over a path/glob (no
    * driver-side materialization, splittable, distributed). Line numbers
    * are NOT assigned (no stable global order at scale) — queries that
    * need them use the parity loaders; everything else (summary,
    * histogram, search content) is order-free.
    */
  def loadDistributed(nodeName: String, logType: String, pathOrGlob: String): Unit = synchronized {
    val key = s"${nodeName}_$logType"
    storage(key) = spark.read.text(pathOrGlob)
      .select(lit(key).as("node"), lit(-1L).as("line_number"), col("value"))
    invalidate()
  }

  /** Node keys in insertion order (= reference dict order). */
  def nodeKeys: Seq[String] = synchronized(storage.keys.toSeq)

  def isEmpty: Boolean = synchronized(storage.isEmpty)

  /** Distinct BASE node count — `len(set(k.rsplit('_',1)[0] ...))`
    * (`cassandra_log_analyzer.py:678`).
    */
  def distinctBaseNodes: Long = synchronized {
    storage.keys.map(k => k.lastIndexOf('_') match {
      case -1 => k
      case i => k.substring(0, i)
    }).toSet.size.toLong
  }

  /** UNION ALL of every node's raw lines (SURVEY.md §2.7 U1). */
  def raw: DataFrame = synchronized {
    require(storage.nonEmpty, "no logs loaded — use loadInline/loadFile first")
    storage.values.reduce(_.unionByName(_))
  }

  /** Raw lines of one node key; a missing key yields an EMPTY relation,
    * not an error (`logs_storage.get(node_filter, "")` quirk,
    * `cassandra_log_analyzer.py:780`).
    */
  def rawFor(nodeKey: String): DataFrame = synchronized {
    storage.getOrElse(nodeKey, spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.rawLine))
  }

  /** The parse+classify relation, computed once and cached — the
    * engine-side answer to the reference's recompute-per-call.
    */
  def classified: DataFrame = synchronized {
    cachedClassified.getOrElse {
      val df = ClusterAnalyzer.classify(raw).cache()
      cachedClassified = Some(df)
      df
    }
  }
}
