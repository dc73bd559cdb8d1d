package graft

import org.apache.spark.sql.functions._

/** Round-15 lake-tier invariants (q301/q302/q303), pinned in-engine so
  * a semantics regression fails with a NAMED property instead of an
  * opaque oracle hash mismatch:
  *
  *  - q301: checkpointed snapshot resolution is exact (set-equal to
  *    the full fold at every probe) while its manifest-read cost stays
  *    CONSTANT as the full fold's grows — the scaling claim itself;
  *  - q302: pruning is COMPLETE — the stats-pruned read returns
  *    exactly the rows a full-table predicate scan returns (a file
  *    wrongly skipped would lose rows; this is the direction stats
  *    bugs hide in);
  *  - q303: the refusal/execution decision is exactly the conflict
  *    test (refused iff conflicts > 0), and both readers observe the
  *    SAME logical content (compaction is a metadata swap), refusal
  *    having preserved the bytes.
  */
class LakeLifecycleSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("staging memoization: a data-deleting gate (q291 vacuum-exec) " +
      "runs on a PRIVATE copy and leaves the shared master byte-intact; " +
      "a reader gate over the master is unchanged across it") {
    import graft.queries.ShapeOpsQueries
    def fileCensus(root: java.nio.file.Path): Map[String, Long] = {
      val walk = java.nio.file.Files.walk(root)
      try {
        val b = Map.newBuilder[String, Long]
        walk.forEach(p =>
          if (java.nio.file.Files.isRegularFile(p))
            b += (root.relativize(p).toString ->
              java.nio.file.Files.size(p)))
        b.result()
      } finally walk.close()
    }
    val before = SparkEntry.queries("q274_lake_time_travel")(spark, dir)
      .collect().toSeq
    // both conventions' masters exist after the reader gate +
    // the compaction-convention mutator below
    val masterP = ShapeOpsQueries.lakeMasterDir(spark, dir, false)
    val masterC = ShapeOpsQueries.lakeMasterDir(spark, dir, true)
    val censusP = fileCensus(masterP)
    val censusC = fileCensus(masterC)
    SparkEntry.queries("q291_lake_vacuum_exec")(spark, dir).collect()
    assert(fileCensus(masterP) === censusP,
      "the plain master changed across a vacuum-exec gate")
    assert(fileCensus(masterC) === censusC,
      "the compaction master changed across a vacuum-exec gate")
    val after = SparkEntry.queries("q274_lake_time_travel")(spark, dir)
      .collect().toSeq
    assert(before === after,
      "a reader gate observed another gate's mutation")
  }

  test("q322: a shallow clone resolves to the SOURCE's own data file " +
      "paths at clone time (zero data copied — the clone op is a " +
      "manifest copy), and the clone root holds nothing but its log") {
    import graft.queries.ShapeOpsQueries
    val stage = java.nio.file.Files.createTempDirectory("graft-q322-spec")
    try {
      ShapeOpsQueries.stageLakeLog(spark, dir, stage.toString,
        withCompaction = false)
      val cloneRoot = stage.resolve("clone")
      java.nio.file.Files.createDirectories(cloneRoot)
      graft.util.FileUtils.copyRecursively(
        stage.resolve("_log"), cloneRoot.resolve("_log"))
      val src = ShapeOpsQueries.asOfFiles(spark, stage.toString, 2).toSet
      val cln = ShapeOpsQueries
        .asOfFiles(spark, cloneRoot.toString, 2).toSet
      assert(cln === src, "the clone resolved different data paths")
      assert(graft.util.FileUtils.listDir(cloneRoot)
        .map(_.getFileName.toString) === Seq("_log"),
        "the clone op created something besides its manifest log")
    } finally graft.util.FileUtils.deleteRecursively(stage)
  }

  test("q301: checkpoint resolution is fold-exact and constant-cost " +
      "while the full fold grows") {
    val rows = SparkEntry.queries("q301_lake_checkpoint")(spark, dir)
      .orderBy("version").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getAs[Boolean]("ckpt_matches_fold")),
      "checkpoint path diverged from the full fold")
    val full = rows.map(_.getAs[Long]("n_manifests_full")).toSeq
    val ckpt = rows.map(_.getAs[Long]("n_manifests_ckpt")).toSeq
    assert(full === Seq(3L, 6L, 9L), s"full-fold counts: $full")
    assert(ckpt.forall(_ <= 3L), s"checkpoint path read more than 3: $ckpt")
  }

  test("q302: the stats-pruned read is complete — row-identical to a " +
      "full-table predicate scan") {
    val out = SparkEntry.queries("q302_lake_column_skip")(spark, dir)
    val read = out.where(col("stage") === "e_read").head()
    val full = graft.queries.Tables(spark, dir, "documents")
    val maxId = full.agg(max(col("doc_id"))).head().getLong(0)
    val expected = full
      .where(col("source") === "src12" &&
        col("doc_id").between(maxId / 4, maxId / 2) &&
        col("n_chars") >= 100)
      .agg(count(lit(1)), coalesce(sum(col("n_chars")), lit(0L))).head()
    assert(read.getAs[Long]("n_rows") === expected.getLong(0))
    assert(read.getAs[Long]("sum_chars") === expected.getLong(1))
  }

  test("q303: refused iff conflicts, and both readers see the same " +
      "logical content") {
    val rows = SparkEntry.queries("q303_lake_vacuum_retention")(spark, dir)
      .orderBy("scenario").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val expected = if (r.getAs[Long]("n_conflicts") > 0) "refused"
        else "executed"
      assert(r.getAs[String]("outcome") === expected)
    }
    // same content through different physical layouts (F0+Fd files
    // vs the 1 compacted file) — and scenario a's read ran AFTER the
    // refusal, so equality also proves refusal preserved the bytes
    assert(rows(0).getAs[Long]("key_checksum") ===
      rows(1).getAs[Long]("key_checksum"))
    assert(rows(0).getAs[Long]("n_rows") === rows(1).getAs[Long]("n_rows"))
    assert(rows(0).getAs[Long]("n_files") > rows(1).getAs[Long]("n_files"))
  }

  test("q308: ts resolution floors to the newest commit <= t, renders " +
      "before-first as the explicit error row, and the after-last " +
      "probe reads exactly one manifest") {
    val rows = SparkEntry.queries("q308_lake_time_travel_ts")(spark, dir)
      .orderBy("probe").collect()
    assert(rows.length === 4)
    val byName = rows.map(r => r.getAs[String]("probe") -> r).toMap
    assert(byName("a_before_first").getAs[Long]("version") === -1L)
    assert(byName("a_before_first").getAs[String]("outcome") ===
      "no_snapshot_at_ts")
    assert(byName("b_exact_v1").getAs[Long]("version") === 1L)
    assert(byName("c_between_v2_v3").getAs[Long]("version") === 2L)
    assert(byName("d_after_last").getAs[Long]("version") === 3L)
    // c and d are the same logical content through different layouts
    // (v3 is the compaction swap) — the ts floor must land on each
    assert(byName("c_between_v2_v3").getAs[Long]("key_checksum") ===
      byName("d_after_last").getAs[Long]("key_checksum"))
    assert(byName("c_between_v2_v3").getAs[Long]("n_files") >
      byName("d_after_last").getAs[Long]("n_files"))
    assert(byName("d_after_last").getAs[Long]("n_manifests_ckpt") === 1L,
      "after-last must resolve through the checkpoint alone")
  }

  test("q309: the bloom never false-negatives (every hit probe finds " +
      "its row through the pruned read) and the fp count is " +
      "pass-minus-containing") {
    val rows = SparkEntry.queries("q309_lake_bloom_skip")(spark, dir)
      .orderBy("probe").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val pass = r.getAs[Long]("n_files_bloom_pass")
      assert(pass <= r.getAs[Long]("n_files_total"))
      assert(r.getAs[Long]("n_false_positive_files") ===
        pass - r.getAs[Long]("n_rows"),
        "fp must be passing files minus the (single-file) hit")
    }
    val hits = rows.filter(_.getAs[String]("probe").startsWith("a_") )++
      rows.filter(_.getAs[String]("probe").startsWith("b_"))
    hits.foreach(r => assert(r.getAs[Long]("n_rows") === 1L,
      s"${r.getAs[String]("probe")}: a bloom false negative lost the row"))
    val miss = rows.find(_.getAs[String]("probe") == "c_miss").get
    assert(miss.getAs[Long]("n_rows") === 0L)
  }

  test("q310: the sweep rewrites the checkpoint exactly when the live " +
      "one references doomed files, never leaves a doomed reference, " +
      "and both scenarios read one manifest after") {
    val rows = SparkEntry.queries("q310_lake_vacuum_ckpt")(spark, dir)
      .orderBy("scenario").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val expected = if (r.getAs[Long]("n_doomed_in_live_ckpt") > 0)
        "rewrote_checkpoint" else "executed_direct"
      assert(r.getAs[String]("action") === expected)
      assert(r.getAs[Long]("n_doomed_in_ckpt_after") === 0L)
      assert(r.getAs[Long]("n_manifests_ckpt") === 1L)
    }
    assert(rows(0).getAs[Long]("key_checksum") ===
      rows(1).getAs[Long]("key_checksum"),
      "the two sweeps' end states must hold the same logical content")
  }

  test("q312: log cleanup keeps only the checkpointed tail, the latest " +
      "resolves through the checkpoint alone, and below-floor probes " +
      "answer explicit unavailable rows") {
    val rows = SparkEntry.queries("q312_lake_log_retention")(spark, dir)
      .orderBy("probe").collect()
    assert(rows.length === 3)
    val a = rows(0); val b = rows(1); val c = rows(2)
    assert(a.getAs[Long]("n_manifests_before") >
      a.getAs[Long]("n_manifests_after"))
    assert(a.getAs[String]("outcome") === "resolved")
    assert(a.getAs[Long]("n_manifests_read") === 1L)
    assert(a.getAs[Long]("n_rows") > 0L)
    assert(b.getAs[String]("outcome") === "version_unavailable")
    assert(c.getAs[String]("outcome") === "ts_unavailable")
  }

  test("q313: the rename is metadata-only — v0 and v1 read identical " +
      "bytes through different logical names, and the post-rename " +
      "append merges consistently") {
    val rows = SparkEntry.queries("q313_lake_column_mapping")(spark, dir)
      .orderBy("probe").collect()
    assert(rows.length === 3)
    val a = rows(0); val b = rows(1); val c = rows(2)
    assert(a.getAs[String]("logical_schema") !==
      b.getAs[String]("logical_schema"))
    assert(a.getAs[Long]("n_rows") === b.getAs[Long]("n_rows"))
    assert(a.getAs[Long]("sum_measure") === b.getAs[Long]("sum_measure"))
    assert(a.getAs[Long]("key_checksum") ===
      b.getAs[Long]("key_checksum"))
    assert(c.getAs[Long]("n_rows") > a.getAs[Long]("n_rows"))
    assert(c.getAs[Long]("n_files") === 2L)
  }

  test("q314: skipping stats keyed by physical ids survive the rename " +
      "— identical pruning and identical content on both sides") {
    val rows = SparkEntry.queries("q314_lake_stats_survive_rename")(
      spark, dir).orderBy("probe").collect()
    assert(rows.length === 2)
    val a = rows(0); val b = rows(1)
    Seq("n_files_total", "n_files_after_key", "n_files_after_measure",
      "n_rows", "sum_measure", "key_checksum").foreach { c =>
      assert(a.getAs[Long](c) === b.getAs[Long](c),
        s"$c diverged across the rename")
    }
    // the key conjunct actually prunes (the gate is non-trivial)
    assert(a.getAs[Long]("n_files_after_key") <
      a.getAs[Long]("n_files_total"))
    assert(a.getAs[Long]("n_rows") > 0L)
  }

  test("the SHARED snapshot path (asOfFiles) is checkpoint-aware: a " +
      "checkpointed stage resolves from <= 1 checkpoint + tail " +
      "manifests, set-equal to the full fold") {
    import spark.implicits._
    import graft.queries.ShapeOpsQueries.{asOfFiles, ckptResolve}
    val stage = java.nio.file.Files
      .createTempDirectory("graft-spec-ckpt").toString
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(stage, "_log"))
      // v0..v5: one add each; v4 also removes v1's file (so the
      // checkpoint base must carry v0..v3's fold and the tail's
      // remove must still apply through the shared path)
      for (v <- 0 to 5) {
        val entries = Seq(("add", s"$stage/f$v", v.toLong, v.toLong)) ++
          (if (v == 4) Seq(("remove", s"$stage/f1", 1L, 1L)) else Nil)
        entries.toDF("action", "path", "min_id", "max_id").coalesce(1)
          .write.mode("overwrite").parquet(s"$stage/_log/v$v")
      }
      // checkpoint at v3 (the fold of v0..v3) + the pointer
      Seq(("add", s"$stage/f0", 0L, 0L), ("add", s"$stage/f1", 1L, 1L),
        ("add", s"$stage/f2", 2L, 2L), ("add", s"$stage/f3", 3L, 3L))
        .toDF("action", "path", "min_id", "max_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/_log/ckpt-v3")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(stage, "_log", "_last_checkpoint"), "3")
      val expected = Set(0, 2, 3, 4, 5).map(v => s"$stage/f$v")
      assert(asOfFiles(spark, stage, 5).toSet === expected,
        "shared path lost the checkpoint base or the tail remove")
      val (_, nReads) = ckptResolve(spark, stage, 5)
      assert(nReads === 3L, // ckpt-v3 + v4 + v5
        s"checkpointed stage read $nReads manifests, want 1 ckpt + 2 tail")
      // time travel BEFORE the newest checkpoint still resolves
      // (pointer is ahead of the as-of — the walk-back path)
      assert(asOfFiles(spark, stage, 2).toSet ===
        Set(0, 1, 2).map(v => s"$stage/f$v"))
    } finally graft.util.FileUtils.deleteRecursively(
      java.nio.file.Paths.get(stage))
  }
}
