package graft.engine

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.DeltaLake

/** Pins the native Delta-log reader against the protocol behaviors the
  * declared `deltalake_*` queries don't reach: remove-action replay,
  * checkpoint resume (with the pre-checkpoint JSON commits DELETED, so the
  * checkpoint path is proven, not optional), add/remove cancellation in
  * the commit-window diff, log-level partition pruning, and the
  * fail-fast on reader features the fold would silently mis-read.
  */
class DeltaLakeSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_dl_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("multi-commit fold: adds accumulate, removes drop, time travel replays") {
    val dir = freshDir("fold")
    val a = Seq((1L, "a"), (2L, "a")).toDF("id", "v").coalesce(1)
    val b = Seq((3L, "b")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, a, Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, b, Seq.empty, 1L)
    // remove commit 0's file (single-file commits make membership exact)
    val f0 = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    assert(f0.length == 2)
    val commit0File = rows(spark.read.parquet(s"$dir/${f0.head}")) match {
      case s if s == Set((1L, "a"), (2L, "a")) => f0.head
      case _ => f0.last
    }
    DeltaLake.stageRemoveCommit(dir, Seq(commit0File), 2L)

    assert(DeltaLake.latestVersion(spark, dir) == 2L)
    assert(rows(DeltaLake.snapshot(spark, dir)) == Set((3L, "b")))
    assert(rows(DeltaLake.snapshot(spark, dir, Some(1L))) ==
      Set((1L, "a"), (2L, "a"), (3L, "b")))
    assert(rows(DeltaLake.snapshot(spark, dir, Some(0L))) ==
      Set((1L, "a"), (2L, "a")))
    // commit-window diff: adds after v0 still live at the end
    assert(rows(DeltaLake.appended(spark, dir, 0L)) == Set((3L, "b")))
    // a file added AND removed inside the window cancels
    assert(rows(DeltaLake.appended(spark, dir, 0L, Some(2L))) ==
      Set((3L, "b")))
    val dir2 = freshDir("cancel")
    DeltaLake.stageCommit(spark, dir2, a, Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir2, b, Seq.empty, 1L)
    val added = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
      .filter(n => rows(spark.read.parquet(s"$dir2/$n")) == Set((3L, "b")))
    DeltaLake.stageRemoveCommit(dir2, added.toSeq, 2L)
    assert(DeltaLake.appended(spark, dir2, 0L).isEmpty)
  }

  test("checkpoint resume: fold continues from the checkpoint when pre-checkpoint commits are gone") {
    val dir = freshDir("cp")
    val a = Seq((1L, "a")).toDF("id", "v").coalesce(1)
    val b = Seq((2L, "b")).toDF("id", "v").coalesce(1)
    val c = Seq((3L, "c")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, a, Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, b, Seq.empty, 1L)

    // hand-build the v1 checkpoint: one row per live action
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq
    val cpRows =
      CpRow(None, Some(CpMeta("cp-meta", CpFormat("parquet"),
        a.schema.json, Seq.empty)), None) +:
      CpRow(None, None, Some(CpProtocol(1, 2))) +:
      // real sizes: the reader plans splits from the LOG's size (the
      // protocol requires it to be correct; it never stats the file)
      files.map(f => CpRow(Some(CpAdd(f, Map.empty,
        new java.io.File(dir, f).length(), 1L, true)), None, None))
    val tmp = freshDir("cpbuild")
    cpRows.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val log = new java.io.File(dir, "_delta_log")
    java.nio.file.Files.move(part.toPath,
      new java.io.File(log, f"${1L}%020d.checkpoint.parquet").toPath)
    java.nio.file.Files.writeString(
      new java.io.File(log, "_last_checkpoint").toPath,
      """{"version":1,"size":4}""")
    // prove the checkpoint path: the JSON commits it subsumes are GONE
    assert(new java.io.File(log, f"${0L}%020d.json").delete())
    assert(new java.io.File(log, f"${1L}%020d.json").delete())

    assert(rows(DeltaLake.snapshot(spark, dir)) ==
      Set((1L, "a"), (2L, "b")))
    DeltaLake.stageCommit(spark, dir, c, Seq.empty, 2L)
    assert(rows(DeltaLake.snapshot(spark, dir)) ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("partitioned table: values injected from the log, filters prune whole partitions") {
    val dir = freshDir("part")
    val df = Seq((1L, "x", "p1"), (2L, "y", "p1"), (3L, "z", "p2"))
      .toDF("id", "v", "p")
    DeltaLake.stageCommit(spark, dir, df, Seq("p"), 0L)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "v", "p"))
    assert(snap.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "x", "p1"), (2L, "y", "p1"), (3L, "z", "p2")))
    // the data files must NOT carry the partition column (it lives in
    // the log) — the protocol's layout, and what makes injection real
    val dataFile = new java.io.File(dir, "p=p1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(!spark.read.parquet(dataFile.getAbsolutePath)
      .columns.contains("p"))
    // log-level pruning: a partition predicate constant-folds per group
    // and the empty arms vanish — exactly one file scan survives
    import org.apache.spark.sql.classic
    val plan = snap.filter(org.apache.spark.sql.functions.col("p") === "p2")
      .asInstanceOf[classic.Dataset[Row]]
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"expected the p!=p2 arms pruned before any file is opened:\n$plan")
  }

  test("stats skipping: only files whose [min,max] intersects the predicate are planned") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = freshDir("skip")
    val lo = Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
    val hi = Seq((100L, "c"), (200L, "d")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, lo, Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, hi, Seq.empty, 1L)
    assert(DeltaLake.snapshot(spark, dir).inputFiles.length == 2)
    // range predicate: the lo file's max (2) proves no match
    val skipped = DeltaLake.snapshotWhere(spark, dir, col("id") >= 100L)
    assert(skipped.inputFiles.length == 1,
      "the lo file must be skipped on its stats, not scanned")
    assert(rows(skipped) == Set((100L, "c"), (200L, "d")))
    // literal-on-the-left flips the comparison
    assert(DeltaLake.snapshotWhere(spark, dir, lit(5L) > col("id"))
      .inputFiles.length == 1)
    // equality needs min <= v <= max
    assert(DeltaLake.snapshotWhere(spark, dir, col("id") === 2L)
      .inputFiles.length == 1)
    // string stats order lexicographically
    assert(rows(DeltaLake.snapshotWhere(spark, dir, col("v") === "c")) ==
      Set((100L, "c")))
    // OR keeps either side's candidates; AND intersects
    assert(DeltaLake.snapshotWhere(spark, dir,
      col("id") === 1L || col("id") === 100L).inputFiles.length == 2)
    // AND intersects to provably-empty: NO file is planned (and the
    // empty snapshot still carries the schema)
    val none = DeltaLake.snapshotWhere(spark, dir,
      col("id") >= 100L && col("v") === "zz")
    assert(none.inputFiles.isEmpty && none.isEmpty)
    assert(DeltaLake.snapshotWhere(spark, dir,
      col("id") >= 100L && col("v") === "c").inputFiles.length == 1)
    // conservative: an unsupported shape keeps every file, and the
    // re-applied filter keeps semantics exact
    val weird = DeltaLake.snapshotWhere(spark, dir, col("id") % 2 === 0L)
    assert(weird.inputFiles.length == 2)
    assert(rows(weird) == Set((2L, "b"), (100L, "c"), (200L, "d")))
    // corrupt / foreign-writer stats degrade to keep-the-file, never a
    // planner crash: break the lo file's min stat to a non-number
    val log0 = new java.io.File(dir, "_delta_log/00000000000000000000.json")
    val txt = java.nio.file.Files.readString(log0.toPath)
    val munged = txt.replace("""\"minValues\":{\"id\":1""",
      """\"minValues\":{\"id\":\"oops\"""")
    assert(munged != txt, "fixture drift: expected the lo min stat")
    java.nio.file.Files.writeString(log0.toPath, munged)
    // max survives, so the >= cut still skips the lo file on max alone
    assert(DeltaLake.snapshotWhere(spark, dir, col("id") >= 100L)
      .inputFiles.length == 1)
    // a predicate that NEEDS the corrupted min keeps the file (hi file
    // still skips on its intact min) instead of NumberFormatException
    assert(DeltaLake.snapshotWhere(spark, dir, col("id") < 1L)
      .inputFiles.length == 1)
  }

  test("compaction (dataChange=false) neither replays as inserts nor hides prior rows") {
    val dir = freshDir("compact")
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
    val b = Seq((3L, "c")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, a, Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, b, Seq.empty, 1L)
    DeltaLake.stageCompactCommit(spark, dir, 2L)
    // the snapshot reads the ONE rewritten file
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.inputFiles.length == 1)
    assert(rows(snap) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the commit-log delta since v0 is commit 1's rows, read from the
    // ORIGINAL file the rewrite left on disk (VACUUM retention contract)
    assert(rows(DeltaLake.appended(spark, dir, 0L)) == Set((3L, "c")))
    // nothing data-changing landed after v1
    assert(DeltaLake.appended(spark, dir, 1L).isEmpty)
    assert(DeltaLake.isAppendOnly(dir, 0L, 1L))
    assert(!DeltaLake.isAppendOnly(dir, 1L, 2L))
  }

  test("schema evolution: pre-evolution files surface the new column as null") {
    val dir = freshDir("evolve")
    DeltaLake.stageCommit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir,
      Seq((3L, "c", 30L)).toDF("id", "v", "w").coalesce(1), Seq.empty, 1L)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "v", "w"))
    val got = snap.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(30L))))
    // time travel resolves with THAT version's metaData: the old schema
    val v0 = DeltaLake.snapshot(spark, dir, Some(0L))
    assert(v0.columns.toSeq == Seq("id", "v"))
    assert(rows(v0) == Set((1L, "a"), (2L, "b")))
  }

  test("range-clustered layout makes stats skipping effective") {
    import org.apache.spark.sql.functions.col
    val dir = freshDir("cluster")
    // the layout half of skipping: range-repartition by the key before
    // the bucketed write, so per-file [min,max] are DISJOINT — a range
    // query then plans only the intersecting files. Unclustered writes
    // give every file the full key range and skipping can prove nothing.
    val df = spark.range(0L, 1000L).toDF("id")
      .withColumn("x", col("id") % 7)
      .repartitionByRange(4, col("id"))
    DeltaLake.stageCommit(spark, dir, df, Seq.empty, 0L)
    assert(DeltaLake.snapshot(spark, dir).inputFiles.length == 4)
    val kept = DeltaLake.snapshotWhere(spark, dir,
      col("id") >= 300L && col("id") < 420L)
    assert(kept.inputFiles.length <= 2,
      s"disjoint ranges must skip non-intersecting files, planned ${kept.inputFiles.length}")
    assert(kept.count() == 120L)
  }

  test("type widening: pre-widen files read under the END schema") {
    // schema evolution int->long / float->double at v1: the v0 files
    // carry the NARROW physical types and must upcast under the
    // widened end schema (Spark's parquet reader performs the spec's
    // supported conversions natively; an unsupported one errors
    // loudly, never silently)
    val dir = freshDir("widen")
    val narrow = Seq((1, 1.5f), (2, 2.5f)).toDF("id", "x").coalesce(1)
    DeltaLake.stageCommit(spark, dir, narrow, Seq.empty, 0L)
    val wide = Seq((3L, 3.5d)).toDF("id", "x").coalesce(1)
    DeltaLake.stageCommit(spark, dir, wide, Seq.empty, 1L)
    // the typeWidening reader feature is accepted by the gate
    java.nio.file.Files.writeString(
      new java.io.File(dir, "_delta_log/00000000000000000002.json").toPath,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"]}}""" + "\n")
    val snap = DeltaLake.snapshot(spark, dir)
    import org.apache.spark.sql.types._
    assert(snap.schema("id").dataType == LongType)
    assert(snap.schema("x").dataType == DoubleType)
    assert(snap.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((1L, 1.5d), (2L, 2.5d), (3L, 3.5d)))
    // stats skipping still proves with the narrow file's stats under
    // the widened type
    assert(DeltaLake.snapshotWhere(spark, dir,
      org.apache.spark.sql.functions.col("id") >= 3L)
      .inputFiles.length == 1)
  }

  test("fail-fast on unsupported reader protocol") {
    val dir = freshDir("proto")
    val a = Seq((1L, "a")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, a, Seq.empty, 0L)
    // deletionVectors and columnMapping are SUPPORTED since r10 — a
    // protocol upgrade to them must read cleanly; anything beyond must
    // stay loud
    java.nio.file.Files.writeString(
      new java.io.File(dir, "_delta_log/00000000000000000001.json").toPath,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","columnMapping"]}}""" + "\n")
    assert(rows(DeltaLake.snapshot(spark, dir)) == Set((1L, "a")))
    java.nio.file.Files.writeString(
      new java.io.File(dir, "_delta_log/00000000000000000002.json").toPath,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","someFutureFeature"]}}""" + "\n")
    val e = intercept[IllegalArgumentException] {
      DeltaLake.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("someFutureFeature"))
    // the pre-feature version still reads
    assert(rows(DeltaLake.snapshot(spark, dir, Some(0L))) == Set((1L, "a")))
  }
}

// checkpoint-action shapes (file-scope: Spark encoders need stable types)
private[engine] case class CpFormat(provider: String)
private[engine] case class CpMeta(id: String, format: CpFormat,
    schemaString: String, partitionColumns: Seq[String])
private[engine] case class CpProtocol(minReaderVersion: Int,
    minWriterVersion: Int)
private[engine] case class CpAdd(path: String,
    partitionValues: Map[String, String], size: Long,
    modificationTime: Long, dataChange: Boolean)
private[engine] case class CpRow(add: Option[CpAdd],
    metaData: Option[CpMeta], protocol: Option[CpProtocol])
