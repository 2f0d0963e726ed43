package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** METADATA maintenance (r17) — the estate-scale closers for both
  * formats' LOG growth (data-file maintenance is MaintenanceSpec's):
  * Delta checkpoint-backed log cleanup ([[DeltaLake.cleanLog]] — the
  * reclaiming half of the protocol's log-compaction contract; the
  * checkpoint writer predates it) and Iceberg manifest compaction
  * ([[Iceberg.rewriteManifests]] — a metadata-only replace snapshot
  * that folds N single-entry data manifests into one per spec).
  */
class MetadataMaintenanceSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_mdm_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def logFiles(dir: String): Set[String] =
    Option(new java.io.File(dir, "_delta_log").listFiles()).toSeq
      .flatten.map(_.getName).toSet

  test("delta cleanLog: subsumed commits and older checkpoints go, " +
      "reads resume from the checkpoint, the log still advances, " +
      "history below the checkpoint fails loudly") {
    val dir = freshDir("clean")
    DeltaLake.stageCommit(spark, dir, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, frame(11 to 20), Seq.empty, 1L)
    // an early checkpoint that the later cleanup must also reclaim
    DeltaLake.stageCheckpoint(spark, dir, 1L)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") % 5 === 0, 2L)
    // multi-part checkpoint at the head; clean everything behind it
    DeltaLake.stageCheckpoint(spark, dir, 2L, parts = 2)
    val cleaned = DeltaLake.cleanLog(dir)
    assert(cleaned.size == 3, s"commits 0,1 + checkpoint 1: $cleaned")
    val names = logFiles(dir)
    assert(!names.contains("00000000000000000000.json"))
    assert(!names.contains("00000000000000000001.json"))
    assert(!names.contains("00000000000000000001.checkpoint.parquet"))
    assert(names.contains("00000000000000000002.json"),
      "the commit AT the checkpoint version stays — version-window " +
        "reads (CDF) ending there still need it")
    // content resolves from the checkpoint alone
    val expected = (1L to 20L).filterNot(_ % 5 == 0).toSet
    assert(ids(DeltaLake.snapshot(spark, dir)) == expected)
    // the log advances past the cleanup (next version = 3)
    DeltaLake.stageCommit(spark, dir, frame(21 to 25), Seq.empty, 3L)
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      expected ++ (21L to 25L))
    assert(DeltaLake.latestVersion(spark, dir) == 3L)
    // history below the checkpoint is GONE — loudly, never silently
    val e = intercept[Exception] {
      DeltaLake.snapshot(spark, dir, Some(0L)).collect()
    }
    assert(e.getMessage.contains("missing Delta commit"))
    // reading AT the checkpoint version still works (no commit needed)
    assert(ids(DeltaLake.snapshot(spark, dir, Some(2L))) == expected)
  }

  test("delta cleanLog without a checkpoint refuses") {
    val dir = freshDir("nockpt")
    DeltaLake.stageCommit(spark, dir, frame(1 to 5), Seq.empty, 0L)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.cleanLog(dir)
    }
    assert(e.getMessage.contains("no complete checkpoint"))
    assert(ids(DeltaLake.snapshot(spark, dir)) == (1L to 5L).toSet)
  }

  test("iceberg rewriteManifests: N data manifests fold into one, " +
      "content and time travel unchanged, second call no-ops, " +
      "appends continue") {
    val dir = freshDir("rwm")
    Iceberg.write(spark, dir, frame(1 to 10))
    val s1 = Iceberg.write(spark, dir, frame(11 to 20))
    Iceberg.write(spark, dir, frame(21 to 30))
    assert(Iceberg.manifestCounts(dir) == ((3, 0)))
    val v = Iceberg.rewriteManifests(spark, dir)
    assert(v > 0)
    assert(Iceberg.manifestCounts(dir) == ((1, 0)))
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 30L).toSet)
    // pre-rewrite snapshots still resolve (their manifest lists and
    // manifests are untouched)
    assert(ids(Iceberg.snapshot(spark, dir, Some(s1))) ==
      (1L to 20L).toSet)
    // nothing left to compact
    assert(Iceberg.rewriteManifests(spark, dir) == -1L)
    // the table keeps working: the next append carries the compacted
    // manifest forward
    Iceberg.write(spark, dir, frame(31 to 35))
    assert(Iceberg.manifestCounts(dir) == ((2, 0)))
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 35L).toSet)
  }

  test("iceberg rewriteManifests preserves merge-on-read delete " +
      "applicability (sequence numbers materialize into the " +
      "compacted manifest)") {
    val dir = freshDir("rwmor")
    Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.write(spark, dir, frame(11 to 20))
    // MoR delete: a delete manifest scoped by sequence number to the
    // files written BEFORE it
    Iceberg.stageMorDelete(spark, dir, col("id") % 4 === 0)
    val expected = (1L to 20L).filterNot(_ % 4 == 0).toSet
    assert(ids(Iceberg.snapshot(spark, dir)) == expected)
    val (d0, del0) = Iceberg.manifestCounts(dir)
    assert(d0 == 2 && del0 == 1)
    val v = Iceberg.rewriteManifests(spark, dir)
    assert(v > 0)
    assert(Iceberg.manifestCounts(dir) == ((1, 1)))
    // the deletes still apply to the compacted entries — if sequence
    // numbers had been lost/re-inherited, deleted rows would resurrect
    assert(ids(Iceberg.snapshot(spark, dir)) == expected)
    // a post-rewrite append is NEWER than the delete file's sequence:
    // its rows (including id % 4 == 0 ones) must NOT be deleted
    Iceberg.write(spark, dir, frame(21 to 28))
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      expected ++ (21L to 28L))
  }

  test("delta cleanLog behind a V2 checkpoint: the uuid manifest and " +
      "its sidecars survive and the read resumes through them") {
    val dir = freshDir("cleanv2")
    DeltaLake.stageCommit(spark, dir, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, frame(11 to 20), Seq.empty, 1L)
    DeltaLake.stageCheckpointV2(spark, dir, 1L)
    val cleaned = DeltaLake.cleanLog(dir)
    assert(cleaned.size == 1 &&
      cleaned.head.endsWith("00000000000000000000.json"))
    assert(ids(DeltaLake.snapshot(spark, dir)) == (1L to 20L).toSet)
    DeltaLake.stageCommit(spark, dir, frame(21 to 25), Seq.empty, 2L)
    assert(ids(DeltaLake.snapshot(spark, dir)) == (1L to 25L).toSet)
  }

  test("iceberg expireMetadata: old metadata JSON copies go, the " +
      "table keeps reading and the version counter continues") {
    val dir = freshDir("expmd")
    Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.write(spark, dir, frame(11 to 20))
    Iceberg.write(spark, dir, frame(21 to 30))
    def mdFiles(): Set[String] =
      Option(new java.io.File(dir, "metadata").listFiles()).toSeq
        .flatten.map(_.getName)
        .filter(_.endsWith(".metadata.json")).toSet
    assert(mdFiles().size == 3)
    val gone = Iceberg.expireMetadata(dir, keepLast = 1)
    assert(gone.size == 2)
    assert(mdFiles() == Set("v3.metadata.json"))
    // reads (current AND time travel — snapshots live in the current
    // file) still work, and the next commit numbers PAST the expired
    // window
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 30L).toSet)
    Iceberg.write(spark, dir, frame(31 to 35))
    assert(mdFiles().contains("v4.metadata.json"))
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 35L).toSet)
    val e = intercept[IllegalArgumentException] {
      Iceberg.expireMetadata(dir, keepLast = 0)
    }
    assert(e.getMessage.contains("keepLast"))
  }

  test("iceberg rewriteManifests no-ops on a fresh or single-manifest " +
      "table") {
    val dir = freshDir("rwnoop")
    Iceberg.write(spark, dir, frame(1 to 10))
    assert(Iceberg.rewriteManifests(spark, dir) == -1L)
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 10L).toSet)
  }
}
