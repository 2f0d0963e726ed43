package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** V2 checkpoints (uuid-named manifest + `_sidecars/` parquet): resume
  * with the subsumed JSON commits deleted for BOTH manifest formats
  * (parquet rows and json lines), multi-sidecar splits, deletion
  * vectors through sidecars, a missing sidecar failing loudly, and a
  * classic checkpoint winning over a v2 at the same version.
  */
class V2CheckpointSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_v2_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def staged(): String = {
    val dir = freshDir("base")
    DeltaLake.stageCommit(spark, dir,
      (1L to 30L).map(i => (i, s"v$i", s"g${i % 2}"))
        .toDF("id", "v", "p").coalesce(1), Seq("p"), 0L)
    DeltaLake.stageCommit(spark, dir,
      (31L to 40L).map(i => (i, s"v$i", s"g${i % 2}"))
        .toDF("id", "v", "p").coalesce(1), Seq("p"), 1L)
    dir
  }

  private def dropCommits(dir: String, vs: Seq[Long]): Unit =
    vs.foreach { v =>
      assert(new java.io.File(s"$dir/_delta_log", f"$v%020d.json").delete())
    }

  test("v2 parquet manifest: resume with subsumed commits deleted") {
    val dir = staged()
    DeltaLake.stageCheckpointV2(spark, dir, 1L, sidecars = 3)
    dropCommits(dir, Seq(0L, 1L))
    val snap = DeltaLake.snapshot(spark, dir)
    assert(ids(snap) == (1L to 40L).toSet)
    // partition values and stats survive through the sidecars
    assert(DeltaLake.snapshotWhere(spark, dir, col("p") === "g0")
      .count() == 20)
    assert(DeltaLake.snapshotWhere(spark, dir, col("id") > 30L)
      .inputFiles.length < snap.inputFiles.length)
  }

  test("v2 json manifest: resume with subsumed commits deleted") {
    val dir = staged()
    DeltaLake.stageCheckpointV2(spark, dir, 1L, sidecars = 2,
      jsonManifest = true)
    dropCommits(dir, Seq(0L, 1L))
    assert(ids(DeltaLake.snapshot(spark, dir)) == (1L to 40L).toSet)
    // appends after the checkpoint still fold on top
    DeltaLake.stageCommit(spark, dir,
      Seq((41L, "v41", "g1")).toDF("id", "v", "p").coalesce(1),
      Seq("p"), 2L)
    assert(ids(DeltaLake.snapshot(spark, dir)) == (1L to 41L).toSet)
  }

  test("deletion vectors survive a v2 checkpoint's sidecars") {
    val dir = freshDir("dv")
    DeltaLake.stageCommit(spark, dir,
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      Seq.empty, 0L)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") % 5 === 0, 1L)
    DeltaLake.stageCheckpointV2(spark, dir, 1L)
    dropCommits(dir, Seq(0L, 1L))
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (1L to 50L).filterNot(_ % 5 == 0).toSet)
  }

  test("a missing sidecar fails loudly, never a partial snapshot") {
    val dir = staged()
    DeltaLake.stageCheckpointV2(spark, dir, 1L, sidecars = 2)
    dropCommits(dir, Seq(0L, 1L))
    val sc = new java.io.File(s"$dir/_delta_log/_sidecars")
      .listFiles().head
    assert(sc.delete())
    val e = intercept[IllegalArgumentException] {
      DeltaLake.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("sidecar missing"))
  }

  test("a classic checkpoint at the same version wins (single read)") {
    val dir = staged()
    DeltaLake.stageCheckpointV2(spark, dir, 1L)
    DeltaLake.stageCheckpoint(spark, dir, 1L)
    dropCommits(dir, Seq(0L, 1L))
    assert(ids(DeltaLake.snapshot(spark, dir)) == (1L to 40L).toSet)
  }
}
