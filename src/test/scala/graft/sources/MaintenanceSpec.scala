package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Table maintenance: Delta VACUUM (delete files no retained version
  * references — superseded rewrites go, current reads survive, DV
  * sidecars of retained versions are protected, expired time travel
  * fails loudly) and Iceberg EXPIRE SNAPSHOTS (ref-pinned snapshots
  * protected, shared assets survive, expired resolution loud).
  */
class MaintenanceSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_maint_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("delta vacuum: superseded rewrite files go, current reads " +
      "survive, expired time travel fails loudly, dry-run touches " +
      "nothing") {
    val dir = freshDir("vac")
    DeltaLake.stageCommit(spark, dir, frame(1 to 30), Seq.empty, 0L)
    // a COW delete supersedes the original file (rewrite pair)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") % 3 === 0, 1L)
    val before = ids(DeltaLake.snapshot(spark, dir))
    assert(before == (1L to 30L).filterNot(_ % 3 == 0).toSet)
    // version 0 still time-travels pre-vacuum
    assert(ids(DeltaLake.snapshot(spark, dir, Some(0L))) ==
      (1L to 30L).toSet)
    // dry run names the superseded file and deletes nothing
    val planned = DeltaLake.vacuum(spark, dir, retainVersions = 1,
      dryRun = true)
    assert(planned.nonEmpty)
    assert(planned.forall(p => new java.io.File(p).exists()))
    assert(ids(DeltaLake.snapshot(spark, dir, Some(0L))) ==
      (1L to 30L).toSet, "dry run must not break time travel")
    // the real vacuum
    val deleted = DeltaLake.vacuum(spark, dir, retainVersions = 1)
    assert(deleted == planned)
    assert(deleted.forall(p => !new java.io.File(p).exists()))
    // current version reads identically
    assert(ids(DeltaLake.snapshot(spark, dir)) == before)
    // expired version fails LOUDLY, never partial rows
    val e = intercept[Exception] {
      DeltaLake.snapshot(spark, dir, Some(0L)).collect()
    }
    assert(e.toString.toLowerCase.contains("exist") ||
      e.toString.contains("missing"), e.toString)
  }

  test("delta vacuum: retainVersions keeps the horizon readable; DV " +
      "sidecars of retained versions survive") {
    val dir = freshDir("vac2")
    DeltaLake.stageCommit(spark, dir, frame(1 to 30), Seq.empty, 0L)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") % 5 === 0, 1L,
      inline = false)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") === 1L, 2L)
    // retain 3 versions = everything: nothing to delete
    assert(DeltaLake.vacuum(spark, dir, retainVersions = 3).isEmpty)
    // retain 2: version 1 (DV on the original file) must stay readable
    // — its data file AND its DV sidecar are referenced
    DeltaLake.vacuum(spark, dir, retainVersions = 2)
    assert(ids(DeltaLake.snapshot(spark, dir, Some(1L))) ==
      (1L to 30L).filterNot(_ % 5 == 0).toSet,
      "the retained DV version must survive vacuum")
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (2L to 30L).filterNot(_ % 5 == 0).toSet)
  }

  test("delta vacuum: time horizon (retainMs) keeps young versions " +
      "and the head; aged-out history goes; retainMs = 0 keeps head " +
      "only") {
    val dir = freshDir("vact")
    DeltaLake.stageCommit(spark, dir, frame(1 to 20), Seq.empty, 0L)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") % 4 === 0, 1L)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") === 1L, 2L)
    // age commits 0 and 1 two hours into the past (mtime is the
    // timestamp source for non-ICT commits — versionAt's resolution)
    val old = System.currentTimeMillis() - 2 * 3600 * 1000L
    Seq(0L, 1L).foreach { v =>
      assert(new java.io.File(dir,
        "_delta_log/" + f"$v%020d.json").setLastModified(old))
    }
    // a one-hour horizon: only v2 (fresh) survives — v0/v1 history
    // reclaims even though retainVersions was not given
    val deleted = DeltaLake.vacuum(spark, dir,
      retainMs = Some(3600 * 1000L))
    assert(deleted.nonEmpty)
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (2L to 20L).filterNot(_ % 4 == 0).toSet)
    val e = intercept[Exception] {
      DeltaLake.snapshot(spark, dir, Some(0L)).collect()
    }
    assert(e.toString.toLowerCase.contains("exist") ||
      e.toString.contains("missing"), e.toString)
    // a large horizon on a fresh table deletes nothing
    val d2 = freshDir("vact2")
    DeltaLake.stageCommit(spark, d2, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageDeleteCommit(spark, d2, col("id") === 2L, 1L)
    assert(DeltaLake.vacuum(spark, d2,
      retainMs = Some(24 * 3600 * 1000L)).isEmpty)
    assert(ids(DeltaLake.snapshot(spark, d2, Some(0L))) ==
      (1L to 10L).toSet)
  }

  test("delta vacuum: CHANGE DATA files of retained commits survive " +
      "(a CDF window inside the horizon must stay readable)") {
    val dir = freshDir("vac3")
    DeltaLake.stageCommit(spark, dir, frame(1 to 20), Seq.empty, 0L)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") % 4 === 0, 1L,
      cdf = true)
    // retain BOTH versions: nothing may be deleted except v0's
    // superseded file... which v0 itself references — so nothing
    val planned = DeltaLake.vacuum(spark, dir, retainVersions = 2,
      dryRun = true)
    assert(planned.isEmpty,
      s"fully-retained table must vacuum nothing, planned: $planned")
    // retain only v1: the superseded data file goes, the cdc file of
    // the RETAINED commit must stay readable through changes()
    DeltaLake.vacuum(spark, dir, retainVersions = 1)
    val ch = DeltaLake.changes(spark, dir, 0L, Some(1L))
    assert(ids(ch.retracts) == Set(4L, 8L, 12L, 16L, 20L),
      "the retained commit's change files must survive vacuum")
  }

  test("iceberg expire: ref-pinned snapshots survive however old; " +
      "expired resolution is loud; current reads unchanged") {
    val dir = freshDir("exp")
    val s1 = Iceberg.stageAppend(spark, dir, frame(1 to 10), Seq.empty)
    val s2 = Iceberg.stageAppend(spark, dir, frame(11 to 20), Seq.empty)
    // a COW delete makes s3; s1/s2's superseded assets become
    // expirable
    val s3 = Iceberg.stageDelete(spark, dir, col("id") % 4 === 0)
    Iceberg.stageRef(dir, "pin", s1) // audit tag on the OLDEST
    // dry run: with the tag, only s2's exclusive assets are doomed
    val planned = Iceberg.expireSnapshots(spark, dir, keepLast = 1,
      dryRun = true)
    assert(Iceberg.snapshot(spark, dir, Some(s2)).count() == 20,
      "dry run must not expire anything")
    val deleted = Iceberg.expireSnapshots(spark, dir, keepLast = 1)
    assert(deleted == planned)
    // current unchanged; the tagged snapshot still reads in full
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (1L to 20L).filterNot(_ % 4 == 0).toSet)
    assert(ids(Iceberg.snapshotRef(spark, dir, "pin")) ==
      (1L to 10L).toSet, "the tag must protect its snapshot")
    assert(ids(Iceberg.snapshot(spark, dir, Some(s1))) ==
      (1L to 10L).toSet)
    // the un-pinned middle snapshot is GONE — loud resolution
    val e = intercept[IllegalArgumentException] {
      Iceberg.snapshot(spark, dir, Some(s2)).collect()
    }
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
    assert(s3 > s2)
  }

  test("delta compact: fragments merge per partition as a content " +
      "no-op; DVs materialize; the signed seam sees nothing; vacuum " +
      "then reclaims") {
    val dir = freshDir("cmp")
    // 4 fragment files per partition value
    (0 until 4).foreach { k =>
      DeltaLake.stageCommit(spark,
        dir, frame(k * 10 + 1 to k * 10 + 10)
          .withColumn("p", col("id") % 2), Seq("p"), k.toLong)
    }
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") % 10 === 0, 4L)
    val before = ids(DeltaLake.snapshot(spark, dir))
    val beforeFiles = DeltaLake.snapshot(spark, dir).inputFiles.length
    val v = DeltaLake.compact(spark, dir)
    assert(v == 5L)
    // content identical, file count collapsed to one per partition
    assert(ids(DeltaLake.snapshot(spark, dir)) == before)
    assert(DeltaLake.snapshot(spark, dir).inputFiles.length == 2,
      s"expected 2 compacted files, had $beforeFiles before")
    // the signed seam reads the compaction window as a no-op
    val ch = DeltaLake.changes(spark, dir, 4L, Some(5L))
    assert(ch.inserts.isEmpty && ch.retracts.isEmpty,
      "a compaction window must net to zero")
    // DVs materialized: the compacted files carry no deletionVector
    val lastCommit = java.nio.file.Files.readString(new java.io.File(
      dir, "_delta_log/00000000000000000005.json").toPath)
    assert(!lastCommit.contains("deletionVector"),
      "compaction must materialize DVs, not carry them")
    // vacuum reclaims the fragments; current still reads
    val deleted = DeltaLake.vacuum(spark, dir, retainVersions = 1)
    assert(deleted.nonEmpty)
    assert(ids(DeltaLake.snapshot(spark, dir)) == before)
    // idempotent: nothing left to compact
    assert(DeltaLake.compact(spark, dir) == -1L)
  }

  test("iceberg rewriteDataFiles: fragments merge, row-level deletes " +
      "materialize, the window nets to zero, expire reclaims") {
    val dir = freshDir("rw")
    (0 until 4).foreach { k =>
      Iceberg.stageAppend(spark, dir,
        frame(k * 10 + 1 to k * 10 + 10), Seq.empty)
    }
    Iceberg.stageDv(spark, dir, col("id") % 10 === 0)
    val cut = Iceberg.currentSnapshotId(dir)
    val before = ids(Iceberg.snapshot(spark, dir))
    val sid = Iceberg.rewriteDataFiles(spark, dir)
    assert(sid > cut)
    assert(ids(Iceberg.snapshot(spark, dir)) == before)
    assert(Iceberg.snapshot(spark, dir).inputFiles.length == 1,
      "four fragments must compact to one")
    // the signed window nets to zero (rewrite-sized, not failing)
    val ch = Iceberg.changes(spark, dir, cut, Some(sid))
    assert(ids(ch.inserts) == ids(ch.retracts),
      "a compaction window must net to zero")
    // expire reclaims the old snapshots' exclusive assets
    val deleted = Iceberg.expireSnapshots(spark, dir, keepLast = 1)
    assert(deleted.nonEmpty)
    assert(ids(Iceberg.snapshot(spark, dir)) == before)
    assert(Iceberg.rewriteDataFiles(spark, dir) == -1L)
  }

  test("a rewrite built from STALE state fails loudly at commit " +
      "(the expectBase guard — a silent build-over would resurrect " +
      "concurrently-deleted rows)") {
    // the Delta side's protection is the version pin + exclusive
    // hard-link (any commit visible at replay shifts the target; one
    // landing inside the window collides — pinned by the sink's
    // racing-writers spec). The ICEBERG side's shifted-version race
    // needs the expectBase check, driven through its test seam since
    // the in-call window cannot be interleaved externally.
    val idir = freshDir("race_i")
    (0 until 2).foreach { k =>
      Iceberg.stageAppend(spark, idir,
        frame(k * 10 + 1 to k * 10 + 10), Seq.empty)
    }
    val stale = Iceberg.currentSnapshotId(idir)
    // the table advances after "resolution"
    Iceberg.stageDelete(spark, idir, col("id") === 5L)
    val e = intercept[java.util.ConcurrentModificationException] {
      Iceberg.commitSnapshotForTest(spark, idir, stale)
    }
    assert(e.getMessage.contains("advanced"))
    // a rewrite with FRESH state still commits fine
    assert(Iceberg.rewriteDataFiles(spark, idir) > 0)
    assert(ids(Iceberg.snapshot(spark, idir)) ==
      (1L to 20L).toSet - 5L)
  }

  test("iceberg expire: shared data files survive when any retained " +
      "snapshot's manifests mention them") {
    val dir = freshDir("exp2")
    Iceberg.stageAppend(spark, dir, frame(1 to 10), Seq.empty)
    val s2 = Iceberg.stageAppend(spark, dir, frame(11 to 20), Seq.empty)
    // s2 shares s1's data file through the carried-forward manifest;
    // expiring s1 must not delete it
    Iceberg.expireSnapshots(spark, dir, keepLast = 1)
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 20L).toSet,
      "shared files must survive the older snapshot's expiry")
    assert(ids(Iceberg.snapshot(spark, dir, Some(s2))) ==
      (1L to 20L).toSet)
  }

  test("delta vacuum skips writer scratch directories and minFileAgeMs " +
      "protects landed-but-uncommitted files") {
    val dir = freshDir("vacskip")
    DeltaLake.stageCommit(spark, dir, frame(1 to 20), Seq.empty, 0L)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") % 2 === 0, 1L)
    // a concurrent writer's staging scratch: files here are about to
    // be renamed into the table — deleting them breaks its commit
    val land = new java.io.File(dir, "_land_tmp_race")
    land.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(land, "part-0.parquet").toPath, "staged")
    val comp = new java.io.File(dir, "_compact_tmp_9")
    comp.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(comp, "part-0.parquet").toPath, "staged")
    // a racing write()'s already-landed-but-not-yet-committed file:
    // unreferenced by any version, but BRAND NEW — the age guard's case
    val landed = new java.io.File(dir, "landed-uncommitted.parquet")
    java.nio.file.Files.writeString(landed.toPath, "landed")
    val aged = DeltaLake.vacuum(spark, dir, retainVersions = 1,
      dryRun = true, minFileAgeMs = 3600000L)
    assert(!aged.exists(_.contains("_land_tmp_")) &&
      !aged.exists(_.contains("_compact_tmp_")),
      s"scratch dirs must never be walked: $aged")
    assert(!aged.exists(_.contains("landed-uncommitted")),
      s"a fresh unreferenced file is inside the age horizon: $aged")
    // without the age guard the orphan IS vacuumable — but scratch
    // dirs stay protected regardless
    val deleted = DeltaLake.vacuum(spark, dir, retainVersions = 1)
    assert(deleted.exists(_.contains("landed-uncommitted")))
    assert(new java.io.File(land, "part-0.parquet").exists() &&
      new java.io.File(comp, "part-0.parquet").exists(),
      "vacuum deleted a concurrent writer's staged files")
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (1L to 20L).filterNot(_ % 2 == 0).toSet)
  }

  test("iceberg metadata maintenance writers commit EXCLUSIVELY — the " +
      "losing racer fails loudly and the winner's content is never " +
      "clobbered") {
    // expire/stageRef compute their target version INSIDE the call, so
    // the read→write race cannot be wedged externally; this pins the
    // exclusive-commit seam they now route through (a plain
    // Files.writeString here was the r11 lost-update finding)
    val dir = freshDir("expexcl")
    Iceberg.stageAppend(spark, dir, frame(1 to 10), Seq.empty)
    val mdDir = new java.io.File(dir, "metadata")
    val winner = new java.io.File(mdDir, "v777.metadata.json")
    java.nio.file.Files.writeString(winner.toPath, """{"winner":true}""")
    intercept[java.util.ConcurrentModificationException] {
      Iceberg.writeMetadataExclusive(winner.toPath, """{"loser":true}""")
    }
    assert(java.nio.file.Files.readString(winner.toPath) ==
      """{"winner":true}""", "the losing write clobbered the winner")
    // and the loser leaves no temp litter behind
    assert(!Option(mdDir.listFiles()).toSeq.flatten
      .exists(_.getName.endsWith(".tmp")))
  }
}
