package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Merge-on-read positional deletes: a delete-manifest snapshot reads
  * data-minus-positions, repeated MoR deletes accumulate, COW rewrites
  * compose with prior delete files, time travel resolves pre-delete
  * state, the SIGNED window nets new positional deletes to exactly the
  * newly-dead rows (r11 — the inserts-only seams still fail fast),
  * delete-file REMOVALS attribute through the row-identity diff
  * (compaction = zero rows, undelete = insert frame), and the
  * version-cut δ cycle's index-native cut pushes through the MoR
  * anti-join. (Equality deletes: IcebergEqDeleteSpec.)
  */
class IcebergMorSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_mor_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("MoR delete: snapshot subtracts positions; accumulates; time travel") {
    val dir = freshDir("basic")
    val a = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val b = (61L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, a, Seq.empty)
    val s2 = Iceberg.stageAppend(spark, dir, b, Seq.empty)
    val s3 = Iceberg.stageMorDelete(spark, dir, col("id") % 10 === 0)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (1L to 100L).filterNot(_ % 10 == 0).toSet)
    // pre-delete snapshots still read whole files
    assert(ids(Iceberg.snapshot(spark, dir, Some(s2))) == (1L to 100L).toSet)
    assert(ids(Iceberg.snapshot(spark, dir, Some(s1))) == (1L to 60L).toSet)
    // a second MoR delete accumulates (and skips already-dead rows)
    val s4 = Iceberg.stageMorDelete(spark, dir, col("id") <= 15)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (16L to 100L).filterNot(_ % 10 == 0).toSet)
    assert(ids(Iceberg.snapshot(spark, dir, Some(s3))) ==
      (1L to 100L).filterNot(_ % 10 == 0).toSet)
    assert(s4 > s3)
  }

  test("MoR deletes respect partition values in the predicate") {
    val dir = freshDir("part")
    val df = (1L to 90L).map(i => (i, s"p${i % 3}")).toDF("id", "p")
      .coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq("p"))
    Iceberg.stageMorDelete(spark, dir,
      col("p") === "p1" && col("id") % 2 === 0)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (1L to 90L).filterNot(i => i % 3 == 1 && i % 2 == 0).toSet)
    // predicate pushdown path composes with the anti-join
    assert(ids(Iceberg.snapshotWhere(spark, dir, col("id") <= 30)) ==
      (1L to 30L).filterNot(i => i % 3 == 1 && i % 2 == 0).toSet)
  }

  test("incremental seams: append after MoR ok; MoR window NETS in " +
      "changes, fails fast in the inserts-only seams") {
    val dir = freshDir("seam")
    val a = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)
    val s2 = Iceberg.stageMorDelete(spark, dir, col("id") % 4 === 0)
    // pure append AFTER the MoR delete: the delete-file set is stable
    // across the window, so the inserts-only delta is exact
    val b = (41L to 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s3 = Iceberg.stageAppend(spark, dir, b, Seq.empty)
    assert(Iceberg.isAppendOnly(spark, dir, s2, s3))
    assert(ids(Iceberg.appended(spark, dir, s2)) == (41L to 50L).toSet)
    // a window CROSSING the MoR delete: the inserts-only seams cannot
    // express the retraction and stay loud...
    val s1 = Iceberg.snapshotIds(dir).head
    assert(!Iceberg.isAppendOnly(spark, dir, s1, s2))
    val e1 = intercept[IllegalArgumentException] {
      Iceberg.appended(spark, dir, s1)
    }
    assert(e1.getMessage.contains("delete"))
    // ...but the SIGNED window nets it: retracts are exactly the rows
    // the new delete file names, inserts empty (no new data file)
    val ch = Iceberg.changes(spark, dir, s1, Some(s2))
    assert(ch.inserts.isEmpty)
    assert(ids(ch.retracts) == (1L to 40L).filter(_ % 4 == 0).toSet)
  }

  test("accumulating MoR deletes: the window retracts only NEWLY-dead " +
      "rows (already-deleted positions never over-retract)") {
    val dir = freshDir("accum")
    val df = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    val s2 = Iceberg.stageMorDelete(spark, dir, col("id") % 10 === 0)
    val s3 = Iceberg.stageMorDelete(spark, dir, col("id") <= 15)
    // (s2, s3]: the second delete names ids 1..15, but 10 was already
    // dead at the cut — retract exactly the 14 newly-dead rows
    val ch = Iceberg.changes(spark, dir, s2, Some(s3))
    assert(ch.inserts.isEmpty)
    assert(ids(ch.retracts) == (1L to 15L).filterNot(_ == 10L).toSet)
    // end-to-end identity: cut state − retracts = end state
    val cutState = ids(Iceberg.snapshot(spark, dir, Some(s2)))
    val endState = ids(Iceberg.snapshot(spark, dir, Some(s3)))
    assert(cutState -- ids(ch.retracts) == endState)
  }

  test("mixed MoR window: appends + a delete naming old AND new files") {
    val dir = freshDir("mix")
    val a = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, a, Seq.empty)
    val b = (31L to 45L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, b, Seq.empty)
    // the delete hits rows in the cut-live file (id 6,12,..,30) AND in
    // the window-added file (id 36,42)
    val s3 = Iceberg.stageMorDelete(spark, dir, col("id") % 6 === 0)
    val ch = Iceberg.changes(spark, dir, s1, Some(s3))
    // inserts: the new file's rows MINUS the deletes born onto it
    assert(ids(ch.inserts) == (31L to 45L).filterNot(_ % 6 == 0).toSet)
    // retracts: only the cut-live file's newly-dead rows
    assert(ids(ch.retracts) == (1L to 30L).filter(_ % 6 == 0).toSet)
    // signed identity against the end snapshot
    val endState = ids(Iceberg.snapshot(spark, dir, Some(s3)))
    assert((ids(Iceberg.snapshot(spark, dir, Some(s1)))
      ++ ids(ch.inserts)) -- ids(ch.retracts) == endState)
  }

  test("signed MoR window plans only the data files the deletes NAME") {
    val dir = freshDir("prune")
    // four separate data files, ten rows each
    (0 until 4).foreach { k =>
      val df = (k * 10 + 1L to k * 10 + 10L).map(i => (i, s"v$i"))
        .toDF("id", "v").coalesce(1)
      Iceberg.stageAppend(spark, dir, df, Seq.empty)
    }
    val cut = Iceberg.currentSnapshotId(dir)
    val sDel = Iceberg.stageMorDelete(spark, dir, col("id") === 15L)
    val ch = Iceberg.changes(spark, dir, cut, Some(sDel))
    assert(ids(ch.retracts) == Set(15L))
    // the retract arm scans exactly ONE of the four data files — the
    // one the delete row names (the delete file itself rides the
    // broadcast side, which is churn-sized by construction); at 100 TB
    // this is the difference between a churn-sized frame and a
    // snapshot scan
    val scanned = ch.retracts.inputFiles.toSet
      .filterNot(f => new java.io.File(f).getName.startsWith("delete-"))
    assert(scanned.size == 1, s"retract arm scanned $scanned")
    assert(new java.io.File(scanned.head).getName.nonEmpty)
  }

  test("equality deletes landing in a signed window NET (r11): " +
      "retracts are the value-matched rows live at the cut") {
    val dir = freshDir("eqwin")
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, df, Seq.empty)
    val s2 = Iceberg.stageEqDelete(spark, dir, Seq(3L, 7L).toDF("id"))
    val ch = Iceberg.changes(spark, dir, s1, Some(s2))
    assert(ch.inserts.isEmpty)
    assert(ids(ch.retracts) == Set(3L, 7L))
    // end-state identity
    assert(ids(Iceberg.snapshot(spark, dir, Some(s1))) --
      ids(ch.retracts) == ids(Iceberg.snapshot(spark, dir, Some(s2))))
  }

  test("mixed positional + equality window: no row retracts twice") {
    val dir = freshDir("mixwin")
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, df, Seq.empty)
    // positional delete kills ids 4,8,12,16,20; equality delete kills
    // ids 4 (overlap!) and 5
    Iceberg.stageMorDelete(spark, dir, col("id") % 4 === 0)
    val s3 = Iceberg.stageEqDelete(spark, dir, Seq(4L, 5L).toDF("id"))
    val ch = Iceberg.changes(spark, dir, s1, Some(s3))
    assert(ch.inserts.isEmpty)
    // the row-identity diff retracts id 4 exactly ONCE
    val retractIds = ch.retracts.select("id").collect().map(_.getLong(0))
    assert(retractIds.length == retractIds.distinct.length,
      s"a row retracted twice: ${retractIds.sorted.mkString(",")}")
    assert(retractIds.toSet == Set(4L, 5L, 8L, 12L, 16L, 20L))
  }

  test("delete-file COMPACTION window nets to ZERO rows (r11): the " +
      "merged delete file kills the same positions") {
    val dir = freshDir("cmp")
    val df = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageMorDelete(spark, dir, col("id") % 10 === 0)
    val cut = Iceberg.stageMorDelete(spark, dir, col("id") <= 5)
    val sc = Iceberg.stageCompactDeletes(spark, dir)
    // the compaction is a content no-op for plain reads...
    assert(ids(Iceberg.snapshot(spark, dir, Some(sc))) ==
      ids(Iceberg.snapshot(spark, dir, Some(cut))))
    // ...and the signed window attributes it as zero rows in both
    // directions (previously a fail-fast: rebase on any removal)
    val ch = Iceberg.changes(spark, dir, cut, Some(sc))
    assert(ch.inserts.isEmpty, "a compaction must not insert")
    assert(ch.retracts.isEmpty, "a compaction must not retract")
  }

  test("UNDELETE window (r11): the removed delete file's rows come " +
      "back through the INSERT frame") {
    val dir = freshDir("und")
    val df = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageMorDelete(spark, dir, col("id") % 10 === 0)
    val cut = Iceberg.stageMorDelete(spark, dir, col("id") <= 5)
    val su = Iceberg.stageUndelete(spark, dir) // drops the <=5 file
    assert(ids(Iceberg.snapshot(spark, dir, Some(su))) ==
      (1L to 40L).filterNot(_ % 10 == 0).toSet)
    val ch = Iceberg.changes(spark, dir, cut, Some(su))
    assert(ch.retracts.isEmpty, "an undelete must not retract")
    assert(ids(ch.inserts) == (1L to 5L).toSet,
      "inserts must be exactly the resurrected rows")
    // signed identity: cut state + inserts = end state
    assert(ids(Iceberg.snapshot(spark, dir, Some(cut))) ++
      ids(ch.inserts) == ids(Iceberg.snapshot(spark, dir, Some(su))))
  }

  test("compaction + NEW delete in ONE window nets exactly the newly-" +
      "dead rows (the removal never masks or doubles the new delete)") {
    val dir = freshDir("cmpnew")
    val df = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageMorDelete(spark, dir, col("id") % 10 === 0)
    val cut = Iceberg.stageMorDelete(spark, dir, col("id") <= 5)
    Iceberg.stageCompactDeletes(spark, dir)
    val s3 = Iceberg.stageMorDelete(spark, dir, col("id") % 7 === 0)
    val ch = Iceberg.changes(spark, dir, cut, Some(s3))
    assert(ch.inserts.isEmpty)
    val retractIds = ch.retracts.select("id").collect().map(_.getLong(0))
    assert(retractIds.length == retractIds.distinct.length,
      s"a row retracted twice: ${retractIds.sorted.mkString(",")}")
    assert(retractIds.toSet == Set(7L, 14L, 21L, 28L, 35L))
    // signed identity against the end snapshot
    assert(ids(Iceberg.snapshot(spark, dir, Some(cut))) --
      retractIds.toSet == ids(Iceberg.snapshot(spark, dir, Some(s3))))
  }

  test("COW rewrite composes after a MoR delete (delete file kept live)") {
    val dir = freshDir("cow")
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageMorDelete(spark, dir, col("id") % 5 === 0)
    // a copy-on-write UPDATE rewrites the file: the rewritten file has a
    // NEW path no delete row names, and the old file leaves the live
    // set, so the delete file becomes inert for it — but stays live in
    // the manifest list without breaking the read
    Iceberg.stageUpdate(spark, dir, col("id") === 1,
      Map("v" -> org.apache.spark.sql.functions.lit("updated")))
    val snap = Iceberg.snapshot(spark, dir)
    // the rewrite merges the live delete positions first (a raw
    // physical copy would RESURRECT MoR-deleted rows), so the final
    // state is exactly: MoR deletes applied, then the update
    assert(snap.filter(col("id") === 1).select("v").head().getString(0)
      == "updated")
    assert(ids(snap) == (1L to 50L).filterNot(_ % 5 == 0).toSet)
  }

  test("single-row MoR delete: the minimal positional-delete shape") {
    val dir = freshDir("eq")
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageMorDelete(spark, dir, col("id") === 1)
    assert(ids(Iceberg.snapshot(spark, dir)) == (2L to 10L).toSet)
  }

  test("version-cut incremental cycle over a MoR table (stable deletes)") {
    import graft.ivm.{IcebergSnapshots, Ivm}
    val dir = freshDir("cut")
    val a = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)
    val s2 = Iceberg.stageMorDelete(spark, dir, col("id") % 3 === 0)
    // track at the post-delete snapshot; the stored view saw the MoR
    // state — appends after it keep the delete-file set stable, so the
    // file-set cut stays exact and the δ arm pushes the index-native
    // cut through the MoR anti-join to the data scan
    IcebergSnapshots.track(spark, "mor_cut", dir, at = Some(s2))
    IcebergSnapshots.view(spark, "mor_cut")
    assert(Ivm.delta(spark.table("mor_cut").select("id", "v"))
      .count() == 0)
    val b = (31L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, b, Seq.empty)
    IcebergSnapshots.view(spark, "mor_cut")
    val delta = Ivm.delta(spark.table("mor_cut").select("id", "v"))
    assert(ids(delta.toDF("id", "v")) == (31L to 40L).toSet,
      "delta must be exactly the appended rows")
    // the base arm still subtracts the MoR positions
    val base = Ivm.baseOf(spark.table("mor_cut").select("id", "v"))
    assert(ids(base.toDF("id", "v")) ==
      (1L to 30L).filterNot(_ % 3 == 0).toSet)
  }
}
