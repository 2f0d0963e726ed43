package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Equality deletes (v2 merge-on-read, the CDC/upsert shape): matching
  * rows of OLDER data files delete; rows inserted at or after the
  * delete's sequence number survive (the property that makes
  * delete-then-insert upsert streams correct); multi-column equality
  * sets, null-safe matching, and composition with positional deletes.
  */
class IcebergEqDeleteSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_eq_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("equality delete removes matching rows of older files only") {
    val dir = freshDir("upsert")
    val a = (1L to 10L).map(i => (i, s"old$i")).toDF("k", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)             // seq 1
    Iceberg.stageEqDelete(spark, dir, Seq(3L, 7L).toDF("k"))  // seq 2
    assert(rows(Iceberg.snapshot(spark, dir)) ==
      (1L to 10L).filterNot(i => i == 3 || i == 7)
        .map(i => (i, s"old$i")).toSet)
    // the UPSERT: re-insert k=3 AFTER the delete — it must survive
    // (sequence 3 > the delete's 2), while old k=3 stays deleted
    val b = Seq((3L, "new3"), (11L, "new11")).toDF("k", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, b, Seq.empty)             // seq 3
    val got = rows(Iceberg.snapshot(spark, dir))
    assert(got.contains((3L, "new3")), "re-inserted row must survive")
    assert(!got.contains((3L, "old3")), "pre-delete row must stay dead")
    assert(got == ((1L to 10L).filterNot(i => i == 3 || i == 7)
      .map(i => (i, s"old$i")).toSet ++ Set((3L, "new3"), (11L, "new11"))))
    // a SECOND eq delete (seq 4) kills the re-inserted row too
    Iceberg.stageEqDelete(spark, dir, Seq(3L).toDF("k"))      // seq 4
    assert(!rows(Iceberg.snapshot(spark, dir)).exists(_._1 == 3L))
  }

  test("signed window across an equality UPSERT: retracts value-matched " +
      "cut-live rows, inserts the re-inserted survivors") {
    val dir = freshDir("sigup")
    val a = (1L to 10L).map(i => (i, s"old$i")).toDF("k", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, a, Seq.empty)
    Iceberg.stageEqDelete(spark, dir, Seq(3L, 7L).toDF("k"))
    val b = Seq((3L, "new3"), (11L, "new11")).toDF("k", "v").coalesce(1)
    val s3 = Iceberg.stageAppend(spark, dir, b, Seq.empty)
    val ch = Iceberg.changes(spark, dir, s1, Some(s3))
    // inserts: the upsert file's rows — the new k=3 SURVIVES its own
    // window's delete (sequence scoping applied on the insert arm)
    assert(rows(ch.inserts) == Set((3L, "new3"), (11L, "new11")))
    // retracts: exactly the cut-live rows the delete values matched
    assert(rows(ch.retracts) == Set((3L, "old3"), (7L, "old7")))
    // signed identity against the end snapshot
    assert((rows(Iceberg.snapshot(spark, dir, Some(s1)))
      ++ rows(ch.inserts)) -- rows(ch.retracts) ==
      rows(Iceberg.snapshot(spark, dir, Some(s3))))
  }

  test("signed equality window prunes to bounds-intersecting files") {
    val dir = freshDir("sigprune")
    // four files with disjoint key ranges
    (0 until 4).foreach { f =>
      val df = (f * 10 + 1L to f * 10 + 10L).map(i => (i, s"v$i"))
        .toDF("k", "v").coalesce(1)
      Iceberg.stageAppend(spark, dir, df, Seq.empty)
    }
    val cut = Iceberg.currentSnapshotId(dir)
    val sDel = Iceberg.stageEqDelete(spark, dir, Seq(15L).toDF("k"))
    val ch = Iceberg.changes(spark, dir, cut, Some(sDel))
    assert(rows(ch.retracts) == Set((15L, "v15")))
    // only the file whose [11,20] bounds contain 15 is scanned (plus
    // no delete-file scan on the retract arm — values ride the plan)
    val scanned = ch.retracts.inputFiles.toSet
      .filterNot(f => new java.io.File(f).getName.startsWith("eqdelete"))
    assert(scanned.size <= 2, s"retract arm scanned $scanned")
  }

  test("multi-column equality set and null-safe matching") {
    val dir = freshDir("multi")
    val a = Seq((1L, "x", Some("p")), (2L, "x", None),
        (3L, "y", Some("p")), (4L, "y", None))
      .toDF("k", "v", "tag").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)
    // delete on (v, tag): ("x", null) must match row 2 ONLY (null-safe)
    Iceberg.stageEqDelete(spark, dir,
      Seq(("x", Option.empty[String])).toDF("v", "tag"))
    val left = Iceberg.snapshot(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(left == Set(1L, 3L, 4L))
  }

  test("equality and positional deletes compose on one snapshot") {
    val dir = freshDir("mix")
    val a = (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)
    Iceberg.stageMorDelete(spark, dir, col("k") % 5 === 0)
    Iceberg.stageEqDelete(spark, dir, Seq(1L, 2L).toDF("k"))
    assert(rows(Iceberg.snapshot(spark, dir)).map(_._1) ==
      (3L to 20L).filterNot(_ % 5 == 0).toSet)
    // seams: the delete-file set changed → windows crossing it refuse
    val s1 = Iceberg.snapshotIds(dir).head
    assert(!Iceberg.isAppendOnly(spark, dir, s1,
      Iceberg.currentSnapshotId(dir)))
  }
}
