package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Snapshot references (branches and tags): a tag pins its snapshot
  * while the table advances past it, refs CARRY FORWARD across later
  * commits (including DML and the streaming sink's exclusive
  * commits), `main` tracks the current snapshot, and a missing ref is
  * loud and names what exists.
  */
class IcebergRefsSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_refs_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  test("a tag pins its snapshot across later appends AND deletes; " +
      "main tracks the head; refs survive commits") {
    val dir = freshDir("tag")
    val s1 = Iceberg.stageAppend(spark, dir, frame(1 to 20), Seq.empty)
    Iceberg.stageRef(dir, "v1.0", s1)
    // the table moves on: an append and a row-level delete
    Iceberg.stageAppend(spark, dir, frame(21 to 40), Seq.empty)
    Iceberg.stageDelete(spark, dir, col("id") % 5 === 0)
    // the tag still reads the PINNED snapshot
    assert(ids(Iceberg.snapshotRef(spark, dir, "v1.0")) ==
      (1L to 20L).toSet)
    // main reads the head
    assert(ids(Iceberg.snapshotRef(spark, dir, "main")) ==
      (1L to 40L).filterNot(_ % 5 == 0).toSet)
    // and the ref survived two commitSnapshot rounds (carry-forward)
    assert(Iceberg.snapshotIdForRef(dir, "v1.0") == s1)
  }

  test("a branch ref reads its own head; retargeting moves it") {
    val dir = freshDir("br")
    val s1 = Iceberg.stageAppend(spark, dir, frame(1 to 10), Seq.empty)
    val s2 = Iceberg.stageAppend(spark, dir, frame(11 to 20), Seq.empty)
    Iceberg.stageRef(dir, "audit", s1, tpe = "branch")
    assert(ids(Iceberg.snapshotRef(spark, dir, "audit")) ==
      (1L to 10L).toSet)
    Iceberg.stageRef(dir, "audit", s2, tpe = "branch")
    assert(ids(Iceberg.snapshotRef(spark, dir, "audit")) ==
      (1L to 20L).toSet)
  }

  test("a missing ref is loud and lists what exists") {
    val dir = freshDir("miss")
    val s1 = Iceberg.stageAppend(spark, dir, frame(1 to 5), Seq.empty)
    Iceberg.stageRef(dir, "v1.0", s1)
    val e = intercept[IllegalArgumentException] {
      Iceberg.snapshotRef(spark, dir, "nope").collect()
    }
    assert(e.getMessage.contains("nope") &&
      e.getMessage.contains("v1.0") && e.getMessage.contains("main"),
      e.getMessage)
    // guard rails on the fixture writer too
    intercept[IllegalArgumentException] {
      Iceberg.stageRef(dir, "main", s1)
    }
    intercept[IllegalArgumentException] {
      Iceberg.stageRef(dir, "x", 999L)
    }
  }
}
