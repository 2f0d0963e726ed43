package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Iceberg BRANCH WRITES + write-audit-publish:
  * [[Iceberg.writeToBranch]] commits to a named branch ref (main and
  * its readers untouched), parent links chain the lineage, and
  * [[Iceberg.fastForward]] publishes — refusing when main diverged
  * (the lost-update the pattern exists to prevent). Tags stay
  * immutable; expire keeps protecting branch-pinned snapshots.
  */
class IcebergBranchSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_branch_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"g${i % 2}")).toDF("id", "g").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("write-audit-publish: branch writes leave main untouched; " +
      "fast-forward publishes; the branch ref survives") {
    val dir = freshDir("wap")
    Iceberg.write(spark, dir, frame(1 to 10))
    val audit1 = Iceberg.writeToBranch(spark, dir, frame(11 to 20),
      "audit")
    // main readers see NOTHING of the staged data
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 10L).toSet)
    assert(ids(Iceberg.snapshotRef(spark, dir, "audit")) ==
      (1L to 20L).toSet)
    // a second branch commit advances from the BRANCH head, not main
    val audit2 = Iceberg.writeToBranch(spark, dir, frame(21 to 25),
      "audit")
    assert(audit2 != audit1)
    assert(ids(Iceberg.snapshotRef(spark, dir, "audit")) ==
      (1L to 25L).toSet)
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 10L).toSet,
      "a branch write moved main")
    // PUBLISH: main fast-forwards to the audited head
    val published = Iceberg.fastForward(spark, dir, "audit")
    assert(published == audit2)
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 25L).toSet)
    // re-publish is a no-op, the branch ref survives (Iceberg keeps it)
    assert(Iceberg.fastForward(spark, dir, "audit") == audit2)
    assert(ids(Iceberg.snapshotRef(spark, dir, "audit")) ==
      (1L to 25L).toSet)
    // and post-publish writes build on the published state
    Iceberg.write(spark, dir, frame(26 to 30))
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 30L).toSet)
  }

  test("branch OVERWRITE replaces the branch's live set only; main " +
      "keeps reading its own content") {
    val dir = freshDir("bow")
    Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.writeToBranch(spark, dir, frame(11 to 20), "exp")
    Iceberg.writeToBranch(spark, dir, frame(41 to 45), "exp",
      mode = "overwrite")
    assert(ids(Iceberg.snapshotRef(spark, dir, "exp")) ==
      (41L to 45L).toSet)
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 10L).toSet)
  }

  test("diverged main REFUSES the fast-forward — publishing would " +
      "silently drop the interloper's commit") {
    val dir = freshDir("div")
    Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.writeToBranch(spark, dir, frame(11 to 20), "audit")
    // someone commits to MAIN while the audit is in flight
    Iceberg.write(spark, dir, frame(31 to 35))
    val e = intercept[IllegalArgumentException] {
      Iceberg.fastForward(spark, dir, "audit")
    }
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // both lines still read correctly after the refusal
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      ((1L to 10L) ++ (31L to 35L)).toSet)
    assert(ids(Iceberg.snapshotRef(spark, dir, "audit")) ==
      (1L to 20L).toSet)
  }

  test("guards: tags are immutable, unknown refs are loud, a branch " +
      "write needs an existing table, and expire protects the branch") {
    val dir = freshDir("guards")
    val s1 = Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.stageRef(dir, "pin", s1, tpe = "tag")
    val e1 = intercept[IllegalArgumentException] {
      Iceberg.writeToBranch(spark, dir, frame(11 to 12), "pin")
    }
    assert(e1.getMessage.contains("TAG"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Iceberg.fastForward(spark, dir, "nope")
    }
    assert(e2.getMessage.contains("no ref"), e2.getMessage)
    intercept[IllegalArgumentException] {
      Iceberg.writeToBranch(spark, freshDir("none"), frame(1 to 2), "b")
    }
    // the branch head is ref-pinned: expire must keep it readable
    Iceberg.writeToBranch(spark, dir, frame(11 to 20), "audit")
    Iceberg.write(spark, dir, frame(21 to 30))
    Iceberg.write(spark, dir, frame(31 to 40))
    Iceberg.expireSnapshots(spark, dir, keepLast = 1)
    assert(ids(Iceberg.snapshotRef(spark, dir, "audit")) ==
      (1L to 20L).toSet,
      "expire deleted assets a live branch still references")
  }

  test("expire retains BRANCH ancestry, so a publish still verifies " +
      "after maintenance trims main's history") {
    val dir = freshDir("expwap")
    Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.writeToBranch(spark, dir, frame(11 to 20), "audit")
    Iceberg.writeToBranch(spark, dir, frame(21 to 25), "audit")
    // maintenance between audit and publish: the intermediate branch
    // snapshot (the parent link the publish walks) must survive
    Iceberg.expireSnapshots(spark, dir, keepLast = 1)
    val published = Iceberg.fastForward(spark, dir, "audit")
    assert(published > 0)
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 25L).toSet)
  }

  test("the registered reader's branch option reads the staged line") {
    val dir = freshDir("ropt")
    Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.writeToBranch(spark, dir, frame(11 to 20), "audit")
    assert(ids(spark.read.format("graft-iceberg")
      .option("branch", "audit").load(dir)) == (1L to 20L).toSet)
    assert(ids(spark.read.format("graft-iceberg").load(dir)) ==
      (1L to 10L).toSet)
  }
}
