package graft.sources

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The PUBLIC Iceberg write path ([[Iceberg.write]] /
  * [[Iceberg.delete]] / [[Iceberg.update]]): batch create / append /
  * overwrite, v3 deletion-vector deletes that grow executor-built
  * bitmaps and supersede prior DVs in-commit, and copy-on-write
  * updates that materialize row-level deletes — the second format's
  * twins of the Delta writers, with the same SQL NULL semantics and
  * touch-only-what-matched locality.
  */
class IcebergWriteSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_icew_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("write creates, appends, and overwrites; history stays " +
      "time-travel readable; layout mismatch refused") {
    val dir = freshDir("basic")
    val s0 = Iceberg.write(spark, dir, frame(1 to 10))
    val s1 = Iceberg.write(spark, dir, frame(11 to 20))
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 20L).toSet)
    assert(ids(Iceberg.snapshot(spark, dir, Some(s0))) ==
      (1L to 10L).toSet)
    Iceberg.write(spark, dir, frame(21 to 25), mode = "overwrite")
    assert(ids(Iceberg.snapshot(spark, dir)) == (21L to 25L).toSet)
    assert(ids(Iceberg.snapshot(spark, dir, Some(s1))) ==
      (1L to 20L).toSet)
    // partitioned table: omitted partitionBy inherits, a mismatch is loud
    val d2 = freshDir("parts")
    Iceberg.write(spark, d2,
      (1 to 12).map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "b", "v"),
      partitionBy = Seq("b"))
    Iceberg.write(spark, d2,
      Seq((13L, 1, "v13")).toDF("id", "b", "v"))
    assert(ids(Iceberg.snapshot(spark, d2)) == (1L to 13L).toSet)
    val e = intercept[IllegalArgumentException] {
      Iceberg.write(spark, d2,
        Seq((14L, 2, "v14")).toDF("id", "b", "v"),
        partitionBy = Seq("id"))
    }
    assert(e.getMessage.contains("partition"))
  }

  test("delete writes v3 DVs: grows on a second delete (prior DV " +
      "superseded in-commit), no-op nets -1, NULL predicate keeps rows") {
    val dir = freshDir("del")
    Iceberg.write(spark, dir, frame(1 to 30))
    assert(Iceberg.delete(spark, dir, col("id") % 3 === 0) >= 0L)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (1L to 30L).filterNot(_ % 3 == 0).toSet)
    Iceberg.delete(spark, dir, col("id") === 1L)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (2L to 30L).filterNot(_ % 3 == 0).toSet)
    // ONE live DV per data file after two deletes: the second's blob
    // carries the complete dead set and removed the first's entry
    val dvRows = Iceberg.metaTable(spark, dir, "delete_files")
    assert(dvRows.count() == 1L, "prior DV must be superseded")
    // already-dead rows don't re-match: no commit
    val snaps = Iceberg.snapshotIds(dir).size
    assert(Iceberg.delete(spark, dir, col("id") === 3L) == -1L)
    assert(Iceberg.snapshotIds(dir).size == snaps)
    // NULL predicate = survive
    val d2 = freshDir("delnull")
    Iceberg.write(spark, d2,
      Seq((1L, "a"), (2L, null), (3L, "b")).toDF("id", "v"))
    Iceberg.delete(spark, d2, col("v") =!= "a")
    assert(ids(Iceberg.snapshot(spark, d2)) == Set(1L, 2L))
  }

  test("delete composes with existing positional deletes: the new DV " +
      "carries the file's COMPLETE dead set") {
    val dir = freshDir("delmor")
    Iceberg.write(spark, dir, frame(1 to 20))
    // a v2 positional delete from another writer
    Iceberg.stageMorDelete(spark, dir, col("id") <= 2L)
    assert(ids(Iceberg.snapshot(spark, dir)) == (3L to 20L).toSet)
    // the public DV delete must keep those rows dead
    Iceberg.delete(spark, dir, col("id") % 5 === 0)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (3L to 20L).filterNot(_ % 5 == 0).toSet)
  }

  test("merge upserts: matched rows replaced, unmatched inserted, " +
      "NULL-key rows insert, duplicate source keys refused, partition " +
      "columns must be keys") {
    val dir = freshDir("mrg")
    Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.merge(spark, dir,
      Seq((5L, "UPDATED"), (42L, "NEW")).toDF("id", "v"), Seq("id"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(ids(snap) == ((1L to 10L).toSet + 42L))
    assert(snap.filter(col("v") === "UPDATED").count() == 1L)
    // no-change merge → -1, no snapshot
    val snaps = Iceberg.snapshotIds(dir).size
    assert(Iceberg.merge(spark, dir,
      spark.emptyDataset[(Long, String)].toDF("id", "v"),
      Seq("id")) == -1L)
    assert(Iceberg.snapshotIds(dir).size == snaps)
    // NULL key → INSERT; duplicate non-null keys → loud
    Iceberg.merge(spark, dir,
      Seq((Option.empty[Long], "NULLKEY")).toDF("id", "v"), Seq("id"))
    assert(Iceberg.snapshot(spark, dir)
      .filter(col("id").isNull).count() == 1L)
    val e = intercept[IllegalArgumentException] {
      Iceberg.merge(spark, dir,
        Seq((5L, "A"), (5L, "B")).toDF("id", "v"), Seq("id"))
    }
    assert(e.getMessage.contains("duplicate"))
    // insertNotMatched=false drops unmatched source rows
    Iceberg.merge(spark, dir,
      Seq((1L, "ONLY_UPD"), (777L, "DROPPED")).toDF("id", "v"),
      Seq("id"), insertNotMatched = false)
    val s2 = Iceberg.snapshot(spark, dir)
    assert(s2.filter(col("id") === 777L).count() == 0L)
    assert(s2.filter(col("v") === "ONLY_UPD").count() == 1L)
    // partitioned: partition column must be a key
    val d2 = freshDir("mrgpart")
    Iceberg.write(spark, d2,
      (1 to 12).map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "p", "v"),
      partitionBy = Seq("p"))
    val e2 = intercept[IllegalArgumentException] {
      Iceberg.merge(spark, d2,
        Seq((1L, 1, "X")).toDF("id", "p", "v"), Seq("id"))
    }
    assert(e2.getMessage.contains("partition"))
    Iceberg.merge(spark, d2,
      Seq((3L, 0, "UPD"), (13L, 1, "NEW")).toDF("id", "p", "v"),
      Seq("id", "p"))
    assert(ids(Iceberg.snapshot(spark, d2)) == (1L to 13L).toSet)
    assert(Iceberg.snapshot(spark, d2)
      .filter(col("v") === "UPD").count() == 1L)
  }

  test("rollback moves the current snapshot back metadata-only: later " +
      "snapshots stay readable, new writes build on the rolled-back " +
      "state, expired targets refuse") {
    val dir = freshDir("rollback")
    val s1 = Iceberg.write(spark, dir, frame(1 to 10))
    val s2 = Iceberg.write(spark, dir, frame(11 to 20))
    Iceberg.delete(spark, dir, col("id") % 2 === 0)
    assert(Iceberg.rollback(spark, dir, s1) == s1)
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 10L).toSet)
    // the undone snapshots stay time-travel readable
    assert(ids(Iceberg.snapshot(spark, dir, Some(s2))) ==
      (1L to 20L).toSet)
    // main tracks the rollback
    val main = Iceberg.metaTable(spark, dir, "refs")
      .filter(col("name") === "main")
      .select("snapshot_id").collect().head.getLong(0)
    assert(main == s1)
    // a write after the rollback builds on the ROLLED-BACK state
    Iceberg.write(spark, dir, frame(21 to 22))
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      ((1L to 10L).toSet ++ Set(21L, 22L)))
    // unknown/expired snapshot refuses with the listing
    val e = intercept[IllegalArgumentException] {
      Iceberg.rollback(spark, dir, 99999L)
    }
    assert(e.getMessage.contains("not in"))
    // rolling back to the current snapshot is a no-op
    val before = Iceberg.snapshotIds(dir).size
    val cur = Iceberg.currentSnapshotId(dir)
    assert(Iceberg.rollback(spark, dir, cur) == cur)
    assert(Iceberg.snapshotIds(dir).size == before)
  }

  test("update rewrites only hit files with old-row semantics, " +
      "materializes DVs, and refuses partition-column SETs") {
    val dir = freshDir("upd")
    Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.write(spark, dir, frame(11 to 20))
    Iceberg.delete(spark, dir, col("id") === 11L)
    val filesBefore = Iceberg.metaTable(spark, dir, "files")
      .select("file_path").collect().map(_.getString(0)).toSet
    Iceberg.update(spark, dir, col("id") === 12L,
      Map("v" -> lit("CHANGED")))
    val snap = Iceberg.snapshot(spark, dir)
    assert(ids(snap) == (1L to 20L).toSet - 11L,
      "the rewrite must not resurrect the DV-deleted row")
    assert(snap.filter(col("v") === "CHANGED").count() == 1L)
    // only the second file was replaced; the DV materialized away
    val filesAfter = Iceberg.metaTable(spark, dir, "files")
      .select("file_path").collect().map(_.getString(0)).toSet
    assert((filesBefore intersect filesAfter).size == 1,
      s"exactly one file must survive untouched: $filesBefore → $filesAfter")
    assert(Iceberg.metaTable(spark, dir, "delete_files").count() == 0L,
      "the hit file's DV must be removed in the rewrite commit")
    // nothing matched → -1, no commit
    val snaps = Iceberg.snapshotIds(dir).size
    assert(Iceberg.update(spark, dir, col("id") === 999L,
      Map("v" -> lit("X"))) == -1L)
    assert(Iceberg.snapshotIds(dir).size == snaps)
    // old-row semantics
    val d2 = freshDir("updold")
    Iceberg.write(spark, d2, Seq((1L, 10L, 0L)).toDF("id", "a", "b"))
    Iceberg.update(spark, d2, col("id") === 1L,
      Map("a" -> lit(99L), "b" -> (col("a") + 1L)))
    val row = Iceberg.snapshot(spark, d2).collect().head
    assert(row.getLong(1) == 99L && row.getLong(2) == 11L,
      s"b must see the OLD a: $row")
    // partition-column SET refused
    val d3 = freshDir("updpart")
    Iceberg.write(spark, d3,
      (1 to 8).map(i => (i.toLong, i % 2, s"v$i")).toDF("id", "p", "v"),
      partitionBy = Seq("p"))
    val e = intercept[IllegalArgumentException] {
      Iceberg.update(spark, d3, col("id") === 1L, Map("p" -> lit(9)))
    }
    assert(e.getMessage.contains("partition"))
    // case-colliding SET keys are a duplicate assignment — refuse,
    // same policy as the Delta twin (r16 advice)
    val eDup = intercept[IllegalArgumentException] {
      Iceberg.update(spark, d3, col("id") === 1L,
        Map("v" -> lit("a"), "V" -> lit("b")))
    }
    assert(eDup.getMessage.contains("duplicate SET target"),
      eDup.getMessage)
  }
}
