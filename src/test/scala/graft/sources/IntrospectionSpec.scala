package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The introspection surface: Iceberg metadata tables (snapshots /
  * files / delete_files / manifests / refs / history) and Delta
  * DESCRIBE HISTORY — the tables maintenance tooling reads churn
  * from. Pinned against staged tables whose exact state is known.
  */
class IntrospectionSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_meta_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  test("iceberg metadata tables reflect the staged table exactly") {
    val dir = freshDir("ice")
    val s1 = Iceberg.stageAppend(spark, dir, frame(1 to 20), Seq.empty)
    val s2 = Iceberg.stageAppend(spark, dir, frame(21 to 40), Seq.empty)
    Iceberg.stageDv(spark, dir, col("id") % 10 === 0)
    Iceberg.stageRef(dir, "v1", s1)

    val snaps = Iceberg.metaTable(spark, dir, "snapshots").collect()
    assert(snaps.length == 3)
    assert(snaps.map(_.getString(3)).count(_ == "append") == 2)
    assert(snaps.map(_.getString(3)).contains("delete"))

    val files = Iceberg.metaTable(spark, dir, "files")
    assert(files.count() == 2)
    assert(files.select("content").collect().forall(_.getInt(0) == 0))

    // the DV delete hit BOTH data files (every 10th id in each era)
    val dels = Iceberg.metaTable(spark, dir, "delete_files").collect()
    assert(dels.length == 2)
    assert(dels.forall(_.getString(1) == "deletion-vector"))
    assert(dels.map(_.getString(4)).distinct.length == 2,
      "each DV row must name its own referenced data file")

    val refRows = Iceberg.metaTable(spark, dir, "refs").collect()
    assert(refRows.exists(r => r.getString(0) == "v1" &&
      r.getString(1) == "tag" && r.getLong(2) == s1))
    assert(refRows.exists(r => r.getString(0) == "main" &&
      r.getLong(2) == Iceberg.currentSnapshotId(dir)))

    val hist = Iceberg.metaTable(spark, dir, "history").collect()
    assert(hist.length == 3)
    assert(hist.count(_.getBoolean(2)) == 1, "exactly one current")

    val manifests = Iceberg.metaTable(spark, dir, "manifests")
    assert(manifests.filter(col("content") === 1).count() >= 1,
      "the DV delete manifest must appear")
    assert(s2 > s1)

    val e = intercept[IllegalArgumentException] {
      Iceberg.metaTable(spark, dir, "nope")
    }
    assert(e.getMessage.contains("snapshots"))
  }

  test("delta history reads the commit log newest-first with " +
      "operations and action counts") {
    val dir = freshDir("dl")
    DeltaLake.stageCommit(spark, dir, frame(1 to 20), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, frame(21 to 40), Seq.empty, 1L)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") % 4 === 0, 2L,
      cdf = true)
    DeltaLake.compact(spark, dir)
    val h = DeltaLake.history(spark, dir).collect()
    assert(h.length == 4)
    assert(h.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L, 0L),
      "newest first")
    // the compaction (dataChange=false remove+add) derives OPTIMIZE
    assert(h.head.getString(2) == "OPTIMIZE", h.head.toString)
    // the CDF delete is a rewrite-shaped commit without commitInfo —
    // the derivation reports WRITE, and the cdc count surfaces
    assert(h(1).getString(2) == "WRITE")
    assert(h(1).getInt(5) >= 1, "cdc count must surface")
    assert(h.last.getString(2) == "WRITE")
    // timestamps are monotonic non-decreasing oldest->newest
    val ts = h.map(_.getLong(1)).reverse
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
  }

  test("public-writer commits carry commitInfo operations: history " +
      "reports DELETE/UPDATE/OPTIMIZE by name (r17)") {
    val dir = freshDir("ops")
    DeltaLake.write(spark, dir, frame(1 to 30))
    DeltaLake.delete(spark, dir, col("id") % 5 === 0)
    DeltaLake.update(spark, dir, col("id") % 7 === 1,
      Map("v" -> org.apache.spark.sql.functions.lit("upd")))
    DeltaLake.write(spark, dir, frame(31 to 40))
    val ops = DeltaLake.history(spark, dir)
      .orderBy("version").collect().map(_.getString(2)).toSeq
    // pre-r17 the COW delete/update derived as WRITE from the action
    // mix; the commitInfo stamp now names them (the table-creating
    // write stamps CREATE TABLE — it is the creation commit)
    assert(ops == Seq("CREATE TABLE", "DELETE", "UPDATE", "WRITE"), ops)
  }

  test("iceberg snapshotLog: newest-first (snapshot-id, operation) " +
      "from the summaries") {
    val dir = freshDir("slog")
    Iceberg.write(spark, dir, frame(1 to 10))
    Iceberg.write(spark, dir, frame(11 to 20))
    Iceberg.delete(spark, dir, col("id") % 4 === 0)
    val log = Iceberg.snapshotLog(dir)
    assert(log.length == 3)
    assert(log.map(_._1) == log.map(_._1).sorted.reverse,
      "newest first")
    assert(log.map(_._2).forall(_.nonEmpty))
  }
}
