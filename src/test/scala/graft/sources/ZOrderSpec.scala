package graft.sources

import org.apache.spark.sql.classic
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** OPTIMIZE ZORDER ([[DeltaLake.compact]] with `zorderBy`): the
  * multi-dimensional clustering rewrite. The content must stay
  * bit-identical (dataChange=false), and the POINT of the layout —
  * a narrow predicate on ANY Z column prunes most files via stats
  * skipping, where the pre-compaction layout (every file spanning the
  * full domain) prunes nothing — is pinned with runtime numFiles.
  */
class ZOrderSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_zorder_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute THIS dataset, then read its own metrics
    df.asInstanceOf[classic.Dataset[_]].queryExecution
      .executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.get
  }

  private def parquetBytes(dir: String): Long =
    Staging.parquetBytes(dir, exclude = Set("_delta_log"))

  test("zorder clustering: identical content, dataChange=false, and a " +
      "narrow slice on EITHER column prunes most files") {
    val dir = freshDir("grid")
    // a 256x256 grid, written as 4 interleaved slices — every file
    // spans the FULL x and y domain, so nothing prunes pre-compaction
    val grid = (0 until 65536)
      .map(i => (i.toLong % 256, i.toLong / 256)).toDF("x", "y")
    (0 until 4).foreach { k =>
      DeltaLake.stageCommit(spark, dir,
        grid.filter(col("x") % 4 === k).coalesce(1), Seq.empty, k.toLong)
    }
    val checksum = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(org.apache.spark.sql.functions
        .sum(col("x") * 100000L + col("y"))).head().getLong(0)
    val before = checksum(DeltaLake.snapshot(spark, dir))
    val pre = plannedFiles(
      DeltaLake.snapshot(spark, dir).filter(col("y").between(10L, 20L)))
    assert(pre == 4L, "pre-zorder every file must plan (full-domain files)")

    // target ~16 output files
    val v = DeltaLake.compact(spark, dir,
      targetFileBytes = math.max(1L, parquetBytes(dir) / 16),
      zorderBy = Seq("x", "y"))
    assert(v == 4L)
    val total = DeltaLake.liveFileNames(spark, dir, v).size
    assert(total >= 8, s"expected a multi-file clustered layout, got $total")
    assert(checksum(DeltaLake.snapshot(spark, dir)) == before)
    assert(DeltaLake.snapshot(spark, dir).count() == 65536L)
    // the commit is a content no-op to the changelog
    val c = java.nio.file.Files.readString(new java.io.File(dir,
      "_delta_log/" + f"$v%020d.json").toPath)
    assert(!c.contains("\"dataChange\":true"))

    // a narrow band on EITHER column prunes most of the layout — the
    // multi-dimensional win a plain sort on x could not give for y
    val yPlan = plannedFiles(
      DeltaLake.snapshot(spark, dir).filter(col("y").between(10L, 20L)))
    val xPlan = plannedFiles(
      DeltaLake.snapshot(spark, dir).filter(col("x").between(10L, 20L)))
    assert(yPlan <= total / 2,
      s"y-slice must prune: planned $yPlan of $total")
    assert(xPlan <= total / 2,
      s"x-slice must prune: planned $xPlan of $total")
  }

  test("iceberg zorder: rewrite_data_files clusters the same way — " +
      "identical content, bounds skipping prunes on either column") {
    val dir = freshDir("icegrid")
    val grid = (0 until 65536)
      .map(i => (i.toLong % 256, i.toLong / 256)).toDF("x", "y")
    (0 until 4).foreach { k =>
      Iceberg.stageAppend(spark, dir,
        grid.filter(col("x") % 4 === k).coalesce(1), Seq.empty)
    }
    val checksum = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(org.apache.spark.sql.functions
        .sum(col("x") * 100000L + col("y"))).head().getLong(0)
    val before = checksum(Iceberg.snapshot(spark, dir))
    val pre = plannedFiles(
      Iceberg.snapshot(spark, dir).filter(col("y").between(10L, 20L)))
    assert(pre == 4L, "pre-zorder every file must plan")
    val v = Iceberg.rewriteDataFiles(spark, dir,
      targetFileBytes =
        math.max(1L, Staging.parquetBytes(s"$dir/data") / 16),
      zorderBy = Seq("x", "y"))
    assert(v >= 0L)
    val total = Iceberg.metaTable(spark, dir, "files").count()
    assert(total >= 8, s"expected a multi-file clustered layout: $total")
    assert(checksum(Iceberg.snapshot(spark, dir)) == before)
    assert(Iceberg.snapshot(spark, dir).count() == 65536L)
    val yPlan = plannedFiles(
      Iceberg.snapshot(spark, dir).filter(col("y").between(10L, 20L)))
    val xPlan = plannedFiles(
      Iceberg.snapshot(spark, dir).filter(col("x").between(10L, 20L)))
    assert(yPlan <= total / 2, s"y-slice must prune: $yPlan of $total")
    assert(xPlan <= total / 2, s"x-slice must prune: $xPlan of $total")
    // guards on the ICEBERG arm: >4 columns, non-numeric types, and
    // identity partition sources all refused
    val e = intercept[IllegalArgumentException] {
      Iceberg.rewriteDataFiles(spark, dir,
        zorderBy = Seq("x", "y", "x", "y", "x"))
    }
    assert(e.getMessage.contains("at most 4"))
    val d2 = freshDir("iceguards")
    import spark.implicits._
    Iceberg.write(spark, d2,
      (1 to 8).map(i => (i.toLong, s"s$i", (i % 2).toString))
        .toDF("id", "s", "p"), partitionBy = Seq("p"))
    val e2 = intercept[IllegalArgumentException] {
      Iceberg.rewriteDataFiles(spark, d2, zorderBy = Seq("s"))
    }
    assert(e2.getMessage.contains("not supported"))
    val e3 = intercept[IllegalArgumentException] {
      Iceberg.rewriteDataFiles(spark, d2, zorderBy = Seq("p"))
    }
    assert(e3.getMessage.contains("data columns"))
  }

  test("iceberg zorder over a DV'd table: deletes materialize AND the " +
      "dangling delete files are removed — the table leaves the " +
      "merge-on-read path") {
    val dir = freshDir("icedv")
    import spark.implicits._
    (0 until 2).foreach { k =>
      Iceberg.stageAppend(spark, dir,
        (k * 10 + 1 to k * 10 + 10).map(i => (i.toLong, s"v$i"))
          .toDF("id", "v").coalesce(1), Seq.empty)
    }
    Iceberg.delete(spark, dir, col("id") % 5 === 0)
    assert(Iceberg.metaTable(spark, dir, "delete_files").count() >= 1L)
    Iceberg.rewriteDataFiles(spark, dir,
      targetFileBytes = math.max(1L, Staging.parquetBytes(s"$dir/data") / 4),
      zorderBy = Seq("id"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.select("id").collect().map(_.getLong(0)).toSet ==
      (1L to 20L).filterNot(_ % 5 == 0).toSet,
      "materialized deletes must not resurrect")
    assert(Iceberg.metaTable(spark, dir, "delete_files").count() == 0L,
      "a full rewrite must retire its dangling delete files — leaving " +
        "them keeps every read on the MoR arm forever")
  }

  test("zorder guards: strings, partition columns, and >4 columns are " +
      "refused; a partitioned table clusters within partitions") {
    val dir = freshDir("guards")
    val df = (0 until 4096).map(i =>
      (i.toLong % 64, i.toLong / 64, s"s$i", (i % 2).toString))
      .toDF("x", "y", "s", "p")
    DeltaLake.write(spark, dir, df, partitionBy = Seq("p"))
    val e1 = intercept[IllegalArgumentException] {
      DeltaLake.compact(spark, dir, zorderBy = Seq("s"))
    }
    assert(e1.getMessage.contains("not supported"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.compact(spark, dir, zorderBy = Seq("p"))
    }
    assert(e2.getMessage.contains("data columns"))
    val e3 = intercept[IllegalArgumentException] {
      DeltaLake.compact(spark, dir, zorderBy = Seq("x", "y", "x", "y", "x"))
    }
    assert(e3.getMessage.contains("at most 4"))
    // partitioned: clustering runs per partition, content identical
    val v = DeltaLake.compact(spark, dir, targetFileBytes = 4096,
      zorderBy = Seq("x", "y"))
    assert(v >= 0L)
    assert(DeltaLake.snapshot(spark, dir).count() == 4096L)
    assert(DeltaLake.snapshotWhere(spark, dir, col("p") === "1")
      .count() == 2048L)
  }

  test("4 Z-order columns never reach the Long sign bit — the top " +
      "corner of the key space sorts LAST, not first") {
    // with 16 bits per column and k=4, bucket bit 15 of column index 3
    // lands on bit 63: the Z value of the (max,max,max,max) corner
    // wraps NEGATIVE and range partitioning puts the top corner first,
    // spanning one file across both extremes of the key space
    val df = (0 until 4096).map { i =>
      (i.toLong % 8, (i / 8).toLong % 8, (i / 64).toLong % 8,
        (i / 512).toLong % 8)
    }.toDF("a", "b", "c", "d")
    val zc = DeltaLake.zValueColumn(df, Seq("a", "b", "c", "d"),
      df.schema)
    val rows = df.select(zc(df).as("z"),
      col("a"), col("b"), col("c"), col("d")).collect()
    assert(rows.forall(_.getLong(0) >= 0L),
      "an interleaved Z value crossed into the sign bit")
    val zOf = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) -> r.getLong(0)).toMap
    assert(zOf((7L, 7L, 7L, 7L)) == rows.map(_.getLong(0)).max,
      "the max corner must carry the LARGEST Z value")
    assert(zOf((0L, 0L, 0L, 0L)) == rows.map(_.getLong(0)).min)
  }
}
