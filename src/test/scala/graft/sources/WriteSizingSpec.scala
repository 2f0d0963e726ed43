package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Output-file sizing on the landing writers (optimization guide §6):
  * a small frame lands ONE file regardless of its upstream partition
  * count; an explicit caller layout (repartition/coalesce, including
  * under a partition-local sort — the z-order shape) is respected
  * verbatim; reads are content-identical either way.
  */
class WriteSizingSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_ws_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // a many-partition upstream WITHOUT an explicit caller layout (an
  // explicit repartition would rightly be respected verbatim — the
  // optimizer even pushes filters below it, so the root stays a
  // RepartitionOperation): an 8-partition Range leaf
  private def frame(n: Int, parts: Int) =
    spark.range(0, n, 1, parts)
      .select(col("id"), (col("id") % 7).as("v"))

  private def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten
          .filterNot(_.getName.startsWith("_")).flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  test("coalesceForWrite: small frame → one partition; explicit layout kept") {
    val small = frame(1000, 8)
    assert(WriteSizing.coalesceForWrite(small).rdd.getNumPartitions == 1)
    // explicit repartition at the root is a layout instruction
    val explicit = spark.range(1000).toDF("id").repartition(5)
    assert(WriteSizing.coalesceForWrite(explicit).rdd.getNumPartitions == 5)
    // ... including under a partition-local sort (the z-order shape)
    val zish = spark.range(1000).toDF("id")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    assert(WriteSizing.coalesceForWrite(zish).rdd.getNumPartitions == 4)
    // conf'd off → untouched
    spark.conf.set("spark.graft.write.targetFileBytes", "0")
    try assert(WriteSizing.coalesceForWrite(small).rdd.getNumPartitions == 8)
    finally spark.conf.unset("spark.graft.write.targetFileBytes")
  }

  test("Delta landing write: 8-partition small insert lands 1 file") {
    val dir = freshDir("delta")
    DeltaLake.write(spark, dir, frame(1000, 8))
    assert(dataFiles(dir).size == 1)
    val back = DeltaLake.snapshot(spark, dir)
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (0L until 1000L).sum)
  }

  test("Iceberg landing write: 8-partition small insert lands 1 file") {
    val dir = freshDir("ice")
    Iceberg.write(spark, dir, frame(1000, 8))
    val dataDir = new java.io.File(dir, "data")
    assert(dataFiles(dataDir.getAbsolutePath).size == 1)
    assert(Iceberg.snapshot(spark, dir).count() == 1000)
  }
}
