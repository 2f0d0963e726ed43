package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.{DeltaLake, GraftCatalog, Iceberg}

/** CATALOG-NAMED streaming: `option("warehouse", wh) +
  * option("table", "db.t")` resolves the registered entry ONCE at
  * source creation; the stream then follows the TABLE LOG, not the
  * pin (a re-pin between runs neither replays nor skips versions —
  * offsets live in the checkpoint). Catalog-named SINKS advance the
  * pin per committed batch so catalog readers see stream progress.
  */
class StreamCatalogSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_scat_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"g${i % 2}")).toDF("id", "g").coalesce(1)

  private def drain(options: Map[String, String],
      ckpt: String): Seq[Set[Long]] = {
    val batches = mutable.Buffer.empty[Set[Long]]
    val reader = spark.readStream.format("graft-deltalake")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        batches.synchronized {
          batches += b.select("id").collect().map(_.getLong(0)).toSet
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.toSeq
  }

  test("catalog-named source streams the table; offsets survive a " +
      "catalog re-pin between runs") {
    val wh = freshDir("src")
    val t = new java.io.File(wh, "t").getAbsolutePath
    DeltaLake.stageCommit(spark, t, frame(1 to 10), Seq.empty, 0L)
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    val ckpt = freshDir("ckpt")
    val opts = Map("warehouse" -> wh, "table" -> "db.t")
    val first = drain(opts, ckpt)
    assert(first.flatten.toSet == (1L to 10L).toSet)
    // append a version; RE-PIN the catalog (advance) — the stream's
    // second run must serve exactly the appended commit, driven by
    // its checkpoint offsets, not the pin
    DeltaLake.stageCommit(spark, t, frame(11 to 15), Seq.empty, 1L)
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    val second = drain(opts, ckpt)
    assert(second.flatten.toSet == (11L to 15L).toSet,
      s"expected only the appended commit, got $second")
  }

  test("refusals: unknown table, format mismatch, table without " +
      "warehouse") {
    val wh = freshDir("ref")
    val t = new java.io.File(wh, "i").getAbsolutePath
    Iceberg.write(spark, t, frame(1 to 3))
    GraftCatalog.register(spark, wh, "db.i", "graft-iceberg", "i")
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-deltalake")
        .option("warehouse", wh).option("table", "db.nope").load()
    }
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-deltalake")
        .option("warehouse", wh).option("table", "db.i").load()
    }
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-deltalake")
        .option("table", "db.i").load()
    }
  }

  test("catalog-named sink advances the pin per committed batch") {
    val wh = freshDir("sink")
    val src = new java.io.File(wh, "src").getAbsolutePath
    DeltaLake.stageCommit(spark, src, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, src, frame(11 to 20), Seq.empty, 1L)
    // the destination must be REGISTERED first (the sink advances an
    // existing pin; it does not create catalog entries)
    val dest = new java.io.File(wh, "dest").getAbsolutePath
    DeltaLake.write(spark, dest, frame(1 to 0)) // empty create
    GraftCatalog.register(spark, wh, "db.dest", "graft-deltalake",
      "dest")
    val pinBefore = GraftCatalog.entries(wh)("db.dest").version
    val ckpt = freshDir("sckpt")
    val q = spark.readStream.format("graft-deltalake").load(src)
      .writeStream.format("graft-deltalake")
      .option("checkpointLocation", ckpt)
      .option("warehouse", wh).option("table", "db.dest")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val entry = GraftCatalog.entries(wh)("db.dest")
    assert(entry.version > pinBefore)
    assert(entry.version == DeltaLake.latestVersion(spark, dest),
      "pin must sit at the table head after the stream drains")
    // a catalog read (pinned) sees the streamed rows
    spark.conf.set("spark.sql.catalog.scat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.scat.warehouse", wh)
    assert(spark.sql("SELECT COUNT(*) FROM scat.db.dest")
      .head().getLong(0) == 20L)
  }
}
