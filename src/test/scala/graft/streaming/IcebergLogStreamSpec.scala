package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Iceberg

/** The Iceberg snapshot-log streaming source: ordinal offsets, one
  * micro-batch per snapshot, checkpoint tail resume, loud refusal of
  * MoR-delete windows.
  */
class IcebergLogStreamSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_ils_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  private def drain(table: String, ckpt: String,
      options: Map[String, String] = Map.empty): Seq[Set[Long]] = {
    val batches = mutable.Buffer.empty[Set[Long]]
    val reader = spark.readStream.format("graft-iceberg")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(table)
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

  test("one micro-batch per snapshot; checkpoint restart tails") {
    val dir = freshDir("basic")
    Iceberg.stageAppend(spark, dir, frame(1 to 10), Seq.empty)
    Iceberg.stageAppend(spark, dir, frame(11 to 20), Seq.empty)
    val ckpt = freshDir("basic_ck")
    val first = drain(dir, ckpt)
    assert(first.length == 2, s"one batch per snapshot: $first")
    assert(first(0) == (1L to 10L).toSet)
    assert(first(1) == (11L to 20L).toSet)
    // a snapshot lands; the same checkpoint resumes after ordinal 2
    Iceberg.stageAppend(spark, dir, frame(21 to 25), Seq.empty)
    val second = drain(dir, ckpt)
    assert(second.length == 1 && second.head == (21L to 25L).toSet)
  }

  test("a MoR delete window fails fast") {
    val dir = freshDir("mor")
    Iceberg.stageAppend(spark, dir, frame(1 to 10), Seq.empty)
    val ckpt = freshDir("mor_ck")
    drain(dir, ckpt)
    Iceberg.stageMorDelete(spark, dir, col("id") % 2 === 0)
    val e = intercept[Exception] { drain(dir, ckpt) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("delete") || m.contains("appends")),
      s"expected the append-only refusal, got: ${messages(e)}")
  }

  test("an expired cut snapshot fails loudly — offsets are sequence " +
      "numbers, never history ordinals") {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    val dir = freshDir("expire")
    Iceberg.stageAppend(spark, dir, frame(1 to 10), Seq.empty)
    val ckpt = freshDir("expire_ck")
    assert(drain(dir, ckpt).flatten.toSet == (1L to 10L).toSet)
    Iceberg.stageAppend(spark, dir, frame(11 to 20), Seq.empty)
    // EXPIRE snapshot 1 (drop it from the history) — with ordinal
    // offsets the checkpointed cut would silently re-map onto snapshot
    // 2 and the stream would skip/replay; with sequence offsets the
    // cut resolves to nothing and the restart is LOUD
    val mdDir = new java.io.File(dir, "metadata")
    val latest = mdDir.listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val M = new ObjectMapper()
    val md = M.readTree(java.nio.file.Files.readString(latest.toPath))
      .asInstanceOf[ObjectNode]
    val snaps = md.get("snapshots").asInstanceOf[ArrayNode]
    assert(snaps.size() == 2)
    snaps.remove(0)
    java.nio.file.Files.writeString(
      new java.io.File(mdDir, "v9.metadata.json").toPath,
      M.writeValueAsString(md))
    java.nio.file.Files.writeString(
      new java.io.File(mdDir, "version-hint.text").toPath, "9")
    val e = intercept[Exception] { drain(dir, ckpt) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("EXPIRED")),
      s"expected the expiration refusal, got: ${messages(e)}")
  }

  test("readChangeLog streams signed typed rows: MoR and equality " +
      "deletes flow as delete rows instead of failing") {
    val dir = freshDir("chlog")
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageMorDelete(spark, dir, col("id") % 5 === 0)
    Iceberg.stageEqDelete(spark, dir, Seq(3L).toDF("id"))
    val batches = scala.collection.mutable
      .Buffer.empty[Set[(Long, String)]]
    val q = spark.readStream.format("graft-iceberg")
      .option("readChangeLog", "true")
      .load(dir)
      .writeStream
      .option("checkpointLocation", freshDir("chlog_ck"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        batches.synchronized {
          batches += b.select("id", "_change_type").collect()
            .map(r => (r.getLong(0), r.getString(1))).toSet
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(batches.length == 3, s"one batch per snapshot: $batches")
    // bootstrap inserts, then a MoR delete batch, then an eq delete
    assert(batches(0) == (1L to 20L).map(i => (i, "insert")).toSet)
    assert(batches(1) ==
      (1L to 20L).filter(_ % 5 == 0).map(i => (i, "delete")).toSet)
    assert(batches(2) == Set((3L, "delete")))
  }

  test("bootstrap applies existing MoR deletes, then tails appends") {
    val dir = freshDir("boot")
    Iceberg.stageAppend(spark, dir, frame(1 to 10), Seq.empty)
    Iceberg.stageMorDelete(spark, dir, col("id") % 5 === 0)
    // a wide first trigger collapses the history into ONE bootstrap
    // batch = the CURRENT state (deletes applied — served as a
    // snapshot read, not a diff); later appends tail normally
    val ckpt = freshDir("boot_ck")
    val batches = drain(dir, ckpt,
      Map("maxSnapshotsPerTrigger" -> "10"))
    assert(batches.flatten.toSet ==
      (1L to 10L).filterNot(_ % 5 == 0).toSet)
    Iceberg.stageAppend(spark, dir, frame(11 to 15), Seq.empty)
    val second = drain(dir, ckpt)
    assert(second.flatten.toSet == (11L to 15L).toSet)
  }
}
