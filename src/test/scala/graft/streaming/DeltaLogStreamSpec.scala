package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.DeltaLake

/** The Delta-log streaming source: offsets are table versions, each
  * micro-batch is one commit's append diff (maxVersionsPerTrigger=1),
  * checkpoint restart resumes exactly after the last committed version
  * (tail semantics), and a delete window fails fast instead of
  * silently streaming wrong rows.
  */
class DeltaLogStreamSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_dls_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"g${i % 2}")).toDF("id", "g").coalesce(1)

  /** Run the source to exhaustion under AvailableNow, collecting each
    * micro-batch's id-set; returns the per-batch sets in order.
    */
  private def drain(table: String, ckpt: String,
      options: Map[String, String] = Map.empty): Seq[Set[Long]] = {
    val batches = mutable.Buffer.empty[Set[Long]]
    val reader = spark.readStream.format("graft-deltalake")
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

  test("one micro-batch per commit; union equals the table") {
    val dir = freshDir("basic")
    DeltaLake.stageCommit(spark, dir, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, frame(11 to 20), Seq.empty, 1L)
    DeltaLake.stageCommit(spark, dir, frame(21 to 30), Seq.empty, 2L)
    val ckpt = freshDir("basic_ck")
    val batches = drain(dir, ckpt)
    assert(batches.length == 3, s"expected 3 version batches: $batches")
    assert(batches(0) == (1L to 10L).toSet)
    assert(batches(1) == (11L to 20L).toSet)
    assert(batches(2) == (21L to 30L).toSet)
  }

  test("checkpoint restart tails: only new commits stream") {
    val dir = freshDir("tail")
    DeltaLake.stageCommit(spark, dir, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, frame(11 to 20), Seq.empty, 1L)
    val ckpt = freshDir("tail_ck")
    val first = drain(dir, ckpt)
    assert(first.flatten.toSet == (1L to 20L).toSet)
    // a commit lands; the SAME checkpoint resumes after version 1
    DeltaLake.stageCommit(spark, dir, frame(21 to 25), Seq.empty, 2L)
    val second = drain(dir, ckpt)
    assert(second.length == 1)
    assert(second.head == (21L to 25L).toSet,
      "restart must resume exactly after the last committed version")
  }

  test("maxVersionsPerTrigger batches catch-up windows") {
    val dir = freshDir("catchup")
    (0 until 4).foreach(v => DeltaLake.stageCommit(spark, dir,
      frame(v * 10 + 1 to v * 10 + 10), Seq.empty, v.toLong))
    val batches = drain(dir, freshDir("catchup_ck"),
      Map("maxVersionsPerTrigger" -> "2"))
    assert(batches.length == 2, s"two 2-version batches: $batches")
    assert(batches(0) == (1L to 20L).toSet)
    assert(batches(1) == (21L to 40L).toSet)
  }

  test("startingVersion skips the bootstrap") {
    val dir = freshDir("startv")
    DeltaLake.stageCommit(spark, dir, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, frame(11 to 20), Seq.empty, 1L)
    val batches = drain(dir, freshDir("startv_ck"),
      Map("startingVersion" -> "0"))
    assert(batches.flatten.toSet == (11L to 20L).toSet)
  }

  test("an OPTIMIZE commit streams through as a content no-op") {
    val dir = freshDir("opt")
    DeltaLake.stageCommit(spark, dir, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, frame(11 to 20), Seq.empty, 1L)
    val ckpt = freshDir("opt_ck")
    assert(drain(dir, ckpt).flatten.toSet == (1L to 20L).toSet)
    // OPTIMIZE lands, then a real append — the stream must serve the
    // compaction window as zero rows (never a replay of the rewritten
    // table) and the append normally
    DeltaLake.stageCompactCommit(spark, dir, 2L)
    DeltaLake.stageCommit(spark, dir, frame(21 to 25), Seq.empty, 3L)
    val second = drain(dir, ckpt)
    assert(second.flatten.toSet == (21L to 25L).toSet,
      s"compaction must stream as a no-op: $second")
  }

  test("bootstrap is a snapshot: DV'd history reads, next DV window loud") {
    val dir = freshDir("dvboot")
    DeltaLake.stageCommit(spark, dir, frame(1 to 20), Seq.empty, 0L)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") % 4 === 0, 1L)
    // a fresh consumer bootstraps the CURRENT state — deletion vectors
    // applied — in one batch (collapse the history with a wide trigger)
    val ckpt = freshDir("dvboot_ck")
    val first = drain(dir, ckpt, Map("maxVersionsPerTrigger" -> "10"))
    assert(first.flatten.toSet == (1L to 20L).filterNot(_ % 4 == 0).toSet)
    // appends tail normally...
    DeltaLake.stageCommit(spark, dir, frame(21 to 25), Seq.empty, 2L)
    assert(drain(dir, ckpt).flatten.toSet == (21L to 25L).toSet)
    // ...but a DV landing MID-stream is a row-level delete: loud
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") === 21L, 3L)
    val e = intercept[Exception] { drain(dir, ckpt) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // the DV commit's remove(f, oldDv)+add(f, newDv) pair trips the
    // dataChange=true remove check first — either message is the same
    // refusal
    assert(messages(e).exists(m =>
      m.contains("deletion vector") || m.contains("not inserts-only")),
      s"expected the DV refusal, got: ${messages(e)}")
  }

  test("readChangeFeed streams typed change rows: deletes and updates " +
      "flow as retraction-capable rows instead of failing") {
    val dir = freshDir("cdf")
    DeltaLake.stageCommit(spark, dir, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageUpdateCommit(spark, dir, col("id") === 3L,
      Map("g" -> org.apache.spark.sql.functions.lit("updated")), 1L,
      cdf = true)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") === 7L, 2L,
      cdf = true)
    val ckpt = freshDir("cdf_ck")
    val batches = scala.collection.mutable
      .Buffer.empty[Seq[(Long, String, Long)]]
    val q = spark.readStream.format("graft-deltalake")
      .option("readChangeFeed", "true")
      .load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        batches.synchronized {
          batches += b.select("id", "_change_type", "_commit_version")
            .collect().map(r =>
              (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(batches.length == 3, s"one batch per version: $batches")
    // v0: synthesized inserts; v1: delta-sized pre/post pair; v2: delete
    assert(batches(0).toSet ==
      (1L to 10L).map(i => (i, "insert", 0L)).toSet)
    assert(batches(1).toSet == Set((3L, "update_preimage", 1L),
      (3L, "update_postimage", 1L)))
    assert(batches(2).toSet == Set((7L, "delete", 2L)))
    // a NON-CDF delete cannot be served as a feed: loud
    DeltaLake.stageDeleteCommit(spark, dir, col("id") === 8L, 3L)
    val e = intercept[Exception] {
      val q2 = spark.readStream.format("graft-deltalake")
        .option("readChangeFeed", "true").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (_: Dataset[Row], _: Long) => () }
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("WITHOUT change files")),
      s"expected the non-CDF refusal, got: ${messages(e)}")
  }

  test("the remaining DML kinds flow through readChangeFeed too: a " +
      "MERGE commit streams insert + update pre/post rows, a RESTORE " +
      "commit streams its file-diff as delete/insert rows") {
    val dir = freshDir("cdfdml")
    DeltaLake.write(spark, dir, frame(1 to 10),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    // v1: MERGE — id 3 matched (updated), id 30 not matched (inserted)
    DeltaLake.merge(spark, dir,
      Seq((3L, "m3"), (30L, "m30")).toDF("id", "g"), Seq("id"))
    // v2: plain CDF append (the restore target boundary)
    DeltaLake.write(spark, dir, frame(41 to 43))
    // v3: RESTORE to v1 — the appended file leaves as deletes
    val rv = DeltaLake.restore(spark, dir, 1L)
    assert(rv == 3L)
    val ckpt = freshDir("cdfdml_ck")
    val batches = scala.collection.mutable
      .Buffer.empty[Seq[(Long, String, Long)]]
    val q = spark.readStream.format("graft-deltalake")
      .option("readChangeFeed", "true")
      .load(dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        batches.synchronized {
          batches += b.select("id", "_change_type", "_commit_version")
            .collect().map(r =>
              (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(batches.length == 4, s"one batch per version: $batches")
    assert(batches(0).toSet ==
      (1L to 10L).map(i => (i, "insert", 0L)).toSet)
    assert(batches(1).toSet == Set((3L, "update_preimage", 1L),
      (3L, "update_postimage", 1L), (30L, "insert", 1L)),
      s"merge change rows: ${batches(1)}")
    assert(batches(2).toSet ==
      (41L to 43L).map(i => (i, "insert", 2L)).toSet)
    assert(batches(3).toSet ==
      (41L to 43L).map(i => (i, "delete", 3L)).toSet,
      s"restore change rows: ${batches(3)}")
    // the table's final content matches the netted feed
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (1L to 10L).toSet + 30L)
    // a CDF restore ACROSS a schema change refuses loudly (one change
    // frame cannot carry two shapes)
    val dir2 = freshDir("cdfdml2")
    DeltaLake.write(spark, dir2, frame(1 to 5),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLake.stageCommit(spark, dir2, (6 to 8).map(i =>
      (i.toLong, s"g${i % 2}", i * 10L)).toDF("id", "g", "extra"),
      Seq.empty, 1L)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.restore(spark, dir2, 0L)
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("a delete window fails fast — inserts-only streams cannot retract") {
    val dir = freshDir("del")
    DeltaLake.stageCommit(spark, dir, frame(1 to 10), Seq.empty, 0L)
    val ckpt = freshDir("del_ck")
    drain(dir, ckpt)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") % 2 === 0, 1L)
    val e = intercept[Exception] { drain(dir, ckpt) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("delete")),
      s"expected the appended() delete fail-fast, got: ${messages(e)}")
  }
}
