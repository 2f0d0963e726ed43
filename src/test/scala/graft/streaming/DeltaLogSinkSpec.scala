package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.DeltaLake

/** The Delta-log streaming SINK: each micro-batch is one transactional
  * commit with a `txn` action, replayed batches dedup against the log
  * (exactly-once under restart), complete-mode batches overwrite while
  * prior versions stay time-travel readable, partitioned writes land
  * partition values in the log, commit creation is exclusive (racing
  * writers fail loudly), and the written table round-trips through the
  * native read paths — snapshot, time travel, and the streaming
  * SOURCE.
  */
class DeltaLogSinkSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_sink_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"g${i % 2}")).toDF("id", "g").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  /** Stream `src` through the sink into `dest` under AvailableNow. */
  private def pump(src: String, dest: String, ckpt: String): Unit = {
    val q = spark.readStream.format("graft-deltalake").load(src)
      .writeStream.format("graft-deltalake")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dest)
    q.awaitTermination()
  }

  test("a sink batch after a NESTED type widen keeps the member's " +
      "typeChanges history (metadata-insensitive schema adoption)") {
    import org.apache.spark.sql.functions.struct
    val dest = freshDir("nw_dest")
    DeltaLake.write(spark, dest,
      (1 to 3).map(i => (i.toLong, i))
        .toDF("id", "n")
        .select(org.apache.spark.sql.functions.col("id"),
          struct(org.apache.spark.sql.functions.col("n")).as("s"))
        .coalesce(1))
    DeltaLake.widenField(spark, dest, Seq("s", "n"),
      org.apache.spark.sql.types.LongType)
    def nMeta = DeltaLake.snapshot(spark, dest).schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("n").metadata
    assert(nMeta.contains("delta.typeChanges"))
    // a batch frame never carries delta.* metadata — the sink's
    // schema adoption must keep the TABLE's field anyway
    DeltaLake.commitStreamBatch(spark, dest,
      Seq((4L, 40L)).toDF("id", "s")
        .selectExpr("id", "named_struct('n', s) AS s"),
      Seq.empty, "app_nw", 0L, overwrite = false)
    assert(nMeta.contains("delta.typeChanges"),
      "the sink batch stripped the nested widening history")
    assert(ids(DeltaLake.snapshot(spark, dest)) == Set(1L, 2L, 3L, 4L))
  }

  test("append mode: one commit per batch, txn recorded, round-trips " +
      "through snapshot AND the streaming source") {
    val src = freshDir("ap_src")
    DeltaLake.stageCommit(spark, src, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, src, frame(11 to 20), Seq.empty, 1L)
    val dest = freshDir("ap_dst")
    val ckpt = freshDir("ap_ck")
    pump(src, dest, ckpt)
    // content round-trips
    assert(ids(DeltaLake.snapshot(spark, dest)) == (1L to 20L).toSet)
    // one commit per micro-batch (2 source versions = batches 0,1)
    val log = new java.io.File(dest, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).map(_.getName).sorted
    assert(log.length == 2, s"expected 2 commits, got ${log.toSeq}")
    // the txn ratchet reflects both batches
    val appId = "ckpt:" + new java.io.File(ckpt).getAbsolutePath
    assert(DeltaLake.txnVersion(dest, appId) == 1L)
    // and the WRITTEN table tails through the streaming SOURCE
    import scala.collection.mutable
    val batches = mutable.Buffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-deltalake").load(dest)
      .writeStream
      .option("checkpointLocation", freshDir("ap_ck2"))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          batches.synchronized { batches += ids(b.toDF()) }
          ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(batches.flatten.toSet == (1L to 20L).toSet)
  }

  test("exactly-once: a replayed batch is SKIPPED against the log's " +
      "txn, and a resumed stream writes only new source commits") {
    val src = freshDir("eo_src")
    DeltaLake.stageCommit(spark, src, frame(1 to 10), Seq.empty, 0L)
    val dest = freshDir("eo_dst")
    val ckpt = freshDir("eo_ck")
    pump(src, dest, ckpt)
    assert(ids(DeltaLake.snapshot(spark, dest)) == (1L to 10L).toSet)
    // direct replay of an already-committed batch id: no new commit
    val appId = "ckpt:" + new java.io.File(ckpt).getAbsolutePath
    val sink = new DeltaLogSink(dest, Seq.empty, appId,
      overwrite = false)
    sink.addBatch(0L, frame(1 to 10))
    assert(ids(DeltaLake.snapshot(spark, dest)) == (1L to 10L).toSet,
      "replayed batch must not duplicate rows")
    // resume with the SAME checkpoint after a new source commit:
    // exactly the new rows land, exactly one new commit
    DeltaLake.stageCommit(spark, src, frame(11 to 15), Seq.empty, 1L)
    pump(src, dest, ckpt)
    assert(ids(DeltaLake.snapshot(spark, dest)) == (1L to 15L).toSet)
    val log = new java.io.File(dest, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(log.length == 2, "resume must add exactly one commit")
  }

  test("complete mode: each batch overwrites; prior versions stay " +
      "time-travel readable") {
    val src = freshDir("cm_src")
    DeltaLake.stageCommit(spark, src, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, src, frame(11 to 20), Seq.empty, 1L)
    val dest = freshDir("cm_dst")
    val q = spark.readStream.format("graft-deltalake")
      .load(src)
      .groupBy(col("g"))
      .agg(org.apache.spark.sql.functions.count(col("id")).as("n"))
      .writeStream.format("graft-deltalake")
      .outputMode("complete")
      .option("checkpointLocation", freshDir("cm_ck"))
      .trigger(Trigger.AvailableNow())
      .start(dest)
    q.awaitTermination()
    // final snapshot = the full aggregate
    val fin = DeltaLake.snapshot(spark, dest)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fin == Map("g0" -> 10L, "g1" -> 10L))
    // version 0 held the first batch's partial aggregate
    val v0 = DeltaLake.snapshot(spark, dest, version = Some(0L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v0 == Map("g0" -> 5L, "g1" -> 5L))
  }

  test("partitioned write: partition values land in the log and prune") {
    val src = freshDir("pt_src")
    DeltaLake.stageCommit(spark, src, frame(1 to 20), Seq.empty, 0L)
    val dest = freshDir("pt_dst")
    val q = spark.readStream.format("graft-deltalake").load(src)
      .writeStream.format("graft-deltalake")
      .partitionBy("g")
      .option("checkpointLocation", freshDir("pt_ck"))
      .trigger(Trigger.AvailableNow())
      .start(dest)
    q.awaitTermination()
    assert(ids(DeltaLake.snapshot(spark, dest)) == (1L to 20L).toSet)
    // partition pruning: only the g=g1 files are OPENED (numFiles
    // metric after run — inputFiles reflects the pre-pruning index)
    val pruned = DeltaLake.snapshot(spark, dest)
      .filter(col("g") === "g1")
    val qe = pruned.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution
    // execute THIS frame (a derived .select would plan separately and
    // leave these metrics untouched)
    assert(pruned.collect().map(_.getLong(0)).toSet ==
      (1L to 20L).filter(_ % 2 == 1).toSet)
    val scan = qe.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metrics("numFiles").value == 1,
      s"expected only the g=g1 file planned, got " +
        s"${scan.metrics("numFiles").value}")
  }

  test("racing writers: the losing commit fails loudly, never " +
      "silently clobbers") {
    val dest = freshDir("race")
    val appId = "race-app"
    val sink = new DeltaLogSink(dest, Seq.empty, appId,
      overwrite = false)
    sink.addBatch(0L, frame(1 to 5))
    // a concurrent writer lands version 1 between this writer's
    // version resolution and its commit — the exclusive-creation
    // guard must refuse, and the winner's content must survive intact
    DeltaLake.stageCommit(spark, dest, frame(100 to 100), Seq.empty, 1L)
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaLake.writeCommitExclusive(dest, 1L,
        Seq("""{"txn":{"appId":"race-app","version":1}}"""))
    }
    assert(e.getMessage.contains("concurrent"))
    // the losing commit did NOT clobber the winner
    assert(ids(DeltaLake.snapshot(spark, dest)) ==
      (1L to 5L).toSet + 100L)
    // and a RETRY through the normal path lands on the NEXT version
    // with the full content visible
    graft.sources.DeltaLake.commitStreamBatch(spark, dest,
      frame(6 to 9), Seq.empty, appId, 1L, overwrite = false)
    assert(ids(DeltaLake.snapshot(spark, dest)) ==
      (1L to 9L).toSet + 100L)
  }

  test("cross-format round trip: an ICEBERG stream lands as a Delta " +
      "table (inherited field-id metadata stripped, ids re-owned)") {
    val src = freshDir("xf_src")
    graft.sources.Iceberg.stageAppend(spark, src, frame(1 to 10),
      Seq.empty)
    graft.sources.Iceberg.stageAppend(spark, src, frame(11 to 20),
      Seq.empty)
    val dest = freshDir("xf_dst")
    val q = spark.readStream.format("graft-iceberg").load(src)
      .writeStream.format("graft-deltalake")
      .option("checkpointLocation", freshDir("xf_ck"))
      .trigger(Trigger.AvailableNow())
      .start(dest)
    q.awaitTermination()
    assert(ids(DeltaLake.snapshot(spark, dest)) == (1L to 20L).toSet)
    // the destination's schemaString carries NO inherited field-id
    // metadata (the Iceberg source's ids must not leak into the Delta
    // table's identity)
    val commit0 = java.nio.file.Files.readString(new java.io.File(dest,
      "_delta_log/00000000000000000000.json").toPath)
    assert(!commit0.contains("parquet.field.id"),
      "inherited field-id metadata leaked into the Delta schemaString")
  }

  test("update output mode is refused loudly") {
    val src = freshDir("um_src")
    DeltaLake.stageCommit(spark, src, frame(1 to 5), Seq.empty, 0L)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-deltalake").load(src)
        .groupBy(col("g"))
        .agg(org.apache.spark.sql.functions.count(col("id")).as("n"))
        .writeStream.format("graft-deltalake")
        .outputMode("update")
        .option("checkpointLocation", freshDir("um_ck"))
        .trigger(Trigger.AvailableNow())
        .start(freshDir("um_dst"))
      q.awaitTermination()
    }
    assert(e.getMessage.toLowerCase.contains("update"))
  }

  private def aggPump(src: String, dest: String, ckpt: String): Unit = {
    val q = spark.readStream.format("graft-deltalake").load(src)
      .groupBy(col("g"))
      .agg(org.apache.spark.sql.functions.count(col("id")).as("n"))
      .writeStream.format("graft-deltalake")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dest)
    q.awaitTermination()
  }

  test("complete mode on a CDF table EMITS full-table change files — " +
      "a downstream feed consumer stays alive across the recompute") {
    import spark.implicits._
    val src = freshDir("cdf_src")
    DeltaLake.stageCommit(spark, src, frame(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, src, frame(11 to 20), Seq.empty, 1L)
    val dest = freshDir("cdf_dst")
    // the destination pre-exists WITH the feed enabled
    DeltaLake.write(spark, dest,
      Seq(("seed", 0L)).toDF("g", "n"),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    aggPump(src, dest, freshDir("cdf_ck"))
    // every overwrite commit carries cdc actions
    val commits = new java.io.File(dest, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName).toSeq.tail
    assert(commits.nonEmpty)
    commits.foreach { f =>
      val txt = java.nio.file.Files.readString(f.toPath)
      assert(txt.contains("\"cdc\""),
        s"complete-mode commit ${f.getName} on a CDF table carries " +
          s"no change files: $txt")
    }
    // the feed reads the whole window (no fail-fast) and NETS to the
    // final content: apply inserts minus deletes in version order
    val feed = DeltaLake.changeFeed(spark, dest, afterVersion = 0L)
      .collect()
    val live = scala.collection.mutable.Map.empty[String, Long]
    feed.groupBy(_.getLong(feed.head.fieldIndex("_commit_version")))
      .toSeq.sortBy(_._1).foreach { case (_, rows) =>
        // within one commit the delete(old) must land before the
        // insert(new) of the same key — a recompute touches every key
        val (dels, ins) = rows.partition(r =>
          r.getString(r.fieldIndex("_change_type")) == "delete")
        dels.foreach(r => live.remove(r.getString(r.fieldIndex("g"))))
        ins.foreach { r =>
          assert(r.getString(r.fieldIndex("_change_type")) == "insert")
          live(r.getString(r.fieldIndex("g"))) =
            r.getLong(r.fieldIndex("n"))
        }
      }
    assert(live.toMap == Map("g0" -> 10L, "g1" -> 10L),
      s"feed did not net to the final content: $live")
    assert(live.toMap == DeltaLake.snapshot(spark, dest).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("sink gates mirror the batch writer: appendOnly refuses " +
      "complete mode, CHECK constraints refuse everything, and " +
      "complete-mode removes CARRY deletion vectors") {
    import spark.implicits._
    val src = freshDir("gate_src")
    DeltaLake.stageCommit(spark, src, frame(1 to 10), Seq.empty, 0L)

    // appendOnly: complete mode removes files — refused
    val d1 = freshDir("gate_ao")
    DeltaLake.write(spark, d1, Seq(("seed", 0L)).toDF("g", "n"),
      properties = Map("delta.appendOnly" -> "true"))
    val e1 = intercept[Exception] {
      aggPump(src, d1, freshDir("gate_ao_ck"))
    }
    assert(e1.toString.contains("appendOnly") ||
      e1.getCause != null && e1.getCause.toString.contains("appendOnly"),
      s"expected the appendOnly gate, got: $e1")

    // CHECK constraints are EVALUATED per batch (r15): a batch
    // violating one refuses the commit with the constraint named
    val d2 = freshDir("gate_ck")
    val ld = new java.io.File(d2, "_delta_log"); ld.mkdirs()
    val ss = Seq((0L, "x")).toDF("id", "g").schema.json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    java.nio.file.Files.writeString(
      new java.io.File(ld, f"${0L}%020d.json").toPath,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$ss","partitionColumns":[],"configuration":{"delta.constraints.pos":"id > 100"}}}
         |""".stripMargin)
    val e2 = intercept[Exception] {
      pump(src, d2, freshDir("gate_ck_ck"))
    }
    assert(e2.toString.contains("pos") ||
      e2.getCause != null && e2.getCause.toString.contains("pos"),
      s"expected the CHECK-constraint enforcement, got: $e2")

    // DV carry: a complete-mode overwrite's removes must keep the
    // removed file's deletionVector descriptor
    val d3 = freshDir("gate_dv")
    DeltaLake.write(spark, d3, (1 to 10).map(i => (i.toLong, s"g$i"))
      .toDF("id", "g"))
    DeltaLake.stageDvDeleteCommit(spark, d3, col("id") === 3L, 1L)
    val q = spark.readStream.format("graft-deltalake").load(src)
      .groupBy(col("g"))
      .agg(org.apache.spark.sql.functions.count(col("id"))
        .cast("string").as("g2"),
        org.apache.spark.sql.functions.max(col("id")).as("id2"))
      .select(col("id2").as("id"), col("g2").as("g"))
      .writeStream.format("graft-deltalake")
      .outputMode("complete")
      .option("checkpointLocation", freshDir("gate_dv_ck"))
      .trigger(Trigger.AvailableNow())
      .start(d3)
    q.awaitTermination()
    val last = new java.io.File(d3, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).map(_.toPath)
      .sortBy(_.toString).last
    val txt = java.nio.file.Files.readString(last)
    assert(txt.contains("\"remove\"") &&
      txt.contains("\"deletionVector\""),
      s"the overwrite's remove dropped the file's DV descriptor: $txt")
  }
}
