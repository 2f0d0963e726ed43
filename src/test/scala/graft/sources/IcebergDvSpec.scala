package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Format-version 3 deletion vectors (Puffin): a DV snapshot reads
  * data-minus-bitmap with NO delete-file scan or join, repeated DV
  * deletes rewrite the file's vector (remove+add), a DV supersedes
  * positional delete files for its data file, the SIGNED window
  * attributes DV adds and rewrites through the row-identity diff,
  * time travel resolves pre-DV state, corruption fails loudly, and
  * the staged Puffin file is spec-shaped end to end.
  */
class IcebergDvSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_dv_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("DV delete: snapshot subtracts the bitmap; accumulates via " +
      "rewrite; time travel; format-version ratchets to 3") {
    val dir = freshDir("basic")
    val a = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val b = (61L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, a, Seq.empty)
    val s2 = Iceberg.stageAppend(spark, dir, b, Seq.empty)
    val s3 = Iceberg.stageDv(spark, dir, col("id") % 10 === 0)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (1L to 100L).filterNot(_ % 10 == 0).toSet)
    // no delete-file parquet scan: every planned input is a data file
    assert(Iceberg.snapshot(spark, dir).inputFiles
      .forall(f => !f.contains(".puffin")))
    // pre-DV snapshots still read whole files
    assert(ids(Iceberg.snapshot(spark, dir, Some(s2))) == (1L to 100L).toSet)
    assert(ids(Iceberg.snapshot(spark, dir, Some(s1))) == (1L to 60L).toSet)
    // a second DV delete REWRITES the touched file's vector (the new
    // DV carries the complete dead set; the old one is removed)
    val s4 = Iceberg.stageDv(spark, dir, col("id") <= 15)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (16L to 100L).filterNot(_ % 10 == 0).toSet)
    assert(ids(Iceberg.snapshot(spark, dir, Some(s3))) ==
      (1L to 100L).filterNot(_ % 10 == 0).toSet)
    assert(s4 > s3)
    // the metadata is format-version 3 from the first DV on
    val mdFiles = new java.io.File(dir, "metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).sortBy(_.getName)
    val lastMd = java.nio.file.Files.readString(mdFiles.last.toPath)
    assert(lastMd.contains("\"format-version\":3"))
  }

  test("a DV SUPERSEDES positional delete files for its data file " +
      "(the v3 reader rule); un-covered files keep their pos deletes") {
    val dir = freshDir("super")
    val a = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val b = (41L to 80L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)
    Iceberg.stageAppend(spark, dir, b, Seq.empty)
    // classic positional deletes on BOTH files
    Iceberg.stageMorDelete(spark, dir, col("id") % 10 === 0)
    // DV lands only on file A (ids <= 40): it must carry file A's
    // complete dead set (10,20,30,40 ∪ 1..5) and file B keeps its
    // positional deletes (50,60,70,80 stay dead)
    Iceberg.stageDv(spark, dir, col("id") <= 5)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (6L to 80L).filterNot(_ % 10 == 0).toSet)
  }

  test("SIGNED window: a DV add nets exactly the newly-dead rows; a " +
      "DV rewrite never over-retracts already-dead positions") {
    val dir = freshDir("win")
    val df = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, df, Seq.empty)
    val s2 = Iceberg.stageDv(spark, dir, col("id") % 10 === 0)
    // the inserts-only seam stays loud on a DV window
    val e1 = intercept[IllegalArgumentException] {
      Iceberg.appended(spark, dir, s1, Some(s2)).collect()
    }
    assert(e1.getMessage.contains("delete"))
    val ch = Iceberg.changes(spark, dir, s1, Some(s2))
    assert(ch.inserts.isEmpty)
    assert(ids(ch.retracts) == Set(10L, 20L, 30L, 40L, 50L, 60L))
    // DV REWRITE window (s2, s3]: the new vector is a superset — only
    // the newly-dead rows retract
    val s3 = Iceberg.stageDv(spark, dir, col("id") <= 15)
    val ch2 = Iceberg.changes(spark, dir, s2, Some(s3))
    assert(ch2.inserts.isEmpty)
    val retractIds = ch2.retracts.select("id").collect().map(_.getLong(0))
    assert(retractIds.length == retractIds.distinct.length,
      s"a row retracted twice: ${retractIds.sorted.mkString(",")}")
    assert(retractIds.toSet == (1L to 15L).filterNot(_ == 10L).toSet)
    // signed identity
    assert(ids(Iceberg.snapshot(spark, dir, Some(s2))) --
      retractIds.toSet == ids(Iceberg.snapshot(spark, dir, Some(s3))))
  }

  test("DV window plans only the data files the vectors REFERENCE") {
    val dir = freshDir("prune")
    (0 until 4).foreach { k =>
      val df = (k * 10 + 1L to k * 10 + 10L).map(i => (i, s"v$i"))
        .toDF("id", "v").coalesce(1)
      Iceberg.stageAppend(spark, dir, df, Seq.empty)
    }
    val cut = Iceberg.currentSnapshotId(dir)
    val sDel = Iceberg.stageDv(spark, dir, col("id") === 15L)
    val ch = Iceberg.changes(spark, dir, cut, Some(sDel))
    assert(ids(ch.retracts) == Set(15L))
    // the general arm's touched scan covers exactly ONE of the four
    // data files — the one the DV's referenced_data_file names
    val scanned = ch.retracts.inputFiles.toSet
    assert(scanned.size == 1, s"retract arm scanned $scanned")
  }

  test("mixed window: append + DV on the old file in one window") {
    val dir = freshDir("mix")
    val a = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, a, Seq.empty)
    val b = (31L to 45L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, b, Seq.empty)
    val s3 = Iceberg.stageDv(spark, dir, col("id") % 6 === 0)
    val ch = Iceberg.changes(spark, dir, s1, Some(s3))
    assert(ids(ch.inserts) == (31L to 45L).filterNot(_ % 6 == 0).toSet)
    assert(ids(ch.retracts) == (1L to 30L).filter(_ % 6 == 0).toSet)
    val endState = ids(Iceberg.snapshot(spark, dir, Some(s3)))
    assert((ids(Iceberg.snapshot(spark, dir, Some(s1)))
      ++ ids(ch.inserts)) -- ids(ch.retracts) == endState)
  }

  test("plan shape: a DV snapshot is ONE scan + the codegen'd " +
      "anti-filter — no delete-file scan, no join") {
    val dir = freshDir("plan")
    val df = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageDv(spark, dir, col("id") % 8 === 0)
    val snap = Iceberg.snapshot(spark, dir)
    val qe = snap.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution
    assert(ids(snap) == (1L to 40L).filterNot(_ % 8 == 0).toSet)
    val plan = qe.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"a DV snapshot must stay ONE scan:\n$plan")
    assert(!plan.contains("Join"),
      s"DVs apply as a filter, never a join:\n$plan")
    assert(plan.toLowerCase.contains("dvkeep"),
      s"the DvKeep anti-filter must sit on the scan:\n$plan")
    // the whole pipeline — scan, metadata projection, DvKeep filter —
    // sits inside ONE WholeStageCodegen span
    assert("\\*\\(1\\)".r.findAllIn(plan).size >= 3,
      s"DvKeep must stay inside whole-stage codegen:\n$plan")
  }

  test("the changelog STREAM serves a DV window as typed DELETE rows " +
      "(Q13 inherits the v3 arm)") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("chlog")
    val df = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageDv(spark, dir, col("id") % 6 === 0)
    val batches = scala.collection.mutable.Buffer
      .empty[Seq[(String, Long)]]
    val q = spark.readStream.format("graft-iceberg")
      .option("readChangeLog", "true").load(dir)
      .writeStream
      .option("checkpointLocation", freshDir("chlog_ck"))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          batches.synchronized {
            batches += b.select("_change_type", "id").collect()
              .map(r => (r.getString(0), r.getLong(1))).toSeq
          }
          ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val all = batches.flatten
    assert(all.filter(_._1 == "insert").map(_._2).toSet ==
      (1L to 30L).toSet)
    assert(all.filter(_._1 == "delete").map(_._2).toSet ==
      Set(6L, 12L, 18L, 24L, 30L),
      s"DV window must stream delta-sized DELETE rows: $all")
  }

  test("corruption fails loudly: CRC, cardinality, and file magic") {
    val dir = freshDir("crc")
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageDv(spark, dir, col("id") % 5 === 0)
    val puffin = new java.io.File(dir, "data").listFiles()
      .filter(_.getName.endsWith(".puffin")).head
    val bytes = java.nio.file.Files.readAllBytes(puffin.toPath)
    // flip one bitmap byte mid-blob: CRC must catch it
    val corrupt = bytes.clone()
    corrupt(12) = (corrupt(12) ^ 0x1).toByte
    java.nio.file.Files.write(puffin.toPath, corrupt)
    val e1 = intercept[Exception] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e1.getMessage.contains("CRC") ||
      e1.getMessage.contains("magic"), e1.getMessage)
    // break the FILE magic: rejected before any blob parse
    val noMagic = bytes.clone()
    noMagic(0) = 'X'.toByte
    java.nio.file.Files.write(puffin.toPath, noMagic)
    val e2 = intercept[Exception] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e2.getMessage.contains("Puffin"), e2.getMessage)
    java.nio.file.Files.write(puffin.toPath, bytes) // restore
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (1L to 20L).filterNot(_ % 5 == 0).toSet)
  }

  test("staged Puffin file is spec-shaped: magic at both ends, " +
      "footer JSON names every blob, blob round-trips standalone") {
    val dir = freshDir("shape")
    val df = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    Iceberg.stageDv(spark, dir, col("id") % 3 === 0)
    val puffin = new java.io.File(dir, "data").listFiles()
      .filter(_.getName.endsWith(".puffin")).head
    val bytes = java.nio.file.Files.readAllBytes(puffin.toPath)
    assert(bytes.take(4).sameElements("PFA1".getBytes))
    assert(bytes.takeRight(4).sameElements("PFA1".getBytes))
    // footer: ... payloadSize(4 LE) flags(4) magic(4)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val payloadSize = bb.getInt(bytes.length - 12)
    val payload = new String(bytes,
      bytes.length - 12 - payloadSize, payloadSize, "UTF-8")
    assert(payload.contains("deletion-vector-v1"))
    assert(payload.contains("referenced-data-file"))
    // standalone blob read through the public reader
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(payload)
    val blob = node.get("blobs").get(0)
    val bm = Puffin.readDv(puffin.getAbsolutePath,
      blob.get("offset").asLong, blob.get("length").asLong, None)
    assert(bm.toArray.nonEmpty)
  }
}
