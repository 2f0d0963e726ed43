package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.ivm.DeltaLakeSnapshots

/** Deletion vectors end to end: the Z85/roaring wire codecs round-trip,
  * a DV'd snapshot reads file-minus-bitmap (sidecar AND inline), a
  * second DV on the same file supersedes (union), a rewrite delete
  * supersedes a DV, the DV survives a checkpoint, the signed seam nets a
  * DV window to exactly the newly-deleted rows, and the protocol gate
  * still fails fast on reader features beyond deletionVectors.
  */
class DeletionVectorSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_dv_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("Z85 round-trips arbitrary byte payloads including non-4-multiples") {
    val rnd = new scala.util.Random(7)
    (0 to 40).foreach { n =>
      val bytes = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val enc = DeletionVectors.z85Encode(bytes)
      assert(DeletionVectors.z85Decode(enc, n).toSeq == bytes.toSeq)
    }
  }

  test("Z85 groups decoding above 2^32-1 are rejected at the codec") {
    // '#' is the alphabet's max digit: "#####" decodes to ~4.44e9,
    // above the 4-byte ceiling — truncating would yield garbage bytes
    // that only downstream CRC/magic checks might catch (and inline
    // descriptors have no such backstop)
    val e = intercept[IllegalArgumentException] {
      DeletionVectors.z85Decode("#####", 4)
    }
    assert(e.getMessage.contains("2^32"))
    // the maximal VALID group still decodes: 0xFFFFFFFF
    val enc = DeletionVectors.z85Encode(
      Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte))
    assert(DeletionVectors.z85Decode(enc, 4).forall(_ == 0xFF.toByte))
  }

  test("bitmap64 serialization round-trips across 32-bit bucket boundaries") {
    val idx = Seq(0L, 1L, 7L, 65535L, (1L << 32) - 1, 1L << 32,
      (1L << 32) + 5, (3L << 32) + 123456789L)
    val bm = new DeletionVectors.Bitmap64
    idx.foreach(bm.add)
    val back = DeletionVectors.deserialize(bm.serialize())
    assert(back.cardinality == idx.size)
    idx.foreach(i => assert(back.contains(i), s"missing $i"))
    assert(!back.contains(2L))
    assert(!back.contains((2L << 32) + 1))
    assert(back.toArray.toSeq == idx.sorted)
  }

  test("DV snapshot reads file minus bitmap; inline and sidecar; supersede") {
    for (inline <- Seq(false, true)) {
      val dir = freshDir(if (inline) "inl" else "side")
      val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
      DeltaLake.stageCommit(spark, dir, df, Seq.empty, 0L)
      DeltaLake.stageDvDeleteCommit(spark, dir, col("id") % 10 === 0, 1L,
        inline = inline)
      assert(ids(DeltaLake.snapshot(spark, dir)) ==
        (1L to 100L).filterNot(_ % 10 == 0).toSet)
      // time travel reads the pre-DV snapshot
      assert(ids(DeltaLake.snapshot(spark, dir, Some(0L))) ==
        (1L to 100L).toSet)
      // second DV on the same file: union supersedes
      DeltaLake.stageDvDeleteCommit(spark, dir, col("id") <= 3, 2L,
        inline = inline)
      assert(ids(DeltaLake.snapshot(spark, dir)) ==
        (4L to 100L).filterNot(_ % 10 == 0).toSet)
    }
  }

  test("predicate snapshot and stats skipping still apply over DV'd files") {
    val dir = freshDir("pred")
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, df, Seq.empty, 0L)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") > 90, 1L)
    assert(ids(DeltaLake.snapshotWhere(spark, dir, col("id") >= 50)) ==
      (50L to 90L).toSet)
  }

  test("DV survives a checkpoint resume with subsumed commits deleted") {
    val dir = freshDir("ckpt")
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, df, Seq.empty, 0L)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") % 7 === 0, 1L)
    DeltaLake.stageCheckpoint(spark, dir, 1L)
    // delete the subsumed JSON commits: the checkpoint path is proven
    Seq(0L, 1L).foreach { v =>
      val f = new java.io.File(s"$dir/_delta_log", f"$v%020d.json")
      assert(f.delete())
    }
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (1L to 50L).filterNot(_ % 7 == 0).toSet)
  }

  test("rewrite delete supersedes the DV (remove carries the old DV)") {
    val dir = freshDir("rewrite")
    val df = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, df, Seq.empty, 0L)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") % 5 === 0, 1L)
    // rewrite delete on the DV'd file: survivors = live rows only (the
    // rewriter must not resurrect DV-deleted rows), and the remove
    // action retires the (path, dv1) identity
    DeltaLake.stageDeleteCommit(spark, dir, col("id") > 50, 2L)
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (1L to 50L).filterNot(_ % 5 == 0).toSet)
    // signed window across BOTH deletes: the in-window (p,dv1) version
    // cancels; net = retract(original file) + insert(final survivors)
    val ch = DeltaLake.changes(spark, dir, 0L)
    assert(ids(ch.inserts) == (1L to 50L).filterNot(_ % 5 == 0).toSet)
    assert(ids(ch.retracts) == (1L to 60L).toSet)
  }

  test("signed seam: a DV window nets to exactly the newly-deleted rows") {
    val dir = freshDir("signed")
    val df = (1L to 100L).map(i => (i, i % 4)).toDF("id", "g").coalesce(1)
    DeltaLake.stageCommit(spark, dir, df, Seq.empty, 0L)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") % 10 === 0, 1L)

    val ch = DeltaLake.changes(spark, dir, 0L)
    // inserts = file minus newDv; retracts = file (no old DV at the cut)
    assert(ids(ch.inserts) == (1L to 100L).filterNot(_ % 10 == 0).toSet)
    assert(ids(ch.retracts) == (1L to 100L).toSet)

    // maintained aggregate through the DV delete via the splice
    DeltaLakeSnapshots.track(spark, "dv_signed", dir, at = Some(0L))
    val aggOf = (d: org.apache.spark.sql.DataFrame) =>
      d.groupBy("g").agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.sum("id").as("s"))
    val stored = aggOf(DeltaLake.snapshot(spark, dir, Some(0L)))
    val maintained = DeltaLakeSnapshots.maintainAgg(spark, "dv_signed",
      stored, Seq("g"), aggOf)
    val expect = aggOf(DeltaLake.snapshot(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = maintained
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)

    // a second DV delete in a later window: remove(p,dv1)+add(p,dv2)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") <= 4, 2L)
    val ch2 = DeltaLake.changes(spark, dir, 1L)
    assert(ids(ch2.inserts) ==
      (5L to 100L).filterNot(_ % 10 == 0).toSet)
    assert(ids(ch2.retracts) == (1L to 100L).filterNot(_ % 10 == 0).toSet)
  }

  test("DVs apply under URL-encoded file paths (space/unicode partitions)") {
    // `_metadata.file_path` renders URI-ENCODED ("a b" → "a%20b"): a
    // lookup keyed only on the raw path would silently UNDELETE every
    // row of such partitions (the bug this spec pins)
    val dir = freshDir("enc")
    val df = (1L to 90L).map(i =>
        (i, Seq("NOT SPECIFIED", "plain", "a+b c")(i.toInt % 3)))
      .toDF("id", "p").coalesce(1)
    DeltaLake.stageCommit(spark, dir, df, Seq("p"), 0L)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") % 4 === 0, 1L)
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (1L to 90L).filterNot(_ % 4 == 0).toSet)
  }

  test("append-only guards fire on DV windows; protocol gate stays loud") {
    val dir = freshDir("guard")
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, df, Seq.empty, 0L)
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") === 1, 1L)
    assert(!DeltaLake.isAppendOnly(dir, 0L, 1L))
    val e = intercept[IllegalArgumentException] {
      DeltaLake.appended(spark, dir, 0L)
    }
    assert(e.getMessage.contains("deletion"))
    // unsupported reader feature still fails fast
    val dir2 = freshDir("gate")
    DeltaLake.stageCommit(spark, dir2, df, Seq.empty, 0L)
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir2/_delta_log", f"${1L}%020d.json").toPath,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["someFutureFeature"]}}""" + "\n")
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.snapshot(spark, dir2)
    }
    assert(e2.getMessage.contains("someFutureFeature"))
  }

  test("storageType 'p' descriptors accept absolute paths and file: URIs") {
    val dir = freshDir("ptype")
    val d = DeletionVectors.stage(dir, Seq(1L, 5L, 9L), inline = false)
    // locate the sidecar the 'u' descriptor names, then re-describe it
    // as 'p' — with the bare absolute path AND the scheme-qualified URI
    // a writer may emit; a remote scheme stays loud
    val bin = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("deletion_vector_")).head
    Seq(bin.getAbsolutePath, s"file://${bin.getAbsolutePath}").foreach {
      pth =>
        val bm = DeletionVectors.read(dir,
          d.copy(storageType = "p", pathOrInlineDv = pth))
        assert(bm.toArray.toSeq == Seq(1L, 5L, 9L), pth)
    }
    intercept[UnsupportedOperationException] {
      DeletionVectors.read(dir, d.copy(storageType = "p",
        pathOrInlineDv = "s3://bucket/x.bin"))
    }
  }
}
