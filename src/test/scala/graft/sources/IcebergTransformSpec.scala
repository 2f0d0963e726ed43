package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Non-identity partition transforms: the bucket hash matches the
  * spec's published reference values, a days(ts)-partitioned table
  * prunes files from a timestamp predicate (driver path AND pushed-
  * filter index path), bucket equality prunes to one bucket, truncate
  * prunes int ranges and string prefixes, and hidden partitioning
  * keeps the source column in the data files.
  */
class IcebergTransformSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_tr_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("bucket hash matches the Iceberg spec's reference values") {
    // spec Appendix B: hash(34 as int/long) = 2017239379,
    // hash("iceberg") = 1210000089, hash(17486 as date) = -653330422,
    // hash(2017-11-16T22:31:08 µs) = -2047944441
    def longHash(v: Long): Int = {
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putLong(v)
      IcebergTransforms.murmur3(b.array())
    }
    assert(longHash(34L) == 2017239379)
    assert(IcebergTransforms.murmur3(
      "iceberg".getBytes("UTF-8")) == 1210000089)
    assert(longHash(17486L) == -653330422)
    assert(longHash(java.time.LocalDateTime.parse("2017-11-16T22:31:08")
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L) == -2047944441)
  }

  test("days(ts): snapshot correct, hidden source column, files pruned") {
    val dir = freshDir("days")
    // 6 days × 10 rows; one file per day via the derived partition
    val rows = for (d <- 0 until 6; i <- 0 until 10) yield
      (d.toLong * 10 + i,
        java.time.LocalDateTime.of(2024, 1, 1 + d, 8, 30)
          .plusMinutes(i.toLong))
    val df = rows.toDF("id", "ts").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq("days(ts)"))

    val snap = Iceberg.snapshot(spark, dir)
    // hidden partitioning: ts stays a real data column
    assert(snap.columns.toSeq == Seq("id", "ts"))
    assert(snap.count() == 60)
    val total = snap.inputFiles.length
    assert(total == 6, s"expected one file per day, got $total")

    // driver-side pruning: a 2-day window plans 2 files
    val lo = java.time.LocalDateTime.of(2024, 1, 3, 0, 0)
    val hi = java.time.LocalDateTime.of(2024, 1, 5, 0, 0)
    val window = Iceberg.snapshotWhere(spark, dir,
      col("ts") >= lo && col("ts") < hi)
    assert(window.inputFiles.length == 2,
      s"expected 2 of $total files, got ${window.inputFiles.length}")
    assert(window.count() == 20)

    // pushed-filter path: a plain filter on the snapshot prunes inside
    // the log-backed index's listFiles
    import org.apache.spark.sql.classic
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = Iceberg.snapshot(spark, dir).filter(col("ts") >= hi)
      // collect() executes q's OWN queryExecution so its scan metrics
      // populate (count() would derive a separate plan)
      assert(q.collect().length == 20) // Jan 5 + Jan 6
      val scan = q.asInstanceOf[classic.Dataset[_]].queryExecution
        .executedPlan.collectLeaves().collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.get
      assert(scan.metrics("numFiles").value == 2L,
        "pushed ts predicate must prune to the two matching day files")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("hours(ts) and month(ts): ordinals derive and prune") {
    val dir = freshDir("hours")
    val rows = for (h <- 0 until 4; i <- 0 until 5) yield
      (h.toLong * 5 + i,
        java.time.LocalDateTime.of(2024, 3, 1, 6 + h, 10 * i))
    Iceberg.stageAppend(spark, dir, rows.toDF("id", "ts").coalesce(1),
      Seq("hours(ts)"))
    assert(Iceberg.snapshot(spark, dir).count() == 20)
    assert(Iceberg.snapshot(spark, dir).inputFiles.length == 4)
    val win = Iceberg.snapshotWhere(spark, dir,
      col("ts") >= java.time.LocalDateTime.of(2024, 3, 1, 8, 0) &&
        col("ts") < java.time.LocalDateTime.of(2024, 3, 1, 9, 0))
    assert(win.inputFiles.length == 1)
    assert(win.count() == 5)

    val dir2 = freshDir("month")
    val rows2 = for (m <- 0 until 3; i <- 0 until 4) yield
      (m.toLong * 4 + i, java.time.LocalDateTime.of(2024, 5 + m, 2 + i, 12, 0))
    Iceberg.stageAppend(spark, dir2, rows2.toDF("id", "ts").coalesce(1),
      Seq("month(ts)"))
    assert(Iceberg.snapshot(spark, dir2).inputFiles.length == 3)
    val jun = Iceberg.snapshotWhere(spark, dir2,
      col("ts") >= java.time.LocalDateTime.of(2024, 6, 1, 0, 0) &&
        col("ts") < java.time.LocalDateTime.of(2024, 7, 1, 0, 0))
    assert(jun.inputFiles.length == 1)
    assert(jun.count() == 4)
  }

  test("bucket(8, id): equality prunes to one bucket; ranges keep all") {
    val dir = freshDir("bucket")
    val df = (0L until 400L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq("bucket(8, id)"))
    val total = Iceberg.snapshot(spark, dir).inputFiles.length
    assert(total == 8, s"expected 8 bucket files, got $total")
    val eq = Iceberg.snapshotWhere(spark, dir, col("id") === 123L)
    assert(eq.inputFiles.length == 1,
      "equality must prune to the literal's bucket")
    assert(eq.count() == 1)
    assert(eq.head().getLong(0) == 123L)
    // a range predicate cannot constrain a hash bucket: all files kept
    assert(Iceberg.snapshotWhere(spark, dir, col("id") > 100L)
      .inputFiles.length == 8)
  }

  test("truncate: int ranges and string prefixes prune") {
    val dir = freshDir("trunc")
    val df = (0L until 300L).map(i => (i, f"k$i%03d")).toDF("id", "name")
      .coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq("truncate(100, id)"))
    assert(Iceberg.snapshot(spark, dir).inputFiles.length == 3)
    val mid = Iceberg.snapshotWhere(spark, dir,
      col("id") >= 120L && col("id") < 180L)
    assert(mid.inputFiles.length == 1)
    assert(mid.count() == 60)

    val dir2 = freshDir("truncs")
    val df2 = Seq("apple", "apricot", "banana", "berry", "cherry")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
      .coalesce(1)
    Iceberg.stageAppend(spark, dir2, df2, Seq("truncate(2, name)"))
    val ap = Iceberg.snapshotWhere(spark, dir2, col("name") === "apricot")
    assert(ap.inputFiles.length == 1,
      "string-truncate EQ must prune to the 'ap' prefix file")
    assert(ap.count() == 1)
    // LT against a string below every 'ch' prefix drops that file
    val lt = Iceberg.snapshotWhere(spark, dir2, col("name") < "b")
    assert(lt.count() == 2)
    assert(lt.inputFiles.length == 1)
  }

  test("mixed identity + transform spec; MoR delete on a days table") {
    val dir = freshDir("mixed")
    val rows = for (d <- 0 until 3; i <- 0 until 10) yield
      (d.toLong * 10 + i, if (i % 2 == 0) "A" else "B",
        java.time.LocalDateTime.of(2024, 2, 1 + d, 12, 0))
    Iceberg.stageAppend(spark, dir, rows.toDF("id", "g", "ts").coalesce(1),
      Seq("g", "days(ts)"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "g", "ts"))
    assert(snap.count() == 30)
    assert(snap.inputFiles.length == 6) // 2 groups × 3 days
    // identity partition pruning still exact
    assert(Iceberg.snapshotWhere(spark, dir, col("g") === "A")
      .inputFiles.length == 3)
    // MoR delete composes with a transform-partitioned table
    Iceberg.stageMorDelete(spark, dir, col("id") % 10 === 0)
    assert(Iceberg.snapshot(spark, dir).count() == 27)
    // both prunings still compose on the MoR snapshot
    val day0 = Iceberg.snapshotWhere(spark, dir,
      col("ts") < java.time.LocalDateTime.of(2024, 2, 2, 0, 0))
    assert(day0.count() == 9)
  }

  test("partition spec evolution: unpartitioned era → days(ts) era (r11)") {
    val dir = freshDir("evo")
    val rows = for (d <- 0 until 6; i <- 0 until 10) yield
      (d.toLong * 10 + i,
        java.time.LocalDateTime.of(2024, 1, 1 + d, 8, 30)
          .plusMinutes(i.toLong))
    val df = rows.toDF("id", "ts")
    // era 1 (spec 0): days 1-3, UNPARTITIONED, one file
    Iceberg.stageAppend(spark, dir,
      df.filter(col("id") < 30).coalesce(1), Seq.empty)
    // era 2 (spec 1): days 4-6 under days(ts), one file per day
    Iceberg.stageAppend(spark, dir,
      df.filter(col("id") >= 30).coalesce(1), Seq("days(ts)"))

    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "ts"))
    assert(snap.count() == 60)
    assert(snap.inputFiles.length == 4,
      "1 unpartitioned era-1 file + 3 day files")
    // predicate inside the NEW era: day files prune to the matching
    // one; the era-1 file keeps (its spec has no days field —
    // conservative on absence)
    val newEra = Iceberg.snapshotWhere(spark, dir,
      col("ts") >= java.time.LocalDateTime.of(2024, 1, 5, 0, 0) &&
        col("ts") < java.time.LocalDateTime.of(2024, 1, 6, 0, 0))
    assert(newEra.inputFiles.length == 2,
      s"era-1 file + 1 day file, got ${newEra.inputFiles.length}")
    assert(newEra.count() == 10)
    // predicate inside the OLD era: every era-2 day file prunes out
    val oldEra = Iceberg.snapshotWhere(spark, dir,
      col("ts") >= java.time.LocalDateTime.of(2024, 1, 3, 0, 0) &&
        col("ts") < java.time.LocalDateTime.of(2024, 1, 4, 0, 0))
    assert(oldEra.inputFiles.length == 1,
      s"only the era-1 file, got ${oldEra.inputFiles.length}")
    assert(oldEra.count() == 10)
    // time travel to the pre-evolution snapshot
    assert(Iceberg.snapshot(spark, dir, Some(1L)).count() == 30)
    // the signed seam reads the evolution window as a plain append
    assert(Iceberg.isAppendOnly(spark, dir, 1L, 2L))
    val ch = Iceberg.changes(spark, dir, 1L)
    assert(ch.inserts.count() == 30 && ch.retracts.count() == 0)
    // DML after evolution re-commits the CURRENT spec (id reuse): a
    // MoR delete neither re-partitions nor breaks per-era decoding
    Iceberg.stageMorDelete(spark, dir, col("id") % 10 === 3)
    assert(Iceberg.snapshot(spark, dir).count() == 54)
    val ch2 = Iceberg.changes(spark, dir, 2L)
    assert(ch2.retracts.count() == 6 && ch2.inserts.count() == 0)
  }

  test("IDENTITY-partition evolution fails loudly (mixed data layout)") {
    val dir = freshDir("evoid")
    val df = (0L until 20L).map(i => (i, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "g")
    Iceberg.stageAppend(spark, dir, df.filter(col("id") < 10).coalesce(1),
      Seq.empty)
    Iceberg.stageAppend(spark, dir, df.filter(col("id") >= 10).coalesce(1),
      Seq("g"))
    val e = intercept[IllegalArgumentException] {
      Iceberg.snapshot(spark, dir).count()
    }
    assert(e.getMessage.contains("identity"),
      s"unexpected message: ${e.getMessage}")
  }
}
