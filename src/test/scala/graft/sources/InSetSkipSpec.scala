package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** IN-set stats skipping ([[org.apache.spark.sql.graft.GraftSql
  * .PredInSet]] + [[StatsSkip]]): a `k IN (…)` predicate — the shape
  * the DML subquery materialization bakes into an InSet — prunes a
  * file unless some member lies inside its [min,max] (binary search
  * over the sorted member vector, O(log |set|) per file). The scale
  * story for `DELETE … WHERE k IN (SELECT …)` on a key-clustered
  * estate: files between two selected keys prove themselves clean at
  * the driver and are never scanned.
  */
class InSetSkipSpec extends AnyFunSuite with SparkFixture {

  import org.apache.spark.sql.graft.GraftSql.PredInSet
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))

  private def stats(mn: Long, mx: Long): Option[String] =
    Some(s"""{"minValues":{"k":$mn},"maxValues":{"k":$mx}}""")

  private def may(node: PredInSet, mn: Long, mx: Long): Boolean =
    StatsSkip.mayMatch(node, schema, Seq.empty, Map.empty, stats(mn, mx))

  test("unit: member-in-bounds keeps, no-member-in-bounds prunes, " +
      "empty set prunes, missing stats keep") {
    val in = PredInSet("k", Vector(10L, 50L, 90L))
    assert(may(in, 40L, 60L), "50 lies inside [40,60]")
    assert(may(in, 90L, 99L), "90 is the min bound edge")
    assert(may(in, 5L, 10L), "10 is the max bound edge")
    assert(!may(in, 11L, 49L), "no member inside [11,49]")
    assert(!may(in, 51L, 89L), "no member inside [51,89]")
    assert(!may(in, 91L, 120L), "no member past 90")
    assert(!may(PredInSet("k", Vector.empty), 0L, 100L),
      "an empty (post-null-drop) set can match no row")
    assert(StatsSkip.mayMatch(PredInSet("k", Vector(7L)), schema,
      Seq.empty, Map.empty, None), "no stats → keep")
    // unknown column → keep (conservative)
    assert(StatsSkip.mayMatch(PredInSet("zz", Vector(7L)), schema,
      Seq.empty, Map.empty, stats(0L, 1L)))
    // string members sort/compare by code point
    val sIn = PredInSet("s", Vector("mm", "zz"))
    assert(StatsSkip.mayMatch(sIn, schema, Seq.empty, Map.empty,
      Some("""{"minValues":{"s":"ma"},"maxValues":{"s":"mz"}}""")))
    assert(!StatsSkip.mayMatch(sIn, schema, Seq.empty, Map.empty,
      Some("""{"minValues":{"s":"na"},"maxValues":{"s":"yz"}}""")))
  }

  test("unit: partition-column IN checks the exact log value") {
    val in = PredInSet("p", Vector("a", "c"))
    val sch = StructType(Seq(StructField("p", StringType)))
    assert(StatsSkip.mayMatch(in, sch, Seq("p"), Map("p" -> "c"), None))
    assert(!StatsSkip.mayMatch(in, sch, Seq("p"), Map("p" -> "b"), None))
    // null partition value keeps (IN over null is never true, but the
    // file may hold non-null rows only when the value is per-file
    // exact — a null log value means every row is null → never
    // matches; conservative keep is still CORRECT, just not minimal)
    assert(StatsSkip.mayMatch(in, sch, Seq("p"), Map("p" -> null), None))
  }

  test("end-to-end: an IN-subquery DELETE rewrites ONLY the files " +
      "whose bounds contain a selected key (key-clustered estate)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_inskip").toFile.getAbsolutePath
    // 8 single-file commits, each covering a disjoint key range —
    // the key-clustered estate shape
    (0 until 8).foreach { b =>
      DeltaLake.write(spark, dir,
        ((b * 100) until (b * 100 + 100)).map(i => (i.toLong, s"v$i"))
          .toDF("k", "s").coalesce(1))
    }
    val wh = java.nio.file.Files
      .createTempDirectory("graft_inskip_wh").toFile.getAbsolutePath
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", dir)
    spark.conf.set("spark.sql.catalog.isk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.isk.warehouse", wh)
    // keys from exactly two of the eight ranges
    Seq(150L, 155L, 410L).toDF("k").createOrReplaceTempView("isk_keys")
    spark.sql("DELETE FROM isk.db.t WHERE k IN (SELECT k FROM isk_keys)")
    assert(spark.sql("SELECT COUNT(*) FROM isk.db.t").head()
      .getLong(0) == 797L)
    // the DELETE commit touched exactly the two hit files: 2 DV'd
    // adds (this writer's delete is merge-on-read), 6 untouched
    val last = new java.io.File(dir, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).maxBy(_.getName)
    val text = java.nio.file.Files.readString(last.toPath)
    val removes = "\"remove\"".r.findAllIn(text).length
    assert(removes == 2,
      s"expected 2 files touched (bounds-pruned), got $removes:\n$text")
    // and a plain read with a literal IN list plans only matching
    // files (numFiles metric — inputFiles ignores filter pruning)
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.collectLeaves().collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numFiles").value
        }.get
    }
    val planned = plannedFiles(DeltaLake.snapshot(spark, dir)
      .filter(col("k").isin(5L, 505L)))
    assert(planned == 2,
      s"IN-list read must plan 2 of 8 files, planned $planned")
    // a LARGE list rides the optimizer's InSet conversion and still
    // prunes (the binary-search path)
    val bigKeys = ((700L until 800L) ++ Seq(205L)).toSeq
    val planned2 = plannedFiles(DeltaLake.snapshot(spark, dir)
      .filter(col("k").isin(bigKeys: _*)))
    assert(planned2 == 2,
      s"InSet read must plan 2 of 8 files, planned $planned2")
  }

  test("transform-partitioned iceberg: IN predicates read and DELETE " +
      "without crashing the transform pruner; bucket-equality still " +
      "prunes per member") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_inskip_ib").toFile.getAbsolutePath
    Iceberg.write(spark,
      dir, (0L until 64L).map(i => (i, s"v$i")).toDF("k", "s"),
      partitionBy = Seq("bucket(4, k)"))
    // the read path: pushed In/InSet filters reach the transform
    // pruner (a missing PredInSet arm was a MatchError here)
    assert(Iceberg.snapshot(spark, dir)
      .filter(col("k").isin(3L, 17L)).count() == 2L)
    assert(Iceberg.snapshot(spark, dir)
      .filter(col("k").isin((100L until 220L): _*)).count() == 0L)
    // the DML path: an IN-subquery DELETE on the transform table
    val wh = java.nio.file.Files
      .createTempDirectory("graft_inskip_ibwh").toFile.getAbsolutePath
    GraftCatalog.register(spark, wh, "db.t", "graft-iceberg", dir)
    spark.conf.set("spark.sql.catalog.iskib",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.iskib.warehouse", wh)
    Seq(5L, 6L).toDF("k").createOrReplaceTempView("iskib_keys")
    spark.sql(
      "DELETE FROM iskib.db.t WHERE k IN (SELECT k FROM iskib_keys)")
    assert(spark.sql("SELECT COUNT(*) FROM iskib.db.t").head()
      .getLong(0) == 62L)
  }

  test("member class vs column type mismatch: the sorted fast path " +
      "is DISABLED (its class-order disagrees with the dt-order) — " +
      "a matching file must survive") {
    // string members on a LONG column sort by code point: ["10","9"].
    // A numeric binary search over that vector is over a misordered
    // array and (pre-fix) wrongly proved [9,9] memberless → silent
    // DELETE row loss. The guard degrades to the linear scan.
    val in = PredInSet("k", Vector("9", "10"))
    assert(in.sorted.isDefined, "strings sort (by their own class)")
    assert(may(in, 9L, 9L), "'9' parses to 9 ∈ [9,9] — must keep")
    assert(may(in, 10L, 12L), "'10' ∈ [10,12] — must keep")
    assert(!may(in, 11L, 50L), "no member in [11,50] — prunable")
    // same flaw existed in the partition-value equality search
    val sch = StructType(Seq(StructField("p", LongType)))
    assert(StatsSkip.mayMatch(PredInSet("p", Vector("9", "10")), sch,
      Seq("p"), Map("p" -> "9"), None),
      "partition value 9 equals member '9' — must keep")
    assert(!StatsSkip.mayMatch(PredInSet("p", Vector("9", "10")), sch,
      Seq("p"), Map("p" -> "11"), None))
    // agreeing classes still ride the O(log n) path (sorted defined,
    // pruning proof unchanged)
    assert(!may(PredInSet("k", Vector(9L, 10L)), 11L, 50L))
  }

  test("mixed-type IN members (uncoerced path-arm trees) degrade to " +
      "the linear keep-on-incomparable check, never throw") {
    import org.apache.spark.sql.graft.GraftSql.PredInSet
    val mixed = PredInSet("k",
      Vector(6, new java.math.BigDecimal("3.0")))
    assert(mixed.sorted.isEmpty, "mixed classes must not sort")
    // and the full check runs without throwing (keeps conservatively
    // where incomparable, prunes where provable)
    assert(StatsSkip.mayMatch(mixed, schema, Seq.empty, Map.empty,
      stats(1L, 10L)))
    // end-to-end: a path-identifier DELETE with an uncoerced IN list
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_inskip_mx").toFile.getAbsolutePath
    DeltaLake.write(spark, dir,
      Seq((3L, 1.0), (6L, 2.0), (9L, 3.0)).toDF("k", "x").coalesce(1))
    spark.sql(s"DELETE FROM graft_delta.`$dir` WHERE x IN (2, 3.0)")
    assert(DeltaLake.snapshot(spark, dir).count() == 1L)
  }
}
