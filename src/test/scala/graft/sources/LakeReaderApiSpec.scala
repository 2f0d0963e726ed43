package graft.sources

import org.apache.spark.sql.classic
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The BATCH DataFrame-reader/writer registration
  * (`spark.read.format("graft-deltalake"/"graft-iceberg")`,
  * `df.write.format(...)`) and the SQL identifiers
  * (`graft_delta.`path``) — the r11 review's top missing item. The
  * load-bearing assertions: content equals the library API, the
  * extension splice leaves a native file scan (never the V1 row
  * fallback), read options select versions/refs/feeds, SaveModes map
  * correctly, and the extension-less fallback still serves correct
  * rows.
  */
class LakeReaderApiSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_rapi_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def leaves(df: org.apache.spark.sql.DataFrame) =
    df.asInstanceOf[classic.Dataset[_]].queryExecution
      .executedPlan.collectLeaves()

  test("read.format resolves both formats to the NATIVE scan: content " +
      "matches the library API and the plan is a file scan, not the " +
      "V1 row fallback") {
    val dd = freshDir("dread")
    DeltaLake.write(spark, dd, frame(1 to 40), partitionBy = Seq("g"))
    val dDf = spark.read.format("graft-deltalake").load(dd)
    assert(ids(dDf) == (1L to 40L).toSet)
    assert(dDf.schema == DeltaLake.snapshot(spark, dd).schema)

    val id = freshDir("iread")
    Iceberg.write(spark, id, frame(1 to 30))
    val iDf = spark.read.format("graft-iceberg").load(id)
    assert(ids(iDf) == (1L to 30L).toSet)

    // the splice must leave the log-backed parquet scan — an RDD scan
    // leaf means the fallback executed and pushdown/codegen are gone
    Seq(dDf, iDf).foreach { df =>
      val ls = leaves(df.filter(col("id") > 5))
      assert(ls.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
        s"expected a native file scan, got: ${ls.map(_.nodeName)}")
      assert(!ls.exists(_.nodeName.contains("Scan ExistingRDD")) &&
        !ls.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.RDDScanExec]),
        s"V1 row fallback leaked into the plan: ${ls.map(_.nodeName)}")
    }
    // and partition pruning still works through the reader API
    val pruned = dDf.filter(col("g") === "g1")
    assert(pruned.count() == 10L)
    val scan = leaves(pruned).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.get
    assert(scan.metrics("numFiles").value < 4,
      "partition filter did not prune through the reader API")
  }

  test("read options: versionAsOf / timestampAsOf / readChangeFeed " +
      "(delta), snapshotId / tag (iceberg); conflicts are refused") {
    val dd = freshDir("dopts")
    DeltaLake.write(spark, dd, frame(1 to 10))
    DeltaLake.write(spark, dd, frame(11 to 20))
    assert(ids(spark.read.format("graft-deltalake")
      .option("versionAsOf", "0").load(dd)) == (1L to 10L).toSet)
    assert(ids(spark.read.format("graft-deltalake")
      .option("timestampAsOf", System.currentTimeMillis.toString)
      .load(dd)) == (1L to 20L).toSet)
    val feed = spark.read.format("graft-deltalake")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(dd)
    assert(feed.columns.contains("_change_type"))
    assert(feed.collect().forall(r =>
      r.getString(r.fieldIndex("_change_type")) == "insert"))
    assert(ids(feed) == (11L to 20L).toSet)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-deltalake").option("versionAsOf", "0")
        .option("timestampAsOf", "1").load(dd).schema
    }

    val id = freshDir("iopts")
    val s1 = Iceberg.write(spark, id, frame(1 to 10))
    Iceberg.stageRef(id, "audit", s1)
    Iceberg.write(spark, id, frame(11 to 20))
    assert(ids(spark.read.format("graft-iceberg")
      .option("snapshotId", s1.toString).load(id)) == (1L to 10L).toSet)
    assert(ids(spark.read.format("graft-iceberg")
      .option("tag", "audit").load(id)) == (1L to 10L).toSet)
    assert(ids(spark.read.format("graft-iceberg").load(id)) ==
      (1L to 20L).toSet)
  }

  test("write.format: SaveModes map to the native writers on both " +
      "formats; partitionBy rides the option") {
    val dd = freshDir("dwrite")
    frame(1 to 10).write.format("graft-deltalake")
      .option("partitionBy", "g").save(dd)
    frame(11 to 20).write.format("graft-deltalake")
      .mode("append").save(dd)
    assert(ids(DeltaLake.snapshot(spark, dd)) == (1L to 20L).toSet)
    // the option landed a real partition layout (values in the log)
    assert(DeltaLake.snapshotWhere(spark, dd, col("g") === "g1")
      .count() == 5L)
    frame(21 to 25).write.format("graft-deltalake")
      .mode("overwrite").option("partitionBy", "g").save(dd)
    assert(ids(DeltaLake.snapshot(spark, dd)) == (21L to 25L).toSet)
    intercept[Exception] {
      frame(1 to 3).write.format("graft-deltalake")
        .mode("errorifexists").save(dd)
    }
    // Ignore on an existing table: no-op, never an error
    frame(1 to 3).write.format("graft-deltalake").mode("ignore").save(dd)
    assert(ids(DeltaLake.snapshot(spark, dd)) == (21L to 25L).toSet)

    val id = freshDir("iwrite")
    frame(1 to 10).write.format("graft-iceberg").save(id)
    frame(11 to 20).write.format("graft-iceberg").mode("append").save(id)
    assert(ids(Iceberg.snapshot(spark, id)) == (1L to 20L).toSet)
    frame(21 to 25).write.format("graft-iceberg")
      .mode("overwrite").save(id)
    assert(ids(Iceberg.snapshot(spark, id)) == (21L to 25L).toSet)
  }

  test("SQL identifiers: graft_delta.`path` and graft_iceberg.`path` " +
      "read without a temp view — including a cross-format join") {
    val dd = freshDir("dsql")
    DeltaLake.write(spark, dd, frame(1 to 20))
    val id = freshDir("isql")
    Iceberg.write(spark, id, frame(11 to 30))
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_delta.`$dd`")
      .head().getLong(0) == 20L)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_iceberg.`$id` WHERE id > 25")
      .head().getLong(0) == 5L)
    // cross-format join through nothing but SQL
    val j = spark.sql(
      s"""SELECT count(*) AS n FROM graft_delta.`$dd` d
         |JOIN graft_iceberg.`$id` i ON d.id = i.id""".stripMargin)
    assert(j.head().getLong(0) == 10L)
  }

  test("native partitionBy(...) is honored (V1 encodes it as " +
      "__partition_columns); transform specs keep their commas; " +
      "readChangeFeed=false is a no-op selector") {
    // the standard writer API — silently dropping this layout was a
    // review finding
    val dd = freshDir("dnative")
    frame(1 to 20).write.format("graft-deltalake")
      .partitionBy("g").save(dd)
    assert(DeltaLake.snapshotWhere(spark, dd, col("g") === "g1")
      .count() == 5L)
    // conflicting declarations are refused
    intercept[Exception] {
      frame(21 to 22).write.format("graft-deltalake").mode("append")
        .partitionBy("g").option("partitionBy", "id").save(dd)
    }
    // an Iceberg transform spec carries commas of its own — the
    // option split must be paren-aware
    val id = freshDir("ibucket")
    frame(1 to 32).write.format("graft-iceberg")
      .option("partitionBy", "bucket(4, id)").save(id)
    assert(ids(Iceberg.snapshot(spark, id)) == (1L to 32L).toSet)
    // explicit false next to a time-travel selector is accepted
    assert(ids(spark.read.format("graft-deltalake")
      .option("readChangeFeed", "false").option("versionAsOf", "0")
      .load(dd)) == (1L to 20L).toSet)
  }

  test("EXTENSION-FREE native reads: a simple snapshot's provider " +
      "relation IS the log-backed HadoopFsRelation — columnar scan " +
      "with no splice in the loop; richer snapshots keep the wrapper") {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val dd = freshDir("dnat")
    DeltaLake.write(spark, dd, frame(1 to 40), partitionBy = Seq("g"))
    val dDf = spark.read.format("graft-deltalake").load(dd)
    // the ANALYZED plan (pre-splice) already holds the native file
    // relation — the extensions rule has nothing to do, so the same
    // plan holds in a session without them
    val analyzed = dDf.asInstanceOf[classic.Dataset[_]]
      .queryExecution.analyzed
    val rels = analyzed.collect { case lr: LogicalRelation => lr }
    assert(rels.nonEmpty &&
      rels.forall(!_.relation.isInstanceOf[GraftLakeRelation]),
      s"expected the bare native relation pre-splice:\n$analyzed")
    assert(rels.exists(_.relation.isInstanceOf[
      org.apache.spark.sql.execution.datasources.HadoopFsRelation]))
    // column ORDER matches the library API (partition column declared
    // last here, so data++partition order is the declared order)
    assert(dDf.columns.toSeq ==
      DeltaLake.snapshot(spark, dd).columns.toSeq)
    assert(ids(dDf.filter(col("g") === "g2")) ==
      (1L to 40L).filter(_ % 4 == 2).toSet)
    // iceberg, unpartitioned: same bare-native shape
    val id = freshDir("inat")
    Iceberg.write(spark, id, frame(1 to 30))
    val iDf = spark.read.format("graft-iceberg").load(id)
    val iRels = iDf.asInstanceOf[classic.Dataset[_]]
      .queryExecution.analyzed.collect { case lr: LogicalRelation => lr }
    assert(iRels.nonEmpty &&
      iRels.forall(!_.relation.isInstanceOf[GraftLakeRelation]))
    // a DV'd snapshot is NOT a bare scan (anti-filter in the plan):
    // the wrapper stays and content stays correct via the splice
    val dv = freshDir("dvnat")
    DeltaLake.write(spark, dv, frame(1 to 20))
    DeltaLake.delete(spark, dv, col("id") % 5 === 0)
    val dvDf = spark.read.format("graft-deltalake").load(dv)
    assert(ids(dvDf) == (1L to 20L).filterNot(_ % 5 == 0).toSet)
  }

  test("extension-less fallback: buildScan serves correct projected " +
      "rows (unhandledFilters keeps filtering with Spark)") {
    val dd = freshDir("dfall")
    DeltaLake.write(spark, dd, frame(1 to 15))
    val rel = GraftLakeRelation("graft-deltalake", dd, Map.empty,
      spark.sqlContext)
    assert(rel.schema.fieldNames.toSeq == Seq("id", "g"))
    val got = rel.buildScan(Array("id"), Array.empty)
      .asInstanceOf[org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow]]
      .map(_.getLong(0)).collect().toSet
    assert(got == (1L to 15L).toSet)
  }
}
