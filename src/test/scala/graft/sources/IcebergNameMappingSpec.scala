package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Name mapping (`schema.name-mapping.default`): ID-LESS data files —
  * the migrated-Hive-table shape — resolve their columns through the
  * mapping instead of failing at the field-id gate; mixed id/id-less
  * eras union in one read; per-file bounds skipping survives on the
  * mapped scan; a field absent from a file surfaces null (the spec's
  * projection rule); and WITHOUT a mapping an id-less file stays
  * loud.
  */
class IcebergNameMappingSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_nm_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("id-less files with junk disk names read through the mapping") {
    val dir = freshDir("basic")
    val df = (1L to 40L).map(i => (i, s"v$i", i * 10))
      .toDF("id", "v", "amount").coalesce(1)
    Iceberg.stageIdlessAppend(spark, dir, df,
      diskNames = Map("id" -> "_c0", "v" -> "_c1", "amount" -> "_c2"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "amount"))
    assert(ids(snap) == (1L to 40L).toSet)
    // values bind to the RIGHT columns (a positional mis-bind would
    // swap id and amount)
    val sum = snap.agg(org.apache.spark.sql.functions.sum("amount"))
      .head().getLong(0)
    assert(sum == (1L to 40L).map(_ * 10).sum)
  }

  test("mixed eras: an id-stamped file and an id-less file union in " +
      "one read; both resolve correctly") {
    val dir = freshDir("mixed")
    val a = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val b = (21L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    // era 1: migrated id-less files under historic names
    Iceberg.stageIdlessAppend(spark, dir, a,
      diskNames = Map("id" -> "legacy_id", "v" -> "legacy_v"))
    // era 2: a modern id-stamped append
    Iceberg.stageAppend(spark, dir, b, Seq.empty)
    val snap = Iceberg.snapshot(spark, dir)
    assert(ids(snap) == (1L to 40L).toSet)
    assert(snap.filter(col("v") === "v3").count() == 1)
    assert(snap.filter(col("v") === "v33").count() == 1)
  }

  test("bounds skipping survives on the mapped scan: a range " +
      "predicate plans only the matching id-less file") {
    val dir = freshDir("skip")
    val lo = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val hi = (100L to 120L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1)
    Iceberg.stageIdlessAppend(spark, dir, lo,
      diskNames = Map("id" -> "c_id", "v" -> "c_v"))
    Iceberg.stageIdlessAppend(spark, dir, hi,
      diskNames = Map("id" -> "c_id", "v" -> "c_v"))
    val q = Iceberg.snapshot(spark, dir).filter(col("id") >= 100L)
    val qe = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution
    assert(q.collect().map(_.getLong(0)).toSet == (100L to 120L).toSet)
    // runtime index pruning: only the high file was OPENED (the
    // numFiles metric after run — inputFiles shows the pre-pruning
    // index)
    val numFiles = qe.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    assert(numFiles == 1,
      s"manifest bounds must prune the low file, opened $numFiles")
  }

  test("a mapped column ABSENT from a file surfaces null (the spec's " +
      "projection rule), never a mis-bind or a crash") {
    // a 3-field table (schema + mapping) whose one id-less data file
    // PHYSICALLY holds only two columns: rewrite the staged file
    // without `extra` — exactly what a migrated pre-evolution Hive
    // file looks like
    val dir = freshDir("absent")
    val df = (1L to 10L).map(i => (i, s"v$i", i * 2))
      .toDF("id", "v", "extra").coalesce(1)
    Iceberg.stageIdlessAppend(spark, dir, df,
      diskNames = Map("id" -> "old_id", "v" -> "old_v",
        "extra" -> "old_extra"))
    val dataFile = new java.io.File(Iceberg.snapshot(spark, dir)
      .inputFiles.head.stripPrefix("file:"))
    val twoCols = spark.read.parquet(dataFile.getAbsolutePath)
      .select("old_id", "old_v")
    val tmp = new java.io.File(dataFile.getParentFile, "_two")
    twoCols.coalesce(1).write.mode("overwrite")
      .parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.delete(dataFile.toPath)
    java.nio.file.Files.move(part.toPath, dataFile.toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    val snap = Iceberg.snapshot(spark, dir)
    assert(ids(snap) == (1L to 10L).toSet)
    assert(snap.filter(col("extra").isNull).count() == 10,
      "a column with no physical match must read null")
    assert(snap.filter(col("v") === "v3").count() == 1)
  }

  test("without a mapping an id-less file still fails LOUDLY") {
    val dir = freshDir("loud")
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    // strip the table's mapping AND the file's ids by rewriting the
    // data file without metadata
    val dataFile = new java.io.File(Iceberg.snapshot(spark, dir)
      .inputFiles.head.stripPrefix("file:"))
    val plain = spark.read.parquet(dataFile.getAbsolutePath)
      .select(df.schema.fieldNames.toIndexedSeq.map(n =>
        col(n).as(n, org.apache.spark.sql.types.Metadata.empty)): _*)
    val tmp = new java.io.File(dataFile.getParentFile, "_plain")
    plain.coalesce(1).write.mode("overwrite")
      .parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.delete(dataFile.toPath)
    java.nio.file.Files.move(part.toPath, dataFile.toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    val e = intercept[Exception] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e.getMessage != null)
  }
}
