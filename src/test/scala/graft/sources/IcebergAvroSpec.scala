package graft.sources

import org.apache.spark.sql.classic
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** AVRO data files in Iceberg tables — the third migrated-estate data
  * format (r12 verdict item #6): the manifest fold accepts AVRO data
  * entries, the scan rides [[org.apache.spark.sql.graft
  * .GraftAvroFileFormat]] (a minimal avro-core FileFormat — no
  * spark-avro module ships here), manifest stats/partition values
  * prune identically, and — unlike the by-name ORC arm — columns
  * resolve by FIELD ID, so renames work without footer probes.
  * Everything Avro cannot serve (row positions → MoR deletes, DML
  * rewrites, signed sources; id-less files) refuses loudly.
  */
class IcebergAvroSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_avro_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i", s"g${i % 2}")).toDF("id", "v", "p")
      .coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.asInstanceOf[classic.Dataset[_]].queryExecution
      .executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
  }

  test("an AVRO-backed Iceberg table reads: content, partition values " +
      "from the manifests, and stats skipping all work") {
    val dir = freshDir("read")
    Iceberg.stageAvroAppend(spark, dir, frame(1 to 20), Seq("p"))
    Iceberg.stageAvroAppend(spark, dir, frame(21 to 40), Seq("p"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "v", "p"))
    assert(ids(snap) == (1L to 40L).toSet)
    // partition values come from the MANIFESTS (identity partitioning
    // strips the column from the data files)
    assert(snap.filter(col("p") === "g1").count() == 20L)
    val dataFiles = Option(new java.io.File(dir, "data").listFiles())
      .toSeq.flatten.flatMap(d => Option(d.listFiles()).toSeq.flatten)
    assert(dataFiles.exists(_.getName.endsWith(".avro")))
    assert(!dataFiles.exists(_.getName.endsWith(".parquet")))
    // manifest bounds prune: 4 files (2 appends x 2 partitions), an
    // id-range predicate plans only the intersecting ones
    assert(plannedFiles(Iceberg.snapshotWhere(spark, dir,
      col("id") <= 5)) <= 2,
      "manifest stats did not prune the avro arm")
    // values survive the row conversion exactly
    assert(snap.filter(col("id") === 7).select("v").head()
      .getString(0) == "v7")
  }

  test("a MIXED parquet+AVRO table unions both arms; predicates and " +
      "aggregates agree with an all-parquet twin") {
    val dir = freshDir("mixed")
    Iceberg.stageAppend(spark, dir, frame(1 to 15), Seq.empty)
    Iceberg.stageAvroAppend(spark, dir, frame(16 to 30))
    val snap = Iceberg.snapshot(spark, dir)
    assert(ids(snap) == (1L to 30L).toSet)
    assert(snap.filter(col("id") % 3 === 0).count() == 10L)
    val twin = freshDir("twin")
    Iceberg.stageAppend(spark, twin, frame(1 to 30), Seq.empty)
    assert(snap.groupBy("p").count().collect().map(r =>
      (r.getString(0), r.getLong(1))).toSet ==
      Iceberg.snapshot(spark, twin).groupBy("p").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("RENAMES read correctly from pre-rename avro files — field-id " +
      "resolution, no footer probe, no schema-history refusal") {
    val dir = freshDir("rename")
    Iceberg.stageAvroAppend(spark, dir, frame(1 to 10))
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "label", "p"))
    assert(snap.filter(col("id") === 3).select("label").head()
      .getString(0) == "v3",
      "pre-rename avro file did not resolve by field id")
    // post-rename appends mix in (their files carry the NEW name but
    // the SAME ids)
    Iceberg.stageAvroAppend(spark, dir,
      (11 to 15).map(i => (i.toLong, s"v$i", s"g${i % 2}"))
        .toDF("id", "label", "p").coalesce(1))
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 15L).toSet)
    assert(Iceberg.snapshot(spark, dir).filter(col("label") === "v12")
      .count() == 1L)
  }

  test("everything AVRO cannot serve refuses loudly: row-level " +
      "deletes, DML rewrites, the row-position surface, and id-less " +
      "files") {
    val dir = freshDir("guards")
    Iceberg.stageAvroAppend(spark, dir, frame(1 to 10))
    val e1 = intercept[IllegalArgumentException] {
      Iceberg.stageMorDelete(spark, dir, col("id") === 1L)
    }
    assert(e1.getMessage.contains("row") ||
      e1.getMessage.contains("parquet") ||
      e1.getMessage.contains("AVRO"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Iceberg.delete(spark, dir, col("id") === 1L)
    }
    assert(e2.getMessage.contains("parquet"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Iceberg.snapshotWithMeta(spark, dir).collect()
    }
    assert(e3.getMessage.contains("row-position"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Iceberg.rewriteDataFiles(spark, dir)
    }
    assert(e4.getMessage.contains("parquet") ||
      e4.getMessage.contains("ORC") || e4.getMessage.contains("AVRO"),
      e4.getMessage)
    // an ID-LESS avro file (out-of-spec: Iceberg requires field ids in
    // avro data schemas) refuses instead of resolving by name
    val dataDir = new java.io.File(dir, "data")
    val avroFile = Option(dataDir.listFiles()).toSeq.flatten
      .find(_.getName.endsWith(".avro")).get
    val parser = new org.apache.avro.Schema.Parser()
    val idless = parser.parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},{"name":"v","type":"string"},
        |{"name":"p","type":"string"}]}""".stripMargin)
    val w = new org.apache.avro.file.DataFileWriter[
      org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](idless))
    w.create(idless, avroFile) // overwrite in place, same path
    val rec = new org.apache.avro.generic.GenericData.Record(idless)
    rec.put("id", 1L); rec.put("v", "x"); rec.put("p", "g1")
    w.append(rec)
    w.close()
    val e5 = intercept[Exception] {
      Iceberg.snapshot(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e5).exists(_.contains("field-id")),
      s"expected the id-less refusal, got: ${messages(e5)}")
  }

  test("the registered reader and SQL identifier serve AVRO tables") {
    val dir = freshDir("rapi")
    Iceberg.stageAvroAppend(spark, dir, frame(1 to 12))
    assert(ids(spark.read.format("graft-iceberg").load(dir)) ==
      (1L to 12L).toSet)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_iceberg.`$dir`")
      .head().getLong(0) == 12L)
  }
}
