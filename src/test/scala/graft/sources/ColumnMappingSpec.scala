package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Delta COLUMN MAPPING (mode `name`): data files carry PHYSICAL column
  * names while the snapshot surfaces LOGICAL ones; a rename is a
  * metaData-only commit touching no data file; partition pruning and
  * stats skipping keep working in the physical name space; time travel
  * resolves each version's own logical names; the mapping survives a
  * checkpoint; the signed seam fails fast across a rename.
  */
class ColumnMappingSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_cm_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val mapping = Map("id" -> "c_1", "v" -> "c_2", "p" -> "c_3")

  private def staged(): String = {
    val dir = freshDir("base")
    val df = (1L to 40L).map(i => (i, s"v$i", s"g${i % 2}"))
      .toDF("id", "v", "p").coalesce(1)
    DeltaLake.stageMappedCommit(spark, dir,
      df.filter(col("id") <= 30), Seq("p"), 0L, mapping)
    DeltaLake.stageMappedCommit(spark, dir,
      df.filter(col("id") > 30), Seq("p"), 1L, mapping)
    dir
  }

  test("mapped snapshot: logical names out, physical names on disk") {
    val dir = staged()
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "v", "p"))
    assert(snap.count() == 40)
    assert(snap.filter(col("id") === 7).select("v").head().getString(0)
      == "v7")
    // the parquet files themselves carry ONLY physical names
    val dataFile = snap.inputFiles.head
    val raw = spark.read.parquet(dataFile)
    assert(raw.columns.toSet.subsetOf(Set("c_1", "c_2")),
      s"physical file columns were ${raw.columns.mkString(",")}")
    // partition dirs use the physical name too
    assert(dataFile.contains("c_3="))
  }

  test("pruning works in the physical name space") {
    val dir = staged()
    // partition prune on the LOGICAL partition column
    val part = DeltaLake.snapshotWhere(spark, dir, col("p") === "g0")
    assert(part.inputFiles.forall(_.contains("c_3=g0")))
    assert(part.count() == 20)
    // stats skip on the logical data column (commit files split at 30)
    val hi = DeltaLake.snapshotWhere(spark, dir, col("id") > 30L)
    assert(hi.inputFiles.length < DeltaLake.snapshot(spark, dir)
      .inputFiles.length)
    assert(hi.count() == 10)
  }

  test("rename is metaData-only; time travel resolves per-version names") {
    val dir = staged()
    val filesBefore = DeltaLake.snapshot(spark, dir).inputFiles.toSet
    DeltaLake.stageRenameCommit(spark, dir, Map("v" -> "label"), 2L)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "label", "p"))
    assert(snap.inputFiles.toSet == filesBefore, "rename must touch no file")
    assert(snap.filter(col("id") === 7).select("label").head()
      .getString(0) == "v7")
    // the pre-rename version still reads under the OLD logical name
    assert(DeltaLake.snapshot(spark, dir, Some(1L)).columns.toSeq ==
      Seq("id", "v", "p"))
    // the signed seam refuses a window crossing the rename
    val e = intercept[IllegalStateException] {
      DeltaLake.changes(spark, dir, 1L)
    }
    assert(e.getMessage.contains("schema"))
    assert(!DeltaLake.isAppendOnly(dir, 1L, 2L))
  }

  test("mapping survives a checkpoint resume") {
    val dir = staged()
    DeltaLake.stageCheckpoint(spark, dir, 1L)
    Seq(0L, 1L).foreach { v =>
      assert(new java.io.File(s"$dir/_delta_log", f"$v%020d.json").delete())
    }
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "v", "p"))
    assert(snap.count() == 40)
  }

  test("legacy reader-v2 gate admits mapping; unknown features stay loud") {
    val dir = staged() // staged with minReaderVersion 2 / mode=name
    assert(DeltaLake.snapshot(spark, dir).count() == 40)
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir/_delta_log", f"${2L}%020d.json").toPath,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping","someFutureFeature"]}}""" + "\n")
    val e = intercept[IllegalArgumentException] {
      DeltaLake.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("someFutureFeature"))
  }

  test("mode=id resolves parquet columns by FIELD ID, not name") {
    // the advice's exact scenario: a (non-Spark) id-mode writer whose
    // on-disk parquet column names differ from the metadata's
    // physicalName. Name-based resolution would read the columns
    // all-null silently; field-id matching reads them correctly.
    val dir = freshDir("idmode")
    val df = (1L to 40L).map(i => (i, s"v$i", s"g${i % 2}"))
      .toDF("id", "v", "p").coalesce(1)
    DeltaLake.stageMappedCommit(spark, dir, df, Seq("p"), 0L,
      mapping, mode = "id",
      diskNames = Map("id" -> "zz_9", "v" -> "weird-name"))
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "v", "p"))
    assert(snap.count() == 40)
    assert(snap.filter(col("id") === 7).select("v").head().getString(0)
      == "v7")
    // no nulls anywhere: every value resolved through the ids
    assert(snap.filter(col("id").isNull || col("v").isNull).count() == 0)
    // partition values stay keyed by PHYSICAL name (protocol), and
    // pruning on the partition column still works
    assert(snap.filter(col("p") === "g1").count() == 20)
  }

  test("id-mode reads scope field-id matching to the RELATION — the " +
      "session conf is never mutated (r11 advice)") {
    val key = "spark.sql.parquet.fieldId.read.enabled"
    val before = spark.conf.getOption(key)
    val dir = freshDir("idscope")
    val df = (1L to 10L).map(i => (i, s"v$i", s"g${i % 2}"))
      .toDF("id", "v", "p").coalesce(1)
    DeltaLake.stageMappedCommit(spark, dir, df, Seq("p"), 0L,
      mapping, mode = "id",
      diskNames = Map("id" -> "zz_9", "v" -> "weird-name"))
    // the read itself must still resolve by id (disk names differ)...
    assert(DeltaLake.snapshot(spark, dir)
      .filter(col("id") === 7).select("v").head().getString(0) == "v7")
    // ...but ONLY through the relation's own options: the session
    // conf is exactly what it was (a global set would change the
    // semantics of every unrelated parquet read carrying field-id
    // schema metadata)
    assert(spark.conf.getOption(key) == before,
      s"session conf leaked: $key = ${spark.conf.getOption(key)}")
  }

  test("mode=id with matching physical names — the delta-spark shape") {
    val dir = freshDir("idmatch")
    val df = (1L to 20L).map(i => (i, s"v$i", s"g${i % 2}"))
      .toDF("id", "v", "p").coalesce(1)
    DeltaLake.stageMappedCommit(spark, dir,
      df.filter(col("id") <= 10), Seq("p"), 0L, mapping, mode = "id")
    DeltaLake.stageMappedCommit(spark, dir,
      df.filter(col("id") > 10), Seq("p"), 1L, mapping, mode = "id")
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.count() == 20)
    assert(snap.filter(col("id") === 15).select("v").head().getString(0)
      == "v15")
  }

  test("nested mapped fields fail fast — struct, array, and map shapes") {
    // a mapped field nested inside a struct/array/map would read
    // all-null by logical name (the files carry physical names) —
    // every nested shape must be rejected at the fold, not mis-read
    import org.apache.spark.sql.types._
    val dir = freshDir("nested")
    val df = Seq((1L, "x")).toDF("id", "v").coalesce(1)
    DeltaLake.stageMappedCommit(spark, dir, df, Seq.empty, 0L,
      Map("id" -> "c_1", "v" -> "c_2"))
    val inner = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", "c_9")
      .putLong("delta.columnMapping.id", 9L).build()
    def metaWith(dt: DataType): String = {
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = true,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", "c_1")
            .putLong("delta.columnMapping.id", 1L).build()),
        StructField("nested", dt)))
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val meta = m.createObjectNode()
      meta.put("id", "t")
      val fmt = meta.putObject("format")
      fmt.put("provider", "parquet"); fmt.putObject("options")
      meta.put("schemaString", schema.json)
      meta.putArray("partitionColumns")
      val conf = meta.putObject("configuration")
      conf.put("delta.columnMapping.mode", "name")
      s"""{"metaData":${m.writeValueAsString(meta)}}"""
    }
    val nestedStruct = StructType(Seq(
      StructField("k", StringType, nullable = true, inner)))
    Seq[DataType](
      nestedStruct,
      ArrayType(nestedStruct),
      MapType(StringType, nestedStruct)
    ).zipWithIndex.foreach { case (dt, i) =>
      java.nio.file.Files.writeString(
        new java.io.File(s"$dir/_delta_log",
          f"${i + 1L}%020d.json").toPath, metaWith(dt) + "\n")
      val e = intercept[IllegalArgumentException] {
        DeltaLake.snapshot(spark, dir)
      }
      assert(e.getMessage.contains("NESTED"), s"shape $i: ${e.getMessage}")
    }
  }
}
