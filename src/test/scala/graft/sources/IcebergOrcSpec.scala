package graft.sources

import org.apache.spark.sql.classic
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** ORC data files in Iceberg tables — the migrated-Hive-estate shape
  * (r11 review's missing item #4): the manifest fold accepts ORC data
  * entries, the scan rides a separate OrcFileFormat arm (manifest
  * stats/partition values prune identically), mixed parquet+ORC
  * tables union, and everything ORC cannot serve safely — row-level
  * deletes, the row-position surface, name mapping, schema evolution,
  * DML rewrites — refuses loudly instead of silently misreading.
  */
class IcebergOrcSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_orc_$name").toFile
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

  test("an ORC-backed Iceberg table reads: content, partition values " +
      "from the manifests, and stats skipping all work") {
    val dir = freshDir("read")
    Iceberg.stageOrcAppend(spark, dir, frame(1 to 20), Seq("p"))
    Iceberg.stageOrcAppend(spark, dir, frame(21 to 40), Seq("p"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "v", "p"))
    assert(ids(snap) == (1L to 40L).toSet)
    // partition values come from the MANIFESTS (identity partitioning
    // strips the column from the data files)
    assert(snap.filter(col("p") === "g1").count() == 20L)
    // the files on disk are really ORC
    val dataFiles = Option(new java.io.File(dir, "data").listFiles())
      .toSeq.flatten.flatMap(d => Option(d.listFiles()).toSeq.flatten)
    assert(dataFiles.exists(_.getName.endsWith(".orc")))
    assert(!dataFiles.exists(_.getName.endsWith(".parquet")))
    // manifest bounds prune: each append wrote 2 partition files with
    // disjoint id ranges; a narrow id predicate plans fewer files
    val all = plannedFiles(Iceberg.snapshot(spark, dir))
    val narrow = plannedFiles(
      Iceberg.snapshotWhere(spark, dir, col("id") <= 5))
    assert(all == 4, s"expected 4 ORC files planned, got $all")
    assert(narrow < all,
      s"stats skipping did not prune ORC files: $narrow of $all")
  }

  test("a MIXED parquet+ORC table unions both arms — the migration-in-" +
      "progress shape") {
    val dir = freshDir("mixed")
    Iceberg.stageAppend(spark, dir, frame(1 to 10), Seq.empty)
    Iceberg.stageOrcAppend(spark, dir, frame(11 to 20))
    val snap = Iceberg.snapshot(spark, dir)
    assert(ids(snap) == (1L to 20L).toSet)
    assert(snap.filter(col("id") === 15).select("v").head()
      .getString(0) == "v15")
    // time travel still resolves the parquet-only first snapshot
    assert(ids(Iceberg.snapshot(spark, dir, Some(1L))) ==
      (1L to 10L).toSet)
  }

  test("everything ORC cannot serve safely refuses loudly: row-level " +
      "deletes, DML rewrites, the row-position surface, and schema " +
      "evolution") {
    val dir = freshDir("guards")
    Iceberg.stageOrcAppend(spark, dir, frame(1 to 10))
    val e1 = intercept[IllegalArgumentException] {
      Iceberg.delete(spark, dir, col("id") === 1L)
    }
    assert(e1.getMessage.contains("convertToParquet"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Iceberg.stageMorDelete(spark, dir, col("id") === 1L)
    }
    assert(e2.getMessage.contains("convertToParquet") ||
      e2.getMessage.contains("ORC"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Iceberg.snapshotWithMeta(spark, dir).collect()
    }
    assert(e3.getMessage.contains("row-position"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Iceberg.rewriteDataFiles(spark, dir)
    }
    assert(e4.getMessage.contains("convertToParquet"), e4.getMessage)
    // a rename on an ORC estate: the by-name resolution cannot serve
    // the evolved schema — refused at resolution, not silently nulled
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    val e5 = intercept[IllegalArgumentException] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e5.getMessage.contains("schema history"), e5.getMessage)
  }

  test("per-file manifest stats are keyed by PATH, not basename — " +
      "same-named part files in different partition dirs keep their " +
      "own bounds") {
    // one write task → one basename repeated across partition dirs;
    // ids correlate with the partition, so merged (basename-keyed)
    // bounds would span [1,20] on BOTH files and prune nothing
    val dir = freshDir("stats")
    val df = ((1 to 10).map(i => (i.toLong, s"v$i", "g0")) ++
      (11 to 20).map(i => (i.toLong, s"v$i", "g1")))
      .toDF("id", "v", "p").coalesce(1)
    Iceberg.stageOrcAppend(spark, dir, df, Seq("p"))
    assert(plannedFiles(Iceberg.snapshot(spark, dir)) == 2)
    assert(plannedFiles(
      Iceberg.snapshotWhere(spark, dir, col("id") <= 5)) == 1,
      "merged per-basename stats: the g1 file (ids 11-20) was planned " +
        "for an id<=5 predicate")
  }

  test("legacy metadata WITHOUT a schemas list: an in-place schema " +
      "rewrite is caught by the ORC footer check, never read as null") {
    val dir = freshDir("legacy")
    Iceberg.stageOrcAppend(spark, dir, frame(1 to 10))
    // simulate a legacy v1 writer renaming a column by REWRITING the
    // single schema in place (no history entry for the resolve()-side
    // guard to see)
    val mdDir = new java.io.File(dir, "metadata")
    val mdFile = Option(mdDir.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = M.readTree(java.nio.file.Files.readString(mdFile.toPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    md.get("schemas").elements().next().get("fields").elements()
      .forEachRemaining { f =>
        val o = f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        if (o.get("name").asText == "v") { o.put("name", "label"); () }
      }
    java.nio.file.Files.writeString(mdFile.toPath,
      M.writeValueAsString(md))
    val e = intercept[IllegalArgumentException] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e.getMessage.contains("lacks column"), e.getMessage)
  }

  test("the footer-probe cost is BOUNDED: validations persist in the " +
      "metadata marker, so a cold resolution re-probes only NEW files " +
      "— and a schema change still forces the full re-check") {
    val dir = freshDir("marker")
    Iceberg.stageOrcAppend(spark, dir, frame(1 to 10).repartition(4))
    val probes0 = Iceberg.orcFooterProbes.get()
    Iceberg.snapshot(spark, dir).collect()
    val firstProbes = Iceberg.orcFooterProbes.get() - probes0
    assert(firstProbes >= 4, s"expected >=4 footer probes, $firstProbes")
    assert(new java.io.File(dir, "metadata/graft-orc-validated.json")
      .exists(), "first resolution did not persist the marker")
    // a COLD resolution (fresh JVM simulated by clearing the memo)
    // trusts the marker: zero footer reads
    Iceberg.clearOrcFooterCacheForTest()
    val probes1 = Iceberg.orcFooterProbes.get()
    Iceberg.snapshot(spark, dir).collect()
    assert(Iceberg.orcFooterProbes.get() == probes1,
      "marker-validated files were re-probed on cold resolution")
    // appending pays footer reads for the NEW files only
    Iceberg.stageOrcAppend(spark, dir, frame(11 to 20).coalesce(1))
    val probes2 = Iceberg.orcFooterProbes.get()
    Iceberg.snapshot(spark, dir).collect()
    val newProbes = Iceberg.orcFooterProbes.get() - probes2
    assert(newProbes >= 1 && newProbes <= 2,
      s"append re-probed $newProbes files — expected only the new one")
    // the legacy in-place rewrite is STILL caught: the fingerprint
    // mismatch empties the validated set and the full re-probe refuses
    val mdDir = new java.io.File(dir, "metadata")
    val mdFile = Option(mdDir.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = M.readTree(java.nio.file.Files.readString(mdFile.toPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    md.get("schemas").elements().next().get("fields").elements()
      .forEachRemaining { f =>
        val o = f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        if (o.get("name").asText == "v") { o.put("name", "label"); () }
      }
    java.nio.file.Files.writeString(mdFile.toPath,
      M.writeValueAsString(md))
    Iceberg.clearOrcFooterCacheForTest()
    val e = intercept[IllegalArgumentException] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e.getMessage.contains("lacks column"), e.getMessage)
  }

  test("ORC files WITH iceberg.id attributes resolve by FIELD ID: " +
      "renames read correctly with no name-check refusal; id-less " +
      "files joining an evolved table still refuse") {
    val dir = freshDir("ids")
    Iceberg.stageOrcIdAppend(spark, dir, frame(1 to 10))
    // a rename is metadata-only; the file's physical column stays "v"
    // and resolves by id under the new name — no probe refusal, no
    // nulls (the by-name ORC arm would refuse here)
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "label", "p"))
    assert(snap.filter(col("id") === 3).select("label").head()
      .getString(0) == "v3",
      "pre-rename ORC file did not resolve by field id")
    assert(ids(snap) == (1L to 10L).toSet)
    // post-rename appends carry the NEW physical name with the SAME
    // ids — one logical scan over both shapes
    Iceberg.stageOrcIdAppend(spark, dir,
      (11 to 15).map(i => (i.toLong, s"v$i", s"g${i % 2}"))
        .toDF("id", "label", "p").coalesce(1))
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 15L).toSet)
    assert(Iceberg.snapshot(spark, dir)
      .filter(col("label") === "v12").count() == 1L)
    // manifest stats still prune across the id arms
    assert(plannedFiles(Iceberg.snapshotWhere(spark, dir,
      col("id") <= 5)) <= 1,
      "manifest stats did not prune the id-resolved ORC arm")
    // an ID-LESS ORC file landing on the evolved table refuses loudly
    // (by-name resolution cannot survive the schema history)
    Iceberg.stageOrcAppend(spark, dir,
      (16 to 18).map(i => (i.toLong, s"v$i", s"g${i % 2}"))
        .toDF("id", "label", "p").coalesce(1))
    val e = intercept[IllegalArgumentException] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e.getMessage.contains("id-less"), e.getMessage)
  }

  test("ORC id-arm COLLISION guard (r13 advice): a renamed column's " +
      "old name reused by a later-added column refuses with the " +
      "convertToParquet hint instead of mis-binding") {
    val dir = freshDir("collide")
    Iceberg.stageOrcIdAppend(spark, dir, frame(1 to 10))
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    // legal Iceberg evolution: a NEW column re-using the old name —
    // ids disambiguate it on parquet/avro, but ORC resolves by name
    // and the pre-rename file's physical "v" now collides
    Iceberg.addColumns(spark, dir,
      Seq(org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val e = intercept[IllegalArgumentException] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e.getMessage.contains("convertToParquet"), e.getMessage)
  }

  test("the registered reader serves ORC tables too") {
    val dir = freshDir("rapi")
    Iceberg.stageOrcAppend(spark, dir, frame(1 to 12))
    assert(ids(spark.read.format("graft-iceberg").load(dir)) ==
      (1L to 12L).toSet)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_iceberg.`$dir`")
      .head().getLong(0) == 12L)
  }
}
