package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Column renames through FIELD-ID resolution (r11): the read schema
  * carries each Iceberg field id as `parquet.field.id` metadata and the
  * scan matches parquet columns by id, so a renamed column reads
  * correctly from PRE-rename files (whose physical column names still
  * carry the old name). Current reads resolve the CURRENT schema (a
  * rename is metadata-only and visible immediately); time travel
  * resolves each snapshot's own schema; the signed seam still refuses a
  * window crossing the rename (schema drift = rebase).
  */
class IcebergRenameSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_irn_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("rename reads pre-rename files by field id; metadata-only") {
    val dir = freshDir("basic")
    val a = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)
    val filesBefore = Iceberg.snapshot(spark, dir).inputFiles.toSet
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    val snap = Iceberg.snapshot(spark, dir)
    // the rename is visible immediately (current schema), yet no data
    // file was touched — the old files' physical column is still "v",
    // resolved by field id
    assert(snap.columns.toSeq == Seq("id", "label"))
    assert(snap.inputFiles.toSet == filesBefore,
      "rename must touch no data file")
    assert(snap.filter(col("id") === 7).select("label").head()
      .getString(0) == "v7")
    assert(ids(snap) == (1L to 30L).toSet)
  }

  test("post-rename appends mix old-name and new-name files in one scan") {
    val dir = freshDir("mixed")
    val a = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    // the new file's physical column name is "label"; the old one's is
    // "v" — one scan resolves both by id
    val b = (21L to 30L).map(i => (i, s"v$i")).toDF("id", "label")
      .coalesce(1)
    Iceberg.stageAppend(spark, dir, b, Seq.empty)
    val snap = Iceberg.snapshot(spark, dir)
    assert(ids(snap) == (1L to 30L).toSet)
    assert(snap.select("label").collect().map(_.getString(0)).toSet ==
      (1L to 30L).map(i => s"v$i").toSet)
    // pushed predicates on the renamed column reach both file eras
    assert(snap.filter(col("label") === "v5").count() == 1)
    assert(snap.filter(col("label") === "v25").count() == 1)
  }

  test("time travel resolves each snapshot's own schema across the rename") {
    val dir = freshDir("travel")
    val a = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, a, Seq.empty)
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    val b = (11L to 15L).map(i => (i, s"v$i")).toDF("id", "label")
      .coalesce(1)
    val s3 = Iceberg.stageAppend(spark, dir, b, Seq.empty)
    // the pre-rename snapshot reads under its era's name...
    val old = Iceberg.snapshot(spark, dir, Some(s1))
    assert(old.columns.toSeq == Seq("id", "v"))
    assert(old.filter(col("id") === 3).select("v").head()
      .getString(0) == "v3")
    // ...the post-rename snapshot under the new one
    val now = Iceberg.snapshot(spark, dir, Some(s3))
    assert(now.columns.toSeq == Seq("id", "label"))
    assert(ids(now) == (1L to 15L).toSet)
  }

  test("the signed seam refuses a window crossing the rename") {
    val dir = freshDir("seam")
    val a = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    val s1 = Iceberg.stageAppend(spark, dir, a, Seq.empty)
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    val b = (11L to 15L).map(i => (i, s"v$i")).toDF("id", "label")
      .coalesce(1)
    val s3 = Iceberg.stageAppend(spark, dir, b, Seq.empty)
    // the frames would carry a schema the stored view never saw
    val e = intercept[IllegalArgumentException] {
      Iceberg.changes(spark, dir, s1, Some(s3))
    }
    assert(e.getMessage.contains("rebase"))
    assert(!Iceberg.isAppendOnly(spark, dir, s1, s3))
    // a window entirely AFTER the rename is a normal append window
    val c = (16L to 20L).map(i => (i, s"v$i")).toDF("id", "label")
      .coalesce(1)
    val s4 = Iceberg.stageAppend(spark, dir, c, Seq.empty)
    assert(Iceberg.isAppendOnly(spark, dir, s3, s4))
    assert(ids(Iceberg.appended(spark, dir, s3)) == (16L to 20L).toSet)
  }

  test("manifest-bounds skipping keys by id — works across the rename") {
    val dir = freshDir("skip")
    val a = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    val b = (51L to 80L).map(i => (i, s"v$i")).toDF("id", "label")
      .coalesce(1)
    Iceberg.stageAppend(spark, dir, b, Seq.empty)
    // bounds were written under field ids; the decode maps them to the
    // CURRENT names, so a predicate on the renamed column still skips
    // and still returns exactly the matching rows from both eras
    val hit = Iceberg.snapshotWhere(spark, dir, col("id") > 50L)
    assert(ids(hit) == (51L to 80L).toSet)
    assert(hit.select("label").collect().map(_.getString(0)).toSet ==
      (51L to 80L).map(i => s"v$i").toSet)
  }

  test("COW rewrite after a rename reads pre-rename files by field id") {
    val dir = freshDir("cow")
    val a = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Iceberg.stageAppend(spark, dir, a, Seq.empty)
    Iceberg.stageRenameColumn(spark, dir, Map("v" -> "label"))
    // the rewrite reads the OLD file under the NEW schema (id-matched
    // — name matching would write back an all-null rewrite) and
    // applies the update
    Iceberg.stageUpdate(spark, dir, col("id") === 1L,
      Map("label" -> org.apache.spark.sql.functions.lit("updated")))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.filter(col("id") === 1).select("label").head()
      .getString(0) == "updated")
    assert(snap.filter(col("label").isNull).count() == 0,
      "a name-resolved rewrite would have nulled the renamed column")
    assert(snap.filter(col("id") === 7).select("label").head()
      .getString(0) == "v7")
  }

  test("renaming a partition-spec source column is rejected loudly") {
    val dir = freshDir("part")
    val df = (1L to 20L).map(i => (i, s"p${i % 2}")).toDF("id", "p")
      .coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq("p"))
    val e = intercept[IllegalArgumentException] {
      Iceberg.stageRenameColumn(spark, dir, Map("p" -> "bucket"))
    }
    assert(e.getMessage.contains("partition-spec source"))
  }
}
