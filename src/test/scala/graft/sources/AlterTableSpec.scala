package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Column-level schema evolution ([[DeltaLake.addColumns]] /
  * [[DeltaLake.renameColumn]] / [[Iceberg.addColumns]] /
  * [[Iceberg.renameColumns]] and SQL ALTER TABLE through the
  * catalog): pre-evolution files read the new columns as null, renames
  * keep pre-rename files readable (mapping metadata / field ids),
  * time travel resolves per-snapshot schemas, the catalog pin
  * advances, and the refusal envelope holds (NOT NULL adds, unmapped
  * Delta renames/drops, partition-source renames, type changes,
  * equality-delete-keyed drops).
  */
class AlterTableSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_alter_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  test("delta addColumns: metadata-only commit, old files surface " +
      "null, appends carry the new column") {
    val dir = freshDir("dadd")
    DeltaLake.write(spark, dir, frame(1 to 10))
    val v = DeltaLake.addColumns(spark, dir,
      Seq(StructField("score", DoubleType)))
    assert(v == 1L)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(snap.filter(col("score").isNotNull).count() == 0)
    assert(snap.count() == 10)
    // a new append CAN carry it; the old-schema append null-fills
    DeltaLake.write(spark, dir,
      Seq((11L, "v11", 0.5)).toDF("id", "v", "score"))
    DeltaLake.write(spark, dir, Seq((12L, "v12")).toDF("id", "v"))
    val after = DeltaLake.snapshot(spark, dir)
    assert(after.count() == 12)
    assert(after.filter(col("score").isNotNull).count() == 1)
    // refusals: NOT NULL, duplicate
    intercept[IllegalArgumentException] {
      DeltaLake.addColumns(spark, dir,
        Seq(StructField("x", LongType, nullable = false)))
    }
    intercept[IllegalArgumentException] {
      DeltaLake.addColumns(spark, dir, Seq(StructField("ID", LongType)))
    }
  }

  test("delta renameColumn: refused on unmapped tables; on a mapped " +
      "table the rename keeps pre-rename files readable") {
    val dir = freshDir("dren")
    DeltaLake.write(spark, dir, frame(1 to 5))
    val e = intercept[IllegalArgumentException] {
      DeltaLake.renameColumn(spark, dir, "v", "label")
    }
    assert(e.getMessage.contains("column mapping"))
    // mapped table: logical rename, physical names untouched
    val mdir = freshDir("drenm")
    val mapping = Map("id" -> "c_1", "v" -> "c_2")
    DeltaLake.stageMappedCommit(spark, mdir, frame(1 to 6),
      Seq.empty, 0L, mapping)
    val v = DeltaLake.renameColumn(spark, mdir, "v", "label")
    assert(v == 1L)
    val snap = DeltaLake.snapshot(spark, mdir)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "label"))
    assert(snap.filter(col("label") === "v3").count() == 1)
    // renaming to an existing name refuses
    intercept[IllegalArgumentException] {
      DeltaLake.renameColumn(spark, mdir, "label", "ID")
    }
  }

  test("iceberg addColumns: same-content snapshot, old files null, " +
      "time travel keeps the old schema") {
    val dir = freshDir("iadd")
    Iceberg.write(spark, dir, frame(1 to 10))
    val preIds = Iceberg.snapshotIds(dir)
    val v = Iceberg.addColumns(spark, dir,
      Seq(StructField("score", DoubleType)))
    assert(v > preIds.last)
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(snap.count() == 10)
    assert(snap.filter(col("score").isNotNull).count() == 0)
    // time travel to the pre-evolution snapshot: old schema
    val old = Iceberg.snapshot(spark, dir, Some(preIds.last))
    assert(old.schema.fieldNames.toSeq == Seq("id", "v"))
    // appends post-evolution carry the column
    Iceberg.write(spark, dir,
      Seq((11L, "v11", 0.5)).toDF("id", "v", "score"))
    assert(Iceberg.snapshot(spark, dir)
      .filter(col("score").isNotNull).count() == 1)
    intercept[IllegalArgumentException] {
      Iceberg.addColumns(spark, dir,
        Seq(StructField("y", StringType, nullable = false)))
    }
  }

  test("iceberg renameColumns: field-id resolution keeps pre-rename " +
      "files readable; spec-source renames refuse") {
    val dir = freshDir("iren")
    Iceberg.write(spark, dir, frame(1 to 8))
    Iceberg.renameColumns(spark, dir, Map("v" -> "label"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "label"))
    assert(snap.filter(col("label") === "v5").count() == 1)
    // partitioned table: renaming the spec source refuses
    val pdir = freshDir("irenp")
    Iceberg.write(spark, pdir,
      (1L to 6L).map(i => (i, s"g${i % 2}")).toDF("id", "p"),
      partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      Iceberg.renameColumns(spark, pdir, Map("p" -> "part"))
    }
  }

  test("DROP COLUMN: metadata-only on iceberg (time travel keeps " +
      "it; equality-delete keys refuse) and on mapped delta; " +
      "unmapped delta refuses") {
    val dir = freshDir("idrop")
    Iceberg.write(spark, dir, frame(1 to 6))
    val preDrop = Iceberg.snapshotIds(dir).last
    Iceberg.dropColumns(spark, dir, Seq("v"))
    assert(Iceberg.snapshot(spark, dir).columns.toSeq == Seq("id"))
    assert(Iceberg.snapshot(spark, dir, Some(preDrop)).columns.toSeq
      == Seq("id", "v"), "time travel must keep the dropped column")
    intercept[IllegalArgumentException] {
      Iceberg.dropColumns(spark, dir, Seq("id")) // last column
    }
    // a live equality delete keying on the column blocks the drop
    val eqDir = freshDir("idropeq")
    Iceberg.stageAppend(spark, eqDir, frame(1 to 6), Seq.empty)
    Iceberg.stageEqDelete(spark, eqDir,
      Seq("v3").toDF("v"))
    val e = intercept[IllegalArgumentException] {
      Iceberg.dropColumns(spark, eqDir, Seq("v"))
    }
    assert(e.getMessage.contains("equality-delete"), e.getMessage)
    // delta: unmapped refuses, mapped drops (physical files keep the
    // column; reads stop projecting it)
    val ddir = freshDir("ddrop")
    DeltaLake.write(spark, ddir, frame(1 to 4))
    intercept[IllegalArgumentException] {
      DeltaLake.dropColumn(spark, ddir, "v")
    }
    val mdir = freshDir("ddropm")
    DeltaLake.stageMappedCommit(spark, mdir, frame(1 to 4),
      Seq.empty, 0L, Map("id" -> "c_1", "v" -> "c_2"))
    DeltaLake.dropColumn(spark, mdir, "v")
    assert(DeltaLake.snapshot(spark, mdir).columns.toSeq == Seq("id"))
    assert(DeltaLake.snapshot(spark, mdir, Some(0L)).columns.toSeq ==
      Seq("id", "v"), "delta time travel must keep the dropped column")
  }

  test("SQL ALTER TABLE through the catalog: ADD / RENAME / DROP " +
      "COLUMN evolve with pin advance; type changes refuse") {
    val wh = freshDir("sqlwh")
    Iceberg.write(spark, new java.io.File(wh, "t").getAbsolutePath,
      frame(1 to 10))
    GraftCatalog.register(spark, wh, "db.t", "graft-iceberg", "t")
    spark.conf.set("spark.sql.catalog.acat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.acat.warehouse", wh)
    spark.sql("ALTER TABLE acat.db.t ADD COLUMNS (score DOUBLE)")
    val got = spark.sql(
      "SELECT id, v, score FROM acat.db.t ORDER BY id").collect()
    assert(got.length == 10 && got.forall(_.isNullAt(2)))
    spark.sql("ALTER TABLE acat.db.t RENAME COLUMN v TO label")
    val ren = spark.sql(
      "SELECT label FROM acat.db.t WHERE id = 7").collect()
    assert(ren.head.getString(0) == "v7")
    // pin advanced: a fresh catalog load (new session state not
    // needed — entries re-read per statement) sees the evolution
    val entry = GraftCatalog.entries(wh)("db.t")
    assert(entry.version ==
      Iceberg.currentSnapshotId(
        new java.io.File(wh, "t").getAbsolutePath))
    // DROP COLUMN is metadata-only under field-id resolution
    spark.sql("ALTER TABLE acat.db.t DROP COLUMN score")
    assert(spark.sql("SELECT * FROM acat.db.t").columns.toSeq ==
      Seq("id", "label"))
    // a type change stays refused (a data rewrite in disguise)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE acat.db.t ALTER COLUMN id TYPE STRING")
    }
    assert(e.getMessage.contains("rewrites in disguise") ||
      e.getMessage.toLowerCase.contains("alter"), e.getMessage)
    // delta twin: ADD COLUMNS through SQL
    DeltaLake.write(spark, new java.io.File(wh, "d").getAbsolutePath,
      frame(1 to 4))
    GraftCatalog.register(spark, wh, "db.d", "graft-deltalake", "d")
    spark.sql("ALTER TABLE acat.db.d ADD COLUMNS (w STRING)")
    assert(spark.sql("SELECT w FROM acat.db.d").collect()
      .forall(_.isNullAt(0)))
  }
}
