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
    assert(e.getMessage.contains("in disguise") ||
      e.getMessage.toLowerCase.contains("alter"), e.getMessage)
    // delta twin: ADD COLUMNS through SQL
    DeltaLake.write(spark, new java.io.File(wh, "d").getAbsolutePath,
      frame(1 to 4))
    GraftCatalog.register(spark, wh, "db.d", "graft-deltalake", "d")
    spark.sql("ALTER TABLE acat.db.d ADD COLUMNS (w STRING)")
    assert(spark.sql("SELECT w FROM acat.db.d").collect()
      .forall(_.isNullAt(0)))
  }

  test("iceberg nested evolution: ADD and RENAME of struct members " +
      "by field id — pre-evolution files read null / keep reading; " +
      "both vintages serve; refusals hold") {
    import org.apache.spark.sql.functions.struct
    val dir = freshDir("inest")
    val base = (1 to 6).map(i => (i.toLong, i.toLong * 10, s"n$i"))
      .toDF("id", "x", "nm")
      .select(col("id"), struct(col("x"), col("nm")).as("s"))
      .coalesce(1)
    Iceberg.write(spark, dir, base)
    // ADD s.z: one evolution commit, fresh end-of-space id
    assert(Iceberg.addFields(spark, dir, Seq(Seq("s") ->
      StructField("z", DoubleType))) >= 0)
    val afterAdd = Iceberg.snapshot(spark, dir)
    assert(afterAdd.select("s.z").collect().forall(_.isNullAt(0)),
      "pre-evolution files must surface the new nested member as null")
    // append WITH the new member: both vintages in one scan
    Iceberg.write(spark, dir,
      Seq((7L, 70L, "n7", 7.5)).toDF("id", "x", "nm", "z")
        .select(col("id"),
          struct(col("x"), col("nm"), col("z")).as("s")).coalesce(1))
    val mixed = Iceberg.snapshot(spark, dir)
    assert(mixed.count() == 7)
    assert(mixed.filter(col("s.z").isNotNull).select("s.x")
      .as[Long].collect().toSeq == Seq(70L))
    // RENAME s.x → sx: same ids, every vintage keeps reading
    assert(Iceberg.renameFields(spark, dir,
      Map(Seq("s", "x") -> "sx")) >= 0)
    val ren = Iceberg.snapshot(spark, dir)
    assert(ren.select("s.sx").as[Long].collect().sorted.toSeq ==
      Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L))
    // time travel to the first snapshot serves the ORIGINAL shape
    val sid0 = Iceberg.snapshotIds(dir).head
    val tt = Iceberg.snapshot(spark, dir, Some(sid0))
    assert(tt.select("s.x").as[Long].collect().length == 6)
    // nested WIDEN: a struct member promotes like a top-level one
    Iceberg.addFields(spark, dir, Seq(Seq("s") ->
      StructField("cnt", org.apache.spark.sql.types.IntegerType)))
    assert(Iceberg.widenFields(spark, dir,
      Map(Seq("s", "cnt") -> LongType)) >= 0)
    assert(Iceberg.snapshot(spark, dir)
      .select("s.cnt").schema.head.dataType == LongType)
    assert(Iceberg.snapshot(spark, dir).count() == 7)
    intercept[IllegalArgumentException] {
      // long -> double is not a legal promotion: refused
      Iceberg.widenFields(spark, dir, Map(Seq("s", "sx") -> DoubleType))
    }
    // refusals: non-struct path, duplicate member, sibling collision
    intercept[IllegalArgumentException] {
      Iceberg.addFields(spark, dir, Seq(Seq("id") ->
        StructField("q", DoubleType)))
    }
    intercept[IllegalArgumentException] {
      Iceberg.addFields(spark, dir, Seq(Seq("s") ->
        StructField("nm", DoubleType)))
    }
    intercept[IllegalArgumentException] {
      Iceberg.renameFields(spark, dir, Map(Seq("s", "nm") -> "sx"))
    }
  }

  test("SQL nested ALTER through the catalog: both formats evolve " +
      "struct members; delta nested rename refuses honestly") {
    import org.apache.spark.sql.functions.struct
    val wh = freshDir("sqlnest")
    Iceberg.write(spark, new java.io.File(wh, "t").getAbsolutePath,
      (1 to 5).map(i => (i.toLong, i * 1.0, s"v$i"))
        .toDF("id", "a", "b")
        .select(col("id"), struct(col("a"), col("b")).as("s"))
        .coalesce(1))
    GraftCatalog.register(spark, wh, "db.t", "graft-iceberg", "t")
    DeltaLake.write(spark, new java.io.File(wh, "d").getAbsolutePath,
      (1 to 3).map(i => (i.toLong, i * 1.0, s"v$i"))
        .toDF("id", "a", "b")
        .select(col("id"), struct(col("a"), col("b")).as("s"))
        .coalesce(1))
    GraftCatalog.register(spark, wh, "db.d", "graft-deltalake", "d")
    spark.conf.set("spark.sql.catalog.ncat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ncat.warehouse", wh)
    spark.sql("ALTER TABLE ncat.db.t ADD COLUMNS (s.c BIGINT)")
    assert(spark.sql("SELECT s.c FROM ncat.db.t").collect()
      .forall(_.isNullAt(0)))
    spark.sql("ALTER TABLE ncat.db.t RENAME COLUMN s.a TO aa")
    assert(spark.sql("SELECT SUM(s.aa) FROM ncat.db.t").head()
      .getDouble(0) == 15.0)
    // delta nested ADD is name-resolved (pre-evolution files surface
    // the member as null; post-evolution appends land it)
    spark.sql("ALTER TABLE ncat.db.d ADD COLUMNS (s.c BIGINT)")
    assert(spark.sql("SELECT s.c FROM ncat.db.d").collect()
      .forall(_.isNullAt(0)))
    spark.sql("INSERT INTO ncat.db.d " +
      "SELECT 9L, named_struct('a', 9.0, 'b', 'v9', 'c', 90L)")
    assert(spark.sql(
      "SELECT s.c FROM ncat.db.d WHERE id = 9").head().getLong(0) ==
      90L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM ncat.db.d WHERE s.c IS NULL").head()
      .getLong(0) == 3L)
    // nested rename on unmapped delta still refuses (physical names)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE ncat.db.d RENAME COLUMN s.a TO aa")
    }
    assert(e2.getMessage.contains("nested renames are not supported"),
      e2.getMessage)
  }

  test("delta nested widen: struct member int→bigint / float→double " +
      "metadata-only; pre-widen files read under the end schema; " +
      "illegal nested changes refuse") {
    import org.apache.spark.sql.functions.struct
    val dir = freshDir("dnwiden")
    DeltaLake.write(spark, dir,
      (1 to 4).map(i => (i.toLong, i, i * 1.5f))
        .toDF("id", "n", "x")
        .select(col("id"),
          struct(col("n"), col("x")).as("s")).coalesce(1))
    assert(DeltaLake.widenField(spark, dir, Seq("s", "n"),
      LongType) == 1L)
    assert(DeltaLake.widenField(spark, dir, Seq("s", "x"),
      org.apache.spark.sql.types.DoubleType) == 2L)
    // pre-widen files read under the END schema (native upcasts)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("n")
      .dataType == LongType)
    assert(snap.selectExpr("SUM(s.n)").head().getLong(0) == 10L)
    // post-widen appends need the wide type
    DeltaLake.write(spark, dir,
      Seq((5L, (6000000000L, 9.25))).toDF("id", "s")
        .selectExpr("id",
          "named_struct('n', s._1, 'x', s._2) AS s"))
    assert(DeltaLake.snapshot(spark, dir)
      .selectExpr("SUM(s.n)").head().getLong(0) == 6000000010L)
    // the leaf records its widening history + protocol carries it
    val log = new java.io.File(dir, "_delta_log")
      .listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)
    val v1 = java.nio.file.Files.readString(log(1).toPath)
    assert(v1.contains("typeWidening") && v1.contains("typeChanges"),
      v1)
    // illegal nested change refuses; non-struct path refuses
    intercept[Exception] {
      DeltaLake.widenField(spark, dir, Seq("s", "x"),
        org.apache.spark.sql.types.IntegerType)
    }
    intercept[Exception] {
      DeltaLake.widenField(spark, dir, Seq("id", "n"), LongType)
    }
  }

  test("delta ADD COLUMN DEFAULT: EXISTS_DEFAULT serves rows " +
      "predating the column at read time; future inserts fill " +
      "CURRENT_DEFAULT; protocol carries allowColumnDefaults") {
    val wh = freshDir("addldft")
    DeltaLake.write(spark,
      new java.io.File(wh, "t").getAbsolutePath, frame(1 to 4))
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    spark.conf.set("spark.sql.catalog.adft",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.adft.warehouse", wh)
    spark.sql("ALTER TABLE adft.db.t ADD COLUMNS " +
      "(channel STRING DEFAULT 'web')")
    // pre-add files: the stored EXISTS_DEFAULT is served, not null
    assert(spark.sql("SELECT channel FROM adft.db.t").collect()
      .forall(_.getString(0) == "web"))
    // future inserts: omitted column fills from CURRENT_DEFAULT;
    // explicit values win
    spark.sql("INSERT INTO adft.db.t (id, v) VALUES (10, 'v10')")
    spark.sql("INSERT INTO adft.db.t VALUES (11, 'v11', 'store')")
    val got = spark.sql(
      "SELECT id, channel FROM adft.db.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "web"), (2L, "web"), (3L, "web"),
      (4L, "web"), (10L, "web"), (11L, "store")), got.toString)
    // the evolution commit carries the protocol feature
    val log = new java.io.File(wh, "t/_delta_log")
      .listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)
    assert(java.nio.file.Files.readString(log(1).toPath)
      .contains("allowColumnDefaults"))
    // SET DEFAULT later changes FUTURE inserts only — the existence
    // default (pre-add files) stays what it was at ADD time
    spark.sql("ALTER TABLE adft.db.t ALTER COLUMN channel " +
      "SET DEFAULT 'kiosk'")
    spark.sql("INSERT INTO adft.db.t (id, v) VALUES (12, 'v12')")
    assert(spark.sql("SELECT channel FROM adft.db.t WHERE id = 12")
      .head().getString(0) == "kiosk")
    assert(spark.sql("SELECT channel FROM adft.db.t WHERE id = 1")
      .head().getString(0) == "web",
      "pre-add rows keep the ADD-time existence default")
  }

  test("iceberg ADD COLUMN DEFAULT: the v3 initial-default serves " +
      "pre-add rows at read, write-default fills future inserts, " +
      "format-version promotes to 3") {
    val wh = freshDir("ibdft")
    Iceberg.write(spark,
      new java.io.File(wh, "t").getAbsolutePath, frame(1 to 4))
    GraftCatalog.register(spark, wh, "db.t", "graft-iceberg", "t")
    spark.conf.set("spark.sql.catalog.ibd",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ibd.warehouse", wh)
    spark.sql("ALTER TABLE ibd.db.t ADD COLUMNS " +
      "(channel STRING DEFAULT 'web', qty BIGINT DEFAULT 7)")
    // pre-add files: the stored initial-default is served, not null
    val pre = spark.sql(
      "SELECT channel, qty FROM ibd.db.t WHERE id = 1").head()
    assert((pre.getString(0), pre.getLong(1)) == ("web", 7L))
    // future inserts: omitted columns fill from write-default;
    // explicit values win
    spark.sql("INSERT INTO ibd.db.t (id, v) VALUES (10, 'gx')")
    spark.sql("INSERT INTO ibd.db.t VALUES (11, 'gy', 'store', 9)")
    val got = spark.sql(
      "SELECT id, channel, qty FROM ibd.db.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "web", 7L), (2L, "web", 7L),
      (3L, "web", 7L), (4L, "web", 7L), (10L, "web", 7L),
      (11L, "store", 9L)), got.toString)
    // the evolution commit stamped format-version 3 (field defaults
    // are a v3 feature — a v2 stamp would let an external v2 reader
    // silently serve null where the contract says default)
    val mdDir = new java.io.File(wh, "t/metadata")
    val latest = mdDir.listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val text = java.nio.file.Files.readString(latest.toPath)
    assert(text.contains("\"format-version\":3"), text.take(200))
    assert(text.contains("initial-default") &&
      text.contains("write-default"))
    // non-constant and nested defaults refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE ibd.db.t ADD COLUMNS " +
        "(bad STRING DEFAULT rand())")
    }
    // a default carrying backslashes/quotes round-trips EXACTLY
    // (rendered hex-safe — quoted literals are parser-flag-dependent)
    spark.sql("ALTER TABLE ibd.db.t ADD COLUMNS " +
      raw"(path STRING DEFAULT 'C:\\temp''s')")
    assert(spark.sql("SELECT path FROM ibd.db.t WHERE id = 1")
      .head().getString(0) == raw"C:\temp's",
      "backslash default must round-trip verbatim")
    // a NON-FINITE floating default has no JSON-number rendering in
    // the v3 single-value serialization — refuse, never emit a
    // non-standard token into table metadata (r16 advice)
    val eNan = intercept[Exception] {
      spark.sql("ALTER TABLE ibd.db.t ADD COLUMNS " +
        "(badf DOUBLE DEFAULT double('nan'))")
    }
    assert(eNan.getMessage.contains("non-finite"), eNan.getMessage)
    val eInf = intercept[Exception] {
      spark.sql("ALTER TABLE ibd.db.t ADD COLUMNS " +
        "(badi DOUBLE DEFAULT double('infinity'))")
    }
    assert(eInf.getMessage.contains("non-finite"), eInf.getMessage)
  }

  test("delta column-mapping upgrade (SET TBLPROPERTIES mode=name): " +
      "physical names freeze at the logical names, RENAME becomes " +
      "metadata-only, pre-rename files read under the new name") {
    val wh = freshDir("dcmwh")
    val dir = new java.io.File(wh, "t").getAbsolutePath
    DeltaLake.write(spark, dir, frame(1 to 4))
    DeltaLake.write(spark, dir, frame(5 to 6)) // second file pre-upgrade
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    spark.conf.set("spark.sql.catalog.dcm",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dcm.warehouse", wh)
    // rename WITHOUT mapping refuses with the migration hint
    val e0 = intercept[Exception] {
      spark.sql("ALTER TABLE dcm.db.t RENAME COLUMN v TO label")
    }
    assert(e0.getMessage.contains("column mapping"), e0.getMessage)
    // the upgrade commit: protocol union + per-field physicalName/id
    spark.sql("ALTER TABLE dcm.db.t SET TBLPROPERTIES(" +
      "'delta.columnMapping.mode' = 'name')")
    val last = new java.io.File(dir, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).maxBy(_.getName)
    val text = java.nio.file.Files.readString(last.toPath)
    assert(text.contains("\"delta.columnMapping.mode\":\"name\"") &&
      text.contains("columnMapping") &&
      text.contains("physicalName"), text.take(400))
    // now the rename is one metadata commit; both pre-upgrade files
    // keep reading (physicalName froze at the old logical name)
    spark.sql("ALTER TABLE dcm.db.t RENAME COLUMN v TO label")
    val rows = spark.sql(
      "SELECT id, label FROM dcm.db.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == (1 to 6).map(i => (i.toLong, s"v$i")).toSeq, rows)
    // library API reads too (not just the catalog splice)
    assert(DeltaLake.snapshot(spark, dir).columns.toSeq ==
      Seq("id", "label"))
    // the upgrade is idempotent; mode=id refuses; UNSET refuses
    spark.sql("ALTER TABLE dcm.db.t SET TBLPROPERTIES(" +
      "'delta.columnMapping.mode' = 'name')")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE dcm.db.t SET TBLPROPERTIES(" +
        "'delta.columnMapping.mode' = 'id')")
    }
    assert(e1.getMessage.contains("none→name") ||
      e1.getMessage.contains("only the"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE dcm.db.t UNSET TBLPROPERTIES(" +
        "'delta.columnMapping.mode')")
    }
    assert(e2.getMessage.contains("cannot revert"), e2.getMessage)
    // DML on the now-mapped table keeps refusing loudly (this
    // writer's DML emits logical names — the documented trade)
    val e3 = intercept[Exception] {
      spark.sql("DELETE FROM dcm.db.t WHERE id = 1")
    }
    assert(e3.getMessage.contains("column mapping"), e3.getMessage)
  }

  test("delta widenColumn: int→bigint metadata-only, pre-widen files " +
      "read under the widened type, typeWidening protocol + history " +
      "recorded; illegal changes refuse") {
    val dir = freshDir("dwiden")
    val ints = (1 to 8).map(i => (i, i * 1.5f)).toDF("n", "f")
      .coalesce(1)
    DeltaLake.write(spark, dir, ints)
    assert(DeltaLake.widenColumn(spark, dir, "n", LongType) == 1L)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.schema("n").dataType == LongType)
    assert(snap.select("n").as[Long].collect().sorted.toSeq ==
      (1L to 8L))
    // the spec's per-field widening history landed
    val meta = snap.schema("n").metadata
    assert(meta.contains("delta.typeChanges"))
    val h = meta.getMetadataArray("delta.typeChanges").head
    assert(h.getString("fromType") == "integer" &&
      h.getString("toType") == "long")
    // float→double on the same table; appends mix vintages
    DeltaLake.widenColumn(spark, dir, "f", DoubleType)
    DeltaLake.write(spark, dir,
      Seq((9L, 9.25)).toDF("n", "f").coalesce(1))
    val mixed = DeltaLake.snapshot(spark, dir)
    assert(mixed.count() == 9 &&
      mixed.filter(col("f") === 9.25).count() == 1)
    // narrowing / cross-family / scale changes refuse
    intercept[IllegalArgumentException] {
      DeltaLake.widenColumn(spark, dir, "n",
        org.apache.spark.sql.types.IntegerType)
    }
    intercept[IllegalArgumentException] {
      DeltaLake.widenColumn(spark, dir, "f", StringType)
    }
  }

  test("iceberg widenColumns: same field ids, both vintages readable " +
      "and stats-pruned; partition-source and illegal refuse") {
    val dir = freshDir("iwiden")
    val ints = (1 to 100).map(i => (i, s"v$i")).toDF("n", "v")
      .repartition(4, col("n"))
    Iceberg.write(spark, dir, ints)
    assert(Iceberg.widenColumns(spark, dir,
      Map("n" -> LongType)) >= 0)
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.schema("n").dataType == LongType)
    assert(snap.count() == 100)
    // appends land under the widened schema; both vintages serve
    Iceberg.write(spark, dir,
      Seq((1000L, "v1000")).toDF("n", "v").coalesce(1))
    assert(Iceberg.snapshot(spark, dir).count() == 101)
    // pre-widen manifests' 4-byte bounds still prune under the
    // widened type (decodeBounds' pre-widen arm): a predicate above
    // every pre-widen file's bound scans only the new file
    import org.apache.spark.sql.classic
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val q = try {
      val f = Iceberg.snapshot(spark, dir).filter(col("n") >= 1000L)
      assert(f.collect().length == 1)
      f
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    val scan = q.asInstanceOf[classic.Dataset[_]].queryExecution
      .executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
    assert(scan.metrics("numFiles").value == 1L,
      "pre-widen bounds must keep stats skipping alive")
    // time travel to the pre-widen snapshot serves the OLD type
    val sid0 = Iceberg.snapshotIds(dir).head
    assert(Iceberg.snapshot(spark, dir, Some(sid0))
      .schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // refusals: narrowing, partition-spec source
    intercept[IllegalArgumentException] {
      Iceberg.widenColumns(spark, dir, Map("n" ->
        org.apache.spark.sql.types.IntegerType))
    }
    val pdir = freshDir("iwidenp")
    Iceberg.write(spark, pdir, ints.withColumn("p", col("n") % 3),
      partitionBy = Seq("p"))
    val e = intercept[IllegalArgumentException] {
      Iceberg.widenColumns(spark, pdir, Map("p" -> LongType))
    }
    assert(e.getMessage.contains("partition-spec source"), e.getMessage)
  }

  test("iceberg partition-spec evolution: addPartitionField mints a " +
      "new default spec; both vintages read and prune under their " +
      "own spec; identity additions refuse") {
    val dir = freshDir("ispec")
    val old = (1 to 40).map(i => (i.toLong, s"p${i % 2}", s"v$i"))
      .toDF("id", "p", "v")
    Iceberg.write(spark, dir, old, partitionBy = Seq("p"))
    // evolve: default spec becomes [identity(p), bucket(4, id)]
    assert(Iceberg.addPartitionField(spark, dir, "bucket(4, id)") >= 0)
    // new writes land under the NEW spec automatically
    Iceberg.write(spark, dir,
      (41 to 80).map(i => (i.toLong, s"p${i % 2}", s"v$i"))
        .toDF("id", "p", "v"))
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.count() == 80)
    // identity partition pruning serves BOTH vintages
    import org.apache.spark.sql.classic
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val q = try {
      val f = Iceberg.snapshot(spark, dir).filter(col("p") === "p1")
      assert(f.collect().length == 40)
      f
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    val scanned = q.asInstanceOf[classic.Dataset[_]].queryExecution
      .executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get.metrics("numFiles").value
    val all = Iceberg.snapshot(spark, dir).inputFiles.length
    assert(scanned < all,
      s"p-filter must prune files under both specs ($scanned/$all)")
    // bucket pruning bites on the NEW vintage: an id-equality scan
    // reads fewer files than the p-equality scan over new files
    assert(Iceberg.snapshot(spark, dir)
      .filter(col("id") === 50L).collect().map(_.getString(2)).toSeq ==
      Seq("v50"))
    // the default spec is the evolved one; old manifests keep theirs
    assert(Iceberg.resolve(spark, dir, None).specStrings ==
      Seq("p", "bucket(4, id)"))
    // identity additions refuse (mixed identity sets are unreadable)
    val e = intercept[IllegalArgumentException] {
      Iceberg.addPartitionField(spark, dir, "v")
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
    // duplicate field refuses
    intercept[IllegalArgumentException] {
      Iceberg.addPartitionField(spark, dir, "bucket(4, id)")
    }
  }

  test("iceberg nested DROP: struct members drop metadata-only by " +
      "field id; guards hold (last member, eq-delete keys, delta " +
      "refusal through the catalog)") {
    import org.apache.spark.sql.functions.struct
    val dir = freshDir("indrop")
    Iceberg.write(spark, dir,
      (1 to 6).map(i => (i.toLong, i * 1.0, s"v$i"))
        .toDF("id", "a", "b")
        .select(col("id"), struct(col("a"), col("b")).as("s"))
        .coalesce(1))
    val preDrop = Iceberg.snapshotIds(dir).last
    assert(Iceberg.dropFields(spark, dir, Seq(Seq("s", "a"))) >= 0)
    val snap = Iceberg.snapshot(spark, dir)
    assert(snap.select("s.*").columns.toSeq == Seq("b"))
    assert(snap.count() == 6)
    // time travel keeps the dropped member
    assert(Iceberg.snapshot(spark, dir, Some(preDrop))
      .select("s.*").columns.toSeq == Seq("a", "b"))
    // dropping the struct's last member refuses (drop the struct)
    val e = intercept[IllegalArgumentException] {
      Iceberg.dropFields(spark, dir, Seq(Seq("s", "b")))
    }
    assert(e.getMessage.contains("every member"), e.getMessage)
    // SQL route: iceberg nested drop works; delta refuses honestly
    val wh = freshDir("sqlndrop")
    Iceberg.write(spark, new java.io.File(wh, "t").getAbsolutePath,
      (1 to 4).map(i => (i.toLong, i * 1.0, s"v$i"))
        .toDF("id", "a", "b")
        .select(col("id"), struct(col("a"), col("b")).as("s"))
        .coalesce(1))
    GraftCatalog.register(spark, wh, "db.t", "graft-iceberg", "t")
    DeltaLake.stageMappedCommit(spark,
      new java.io.File(wh, "d").getAbsolutePath,
      (1 to 3).map(i => (i.toLong, i * 1.0)).toDF("id", "a")
        .select(col("id"), struct(col("a")).as("s")).coalesce(1),
      Seq.empty, 0L, Map("id" -> "c_1", "s" -> "c_2"))
    GraftCatalog.register(spark, wh, "db.d", "graft-deltalake", "d")
    spark.conf.set("spark.sql.catalog.dcat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dcat.warehouse", wh)
    spark.sql("ALTER TABLE dcat.db.t DROP COLUMN s.a")
    assert(spark.sql("SELECT s.* FROM dcat.db.t").columns.toSeq ==
      Seq("b"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE dcat.db.d DROP COLUMN s.a")
    }
    assert(e2.getMessage.contains("nested drops are not supported"),
      e2.getMessage)
  }

  test("iceberg dropPartitionField: the default spec loses the " +
      "field, old files keep pruning under their own spec; identity " +
      "removal refuses") {
    val dir = freshDir("ispecdrop")
    Iceberg.write(spark, dir,
      (1 to 40).map(i => (i.toLong, s"p${i % 2}", s"v$i"))
        .toDF("id", "p", "v"), partitionBy = Seq("p"))
    Iceberg.addPartitionField(spark, dir, "bucket(4, id)")
    Iceberg.write(spark, dir,
      (41 to 60).map(i => (i.toLong, s"p${i % 2}", s"v$i"))
        .toDF("id", "p", "v"))
    assert(Iceberg.dropPartitionField(spark, dir,
      "bucket(4, id)") >= 0)
    assert(Iceberg.resolve(spark, dir, None).specStrings == Seq("p"))
    // new writes land under the slimmer spec; all vintages read
    Iceberg.write(spark, dir,
      (61 to 70).map(i => (i.toLong, s"p${i % 2}", s"v$i"))
        .toDF("id", "p", "v"))
    assert(Iceberg.snapshot(spark, dir).count() == 70)
    assert(Iceberg.snapshot(spark, dir)
      .filter(col("p") === "p0").count() == 35)
    // identity removal refuses
    val e = intercept[IllegalArgumentException] {
      Iceberg.dropPartitionField(spark, dir, "p")
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
    intercept[IllegalArgumentException] {
      Iceberg.dropPartitionField(spark, dir, "nope")
    }
  }

  test("SQL ALTER COLUMN TYPE through the catalog widens on both " +
      "formats; mixed-kind statements refuse") {
    val wh = freshDir("sqlwiden")
    Iceberg.write(spark, new java.io.File(wh, "t").getAbsolutePath,
      (1 to 10).map(i => (i, i * 2.0f)).toDF("n", "f").coalesce(1))
    GraftCatalog.register(spark, wh, "db.t", "graft-iceberg", "t")
    DeltaLake.write(spark, new java.io.File(wh, "d").getAbsolutePath,
      (1 to 6).map(i => (i, s"v$i")).toDF("n", "v").coalesce(1))
    GraftCatalog.register(spark, wh, "db.d", "graft-deltalake", "d")
    spark.conf.set("spark.sql.catalog.wcat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wcat.warehouse", wh)
    spark.sql("ALTER TABLE wcat.db.t ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE wcat.db.t ALTER COLUMN f TYPE DOUBLE")
    val got = spark.sql(
      "SELECT n, f FROM wcat.db.t WHERE n <= 2 ORDER BY n").collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 2.0), (2L, 4.0)))
    spark.sql("ALTER TABLE wcat.db.d ALTER COLUMN n TYPE BIGINT")
    assert(spark.sql("SELECT SUM(n) FROM wcat.db.d").head()
      .getLong(0) == 21L)
    // pin advanced with the widen commit
    assert(GraftCatalog.entries(wh)("db.t").version ==
      Iceberg.currentSnapshotId(
        new java.io.File(wh, "t").getAbsolutePath))
    // a narrowing through SQL refuses — Spark's analyzer catches it
    // before the catalog (NOT_SUPPORTED_CHANGE_COLUMN); Cast-legal
    // but spec-illegal changes (e.g. int→double on Delta) reach the
    // native writer and refuse there
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE wcat.db.t ALTER COLUMN n TYPE INT")
    }
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("in disguise") ||
      e.getMessage.contains("promotion"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE wcat.db.d ALTER COLUMN n TYPE DOUBLE")
    }
    assert(e2.getMessage.contains("promotion") ||
      e2.getMessage.contains("in disguise"), e2.getMessage)
  }
}
