package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** `CREATE OR REPLACE TABLE` / `REPLACE TABLE` via the staged catalog
  * ([[StagedGraftReplace]]): a replace of an existing table NEVER
  * drops — the query writes through the native OVERWRITE commit, so a
  * SELF-REFERENCING replace works (Spark's non-staging drop+create
  * fallback purged a managed table's data dir while the SELECT still
  * needed the old files — data loss), HISTORY is retained (time
  * travel to pre-replace versions), the new schema and partition
  * layout are adopted, and a failed query leaves the old table
  * untouched. `REPLACE TABLE` without AS lands an empty overwrite;
  * cross-format and TBLPROPERTIES replaces refuse.
  */
class ReplaceTableSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("managed RTAS: SELF-REFERENCING replace works, history " +
      "retained, schema and layout adopted; REPLACE TABLE gives a " +
      "fresh empty definition") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_rtas").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.rts", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rts.warehouse", wh)
    spark.sql("CREATE TABLE rts.db.t (id BIGINT, v STRING) " +
      "USING `graft-deltalake`")
    spark.sql("INSERT INTO rts.db.t VALUES (1, 'a'), (2, 'b')")
    // the shape the drop+create fallback destroyed: replace FROM self
    spark.sql("CREATE OR REPLACE TABLE rts.db.t " +
      "USING `graft-deltalake` PARTITIONED BY (tag) AS " +
      "SELECT id * 10 AS id, UPPER(v) AS tag FROM rts.db.t")
    val got = spark.sql("SELECT id, tag FROM rts.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((10L, "A"), (20L, "B")))
    // history retained: the pre-replace content time-travels
    val t = new java.io.File(wh, "db/t").getAbsolutePath
    val pre = DeltaLake.snapshot(spark, t, Some(1L))
    assert(pre.columns.toSeq == Seq("id", "v") && pre.count() == 2)
    // and the new layout is the table's layout
    assert(DeltaLake.snapshot(spark, t)
      .filter(org.apache.spark.sql.functions.col("tag") === "A")
      .count() == 1)
    // REPLACE TABLE (no AS): fresh empty definition, same history
    spark.sql("REPLACE TABLE rts.db.t (k BIGINT) " +
      "USING `graft-deltalake`")
    assert(spark.sql("SELECT * FROM rts.db.t").columns.toSeq ==
      Seq("k"))
    assert(spark.sql("SELECT COUNT(*) FROM rts.db.t").head()
      .getLong(0) == 0L)
    assert(DeltaLake.snapshot(spark, t, Some(1L)).count() == 2,
      "replace must keep history")
    // a same-schema iceberg RTAS replaces too
    spark.sql("CREATE TABLE rts.db.i (n BIGINT) USING `graft-iceberg`")
    spark.sql("INSERT INTO rts.db.i VALUES (7)")
    spark.sql("CREATE OR REPLACE TABLE rts.db.i " +
      "USING `graft-iceberg` AS SELECT n + 1 AS n FROM rts.db.i")
    assert(spark.sql("SELECT n FROM rts.db.i").head().getLong(0) == 8L)
  }

  test("replace introducing DEFAULT/identity columns onto a plain " +
      "table commits the protocol upgrade with the overwrite") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_rtp").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.rtp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rtp.warehouse", wh)
    // a plain minWriter-2 table: no features
    spark.sql("CREATE TABLE rtp.db.t (id BIGINT, v STRING) " +
      "USING `graft-deltalake`")
    spark.sql("INSERT INTO rtp.db.t VALUES (1, 'a')")
    // REPLACE re-declares the table with a DEFAULT column and an
    // identity surrogate — the overwrite commit must union
    // allowColumnDefaults + identityColumns into the protocol, or a
    // compliant external writer would append without filling/
    // allocating (spec-noncompliant table)
    spark.sql("REPLACE TABLE rtp.db.t (rid BIGINT GENERATED ALWAYS " +
      "AS IDENTITY (START WITH 10 INCREMENT BY 2), id BIGINT, " +
      "tag STRING DEFAULT 'x') USING `graft-deltalake`")
    val dir = new java.io.File(wh, "db/t/_delta_log")
    val last = dir.listFiles().filter(_.getName.endsWith(".json"))
      .maxBy(_.getName)
    val text = java.nio.file.Files.readString(last.toPath)
    assert(text.contains("allowColumnDefaults"),
      s"replace commit must carry allowColumnDefaults: $text")
    assert(text.contains("identityColumns"),
      s"replace commit must carry identityColumns: $text")
    // and the contracts are live: omitted columns fill/allocate
    spark.sql("INSERT INTO rtp.db.t (id) VALUES (5)")
    val r = spark.sql("SELECT rid, id, tag FROM rtp.db.t").head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 5L &&
      r.getString(2) == "x")
  }

  test("replace dropping a CHECK-constrained column refuses with the " +
      "actionable message; UNSET first, then the replace lands") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_rtc").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.rtc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rtc.warehouse", wh)
    spark.sql("CREATE TABLE rtc.db.t (id BIGINT, v STRING) " +
      "USING `graft-deltalake`")
    spark.sql("INSERT INTO rtc.db.t VALUES (1, 'a')")
    spark.sql("ALTER TABLE rtc.db.t SET TBLPROPERTIES " +
      "('delta.constraints.pos' = 'id > 0')")
    // the configuration survives an overwrite verbatim: replacing
    // away the constrained column would orphan the constraint and
    // break every later write — refuse at stage time
    val e = intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE rtc.db.t " +
        "USING `graft-deltalake` AS SELECT v FROM rtc.db.t")
    }
    assert(e.getMessage.contains("constraint 'pos'"), e.getMessage)
    assert(spark.sql("SELECT id FROM rtc.db.t").head().getLong(0) == 1L,
      "refused replace must leave the table untouched")
    // a replace KEEPING the column is fine (and the surviving
    // constraint validates the replaced content)
    spark.sql("CREATE OR REPLACE TABLE rtc.db.t " +
      "USING `graft-deltalake` AS SELECT id + 1 AS id FROM rtc.db.t")
    assert(spark.sql("SELECT id FROM rtc.db.t").head().getLong(0) == 2L)
    // drop the constraint, then the narrowing replace lands
    spark.sql("ALTER TABLE rtc.db.t UNSET TBLPROPERTIES " +
      "('delta.constraints.pos')")
    spark.sql("CREATE OR REPLACE TABLE rtc.db.t " +
      "USING `graft-deltalake` AS SELECT 'z' AS v")
    assert(spark.sql("SELECT v FROM rtc.db.t").head().getString(0) == "z")
  }

  test("replace guards: cross-format refuses, TBLPROPERTIES refuse, " +
      "a failed query leaves the old table untouched") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_rtg").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.rtg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rtg.warehouse", wh)
    spark.sql("CREATE TABLE rtg.db.t (id BIGINT) " +
      "USING `graft-deltalake`")
    spark.sql("INSERT INTO rtg.db.t VALUES (1)")
    val e = intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE rtg.db.t " +
        "USING `graft-iceberg` AS SELECT 2 AS id")
    }
    assert(e.getMessage.contains("across formats"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE rtg.db.t " +
        "USING `graft-deltalake` TBLPROPERTIES ('x' = 'y') " +
        "AS SELECT 2 AS id")
    }
    assert(e2.getMessage.contains("TBLPROPERTIES"), e2.getMessage)
    // a failing replace query: old content survives (no drop happened)
    intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE rtg.db.t " +
        "USING `graft-deltalake` AS " +
        "SELECT CAST(raise_error('boom') AS BIGINT) AS id")
    }
    assert(spark.sql("SELECT id FROM rtg.db.t").head().getLong(0) == 1L,
      "a failed replace must leave the old table untouched")
    // plain REPLACE of a missing table refuses; OR REPLACE creates
    intercept[Exception] {
      spark.sql("REPLACE TABLE rtg.db.nope (id BIGINT) " +
        "USING `graft-deltalake`")
    }
    spark.sql("CREATE OR REPLACE TABLE rtg.db.fresh (id BIGINT) " +
      "USING `graft-deltalake`")
    assert(spark.sql("SELECT * FROM rtg.db.fresh").columns.toSeq ==
      Seq("id"))
  }
}
