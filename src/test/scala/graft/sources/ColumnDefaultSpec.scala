package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** COLUMN DEFAULT VALUES (the `allowColumnDefaults` Delta feature,
  * completing the writer-computed trio with generated/identity):
  * `CREATE TABLE … (c STRING DEFAULT 'x')` stores the analyzer's
  * `CURRENT_DEFAULT`/`EXISTS_DEFAULT` metadata keys, Spark's
  * ResolveDefaultColumns fills omitted columns and the DEFAULT
  * keyword from them (explicit NULL stays null — the analyzer knows
  * omitted from null, which a writer-side fill never could), and the
  * first commit carries the protocol feature. `ALTER COLUMN … SET /
  * DROP DEFAULT` rewrites CURRENT_DEFAULT metadata-only (future
  * inserts; existing rows carry physical values). ADD COLUMN with a
  * default refuses — this reader surfaces missing columns as null,
  * so existing rows could not serve it.
  */
class ColumnDefaultSpec extends AnyFunSuite with SparkFixture {

  private def freshWh(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_cdef_$name").toFile
    d.deleteOnExit()
    val wh = d.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.cd$name",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.cd$name.warehouse", wh)
    wh
  }

  test("CREATE with defaults: omitted columns and the DEFAULT " +
      "keyword fill, explicit NULL stays null, protocol carries the " +
      "feature") {
    val wh = freshWh("base")
    spark.sql("CREATE TABLE cdbase.db.t (id BIGINT, " +
      "status STRING DEFAULT 'active', score DOUBLE DEFAULT 1.5) " +
      "USING `graft-deltalake`")
    spark.sql("INSERT INTO cdbase.db.t (id) VALUES (1)")
    spark.sql("INSERT INTO cdbase.db.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql("INSERT INTO cdbase.db.t VALUES (3, NULL, 9.9)")
    val rows = spark.sql(
      "SELECT id, status, score FROM cdbase.db.t ORDER BY id")
      .collect()
    assert(rows.map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1),
      r.getDouble(2))).toSeq ==
      Seq((1L, "active", 1.5), (2L, "active", 1.5), (3L, null, 9.9)))
    // the first commit's protocol carries allowColumnDefaults
    val log = new java.io.File(wh, "db/t/_delta_log")
      .listFiles().filter(_.getName.endsWith(".json")).minBy(_.getName)
    assert(java.nio.file.Files.readString(log.toPath)
      .contains("allowColumnDefaults"))
  }

  test("SET / DROP DEFAULT: future inserts change, existing rows " +
      "keep their values; refusals hold") {
    val wh = freshWh("alter")
    spark.sql("CREATE TABLE cdalter.db.t (id BIGINT, " +
      "status STRING DEFAULT 'new') USING `graft-deltalake`")
    spark.sql("INSERT INTO cdalter.db.t (id) VALUES (1)")
    spark.sql("ALTER TABLE cdalter.db.t ALTER COLUMN status " +
      "SET DEFAULT 'held'")
    spark.sql("INSERT INTO cdalter.db.t (id) VALUES (2)")
    spark.sql("ALTER TABLE cdalter.db.t ALTER COLUMN status " +
      "DROP DEFAULT")
    spark.sql("INSERT INTO cdalter.db.t (id) VALUES (3)")
    val got = spark.sql(
      "SELECT id, status FROM cdalter.db.t ORDER BY id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(got == Seq((1L, "new"), (2L, "held"), (3L, null)))
    // a default can also be set on a column that never had one
    spark.sql("ALTER TABLE cdalter.db.t ALTER COLUMN status " +
      "SET DEFAULT 'revived'")
    spark.sql("INSERT INTO cdalter.db.t (id) VALUES (4)")
    assert(spark.sql("SELECT status FROM cdalter.db.t WHERE id = 4")
      .head().getString(0) == "revived")
    // ADD COLUMN with DEFAULT backfills at READ time (r16): existing
    // rows are served the stored EXISTS_DEFAULT (their files miss the
    // column physically), future inserts fill CURRENT_DEFAULT
    spark.sql("ALTER TABLE cdalter.db.t ADD COLUMNS " +
      "(tag STRING DEFAULT 'x')")
    assert(spark.sql("SELECT tag FROM cdalter.db.t WHERE id = 1")
      .head().getString(0) == "x",
      "pre-add rows must read the existence default")
    // defaults are a Delta surface: iceberg CREATE refuses
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE cdalter.db.i (id BIGINT, " +
        "s STRING DEFAULT 'x') USING `graft-iceberg`")
    }
    assert(e2.getMessage.contains("graft-deltalake"), e2.getMessage)
    // MERGE INSERT and UPDATE SET resolve DEFAULT too (the analyzer
    // aligns assignments from CURRENT_DEFAULT before the lowering)
    import spark.implicits._
    Seq((5L, "src5"), (1L, "src1")).toDF("id", "s")
      .createOrReplaceTempView("cdef_src")
    spark.sql(
      """MERGE INTO cdalter.db.t t USING cdef_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET status = DEFAULT
        |WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)
        |""".stripMargin)
    val afterMerge = spark.sql(
      "SELECT id, status FROM cdalter.db.t WHERE id IN (1, 5)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(afterMerge(5L) == "revived",
      "merge INSERT must fill the current default")
    assert(afterMerge(1L) == "revived",
      "UPDATE SET DEFAULT must resolve the current default")
    // plain UPDATE resolves the DEFAULT keyword too
    spark.sql("UPDATE cdalter.db.t SET status = DEFAULT WHERE id = 3")
    assert(spark.sql("SELECT status FROM cdalter.db.t WHERE id = 3")
      .head().getString(0) == "revived")
    // SET DEFAULT on a generated column refuses (writer-computed)
    spark.sql("CREATE TABLE cdalter.db.g (v DOUBLE, " +
      "v2 DOUBLE GENERATED ALWAYS AS (v * 2)) USING `graft-deltalake`")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE cdalter.db.g ALTER COLUMN v2 " +
        "SET DEFAULT 7.0")
    }
    assert(e3.getMessage.contains("generated"), e3.getMessage)
  }
}
