package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** CHECK constraints, EVALUATED (formerly refused wholesale):
  * declared at creation or added via
  * `ALTER TABLE … SET TBLPROPERTIES('delta.constraints.<name>')`
  * (existing rows validated first), enforced by every row-writing
  * path — write, the streaming sink, UPDATE, MERGE (canonical and
  * general) — with a violation refusing the WHOLE commit before any
  * file lands. NULL results violate (the reference implementation's
  * invariant-check behavior). DELETE never violates; DROP removes the
  * constraint.
  */
class CheckConstraintSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_ck_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, i * 1.0)).toDF("id", "v").coalesce(1)

  test("creation-time constraint: valid batches land, a violating " +
      "batch refuses the whole commit, protocol carries the feature") {
    val dir = freshDir("create")
    DeltaLake.write(spark, dir, frame(1 to 5),
      properties = Map("delta.constraints.positive" -> "v > 0"))
    assert(DeltaLake.snapshot(spark, dir).count() == 5)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, dir,
        Seq((6L, -1.0), (7L, 7.0)).toDF("id", "v"))
    }
    assert(e.getMessage.contains("positive") &&
      e.getMessage.contains("1 row"), e.getMessage)
    // NOTHING landed from the violating batch
    assert(DeltaLake.snapshot(spark, dir).count() == 5)
    assert(DeltaLake.latestVersion(spark, dir) == 0L)
    // a violating batch at CREATION refuses too
    val d2 = freshDir("createbad")
    intercept[IllegalArgumentException] {
      DeltaLake.write(spark, d2, frame(1 to 3)
        .withColumn("v", col("v") - 10),
        properties = Map("delta.constraints.positive" -> "v > 0"))
    }
    // NULL result = violation
    val d3 = freshDir("null")
    intercept[IllegalArgumentException] {
      DeltaLake.write(spark, d3,
        Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v"),
        properties = Map("delta.constraints.positive" -> "v > 0"))
    }
  }

  test("addCheckConstraint validates EXISTING rows; UPDATE and MERGE " +
      "enforce on their outputs; DELETE and DROP CONSTRAINT work") {
    val dir = freshDir("dml")
    DeltaLake.write(spark, dir, frame(1 to 10))
    // an unsatisfied constraint cannot be added
    val eAdd = intercept[IllegalArgumentException] {
      DeltaLake.addCheckConstraint(spark, dir, "big", "v > 5")
    }
    assert(eAdd.getMessage.contains("big"), eAdd.getMessage)
    assert(DeltaLake.addCheckConstraint(spark, dir,
      "positive", "v > 0") == 1L)
    // UPDATE producing a violation refuses; a valid one lands
    intercept[IllegalArgumentException] {
      DeltaLake.update(spark, dir, col("id") === 3L,
        Map("v" -> org.apache.spark.sql.functions.lit(-5.0)))
    }
    DeltaLake.update(spark, dir, col("id") === 3L,
      Map("v" -> org.apache.spark.sql.functions.lit(99.0)))
    // canonical MERGE: violating source refuses, nothing commits
    val vBefore = DeltaLake.latestVersion(spark, dir)
    intercept[IllegalArgumentException] {
      DeltaLake.merge(spark, dir,
        Seq((1L, -1.0), (20L, 5.0)).toDF("id", "v"), Seq("id"))
    }
    assert(DeltaLake.latestVersion(spark, dir) == vBefore)
    // general MERGE: a violating matched UPDATE refuses; a
    // matched-DELETE-only merge never violates
    intercept[IllegalArgumentException] {
      DeltaLake.mergeGeneral(spark, dir,
        Seq((2L, 1.0)).toDF("id", "sv"), Seq("id"),
        matched = Seq(MergeActions.MatchedUpdate(None,
          Some(Map("v" -> (MergeActions.src("sv") - 10))))))
    }
    assert(DeltaLake.mergeGeneral(spark, dir,
      Seq(5L).toDF("id"), Seq("id"),
      matched = Seq(MergeActions.MatchedDelete())) > 0)
    // plain DELETE never violates
    assert(DeltaLake.delete(spark, dir, col("id") === 6L) > 0)
    // DROP the constraint: the formerly-violating update now lands
    DeltaLake.dropCheckConstraint(spark, dir, "positive")
    DeltaLake.update(spark, dir, col("id") === 4L,
      Map("v" -> org.apache.spark.sql.functions.lit(-5.0)))
    intercept[IllegalArgumentException] {
      DeltaLake.dropCheckConstraint(spark, dir, "nope")
    }
  }

  test("SQL surface: SET TBLPROPERTIES adds (validating existing " +
      "rows), violating INSERT refuses, UNSET drops; non-constraint " +
      "properties refuse") {
    val wh = freshDir("sql")
    DeltaLake.write(spark, new java.io.File(wh, "t").getAbsolutePath,
      frame(1 to 6))
    GraftCatalog.register(spark, wh, "db.t", "graft-deltalake", "t")
    spark.conf.set("spark.sql.catalog.ckc",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ckc.warehouse", wh)
    spark.sql("ALTER TABLE ckc.db.t SET TBLPROPERTIES " +
      "('delta.constraints.positive' = 'v > 0')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ckc.db.t VALUES (7, -1.0)")
    }
    assert(e.getMessage.contains("positive") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("positive")),
      s"expected the constraint refusal, got: $e")
    spark.sql("INSERT INTO ckc.db.t VALUES (7, 7.0)")
    assert(spark.sql("SELECT COUNT(*) FROM ckc.db.t")
      .head().getLong(0) == 7L)
    // streaming sink enforces too
    val src = new java.io.File(wh, "src").getAbsolutePath
    DeltaLake.stageCommit(spark,
      src, Seq((8L, -2.0)).toDF("id", "v"), Seq.empty, 0L)
    val ckpt = freshDir("ckpt")
    val q = spark.readStream.format("graft-deltalake").load(src)
      .writeStream.format("graft-deltalake")
      .option("checkpointLocation", ckpt)
      .option("warehouse", wh).option("table", "db.t")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val eSink = intercept[Exception] { q.awaitTermination() }
    assert(eSink.getMessage.contains("positive") ||
      String.valueOf(eSink.getCause).contains("positive"))
    // UNSET drops; the insert then lands
    spark.sql("ALTER TABLE ckc.db.t UNSET TBLPROPERTIES " +
      "('delta.constraints.positive')")
    spark.sql("INSERT INTO ckc.db.t VALUES (9, -9.0)")
    assert(spark.sql("SELECT COUNT(*) FROM ckc.db.t")
      .head().getLong(0) == 8L)
    // arbitrary properties stay refused
    intercept[Exception] {
      spark.sql("ALTER TABLE ckc.db.t SET TBLPROPERTIES " +
        "('foo' = 'bar')")
    }
  }
}
