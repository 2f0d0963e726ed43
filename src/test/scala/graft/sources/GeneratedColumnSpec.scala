package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** GENERATED columns, computed/validated (formerly refused wholesale):
  * [[DeltaLake.withGeneratedColumn]] stamps the generation expression
  * at creation; [[DeltaLake.write]] COMPUTES the column when a batch
  * omits it and VALIDATES batch-provided values (null-safe equality,
  * riding the same row-check pass as CHECK constraints); DML outputs
  * validate everywhere. The lakehouse pattern this exists for — a
  * date partition generated from a timestamp — prunes like any
  * physical partition column.
  */
class GeneratedColumnSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_gen_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, java.sql.Timestamp.valueOf(
      s"2024-01-${(i % 27) + 1}%02d 10:00:00".replace("%02d", "")),
      i * 1.0)).toDF("id", "ts", "v").coalesce(1)

  test("creation with a generated date column: omitted batches " +
      "compute it, provided-and-wrong batches refuse, the partition " +
      "prunes") {
    val dir = freshDir("gen")
    val base = (1 to 20).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-${(i % 5) + 1}%02d 10:00:00"),
      i * 1.0)).toDF("id", "ts", "v").coalesce(1)
    DeltaLake.write(spark, dir,
      DeltaLake.withGeneratedColumn(base, "d", "CAST(ts AS DATE)"),
      partitionBy = Seq("d"))
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.count() == 20)
    assert(snap.filter(col("d") =!= col("ts").cast("date")).count() == 0)
    // the generation expression persisted in the table schema
    assert(snap.schema("d").metadata
      .contains("delta.generationExpression"))
    // an appended batch OMITTING d: computed
    DeltaLake.write(spark, dir,
      Seq((21L, java.sql.Timestamp.valueOf("2024-02-01 10:00:00"), 1.0))
        .toDF("id", "ts", "v"))
    assert(DeltaLake.snapshot(spark, dir)
      .filter(col("d") === "2024-02-01").count() == 1)
    // a batch PROVIDING a wrong d: refused whole
    val e = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, dir,
        Seq((22L, java.sql.Timestamp.valueOf("2024-02-02 10:00:00"),
          1.0, java.sql.Date.valueOf("1999-01-01")))
          .toDF("id", "ts", "v", "d"))
    }
    assert(e.getMessage.contains("generated:d"), e.getMessage)
    assert(DeltaLake.snapshot(spark, dir).count() == 21)
    // partition pruning on the generated column
    val planned = DeltaLake.snapshotWhere(spark, dir,
      col("d") === java.sql.Date.valueOf("2024-02-01"))
      .inputFiles.length
    assert(planned == 1,
      s"generated partition column did not prune: $planned files")
  }

  test("DML recomputes generated values: an UPDATE touching a " +
      "generation input recomputes the generated column (the " +
      "reference behavior); explicit wrong values still refuse") {
    val dir = freshDir("gendml")
    val base = (1 to 6).map(i => (i.toLong, i * 10.0))
      .toDF("id", "v").coalesce(1)
    DeltaLake.write(spark, dir,
      DeltaLake.withGeneratedColumn(base, "v2", "v * 2"))
    // SET on the input alone: v2 recomputes, untouched rows keep
    // their stored value
    DeltaLake.update(spark, dir, col("id") === 3L,
      Map("v" -> org.apache.spark.sql.functions.lit(999.0)))
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.filter(col("id") === 3L).select("v2").head()
      .getDouble(0) == 1998.0, "generated column must recompute")
    assert(snap.filter(col("id") === 2L).select("v2").head()
      .getDouble(0) == 40.0)
    // an EXPLICIT wrong value on the generated column refuses
    intercept[IllegalArgumentException] {
      DeltaLake.update(spark, dir, col("id") === 4L,
        Map("v" -> org.apache.spark.sql.functions.lit(1.0),
          "v2" -> org.apache.spark.sql.functions.lit(777.0)))
    }
    // explicit CONSISTENT values land (validated, not recomputed)
    DeltaLake.update(spark, dir, col("id") === 4L,
      Map("v" -> org.apache.spark.sql.functions.lit(5.0),
        "v2" -> org.apache.spark.sql.functions.lit(10.0)))
    assert(DeltaLake.snapshot(spark, dir)
      .filter(col("id") === 4L).select("v2").head().getDouble(0)
      == 10.0)
    // MERGE: the canonical upsert recomputes from the matched row's
    // post-image instead of trusting the source's stale copy
    val src = Seq((3L, 50.0, -1.0)).toDF("id", "v", "v2").coalesce(1)
    DeltaLake.merge(spark, dir, src, Seq("id"))
    assert(DeltaLake.snapshot(spark, dir)
      .filter(col("id") === 3L).select("v2").head().getDouble(0)
      == 100.0, "merge must recompute the generated column")
    // mergeGeneral: a conditional SET on the input recomputes too
    import graft.sources.MergeActions._
    DeltaLake.mergeGeneral(spark, dir,
      Seq(5L).toDF("id").coalesce(1), Seq("id"),
      matched = Seq(MatchedUpdate(None,
        Some(Map("v" -> org.apache.spark.sql.functions.lit(7.0))))))
    assert(DeltaLake.snapshot(spark, dir)
      .filter(col("id") === 5L).select("v2").head().getDouble(0)
      == 14.0, "mergeGeneral must recompute the generated column")
  }
}
