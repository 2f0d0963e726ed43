package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Shallow clones: a zero-copy table whose adds reference the source's
  * files absolutely — content equal at clone time, pinned against
  * later source commits, stats/pruning intact, deletion vectors
  * re-anchored to the source root, and a vacuumed source breaking the
  * clone LOUDLY (the documented hazard).
  */
class DeltaShallowCloneSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_clone_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("clone reads the source's content zero-copy; later source " +
      "appends do NOT leak into the clone") {
    val src = freshDir("src")
    DeltaLake.stageCommit(spark, src, frame(1 to 20), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, src, frame(21 to 40), Seq.empty, 1L)
    val clone = freshDir("dst")
    DeltaLake.stageShallowClone(spark, clone, src)
    assert(ids(DeltaLake.snapshot(spark, clone)) == (1L to 40L).toSet)
    // zero-copy: the clone dir holds no parquet of its own
    assert(!new java.io.File(clone).listFiles()
      .exists(_.getName.endsWith(".parquet")))
    // pinned: a later source commit is invisible to the clone
    DeltaLake.stageCommit(spark, src, frame(41 to 50), Seq.empty, 2L)
    assert(ids(DeltaLake.snapshot(spark, clone)) == (1L to 40L).toSet)
    // the clone accepts its own appends without touching the source
    DeltaLake.stageCommit(spark, clone, frame(100 to 104), Seq.empty, 1L)
    assert(ids(DeltaLake.snapshot(spark, clone)) ==
      (1L to 40L).toSet ++ (100L to 104L))
    assert(ids(DeltaLake.snapshot(spark, src)) == (1L to 50L).toSet)
  }

  test("stats ride the clone: a range predicate prunes the source's " +
      "files at the clone's index") {
    val src = freshDir("sk_src")
    DeltaLake.stageCommit(spark, src, frame(1 to 20), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, src, frame(100 to 120), Seq.empty, 1L)
    val clone = freshDir("sk_dst")
    DeltaLake.stageShallowClone(spark, clone, src)
    val q = DeltaLake.snapshot(spark, clone).filter(col("id") >= 100L)
    val qe = q.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution
    assert(q.collect().map(_.getLong(0)).toSet == (100L to 120L).toSet)
    val numFiles = qe.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    assert(numFiles == 1, s"stats must prune the low file: $numFiles")
  }

  test("deletion vectors survive the clone (re-anchored to the " +
      "source root); a vacuumed source fails the clone loudly") {
    val src = freshDir("dv_src")
    DeltaLake.stageCommit(spark, src, frame(1 to 30), Seq.empty, 0L)
    DeltaLake.stageDvDeleteCommit(spark, src, col("id") % 5 === 0, 1L,
      inline = false)
    val clone = freshDir("dv_dst")
    DeltaLake.stageShallowClone(spark, clone, src)
    assert(ids(DeltaLake.snapshot(spark, clone)) ==
      (1L to 30L).filterNot(_ % 5 == 0).toSet,
      "the clone must apply the source's deletion vectors")
    // vacuum hazard: deleting a source data file breaks the clone
    // LOUDLY, never an empty split
    val victim = new java.io.File(DeltaLake.snapshot(spark, src)
      .inputFiles.head.stripPrefix("file:"))
    assert(victim.delete())
    val e = intercept[Exception] {
      DeltaLake.snapshot(spark, clone).collect()
    }
    assert(e.toString.toLowerCase.contains("exist") ||
      e.toString.contains("FileNotFound"), e.toString)
  }
}
