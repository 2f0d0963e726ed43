package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Randomized differential for [[Iceberg.rewriteManifests]]: under
  * SEEDED random append / merge-on-read-delete / copy-on-write-delete
  * histories, the compacted table must read identically to the
  * uncompacted one — current content, every pre-rewrite snapshot's
  * time travel, and post-rewrite appends included. This is the
  * property the sequence-number materialization exists for: a bug
  * there silently resurrects (or over-deletes) merge-on-read rows,
  * which content equality over enough random histories catches.
  */
class RewriteManifestsPropSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_rwprop_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("random append/delete histories: rewrite_manifests preserves " +
      "content, time travel, and future appends (5 seeded scenarios)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919)
      val dir = freshDir(s"s$seed")
      var next = 1
      var snapIds = List.empty[Long]
      // 4-6 random operations, always starting with an append
      val nOps = 4 + rnd.nextInt(3)
      (0 until nOps).foreach { op =>
        val doAppend = op == 0 || rnd.nextInt(3) < 2
        if (doAppend) {
          val n = 5 + rnd.nextInt(10)
          System.err.println(s"[rwprop] seed=$seed op=$op append $n")
          snapIds ::= Iceberg.write(spark, dir,
            frame(next until next + n))
          next += n
        } else if (rnd.nextBoolean()) {
          val m = 2 + rnd.nextInt(4)
          val r = rnd.nextInt(m).toLong
          System.err.println(s"[rwprop] seed=$seed op=$op mor %$m=$r")
          snapIds ::= Iceberg.stageMorDelete(spark, dir,
            col("id") % m === r)
        } else {
          val m = 3 + rnd.nextInt(3)
          val r = rnd.nextInt(m).toLong
          System.err.println(s"[rwprop] seed=$seed op=$op dv %$m=$r")
          snapIds ::= Iceberg.delete(spark, dir,
            col("id") % m === r)
        }
      }
      System.err.println(s"[rwprop] seed=$seed pre-rewrite reads")
      val before = ids(Iceberg.snapshot(spark, dir))
      // a delete matching nothing may no-op without a snapshot (-1)
      val travel = snapIds.filter(_ >= 0).map(s =>
        s -> ids(Iceberg.snapshot(spark, dir, Some(s))))
      val v = Iceberg.rewriteManifests(spark, dir)
      if (v >= 0) {
        assert(ids(Iceberg.snapshot(spark, dir)) == before,
          s"seed $seed: content changed under rewrite")
        travel.foreach { case (s, expect) =>
          assert(ids(Iceberg.snapshot(spark, dir, Some(s))) == expect,
            s"seed $seed: time travel to $s changed under rewrite")
        }
        // the compacted manifest keeps its sequence scoping: a
        // POST-rewrite MoR delete must hit pre-rewrite rows, and a
        // post-rewrite append must escape PRE-rewrite delete files
        val dm = 2 + rnd.nextInt(3)
        Iceberg.stageMorDelete(spark, dir,
          col("id") % dm === (rnd.nextInt(dm).toLong))
        val afterDel = ids(Iceberg.snapshot(spark, dir))
        Iceberg.write(spark, dir, frame(next until next + 6))
        assert(ids(Iceberg.snapshot(spark, dir)) ==
          afterDel ++ (next.toLong until (next + 6).toLong),
          s"seed $seed: post-rewrite append disturbed by old deletes")
        next += 6
      }
    }
  }
}
