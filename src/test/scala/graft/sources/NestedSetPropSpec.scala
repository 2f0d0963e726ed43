package graft.sources

import org.apache.spark.sql.functions.{col, struct}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Property-style test for nested-field SET: randomized member
  * assignments over a two-level struct, executed through the SQL
  * UPDATE bridge (withField rebuild) and checked against a
  * first-principles expectation computed row-by-row on the driver.
  * The property: exactly the assigned members change on exactly the
  * matched rows; every other member and row is carried verbatim.
  * Seeded PRNG keeps runs deterministic.
  */
class NestedSetPropSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private val Cases = 6

  test("randomized nested SET: assigned members change on matched " +
      "rows, everything else is carried verbatim") {
    val rnd = new scala.util.Random(20260816L)
    val wh = java.nio.file.Files
      .createTempDirectory("graft_nsp_wh").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.nsp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.nsp.warehouse", wh)
    (1 to Cases).foreach { c =>
      val n = 4 + rnd.nextInt(8)
      val rows = (1 to n).map(i =>
        (i.toLong, rnd.nextInt(100).toLong, s"s${rnd.nextInt(10)}",
          rnd.nextInt(100).toLong))
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_nsp_$c").toFile.getAbsolutePath
      DeltaLake.write(spark, dir,
        rows.toDF("id", "a", "b", "c")
          .select(col("id"), struct(col("a"), col("b"),
            struct(col("c")).as("inner")).as("s")).coalesce(1))
      GraftCatalog.register(spark, wh, s"db.t$c", "graft-deltalake", dir)
      // random subset of {s.a, s.b, s.inner.c} assigned, random
      // modulo predicate
      val m = 2 + rnd.nextInt(3)
      val setA = rnd.nextBoolean()
      val setB = rnd.nextBoolean()
      val setC = rnd.nextBoolean() || (!setA && !setB)
      val assigns = Seq(
        if (setA) Some("s.a = s.a + 1000") else None,
        if (setB) Some("s.b = concat(s.b, '!')") else None,
        if (setC) Some("s.inner.c = s.inner.c * 2") else None
      ).flatten.mkString(", ")
      spark.sql(s"UPDATE nsp.db.t$c SET $assigns WHERE id % $m = 0")
      val got = spark.sql(
        s"SELECT id, s.a, s.b, s.inner.c FROM nsp.db.t$c ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getString(2), r.getLong(3))).toSeq
      val expected = rows.map { case (id, a, b, cc) =>
        val hit = id % m == 0
        (id,
          if (hit && setA) a + 1000 else a,
          if (hit && setB) b + "!" else b,
          if (hit && setC) cc * 2 else cc)
      }
      assert(got == expected,
        s"case $c (m=$m setA=$setA setB=$setB setC=$setC):\n" +
          s"got      $got\nexpected $expected")
    }
  }
}
