package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Semantics of the bin-bucketed range join: exactly the naive theta-join
  * pairs (inclusive bounds), each pair exactly once — including the
  * boundary cases the bin trick must not double-count (same bin, adjacent
  * bins, exact window-width separation).
  */
class RangeJoinSpec extends AnyFunSuite with SparkFixture {

  test("within == naive theta join on randomized times, pairs unique") {
    import spark.implicits._
    // deterministic pseudo-random times via a hash mix; includes same-time
    // rows and exact multiples of the window for boundary coverage
    val n = 500
    val W = 100L
    val rows = (0 until n).map { i =>
      val t = math.abs(i * 2654435761L % 997) + (if (i % 7 == 0) 0L else i % 3 * W)
      (i.toLong % 13, i.toLong, t)
    }
    val l = rows.toDF("k", "lid", "t1")
    val r = rows.toDF("k", "rid", "t2")
    val fast = RangeJoin.within(l, r, "k", "t1", "t2", W)
      .select("k", "lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val naive = l.join(r.withColumnRenamed("k", "k2"),
        col("k") === col("k2") &&
          col("t2") >= col("t1") && col("t2") <= col("t1") + W)
      .select("k", "lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(fast.size == fast.distinct.size,
      "bin expansion double-counted a pair")
    assert(fast.sorted == naive.sorted,
      s"pair sets differ: fast=${fast.size} naive=${naive.size}")
  }

  test("inclusive bounds: zero separation and exact window separation match") {
    import spark.implicits._
    val l = Seq((1L, 0L, 200L)).toDF("k", "lid", "t1")
    val r = Seq((1L, 10L, 200L), (1L, 11L, 300L), (1L, 12L, 301L),
        (1L, 13L, 199L)).toDF("k", "rid", "t2")
    val got = RangeJoin.within(l, r, "k", "t1", "t2", 100L)
      .select("rid").collect().map(_.getLong(0)).sorted.toSeq
    // 200 (dt=0) and 300 (dt=W) qualify; 301 (dt>W) and 199 (before) do not
    assert(got == Seq(10L, 11L))
  }

  test("window must be positive") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L)).toDF("k", "lid", "t1")
    intercept[IllegalArgumentException] {
      RangeJoin.within(df, df.toDF("k", "rid", "t2"), "k", "t1", "t2", 0L)
    }
  }

  test("backquote-needing names and fractional times bin correctly") {
    import spark.implicits._
    // column names with spaces/dots would break a string-interpolated bin
    // expression; fractional times exercise the explicit long cast
    // (truncation = floor on the non-negative domain)
    val l = Seq((1L, 0L, 199.5)).toDF("k", "lid", "l time")
    val r = Seq((1L, 10L, 199.5), (1L, 11L, 299.5), (1L, 12L, 300.0))
      .toDF("k", "rid", "r time")
    val got = RangeJoin.within(l, r, "k", "l time", "r time", 100L)
      .select("rid").collect().map(_.getLong(0)).sorted.toSeq
    // dt = 0 and dt = 100 qualify; dt = 100.5 does not
    assert(got == Seq(10L, 11L), s"got $got")
  }

  test("column-name contract is enforced, not silently broken") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L)).toDF("k", "lid", "t1")
    // overlapping non-key column name
    intercept[IllegalArgumentException] {
      RangeJoin.within(df, Seq((1L, 2L, 2L)).toDF("k", "lid", "t2"),
        "k", "t1", "t2", 10L)
    }
    // same time-column name on both sides
    intercept[IllegalArgumentException] {
      RangeJoin.within(df, Seq((1L, 2L, 2L)).toDF("k", "rid", "t1"),
        "k", "t1", "t1", 10L)
    }
  }
}
