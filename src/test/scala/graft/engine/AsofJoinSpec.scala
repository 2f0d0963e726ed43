package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Semantics of the merge-form as-of join: inclusive (<=) match, latest
  * right row wins, tie-break by rightOrd, null when nothing precedes.
  */
class AsofJoinSpec extends AnyFunSuite with SparkFixture {

  test("asof: latest <= match per key, null when nothing precedes") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100L, 1.0), (1L, 15L, 101L, 2.0),
        (2L, 50L, 102L, 3.0))
      .toDF("k", "ts", "rid", "rv")
    val out = AsofJoin.asof(left, right, "k", "ts", "ts",
        Seq("rid", "rv"), rightOrd = Some("rid"))
      .orderBy("ts", "k").collect()
    // (2,5): right row at 50 is in the future → null
    assert(out(0).getString(2) == "l3" && out(0).isNullAt(3))
    // (1,10): equal timestamp is a match (inclusive)
    assert(out(1).getString(2) == "l1" && out(1).getLong(3) == 100L)
    // (1,20): the LATEST preceding right row (15), not the first
    assert(out(2).getString(2) == "l2" && out(2).getLong(3) == 101L
      && out(2).getDouble(4) == 2.0)
  }

  test("asof: ties among right rows break by rightOrd, latest wins") {
    import spark.implicits._
    val left = Seq((1L, 20L)).toDF("k", "ts")
    val right = Seq((1L, 15L, 7L, "first"), (1L, 15L, 9L, "second"))
      .toDF("k", "ts", "rid", "rv")
    val out = AsofJoin.asof(left, right, "k", "ts", "ts",
      Seq("rid", "rv"), rightOrd = Some("rid")).collect()
    assert(out.head.getLong(2) == 9L && out.head.getString(3) == "second")
  }

  test("asof: payload fields never mix across right rows (atomic carry)") {
    import spark.implicits._
    // the matched (latest) right row has a NULL payload field; per-column
    // carry-forward would stitch rv=5.0 from the OLDER row onto rid=101
    val left = Seq((1L, 30L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Option(100L), Option(5.0)),
        (1L, 20L, Option(101L), Option.empty[Double]))
      .toDF("k", "ts", "rid", "rv")
    val out = AsofJoin.asof(left, right, "k", "ts", "ts",
      Seq("rid", "rv")).collect()
    assert(out.head.getLong(2) == 101L && out.head.isNullAt(3),
      s"payload stitched across rows: ${out.head}")
  }

  test("asof: payload name collision is rejected") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      AsofJoin.asof(df, df.withColumn("k2", col("k")), "k", "ts", "ts", Seq("ts"))
    }
  }
}
