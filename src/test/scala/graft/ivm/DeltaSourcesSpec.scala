package graft.ivm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Error paths of the incremental-source resolution layer: clear messages
  * are part of the contract (the reference dies opaquely at physical
  * planning instead, `mod.rs:187`).
  */
class DeltaSourcesSpec extends AnyFunSuite with SparkFixture {

  test("unregistered table fails with the table name in the message") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
    df.createOrReplaceTempView("no_such_delta_source")
    val e = intercept[UnsupportedOperationException] {
      Ivm.delta(spark.table("no_such_delta_source")).collect()
    }
    assert(e.getMessage.contains("no_such_delta_source"), e.getMessage)
  }

  test("delta predicate naming a missing column fails with column context") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
    df.createOrReplaceTempView("bad_pred_table")
    DeltaSources.register("bad_pred_table", "not_a_column % 2 = 0")
    val e = intercept[UnsupportedOperationException] {
      Ivm.delta(spark.table("bad_pred_table")).collect()
    }
    assert(e.getMessage.contains("not_a_column"), e.getMessage)
  }

  test("register overrides and predicateFor parses to an expression") {
    DeltaSources.register("prop_probe", "k > 5")
    assert(DeltaSources.tables.contains("prop_probe"))
    assert(DeltaSources.predicateFor("prop_probe").get.sql.contains("5"))
    assert(DeltaSources.predicateFor("never_registered_xyz").isEmpty)
  }

  test("empty delta: predicate matching nothing yields empty delta, full base") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    df.createOrReplaceTempView("empty_delta_t")
    DeltaSources.register("empty_delta_t", "k > 1000000")
    assert(Ivm.delta(spark.table("empty_delta_t")).count() == 0)
    assert(Ivm.baseOf(spark.table("empty_delta_t")).count() == 2)
    // identity trivially holds: Q(full) − Q(base) = ∅
    val q = spark.table("empty_delta_t").select("k")
    assert(Ivm.delta(q).count() == 0)
  }

  test("delta of a registered table under a user alias still resolves") {
    import spark.implicits._
    val df = Seq((2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "v")
    df.createOrReplaceTempView("alias_base")
    DeltaSources.register("alias_base", "k % 2 = 0")
    val n = Ivm.delta(spark.table("alias_base").alias("ab")).count()
    assert(n == 2, s"expected the two even-key delta rows, got $n")
  }
}
