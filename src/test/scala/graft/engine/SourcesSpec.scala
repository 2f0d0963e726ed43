package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.classic
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** File-format sources/sinks (the surface the reference lacks entirely —
  * it only has MemTable): CSV and JSON round-trips preserve data, and a
  * partition-layout write prunes partitions at read time (the testdata is
  * unpartitioned, so this scale-critical path needs its own fixture).
  */
class SourcesSpec extends AnyFunSuite with SparkFixture {

  private lazy val dir = Files.createTempDirectory("graft_sources").toString

  private def nation = Tables(spark, sfDir, "nation")

  test("CSV sink/source round-trip preserves rows (schema re-applied)") {
    val path = s"$dir/nation_csv"
    nation.write.mode("overwrite").option("header", "true").csv(path)
    val back = spark.read.option("header", "true")
      .schema(nation.schema).csv(path)
    assert(back.count() == nation.count())
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("JSON sink/source round-trip preserves rows") {
    val path = s"$dir/nation_json"
    nation.write.mode("overwrite").json(path)
    val back = spark.read.schema(nation.schema).json(path)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("ORC sink/source round-trip preserves rows and pushes filters") {
    val path = s"$dir/orders_orc"
    val orders = Tables(spark, sfDir, "orders")
    orders.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    // predicate pushdown reaches the ORC reader like parquet's
    val p = back.filter(col("o_totalprice") > 200000)
      .asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(o_totalprice"),
      s"ORC pushdown missing:\n$p")
  }

  test("partitioned parquet write prunes partitions at read time") {
    val path = s"$dir/orders_part"
    val orders = Tables(spark, sfDir, "orders")
      .withColumn("status", col("o_orderstatus"))
    orders.write.mode("overwrite").partitionBy("status").parquet(path)

    val read = spark.read.parquet(path).filter(col("status") === "F")
      .select("o_orderkey")
    val plan = read.asInstanceOf[classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"partition pruning missing:\n$plan")
    assert(read.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
  }
}
