package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ivm.Ivm

/** Library-surface demo/smoke of the IVM API: the executed-delta identity
  * `delta(Q) == Q(full) − Q(base)`, the fail-fast envelope, and alias
  * transparency. `runMain graft.tools.IvmDemo [sfDir]`.
  */
object IvmDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val customer = Tables(spark, sfDir, "customer")
    val nation = Tables(spark, sfDir, "nation")

    // 1. fail-fast: aggregates are outside the delta envelope
    try {
      Ivm.delta(customer.groupBy("c_nationkey").count())
      println("FAILFAST: no error (BAD)")
    } catch {
      case e: UnsupportedOperationException =>
        println(s"FAILFAST OK: ${e.getMessage}")
    }

    // 2. executed identity on the join: delta(Q) == Q(full) − Q(base)
    val q = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"), "inner")
      .select(col("c_custkey"), col("n_name"))
    val full = q.count()
    val dq = Ivm.delta(q).count()
    val base = customer.filter(expr("NOT (c_custkey % 10 = 0)"))
      .join(nation.filter(expr("NOT (n_nationkey % 5 = 0)")),
        col("c_nationkey") === col("n_nationkey"), "inner")
      .count()
    println(s"IDENTITY: full=$full delta=$dq base=$base ok=${full - base == dq}")

    // 3. alias transparency: `customer AS c` resolves the customer source
    println(s"ALIAS OK: rows=${Ivm.delta(customer.as("c")).count()}")

    spark.stop()
  }
}
