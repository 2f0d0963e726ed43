package graft.engine

import org.apache.spark.sql.{classic, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Scale join techniques: salted skew joins return exactly the plain-join
  * rows; bucketed tables co-locate a join with zero shuffle exchanges.
  */
class JoinsSpec extends AnyFunSuite with SparkFixture {

  test("saltedJoin is row-identical to the plain inner join") {
    val li = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
    val part = Tables(spark, sfDir, "part").select("p_partkey", "p_brand")
    val plain = li.join(part, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "p_brand")
    val salted = Joins.saltedJoin(li, part, "l_partkey", "p_partkey", 8)
      .select("l_orderkey", "p_brand")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin spreads a pathologically hot key across shards") {
    import spark.implicits._
    // one key owns 99% of the big side — the case AQE splitting can't fix
    val big = (Seq.fill(9900)(1L) ++ (2L to 101L)).toDF("k")
    val small = Seq((1L, "hot"), (2L, "cold")).toDF("k2", "tag")
    val out = Joins.saltedJoin(big, small, "k", "k2", 16)
    assert(out.count() == 9900 + 1) // 9900 hot matches + key 2
  }

  test("bucketed tables co-locate the join: zero shuffle exchanges") {
    val whDir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables(spark, sfDir, "orders")
      val customer = Tables(spark, sfDir, "customer")
      orders.write.format("parquet")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$whDir/b_orders").mode("overwrite")
        .saveAsTable("b_orders")
      customer.write.format("parquet")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$whDir/b_customer").mode("overwrite")
        .saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      val plan = joined.asInstanceOf[classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        orders.join(customer, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
