package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ivm.Ivm

/** One declared query: the Spark (DataFrame-API) implementation plus, where
  * SQL-expressible, the equivalent DuckDB oracle SQL the driver hash-compares
  * against (SURVEY.md §2 consolidated inventory).
  *
  * Determinism rules (SURVEY.md §7.5) applied throughout:
  *   - every query ends in a total ORDER BY;
  *   - fp aggregates go through DECIMAL(18,2) then back to DOUBLE so both
  *     engines compute the exact same value bit-for-bit;
  *   - computed integers are cast to BIGINT on both sides (Spark `length`/
  *     `rank`/`year` return INT, DuckDB returns BIGINT/HUGEINT);
  *   - raw `events.ts` (parquet ns) is never output directly — only DATE /
  *     BIGINT derivations that survive Spark's ns→µs truncation.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The relational query surface: the operators the reference exercises
  * through its embedded engine (SURVEY.md §2B — Spark built-ins, zero custom
  * code) and the six IVM delta queries over the reference's own rewrite
  * (§2A, driven through [[graft.ivm.Ivm.delta]]).
  *
  * Scale notes are per-query; the common ones: parquet scans prune columns
  * and push filters (datasource V1 path), small dims broadcast-join
  * automatically, aggregations are partial (map-side) before the shuffle,
  * and the final ORDER BY is a range-partitioned sort that AQE sizes.
  */
object Queries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact decimal sum of a money/measure double, returned as DOUBLE —
    * identical bits in Spark and DuckDB regardless of summation order.
    */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  val all: Seq[QueryDef] = Seq(

    // ---- §2B inherited relational surface (Spark built-ins) ----

    QueryDef("scan",
      (s, d) => t(s, d, "nation").orderBy("n_nationkey"),
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
             |ORDER BY n_nationkey""".stripMargin)),

    QueryDef("projection",
      (s, d) => t(s, d, "customer").select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef("filter",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") >= 30 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem WHERE l_quantity >= 30 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // nation is tiny → Spark auto-broadcasts; at 100 TB the same code
    // broadcast-joins any dim under the threshold and AQE converts larger
    // shuffles to broadcast when the runtime size allows.
    QueryDef("join_inner",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"), "inner")
        .select(col("c_custkey"), col("c_name"),
          col("n_name").as("nation_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, n_name AS nation_name
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef("cross_join",
      (s, d) => t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey"),
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region CROSS JOIN nation
             |ORDER BY r_regionkey, n_nationkey""".stripMargin)),

    QueryDef("union_all",
      (s, d) => {
        val o = t(s, d, "orders")
        o.filter(col("o_totalprice") > 200000)
          .select(col("o_orderkey"), lit("hi").as("band"))
          .union(o.filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), lit("F").as("band")))
          .orderBy("o_orderkey", "band")
      },
      Some("""SELECT o_orderkey, 'hi' AS band FROM orders WHERE o_totalprice > 200000
             |UNION ALL
             |SELECT o_orderkey, 'F' AS band FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY o_orderkey, band""".stripMargin)),

    // TPC-H Q1 shape: partial (map-side) agg before the 2-key shuffle; at
    // 100 TB this is the canonical scale-out aggregation.
    QueryDef("agg_group",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  COUNT(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("distinct",
      (s, d) => t(s, d, "customer")
        .select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey"),
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
             |ORDER BY c_mktsegment, c_nationkey""".stripMargin)),

    // orderBy+limit plans as TakeOrderedAndProject — top-k per partition
    // then k-merge on the driver, no full sort/shuffle of the table.
    QueryDef("sort_limit",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin)),

    QueryDef("window_rank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        t(s, d, "customer")
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            rank().over(w).cast("long").as("rk"))
          .filter(col("rk") <= 3)
          .orderBy("c_nationkey", "rk", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, rk FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    CAST(rank() OVER (PARTITION BY c_nationkey
             |      ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rk
             |  FROM customer) WHERE rk <= 3
             |ORDER BY c_nationkey, rk, c_custkey""".stripMargin)),

    // String/date/decimal scalar mix — all codegen'd built-ins, no UDFs.
    QueryDef("scalar_funcs",
      (s, d) => t(s, d, "orders")
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("pri_up"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * lit(BigDecimal("0.90")))
            .cast("double").as("discounted"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  UPPER(o_orderpriority) AS pri_up,
             |  o_orderstatus || '-' || o_orderpriority AS tag,
             |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
             |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.90 AS DECIMAL(3,2)) AS DOUBLE) AS discounted
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- §2A IVM delta queries (graft.ivm) ----
    // Split model (DeltaSources): orders δ = o_orderdate >= 2001-01-01,
    // customer δ = c_custkey%10=0, nation δ = n_nationkey%5=0,
    // region δ = r_regionkey%2=0. Oracle SQL states the same split inline.

    QueryDef("delta_scan",
      (s, d) => Ivm.delta(t(s, d, "orders")).orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |  o_orderdate, o_orderpriority
             |FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
             |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("delta_projection",
      (s, d) => Ivm.delta(
          t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
             |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("delta_filter",
      (s, d) => Ivm.delta(
          t(s, d, "orders")
            .filter(col("o_orderstatus") === "O")
            .select("o_orderkey", "o_orderstatus", "o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
             |FROM orders WHERE o_orderstatus = 'O'
             |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
             |ORDER BY o_orderkey""".stripMargin)),

    // Flagship: 3-arm union expansion. The arms are disjoint (δ vs base
    // partitions), so δQ equals the join rows where at least one side is in
    // its delta — which is how the oracle states it.
    QueryDef("delta_join",
      (s, d) => Ivm.delta(
          t(s, d, "customer")
            .join(t(s, d, "nation"),
              col("c_nationkey") === col("n_nationkey"), "inner")
            .select(col("c_custkey"), col("c_name"),
              col("n_name").as("nation_name")))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, n_name AS nation_name
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE (c_custkey % 10 = 0) OR (n_nationkey % 5 = 0)
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef("delta_cross_join",
      (s, d) => Ivm.delta(
          t(s, d, "region").crossJoin(t(s, d, "nation"))
            .select("r_regionkey", "r_name", "n_nationkey", "n_name"))
        .orderBy("r_regionkey", "n_nationkey"),
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region CROSS JOIN nation
             |WHERE (r_regionkey % 2 = 0) OR (n_nationkey % 5 = 0)
             |ORDER BY r_regionkey, n_nationkey""".stripMargin)),

    QueryDef("delta_union",
      (s, d) => {
        val o = t(s, d, "orders")
        Ivm.delta(
          o.filter(col("o_totalprice") > 200000)
            .select(col("o_orderkey"), lit("hi").as("band"))
            .union(o.filter(col("o_orderstatus") === "F")
              .select(col("o_orderkey"), lit("F").as("band"))))
          .orderBy("o_orderkey", "band")
      },
      Some("""SELECT o_orderkey, 'hi' AS band FROM orders
             |WHERE o_totalprice > 200000
             |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
             |UNION ALL
             |SELECT o_orderkey, 'F' AS band FROM orders
             |WHERE o_orderstatus = 'F'
             |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
             |ORDER BY o_orderkey, band""".stripMargin))
  )

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
