package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OLAP reshaping surface beyond plain GROUP BY: pivot (long→wide),
  * cube (multi-level rollup lattice), unpivot (wide→long), and exact
  * group quantiles — the reporting-layer operators a user of the reference
  * engine reaches for next after `agg_group`/`rollup_agg`.
  *
  * Scale notes:
  *   - `pivot` is ONE hash aggregate whose map-side combine carries a fixed
  *     (|pivot values| × |metrics|) state per group — the pivot values are
  *     DECLARED, never discovered: the values-discovery form
  *     (`pivot(col)` with no list) first runs a full distinct job over the
  *     corpus and collects to the driver, which at 100 TB is a full
  *     shuffle + a driver OOM hazard.
  *   - `cube`/`grouping sets` run TWO-PHASE: a plain hash aggregate to the
  *     finest grouping set first, then the lattice Expand over that tiny
  *     partial. Spark's direct cube puts Expand UNDER the partial agg —
  *     the exchange only carries |sets| × group states, but every corpus
  *     row is still materialized |sets|× map-side before combining, ~4×
  *     the CPU of the plain agg. Re-aggregating partials is exact because
  *     the measures are decomposable (COUNT→SUM, decimal SUM→SUM).
  *   - `unpivot` runs on the already-aggregated (tiny) wide frame — free.
  *   - exact percentiles need per-group sorted values: Spark's `percentile`
  *     aggregate buffers each group's value multiset — fine for bounded
  *     groups (3 return flags); for high-cardinality value domains at
  *     100 TB, `approx_stats` (t-digest, fixed-size mergeable state) is the
  *     scale path. Both are declared so the trade-off is explicit.
  */
object Olap {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact decimal sum of a money/measure double, as DOUBLE (QueryDef fp
    * determinism rule).
    */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  private val Statuses = Seq("F", "O", "P")

  val all: Seq[QueryDef] = Seq(

    // Long→wide pivot: order counts + revenue per priority × status, with
    // the status domain declared (see scale note above).
    QueryDef("pivot_agg",
      (s, d) => {
        val wide = t(s, d, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Statuses)
          .agg(count(lit(1)).as("cnt"),
            dsum(col("o_totalprice")).as("rev"))
        val cols = col("o_orderpriority") +: Statuses.flatMap(v => Seq(
          coalesce(col(s"${v}_cnt"), lit(0L)).as(s"cnt_${v.toLowerCase}"),
          col(s"${v}_rev").as(s"rev_${v.toLowerCase}")))
        wide.select(cols: _*).orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority,
             |${Statuses.map(v =>
                 s"""  COUNT(*) FILTER (WHERE o_orderstatus = '$v') AS cnt_${v.toLowerCase},
                    |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    |    FILTER (WHERE o_orderstatus = '$v') AS DOUBLE) AS rev_${v.toLowerCase}"""
                   .stripMargin).mkString(",\n")}
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Full cube lattice over (returnflag, linestatus); grouping_id
    // disambiguates subtotal rows (same bit encoding in both engines:
    // bit set ⇔ that key is rolled up). Two-phase plan: aggregate to the
    // finest grouping set FIRST (6 groups — one plain hash agg, map-side
    // combined), then cube the TINY partial. Spark's direct cube puts
    // Expand under the partial agg, materializing every corpus row
    // |sets|× map-side before combining — 4× the CPU of agg_group on the
    // same table; here Expand runs over 6 rows. Decomposability is the
    // same partial-merge algebra IvmAgg uses: COUNT → SUM of partial
    // counts, decimal SUM → SUM of partial sums (exact; cast to double
    // only at the end).
    QueryDef("cube_agg",
      (s, d) => {
        val base = t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("pcnt"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).as("pqty"))
        base.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("long").as("gid"),
            sum(col("pcnt")).as("cnt"),
            sum(col("pqty")).cast("double").as("sum_qty"))
          .select("l_returnflag", "l_linestatus", "gid", "cnt", "sum_qty")
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin)),

    // Wide→long unpivot of a per-flag metrics frame: (flag, metric, value)
    // rows — the melt that feeds generic metric sinks/dashboards.
    QueryDef("unpivot_long",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_discount")).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy("l_returnflag", "metric"),
      Some("""WITH wide AS (
             |  SELECT l_returnflag,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, metric, value FROM (
             |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
             |  UNION ALL
             |  SELECT l_returnflag, 'sum_price', sum_price FROM wide
             |  UNION ALL
             |  SELECT l_returnflag, 'sum_disc', sum_disc FROM wide)
             |ORDER BY l_returnflag, metric""".stripMargin)),

    // Distribution window functions: quartile bucket, percent_rank,
    // cume_dist — exact integer-ratio doubles (same operands, same IEEE
    // division in both engines; the unique order key removes tie
    // ambiguity). One window shuffle over the filtered rows.
    QueryDef("window_dist",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
        t(s, d, "orders").filter(col("o_totalprice") > 450000)
          .select(col("o_orderstatus"), col("o_orderkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy("o_orderstatus", "o_orderkey")
      },
      Some("""SELECT o_orderstatus, o_orderkey,
             |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
             |  PERCENT_RANK() OVER w AS pr,
             |  CUME_DIST() OVER w AS cd
             |FROM orders WHERE o_totalprice > 450000
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
             |ORDER BY o_orderstatus, o_orderkey""".stripMargin)),

    // Exact per-group quantiles of l_quantity (integer-valued, so the
    // linear interpolation at .25/.5/.75 is bit-exact in both engines —
    // a continuous-valued measure could differ in the last ulp between
    // interpolation formulas; that case belongs to approx_stats).
    QueryDef("agg_quantiles",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          percentile(col("l_quantity"), lit(0.25)).as("q25"),
          percentile(col("l_quantity"), lit(0.5)).as("q50"),
          percentile(col("l_quantity"), lit(0.75)).as("q75"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(*) AS cnt,
             |  quantile_cont(l_quantity, 0.25) AS q25,
             |  quantile_cont(l_quantity, 0.5) AS q50,
             |  quantile_cont(l_quantity, 0.75) AS q75
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Arbitrary GROUPING SETS — two DISJOINT single-key sets, the shape
    // neither rollup (prefix lattice) nor cube (full lattice) can express.
    // Same two-phase plan as cube_agg: one plain hash agg to the finest
    // (returnflag, linestatus) partial, then the grouping-sets Expand over
    // the 6-row partial instead of the corpus. grouping_id over
    // (returnflag, linestatus) disambiguates which set a row belongs to
    // (bit set ⇔ key rolled up; same encoding both engines).
    QueryDef("grouping_sets",
      (s, d) => {
        val base = t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("pcnt"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).as("pqty"))
        base.groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("long").as("gid"),
            sum(col("pcnt")).as("cnt"),
            sum(col("pqty")).cast("double").as("sum_qty"))
          .select("l_returnflag", "l_linestatus", "gid", "cnt", "sum_qty")
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin))
  )
}
