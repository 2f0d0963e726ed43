package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSql
import org.apache.spark.sql.types.LongType

/** Bounded-interval (range) join: pairs of rows sharing a key whose times
  * are within a fixed window of each other — the temporal-neighborhood
  * primitive behind co-occurrence, attribution, and proximity features.
  *
  * A naive `rTime BETWEEN lTime AND lTime + W` theta join has no equality
  * key, so Spark plans a (broadcast) nested-loop join — quadratic per key
  * and a 100 TB non-starter. This operator restores an equi-join by
  * BUCKETING the time axis into window-width bins: both sides are keyed by
  * `(key, time div W)`, the left side is expanded to its own bin and the
  * next one (a pair within W spans at most adjacent bins, and lands in
  * exactly ONE of the two left copies — so no post-join de-duplication is
  * needed), and the exact interval predicate is verified after the join.
  * Cost: 2× replication of the left rows buys an all-equi-key shuffle join
  * that AQE can split on skewed (key, bin) buckets.
  *
  * Contract: `lTime`/`rTime` are non-negative numeric columns in the same
  * unit (binning casts to long, and truncation toward zero is floor only
  * for non-negative values), named differently; all other column names must
  * be disjoint between the two sides; `key` is the shared equality column
  * name.
  */
object RangeJoin {

  /** Rows of `left` × `right` with `right.rTime` in `[lTime, lTime + window]`
    * and equal `key`, as one row per qualifying pair carrying both sides'
    * columns (the shared `key` column once). Null keys and null times
    * produce no pairs (equi-join / comparison semantics), matching the
    * naive theta join.
    */
  def within(left: DataFrame, right: DataFrame, key: String,
      lTime: String, rTime: String, window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    require(lTime != rTime,
      "lTime and rTime must be named differently (both survive the join)")
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint between the sides, overlap: $overlap")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "__bin is reserved by RangeJoin")
    val probe = left.withColumn("__bin",
      explode(array(bin(col(lTime), window), bin(col(lTime), window) + lit(1L))))
    val build = right.withColumn("__bin", bin(col(rTime), window))
    probe.join(build, Seq(key, "__bin"))
      .filter(col(rTime) >= col(lTime) &&
        col(rTime) <= col(lTime) + lit(window))
      .drop("__bin")
  }

  /** `time div window` as a Column-API expression — no string
    * interpolation, so column names needing backquotes are safe, and the
    * explicit long cast keeps the integral-divide operand contract for
    * fractional time columns (truncation toward zero = floor for the
    * documented non-negative domain, and the exact interval predicate is
    * re-verified on the original values after the join either way).
    */
  private def bin(time: Column, window: Long): Column =
    GraftSql.column(IntegralDivide(
      GraftSql.expression(time.cast(LongType)), Literal(window)))
}
