package graft.ivm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graft.GraftSql

/** Public API for incremental view maintenance (the reference's novel
  * capability, `src/delta_node.rs` + `src/optimizer_rules/mod.rs`).
  *
  * `Ivm.delta(df)` marks a query's analyzed plan with [[PosDelta]], applies
  * the delta-propagation rewrite + incremental-source resolution, and
  * re-wraps the result as a DataFrame. The returned plan contains only
  * standard operators, so the full Catalyst optimizer (pushdown, pruning,
  * join selection, AQE) runs on it — unlike the reference, whose tests run
  * the custom rule *instead of* the stock optimizer.
  */
object Ivm {

  /** Inserts-only delta of the given query, per the registered
    * [[DeltaSources]] split model.
    */
  def delta(df: Dataset[_]): DataFrame = {
    val spark = df.sparkSession
    val marked = PosDelta(GraftSql.analyzed(df))
    val rewritten = ResolvePosDeltaScan(PosDeltaRule(marked))
    GraftSql.ofRows(spark, rewritten)
  }

  /** Mark only (no rewrite) — for plan-shape tests mirroring the reference. */
  def mark(df: Dataset[_]): PosDelta = PosDelta(GraftSql.analyzed(df))
}

/** Session-extension registration, the idiomatic deployment path:
  * `SparkSession.builder().withExtensions(new IvmExtensions)` (or config
  * `spark.sql.extensions=graft.ivm.IvmExtensions`). Both rules are injected
  * as optimizer rules; they are idempotent (markers are consumed) so the
  * fixed-point optimizer batch terminates.
  */
class IvmExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PosDeltaRule)
    ext.injectOptimizerRule(_ => ResolvePosDeltaScan)
  }
}
