package graft.ivm

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registry mapping a base table to the predicate that selects its
  * inserts-only delta partition.
  *
  * The environment ships plain parquet (no change-data-feed), so the
  * incremental-scan contract (reference `src/delta_node.rs:62-109`) is
  * modeled as a deterministic split: `scan(T)` = all rows,
  * `PosDeltaScan(T)` = rows satisfying the registered predicate (SURVEY.md
  * §7.4). A CDF/Delta-Lake-backed source can be swapped in behind the same
  * resolution point without touching the rewrite rule.
  *
  * Predicates are SQL strings parsed to unresolved Catalyst expressions at
  * resolution time; the session analyzer re-resolves and type-coerces them
  * against the scan's own output, so registration needs no schema access.
  */
object DeltaSources {
  /** Default split predicates.
    *
    * Fact tables (`orders`, `lineitem`, `events`) use RANGE predicates on a
    * time column: "the delta is everything appended after the snapshot
    * timestamp". Ranges reach the parquet reader as min/max-stat row-group
    * pruning (and partition pruning on a date-partitioned layout), so at
    * 100 TB a δ arm touches only the recent files — a modulo split would
    * full-scan every arm and defeat IVM. Dimension tables are
    * broadcast-sized at any realistic scale, so a key-modulo split there is
    * harmless and keeps the deltas non-empty for tests.
    */
  private val registry = TrieMap[String, String](
    "region"     -> "r_regionkey % 2 = 0",
    "nation"     -> "n_nationkey % 5 = 0",
    "customer"   -> "c_custkey % 10 = 0",
    "supplier"   -> "s_suppkey % 3 = 0",
    "part"       -> "p_partkey % 10 = 0",
    "orders"     -> "o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'",
    "lineitem"   -> "l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'",
    // events.ts has shipped as both µs TIMESTAMP_NTZ and legacy INT64
    // epoch-nanos (see graft.engine.Tables): the zone-free literal is
    // 2024-01-28T00:00:00 and min/max-prunes like any range. On the
    // legacy long encoding, PosDeltaRule's literal coercion rewrites the
    // timestamp literal to its epoch-nanos long, so ONE registered
    // predicate serves both physical layouts.
    "events"     -> "ts >= TIMESTAMP_NTZ '2024-01-28 00:00:00'",
    "documents"  -> "doc_id % 10 = 0",
    "embeddings" -> "vec_id % 10 = 0"
  )

  def register(table: String, predicateSql: String): Unit =
    registry.put(table, predicateSql)

  /** Remove a table's registration (the partner of the snapshot
    * registries' `untrack` — a dangling `graft_post_cut` predicate
    * whose cut set was released would fail analysis on the next
    * query naming the table).
    */
  def deregister(table: String): Unit = { registry.remove(table); () }

  def predicateFor(table: String): Option[Expression] =
    registry.get(table).map(CatalystSqlParser.parseExpression)

  def tables: Set[String] = registry.keySet.toSet
}
