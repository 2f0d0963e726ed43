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
  private val registry = TrieMap[String, String](
    "region"     -> "r_regionkey % 2 = 0",
    "nation"     -> "n_nationkey % 5 = 0",
    "customer"   -> "c_custkey % 10 = 0",
    "supplier"   -> "s_suppkey % 3 = 0",
    "part"       -> "p_partkey % 10 = 0",
    "orders"     -> "o_orderkey % 10 = 0",
    "lineitem"   -> "l_orderkey % 10 = 0",
    "events"     -> "event_id % 10 = 0",
    "documents"  -> "doc_id % 10 = 0",
    "embeddings" -> "vec_id % 10 = 0"
  )

  def register(table: String, predicateSql: String): Unit =
    registry.put(table, predicateSql)

  def predicateFor(table: String): Option[Expression] =
    registry.get(table).map(CatalystSqlParser.parseExpression)

  def tables: Set[String] = registry.keySet.toSet
}
