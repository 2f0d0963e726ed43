package graft.ivm

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}

/** Marker node: "rewrite my input into its inserts-only (positive) delta".
  *
  * Mirrors the reference's `PosDeltaNode` (reference
  * `src/delta_node.rs:8-60`): one child, zero expressions, and — the crucial
  * IVM invariant — the delta of a relation has the **identical schema** as
  * the relation (`delta_node.rs:27-29`), so `output` passes through. Only
  * positive deltas (inserts) are modeled; there is no retraction node.
  */
case class PosDelta(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): PosDelta =
    copy(child = newChild)
}

/** Marker produced when the delta reaches a base-table scan: "incremental
  * scan of this table" (reference `src/delta_node.rs:62-109`). Resolved to a
  * concrete incremental source (a delta-partition filter over the scan, or a
  * CDF read where available) by [[ResolvePosDeltaScan]] before physical
  * planning, so no custom SparkStrategy is needed.
  */
case class PosDeltaScan(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): PosDeltaScan =
    copy(child = newChild)
}

/** Marker: "rewrite my input to read the pre-delta (base) snapshot".
  *
  * Not present in the reference — there, an unmarked `TableScan` *is* the
  * prior snapshot, so the mixed arms of the join expansion read old state for
  * free (`src/optimizer_rules/mod.rs:120-157`). In this engine an unmarked
  * scan reads the *current* table (delta rows included), so cloning it
  * verbatim into the mixed arms would triple-count δR⋈δS matches. The base
  * marker restores the textbook algebra: with `scan(T) = base(T) ∪ δ(T)`,
  *   δ(R ⋈ S) = (δR ⋈ δS) ∪ (base R ⋈ δS) ∪ (δR ⋈ base S)
  * which satisfies the identity  δQ == Q(full) − Q(base)  (pinned by
  * `DeltaIdentitySpec`).
  */
case class BaseRel(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): BaseRel =
    copy(child = newChild)
}

/** Base-snapshot twin of [[PosDeltaScan]]: resolved to
  * `Filter(NOT delta-predicate, scan)` by [[ResolvePosDeltaScan]].
  */
case class BaseScan(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): BaseScan =
    copy(child = newChild)
}
