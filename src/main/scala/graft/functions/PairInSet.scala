package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Keyed set membership — the materialized form of a CORRELATED
  * `value IN (SELECT y FROM s WHERE s.k = outer.k)` once the (k, y)
  * pairs are collected driver-side (see `GraftDml.lowerSubqueries`):
  * per row, an O(1) hash lookup of the key's member set, with SQL's
  * three-valued IN semantics *within* that set.
  *
  * `sets` maps each correlation-key value to `(members, hasNull)` —
  * the key's non-null member values and whether the key's group also
  * produced a NULL member (which makes a non-matching probe NULL, not
  * false, exactly like `x IN (5, NULL)`).
  *
  * Semantics per row:
  *  - outer key NULL, or key not present → the correlated set is
  *    EMPTY → `x IN (∅)` = false (so `NOT IN` over a row with no
  *    matching group is TRUE — the shape the null-extending rewrite
  *    through a map literal gets wrong);
  *  - value NULL against a non-empty set → NULL;
  *  - member hit → true; miss with a NULL member in the group → NULL;
  *    miss otherwise → false.
  *
  * Values are CATALYST-typed (UTF8String/Decimal/primitives), already
  * coerced to the outer expressions' types by the DML bridge, so the
  * hash probe compares like with like. CodegenFallback is deliberate:
  * this expression only ever runs inside a DML rewrite's row filter
  * (never a declared-query hot path), where one virtual call per row
  * is noise against the file rewrite it gates.
  */
case class PairInSet(key: Expression, value: Expression,
    sets: Map[Any, (Set[Any], Boolean)])
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(key, value)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val k = key.eval(input)
    if (k == null) false
    else sets.get(k) match {
      case None => false
      case Some((members, hasNull)) =>
        val x = value.eval(input)
        if (x == null) { if (members.isEmpty && !hasNull) false else null }
        else if (members.contains(x)) true
        else if (hasNull) null
        else false
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), value = newChildren(1))
}
