package graft.ivm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** The GROUP-SCOPED SPLICE shared by the lakehouse maintenance seams
  * ([[DeltaLakeSnapshots.maintainAgg]], [[IcebergSnapshots.maintainAgg]])
  * — one copy of the subtle parts (null-safe group equality, broadcast
  * probes, δ-sized pinning) instead of one per format:
  *
  *   touched  = distinct `keys` of (inserts ∪ retracts)   — δ-sized
  *   view′    = view ∖ touched  ∪  agg(snapshot ⋉ touched)
  *
  * Exact for ANY deterministic aggregate (min/max/count-distinct
  * included, which subtraction-merging can't retract). The returned
  * frame is EAGER (`localCheckpoint`): callers advance their cut only
  * after it materializes, so a failed cycle never moves the cut past
  * changes it hasn't applied — and production sinks materialize the new
  * view state anyway.
  */
private[ivm] object LakeSplice {

  def maintainAgg(view: DataFrame, keys: Seq[String],
      agg: DataFrame => DataFrame, inserts: DataFrame,
      retracts: DataFrame, snapshot: DataFrame): DataFrame = {
    val kc = keys.map(col)
    // pin: δ-sized by construction, probed twice (anti + semi)
    val touched = inserts.select(kc: _*)
      .unionByName(retracts.select(kc: _*))
      .distinct().localCheckpoint()
    // null-safe key equality: a NULL group value is a real group (SQL
    // GROUP BY semantics — and partition values can be null)
    val tRen = touched.select(
      keys.map(k => col(k).as(s"__touched_$k")): _*)
    val cond = keys.map(k => col(k) <=> col(s"__touched_$k"))
      .reduce(_ && _)
    val repaired = agg(snapshot.join(broadcast(tRen), cond, "left_semi"))
    val kept = view.join(broadcast(tRen), cond, "left_anti")
    kept.unionByName(repaired).localCheckpoint()
  }
}
