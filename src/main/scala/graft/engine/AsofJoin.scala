package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the LATEST right row whose
  * timestamp is `<=` the left row's, within the same key group — the
  * temporal lookup every event/feature pipeline needs (DataFusion/pandas
  * `asof_join`/`merge_asof`, kdb `aj`).
  *
  * Spark has no built-in as-of join; this is the MERGE formulation, the
  * shape that survives 100 TB: union-tag both sides, ONE hash exchange by
  * key + sort by (ts, side, ord), then a running last-non-null
  * carry-forward of the right payload inside each partition. O(n log n)
  * per key group, a single shuffle total — versus the naive per-left-row
  * range subquery (quadratic) or an interval cross join (pair explosion).
  * Equal timestamps count as matches (`<=`): the right row sorts BEFORE
  * the left row at the same instant; ties among right rows break by
  * `rightOrd` (latest wins).
  */
object AsofJoin {

  /** `left` keeps all its columns; each `payload` column from `right`
    * arrives populated from the as-of match, or NULL when no right row
    * precedes the left row. `payload` names must not collide with `left`
    * columns (alias on the way in).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      rightOrd: Option[String] = None): DataFrame = {
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(",")}")

    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val nullLeft = lit(null).cast(left.schema.sql)
    // the payload travels as ONE struct (non-null exactly for right rows)
    // so the carry-forward is ATOMIC: last(ignoreNulls) over independent
    // payload columns would stitch fields from DIFFERENT right rows
    // whenever the matched row holds a NULL in one of them
    val pStruct = struct(payload.map(col).toIndexedSeq: _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(right.schema(_))).sql)
    val lTagged = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(0L).cast("long").as("__ord"), lStruct.as("__l"),
      nullPayload.as("__p"))
    val rTagged = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      rightOrd.map(o => col(o).cast("long")).getOrElse(lit(0L)).as("__ord"),
      nullLeft.as("__l"), pStruct.as("__p"))

    val w = Window.partitionBy("__k").orderBy("__ts", "__side", "__ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(col("__side"), col("__l"),
        last(col("__p"), ignoreNulls = true).over(w).as("__m"))
      .filter(col("__side") === 1)
      .select((left.columns.map(c => col(s"__l.$c")) ++
        payload.map(p => col(s"__m.$p").as(p))).toIndexedSeq: _*)
  }
}
