package graft.ivm

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, max}

/** Batch snapshot-watermark registry: gives [[Ivm.delta]] the meaning
  * "everything appended since my LAST maintenance run" without
  * hand-registering literal predicates.
  *
  * The reference's incremental scan (`src/delta_node.rs:62-109`) assumes a
  * source that knows its own snapshot point; plain parquet does not, so the
  * watermark lives here: [[track]] marks a table's monotone append column,
  * [[advance]] moves the high-water mark to the current max after a
  * maintenance run, and the registered [[DeltaSources]] predicate —
  * `watermarkCol > mark` — is what [[graft.ivm.PosDeltaScan]] resolution
  * reads. The predicate is a range over a monotone column, so at scale it
  * min/max-prunes parquet row groups (and partitions on a date-partitioned
  * layout): each cycle's δ arms touch only the files appended since the
  * last cycle. A CDF/Delta-format source can replace this registry behind
  * the same resolution seam without touching the rewrite.
  *
  * Maintenance cycle:
  * {{{
  *   Snapshots.track("orders", "o_orderdate")   // once; delta = everything
  *   Ivm.delta(q).write.mode("append")...       // process since last cut
  *   Snapshots.advance("orders", ordersDf)      // move the cut
  * }}}
  * Multi-table queries stay consistent by advancing through [[advanceAll]],
  * which computes every table's high-water mark BEFORE swapping any
  * predicate, so one cycle sees a single cut across tables.
  */
object Snapshots {

  private final case class State(watermarkCol: String, mark: Option[String])
  private val states = TrieMap[String, State]()

  /** Start tracking `table` (a registered temp view / scan name) on a
    * monotone append column. Until the first [[advance]], EVERYTHING is
    * delta — the first maintenance run is the initial full compute.
    */
  def track(table: String, watermarkCol: String): Unit = {
    states.put(table, State(watermarkCol, None))
    sync(table)
  }

  /** The current high-water mark as a SQL literal, if any. */
  def mark(table: String): Option[String] = stateOf(table).mark

  /** Advance `table`'s snapshot to the current max of its watermark column.
    * Costs one `max()` aggregate over the single watermark column (column-
    * pruned, and answerable from parquet footer stats); when the ingest
    * path already knows the batch's high id, prefer [[advanceTo]], which
    * does no scan at all. Returns whether the mark moved.
    */
  def advance(table: String, current: DataFrame): Boolean = {
    val s = stateOf(table)
    val row = current.agg(max(col(s.watermarkCol))).head()
    if (row.isNullAt(0)) false else advanceTo(table, row.get(0))
  }

  /** Advance with a KNOWN high-water value (e.g. the max id of the batch
    * just ingested) — no scan at all.
    */
  def advanceTo(table: String, value: Any): Boolean = {
    val s = stateOf(table)
    val rendered = literal(value)
    if (s.mark.contains(rendered)) false
    else {
      states.put(table, s.copy(mark = Some(rendered)))
      sync(table)
      true
    }
  }

  /** Consistent multi-table advance: all high-water marks are computed
    * first, then all predicates swap, so the next cycle's deltas are
    * relative to one cut across every table in the map.
    */
  def advanceAll(tables: Map[String, DataFrame]): Unit = {
    val highs = tables.map { case (t, df) =>
      val s = stateOf(t)
      t -> df.agg(max(col(s.watermarkCol))).head()
    }
    highs.foreach { case (t, row) =>
      if (!row.isNullAt(0)) advanceTo(t, row.get(0))
    }
  }

  private def stateOf(table: String): State =
    states.getOrElse(table, throw new IllegalStateException(
      s"Snapshots: table '$table' is not tracked; call Snapshots.track first"))

  private def sync(table: String): Unit = {
    val s = states(table)
    DeltaSources.register(table,
      s.mark.map(m => s"${s.watermarkCol} > $m").getOrElse("1 = 1"))
  }

  /** SQL-literal rendering for the watermark value (the predicate is parsed
    * back by [[DeltaSources.predicateFor]]). Monotone append columns are
    * integral, timestamp, date, or string in practice.
    */
  private def literal(v: Any): String = v match {
    case n: Long => n.toString
    case n: Int => n.toString
    case n: Short => n.toString
    case n: Byte => n.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: Double => d.toString
    case f: Float => f.toString
    // rendered in UTC explicitly: java.sql.Timestamp.toString uses the
    // JVM-default timezone while the literal is re-parsed in the SESSION
    // timezone (pinned UTC by every graft session builder) — on a non-UTC
    // host the default rendering would shift the snapshot cut by the
    // host offset, re-emitting or skipping hours of rows each cycle
    case t: java.sql.Timestamp => s"TIMESTAMP '${utc(t.toInstant)}'"
    case t: java.time.Instant => s"TIMESTAMP '${utc(t)}'"
    case d: java.sql.Date => s"DATE '${d.toLocalDate}'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case s: String => "'" + s.replace("'", "''") + "'"
    case other => throw new UnsupportedOperationException(
      s"Snapshots: unsupported watermark type ${other.getClass.getName}")
  }

  private val UtcFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  private def utc(i: java.time.Instant): String = UtcFmt.format(i)
}
