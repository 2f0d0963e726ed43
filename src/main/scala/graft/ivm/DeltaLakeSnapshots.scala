package graft.ivm

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.DeltaLake

/** Delta-log-backed snapshot registry: the TRANSACTIONAL sibling of
  * [[FileSnapshots]], closing its scaladoc's own caveat — the cut is a
  * table VERSION, not a filesystem timestamp, so appends landing in the
  * same tick can never be missed and the delta is exactly "files the log
  * committed after the cut".
  *
  * The registered predicate is the cut's file set, complemented:
  * `_metadata.file_name NOT IN (<files live at the cut version>)`. The
  * complement is what makes the registration STABLE: commits landing
  * after [[advance]] add files the predicate has never seen, so they are
  * delta by construction — no re-registration per query, same as the
  * mtime `>` cut. File NAMES, not paths: part names are globally unique
  * (task UUIDs) while path rendering is scheme-dependent. At 100 TB the
  * literal set is the snapshot's file count; a production integration
  * pushes the same version cut into the format's own file index instead
  * of an IN-list — the seam (predicate behind
  * [[DeltaSources]]/`ResolvePosDeltaScan`) is unchanged, which was the
  * point of modeling sources this way since r5.
  *
  * Maintenance cycle (mirrors [[FileSnapshots]]; the snapshot DataFrame
  * freezes its file list at creation, so each cycle re-derives the view):
  * {{{
  *   DeltaLakeSnapshots.track(spark, "tbl", dir)   // delta = everything
  *   DeltaLakeSnapshots.view(spark, "tbl")         // snapshot + _metadata
  *   Ivm.delta(q)                                  // process appends
  *   DeltaLakeSnapshots.advance(spark, "tbl")      // cut = latest version
  * }}}
  */
object DeltaLakeSnapshots {

  private final case class State(dir: String, cutVersion: Option[Long])
  private val states = TrieMap[String, State]()

  /** Start tracking the Delta table at `dir` under the source name
    * `table`. With `at = None` everything is delta (first run = initial
    * full compute); `at = Some(v)` cuts at version `v` directly (the
    * stored view was built from that snapshot).
    */
  def track(spark: SparkSession, table: String, dir: String,
      at: Option[Long] = None): Unit = {
    states.put(table, State(dir, at))
    sync(spark, table)
  }

  /** The current cut version. */
  def cut(table: String): Option[Long] = stateOf(table).cutVersion

  /** Advance the cut to the latest committed version. Returns whether it
    * moved. A pure log read — no data file is opened.
    */
  def advance(spark: SparkSession, table: String): Boolean = {
    val s = stateOf(table)
    val latest = DeltaLake.latestVersion(spark, s.dir)
    if (s.cutVersion.contains(latest)) false
    else {
      states.put(table, s.copy(cutVersion = Some(latest)))
      sync(spark, table)
      true
    }
  }

  /** (Re-)derive the snapshot view for this cycle: the CURRENT latest
    * snapshot with `_metadata` exposed (the registered predicate selects
    * on it), registered as the temp view `table`.
    *
    * Guarded: the file-set complement is only a correct delta while the
    * commits since the cut are PURE APPENDS — a compaction's rewritten
    * files (`dataChange=false`) are not in the cut's file set and would
    * replay their rows as inserts; a delete would silently drop retracts
    * the inserts-only model can't express. Fail fast with the rebase
    * instruction instead (the [[Ivm]] guard philosophy: never a silently
    * wrong maintained view).
    */
  def view(spark: SparkSession, table: String): DataFrame = {
    val s = stateOf(table)
    // resolve `latest` ONCE and snapshot at exactly that version: a commit
    // landing between the guard and the snapshot resolution would
    // otherwise bypass the guard (TOCTOU) — its rewritten files, absent
    // from the cut's file set, would replay as inserts
    val latest = DeltaLake.latestVersion(spark, s.dir)
    s.cutVersion.foreach { cv =>
      require(DeltaLake.isAppendOnly(s.dir, cv, latest),
        s"DeltaLakeSnapshots: commits ($cv, $latest] of ${s.dir} are not " +
          "pure appends (a delete, compaction, or schema change landed): " +
          "the file-set cut would replay rewritten rows — use signedRows " +
          "for delete-aware maintenance, or advance the cut and rebase " +
          "the maintained view from the current snapshot")
    }
    val df = DeltaLake.snapshotWithMeta(spark, s.dir, version = Some(latest))
    df.createOrReplaceTempView(table)
    df
  }

  private def stateOf(table: String): State =
    states.getOrElse(table, throw new IllegalStateException(
      s"DeltaLakeSnapshots: table '$table' is not tracked; call " +
        "DeltaLakeSnapshots.track first"))

  private def sync(spark: SparkSession, table: String): Unit = {
    val s = states(table)
    DeltaSources.register(table, s.cutVersion.map { v =>
      val names = DeltaLake.liveFileNames(spark, s.dir, v)
      if (names.isEmpty) "1 = 1" // empty snapshot at the cut: all delta
      else names.map(n => s"'$n'")
        .mkString("_metadata.file_name NOT IN (", ", ", ")")
    }.getOrElse("1 = 1"))
  }
}
