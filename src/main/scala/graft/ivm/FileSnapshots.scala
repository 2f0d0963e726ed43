package graft.ivm

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** File-level snapshot registry: models a directory-of-parquet APPEND LOG
  * as an incremental source. Where [[Snapshots]] cuts on a monotone DATA
  * column, this registry cuts on the files themselves — the delta is
  * "files appended since the last maintenance cut", selected through the
  * file source's hidden `_metadata.file_modification_time` column, so NO
  * data column is consulted at all (the reference's `PosDeltaScan`
  * "incremental scan" semantics, `src/delta_node.rs:62-109`, for sources
  * whose append unit is a file/commit). The registered predicate flows
  * through the same [[DeltaSources]]/[[ResolvePosDeltaScan]] seam as every
  * other source model — the rewrite rule is untouched.
  *
  * At scale this is the right shape for object-store append logs: the
  * modification-time filter is a constant-per-file metadata predicate, so
  * Spark prunes it at FILE-LISTING time (the δ arm never opens a pre-cut
  * file — footer stats are not even read), and the base arm's complement
  * prunes the same way. A transactional table format (Delta Lake/Iceberg)
  * replaces the mtime cut with commit versions behind this same seam;
  * mtime is what plain parquet directories give us.
  *
  * Caveat (documented, inherent to mtime): appends landing in the same
  * filesystem timestamp tick as an [[advance]] would be missed by the
  * strict `>` cut. Production append logs use strictly-increasing file
  * versions/commit ids; the spec pins the cycle with distinct ticks.
  *
  * Maintenance cycle (re-read the directory each cycle — a DataFrame
  * caches its file listing at creation):
  * {{{
  *   FileSnapshots.track("applog", dir)      // once; delta = everything
  *   Ivm.delta(q).write.mode("append")...    // process since last cut
  *   FileSnapshots.advance(spark, "applog")  // cut = max file mtime
  * }}}
  *
  * When the log is wrapped in a temp view, the view must EXPOSE the
  * metadata column — `spark.read.parquet(dir).select(col("*"),
  * col("_metadata")).createOrReplaceTempView(...)` — because view
  * boundaries hide file metadata from outer references; a bare
  * `spark.read.parquet` frame needs nothing.
  */
object FileSnapshots {

  private final case class State(dir: String, cutMillis: Option[Long])
  private val states = TrieMap[String, State]()

  /** Start tracking `table` (a registered temp-view/scan name) as an
    * append-log directory. Until the first [[advance]], EVERYTHING is
    * delta — the first maintenance run is the initial full compute.
    */
  def track(table: String, dir: String): Unit = {
    states.put(table, State(dir, None))
    sync(table)
  }

  /** The current cut (epoch millis of the newest snapshotted file). */
  def cut(table: String): Option[Long] = stateOf(table).cutMillis

  /** Advance `table`'s cut to the newest file modification time currently
    * in the directory — a pure LISTING operation (no file is opened).
    * Returns whether the cut moved.
    */
  def advance(spark: SparkSession, table: String): Boolean = {
    val s = stateOf(table)
    val newest = maxMtime(spark, s.dir)
    if (newest.isEmpty || newest == s.cutMillis) false
    else {
      states.put(table, s.copy(cutMillis = newest))
      sync(table)
      true
    }
  }

  private def maxMtime(spark: SparkSession, dir: String): Option[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val it = fs.listFiles(p, true)
    var newest = Option.empty[Long]
    while (it.hasNext) {
      val f = it.next()
      // skip _SUCCESS/_committed markers — they are rewritten on every
      // append and are not data
      if (!f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        newest = Some(math.max(newest.getOrElse(Long.MinValue),
          f.getModificationTime))
    }
    newest
  }

  private def stateOf(table: String): State =
    states.getOrElse(table, throw new IllegalStateException(
      s"FileSnapshots: table '$table' is not tracked; call " +
        "FileSnapshots.track first"))

  private def sync(table: String): Unit = {
    val s = states(table)
    DeltaSources.register(table, s.cutMillis
      .map(m => s"_metadata.file_modification_time > ${tsLiteral(m)}")
      .getOrElse("1 = 1"))
  }

  private val UtcFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
    .withZone(java.time.ZoneOffset.UTC)

  // rendered in UTC explicitly (every graft session pins the session
  // timezone to UTC; the host default must not leak into the literal)
  private def tsLiteral(millis: Long): String =
    s"TIMESTAMP '${UtcFmt.format(java.time.Instant.ofEpochMilli(millis))}'"
}
