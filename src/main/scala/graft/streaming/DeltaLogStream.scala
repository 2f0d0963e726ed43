package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.DeltaLake

/** Structured Streaming SOURCE over the native Delta log —
  * `spark.readStream.format("graft-deltalake").load(tablePath)` tails
  * the table's commit log. Offsets are TABLE VERSIONS, and each
  * micro-batch is the append diff `(startVersion, endVersion]` served
  * by [[DeltaLake.appended]] — the same transactional version cut the
  * IVM seam uses, so a batch can never split or re-read a commit, and
  * there is no directory listing anywhere (the log IS the
  * notification channel). This is how production pipelines consume a
  * lakehouse table as a stream; the staged-file replay harness in
  * [[StreamQueries]] is the generic-source twin.
  *
  * Options: `startingVersion` (default −1: replay from the table's
  * beginning — the bootstrap-then-tail shape), `maxVersionsPerTrigger`
  * (default 1: one commit per micro-batch, the real incremental
  * cadence; raise it for catch-up batches).
  *
  * Scope (documented contract): append-only tailing. A window carrying
  * a delete/rewrite/DV fails fast inside [[DeltaLake.appended]] — an
  * inserts-only stream cannot express retraction; route such tables
  * through the signed seam ([[graft.ivm.DeltaLakeSnapshots]]) instead.
  * `getBatch` marks the log-backed scan's plan streaming, so the full
  * file-source machinery (log-derived file lists, pushdown, stats
  * skipping) runs unchanged inside the micro-batch.
  */
/** Marks a batch frame STREAMING for the V1 `getBatch` contract: flag
  * exactly ONE log-backed scan (`df.isStreaming` = any leaf streaming;
  * the flag is the engine's marker, nothing more). Marking every scan
  * would turn multi-scan batches — a MoR anti-join, a changelog's
  * cut-vs-end diff — into unsupported STREAM-STREAM joins; the other
  * scans are genuinely batch data inside the micro-batch. A frame with
  * no log-backed scan (empty window) gets the empty streaming frame.
  */
private[streaming] object StreamMark {
  def apply(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, schema: StructType): DataFrame = {
    val g = org.apache.spark.sql.graft.GraftSql
    var markedOne = false
    val marked = g.analyzed(batch).transform {
      case lr: LogicalRelation if !markedOne && lr.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.isInstanceOf[graft.sources.LogFileIndex] =>
        markedOne = true
        lr.copy(isStreaming = true)
    }
    if (marked.isStreaming) g.ofRows(spark, marked)
    else g.emptyStreaming(spark, schema)
  }
}

class DeltaLogStreamProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.RelationProvider
    with org.apache.spark.sql.sources.CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-deltalake"

  /** The table path — explicit, or resolved from `warehouse`+`table`
    * catalog-name options ([[graft.sources.GraftCatalog.streamTarget]]
    * — binding at creation, stream follows the table log, not the
    * pin).
    */
  private def pathOf(parameters: Map[String, String]): String =
    graft.sources.GraftCatalog.streamTarget(parameters, shortName())
      .orElse(parameters.get("path"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-deltalake source requires .load(<table path>), " +
          "option(\"path\", ...), or option(\"warehouse\", ...) + " +
          "option(\"table\", \"db.t\")"))

  /** BATCH read — `spark.read.format("graft-deltalake").load(path)`,
    * with `versionAsOf`/`timestampAsOf`/`readChangeFeed` options (see
    * [[graft.sources.GraftLakeRelation]]). With
    * [[graft.GraftExtensions]] installed the relation resolves to the
    * native log-backed scan plan; without, a correct row-based
    * fallback serves it.
    */
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String])
      : org.apache.spark.sql.sources.BaseRelation =
    graft.sources.GraftLakeRelation.relationFor(shortName(),
      pathOf(parameters), parameters, ctx)

  /** BATCH write — `df.write.format("graft-deltalake")
    * .mode(...).option("partitionBy", "a,b").save(path)` through the
    * native [[DeltaLake.write]] (exclusive commits, stats, protocol
    * upgrades — everything the library writer does).
    */
  override def createRelation(ctx: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String], data: org.apache.spark.sql.Dataset[
        org.apache.spark.sql.Row])
      : org.apache.spark.sql.sources.BaseRelation = {
    graft.sources.GraftLakeRelation.write(ctx.sparkSession, shortName(),
      pathOf(parameters), mode, parameters, data.toDF())
    createRelation(ctx, parameters)
  }

  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) = {
    val base = schema.getOrElse(
      DeltaLake.snapshot(ctx.sparkSession, pathOf(parameters)).schema)
    ("graft-deltalake",
      if (!cdfOf(parameters)) base
      else StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType))))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaLogSource(ctx, pathOf(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(-1L),
      parameters.get("maxVersionsPerTrigger").map(_.toLong).getOrElse(1L),
      cdf = cdfOf(parameters))

  /** The SINK half — `df.writeStream.format("graft-deltalake")
    * .start(tablePath)` writes micro-batches as native Delta commits
    * (see [[DeltaLogSink]]). The exactly-once identity (`txn` appId)
    * comes from `option("txnAppId", ...)`, defaulting to the
    * checkpoint location — the stable name a restarted query keeps —
    * and only then to a fresh UUID (no checkpoint = no restart
    * semantics to protect).
    */
  override def createSink(ctx: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val mode = outputMode.toString.toLowerCase
    require(mode == "append" || mode == "complete",
      s"graft-deltalake sink supports Append (commit per batch) and " +
        s"Complete (overwrite per batch) output modes, not $mode — " +
        "Update would need row-level upserts this log writer does not " +
        "stage")
    new DeltaLogSink(pathOf(parameters), partitionColumns,
      SinkSupport.appIdOf(ctx, parameters),
      overwrite = mode == "complete",
      onCommit = SinkSupport.pinAdvanceOf(parameters))
  }
}

/** Structured Streaming SINK writing native Delta commits — the write
  * half of the lakehouse round trip (`graft-deltalake` tails a table;
  * this produces one). Each micro-batch is ONE transactional commit:
  * the batch's parquet files + a `txn` action recording
  * `(appId, batchId)`, so a restarted query that re-delivers the last
  * batch SKIPS it instead of duplicating rows — the protocol's
  * idempotent-writer shape, checked against the log itself (never
  * sink-local state, which a crash could lose). Complete-mode batches
  * additionally REMOVE every previously-live file, so the table's
  * newest version is always the full recompute while older versions
  * stay time-travel readable — and the signed seam reads the window
  * as an ordinary rewrite.
  *
  * Scale shape: the batch frame is re-planned once over its
  * already-executed RDD ([[org.apache.spark.sql.graft.GraftSql
  * .batchify]] — the FileStreamSink idiom), written distributed by
  * Spark's parquet writer; only the file-landing rename+commit is
  * driver-side, O(files in the batch).
  */
class DeltaLogSink(path: String, partitionBy: Seq[String],
    appId: String, overwrite: Boolean,
    onCommit: Long => Unit = _ => ())
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val committed = DeltaLake.txnVersion(path, appId)
    if (batchId <= committed) return // replayed batch: already in the log
    val v = DeltaLake.commitStreamBatch(data.sparkSession, path,
      SinkSupport.cleanBatch(data), partitionBy, appId, batchId,
      overwrite)
    onCommit(v)
  }

  override def toString: String = s"DeltaLogSink[$path]"
}

class DeltaLogSource(ctx: SQLContext, path: String, startAfter: Long,
    maxPerTrigger: Long, cdf: Boolean = false) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  require(maxPerTrigger >= 1, "maxVersionsPerTrigger must be >= 1")
  private val spark = ctx.sparkSession

  override val schema: StructType = {
    val base = DeltaLake.snapshot(spark, path).schema
    if (!cdf) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType)))
  }

  /** Highest version already handed out (ratchet). Restart recovery
    * re-seeds it from `getBatch`'s start offset, so the in-memory value
    * only ever under-estimates — monotonicity is preserved.
    */
  @volatile private var seen: Long = startAfter

  /** Under Trigger.AvailableNow the engine asks this source to PIN the
    * end of the run up front (instead of wrapping it in the
    * single-shot snapshot wrapper, which would defeat per-version
    * batching): batches keep advancing `maxPerTrigger` versions at a
    * time until the pinned target, then the query terminates.
    */
  @volatile private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableTarget = Some(DeltaLake.latestVersion(spark, path))
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val latest = DeltaLake.latestVersion(spark, path)
    if (latest < 0) null else LongOffset(latest)
  }

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val latest = availableTarget
      .getOrElse(DeltaLake.latestVersion(spark, path))
    if (latest < 0) null
    else {
      if (startOffset != null)
        seen = math.max(seen, verAny(startOffset))
      val next = math.min(latest, seen + maxPerTrigger)
      if (next > seen) seen = next
      if (seen < 0) null else LongOffset(seen)
    }
  }

  private def verAny(
      o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case l: LongOffset => l.offset
      case other => other.json.trim.toLong
    }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getOffset: Option[Offset] = {
    val latest = DeltaLake.latestVersion(spark, path)
    if (latest < 0) None
    else {
      val next = math.min(latest, seen + maxPerTrigger)
      if (next > seen) seen = next
      Some(LongOffset(seen))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val after = start.map(ver).getOrElse(startAfter)
    val to = ver(end)
    seen = math.max(seen, to)
    // The BOOTSTRAP batch (from the table's beginning) is a SNAPSHOT
    // read — checkpoint-tolerant (a cleaned log replays from its
    // checkpoint; per-commit JSONs may be gone) and delete-complete
    // (DVs and rewrites are already applied in the full state, so a
    // table with historical deletes still bootstraps). Tail windows
    // are append diffs and must guard themselves: serving a delete
    // window as inserts would silently never retract the deleted rows.
    // Compaction windows ARE streamable (content no-op), and a
    // metaData action at the user-chosen starting version is start-up,
    // not drift.
    val batch =
      // CHANGE FEED mode: typed change rows — deletes/updates STREAM as
      // retraction-capable rows instead of failing (change files are
      // authoritative; a row-changing commit without them stays loud
      // inside changeFeed, as does a mid-feed schema change)
      if (cdf) DeltaLake.changeFeed(spark, path, afterVersion = after,
        toVersion = Some(to))
      else if (after < 0)
        DeltaLake.snapshot(spark, path, version = Some(to))
      else {
        DeltaLake.streamableViolation(path, after, to,
            ignoreMeta = after == startAfter).foreach { why =>
          throw new IllegalStateException(
            s"graft-deltalake stream: window ($after, $to] of $path is " +
              s"not inserts-only ($why) — a stream cannot express " +
              "retraction; rebase the consumer from the current " +
              "snapshot and restart, or maintain through the signed " +
              "seam (graft.ivm.DeltaLakeSnapshots.signedRows)")
        }
        DeltaLake.appended(spark, path, afterVersion = after,
          toVersion = Some(to))
      }
    StreamMark(spark, batch, schema)
  }

  override def commit(end: Offset): Unit = {
    seen = math.max(seen, ver(end)); ()
  }

  override def stop(): Unit = ()
}
