package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.Iceberg

/** Structured Streaming SOURCE over the Iceberg snapshot log — the
  * [[DeltaLogStream]] twin for the second lakehouse format:
  * `spark.readStream.format("graft-iceberg").load(tablePath)`.
  *
  * Offsets are snapshot SEQUENCE NUMBERS (v1 fallback: timestamp-ms) —
  * NOT snapshot ids (arbitrary longs per the spec; offsets must be
  * monotonic) and NOT history ordinals (snapshot EXPIRATION shifts
  * ordinals, silently re-mapping a checkpointed offset onto a different
  * snapshot; sequence numbers are stable across expiration, and a cut
  * whose snapshot expired resolves to NOTHING and fails loudly with the
  * rebase instruction instead). Each micro-batch is the
  * snapshot-to-snapshot append diff served by [[Iceberg.appended]];
  * [[Iceberg.isAppendOnly]] guards every window (a MoR delete file
  * landing, a COW rewrite, or a schema change fails loudly — an
  * inserts-only stream cannot express retraction). The bootstrap batch
  * is a SNAPSHOT read (existing MoR deletes applied). Options:
  * `startingSequence` (begin after the snapshot with this sequence
  * number; default: replay from the beginning),
  * `maxSnapshotsPerTrigger` (default 1).
  */
class IcebergLogStreamProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.RelationProvider
    with org.apache.spark.sql.sources.CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  /** The table path — explicit, or resolved from `warehouse`+`table`
    * catalog-name options ([[graft.sources.GraftCatalog.streamTarget]]
    * — binding at creation, stream follows the table log, not the
    * pin).
    */
  private def pathOf(parameters: Map[String, String]): String =
    graft.sources.GraftCatalog.streamTarget(parameters, shortName())
      .orElse(parameters.get("path"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-iceberg source requires .load(<table path>), " +
          "option(\"path\", ...), or option(\"warehouse\", ...) + " +
          "option(\"table\", \"db.t\")"))

  /** BATCH read — `spark.read.format("graft-iceberg").load(path)`,
    * with `snapshotId`/`asOfTimestamp`/`branch`/`tag` options (see
    * [[graft.sources.GraftLakeRelation]]).
    */
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String])
      : org.apache.spark.sql.sources.BaseRelation =
    graft.sources.GraftLakeRelation.relationFor(shortName(),
      pathOf(parameters), parameters, ctx)

  /** BATCH write — `df.write.format("graft-iceberg").mode(...)
    * .option("partitionBy", "days(ts)").save(path)` through the native
    * [[Iceberg.write]].
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

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) = {
    val base = schema.getOrElse(
      Iceberg.snapshot(ctx.sparkSession, pathOf(parameters)).schema)
    ("graft-iceberg",
      if (!changelogOf(parameters)) base
      else StructType(base.fields :+
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType)))
  }

  private def changelogOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeLog").exists(_.toBoolean)

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergLogSource(ctx, pathOf(parameters),
      parameters.get("startingSequence").map(_.toLong)
        .getOrElse(IcebergLogSource.Sentinel),
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong).getOrElse(1L),
      changelog = changelogOf(parameters))

  /** The SINK half — `df.writeStream.format("graft-iceberg")
    * .start(tablePath)` commits micro-batches as native Iceberg
    * snapshots (see [[IcebergLogSink]]). Exactly-once identity
    * (`graft.txn-app-id` in each snapshot's summary) defaults to the
    * checkpoint location, overridable via `option("txnAppId", ...)`.
    * `partitionBy` columns become IDENTITY partition fields; transform
    * partitioning (`days(ts)`, `bucket(8, id)`, ...) comes via
    * `option("partitionSpec", "days(ts),p")`.
    */
  override def createSink(ctx: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val mode = outputMode.toString.toLowerCase
    require(mode == "append" || mode == "complete",
      s"graft-iceberg sink supports Append (snapshot per batch) and " +
        s"Complete (replace per batch) output modes, not $mode")
    val spec = parameters.get("partitionSpec")
      .map(SinkSupport.splitSpec)
      .getOrElse(partitionColumns)
    new IcebergLogSink(pathOf(parameters), spec,
      SinkSupport.appIdOf(ctx, parameters),
      overwrite = mode == "complete",
      onCommit = SinkSupport.pinAdvanceOf(parameters))
  }
}

/** Structured Streaming SINK committing native Iceberg snapshots —
  * the second format behind the same write seam as
  * [[DeltaLogSink]]. Each micro-batch is one snapshot: the batch's
  * parquet files (stats + field ids stamped, manifests + manifest
  * list + next metadata json), with the exactly-once ratchet
  * `(graft.txn-app-id, graft.txn-version)` in the snapshot SUMMARY —
  * the spec's designated home for writer metadata, the same place
  * Flink's committer stores its checkpoint id — checked against the
  * table itself on every batch, so a restarted query re-delivering a
  * batch skips it. Metadata creation is EXCLUSIVE (hard-link commit):
  * racing writers fail loudly. Complete-mode batches REPLACE the
  * table's live content (status=2 entries for every prior file) while
  * older snapshots stay time-travel readable.
  */
class IcebergLogSink(path: String, partitionSpec: Seq[String],
    appId: String, overwrite: Boolean,
    onCommit: Long => Unit = _ => ())
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val committed = Iceberg.txnVersion(path, appId)
    if (batchId <= committed) return // replayed batch: already committed
    val v = Iceberg.stageAppendWith(data.sparkSession, path,
      SinkSupport.cleanBatch(data), partitionSpec,
      operation = if (overwrite) "overwrite" else "append",
      summaryProps = Map("graft.txn-app-id" -> appId,
        "graft.txn-version" -> batchId.toString),
      exclusive = true, replaceTable = overwrite)
    onCommit(v)
  }

  override def toString: String = s"IcebergLogSink[$path]"
}

object IcebergLogSource {
  /** "Before everything" — both sequence numbers (≥0) and timestamp-ms
    * fallbacks (epoch millis) are far above it.
    */
  val Sentinel: Long = Long.MinValue
}

class IcebergLogSource(ctx: SQLContext, path: String, startAfter: Long,
    maxPerTrigger: Long, changelog: Boolean = false) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  import IcebergLogSource.Sentinel

  require(maxPerTrigger >= 1, "maxSnapshotsPerTrigger must be >= 1")
  private val spark = ctx.sparkSession

  override val schema: StructType = {
    val base = Iceberg.snapshot(spark, path).schema
    if (!changelog) base
    else StructType(base.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType))
  }

  /** Highest sequence key handed out ([[Sentinel]] = nothing yet). */
  @volatile private var seen: Long = startAfter
  @volatile private var availableTarget: Option[Long] = None

  /** (sequence key, snapshot id), ascending. The key is the snapshot's
    * `sequence-number` when present (v2 — strictly increasing, stable
    * across expiration), else its required `timestamp-ms`.
    */
  private def history: Seq[(Long, Long)] =
    Iceberg.snapshotSeqIds(spark, path)

  override def prepareForTriggerAvailableNow(): Unit = {
    availableTarget = history.lastOption.map(_._1)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    history.lastOption.map(h => LongOffset(h._1)).orNull

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    if (startOffset != null) seen = math.max(seen, verAny(startOffset))
    advance()
    if (seen == Sentinel) null else LongOffset(seen)
  }

  override def getOffset: Option[Offset] = {
    advance()
    if (seen == Sentinel) None else Some(LongOffset(seen))
  }

  /** Ratchet `seen` forward by up to `maxPerTrigger` SNAPSHOTS (ordinal
    * steps over the sequence-sorted history — sequence numbers may
    * skip), capped at the AvailableNow target when pinned.
    */
  private def advance(): Unit = {
    val h0 = history
    val h = availableTarget match {
      case Some(t) => h0.filter(_._1 <= t)
      case None => h0
    }
    if (h.nonEmpty) {
      val idx = h.count(_._1 <= seen) // Sentinel → 0
      val nextIdx = math.min(h.size, idx + maxPerTrigger.toInt)
      if (nextIdx > idx) seen = h(nextIdx - 1)._1
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
    case other => other.json.trim.toLong
  }

  private def idAt(h: Seq[(Long, Long)], seq: Long, role: String): Long =
    h.find(_._1 == seq).map(_._2).getOrElse(throw new IllegalStateException(
      s"graft-iceberg stream: no snapshot with sequence $seq in $path " +
        s"(the $role snapshot was EXPIRED past this consumer) — rebase " +
        "the consumer from the current snapshot and restart"))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val afterSeq = start.map(ver).getOrElse(startAfter)
    val toSeq = ver(end)
    seen = math.max(seen, toSeq)
    val h = history
    val toId = idAt(h, toSeq, "end")
    import org.apache.spark.sql.functions.lit
    val batch =
      if (afterSeq == Sentinel) {
        // bootstrap: the full current state (existing deletes applied)
        val snap = Iceberg.snapshot(spark, path, Some(toId))
        if (!changelog) snap
        else snap.withColumn("_change_type", lit("insert"))
      } else if (changelog) {
        // CHANGELOG mode: the window's SIGNED row-level diff rendered
        // as typed rows — Iceberg's changelog-scan shape. This is what
        // makes row-level deletes STREAM: the MoR/equality netting in
        // [[Iceberg.changes]] serves delta-sized insert/delete frames,
        // incl. delete-file removals (a compaction window streams as a
        // no-op, an undelete as inserts); only schema drift stays loud
        // inside it
        val afterId = idAt(h, afterSeq, "cut")
        val ch = Iceberg.changes(spark, path, afterId, Some(toId))
        ch.inserts.withColumn("_change_type", lit("insert"))
          .unionByName(
            ch.retracts.withColumn("_change_type", lit("delete")))
      } else {
        val afterId = idAt(h, afterSeq, "cut")
        // appended() requires a stable delete-file set and equal
        // schemas across the window — exactly the streamable contract
        // (MoR deletes/rewrites/renames fail loudly inside it)
        require(Iceberg.isAppendOnly(spark, path, afterId, toId),
          s"graft-iceberg stream: snapshots ($afterId, $toId] of $path " +
            "are not pure appends (a row-level delete, rewrite, or " +
            "schema change landed) — an inserts-only stream cannot " +
            "express retraction; use option(\"readChangeLog\", \"true\") " +
            "for a signed changelog stream, or maintain through the " +
            "signed seam (graft.ivm.IcebergSnapshots.signedRows)")
        Iceberg.appended(spark, path, afterId, Some(toId))
      }
    StreamMark(spark, batch, schema)
  }

  override def commit(end: Offset): Unit = {
    seen = math.max(seen, ver(end)); ()
  }

  override def stop(): Unit = ()
}
