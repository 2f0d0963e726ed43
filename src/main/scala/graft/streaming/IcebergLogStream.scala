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
    with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg source requires .load(<table path>) or " +
        "option(\"path\", ...)"))

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
