package graft.streaming

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
  * Offsets are snapshot ORDINALS (the 1-based position in the
  * timestamp-ordered snapshot history), NOT snapshot ids — the spec
  * makes ids arbitrary longs, and streaming offsets must be monotonic.
  * Each micro-batch is the snapshot-to-snapshot append diff served by
  * [[Iceberg.appended]]; [[Iceberg.isAppendOnly]] guards every window
  * (a MoR delete file landing, a COW rewrite, or a schema change fails
  * loudly — an inserts-only stream cannot express retraction).
  * Options: `startingOrdinal` (default 0 = replay from the beginning),
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
      : (String, StructType) =
    ("graft-iceberg", schema.getOrElse(
      Iceberg.snapshot(ctx.sparkSession, pathOf(parameters)).schema))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergLogSource(ctx, pathOf(parameters),
      parameters.get("startingOrdinal").map(_.toLong).getOrElse(0L),
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong).getOrElse(1L))
}

class IcebergLogSource(ctx: SQLContext, path: String, startOrdinal: Long,
    maxPerTrigger: Long) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  require(maxPerTrigger >= 1, "maxSnapshotsPerTrigger must be >= 1")
  private val spark = ctx.sparkSession

  override val schema: StructType = Iceberg.snapshot(spark, path).schema

  /** Highest ordinal handed out; 0 = nothing yet (ordinals are
    * 1-based into the timestamp-ordered history).
    */
  @volatile private var seen: Long = startOrdinal
  @volatile private var availableTarget: Option[Long] = None

  private def ordinals: Seq[Long] = Iceberg.snapshotIds(path)

  override def prepareForTriggerAvailableNow(): Unit = {
    availableTarget = Some(ordinals.size.toLong)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val n = ordinals.size.toLong
    if (n == 0) null else LongOffset(n)
  }

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val latest = availableTarget.getOrElse(ordinals.size.toLong)
    if (latest == 0) null
    else {
      if (startOffset != null) seen = math.max(seen, verAny(startOffset))
      val next = math.min(latest, seen + maxPerTrigger)
      if (next > seen) seen = next
      if (seen <= 0) null else LongOffset(seen)
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

  override def getOffset: Option[Offset] = {
    val latest = ordinals.size.toLong
    if (latest == 0) None
    else {
      val next = math.min(latest, seen + maxPerTrigger)
      if (next > seen) seen = next
      if (seen <= 0) None else Some(LongOffset(seen))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val afterOrd = start.map(ver).getOrElse(startOrdinal)
    val toOrd = ver(end)
    seen = math.max(seen, toOrd)
    val ids = ordinals
    val toId = ids(toOrd.toInt - 1)
    val g = org.apache.spark.sql.graft.GraftSql
    val batch =
      if (afterOrd <= 0) Iceberg.snapshot(spark, path, Some(toId))
      else {
        val afterId = ids(afterOrd.toInt - 1)
        // appended() requires a stable delete-file set and equal
        // schemas across the window — exactly the streamable contract
        // (MoR deletes/rewrites/renames fail loudly inside it)
        require(Iceberg.isAppendOnly(spark, path, afterId, toId),
          s"graft-iceberg stream: snapshots ($afterId, $toId] of $path " +
            "are not pure appends (a row-level delete, rewrite, or " +
            "schema change landed) — an inserts-only stream cannot " +
            "express retraction; rebase the consumer and restart, or " +
            "maintain through the signed seam " +
            "(graft.ivm.IcebergSnapshots.signedRows)")
        Iceberg.appended(spark, path, afterId, Some(toId))
      }
    // flag ONLY the log-backed scan streaming: a MoR batch also
    // contains the delete-file side as a plain batch scan, and
    // flagging it too would turn the anti-join into an (unsupported)
    // stream-stream join — the delete side is genuinely batch data
    val marked = g.analyzed(batch).transform {
      case lr: LogicalRelation if lr.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.isInstanceOf[graft.sources.LogFileIndex] =>
        lr.copy(isStreaming = true)
    }
    if (marked.isStreaming) g.ofRows(spark, marked)
    else g.emptyStreaming(spark, schema)
  }

  override def commit(end: Offset): Unit = {
    seen = math.max(seen, ver(end)); ()
  }

  override def stop(): Unit = ()
}
