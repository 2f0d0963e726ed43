package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}

/** Shared mechanics of the two lakehouse SINKS ([[DeltaLogSink]],
  * [[IcebergLogSink]]) — one home so the hygiene rules cannot drift
  * between formats.
  */
private[streaming] object SinkSupport {

  /** The exactly-once identity for a sink: explicit `txnAppId`, else
    * the checkpoint location (the stable name a restarted query
    * keeps), else — only when the query genuinely has NO checkpoint —
    * a fresh UUID (no checkpoint = no restart semantics to protect).
    * A checkpoint configured through the SESSION DEFAULT
    * (`spark.sql.streaming.checkpointLocation` + queryName) never
    * reaches the sink's options map, and a silent UUID there would
    * turn a restart into DUPLICATED batches — fail loudly instead and
    * ask for an explicit identity.
    */
  def appIdOf(ctx: SQLContext,
      parameters: Map[String, String]): String =
    parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation")
        .map(p => "ckpt:" + new java.io.File(p).getAbsolutePath))
      .getOrElse {
        val sessionDefault = ctx.sparkSession.conf
          .getOption("spark.sql.streaming.checkpointLocation")
        require(sessionDefault.isEmpty,
          "this sink cannot see a session-default checkpoint location " +
            s"(${sessionDefault.getOrElse("")}): a restarted query " +
            "would re-deliver its last batch under a fresh random " +
            "identity and DUPLICATE it — set option(\"txnAppId\", ...) " +
            "or option(\"checkpointLocation\", ...) explicitly")
        java.util.UUID.randomUUID().toString
      }

  /** CATALOG-NAMED SINKS (`warehouse`+`table` options): each committed
    * batch ADVANCES the catalog pin to the produced table version, so
    * catalog readers see the stream's progress — the streaming twin of
    * the batch write bridge's re-pin. Monotone ([[graft.sources
    * .GraftCatalog.advancePin]]), so a replayed/skipped batch never
    * moves the pin backward. Path-named sinks get the no-op.
    */
  def pinAdvanceOf(parameters: Map[String, String]): Long => Unit =
    (for {
      name <- parameters.get("table")
      wh <- parameters.get("warehouse")
    } yield (v: Long) =>
      if (v >= 0L) {
        graft.sources.GraftCatalog.advancePin(wh, name, v); ()
      } else ()).getOrElse(_ => ())

  /** Re-plan the micro-batch once over its executed RDD
    * ([[org.apache.spark.sql.graft.GraftSql.batchify]]) and STRIP
    * column metadata inherited from a lake SOURCE (`parquet.field.id`
    * riding an Iceberg stream): written as-is, the batch's files
    * would carry a PARTIAL foreign id stamping that the id-matching
    * read path then mis-resolves. Each destination table's identity
    * starts clean; its own staging writer stamps a fresh complete
    * set.
    */
  def cleanBatch(data: DataFrame): DataFrame = {
    val b = org.apache.spark.sql.graft.GraftSql.batchify(data)
    b.select(b.schema.fields.toIndexedSeq.map(f =>
      org.apache.spark.sql.functions.col(f.name)
        .as(f.name, org.apache.spark.sql.types.Metadata.empty)): _*)
  }

  /** Split a `partitionSpec` option on TOP-LEVEL commas only —
    * transform specs (`bucket(8, id)`, `truncate(4, name)`) carry
    * commas inside their parentheses, and a bare split would shred
    * them into unparseable fragments.
    */
  def splitSpec(spec: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    spec.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}
