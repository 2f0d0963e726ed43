package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value): the streaming counterpart of
  * the batch `events_hourly` rollup, plus stateful sessionization.
  *
  * The reference is a batch plan-rewrite prototype with no streaming runtime
  * (SURVEY.md §2C); this module supplies the Spark-native streaming surface
  * a user of the inherited engine would reach for — `readStream` in,
  * watermark + windowed aggregation, `flatMapGroupsWithState` for custom
  * session state, `writeStream` out.
  *
  * Scale notes: state is partitioned by grouping key across executors
  * (hash shuffle), the watermark bounds state size (late rows beyond it are
  * dropped and their state evicted), and each micro-batch is an ordinary
  * Catalyst plan — pushdown/codegen apply to the stateless prefix.
  */
/** One raw event (a typed row of the `events` stream). */
final case class Event(ts: java.sql.Timestamp, userId: Long,
    eventType: String, value: Double)

/** One closed user session emitted by [[EventStreams.sessionize]]. */
final case class Session(userId: Long, nEvents: Long, totalValue: Double,
    startTs: java.sql.Timestamp, endTs: java.sql.Timestamp)

/** Per-user in-flight session state (top-level: state-store encoders
  * codegen against the class, which must be publicly constructible).
  */
final case class SessionState(nEvents: Long, totalValue: Double,
    startMs: Long, lastMs: Long)

/** One side-tagged input row for [[EventStreams.asofMatch]]: `isLeft` rows
  * are probes (clicks), the rest are the matched side (purchases).
  */
final case class AsofIn(userId: Long, ts: java.sql.Timestamp,
    isLeft: Boolean, id: Long, value: Double)

/** One finalized as-of match: the probe row plus the latest at-or-before
  * right row, or None when nothing preceded it.
  */
final case class AsofMatched(userId: Long, clickId: Long, clickMs: Long,
    matchId: Option[Long], matchValue: Option[Double])

/** Per-user as-of buffer: pending probes (finalized when the watermark
  * passes their timestamp) and candidate right rows (all above the
  * watermark, plus the single latest at-or-below — older ones are
  * dominated for every future probe).
  */
final case class AsofBuf(purchases: List[(Long, Long, Double)],
    clicks: List[(Long, Long)])

object EventStreams {

  /** Tumbling-window event counts with a watermark: the streaming twin of
    * the batch `events_hourly` query. `ts` must be a TimestampType column.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Streaming exact dedup — the streaming twin of the batch `dedup_exact`
    * query: drop re-deliveries/duplicates of the same content within the
    * watermark horizon, keyed on the md5 DIGEST of the dedup columns (16
    * bytes of state per distinct key, never the content itself — the same
    * shuffle-the-digest design as the batch path).
    *
    * Uses `dropDuplicatesWithinWatermark`, whose key state is EVICTED once
    * the watermark passes it — bounded state (watermark window × arrival
    * rate), unlike plain `dropDuplicates`, whose state grows with all keys
    * ever seen and cannot survive an unbounded stream. The documented
    * trade-off: a duplicate arriving after its key was evicted is emitted
    * again — at-least-once dedup, exactly what a corpus-ingest pipeline
    * wants when the upstream redelivery window is known.
    *
    * `rows` must carry an event-time `ts` column; `keyCols` are the content
    * identity (e.g. `text` for documents, `event_id` for an event feed).
    */
  def dedupWithinWatermark(rows: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame = {
    require(!rows.columns.contains("dedup_digest"),
      "dedup_digest is reserved by dedupWithinWatermark")
    rows
      // to_json(struct(...)) is an unambiguous multi-column serialization
      // (a separator-join would collide when values contain the separator)
      .withColumn("dedup_digest",
        md5(to_json(struct(keyCols.map(col): _*)).cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("dedup_digest")
      .drop("dedup_digest")
  }

  /** Stream–stream inner join with an event-time correlation bound: pair
    * each right-stream event with left-stream events of the same user that
    * happened in the `withinSeconds` window before it (attribution-style
    * "purchase follows click"). Watermarks on BOTH sides + the time-range
    * predicate let Spark expire join state — without them stream-stream
    * join state grows forever; with them state is bounded by
    * watermark × arrival rate. `carry` names extra columns to pass through
    * from both sides (as `l_<name>` / `r_<name>`) — e.g. event ids, so a
    * downstream sink has a stable pair identity.
    */
  def correlate(left: DataFrame, right: DataFrame,
      withinSeconds: Long, watermark: String = "1 hour",
      carry: Seq[String] = Nil): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id").as("l_user") +: col("ts").as("l_ts") +:
        col("event_type").as("l_type") +:
        carry.map(c => col(c).as(s"l_$c")): _*)
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user") +: col("ts").as("r_ts") +:
        col("event_type").as("r_type") +:
        carry.map(c => col(c).as(s"r_$c")): _*)
    l.join(r,
      col("l_user") === col("r_user") &&
        col("l_ts") <= col("r_ts") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL $withinSeconds SECONDS"),
      "inner")
  }

  /** Streaming as-of join (the twin of [[graft.engine.AsofJoin]]): each
    * probe row is matched to the LATEST right row at-or-before its event
    * time within the same user, with out-of-order arrival handled by
    * buffering until the watermark passes the probe's timestamp — only
    * then is "no earlier right row can still arrive" guaranteed, so the
    * emitted match is FINAL (correctness over latency; the emission delay
    * is exactly the watermark).
    *
    * State per user is bounded: pending probes live only inside the
    * watermark window, and buffered right rows are pruned to those above
    * the watermark plus the single latest at-or-below it (any older row is
    * dominated for every future probe, whose timestamp must exceed the
    * watermark). Users idle past `retentionMs` are evicted wholesale.
    */
  def asofMatch(events: Dataset[AsofIn], watermark: String = "30 minutes",
      retentionMs: Long = 60L * 60 * 1000): Dataset[AsofMatched] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[AsofBuf, AsofMatched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[AsofIn], state: GroupState[AsofBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          var buf = state.getOption.getOrElse(AsofBuf(Nil, Nil))
          rows.foreach { e =>
            val t = e.ts.getTime
            buf =
              if (e.isLeft) buf.copy(clicks = (t, e.id) :: buf.clicks)
              else buf.copy(purchases = (t, e.id, e.value) :: buf.purchases)
          }
          // probes at-or-below the watermark are final: no right row with a
          // smaller timestamp can still arrive
          val (ready, pending) = buf.clicks.partition(_._1 <= wm)
          val out = ready.sortBy(c => (c._1, c._2)).map { case (cMs, cId) =>
            val m = buf.purchases.filter(_._1 <= cMs)
              .sortBy(p => (p._1, p._2)).lastOption
            AsofMatched(userId, cId, cMs, m.map(_._2), m.map(_._3))
          }
          // prune dominated right rows; keep the boundary candidate
          val boundary = buf.purchases.filter(_._1 <= wm)
            .sortBy(p => (p._1, p._2)).lastOption
          buf = AsofBuf(
            buf.purchases.filter(_._1 > wm) ++ boundary, pending)
          // evict only when nothing is buffered, or when a probe-less
          // buffer has sat past the retention horizon — a probe-wake
          // timeout must NOT drop buffered right rows: they are the match
          // candidates for the user's future probes
          val retentionExpired = pending.isEmpty && buf.purchases.nonEmpty &&
            wm >= buf.purchases.map(_._1).max + retentionMs
          if ((buf.purchases.isEmpty && buf.clicks.isEmpty) ||
              retentionExpired) {
            state.remove()
          } else {
            state.update(buf)
            // wake when the earliest pending probe finalizes, or (probe-less
            // buffers) when the retention horizon passes for eviction
            val wake =
              if (pending.nonEmpty) pending.map(_._1).min
              else buf.purchases.map(_._1).max + retentionMs
            state.setTimeoutTimestamp(math.max(wake, wm + 1))
          }
          out.iterator
      }
  }

  /** Gap-based sessionization: a user's session closes after `gapMs` of
    * event-time inactivity (enforced via event-time timeout against the
    * watermark). Emits one row per closed session.
    *
    * State per user is O(1) (four numbers), so total state is bounded by
    * |active users| — the design that survives 100 TB/day event volumes.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermark: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.nEvents, s.totalValue,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs)))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.nEvents + 1, s.totalValue + e.value,
                    s.startMs, math.max(s.lastMs, t)))
                case Some(s) =>
                  closed ::= Session(userId, s.nEvents, s.totalValue,
                    new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs))
                  cur = Some(SessionState(1L, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1L, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once the watermark passes last event + gap
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
