package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.engine.{QueryDef, Tables}

/** Declared queries executed through the Structured Streaming RUNTIME — the
  * streaming twins (SURVEY §2E/§2G/§2I) pinned against the DuckDB oracle
  * surface, not just MemoryStream specs.
  *
  * The replay harness: stage the batch table as N range-partitioned parquet
  * files, stream the staged directory with `maxFilesPerTrigger=1` under
  * `Trigger.AvailableNow`, and read the final sink generation back. The
  * micro-batch SCHEDULE (file arrival order) is not pinned — the queries
  * declared here are ones whose final state is schedule-independent
  * (complete-mode aggregation: per-key decimal/count state merges
  * associatively across batches), so the result is deterministic and
  * hash-checkable while still exercising the real incremental path: state
  * store writes per batch, cross-batch merge, event-time machinery.
  *
  * Scale shape: the staged replay is the harness, not the deployment — a
  * production caller hands [[EventStreams.hourlyCounts]] a live source and
  * an append/update sink. Nothing here collects data on the driver: the
  * sink is a parquet overwrite per generation (aggregate-sized — hours ×
  * event types — bounded by the time span, not the corpus).
  */
object StreamQueries {

  val all: Seq[QueryDef] = Seq(

    // the streaming twin of `events_hourly`, run through the runtime: the
    // state store carries (window, event_type) -> (count, decimal sum)
    // across micro-batches; complete mode emits the merged view each
    // batch and the last generation equals the full-table aggregate
    QueryDef("stream_hourly",
      (s, d) => {
        val stage = Files.createTempDirectory("graft_stream_stage")
          .toFile.getAbsolutePath
        val sink = Files.createTempDirectory("graft_stream_sink")
          .toFile.getAbsolutePath
        // stage with the ns->µs conversion applied so the stream schema is
        // a plain TIMESTAMP(MICROS) parquet column (the nanosAsLong flag
        // only concerns the raw testdata layout)
        Tables(s, d, "events")
          .select(Tables.tsMicros.as("tsm"), col("event_type"), col("value"))
          .repartitionByRange(4, col("tsm"))
          .write.mode("overwrite").parquet(stage)
        val src = s.readStream
          .schema("tsm TIMESTAMP, event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", "1")
          .parquet(stage)
        val counts = src
          .withWatermark("tsm", "2 hours")
          .groupBy(window(col("tsm"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast(DecimalType(18, 2))).as("dec_sum"))
        val q = counts.writeStream
          .outputMode("complete")
          .option("checkpointLocation", s"$sink-ckpt")
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("overwrite").parquet(sink); ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(to_date(col("window.start")).as("day"),
            hour(col("window.start")).cast("long").as("hr"),
            col("event_type"), col("cnt"),
            col("dec_sum").cast("double").as("sum_value"))
          .orderBy("day", "hr", "event_type")
      },
      Some("""SELECT CAST(ts AS DATE) AS day,
             |  CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hr, event_type,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY day, hr, event_type""".stripMargin)),

    // STATEFUL sessionization through the runtime (round 5): native
    // session_window aggregation — the state store holds per-user OPEN
    // session intervals that micro-batches extend or MERGE (an event
    // bridging two stored sessions collapses them). Interval merging is
    // associative and order-independent, so the complete-mode final
    // generation is schedule-independent and hash-checkable against the
    // batch derivation. Session semantics: a gap >= 30 min starts a new
    // session (Spark's session window is [ts, ts+gap) exclusive — the
    // oracle's break condition says >= to match). Emitted bounds are
    // min/max EVENT times (plain aggregates riding the session state), not
    // the gap-padded window.end, keeping the oracle engine-portable.
    QueryDef("stream_sessions",
      (s, d) => {
        val stage = Files.createTempDirectory("graft_stream_stage")
          .toFile.getAbsolutePath
        val sink = Files.createTempDirectory("graft_stream_sink")
          .toFile.getAbsolutePath
        Tables(s, d, "events")
          .select(Tables.tsMicros.as("tsm"), col("user_id"), col("value"))
          .repartitionByRange(4, col("tsm"))
          .write.mode("overwrite").parquet(stage)
        val src = s.readStream
          .schema("tsm TIMESTAMP, user_id BIGINT, value DOUBLE")
          .option("maxFilesPerTrigger", "1")
          .parquet(stage)
        // NO watermark: session_window's pre-merge LATE-ROW FILTER applies
        // even under complete mode (unlike plain windowed aggregation), and
        // the replay harness does not pin file arrival order — a
        // later-time file processed first would silently drop every
        // earlier event (observed: 4944/10000 events survived). Complete
        // mode needs no eviction; a production deployment with an
        // append/update sink is where the watermark belongs (the
        // stream_hourly twin above exercises that machinery).
        val sessions = src
          .groupBy(session_window(col("tsm"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 2))).as("dec_sum"),
            min(col("tsm")).as("first_ts"), max(col("tsm")).as("last_ts"))
        val q = sessions.writeStream
          .outputMode("complete")
          .option("checkpointLocation", s"$sink-ckpt")
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("overwrite").parquet(sink); ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("user_id"),
            unix_micros(col("first_ts")).as("start_us"),
            unix_micros(col("last_ts")).as("end_us"),
            col("n_events"),
            col("dec_sum").cast("double").as("sum_value"))
          .orderBy("user_id", "start_us")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS tus, value FROM events),
             |m AS (
             |  SELECT user_id, tus, value,
             |    CASE WHEN lag(tus) OVER w IS NULL
             |           OR tus - lag(tus) OVER w >= 1800000000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
             |s AS (
             |  SELECT user_id, tus, value,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY tus) AS sid
             |  FROM m)
             |SELECT user_id, MIN(tus) AS start_us, MAX(tus) AS end_us,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, start_us""".stripMargin))
  )
}
