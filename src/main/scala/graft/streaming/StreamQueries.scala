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
             |ORDER BY day, hr, event_type""".stripMargin))
  )
}
