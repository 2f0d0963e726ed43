package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All scans are plain parquet reads so Catalyst's datasource V1/V2 path
  * applies predicate pushdown + column pruning; at cluster scale the same
  * call reads a partitioned table directory unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session init for reading the testdata layout — call ONCE at session
    * construction (every graft main and the test fixture do).
    *
    * `events.ts` has shipped under two physical encodings: parquet
    * TIMESTAMP(NANOS) — which Spark's reader rejects unless `nanosAsLong`
    * surfaces it as a raw INT64 epoch-nanos column — and plain
    * `timestamp[us]` (TIMESTAMP_NTZ in Spark). The flag is always set: it
    * only affects nanos-encoded files, so on µs data it is inert, and with
    * it either encoding loads without session surgery. Everything
    * downstream derives time via the type-adaptive [[tsUs]]/[[tsMicros]]
    * helpers instead of assuming one encoding. Setting the flag here —
    * rather than as a side effect of every [[apply]] — keeps table reads
    * free of session mutation (and of the race two concurrently built
    * sessions would hit).
    */
  def init(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The µs-long derivation for a `ts` column of physical type `dt` —
    * exposed so specs can pin the per-encoding arithmetic directly.
    *
    *  - INT64 epoch-nanos (legacy `nanosAsLong` read): `ts div 1000`.
    *    `div` is exact integer floor-division — a double-rounding `/`
    *    could be off by 1µs on epoch-sized longs.
    *  - TIMESTAMP_NTZ (parquet `timestamp[us]`, no zone): reinterpret the
    *    wall-clock micros via a cast to TIMESTAMP. Every graft session
    *    pins `spark.sql.session.timeZone=UTC`, so the cast is an identity
    *    on the underlying µs value — matching DuckDB's `epoch_us(ts)`,
    *    which reads the naive timestamp's micros as-is.
    *  - TIMESTAMP (µs, UTC-adjusted): `unix_micros` directly.
    *
    * All three are codegen'd arithmetic on the scan output — nothing here
    * blocks column pruning, and range predicates against the RAW column
    * (the delta split) still reach parquet row-group stats.
    */
  def tsUsFor(dt: DataType): Column = dt match {
    case LongType         => expr("ts div 1000")
    case TimestampNTZType => expr("unix_micros(cast(ts as timestamp))")
    case TimestampType    => expr("unix_micros(ts)")
    case other => throw new IllegalStateException(
      s"events.ts: unsupported physical type $other " +
        "(expected INT64 epoch-nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
  }

  /** `events.ts` as an epoch-µs BIGINT, adaptive to the frame's physical
    * encoding (see [[tsUsFor]]). Pass the frame the column is selected
    * from — schema inspection happens once at plan-build time.
    */
  def tsUs(df: DataFrame): Column = tsUsFor(df.schema("ts").dataType)

  /** `events.ts` as a µs-precision TIMESTAMP, adaptive to the encoding.
    * Always TimestampType (streaming watermarks/windows and the hourly
    * rollup agree on one logical type regardless of the file layout).
    */
  def tsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("timestamp_micros(ts div 1000)")
    case TimestampNTZType => expr("cast(ts as timestamp)") // UTC: identity
    case TimestampType    => col("ts")
    case other => throw new IllegalStateException(
      s"events.ts: unsupported physical type $other")
  }
}
