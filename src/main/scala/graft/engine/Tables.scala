package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * `nanosAsLong` reads it as raw INT64 epoch-nanos instead. Deliberately
    * NOT converted to a timestamp column downstream: keeping the physical
    * long means range predicates (the events delta split) push down to
    * parquet row-group stats — a cast/expr wrapper would defeat pruning at
    * scale. Queries derive timestamps via `timestamp_micros(ts div 1000)`
    * (floor to µs, same truncation Spark applies when reading µs parquet).
    * Setting the flag here — rather than as a side effect of every
    * [[apply]] — keeps table reads free of session mutation (and of the
    * race two concurrently built sessions would hit).
    */
  def init(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts (epoch nanos, see above) as a µs-precision timestamp.
    * `div` is exact integer floor-division — a double-rounding `/` could be
    * off by 1µs on epoch-sized longs.
    */
  def tsMicros: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
}
