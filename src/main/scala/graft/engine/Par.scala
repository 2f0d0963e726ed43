package graft.engine

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy per-row stages (hashing, regex, decode).
  *
  * Scan parallelism equals input split count; a small single-file parquet
  * table therefore runs per-row compute on ONE core no matter how many the
  * executor has (measured: the sf0.1 shingle pipeline was 1-core-bound).
  * `spread` repartitions ONLY when the scan has fewer splits than the
  * cluster has slots — a 100 TB table with thousands of splits passes
  * through untouched, so this never adds a shuffle at scale.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
