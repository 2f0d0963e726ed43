package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/** Parallelism guard for CPU-heavy per-row stages (hashing, regex, decode).
  *
  * Scan parallelism equals input split count; a small single-file parquet
  * table therefore runs per-row compute on ONE core no matter how many the
  * executor has (measured: the sf0.1 shingle pipeline was 1-core-bound).
  * `spread` repartitions ONLY when the scan has fewer splits than the
  * cluster has slots — a 100 TB table with thousands of splits passes
  * through untouched, so this never adds a shuffle at scale.
  *
  * The split count is estimated from the scan relation's file footprint
  * (bytes / `spark.sql.files.maxPartitionBytes`, the same arithmetic file
  * partition planning uses) rather than `df.rdd.getNumPartitions`, which
  * would force a full extra physical planning of the query per call.
  * Non-file leaves (local relations, views over computed plans) count as
  * already-parallel, so `spread` stays a no-op for them.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedSplits(df) < p) df.repartition(p) else df
  }

  private def estimatedSplits(df: DataFrame): Long = {
    val maxSplit = math.max(1L, SQLConf.get.filesMaxPartitionBytes)
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.collectLeaves()
      .map {
        case lr: LogicalRelation =>
          lr.relation match {
            case fs: HadoopFsRelation =>
              fs.location.sizeInBytes / maxSplit + 1
            case _ => Long.MaxValue / 4
          }
        case _ => Long.MaxValue / 4
      }
      .foldLeft(0L)((a, b) => math.min(Long.MaxValue / 2, a + b))
  }
}
