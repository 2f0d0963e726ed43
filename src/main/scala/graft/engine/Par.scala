package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/** Parallelism guard for CPU-heavy per-row stages (hashing, regex, decode).
  *
  * Scan parallelism equals input split count; a small single-file parquet
  * table therefore runs per-row compute on ONE core no matter how many the
  * executor has (measured: the sf0.1 shingle pipeline was 1-core-bound).
  * `spread` repartitions ONLY when the input has fewer partitions than the
  * cluster has slots — a 100 TB table with thousands of splits passes
  * through untouched, so this never adds a shuffle at scale.
  *
  * For a plain scan (optionally under Project/Filter/alias wrappers) the
  * split count is estimated from the relation's file footprint — bytes /
  * `spark.sql.files.maxPartitionBytes`, the same arithmetic file partition
  * planning uses — with NO extra physical planning. Any other plan shape
  * (post-shuffle, coalesced, local) falls back to the accurate
  * `rdd.getNumPartitions`, paying one planning pass: a 1-partition
  * post-aggregation frame must still be caught, which a leaf-bytes
  * estimate alone would miss.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (partitionEstimate(df) < p) df.repartition(p) else df
  }

  private def partitionEstimate(df: DataFrame): Long = {
    val plan = df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
    scanRelation(plan) match {
      case Some(fs) =>
        val maxSplit = math.max(1L, SQLConf.get.filesMaxPartitionBytes)
        fs.location.sizeInBytes / maxSplit + 1
      case None =>
        df.rdd.getNumPartitions.toLong
    }
  }

  /** The file relation of a pure scan plan, if that is what `plan` is. */
  private def scanRelation(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation => Some(fs)
          case _ => None
        }
      case Project(_, child) => scanRelation(child)
      case Filter(_, child) => scanRelation(child)
      case SubqueryAlias(_, child) => scanRelation(child)
      case _ => None
    }
}
