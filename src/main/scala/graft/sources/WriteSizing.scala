package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, RepartitionOperation, Sort}

/** Size-targeted output partitioning for landed writes (optimization
  * guide §6, "output file sizing"): a landing write otherwise produces
  * one file per upstream partition, so a 10-partition scan of a small
  * source lands 10 tiny files — and every subsequent scan of the table
  * pays one task per file (`spark.sql.files.openCostInBytes` makes a
  * tiny file a whole partition), every commit carries 10 add actions,
  * and stats maps grow 10×. The partition count here derives from the
  * optimizer's size estimate (scale-adaptive: `ceil(bytes / target)`),
  * so the same code lands one file for a 1 MB insert and hundreds for
  * a 100 GB one; the target is `spark.graft.write.targetFileBytes`
  * (default 128 MiB — the production parquet sweet spot; the estimate
  * is the UNENCODED row size, biased high vs parquet on disk, which
  * errs toward more files, never fewer than the data warrants).
  *
  * Only ever coalesces DOWN (never adds a shuffle), and an explicit
  * repartition/coalesce at the frame root — looking through the
  * column-stamping Projects writers add — is a caller LAYOUT
  * INSTRUCTION (bucketing fixtures, compaction bin-packing, skew
  * spreads, `REPARTITION` hints) and is respected verbatim.
  */
object WriteSizing {

  def coalesceForWrite(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.conf
      .get("spark.graft.write.targetFileBytes", (128L << 20).toString)
      .toLong
    if (target <= 0) return df // conf'd off
    val plan = df.queryExecution.optimizedPlan
    if (explicitLayout(plan)) return df
    val est = plan.stats.sizeInBytes
    // unknown/absurd estimates (default join stats multiply) stay put
    if (!est.isValidLong || est <= 0) return df
    val want = math.max(1L, (est.toLong + target - 1) / target)
    // coalesce never raises the partition count, so a `want` at or above
    // the current count is a no-op — which lets us skip asking the plan
    // for its partition count (on an AQE plan that would EXECUTE its
    // shuffle stages, a full extra run of the query before the write)
    df.coalesce(math.min(want, Int.MaxValue.toLong).toInt)
  }

  private def explicitLayout(p: LogicalPlan): Boolean = p match {
    case _: RepartitionOperation => true
    case pr: Project => explicitLayout(pr.child)
    // z-order/clustering writers put a partition-local Sort above their
    // repartitionByRange — that layout is load-bearing too
    case s: Sort => explicitLayout(s.child)
    case _ => false
  }
}
