package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ivm.Ivm

/** Library-surface demo/smoke of the IVM API: the executed-delta identity
  * `delta(Q) == Q(full) − Q(base)`, the fail-fast envelope, and alias
  * transparency. `runMain graft.tools.IvmDemo [sfDir]`.
  */
object IvmDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.init(spark)

    val customer = Tables(spark, sfDir, "customer")
    val nation = Tables(spark, sfDir, "nation")

    // 1. fail-fast: aggregates are outside the delta envelope
    try {
      Ivm.delta(customer.groupBy("c_nationkey").count())
      println("FAILFAST: no error (BAD)")
    } catch {
      case e: UnsupportedOperationException =>
        println(s"FAILFAST OK: ${e.getMessage}")
    }

    // 2. executed identity on the join: delta(Q) == Q(full) − Q(base)
    val q = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"), "inner")
      .select(col("c_custkey"), col("n_name"))
    val full = q.count()
    val dq = Ivm.delta(q).count()
    val base = customer.filter(expr("NOT (c_custkey % 10 = 0)"))
      .join(nation.filter(expr("NOT (n_nationkey % 5 = 0)")),
        col("c_nationkey") === col("n_nationkey"), "inner")
      .count()
    println(s"IDENTITY: full=$full delta=$dq base=$base ok=${full - base == dq}")

    // 3. alias transparency: `customer AS c` resolves the customer source
    println(s"ALIAS OK: rows=${Ivm.delta(customer.as("c")).count()}")

    // 4. SQL entry point (the reference's own path, mod.rs:225): delta of a
    // plan produced by the SQL parser/analyzer rather than the DataFrame API
    customer.createOrReplaceTempView("customer")
    val sqlDelta = Ivm.delta(
      spark.sql("SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0"))
    println(s"SQL OK: rows=${sqlDelta.count()}")

    // 5. aggregate maintenance (IvmAgg): merge(Q(base), δpartial) == Q(full)
    val aggQ = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("c_nationkey").agg(count(lit(1)).as("cnt"))
    val baseCust = customer.filter(expr("NOT (c_custkey % 10 = 0)"))
    val maintained = graft.ivm.IvmAgg.maintain(aggQ(baseCust), aggQ(customer))
    val aggOk = maintained.exceptAll(aggQ(customer)).isEmpty &&
      aggQ(customer).exceptAll(maintained).isEmpty
    println(s"AGG OK: groups=${maintained.count()} ok=$aggOk")

    // 6. self-serve ladder: maintainAuto routes by query shape
    val routes = Seq(
      "envelope" -> Ivm.maintainAuto(customer.select("c_custkey")),
      "aggregate" -> Ivm.maintainAuto(aggQ(customer)),
      "left-join" -> Ivm.maintainAuto(
        customer.join(nation, col("c_nationkey") === col("n_nationkey"),
          "left")),
      "window-keyed" -> Ivm.maintainAuto(
        customer.select(col("c_custkey"),
          org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("c_nationkey").orderBy("c_custkey")).as("rk"))),
      "window-global" -> Ivm.maintainAuto(
        customer.select(col("c_custkey"),
          org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy("c_custkey")).as("rk"))),
      "agg-join" -> Ivm.maintainAuto(
        aggQ(customer).join(nation,
          col("c_nationkey") === col("n_nationkey"), "inner")),
      "two-level" -> Ivm.maintainAuto(
        aggQ(customer).join(nation,
            col("c_nationkey") === col("n_nationkey"), "inner")
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("n_nations"),
            sum(coalesce(col("cnt"), lit(0L))).as("n_cust"))))
      .map {
        case (n, Ivm.AppendDelta(_))  => s"$n->delta"
        case (n, Ivm.MergePartial(_)) => s"$n->merge"
        case (n, Ivm.ApplySigned(_))  => s"$n->signed"
        case (n, Ivm.DiffRows(_))     => s"$n->diff"
      }
    println(s"AUTO OK: ${routes.mkString(" ")}")

    // 7. snapshot watermark: advance the cut, the delta empties
    graft.ivm.Snapshots.track("customer", "c_custkey")
    val before = Ivm.delta(spark.table("customer")).count()
    graft.ivm.Snapshots.advance("customer", customer)
    val after = Ivm.delta(spark.table("customer")).count()
    println(s"SNAPSHOT OK: before=$before after=$after ok=${after == 0}")

    // 8. file-append log (FileSnapshots): the delta is appended FILES —
    // no data column consulted — and the mtime cut prunes the δ arm's
    // scan at file-listing time (numFiles < total files in the log)
    val logDir = java.nio.file.Files.createTempDirectory("ivmdemo_flog")
      .toString + "/log"
    def readLog() = spark.read.parquet(logDir)
    customer.limit(50).write.mode("append").parquet(logDir)
    stampDir(logDir, 1000000L)
    graft.ivm.FileSnapshots.track("log", logDir)
    graft.ivm.FileSnapshots.advance(spark, "log")
    customer.limit(7).write.mode("append").parquet(logDir)
    stampDir(logDir, 2000000L)
    val dlog = Ivm.delta(readLog().select("c_custkey"))
    val dRows = dlog.count()
    val (dFiles, allFiles) = scannedFiles(dlog)
    println(s"FILELOG OK: deltaRows=$dRows ok=${dRows == 7} " +
      s"filesScanned=$dFiles/$allFiles pruned=${dFiles < allFiles}")

    spark.stop()
  }

  /** Stamp every data file currently newer than `millis` down to it —
    * deterministic mtime ticks for the append-log demo.
    */
  private def stampDir(dir: String, millis: Long): Unit = {
    val it = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator()
    while (it.hasNext) {
      val f = it.next()
      if (java.nio.file.Files.getLastModifiedTime(f).toMillis >= millis)
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(millis))
    }
  }

  /** (files planned by the frame's parquet scans, files in the source) —
    * after executing the frame, so AQE has finalized the plan.
    */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    df.collect()
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case f: FileSourceScanExec => Seq(f)
      }.flatten
    val fs = scans(df.queryExecution.executedPlan)
    val planned = fs.map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    val total = fs.headOption
      .map(_.relation.location.inputFiles.length.toLong).getOrElse(0L)
    (planned, total)
  }
}
