package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for DRIVER-SIDE LOG REPLAY (dev tool, NOT part of the
  * declared surface) — the r16 verdict's one acknowledged architecture
  * ceiling: `LogState.adds` holds every live file's action on the
  * driver, the same design production Delta's snapshot state uses.
  * This probe SYNTHESIZES a Delta log of `N` add actions (default
  * 100k; hand-written commit JSON — replay never opens data files),
  * then measures what a 100k-file estate actually costs this driver:
  *
  *  - replay wall time (fold of 100 commits x 1k adds, stats JSON
  *    carried per file);
  *  - retained heap for the log-backed snapshot plan (GC-fenced
  *    before/after deltas — approximate by nature, printed as such);
  *  - full-scan plan time at 100k candidate files;
  *  - partition-pruned plan: files planned for a one-partition
  *    predicate (the per-file prune walk is the same one DML hit-file
  *    discovery runs, so this is the DELETE-planning cost too);
  *  - stats-pruned plan: files planned for a one-file key range via
  *    the per-file min/max check.
  *
  * Usage: runMain graft.tools.LogReplayProbe [nFiles] [outDir]
  */
object LogReplayProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dir = args.drop(1).headOption.getOrElse(
      Files.createTempDirectory("graft_logprobe").toString)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- synthesize: 100 commits x n/100 adds, partitioned by p
    // (100 partitions), keys range-clustered so one key range = one
    // file; every add carries realistic stats JSON and a fake size
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    val perCommit = math.max(1, n / 100)
    val schema =
      """{\"type\":\"struct\",\"fields\":[
        |{\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},
        |{\"name\":\"p\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
        .stripMargin.replace("\n", "")
    var written = 0
    var commit = 0
    val t0 = System.nanoTime()
    while (written < n) {
      val sb = new StringBuilder
      if (commit == 0) {
        sb.append("""{"protocol":{"minReaderVersion":1,""" +
          """"minWriterVersion":2}}""" + "\n")
        sb.append(s"""{"metaData":{"id":"probe","format":""" +
          s"""{"provider":"parquet","options":{}},""" +
          s""""schemaString":"$schema",""" +
          s""""partitionColumns":["p"],"configuration":{}}}""" + "\n")
      }
      var i = 0
      while (i < perCommit && written < n) {
        val lo = written.toLong * 1000L
        val hi = lo + 999L
        val part = written % 100
        sb.append(s"""{"add":{"path":"p=$part/part-$written.parquet",""" +
          s""""partitionValues":{"p":"$part"},"size":1048576,""" +
          s""""modificationTime":1700000000000,"dataChange":true,""" +
          s""""stats":"{\\"numRecords\\":1000,\\"minValues\\":""" +
          s"""{\\"k\\":$lo},\\"maxValues\\":{\\"k\\":$hi}}"}}""" + "\n")
        written += 1; i += 1
      }
      Files.writeString(logDir.resolve(f"$commit%020d.json"),
        sb.toString)
      commit += 1
    }
    println(f"synthesized $written%d adds in $commit%d commits " +
      f"(${(System.nanoTime() - t0) / 1e6}%.0f ms)")

    def gcHeap(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
    }
    def ms(f: => Any): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e6
    }
    def planFiles(df: org.apache.spark.sql.DataFrame): Long = {
      val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan
      plan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location
            .listFiles(s.partitionFilters, s.dataFilters)
            .map(_.files.length.toLong).sum
      }.getOrElse(-1L)
    }

    val dl = graft.sources.DeltaLake
    val h0 = gcHeap()
    // forcing .schema runs the full 100-commit action fold without
    // planning; the snapshot plan is then held alive for the heap delta
    val tReplay = ms { dl.snapshot(spark, dir).schema }
    val snap = dl.snapshot(spark, dir)
    val tPlanFull = ms { planFiles(snap) }
    val h1 = gcHeap()
    println(f"replay(fold only)          ${tReplay}%.0f ms")
    println(f"full plan ($n%d files)      ${tPlanFull}%.0f ms")
    println(f"retained heap (approx)     ${(h1 - h0) / 1048576.0}%.1f MiB")
    // prune walks — the same per-file evaluation DML hit-file
    // discovery runs over the candidate set
    val onePart = dl.snapshot(spark, dir).filter(col("p") === 7L)
    val tPart = ms { () }
    val fPart = planFiles(onePart)
    println(f"partition prune p=7        $fPart%d files " +
      f"(${ms(planFiles(onePart))}%.0f ms re-plan)")
    val oneRange = dl.snapshot(spark, dir)
      .filter(col("k") >= 500000L && col("k") <= 500500L)
    println(f"stats prune 1-file range   ${planFiles(oneRange)}%d " +
      f"files (${ms(planFiles(oneRange))}%.0f ms re-plan)")
    val _ = tPart
    spark.stop()
  }
}
