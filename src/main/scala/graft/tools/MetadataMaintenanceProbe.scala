package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sources.{DeltaLake, Iceberg}

/** Scale probe for the r17 METADATA-MAINTENANCE closers (dev tool, NOT
  * part of the declared surface): measures what the maintenance calls
  * actually buy, so their scale claims carry numbers.
  *
  *  - DELTA LOG CLEANUP: a `commits`-commit log (default 2,000 — tiny
  *    commits, synthesized JSON like [[LogReplayProbe]]; replay never
  *    opens data files) is folded before and after
  *    `stageCheckpoint` + `cleanLog`. The before-cost is commit-COUNT
  *    dominated (2,000 file opens + JSON parses); the after-cost is one
  *    parquet checkpoint read + the head commit.
  *
  *  - ICEBERG MANIFEST REWRITE: `appends` real single-file appends
  *    (default 80) leave one manifest each; the snapshot fold reads
  *    every manifest Avro file per planning pass. `rewriteManifests`
  *    folds them into one; the fold is re-timed.
  *
  * Usage: runMain graft.tools.MetadataMaintenanceProbe [commits] [appends]
  */
object MetadataMaintenanceProbe {
  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(2000)
    val appends = args.drop(1).headOption.map(_.toInt).getOrElse(80)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def ms(f: => Any): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e6
    }
    def med3(f: => Any): Double = Seq.fill(3)(ms(f)).sorted.apply(1)

    // ---- Delta: many-tiny-commit log, checkpoint + clean ----
    val dDir = Files.createTempDirectory("graft_mdm_delta").toString
    val logDir = Paths.get(dDir, "_delta_log")
    Files.createDirectories(logDir)
    val schema =
      """{\"type\":\"struct\",\"fields\":[
        |{\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
        .stripMargin.replace("\n", "")
    (0 until commits).foreach { c =>
      val sb = new StringBuilder
      if (c == 0) {
        sb.append("""{"protocol":{"minReaderVersion":1,""" +
          """"minWriterVersion":2}}""" + "\n")
        sb.append(s"""{"metaData":{"id":"probe","format":""" +
          s"""{"provider":"parquet","options":{}},""" +
          s""""schemaString":"$schema",""" +
          s""""partitionColumns":[],"configuration":{}}}""" + "\n")
      }
      sb.append(s"""{"add":{"path":"part-$c.parquet",""" +
        s""""partitionValues":{},"size":1048576,""" +
        s""""modificationTime":1700000000000,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":100,\\"minValues\\":""" +
        s"""{\\"k\\":${c * 100}},\\"maxValues\\":""" +
        s"""{\\"k\\":${c * 100 + 99}}}"}}""" + "\n")
      Files.writeString(logDir.resolve(f"$c%020d.json"), sb.toString)
    }
    val tBefore = med3 { DeltaLake.snapshot(spark, dDir).schema }
    println(f"delta fold, $commits%d JSON commits        $tBefore%8.1f ms")
    val head = DeltaLake.latestVersion(spark, dDir)
    val tCkpt = ms { DeltaLake.stageCheckpoint(spark, dDir, head) }
    val cleaned = DeltaLake.cleanLog(dDir).size
    val tAfter = med3 { DeltaLake.snapshot(spark, dDir).schema }
    println(f"delta checkpoint write                $tCkpt%8.1f ms")
    println(f"delta fold, checkpoint + 1 commit     $tAfter%8.1f ms " +
      f"($cleaned%d log files cleaned, ${tBefore / tAfter}%.1fx faster)")

    // ---- Iceberg: many-manifest table, rewrite_manifests ----
    val iDir = Files.createTempDirectory("graft_mdm_ice").toString
    (0 until appends).foreach { i =>
      Iceberg.write(spark, iDir,
        Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1))
    }
    val (d0, _) = Iceberg.manifestCounts(iDir)
    val tIceBefore = med3 { Iceberg.snapshot(spark, iDir).schema }
    println(f"iceberg fold, $d0%d manifests           $tIceBefore%8.1f ms")
    val tRw = ms { Iceberg.rewriteManifests(spark, iDir) }
    val (d1, _) = Iceberg.manifestCounts(iDir)
    val tIceAfter = med3 { Iceberg.snapshot(spark, iDir).schema }
    println(f"iceberg rewrite_manifests             $tRw%8.1f ms")
    println(f"iceberg fold, $d1%d manifest             $tIceAfter%8.1f ms " +
      f"(${tIceBefore / tIceAfter}%.1fx faster)")
    spark.stop()
  }
}
