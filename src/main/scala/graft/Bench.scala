package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failed queries are reported in a separate
  * `failed` list with value -1 (never silently timed as a success), and
  * the same JSON is also written to bench_out.json as a fallback in case
  * the driver's stdout parse trips on sbt log prefixes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Tables.init(spark)
    // Warm up before timing: session/codegen machinery + file listing and
    // parquet footers of every table, plus one pass through the agg/join/
    // window/decimal codegen paths, so the first measured query reflects
    // steady state rather than JVM startup.
    import graft.engine.Tables
    import org.apache.spark.sql.functions._
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    try {
      val warm = spark.range(100000).toDF("id")
        .withColumn("k", col("id") % 7)
        .withColumn("v", (col("id") % 100).cast("double"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("id")
      warm.groupBy("k")
        .agg(sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 2))),
          count(lit(1)))
        .join(warm.limit(7).select(col("k").as("k2")), col("k") === col("k2"))
        .count()
      warm.select(rank().over(w).as("rk")).filter(col("rk") <= 2).count()
      ()
    } catch { case _: Throwable => () }
    val names = SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // noop-sink write executes the FULL physical plan, final ORDER BY
      // included — a count() would let EliminateSorts drop each query's
      // top-level sort under the count aggregate, excluding real cost the
      // Verify/oracle path pays
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // The full per-query line outgrew the driver's tail-capture window at
    // 74 queries (BENCH_r04 parsed as null) — also print a compact summary
    // LAST so a bounded tail always contains a complete JSON object; the
    // full line lives in bench_out.json either way.
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${names.size},"failed":$failedJson,"sf":"$sfDir"}"""
    println(summary)
    Files.writeString(Paths.get("bench_out.json"), line)
    spark.stop()
  }
}
