package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query wall-clock probe (dev tool):
  * `runMain graft.tools.ProbeQuery <sfDir> <query>...` times each named
  * declared query twice (cold, warm) with the bench's noop-sink execution.
  */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.init(spark)
    names.foreach { n =>
      for (round <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"$n%-24s $round%-5s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
