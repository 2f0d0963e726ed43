package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.pipeline.Dedup

/** Ad-hoc stage timing for the dedup_ngram ladder (dev tool). */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.init(spark)
    val docs = Tables(spark, dir, "documents")
    docs.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("shingleRows count") {
      Dedup.shingleRows(docs).count()
    }
    time("signatures(6)") {
      Dedup.signatures(docs, 6).count()
    }
    time("minhashCandidates(3,2)") {
      Dedup.minhashCandidates(docs, 3, 2).count()
    }
    time("full dedup_ngram query") {
      graft.SparkEntry.queries("dedup_ngram")(spark, dir).count()
    }
    spark.stop()
  }
}
