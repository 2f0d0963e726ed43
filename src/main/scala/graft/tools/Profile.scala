package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-job time attribution for one query's timed pass (guide §1/§7):
  * `runMain graft.tools.Profile <sfDir> <query...>` builds the same
  * session as Bench, pre-stages fixtures exactly like Bench's staging
  * pass, then runs each named query twice (cold + warm) with a listener
  * recording every Spark job's wall time, stage count, task count and
  * callsite, and prints the warm pass's breakdown sorted by cost. This is
  * the measure-first instrument: it tells whether a 3 s query is one slow
  * job (plan problem) or thirty 100 ms jobs (barrier/fixed-cost problem),
  * which the bench total cannot distinguish.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Tables.init(spark)

    final case class JobRec(id: Int, var desc: String, var ms: Long = -1,
        var stages: Int = 0, var tasks: Int = 0, var start: Long = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    var recording = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (recording) synchronized {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobs(e.jobId) = JobRec(e.jobId, desc, start = e.time)
          // stage→job map from the job's own stage list: concurrent jobs
          // (AQE broadcast exchanges overlap even in local mode) would be
          // misattributed by a last-started-job heuristic
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (recording) synchronized {
          jobs.get(e.jobId).foreach(r => r.ms = e.time - r.start)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (recording) synchronized {
          stageToJob.get(e.stageInfo.stageId)
            .flatMap(jobs.get).foreach { r =>
              r.stages += 1; r.tasks += e.stageInfo.numTasks
              if (r.desc == "?") r.desc = e.stageInfo.name.take(140)
            }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // stage fixtures like Bench does
    names.foreach { n =>
      try { SparkEntry.queries(n)(spark, sfDir); () }
      catch { case e: Throwable => System.err.println(s"stage $n: $e") }
    }

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def pass(label: String): Double = {
        jobs.clear(); stageToJob.clear(); recording = true
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        recording = false
        // listener bus is async; give it a beat to drain
        Thread.sleep(300)
        val snap = jobs.values.toVector
        val counted = snap.map(_.ms).filter(_ >= 0).sum / 1000.0
        println(f"\n===== $n $label: $secs%.3f s, ${snap.size} jobs " +
          f"(sum ${counted}%.3f s accounted) =====")
        snap.sortBy(-_.ms).take(40).foreach { r =>
          println(f"  ${r.ms}%6d ms  stages=${r.stages}%2d tasks=${r.tasks}%4d  ${r.desc.take(110)}")
        }
        secs
      }
      pass("cold")
      pass("warm")
      pass("warm2")
    }
    spark.stop()
  }
}
