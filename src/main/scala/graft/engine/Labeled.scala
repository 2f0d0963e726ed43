package graft.engine

import org.apache.spark.sql.SparkSession

/** Job labelling (optimization guide §1.5): every internal ACTION the
  * engine runs outside the user's own final sink — delta-frame pins,
  * commit file landings, stats collection, DML probes — sets a job
  * description, so the Spark UI / listener-based profiling attributes
  * fixed costs to the machinery that spends them instead of a wall of
  * anonymous micro-jobs. Descriptions are thread-local; the previous
  * value is restored so user-set labels survive nested machinery calls.
  */
object Labeled {
  def job[T](spark: SparkSession, label: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"graft: $label")
    try body finally sc.setJobDescription(prev)
  }
}
