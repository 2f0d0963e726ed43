package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One file entry reconstructed from a table-format transaction log:
  * resolved absolute path, size/mtime, the log's partition values
  * (protocol string encoding), and the per-file stats JSON.
  */
final case class LogFile(path: String, size: Long, modificationTime: Long,
    partitionValues: Map[String, String], stats: Option[String]) {
  /** Stats parsed once per file — `listFiles` evaluates every pushed
    * filter against every candidate file, so per-leaf re-parsing is a
    * files × filters Jackson cost for nothing.
    */
  lazy val parsedStats: Option[com.fasterxml.jackson.databind.JsonNode] =
    stats.map(StatsSkip.parse)
}

/** A [[FileIndex]] backed by a transaction log's file list instead of a
  * filesystem listing — the Spark-native shape for lakehouse snapshot
  * reads, and the scale fix for the r8 per-partition-group union plan:
  * the snapshot is ONE `FileSourceScanExec` whose `PartitionFilters`
  * prune partition-value groups at planning/execution time, so plan size
  * is O(1) in partition cardinality (a 3650-partition date-partitioned
  * table plans exactly like a 5-partition one; the union plan grew a
  * scan arm per partition).
  *
  * Partition values are evaluated here from the LOG (never parsed from
  * paths — the Delta protocol stores them in the log and data files
  * don't carry the columns), and `listFiles` additionally applies
  * conservative per-file STATS SKIPPING to the pushed data filters via
  * `keepFile` — the production placement for min/max skipping: any
  * filter a query pushes onto the scan prunes files before a footer is
  * read, composing automatically with whatever predicate sits on top
  * (version cuts, user filters, join pushdowns).
  */
class LogFileIndex(
    spark: SparkSession,
    tableRoot: Path,
    files: Seq[LogFile],
    override val partitionSchema: StructType,
    keepFile: (Seq[Expression], LogFile) => Boolean)
  extends FileIndex {

  private val zone = spark.conf.get("spark.sql.session.timeZone")

  // partition-value strings cast once to the partition schema's types
  // (the protocol's serialization is the string form Cast understands)
  private def partRow(pv: Map[String, String]): InternalRow =
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
      pv.get(f.name).filter(_ != null) match {
        case Some(s) =>
          Cast(Literal(UTF8String.fromString(s), StringType), f.dataType,
            Option(zone)).eval(null)
        case None => null
      }
    })

  private lazy val dirs: Seq[(InternalRow, Seq[LogFile])] =
    files.groupBy(_.partitionValues).toSeq
      .map { case (pv, fs) => (partRow(pv), fs) }

  override def rootPaths: Seq[Path] = Seq(tableRoot)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected =
      if (partitionFilters.isEmpty) dirs
      else {
        // bind the partition predicate to the partition schema by NAME
        // (the filters reference the relation's output attributes) and
        // evaluate per value-group — log-level partition pruning
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.indexWhere(_.name == a.name)
            require(i >= 0, s"partition filter references non-partition " +
              s"column '${a.name}'")
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        }
        val pred = Predicate.createInterpreted(bound)
        dirs.filter { case (row, _) => pred.eval(row) }
      }
    selected.map { case (row, fs) =>
      val kept =
        if (dataFilters.isEmpty) fs else fs.filter(keepFile(dataFilters, _))
      PartitionDirectory(row, kept.map(f =>
        new FileStatus(f.size, false, 1, 128L * 1024 * 1024,
          f.modificationTime, new Path(f.path))).toArray)
    }
  }

  override def inputFiles: Array[String] = files.map(_.path).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = files.map(_.size).sum
}
