package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.hadoop.metadata.ColumnPath
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Per-file (rowCount, per-column (min, max)) read from parquet FOOTERS
  * instead of re-scanning the data (optimization guide §1.2/§6): every
  * commit path previously ran a second full read of the files it had just
  * written — scan + per-file aggregate + collect, a whole extra pass over
  * the committed bytes — purely to recompute statistics the parquet
  * writer already persisted in each file's footer. At 100 TB that second
  * pass doubles the write-side I/O of every commit; footer reads are
  * O(files), data-free, and exactly what production lakehouse writers do
  * (stats are collected at write time / from footers on convert).
  *
  * Equivalence with the replaced Spark aggregation:
  *  - `numRecords` is the exact footer row count.
  *  - min/max combine across row groups under the SAME ordering Spark's
  *    min/max aggregates use: natural numeric order, and for strings
  *    unsigned lexicographic UTF-8 byte order (parquet's UTF8 comparator
  *    == UTF8String's binary ordering; java.lang.String.compareTo is NOT
  *    that order above the BMP, so string winners are chosen on raw
  *    bytes and decoded only at the end).
  *  - a column whose every row group is all-null yields no bounds (the
  *    aggregate's null min/max was omitted the same way).
  *  - a row group with MISSING stats for a column (e.g. binary stats the
  *    writer dropped as oversized, or NaN-poisoned float stats) makes the
  *    whole column's bounds unknown — omitted, which the stats-skipping
  *    contract (prune only on proof) treats as "keep the file". The old
  *    path could emit bounds footers refuse; omission is always sound.
  *
  * Only top-level long/int/double/float/string columns are read — the
  * same envelope both formats' stat collectors declare.
  */
object FooterStats {

  private[sources] def statable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType => true
    case _ => false
  }

  /** Map each path to (rowCount, col -> (min, max)); zero-row files are
    * omitted (matching the replaced aggregate, which produced no group
    * for them). Values are boxed Long/Integer/Double/Float/String.
    */
  def parquetStats(spark: SparkSession, dataSchema: StructType,
      paths: Seq[String]): Map[String, (Long, Map[String, (Any, Any)])] = {
    if (paths.isEmpty) return Map.empty
    val cols = dataSchema.fields.filter(f => statable(f.dataType)).toSeq
    val conf = spark.sessionState.newHadoopConf()
    paths.map { p =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(p), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val n = blocks.map(_.getRowCount).sum
        val perCol = cols.flatMap { f =>
          val cp = ColumnPath.get(f.name)
          var known = true
          var lo: Any = null
          var hi: Any = null
          blocks.foreach { b =>
            if (known && b.getRowCount > 0) {
              b.getColumns.asScala.find(_.getPath == cp) match {
                case Some(cc) =>
                  val st = cc.getStatistics
                  if (st == null || st.isEmpty) known = false
                  else if (st.hasNonNullValue) {
                    val (mn, mx) = (st.genericGetMin, st.genericGetMax)
                    if (lo == null || less(f.dataType, mn, lo)) lo = mn
                    if (hi == null || less(f.dataType, hi, mx)) hi = mx
                  } else if (!(st.isNumNullsSet && st.getNumNulls == b.getRowCount)) {
                    // hasNonNullValue=false does NOT prove the row group is
                    // all-null: parquet-mr drops NaN-poisoned float/double
                    // min/max and oversized (>4KB) binary bounds while
                    // keeping null_count, leaving hasNonNullValue=false with
                    // non-null values present. Only a null_count equal to
                    // the row count proves all-null; anything else makes the
                    // column's bounds unknowable from footers — omit them
                    // (prune-only-on-proof keeps the file).
                    known = false
                  } // else: proven all-null for this column — no bounds
                case None => known = false
              }
            }
          }
          if (!known || lo == null) None
          else Some(f.name -> (render(f.dataType, lo), render(f.dataType, hi)))
        }.toMap
        p -> (n, perCol)
      } finally reader.close()
    }.filter(_._2._1 > 0).toMap
  }

  /** a < b under the column's Spark ordering (strings on raw bytes). */
  private def less(dt: DataType, a: Any, b: Any): Boolean = dt match {
    case StringType =>
      val (x, y) = (a.asInstanceOf[Binary].getBytes,
        b.asInstanceOf[Binary].getBytes)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    case LongType => a.asInstanceOf[java.lang.Long] <
      b.asInstanceOf[java.lang.Long]
    case IntegerType => a.asInstanceOf[java.lang.Integer] <
      b.asInstanceOf[java.lang.Integer]
    case DoubleType => java.lang.Double.compare(
      a.asInstanceOf[java.lang.Double], b.asInstanceOf[java.lang.Double]) < 0
    case FloatType => java.lang.Float.compare(
      a.asInstanceOf[java.lang.Float], b.asInstanceOf[java.lang.Float]) < 0
    case other => throw new IllegalStateException(s"unstatable $other")
  }

  private def render(dt: DataType, v: Any): Any = dt match {
    case StringType => v.asInstanceOf[Binary].toStringUsingUTF8
    case _ => v
  }
}
