package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Shared snapshot-scan construction for log-backed table formats
  * (Delta's transaction log, Iceberg's manifests): ONE parquet scan over
  * a [[LogFileIndex]] built from the format's live-file list — the file
  * list, partition values, and per-file pruning all come from the LOG,
  * never from a filesystem listing, and plan size is O(1) in partition
  * cardinality. The format-specific reader supplies the resolved files
  * and its own `keep` (stats skipping, file-constant cuts); everything
  * Spark-side — partition-value typing, nullable-forcing, the
  * `_metadata` surface — is identical across formats, which is why it
  * lives here once.
  */
object LakeScan {

  /** Force nullability like `DataFrameReader.schema()` does: a schema
    * recorded from a non-nullable frame would otherwise make the
    * vectorized reader REJECT pre-evolution files missing a column
    * ("Required column is missing") instead of surfacing nulls.
    */
  private[sources] def asNullable(t: DataType): DataType = t match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: MapType =>
      m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** The type promotions BOTH formats define as metadata-only legal
    * (Delta typeWidening / Iceberg schema evolution) AND Spark's
    * parquet reader performs natively when the read schema is wider
    * than the file's: int→long, float→double, decimal precision
    * growth at the same scale. Everything else (narrowing, scale
    * changes, cross-family conversions) is a data rewrite in
    * disguise and refuses at the ALTER.
    */
  private[sources] def legalTypeWidening(from: DataType,
      to: DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (d1: DecimalType, d2: DecimalType) =>
        d1.scale == d2.scale && d2.precision > d1.precision &&
          d2.precision <= DecimalType.MAX_PRECISION
      case _ => false
    }
  }

  /** Evaluate a pushed filter that references ONLY the `file_name`
    * metadata constant against this file's own name: `Some(keep)` when
    * decidable, `None` otherwise (falls through to the format's keep).
    * This is what turns a version-cut `file_name NOT IN (...)` predicate
    * into a FILE-LIST PRUNE at the index instead of a row filter over
    * the whole snapshot — shared by every log-backed format. Guarded
    * against a DATA column that happens to be named `file_name` (then
    * the value is per-row, not per-file — never constant-fold it). A
    * null/false constant predicate admits no row, so the file prunes.
    */
  private[sources] def fileNameEval(e: Expression, name: String,
      tableSchema: StructType): Option[Boolean] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.StringType
    if (tableSchema.fieldNames.contains("file_name")) return None
    val refs = e.references.toSeq
    if (refs.isEmpty || !refs.forall(_.name == "file_name")) return None
    val sub = e.transform {
      case a: AttributeReference if a.name == "file_name" =>
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString(name),
          StringType)
    }
    Some(java.lang.Boolean.TRUE == sub.eval(null))
  }

  /** The single-scan snapshot: `fullSchema` is the table schema in
    * declared column order (partition columns included); `files` carry
    * the log's partition values and stats; `keep` prunes files against
    * pushed filters inside `listFiles` (file-constant `file_name`
    * predicates are evaluated here first, for every format).
    */
  /** `options` land on the [[org.apache.spark.sql.execution
    * .datasources.HadoopFsRelation]] and win over the session conf in
    * the scan's Hadoop configuration (`newHadoopConfWithOptions`) —
    * the per-relation scoping for reader flags like
    * `spark.sql.parquet.fieldId.read.enabled`, which the id-mode
    * column-mapping scans need WITHOUT mutating session-global config
    * (a session-wide set would silently change the semantics of every
    * unrelated parquet read whose schema carries field-id metadata).
    */
  def scan(spark: SparkSession, tableRoot: String, fullSchema: StructType,
      partitionColumns: Seq[String], files: Seq[LogFile],
      formatKeep: (Seq[Expression], LogFile) => Boolean,
      withMeta: Boolean = false,
      options: Map[String, String] = Map.empty,
      fileFormat: String = "parquet"): DataFrame = {
    // ORC scans have no `_metadata.row_index` (Spark's OrcFileFormat
    // uses the base metadata fields; only parquet adds the row index),
    // so the row-position machinery (DVs, MoR deletes, signed sources)
    // cannot ride them — callers guard, this is the backstop
    require(fileFormat == "parquet" || !withMeta,
      s"LakeScan: _metadata (row_index) is parquet-only; a $fileFormat " +
        "scan cannot serve the row-position surface")
    val keep = (filters: Seq[Expression], lf: LogFile) =>
      filters.forall { e =>
        fileNameEval(e, new java.io.File(lf.path).getName, fullSchema)
          .getOrElse(formatKeep(Seq(e), lf))
      }
    val dataSchema = StructType(
      fullSchema.filterNot(f => partitionColumns.contains(f.name)))
    if (files.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], fullSchema)
      // no scan → no hidden metadata; an all-null stand-in keeps the
      // withMeta shape stable for the empty-table edge. row_index is
      // part of the surface: the MoR/DV machinery joins on it, and an
      // empty file list with a NON-empty delete set is a normal frame
      // shape (e.g. a signed window whose insert side is empty)
      return if (!withMeta) empty
      else empty.withColumn("_metadata", lit(null).cast(
        "struct<file_path:string,file_name:string,row_index:bigint>"))
    }
    val partitionSchema = asNullable(StructType(
      fullSchema.filter(f => partitionColumns.contains(f.name))))
      .asInstanceOf[StructType]
    val index = new LogFileIndex(spark,
      new org.apache.hadoop.fs.Path(tableRoot), files, partitionSchema, keep)
    val fmt: org.apache.spark.sql.execution.datasources.FileFormat =
      fileFormat match {
        case "parquet" =>
          new org.apache.spark.sql.execution.datasources.parquet
            .ParquetFileFormat
        case "orc" =>
          new org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
        case "avro" =>
          new org.apache.spark.sql.graft.GraftAvroFileFormat
        case other => throw new IllegalArgumentException(
          s"LakeScan: unsupported file format '$other'")
      }
    val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, partitionSchema,
      asNullable(dataSchema).asInstanceOf[StructType], None,
      fmt, options)(spark)
    val df = org.apache.spark.sql.graft.GraftSql.ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(relation))
    val cols = fullSchema.fieldNames.toIndexedSeq ++
      (if (withMeta) Seq("_metadata") else Seq.empty)
    df.select(cols.map(col): _*)
  }
}
