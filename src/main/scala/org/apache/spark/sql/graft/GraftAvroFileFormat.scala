package org.apache.spark.sql.graft

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** A minimal READ-ONLY Avro [[FileFormat]] built on avro-core (Spark's
  * own `spark-avro` module does not ship in this environment) — the
  * third data-file arm of the Iceberg reader
  * (`graft.sources.Iceberg`, cf. the ORC arm; reference consumers:
  * `/root/reference/src/delta_node.rs:8-109` reads whatever the table
  * holds). Row-based: no row-group pushdown exists to lose — file
  * pruning (manifest stats, partition values) happens at the
  * LogFileIndex before this format ever opens a file, which is where
  * the Iceberg spec puts it for Avro anyway.
  *
  * COLUMN RESOLUTION is by ICEBERG FIELD ID (the spec's rule for Avro
  * data): each read-schema field's `parquet.field.id` metadata is
  * matched against the writer schema's `field-id` props, so renamed
  * columns read correctly from pre-rename files and a file that
  * predates a column serves null for it. Files carrying NO field-id
  * props are refused loudly (the Iceberg spec requires ids in Avro
  * data schemas; by-name fallback could silently null a renamed
  * column) — unless the READ schema itself carries no ids (plain
  * non-Iceberg use), where by-name is all there is.
  *
  * Splitting: Avro files are block-splittable in principle (sync
  * markers), but manifests list whole files and per-file stats bound
  * them — one task per file matches the Iceberg executor model and
  * keeps this format ~simple. `isSplitable=false` makes Spark hand
  * each file to exactly one task.
  */
class GraftAvroFileFormat extends FileFormat with Serializable {

  override def inferSchema(sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[org.apache.hadoop.fs.FileStatus]): Option[StructType] =
    None // schema always comes from the table format's metadata

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory =
    throw new UnsupportedOperationException(
      "graft-avro is a read arm; writes go through the lakehouse " +
        "writers (parquet)")

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String],
      path: org.apache.hadoop.fs.Path): Boolean = false

  override def toString: String = "GraftAvro"

  override def buildReader(sparkSession: SparkSession,
      dataSchema: StructType, partitionSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter],
      options: Map[String, String], hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val confBc = sparkSession.sparkContext
      .broadcast(new SerializableConfiguration(hadoopConf))
    val required = requiredSchema
    (file: PartitionedFile) => {
      val in = new org.apache.avro.mapred.FsInput(
        file.filePath.toPath, confBc.value.value)
      val reader = DataFileReader.openReader(in,
        new GenericDatumReader[GenericRecord]())
      // task-completion close is the EARLY-TERMINATION backstop
      // (limit/take abandon iterators mid-file); normal exhaustion
      // closes eagerly below — and driver-side consumption
      // (TaskContext absent) would otherwise leak the handle outright
      // (r13 advice)
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => reader.close()))
      val writerSchema = reader.getSchema
      require(writerSchema.getType == Schema.Type.RECORD,
        s"avro data file ${file.filePath} is not a record container")
      val getters = required.fields.map(
        GraftAvroFileFormat.getterFor(writerSchema, _,
          file.filePath.toString))
      new Iterator[InternalRow] {
        private var closed = false
        override def hasNext: Boolean = {
          val more = !closed && reader.hasNext
          if (!more && !closed) { closed = true; reader.close() }
          more
        }
        override def next(): InternalRow = {
          val rec = reader.next()
          val vals = new Array[Any](getters.length)
          var i = 0
          while (i < getters.length) {
            vals(i) = getters(i)(rec); i += 1
          }
          new GenericInternalRow(vals)
        }
      }
    }
  }
}

object GraftAvroFileFormat {

  /** The Iceberg field id a read-schema column carries (see
    * `graft.sources.Iceberg.structFromIceberg` — ids ride the
    * `parquet.field.id` metadata key for every format's resolution).
    */
  private def fieldIdOf(f: StructField): Option[Long] =
    if (f.metadata.contains("parquet.field.id"))
      Some(f.metadata.getLong("parquet.field.id"))
    else None

  private def avroFieldId(f: Schema.Field): Option[Int] =
    Option(f.getObjectProp("field-id")).map(_.toString.toInt)

  /** Resolve ONE read column against the writer schema and build its
    * record→catalyst getter. Missing-by-id = the file predates the
    * column → constant null (spec evolution semantics).
    */
  private def getterFor(writer: Schema, f: StructField,
      path: String): GenericRecord => Any = {
    val writerFields = writer.getFields.asScala.toSeq
    val resolved: Option[Schema.Field] = fieldIdOf(f) match {
      case Some(id) =>
        val anyIds = writerFields.exists(avroFieldId(_).isDefined)
        require(anyIds,
          s"avro data file $path carries no field-id props — the " +
            "Iceberg spec requires ids in Avro data schemas, and " +
            "by-name resolution could silently null a renamed " +
            "column; rewrite the file with ids (or as parquet)")
        writerFields.find(wf => avroFieldId(wf).contains(id.toInt))
      case None => Option(writer.getField(f.name))
    }
    resolved match {
      case None => _ => null // column added after this file was written
      case Some(wf) =>
        val conv = converter(nonNull(wf.schema()), f.dataType, f.name)
        val pos = wf.pos()
        rec => {
          val v = rec.get(pos)
          if (v == null) null else conv(v)
        }
    }
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.toSeq
        .filter(_.getType != Schema.Type.NULL)
      require(branches.length == 1,
        s"unsupported avro union of ${branches.map(_.getType)}")
      branches.head
    } else s

  /** avro value → catalyst value, by (avro type, spark type). The
    * supported matrix covers every type the Iceberg schema mapper
    * emits; anything else refuses loudly at reader build, never a
    * silently-wrong column.
    */
  private def converter(a: Schema, spark: DataType,
      name: String): Any => Any = {
    import Schema.Type._
    val logical = Option(a.getLogicalType).map(_.getName).getOrElse("")
    (a.getType, spark) match {
      case (BOOLEAN, BooleanType) => identity
      case (INT, DateType) => identity // logical date = days, like catalyst
      case (INT, IntegerType) => identity
      case (LONG, LongType) => identity
      case (LONG, TimestampType) | (LONG, TimestampNTZType) =>
        if (logical.endsWith("millis"))
          v => v.asInstanceOf[Long] * 1000L
        else identity // micros either way
      case (FLOAT, FloatType) => identity
      case (DOUBLE, DoubleType) => identity
      case (STRING, StringType) | (ENUM, StringType) =>
        v => UTF8String.fromString(v.toString)
      case (BYTES, BinaryType) =>
        v => byteArrayOf(v.asInstanceOf[java.nio.ByteBuffer])
      case (FIXED, BinaryType) =>
        v => v.asInstanceOf[org.apache.avro.generic.GenericFixed]
          .bytes().clone()
      case (BYTES, d: DecimalType) =>
        v => org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(
          new java.math.BigInteger(
            byteArrayOf(v.asInstanceOf[java.nio.ByteBuffer])), d.scale),
          d.precision, d.scale)
      case (FIXED, d: DecimalType) =>
        v => org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(
          new java.math.BigInteger(v
            .asInstanceOf[org.apache.avro.generic.GenericFixed].bytes()),
            d.scale), d.precision, d.scale)
      case (at, st) => throw new IllegalArgumentException(
        s"graft-avro: unsupported avro/spark type pair ($at" +
          (if (logical.nonEmpty) s"[$logical]" else "") +
          s", $st) for column '$name'")
    }
  }

  private def byteArrayOf(bb: java.nio.ByteBuffer): Array[Byte] = {
    val b = bb.duplicate()
    val out = new Array[Byte](b.remaining())
    b.get(out)
    out
  }
}
