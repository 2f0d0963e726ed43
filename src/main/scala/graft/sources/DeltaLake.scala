package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** Native Delta Lake TABLE READER — the north star's "Spark SQL + Delta
  * Lake reader" (`BASELINE.json`), implemented directly against the open
  * Delta transaction-log protocol (delta.io PROTOCOL.md; the reference
  * queries Delta tables through datafusion's equivalent reader). No
  * connector jars exist in this sandbox, and none are needed for the read
  * path: a Delta table is a directory of parquet data files plus a
  * `_delta_log/` of versioned JSON commits (and periodic parquet
  * checkpoints), and a snapshot is the fold of add/remove actions up to a
  * version.
  *
  * Scale shape — the log IS the file listing: a snapshot read never lists
  * the object store (the killer cost of plain parquet directories at
  * 100 TB — one LIST per prefix per query); it reads a few KB of JSON
  * (driver-side, exactly how production Delta clients resolve snapshots)
  * and plans a parquet scan over the named files. Partition values live
  * in the LOG, not the files: the reader reconstructs partition columns
  * as per-file-group literals, so a filter on a partition column constant-
  * folds per group and [[org.apache.spark.sql.catalyst.optimizer.PropagateEmptyRelation]]
  * prunes whole partitions before any file is opened — log-level
  * partition pruning, declaratively. Time travel (`version = Some(v)`)
  * replays the same fold to an earlier cut, and [[appended]] exposes the
  * version-to-version file diff — the commit-log delta source that
  * replaces [[graft.ivm.FileSnapshots]]' mtime cut for transactional
  * tables (its scaladoc's own caveat).
  *
  * Supported: reader protocol ≤ 2 (fail-fast on reader features the fold
  * would silently mis-read: deletion vectors, column mapping), JSON
  * commits, single-part parquet checkpoints via `_last_checkpoint`,
  * partitioned tables, percent-encoded relative or absolute paths.
  */
object DeltaLake {

  private val M = new ObjectMapper()

  private final case class AddFile(path: String,
      partitionValues: Map[String, String])

  private final case class LogState(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      adds: Seq[AddFile])

  /** The latest committed version of the table at `path` (JSON commits
    * or checkpoints — a cleaned log may hold only the latter).
    */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val versions = commitVersions(path) ++ checkpointVersions(path)
    require(versions.nonEmpty, s"not a Delta table (no _delta_log): $path")
    versions.max
  }

  /** Snapshot read: the table as of `version` (default: latest). */
  def snapshot(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val st = replay(spark, path, version)
    readFiles(spark, path, st, st.adds)
  }

  /** Snapshot with the file-source `_metadata` struct exposed as a
    * column — the shape [[graft.ivm.DeltaLakeSnapshots]] registers as an
    * incremental source (its version-cut predicate selects on
    * `_metadata.file_name`; a view boundary hides hidden metadata, so
    * the snapshot must surface it explicitly — the
    * [[graft.ivm.FileSnapshots]] view-wrapping rule).
    */
  def snapshotWithMeta(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val st = replay(spark, path, version)
    readFiles(spark, path, st, st.adds, withMeta = true)
  }

  /** The file NAMES live at `version` — the cut set for the
    * version-based incremental predicate. Names (not paths) because the
    * `_metadata.file_path` rendering is scheme-dependent (`file:/` vs
    * `file:///`) while part-file names are globally unique (task UUIDs).
    */
  def liveFileNames(spark: SparkSession, path: String,
      version: Long): Seq[String] =
    replay(spark, path, Some(version)).adds
      .map(a => new java.io.File(resolve(path, a.path)).getName)

  /** The rows ADDED strictly after `afterVersion` (up to `toVersion`,
    * default latest) that are still live at the end cut — the commit-log
    * delta: at scale an incremental maintenance cycle reads exactly the
    * appended files of the commits since its last cut, no data predicate
    * and no listing. (Files both added and removed inside the window
    * cancel — compaction rewrites don't replay as inserts.)
    */
  def appended(spark: SparkSession, path: String, afterVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    val before = replay(spark, path, Some(afterVersion))
    val after = replay(spark, path, toVersion)
    val old = before.adds.map(_.path).toSet
    readFiles(spark, path, after, after.adds.filterNot(a => old(a.path)))
  }

  // ---- log fold ----------------------------------------------------------

  private def logDir(path: String) = new java.io.File(path, "_delta_log")

  private def commitVersions(path: String): Seq[Long] =
    Option(logDir(path).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted

  private def checkpointVersions(path: String): Seq[Long] =
    Option(logDir(path).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("\\d{20}\\.checkpoint\\.parquet"))
      .map(_.take(20).toLong).sorted

  /** Fold protocol/metaData/add/remove actions up to `version`, starting
    * from the newest eligible checkpoint (if any).
    */
  private def replay(spark: SparkSession, path: String,
      version: Option[Long]): LogState = {
    val versions = commitVersions(path) ++ checkpointVersions(path)
    require(versions.nonEmpty, s"not a Delta table (no _delta_log): $path")
    val want = version.getOrElse(versions.max)

    val adds = mutable.LinkedHashMap.empty[String, AddFile]
    var schemaString: String = null
    var partCols: Seq[String] = Seq.empty

    def applyAdd(p: String, pv: Map[String, String]): Unit =
      adds.put(p, AddFile(p, pv))
    def applyRemove(p: String): Unit = adds.remove(p)
    def applyMeta(ss: String, pc: Seq[String]): Unit = {
      schemaString = ss; partCols = pc
    }
    def applyProtocol(minReader: Int, features: Seq[String]): Unit =
      require(minReader <= 2 && features.isEmpty,
        s"unsupported Delta reader protocol (minReaderVersion=$minReader, " +
          s"readerFeatures=$features): this reader folds plain add/remove " +
          "actions and would mis-read deletion vectors / column mapping")

    // checkpoint: resume the fold from the newest one at/below `want`
    val cpVersion = lastCheckpointVersion(path).filter(_ <= want)
    cpVersion.foreach { cv =>
      val cp = new java.io.File(logDir(path), f"$cv%020d.checkpoint.parquet")
      spark.read.parquet(cp.getAbsolutePath).collect().foreach { row =>
        struct(row, "add").foreach { a =>
          applyAdd(str(a, "path"), pvMap(a))
        }
        struct(row, "remove").foreach(r => applyRemove(str(r, "path")))
        struct(row, "metaData").foreach { m =>
          applyMeta(str(m, "schemaString"),
            m.getSeq[String](m.fieldIndex("partitionColumns")))
        }
        struct(row, "protocol").foreach { p =>
          val feats =
            if (p.schema.fieldNames.contains("readerFeatures"))
              Option(p.getSeq[String](p.fieldIndex("readerFeatures")))
                .getOrElse(Seq.empty)
            else Seq.empty
          applyProtocol(p.getInt(p.fieldIndex("minReaderVersion")), feats)
        }
      }
    }

    val from = cpVersion.map(_ + 1).getOrElse(0L)
    (from to want).foreach { v =>
      val f = new java.io.File(logDir(path), f"$v%020d.json")
      require(f.exists(), s"missing Delta commit $v in $path (log cleaned " +
        "past the newest checkpoint?)")
      java.nio.file.Files.readAllLines(f.toPath).asScala
        .filter(_.nonEmpty).foreach { line =>
          val n = M.readTree(line)
          Option(n.get("add")).foreach(a =>
            applyAdd(a.get("path").asText, pvMap(a.get("partitionValues"))))
          Option(n.get("remove")).foreach(r =>
            applyRemove(r.get("path").asText))
          Option(n.get("metaData")).foreach { m =>
            applyMeta(m.get("schemaString").asText,
              Option(m.get("partitionColumns")).toSeq
                .flatMap(_.elements().asScala.map(_.asText).toSeq))
          }
          Option(n.get("protocol")).foreach { p =>
            val feats = Option(p.get("readerFeatures")).toSeq
              .flatMap(_.elements().asScala.map(_.asText).toSeq)
            applyProtocol(p.get("minReaderVersion").asInt, feats)
          }
        }
    }
    require(schemaString != null, s"no metaData action in $path's log")
    LogState(want, DataType.fromJson(schemaString).asInstanceOf[StructType],
      partCols, adds.values.toSeq)
  }

  private def lastCheckpointVersion(path: String): Option[Long] = {
    val f = new java.io.File(logDir(path), "_last_checkpoint")
    if (!f.exists()) None
    else Some(M.readTree(java.nio.file.Files.readString(f.toPath))
      .get("version").asLong)
  }

  // ---- snapshot reconstruction ------------------------------------------

  /** One parquet scan per partition-value group, partition columns
    * injected as LITERALS (data files do not carry them — the protocol
    * stores them in the log), unioned in the metadata schema's column
    * order. A predicate on a partition column folds to false on
    * non-matching groups and the empty arms prune away — no file of a
    * pruned partition is ever opened.
    */
  private def readFiles(spark: SparkSession, path: String, st: LogState,
      files: Seq[AddFile], withMeta: Boolean = false): DataFrame = {
    val dataSchema = StructType(
      st.schema.filterNot(f => st.partitionColumns.contains(f.name)))
    if (files.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], st.schema)
      // no scan → no hidden metadata; an all-null stand-in keeps the
      // withMeta shape stable for the empty-table edge
      return if (!withMeta) empty
      else empty.withColumn("_metadata",
        lit(null).cast("struct<file_path:string,file_name:string>"))
    }
    val byPv = files.groupBy(_.partitionValues).toSeq
    val parts = byPv.map { case (pv, group) =>
      val paths = group.map(a => resolve(path, a.path))
      val df0 = spark.read.schema(dataSchema).parquet(paths: _*)
      val df = if (withMeta) df0.select(col("*"), col("_metadata")) else df0
      st.partitionColumns.foldLeft(df) { (d, c) =>
        val dt = st.schema(c).dataType
        val v = pv.get(c).filter(_ != null) match {
          case Some(s) => lit(s).cast(dt)
          case None => lit(null).cast(dt)
        }
        d.withColumn(c, v)
      }
    }
    val cols = st.schema.fieldNames.toIndexedSeq ++
      (if (withMeta) Seq("_metadata") else Seq.empty)
    parts.reduce(_ unionByName _).select(cols.map(col): _*)
  }

  /** Paths in the log are percent-encoded, relative to the table root or
    * absolute (PROTOCOL.md "Add File and Remove File").
    */
  private def resolve(table: String, p: String): String = {
    val decoded = java.net.URLDecoder.decode(p, "UTF-8")
    if (decoded.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*") ||
        decoded.startsWith("/")) decoded
    else new java.io.File(table, decoded).getAbsolutePath
  }

  private def struct(row: Row, field: String): Option[Row] =
    if (!row.schema.fieldNames.contains(field)) None
    else Option(row.getStruct(row.fieldIndex(field)))

  private def str(row: Row, field: String): String =
    row.getString(row.fieldIndex(field))

  private def pvMap(row: Row): Map[String, String] =
    Option(row.getMap[String, String](row.fieldIndex("partitionValues")))
      .map(_.toMap).getOrElse(Map.empty)

  private def pvMap(n: JsonNode): Map[String, String] =
    Option(n).map(_.properties().asScala
      .map(e => e.getKey -> (if (e.getValue.isNull) null
        else e.getValue.asText)).toMap)
      .getOrElse(Map.empty)

  // ---- staging writer (fixture machinery, NOT a lakehouse writer) -------

  /** Write `df` as commit `version` of the Delta table at `tableDir`,
    * optionally partitioned. This exists so the declared queries and
    * specs can stage a REAL multi-commit Delta table to read back (the
    * engine is a reader; production tables are written by the lakehouse
    * writer). Commit 0 carries protocol+metaData; data files are written
    * by Spark and logged with their log-relative percent-encoded paths.
    */
  def stageCommit(spark: SparkSession, tableDir: String, df: DataFrame,
      partitionBy: Seq[String], version: Long): Unit = {
    val root = new java.io.File(tableDir)
    root.mkdirs()
    val tmp = new java.io.File(root, s"_commit_tmp_$version")
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.getAbsolutePath)
    // move data files up to the table root, keeping partition subdirs
    val moved = mutable.Buffer.empty[(String, Map[String, String])]
    def walk(dir: java.io.File, pv: Map[String, String]): Unit =
      Option(dir.listFiles()).toSeq.flatten.sortBy(_.getName).foreach { f =>
        if (f.isDirectory && f.getName.contains("=")) {
          val Array(k, v) = f.getName.split("=", 2)
          walk(f, pv + (k -> java.net.URLDecoder.decode(v, "UTF-8")))
        } else if (f.getName.endsWith(".parquet")) {
          val rel = (pv.map { case (k, v) => s"$k=$v" }.toSeq :+ f.getName)
            .mkString("/")
          val dest = new java.io.File(root, rel)
          dest.getParentFile.mkdirs()
          java.nio.file.Files.move(f.toPath, dest.toPath)
          moved += rel -> pv
        }
      }
    walk(tmp, Map.empty)
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    deleteRec(tmp)

    val actions = mutable.Buffer.empty[String]
    if (version == 0L) {
      actions += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      val meta = M.createObjectNode()
      meta.put("id", java.util.UUID.nameUUIDFromBytes(
        tableDir.getBytes("UTF-8")).toString)
      val fmt = meta.putObject("format")
      fmt.put("provider", "parquet"); fmt.putObject("options")
      meta.put("schemaString", df.schema.json)
      val pc = meta.putArray("partitionColumns")
      partitionBy.foreach(pc.add)
      meta.putObject("configuration")
      actions += s"""{"metaData":${M.writeValueAsString(meta)}}"""
    }
    moved.foreach { case (rel, pv) =>
      val add = M.createObjectNode()
      add.put("path", new java.net.URI(null, null, rel, null).toString)
      val pvNode = add.putObject("partitionValues")
      pv.foreach { case (k, v) => pvNode.put(k, v) }
      val f = new java.io.File(root, rel)
      add.put("size", f.length())
      add.put("modificationTime", f.lastModified())
      add.put("dataChange", true)
      actions += s"""{"add":${M.writeValueAsString(add)}}"""
    }
    writeCommit(tableDir, version, actions.toSeq)
  }

  /** Append a commit that REMOVES the given log-relative paths (fixture
    * for compaction/delete replay).
    */
  def stageRemoveCommit(tableDir: String, removeRelPaths: Seq[String],
      version: Long): Unit =
    writeCommit(tableDir, version, removeRelPaths.map { p =>
      val r = M.createObjectNode()
      r.put("path", new java.net.URI(null, null, p, null).toString)
      r.put("deletionTimestamp", 0L)
      r.put("dataChange", true)
      s"""{"remove":${M.writeValueAsString(r)}}"""
    })

  private def writeCommit(tableDir: String, version: Long,
      actions: Seq[String]): Unit = {
    val ld = logDir(tableDir)
    ld.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(ld, f"$version%020d.json").toPath,
      actions.mkString("", "\n", "\n"))
    ()
  }
}
