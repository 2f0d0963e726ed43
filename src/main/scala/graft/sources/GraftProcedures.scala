package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL MAINTENANCE through the catalog — Spark 4's `CALL` statement
  * over [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]
  * (the same surface Iceberg's Spark integration exposes its
  * procedures on):
  *
  *   - `CALL gcat.system.vacuum(table => 'db.t', retain_versions => 2)`
  *     — reclaim table history keeping the last N versions
  *     ([[DeltaLake.vacuum]] / [[Iceberg.expireSnapshots]]). The
  *     catalog pin is advanced to the table head FIRST: the operator
  *     asked to drop history, and a pin left behind the retention
  *     horizon would read files vacuum is about to delete.
  *   - `CALL gcat.system.expire_snapshots(table => 'db.t',
  *     keep_last => 2)` — the Iceberg-familiar alias (Iceberg only).
  *   - `CALL gcat.system.optimize(table => 'db.t'[, zorder_by =>
  *     'a,b'])` — bin-packing compaction, or Z-ORDER clustering when
  *     `zorder_by` is set ([[DeltaLake.compact]] /
  *     [[Iceberg.rewriteDataFiles]]); pin advanced to the new version.
  *   - `CALL gcat.system.convert_to_parquet(table => 'db.t')` —
  *     the ORC/Avro→parquet migration ([[Iceberg.convertToParquet]]).
  *   - `CALL gcat.system.vacuum_orphans()` — warehouse-wide unpinned
  *     staging reclaim ([[GraftCatalog.vacuumOrphans]]).
  *   - `CALL gcat.system.evolve_partition_spec(table => 'db.t',
  *     field => 'days(ts)')` — partition-spec evolution
  *     ([[Iceberg.addPartitionField]]; Iceberg only).
  *
  * Each returns its result as rows (reclaimed paths / the committed
  * version), so `CALL` output is inspectable like any query.
  */
private[sources] object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  val Names: Seq[String] = Seq("vacuum", "expire_snapshots",
    "optimize", "convert_to_parquet", "vacuum_orphans",
    "evolve_partition_spec", "drop_partition_field",
    "checkpoint", "rewrite_manifests", "history", "expire_metadata")

  def load(ident: Identifier, warehouse: String): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace),
      s"graft catalog: no procedure namespace " +
        s"'${ident.namespace().mkString(".")}' — procedures live " +
        "under `system`")
    val pathsOut = StructType(Seq(
      StructField("reclaimed_path", StringType)))
    val versionOut = StructType(Seq(StructField("version", LongType)))
    def spark = SparkSession.active
    def entryOf(name: String): (CatalogEntry, String) = {
      val e = GraftCatalog.entries(warehouse).getOrElse(name,
        throw new IllegalArgumentException(
          s"graft catalog: no table '$name' in $warehouse"))
      (e, GraftCatalog.absPath(warehouse, e.path))
    }
    ident.name().toLowerCase match {
      case "vacuum" => proc("vacuum",
        "reclaim table history keeping the last N versions, or — " +
          "with retain_hours => H — every version younger than the " +
          "horizon (pin advances to head first)",
        Seq(in("table", StringType), in("retain_versions",
          IntegerType, Some("1")),
          in("retain_hours", IntegerType, Some("0"))),
        pathsOut) { input =>
        val name = input.getUTF8String(0).toString
        val keep = input.getInt(1)
        val hours = input.getInt(2)
        val (e, abs) = entryOf(name)
        val reclaimed = e.format match {
          case "graft-deltalake" =>
            GraftCatalog.advancePin(warehouse, name,
              DeltaLake.latestVersion(spark, abs))
            DeltaLake.vacuum(spark, abs, retainVersions = keep,
              retainMs = if (hours > 0) Some(hours * 3600000L) else None)
          case "graft-iceberg" =>
            require(hours == 0,
              "graft catalog: vacuum(retain_hours) is the Delta " +
                "time-horizon form; use expire_snapshots for Iceberg")
            GraftCatalog.advancePin(warehouse, name,
              Iceberg.currentSnapshotId(abs))
            Iceberg.expireSnapshots(spark, abs, keepLast = keep)
          case o => throw new IllegalArgumentException(
            s"graft catalog: unknown format '$o' for $name")
        }
        reclaimed.map(p =>
          InternalRow(UTF8String.fromString(p)))
      }
      case "expire_snapshots" => proc("expire_snapshots",
        "Iceberg snapshot expiration keeping the last N " +
          "(pin advances to head first)",
        Seq(in("table", StringType), in("keep_last",
          IntegerType, Some("1"))), pathsOut) { input =>
        val name = input.getUTF8String(0).toString
        val keep = input.getInt(1)
        val (e, abs) = entryOf(name)
        require(e.format == "graft-iceberg",
          s"graft catalog: expire_snapshots targets Iceberg tables; " +
            s"'$name' is ${e.format} — use system.vacuum")
        GraftCatalog.advancePin(warehouse, name,
          Iceberg.currentSnapshotId(abs))
        Iceberg.expireSnapshots(spark, abs, keepLast = keep)
          .map(p => InternalRow(UTF8String.fromString(p)))
      }
      case "optimize" => proc("optimize",
        "bin-packing compaction, or Z-ORDER clustering with " +
          "zorder_by => 'a,b'; where => 'p = 5' scopes the rewrite " +
          "to matching partitions (Delta); pin advances to the new " +
          "version",
        Seq(in("table", StringType),
          in("zorder_by", StringType, Some("''")),
          in("where", StringType, Some("''"))), versionOut) { input =>
        val name = input.getUTF8String(0).toString
        val z = Option(input.getUTF8String(1)).map(_.toString)
          .getOrElse("").split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val w = Option(input.getUTF8String(2)).map(_.toString.trim)
          .filter(_.nonEmpty)
        val (e, abs) = entryOf(name)
        val v = e.format match {
          case "graft-deltalake" =>
            DeltaLake.compact(spark, abs, zorderBy = z, where = w)
          case "graft-iceberg" =>
            require(w.isEmpty,
              "graft catalog: optimize(where) is partition-scoped " +
                "Delta maintenance; Iceberg partition values are " +
                "transform-valued (days(ts), bucket(16, k)) and a raw " +
                "predicate over them would silently mean something " +
                "else — not supported")
            Iceberg.rewriteDataFiles(spark, abs, zorderBy = z)
          case o => throw new IllegalArgumentException(
            s"graft catalog: unknown format '$o' for $name")
        }
        if (v >= 0L) { GraftCatalog.advancePin(warehouse, name, v); () }
        Seq(InternalRow(v))
      }
      case "convert_to_parquet" => proc("convert_to_parquet",
        "rewrite ORC/Avro data files as parquet (one replace " +
          "snapshot); pin advances to it",
        Seq(in("table", StringType)), versionOut) { input =>
        val name = input.getUTF8String(0).toString
        val (e, abs) = entryOf(name)
        require(e.format == "graft-iceberg",
          s"graft catalog: convert_to_parquet targets Iceberg " +
            s"tables; '$name' is ${e.format}")
        val v = Iceberg.convertToParquet(spark, abs)
        if (v >= 0L) { GraftCatalog.advancePin(warehouse, name, v); () }
        Seq(InternalRow(v))
      }
      case "evolve_partition_spec" => proc("evolve_partition_spec",
        "mint a new Iceberg partition spec = default + the given " +
          "transform field (days(ts), bucket(16, k), ...); old files " +
          "stay under their spec, new writes land under the new one",
        Seq(in("table", StringType), in("field", StringType)),
        versionOut) { input =>
        val name = input.getUTF8String(0).toString
        val field = input.getUTF8String(1).toString
        val (e, abs) = entryOf(name)
        require(e.format == "graft-iceberg",
          s"graft catalog: evolve_partition_spec targets Iceberg " +
            s"tables; '$name' is ${e.format} — Delta has no " +
            "partition-spec concept (its layout is fixed at creation)")
        val v = Iceberg.addPartitionField(spark, abs, field)
        if (v >= 0L) { GraftCatalog.advancePin(warehouse, name, v); () }
        Seq(InternalRow(v))
      }
      case "drop_partition_field" => proc("drop_partition_field",
        "mint a new Iceberg partition spec = default minus the given " +
          "field; old files keep pruning under their own spec",
        Seq(in("table", StringType), in("field", StringType)),
        versionOut) { input =>
        val name = input.getUTF8String(0).toString
        val field = input.getUTF8String(1).toString
        val (e, abs) = entryOf(name)
        require(e.format == "graft-iceberg",
          s"graft catalog: drop_partition_field targets Iceberg " +
            s"tables; '$name' is ${e.format}")
        val v = Iceberg.dropPartitionField(spark, abs, field)
        if (v >= 0L) { GraftCatalog.advancePin(warehouse, name, v); () }
        Seq(InternalRow(v))
      }
      case "checkpoint" => proc("checkpoint",
        "write a parquet checkpoint of the Delta table head " +
          "(parts => N for the multi-part shape, v2 => true for the " +
          "uuid-manifest + sidecars shape); clean_logs => true also " +
          "deletes the subsumed JSON commits and older classic " +
          "checkpoints — history below the checkpoint becomes " +
          "unavailable",
        Seq(in("table", StringType), in("parts", IntegerType, Some("1")),
          in("clean_logs", BooleanType, Some("false")),
          in("v2", BooleanType, Some("false"))),
        StructType(Seq(StructField("version", LongType),
          StructField("cleaned", IntegerType)))) { input =>
        val name = input.getUTF8String(0).toString
        val parts = input.getInt(1)
        val clean = input.getBoolean(2)
        val v2 = input.getBoolean(3)
        val (e, abs) = entryOf(name)
        require(e.format == "graft-deltalake",
          s"graft catalog: checkpoint targets Delta tables; '$name' " +
            s"is ${e.format} — Iceberg state is already snapshot-" +
            "resident (see rewrite_manifests / expire_metadata for " +
            "its metadata maintenance)")
        val head = DeltaLake.latestVersion(spark, abs)
        if (v2) DeltaLake.stageCheckpointV2(spark, abs, head,
          sidecars = math.max(parts, 1))
        else DeltaLake.stageCheckpoint(spark, abs, head, parts)
        val cleaned = if (clean) DeltaLake.cleanLog(abs).size else 0
        Seq(InternalRow(head, cleaned))
      }
      case "expire_metadata" => proc("expire_metadata",
        "delete all but the newest N Iceberg table-metadata JSON " +
          "files (each commit writes a full copy; old ones serve no " +
          "read path)",
        Seq(in("table", StringType),
          in("keep_last", IntegerType, Some("3"))), pathsOut) { input =>
        val name = input.getUTF8String(0).toString
        val keep = input.getInt(1)
        val (e, abs) = entryOf(name)
        require(e.format == "graft-iceberg",
          s"graft catalog: expire_metadata targets Iceberg tables; " +
            s"'$name' is ${e.format} — see checkpoint(clean_logs) " +
            "for Delta's log retention")
        Iceberg.expireMetadata(abs, keep)
          .map(p => InternalRow(UTF8String.fromString(p)))
      }
      case "rewrite_manifests" => proc("rewrite_manifests",
        "compact the Iceberg table's data manifests into one per " +
          "partition spec (metadata only, data files untouched); pin " +
          "advances to the replace snapshot",
        Seq(in("table", StringType)), versionOut) { input =>
        val name = input.getUTF8String(0).toString
        val (e, abs) = entryOf(name)
        require(e.format == "graft-iceberg",
          s"graft catalog: rewrite_manifests targets Iceberg tables; " +
            s"'$name' is ${e.format} — see checkpoint for Delta's " +
            "metadata maintenance")
        val v = Iceberg.rewriteManifests(spark, abs)
        if (v >= 0L) { GraftCatalog.advancePin(warehouse, name, v); () }
        Seq(InternalRow(v))
      }
      case "history" => proc("history",
        "the table's commit/snapshot history, newest first: " +
          "(version, operation) — Delta reads each commit's " +
          "commitInfo (action-mix derivation for commits without " +
          "one), Iceberg reads the snapshot summaries",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("version", LongType),
          StructField("operation", StringType)))) { input =>
        val name = input.getUTF8String(0).toString
        val (e, abs) = entryOf(name)
        val rows: Seq[(Long, String)] = e.format match {
          case "graft-deltalake" =>
            DeltaLake.history(spark, abs)
              .select("version", "operation").collect()
              .map(r => (r.getLong(0), r.getString(1))).toSeq
          case "graft-iceberg" => Iceberg.snapshotLog(abs)
          case o => throw new IllegalArgumentException(
            s"graft catalog: unknown format '$o' for $name")
        }
        rows.map { case (v, op) =>
          InternalRow(v, UTF8String.fromString(op))
        }
      }
      case "vacuum_orphans" => proc("vacuum_orphans",
        "reclaim unpinned staging versions across the warehouse",
        Seq.empty, StructType(Seq(
          StructField("table", StringType),
          StructField("reclaimed_path", StringType)))) { _ =>
        GraftCatalog.vacuumOrphans(spark, warehouse).toSeq
          .sortBy(_._1).flatMap { case (t, paths) =>
            paths.map(p => InternalRow(UTF8String.fromString(t),
              UTF8String.fromString(p)))
          }
      }
      case other => throw new IllegalArgumentException(
        s"graft catalog: no procedure system.$other — available: " +
          Names.mkString(", "))
    }
  }

  private def in(name: String,
      dt: org.apache.spark.sql.types.DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  private def proc(procName: String, desc: String,
      params: Seq[ProcedureParameter], out: StructType)(
      body: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val result = body(input).toArray
            java.util.Collections.singletonList[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = result
              override def readSchema(): StructType = out
            }).iterator()
          }
        }
    }
}
