package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A FILE-BASED TRANSACTIONAL CATALOG over the native lake readers —
  * the catalog-integration + multi-table-transaction item (r11 review
  * missing #5), built the way Nessie/Iceberg-REST model it from public
  * designs: the catalog is ONE versioned file of
  * `name → (format, path, pinned table version)` entries, committed by
  * exclusive creation. Because every table reference in a catalog
  * version is a PIN, a commit that swaps several pins at once is an
  * ATOMIC CROSS-TABLE TRANSACTION: catalog readers see either all of a
  * transaction's table versions or none — something path-addressed
  * lakehouse tables cannot give on their own.
  *
  * Wiring:
  * {{{
  *   .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  *   .config("spark.sql.catalog.graft.warehouse", "/path/wh")
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * then `spark.sql("SELECT ... FROM graft.db.orders")`. The analyzer
  * rule splices the pinned native snapshot plan in place of the V2
  * relation (same splice as the path readers — pushdown, pruning,
  * skipping intact).
  *
  * Table layout on disk is untouched: entries point at ordinary
  * path-addressed Delta/Iceberg tables. Writing through the underlying
  * writers moves the TABLE's head but not the catalog pin; the catalog
  * advances through [[GraftCatalog.register]] (pin the current head)
  * and [[GraftCatalog.transaction]] (write N tables, swap all pins in
  * one exclusive commit — a lost race throws, nothing partial is ever
  * visible to catalog readers, and the orphaned table versions are
  * [[GraftCatalog.vacuumOrphans]] material).
  *
  * The SQL surface is complete without the library API: CREATE TABLE /
  * CTAS ([[createTable]] — managed tables live under the warehouse and
  * purge on DROP; LOCATION/register() tables are external), INSERT
  * INTO/OVERWRITE (the V1 write bridge below), SELECT with time
  * travel, and row-level DELETE/UPDATE/MERGE
  * ([[graft.GraftDml]]).
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name': set spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  /** DDL features this catalog accepts in CREATE TABLE column lists:
    * `GENERATED ALWAYS AS (expr)` and `GENERATED ALWAYS AS IDENTITY
    * (START WITH … INCREMENT BY …)` — Spark encodes both into the
    * StructType's field metadata, which [[createTable]] translates to
    * the Delta writer's `delta.generationExpression` /
    * `delta.identity.*` keys (the writers compute/validate/allocate
    * them — §U9/U10).
    */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftCatalog.entries(warehouse).keys.toArray.sorted.map { full =>
      val parts = full.split('.')
      Identifier.of(parts.dropRight(1), parts.last)
    }.filter(_.namespace().sameElements(namespace))

  override def loadTable(ident: Identifier): Table = {
    val key = GraftCatalog.keyOf(ident)
    val e = GraftCatalog.entries(warehouse).getOrElse(key,
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident))
    GraftCatalogTable(s"$catalogName.$key", e, warehouse, key)
  }

  /** SQL time travel through the catalog —
    * `SELECT ... FROM gcat.db.t VERSION AS OF <v>`: the pin is
    * overridden with the requested TABLE version (Delta log version /
    * Iceberg snapshot id). Marked `timeTravel` so the splice rule's
    * per-query consistency re-pin leaves it alone.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val base = loadTable(ident).asInstanceOf[GraftCatalogTable]
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft catalog: VERSION AS OF '$version' on " +
            s"${base.fullName} — versions are numeric (a Delta log " +
            "version / an Iceberg snapshot id); branch/tag reads go " +
            "through the path reader's branch/tag options")
    }
    GraftCatalogTable(base.fullName, base.entry.copy(version = v),
      base.warehouse, base.key, timeTravel = true)
  }

  /** `TIMESTAMP AS OF` — Spark hands the timestamp in MICROSECONDS;
    * resolution uses each format's own commit-time rules.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val base = loadTable(ident).asInstanceOf[GraftCatalogTable]
    val ms = timestamp / 1000L
    val v = base.entry.format match {
      case "graft-deltalake" =>
        DeltaLake.versionAt(SparkSession.active, base.entry.path, ms)
      case "graft-iceberg" =>
        Iceberg.snapshotIdAt(base.entry.path, ms)
      case other => throw new IllegalArgumentException(
        s"graft catalog: unknown format '$other' for ${base.fullName}")
    }
    GraftCatalogTable(base.fullName, base.entry.copy(version = v),
      base.warehouse, base.key, timeTravel = true)
  }

  /** SQL DDL — `CREATE TABLE gcat.db.t (…) USING graft-deltalake
    * [PARTITIONED BY (…)] [LOCATION …]` and CTAS (Spark creates the
    * table, then writes through the V1 bridge): a MANAGED table's data
    * lands under the warehouse at the identifier's path (purged on
    * DROP); a LOCATION makes it external (DROP only unpins).
    * Partition transforms map to each format's writer syntax —
    * identity columns for Delta, spec strings (`days(ts)`,
    * `bucket(8, id)`) for Iceberg.
    */
  /** The V2 COLUMN-LIST create — where `GENERATED ALWAYS AS (expr)`
    * and `GENERATED ALWAYS AS IDENTITY (START WITH s INCREMENT BY i)`
    * arrive (the StructType overload never sees them): each spec
    * translates to the Delta writer's field-metadata contract
    * (`delta.generationExpression` / `delta.identity.*`) and the
    * writers take it from there — compute/validate for generated,
    * allocate for identity. Column DEFAULTs land as the analyzer's
    * `CURRENT_DEFAULT`/`EXISTS_DEFAULT` metadata keys (Spark's
    * ResolveDefaultColumns fills omitted columns and the DEFAULT
    * keyword from them; the `allowColumnDefaults` protocol feature
    * rides the first commit). All three are Delta-only surfaces;
    * Iceberg tables refuse them.
    */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = {
    val key = GraftCatalog.keyOf(ident)
    createTable(ident,
      StructType(translateColumns(key, columns,
        Option(properties.get("provider")))),
      partitions, properties)
  }

  /** V2 column list → StructType with the writer-contract metadata
    * (generated/identity/default) — shared by [[createTable]] and the
    * staged CREATE/REPLACE paths. `format` is the RESOLVED provider
    * (REPLACE without a USING clause carries no 'provider' property —
    * the caller falls back to the existing entry's format, and
    * re-deriving it from the raw properties here would refuse a
    * provider-less Delta REPLACE declaring DEFAULT/generated/identity
    * columns with a misleading error).
    */
  private def translateColumns(key: String,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      format: Option[String])
      : Array[org.apache.spark.sql.types.StructField] = {
    val isDelta = format.contains("graft-deltalake")
    columns.map { c =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      Option(c.defaultValue()).foreach { dv =>
        require(isDelta, s"graft catalog: CREATE TABLE $key: " +
          s"DEFAULT on column '${c.name}' is a graft-deltalake " +
          "surface (the allowColumnDefaults feature)")
        GraftCatalog.putDefaultMetadata(mb, dv,
          s"CREATE TABLE $key: column '${c.name}'")
      }
      Option(c.metadataInJSON()).foreach(j => mb.withMetadata(
        org.apache.spark.sql.types.Metadata.fromJson(j)))
      Option(c.generationExpression()).foreach { g =>
        require(isDelta, s"graft catalog: CREATE TABLE $key: " +
          s"GENERATED column '${c.name}' is a graft-deltalake " +
          "surface")
        mb.putString("delta.generationExpression", g)
      }
      Option(c.identityColumnSpec()).foreach { spec =>
        require(isDelta, s"graft catalog: CREATE TABLE $key: " +
          s"IDENTITY column '${c.name}' is a graft-deltalake surface")
        mb.putLong("delta.identity.start", spec.getStart)
        mb.putLong("delta.identity.step", spec.getStep)
        mb.putBoolean("delta.identity.allowExplicitInsert",
          spec.isAllowExplicitInsert)
      }
      org.apache.spark.sql.types.StructField(c.name, c.dataType,
        c.nullable, mb.build())
    }
  }

  /** ATOMIC-enough CTAS / RTAS ([[org.apache.spark.sql.connector
    * .catalog.StagingTableCatalog]]). WHY: Spark's non-staging
    * fallback for `CREATE OR REPLACE TABLE t AS SELECT … FROM t`
    * is drop-then-create — on a MANAGED table the drop PURGES the
    * data directory while the SELECT still needs the old files, so a
    * self-referencing replace destroyed the table AND failed. Staged:
    *  - CREATE stages eagerly (today's semantics) and gains abort
    *    cleanup — a failed CTAS no longer leaves a half-created table.
    *  - REPLACE of an existing table NEVER drops: the query writes
    *    through the native OVERWRITE commit (one exclusive commit,
    *    new schema adopted, partition layout may change — overwrite
    *    removes every old file so a new layout is sound), HISTORY is
    *    RETAINED (time travel to pre-replace versions keeps working),
    *    and a failed query leaves the old table untouched. `REPLACE
    *    TABLE` without AS commits an empty overwrite at
    *    commitStagedChanges. Iceberg replaces with a schema change
    *    refuse loudly (the fixture writer does not model it); Delta
    *    adopts the new schema.
    */
  override def stageCreate(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val t = createTable(ident,
      StructType(translateColumns(GraftCatalog.keyOf(ident),
        info.columns(),
        Option(info.properties().get("provider")))),
      info.partitions(), info.properties())
      .asInstanceOf[GraftCatalogTable]
    StagedGraftTable(t, onCommit = () => (),
      onAbort = () => { dropTable(ident); () })
  }

  override def stageReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stagedReplace(ident, info, orCreate = false)

  override def stageCreateOrReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stagedReplace(ident, info, orCreate = true)

  private def stagedReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo,
      orCreate: Boolean)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val key = GraftCatalog.keyOf(ident)
    GraftCatalog.entries(warehouse).get(key) match {
      case None =>
        if (!orCreate)
          throw new org.apache.spark.sql.catalyst.analysis
            .NoSuchTableException(ident)
        stageCreate(ident, info)
      case Some(entry) =>
        val format = Option(info.properties().get("provider"))
          .getOrElse(entry.format)
        require(format == entry.format,
          s"graft catalog: REPLACE TABLE $key USING $format — the " +
            s"table is ${entry.format}; replacing across formats is " +
            "a different table (DROP + CREATE explicitly)")
        // only Spark's reserved keys may ride a REPLACE — property
        // changes are a separate, explicit operation
        val extraProps = info.properties().asScala.keySet
          .diff(Set("provider", "location", "owner",
            "option.provider"))
        require(extraProps.isEmpty,
          s"graft catalog: REPLACE TABLE $key carries " +
            s"TBLPROPERTIES ${extraProps.mkString(", ")} — alter " +
            "properties explicitly, not through REPLACE")
        val newSchema = StructType(translateColumns(key,
          info.columns(), Some(format)))
        // the table's configuration (CHECK constraints included)
        // survives the overwrite commit verbatim — a constraint
        // naming a column the REPLACE drops would fail every
        // subsequent write with an unresolved-column error, so refuse
        // HERE with the actionable message (real REPLACE TABLE resets
        // properties; ours keeps them, so the user must drop the
        // constraint first)
        if (entry.format == "graft-deltalake") {
          val spark = SparkSession.active
          val abs = GraftCatalog.absPath(warehouse, entry.path)
          val newCols = newSchema.fieldNames.map(_.toLowerCase).toSet
          DeltaLake.checkConstraints(spark, abs).foreach {
            case (cname, expr) =>
              val refs = spark.sessionState.sqlParser
                .parseExpression(expr).collect {
                  case ua: org.apache.spark.sql.catalyst.analysis
                      .UnresolvedAttribute => ua.nameParts.head
                }
              val missing =
                refs.filterNot(r => newCols.contains(r.toLowerCase))
              require(missing.isEmpty,
                s"graft catalog: REPLACE TABLE $key drops column(s) " +
                  s"${missing.distinct.mkString(", ")} referenced by " +
                  s"CHECK constraint '$cname' ($expr) — the " +
                  "constraint survives the replace and would break " +
                  "every subsequent write; drop it first (ALTER " +
                  s"TABLE $key UNSET TBLPROPERTIES " +
                  s"('delta.constraints.$cname'))")
          }
        }
        val partitionBy = info.partitions().toSeq
          .map(GraftCatalog.transformSpec(_, entry.format, key))
        StagedGraftReplace(s"$catalogName.$key", entry, warehouse,
          key, newSchema, partitionBy)
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = {
    val key = GraftCatalog.keyOf(ident)
    val format = Option(properties.get("provider")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog: CREATE TABLE $key needs USING " +
          "graft-deltalake | graft-iceberg"))
    require(format == "graft-deltalake" || format == "graft-iceberg",
      s"graft catalog: CREATE TABLE $key USING $format — this catalog " +
        "serves graft-deltalake | graft-iceberg tables")
    val partitionBy = partitions.toSeq.map(
      GraftCatalog.transformSpec(_, format, key))
    GraftCatalog.create(SparkSession.active, warehouse, key, format,
      schema, partitionBy, Option(properties.get("location")), ident)
    loadTable(ident)
  }

  /** SQL MAINTENANCE — `CALL gcat.system.vacuum/optimize/
    * expire_snapshots/convert_to_parquet/vacuum_orphans(...)`
    * ([[GraftProcedures]]).
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure =
    GraftProcedures.load(ident, warehouse)

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (!namespace.sameElements(GraftProcedures.Namespace)) Array.empty
    else GraftProcedures.Names
      .map(n => Identifier.of(GraftProcedures.Namespace, n)).toArray

  override def dropTable(ident: Identifier): Boolean =
    GraftCatalog.drop(warehouse, GraftCatalog.keyOf(ident))

  override def renameTable(from: Identifier, to: Identifier): Unit =
    GraftCatalog.rename(warehouse, GraftCatalog.keyOf(from),
      GraftCatalog.keyOf(to))

  /** COLUMN-LEVEL ALTER TABLE — `ADD COLUMN(S)`, `RENAME COLUMN`,
    * and `DROP COLUMN` route to the native schema-evolution commits
    * ([[DeltaLake.addColumns]]/[[DeltaLake.renameColumn]]/
    * [[DeltaLake.dropColumn]] and [[Iceberg.addColumns]]/
    * [[Iceberg.renameColumns]]/[[Iceberg.dropColumns]]) with the
    * catalog pin advanced to the evolution commit — each operation
    * statement-retried independently. Everything else (type changes,
    * positioned adds, nested fields, property changes) refuses
    * loudly: each is either a data rewrite in disguise or a format
    * feature this writer doesn't model.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val key = GraftCatalog.keyOf(ident)
    val spark = SparkSession.active
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val renames = changes.collect {
      case r: TableChange.RenameColumn => r }
    val drops = changes.collect {
      case d: TableChange.DeleteColumn => d }
    // CHECK constraints via TBLPROPERTIES — the portable SQL surface:
    // SET TBLPROPERTIES('delta.constraints.<name>' = '<expr>') adds
    // (existing rows validated), UNSET drops. Only constraint keys
    // are accepted; arbitrary property changes stay refused.
    val setProps = changes.collect {
      case sp: TableChange.SetProperty => sp }
    val unsetProps = changes.collect {
      case up: TableChange.RemoveProperty => up }
    // besides constraints, ONE more property legally alters through
    // the catalog: the column-mapping upgrade (mode none→name), the
    // commit that makes RENAME / DROP COLUMN metadata-only on Delta
    (setProps.map(_.property) ++ unsetProps.map(_.property))
      .foreach(prop => require(
        prop.startsWith("delta.constraints.") ||
          prop == "delta.columnMapping.mode",
        s"graft catalog: ALTER TABLE $key SET/UNSET TBLPROPERTIES " +
          s"('$prop') — only CHECK constraints " +
          "(delta.constraints.<name>) and the column-mapping upgrade " +
          "(delta.columnMapping.mode = 'name') alter through the " +
          "catalog"))
    // spec-legal type WIDENING (int→bigint, float→double, decimal
    // precision growth) is metadata-only in both formats — the native
    // widen writers validate legality and refuse everything else
    val widens = changes.collect {
      case w: TableChange.UpdateColumnType => w }
    // nested widen paths are legal on BOTH formats (field-id
    // resolution on Iceberg, name resolution on Delta)
    // SET / DROP DEFAULT — future-insert metadata only (Delta)
    val defChanges = changes.collect {
      case u: TableChange.UpdateColumnDefaultValue => u }
    defChanges.foreach(u => require(u.fieldNames.length == 1,
      s"graft catalog: ALTER TABLE $key ALTER COLUMN " +
        s"${u.fieldNames.mkString(".")} SET DEFAULT — nested fields " +
        "are not supported"))
    val other = changes.filterNot(c =>
      c.isInstanceOf[TableChange.AddColumn] ||
        c.isInstanceOf[TableChange.RenameColumn] ||
        c.isInstanceOf[TableChange.DeleteColumn] ||
        c.isInstanceOf[TableChange.UpdateColumnType] ||
        c.isInstanceOf[TableChange.UpdateColumnDefaultValue] ||
        c.isInstanceOf[TableChange.SetProperty] ||
        c.isInstanceOf[TableChange.RemoveProperty])
    if (other.nonEmpty) throw new UnsupportedOperationException(
      s"graft catalog: ALTER TABLE $key: only ADD / RENAME / DROP " +
        s"COLUMN, legal type widening, and CHECK-constraint " +
        s"TBLPROPERTIES are supported, " +
        s"got ${other.map(_.getClass.getSimpleName)
          .mkString(", ")} — other type changes and repositioning " +
        "are data rewrites in disguise; run them with the format's " +
        "own tooling and re-register")
    // ONE KIND of change per statement: each kind commits
    // independently (with its own retry), so a mixed list failing
    // midway would leave the table partially altered relative to the
    // statement the user issued. Spark's SQL grammar only produces
    // single-kind lists; programmatic callers get the honest refusal.
    val kinds = Seq(adds.nonEmpty, renames.nonEmpty, drops.nonEmpty,
      widens.nonEmpty, defChanges.nonEmpty,
      setProps.nonEmpty || unsetProps.nonEmpty)
      .count(identity)
    require(kinds <= 1,
      s"graft catalog: ALTER TABLE $key mixes " +
        s"${changes.map(_.getClass.getSimpleName).distinct
          .mkString(", ")} — each kind commits independently, so a " +
        "mixed statement could fail half-applied; issue one " +
        "statement per kind")
    require(setProps.size + unsetProps.size <= 1,
      s"graft catalog: ALTER TABLE $key changes " +
        s"${setProps.size + unsetProps.size} properties — each " +
        "constraint change is its own commit; issue one statement " +
        "per constraint so a failure cannot leave the list " +
        "half-applied")
    // nested ADD paths are legal on both formats (field ids on
    // Iceberg, name resolution on Delta); nested RENAME stays
    // Iceberg-only (an unmapped Delta rename orphans physical names)
    adds.foreach { a =>
      require(a.position == null,
        s"graft catalog: ALTER TABLE $key ADD COLUMN " +
          s"${a.fieldNames.mkString(".")} FIRST/AFTER — positioned " +
          "adds reorder the schema; columns append at the end")
      // ADD COLUMN … DEFAULT is a Delta top-level surface: the stored
      // EXISTS_DEFAULT serves rows predating the column at READ time
      // (Spark's parquet reader fills file-missing columns from it),
      // CURRENT_DEFAULT fills future inserts. Nested members and
      // Iceberg tables refuse below (no existence-default contract).
      require(a.defaultValue() == null || a.fieldNames.length == 1,
        s"graft catalog: ALTER TABLE $key ADD COLUMN " +
          s"${a.fieldNames.mkString(".")} DEFAULT — existence " +
          "defaults apply to top-level columns only")
    }
    // each operation retries INDEPENDENTLY: one shared retry would
    // re-run an already-committed ADD after the rename lost a race,
    // turning a retryable collision into "column already exists"
    if (adds.nonEmpty) GraftCatalog.retryOnCatalogRace {
      val entry = GraftCatalog.entries(warehouse).getOrElse(key,
        throw new IllegalArgumentException(
          s"graft catalog: no table '$key' in $warehouse"))
      val abs = GraftCatalog.absPath(warehouse, entry.path)
      // ONE translation for both formats: nested adds are
      // NAME-resolved on Delta and FIELD-ID-resolved on Iceberg
      // (pre-evolution files surface the member as null either way);
      // a DEFAULT lands as CURRENT_DEFAULT/EXISTS_DEFAULT metadata —
      // Delta stores the keys verbatim, Iceberg renders them into
      // the v3 spec's write-default/initial-default fields (its spec
      // home for read-time backfill) and promotes format-version 3
      val translated = adds.map { a =>
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
        Option(a.defaultValue()).foreach(dv =>
          GraftCatalog.putDefaultMetadata(mb, dv,
            s"ALTER TABLE $key ADD COLUMN ${a.fieldNames.head}"))
        a.fieldNames.init.toSeq ->
          org.apache.spark.sql.types.StructField(
            a.fieldNames.last, a.dataType, a.isNullable, mb.build())
      }
      val v = entry.format match {
        case "graft-deltalake" =>
          DeltaLake.addFields(spark, abs, translated)
        case "graft-iceberg" =>
          Iceberg.addFields(spark, abs, translated)
        case o => throw new IllegalArgumentException(
          s"graft catalog: unknown format '$o' for $key")
      }
      if (v >= 0L) { GraftCatalog.advancePin(warehouse, key, v); () }
    }
    if (renames.nonEmpty) GraftCatalog.retryOnCatalogRace {
      val entry = GraftCatalog.entries(warehouse).getOrElse(key,
        throw new IllegalArgumentException(
          s"graft catalog: no table '$key' in $warehouse"))
      val abs = GraftCatalog.absPath(warehouse, entry.path)
      val v = entry.format match {
        case "graft-deltalake" =>
          require(renames.size == 1, s"graft catalog: ALTER TABLE " +
            s"$key renames one column per statement on Delta tables")
          require(renames.head.fieldNames.length == 1,
            s"graft catalog: ALTER TABLE $key RENAME COLUMN " +
              s"${renames.head.fieldNames.mkString(".")} — nested " +
              "renames are not supported on Delta tables (column " +
              "mapping covers top-level names only in this writer)")
          DeltaLake.renameColumn(spark, abs,
            renames.head.fieldNames.head, renames.head.newName)
        case "graft-iceberg" => Iceberg.renameFields(spark, abs,
          renames.map(r => r.fieldNames.toSeq -> r.newName).toMap)
        case o => throw new IllegalArgumentException(
          s"graft catalog: unknown format '$o' for $key")
      }
      if (v >= 0L) { GraftCatalog.advancePin(warehouse, key, v); () }
    }
    if (widens.nonEmpty) GraftCatalog.retryOnCatalogRace {
      val entry = GraftCatalog.entries(warehouse).getOrElse(key,
        throw new IllegalArgumentException(
          s"graft catalog: no table '$key' in $warehouse"))
      val abs = GraftCatalog.absPath(warehouse, entry.path)
      val v = entry.format match {
        case "graft-deltalake" =>
          require(widens.size == 1, s"graft catalog: ALTER TABLE " +
            s"$key widens one column per statement on Delta tables")
          // nested paths widen by name ([[DeltaLake.widenField]]) —
          // the parquet reader upcasts at nested levels natively
          DeltaLake.widenField(spark, abs,
            widens.head.fieldNames.toSeq, widens.head.newDataType)
        case "graft-iceberg" => Iceberg.widenFields(spark, abs,
          widens.map(w => w.fieldNames.toSeq -> w.newDataType).toMap)
        case o => throw new IllegalArgumentException(
          s"graft catalog: unknown format '$o' for $key")
      }
      if (v >= 0L) { GraftCatalog.advancePin(warehouse, key, v); () }
    }
    if (defChanges.nonEmpty) GraftCatalog.retryOnCatalogRace {
      val entry = GraftCatalog.entries(warehouse).getOrElse(key,
        throw new IllegalArgumentException(
          s"graft catalog: no table '$key' in $warehouse"))
      require(entry.format == "graft-deltalake",
        s"graft catalog: ALTER TABLE $key SET/DROP DEFAULT — column " +
          s"defaults are a graft-deltalake surface; '$key' is " +
          s"${entry.format}")
      require(defChanges.size == 1, s"graft catalog: ALTER TABLE " +
        s"$key changes one column default per statement")
      val abs = GraftCatalog.absPath(warehouse, entry.path)
      val u = defChanges.head
      val v = DeltaLake.setColumnDefault(spark, abs,
        u.fieldNames.head,
        Option(u.newDefaultValue()).filter(_.nonEmpty))
      if (v >= 0L) { GraftCatalog.advancePin(warehouse, key, v); () }
    }
    if (drops.nonEmpty) GraftCatalog.retryOnCatalogRace {
      val entry = GraftCatalog.entries(warehouse).getOrElse(key,
        throw new IllegalArgumentException(
          s"graft catalog: no table '$key' in $warehouse"))
      val abs = GraftCatalog.absPath(warehouse, entry.path)
      val v = entry.format match {
        case "graft-deltalake" =>
          require(drops.size == 1, s"graft catalog: ALTER TABLE " +
            s"$key drops one column per statement on Delta tables")
          require(drops.head.fieldNames.length == 1,
            s"graft catalog: ALTER TABLE $key DROP COLUMN " +
              s"${drops.head.fieldNames.mkString(".")} — nested " +
              "drops are not supported on Delta tables (no field-id " +
              "resolution)")
          DeltaLake.dropColumn(spark, abs, drops.head.fieldNames.head)
        case "graft-iceberg" => Iceberg.dropFields(spark, abs,
          drops.map(_.fieldNames.toSeq))
        case o => throw new IllegalArgumentException(
          s"graft catalog: unknown format '$o' for $key")
      }
      if (v >= 0L) { GraftCatalog.advancePin(warehouse, key, v); () }
    }
    (setProps.map(sp => (sp.property, Some(sp.value))) ++
      unsetProps.map(up => (up.property, None))).foreach {
      case (prop, valueOpt) => GraftCatalog.retryOnCatalogRace {
        val entry = GraftCatalog.entries(warehouse).getOrElse(key,
          throw new IllegalArgumentException(
            s"graft catalog: no table '$key' in $warehouse"))
        require(entry.format == "graft-deltalake",
          s"graft catalog: ALTER TABLE $key ('$prop') — '$prop' is " +
            s"a Delta surface; '$key' is ${entry.format}")
        val abs = GraftCatalog.absPath(warehouse, entry.path)
        val v =
          if (prop == "delta.columnMapping.mode") valueOpt match {
            case Some("name") =>
              DeltaLake.enableColumnMapping(spark, abs)
            case Some(other) => throw new IllegalArgumentException(
              s"graft catalog: ALTER TABLE $key SET " +
                s"delta.columnMapping.mode = '$other' — only the " +
                "none→name upgrade is supported")
            case None => throw new IllegalArgumentException(
              s"graft catalog: ALTER TABLE $key UNSET " +
                "delta.columnMapping.mode — a mapped table cannot " +
                "revert (its renamed columns exist only logically)")
          } else {
            val cname = prop.stripPrefix("delta.constraints.")
            valueOpt match {
              case Some(sqlExpr) =>
                DeltaLake.addCheckConstraint(spark, abs, cname, sqlExpr)
              case None =>
                DeltaLake.dropCheckConstraint(spark, abs, cname)
            }
          }
        if (v >= 0L) { GraftCatalog.advancePin(warehouse, key, v); () }
      }
    }
    loadTable(ident)
  }
}

/** One pinned catalog entry (see [[GraftCatalog]]). `managed` marks a
  * table CREATED by the catalog (DDL) whose data lives under the
  * warehouse: DROP TABLE purges its directory, while registered
  * (external) tables only lose their pin — the classic
  * managed-vs-external split.
  */
final case class CatalogEntry(format: String, path: String,
    version: Long, managed: Boolean = false)

/** The V2 table a catalog pin resolves to. READS are never physically
  * planned through it: [[graft.GraftExtensions]] splices [[resolved]]'s
  * analyzed plan over the relation during analysis (hence no
  * ScanBuilder — a session without the extensions fails loudly at
  * planning instead of slowly row-converting). WRITES ride the
  * V2→V1 bridge ([[org.apache.spark.sql.connector.write.V1Write]]):
  * `INSERT INTO gcat.db.t SELECT ...` / `INSERT OVERWRITE` /
  * `df.writeTo("gcat.db.t").append()` commit through the native
  * writer and AUTO RE-PIN the catalog entry at the produced version —
  * a single-table transaction (racing catalog commits fail the re-pin
  * loudly). Time-traveled relations expose no write capability.
  */
final case class GraftCatalogTable(fullName: String, entry: CatalogEntry,
    warehouse: String, key: String, timeTravel: Boolean = false)
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.TruncatableTable {

  override def name(): String = fullName

  /** `TRUNCATE TABLE gcat.db.t` — an all-rows native DELETE (DV/Puffin
    * commit, history stays time-travel readable, CDF tables carry the
    * full delete frame) plus the usual monotone re-pin. An
    * already-empty table is a no-op.
    */
  override def truncateTable(): Boolean = {
    require(!timeTravel,
      s"graft catalog: cannot TRUNCATE the time-traveled relation " +
        s"$fullName")
    val spark = SparkSession.active
    val always = org.apache.spark.sql.functions.lit(true)
    // statement-level retry on a lost version race, like the DML
    // bridge: re-running the all-rows delete on fresh state IS the
    // statement's serialization
    val v = GraftCatalog.retryOnCatalogRace {
      entry.format match {
        case "graft-deltalake" =>
          DeltaLake.delete(spark, entry.path, always)
        case "graft-iceberg" => Iceberg.delete(spark, entry.path, always)
        case other => throw new IllegalArgumentException(
          s"graft catalog: unknown format '$other' for $fullName")
      }
    }
    if (v >= 0L) { GraftCatalog.advancePin(warehouse, key, v); () }
    true
  }

  override def capabilities(): java.util.Set[TableCapability] =
    if (timeTravel) java.util.Collections.emptySet()
    else java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(!timeTravel,
      s"graft catalog: cannot write to the time-traveled relation " +
        s"$fullName — writes go to the table, not a historical pin")
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var overwriteAll = false
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        overwriteAll = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: DataFrame, overwriteFlag: Boolean) => {
              val spark = data.sparkSession
              val mode = if (overwriteAll || overwriteFlag) "overwrite"
                else "append"
              // the V2 resolver validated against the READ schema
              // (all-nullable by the scan contract) — the STORED
              // schema's required fields must still be enforced, or
              // this bridge writes spec-invalid nulls the table
              // metadata claims cannot exist
              GraftCatalog.requireNoNullsInRequired(spark,
                entry.format, entry.path, data, fullName)
              val v = GraftCatalog.writeVia(spark, entry.format,
                entry.path, data, mode, fullName)
              GraftCatalog.advancePin(warehouse, key, v)
              ()
            }
        }
    }
  }

  // analysis asks for the schema (possibly more than once) and the
  // splice rule asks for the plan: resolve the pinned snapshot ONCE
  // per session — the pin is immutable, and each resolution is a full
  // log replay / manifest fold
  @transient private var memo: (SparkSession, DataFrame) = null

  /** The PINNED snapshot (never the table head: the pin is what makes
    * cross-table reads transactionally consistent).
    */
  def resolved(spark: SparkSession): DataFrame = synchronized {
    if (memo != null && (memo._1 eq spark)) memo._2
    else {
      val df = entry.format match {
        case "graft-deltalake" =>
          DeltaLake.snapshot(spark, entry.path, Some(entry.version))
        case "graft-iceberg" =>
          Iceberg.snapshot(spark, entry.path, Some(entry.version))
        case other => throw new IllegalArgumentException(
          s"graft catalog: unknown format '$other' for $fullName")
      }
      memo = (spark, df)
      df
    }
  }

  override def schema(): StructType =
    resolved(SparkSession.active).schema

  override def properties(): java.util.Map[String, String] =
    Map("format" -> entry.format, "path" -> entry.path,
      "pinned-version" -> entry.version.toString).asJava
}

/** A staged CREATE ([[GraftCatalog.stageCreate]]): the table is
  * created eagerly (the established CTAS semantics), commit is a
  * no-op, and ABORT drops what was created — a failed CTAS no longer
  * leaves a half-created table behind.
  */
final case class StagedGraftTable(inner: GraftCatalogTable,
    onCommit: () => Unit, onAbort: () => Unit)
    extends org.apache.spark.sql.connector.catalog.StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def capabilities(): java.util.Set[TableCapability] =
    inner.capabilities()
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    inner.newWriteBuilder(info)
  override def properties(): java.util.Map[String, String] =
    inner.properties()
  override def commitStagedChanges(): Unit = onCommit()
  override def abortStagedChanges(): Unit = onAbort()
}

/** A staged REPLACE of an EXISTING table
  * ([[GraftCatalog.stageReplace]]): NO drop — the query writes
  * through the native OVERWRITE commit (new schema adopted, layout
  * may change, history retained), the pin advances with it, and a
  * failed query leaves the old table untouched. `REPLACE TABLE`
  * without AS commits an empty overwrite at commitStagedChanges.
  */
final case class StagedGraftReplace(fullName: String,
    entry: CatalogEntry, warehouse: String, key: String,
    newSchema: StructType, partitionBy: Seq[String])
    extends org.apache.spark.sql.connector.catalog.StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  @volatile private var wrote = false

  override def name(): String = fullName
  override def schema(): StructType = newSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def properties(): java.util.Map[String, String] =
    Map("format" -> entry.format, "path" -> entry.path).asJava

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = this
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: DataFrame, _: Boolean) => {
              doReplace(data.sparkSession, data); ()
            }
        }
    }

  private def doReplace(spark: SparkSession, data: DataFrame): Unit = {
    // carry the REPLACE column contracts (generated/identity/default
    // metadata) onto the written frame — the overwrite commit adopts
    // its schema, metadata included
    val aligned = data.select(newSchema.toIndexedSeq.map(f =>
      org.apache.spark.sql.functions.col(f.name)
        .as(f.name, f.metadata)): _*)
    val abs = GraftCatalog.absPath(warehouse, entry.path)
    val v = entry.format match {
      case "graft-deltalake" =>
        // replaceLayout: the DECLARED partitioning is the layout —
        // an empty list means UNPARTITIONED, never "inherit"
        DeltaLake.write(spark, abs, aligned, "overwrite",
          partitionBy, replaceLayout = true)
      case "graft-iceberg" =>
        // the iceberg fixture writer does not model layout/schema
        // replacement — same-layout replaces only, checked here so
        // an empty declared list cannot silently inherit
        val cur = Iceberg.resolve(spark, abs, None)
        require(partitionBy == cur.specStrings,
          s"graft catalog: REPLACE TABLE $key changes the Iceberg " +
            s"partition layout (${cur.specStrings.mkString(",")} → " +
            s"${partitionBy.mkString(",")}) — not modeled; " +
            "re-create the table explicitly")
        Iceberg.write(spark, abs, aligned, "overwrite", partitionBy)
      case other => throw new IllegalArgumentException(
        s"graft catalog: unknown format '$other' for $fullName")
    }
    GraftCatalog.advancePin(warehouse, key, v)
    wrote = true
  }

  override def commitStagedChanges(): Unit =
    if (!wrote) {
      // REPLACE TABLE without AS: empty content, new definition
      val spark = SparkSession.active
      doReplace(spark, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        newSchema))
    }

  override def abortStagedChanges(): Unit = ()
}

object GraftCatalog {

  private val M = new ObjectMapper()

  /** The ONE place a SQL column DEFAULT translates to the writer
    * contract — shared by CREATE TABLE and ALTER ADD COLUMN so the
    * two surfaces cannot drift. Spark's ResolveDefaultColumns reads
    * both keys off the table schema: CURRENT_DEFAULT fills future
    * INSERTs (the analyzer substitutes omitted columns and the
    * DEFAULT keyword), EXISTS_DEFAULT serves rows predating the
    * column at read time. The default must be a CONSTANT: the
    * existence default is served verbatim to pre-existing rows, so a
    * non-foldable expression would mean a different value per read.
    */
  private[sources] def putDefaultMetadata(
      mb: org.apache.spark.sql.types.MetadataBuilder,
      dv: org.apache.spark.sql.connector.catalog.ColumnDefaultValue,
      what: String): Unit = {
    require(dv.getValue != null,
      s"graft catalog: $what DEFAULT ${dv.getSql} — the default " +
        "must be a constant (the existence default is served " +
        "verbatim to pre-existing rows)")
    mb.putString("CURRENT_DEFAULT", dv.getSql)
    mb.putString("EXISTS_DEFAULT", dv.getSql)
    ()
  }

  private def catDir(warehouse: String): java.io.File =
    new java.io.File(warehouse, "_graft_catalog")

  private def versionOf(name: String): Option[Long] =
    "^v(\\d+)\\.catalog\\.json$".r.findFirstMatchIn(name)
      .map(_.group(1).toLong)

  /** Table paths may be RELATIVE to the warehouse (portable
    * warehouses, and what lets a fingerprint-staged warehouse survive
    * its final rename) — absolutized here, at read time.
    */
  private[sources] def absPath(warehouse: String, path: String): String =
    if (path.startsWith("/")) path
    else new java.io.File(warehouse, path).getAbsolutePath

  /** Latest catalog state: (entries, version it was read at; 0 = none).
    * Entry paths come back ABSOLUTE (resolved against the warehouse).
    */
  private def state(warehouse: String)
      : (Map[String, CatalogEntry], Long) = {
    val files = Option(catDir(warehouse).listFiles()).toSeq.flatten
      .flatMap(f => versionOf(f.getName).map(_ -> f))
    if (files.isEmpty) return (Map.empty, 0L)
    val (v, f) = files.maxBy(_._1)
    val n = M.readTree(java.nio.file.Files.readString(f.toPath))
    val tables = Option(n.get("tables"))
      .map(_.properties().asScala.map { e =>
        val t = e.getValue
        e.getKey -> CatalogEntry(t.get("format").asText,
          absPath(warehouse, t.get("path").asText),
          t.get("version").asLong,
          managed = Option(t.get("managed")).exists(_.asBoolean(false)))
      }.toMap).getOrElse(Map.empty)
    (tables, v)
  }

  def entries(warehouse: String): Map[String, CatalogEntry] =
    state(warehouse)._1

  private[sources] def keyOf(ident: Identifier): String = {
    val parts = ident.namespace() :+ ident.name()
    // the catalog key is the dot-joined identifier: a DOT INSIDE a
    // segment would collide with a differently-nested identifier
    // (`db`.`a.b` vs `db.a`.`b`) — refused on both sides (see
    // register) instead of silently aliasing two names to one entry
    require(!parts.exists(_.contains(".")),
      s"graft catalog: identifier segments may not contain '.': " +
        parts.mkString("`", "`.`", "`"))
    parts.mkString(".")
  }

  /** Commit `tables` as the next catalog version — EXCLUSIVE creation,
    * pinned against the version the caller READ (`expectVersion`):
    * a concurrent catalog commit throws instead of being overwritten
    * or interleaved. This single swap is the transaction boundary.
    */
  private def commit(warehouse: String,
      tables: Map[String, CatalogEntry], expectVersion: Long): Long = {
    val dir = catDir(warehouse)
    dir.mkdirs()
    val next = expectVersion + 1
    val root = M.createObjectNode()
    val tn = root.putObject("tables")
    val whAbs = new java.io.File(warehouse).getAbsolutePath
    tables.toSeq.sortBy(_._1).foreach { case (k, e) =>
      val o = tn.putObject(k)
      o.put("format", e.format)
      // re-relativize warehouse-local paths: the stored form must
      // survive a warehouse move (and the staging slot's final rename)
      o.put("path",
        if (e.path.startsWith(whAbs + "/"))
          e.path.stripPrefix(whAbs + "/")
        else e.path)
      o.put("version", e.version)
      if (e.managed) { o.put("managed", true); () }
      ()
    }
    val target = new java.io.File(dir, s"v$next.catalog.json").toPath
    val tmp = java.nio.file.Files.createTempFile(dir.toPath,
      s".cat-$next-", ".tmp")
    try {
      java.nio.file.Files.writeString(tmp, M.writeValueAsString(root))
      try java.nio.file.Files.createLink(target, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new java.util.ConcurrentModificationException(
            s"graft catalog at $warehouse advanced past version " +
              s"$expectVersion — this commit was NOT applied; re-read " +
              "and retry")
      }
    } finally { java.nio.file.Files.deleteIfExists(tmp); () }
    next
  }

  /** ONE format dispatch for batch writes (the bridge, Tx.write,
    * CREATE TABLE's empty commit).
    */
  private[sources] def writeVia(spark: SparkSession, format: String,
      path: String, df: DataFrame, mode: String, name: String,
      partitionBy: Seq[String] = Seq.empty): Long =
    format match {
      case "graft-deltalake" =>
        DeltaLake.write(spark, path, df, mode, partitionBy)
      case "graft-iceberg" =>
        Iceberg.write(spark, path, df, mode, partitionBy)
      case other => throw new IllegalArgumentException(
        s"graft catalog: unknown format '$other' for $name")
    }

  /** Enforce the STORED schema's non-nullable fields on a write batch
    * (one extra pass over the batch — correctness over the statement's
    * own data beats a spec-invalid file).
    */
  private[sources] def requireNoNullsInRequired(spark: SparkSession,
      format: String, path: String, data: DataFrame,
      name: String): Unit = {
    import org.apache.spark.sql.functions.col
    val stored = format match {
      case "graft-deltalake" => DeltaLake.storedSchema(spark, path)
      case "graft-iceberg" => Iceberg.resolve(spark, path, None).schema
      case _ => return
    }
    val required = stored.fields.filterNot(_.nullable).map(_.name)
      .filter(data.columns.contains)
    if (required.isEmpty) return
    val bad = data.filter(required.map(col(_).isNull)
      .reduce(_ || _)).limit(1).collect()
    require(bad.isEmpty,
      s"graft catalog: INSERT into $name carries NULL in required " +
        s"column(s) ${required.mkString(", ")} — the table's stored " +
        "schema forbids it (row: " + bad.headOption.getOrElse("") + ")")
  }

  private def headOf(spark: SparkSession, format: String,
      path: String): Long = format match {
    case "graft-deltalake" => DeltaLake.latestVersion(spark, path)
    case "graft-iceberg" => Iceberg.currentSnapshotId(path)
    case other => throw new IllegalArgumentException(
      s"graft catalog: unknown format '$other' (graft-deltalake | " +
        "graft-iceberg)")
  }

  /** Resolve a stream/batch SOURCE's `warehouse` + `table` options to
    * the registered entry's absolute table path (None when no `table`
    * option — the caller falls back to `path`). NAME→PATH binding
    * happens ONCE here, at source creation; a STREAM then follows the
    * TABLE LOG — its offsets are table versions/sequence numbers,
    * which is where streaming's exactly-once contract lives — never
    * the catalog pin (a batch-read consistency device: following it
    * would stall the stream until someone re-pins). Re-pins and
    * re-registrations do not retarget a running stream. The entry's
    * format must match the source's.
    */
  def streamTarget(parameters: Map[String, String],
      format: String): Option[String] =
    parameters.get("table").map { name =>
      val wh = parameters.getOrElse("warehouse",
        throw new IllegalArgumentException(
          s"graft $format source: option 'table' ('$name') needs " +
            "option 'warehouse' (the graft catalog directory)"))
      val e = entries(wh).getOrElse(name,
        throw new IllegalArgumentException(
          s"graft $format source: no table '$name' registered in " +
            s"catalog warehouse $wh"))
      require(e.format == format,
        s"graft $format source: table '$name' is ${e.format} — read " +
          s"it with format(\"${e.format}\")")
      absPath(wh, e.path)
    }

  /** Register (or re-pin) `name` at the table's CURRENT head. `path`
    * may be warehouse-relative (stored as given, resolved at read).
    */
  def register(spark: SparkSession, warehouse: String, name: String,
      format: String, path: String): Long = {
    require(name.split('.').forall(_.nonEmpty) && !name.startsWith(".")
        && !name.endsWith("."),
      s"graft catalog: malformed table name '$name' (dot-separated " +
        "non-empty segments)")
    retryOnCatalogRace {
      val (tables, v) = state(warehouse)
      // a RE-register of a managed (DDL-created) table keeps it
      // managed — re-pinning must not silently demote it to external
      // (DROP would stop purging and block the next CREATE)
      val managed = tables.get(name).exists(_.managed)
      commit(warehouse, tables + (name -> CatalogEntry(format, path,
        headOf(spark, format, absPath(warehouse, path)),
        managed = managed)), v)
    }
  }

  /** Move `name`'s pin FORWARD to `version` — the single-table commit
    * the catalog-name write path ends with. MONOTONE: table logs are
    * linear, so a pin already at-or-past `version` includes these rows
    * — moving it backward would hide a racing writer's committed
    * insert (lost update). RETRIES a lost catalog race (the underlying
    * TABLE write already landed; aborting here would push SQL users
    * into re-running the whole INSERT and duplicating rows).
    */
  def advancePin(warehouse: String, name: String,
      version: Long): Long = {
    var attempts = 0
    while (true) {
      val (tables, v) = state(warehouse)
      val e = tables.getOrElse(name, throw new IllegalArgumentException(
        s"graft catalog: no table '$name' to re-pin"))
      if (e.version >= version) return v // already visible
      try return commit(warehouse,
        tables + (name -> e.copy(version = version)), v)
      catch {
        case cme: java.util.ConcurrentModificationException =>
          attempts += 1
          if (attempts >= 20) throw cme
      }
    }
    -1L // unreachable
  }

  /** One partition transform in the target format's writer syntax. */
  private[sources] def transformSpec(
      t: org.apache.spark.sql.connector.expressions.Transform,
      format: String, key: String): String = {
    import org.apache.spark.sql.connector.expressions.{Expression, Literal, NamedReference}
    def arg(e: Expression): String = e match {
      case n: NamedReference => n.fieldNames.mkString(".")
      case l: Literal[_] => String.valueOf(l.value)
      case other => throw new IllegalArgumentException(
        s"graft catalog: CREATE TABLE $key — unsupported partition " +
          s"transform argument '$other'")
    }
    t.name match {
      case "identity" => arg(t.references()(0))
      case _ if format == "graft-iceberg" =>
        s"${t.name}(${t.arguments.map(arg).mkString(", ")})"
      case other => throw new IllegalArgumentException(
        s"graft catalog: CREATE TABLE $key — Delta partitioning is " +
          s"plain columns; transform '$other' needs USING " +
          "graft-iceberg")
    }
  }

  /** Bounded retry on a lost CATALOG commit race — the shared policy
    * for every operation whose commit can lose to an UNRELATED table's
    * commit (DML re-pins, DDL): the body re-reads catalog state and
    * re-validates per attempt.
    */
  private[graft] def retryOnCatalogRace[T](body: => T): T = {
    var attempts = 0
    while (true) {
      try return body
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempts += 1
          if (attempts >= 10) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** CREATE the table on disk (an empty native commit — the CTAS
    * write follows through the V1 bridge) and commit its pin. Managed
    * = no LOCATION: data under the warehouse at the identifier's
    * path, purged on [[drop]]. The target directory must not already
    * hold a table — adopting existing data is [[register]]'s job, and
    * doing it silently here would make CREATE TABLE content depend on
    * leftovers. Two concurrent CREATEs of one identifier race on the
    * NATIVE commit (no retries — `maxRetries = 0` — so the loser can
    * never graft a schema change onto the winner's table) and then on
    * the catalog commit; the loser CLEANS UP what it created, so a
    * failed CREATE TABLE is re-runnable.
    */
  private[sources] def create(spark: SparkSession, warehouse: String,
      key: String, format: String, schema: StructType,
      partitionBy: Seq[String], location: Option[String],
      ident: Identifier): Unit = {
    val (tables0, _) = state(warehouse)
    if (tables0.contains(key))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val rel = location.getOrElse(key.split('.').mkString("/"))
    val abs = absPath(warehouse, rel)
    val marker = format match {
      case "graft-deltalake" => new java.io.File(abs, "_delta_log")
      case _ => new java.io.File(abs, "metadata")
    }
    require(!marker.exists(),
      s"graft catalog: CREATE TABLE $key — a table already exists on " +
        s"disk at $abs; drop/clean it, or adopt it with register()")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    def cleanup(): Unit = if (location.isEmpty) rmTree(new java.io.File(abs))
    val version =
      try format match {
        case "graft-deltalake" =>
          DeltaLake.write(spark, abs, empty, "append", partitionBy,
            maxRetries = 0)
        case "graft-iceberg" =>
          Iceberg.write(spark, abs, empty, "append", partitionBy)
        case other => throw new IllegalArgumentException(
          s"graft catalog: unknown format '$other' for $key")
      } catch {
        case e: java.util.ConcurrentModificationException =>
          // another CREATE won the native commit: OUR artifacts (the
          // landed-but-uncommitted files) are vacuum material; the
          // identifier is taken
          throw new org.apache.spark.sql.catalyst.analysis
            .TableAlreadyExistsException(ident)
      }
    try retryOnCatalogRace {
      val (tables, v) = state(warehouse)
      if (tables.contains(key)) {
        // a concurrent CREATE of the same identifier won the catalog:
        // remove what we created and refuse
        cleanup()
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(ident)
      }
      commit(warehouse, tables + (key -> CatalogEntry(format, rel,
        version, managed = location.isEmpty)), v)
    } catch {
      case e: java.util.ConcurrentModificationException =>
        // catalog contention exhausted the retries: don't strand a
        // managed dir that would block the re-run
        cleanup()
        throw e
    }
    ()
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  def drop(warehouse: String, name: String): Boolean =
    retryOnCatalogRace {
      val (tables, v) = state(warehouse)
      tables.get(name) match {
        case None => false
        case Some(e) =>
          commit(warehouse, tables - name, v)
          // managed data purges AFTER the catalog forgets the table: a
          // failure mid-purge strands files (re-deletable), never a
          // catalog entry pointing at half a table. Before deleting,
          // re-read the catalog: a concurrent CREATE may have
          // re-claimed the same identifier — which lands at the SAME
          // warehouse path — between the commit above and this purge,
          // and the purge would eat the new table's data (r13 advice).
          if (e.managed) {
            val abs = absPath(warehouse, e.path)
            val (now, _) = state(warehouse)
            val reclaimed = now.values.exists(x =>
              absPath(warehouse, x.path) == abs)
            if (!reclaimed) rmTree(new java.io.File(abs))
          }
          true
      }
    }

  def rename(warehouse: String, from: String, to: String): Unit = {
    retryOnCatalogRace {
      val (tables, v) = state(warehouse)
      val e = tables.getOrElse(from, throw new IllegalArgumentException(
        s"graft catalog: no table '$from'"))
      require(!tables.contains(to),
        s"graft catalog: table '$to' already exists")
      commit(warehouse, tables - from + (to -> e), v)
    }
    ()
  }

  /** Reclaim ORPHANED table versions — staging an aborted
    * [[transaction]] leaves (table-level writes landed, pins never
    * swapped): for every catalog entry whose table HEAD is ahead of
    * its PIN, roll the table back to the pin and reclaim what the
    * orphan versions introduced, routed to each format's own
    * machinery ([[DeltaLake.truncateAfter]];
    * [[Iceberg.rollback]] + [[Iceberg.expireSnapshots]] with the
    * orphan cut). Pinned versions — and everything at or before them,
    * time travel included — are never touched. Run it BETWEEN
    * transactions (catalog maintenance owns the tables while it
    * runs); a transaction starting after the reclaim stages from the
    * pinned head again, so the adopt-orphans hazard documented on
    * [[transaction]] is gone for reclaimed tables.
    *
    * Returns the reclaimed asset paths per table (only tables where
    * something was reclaimed appear).
    */
  def vacuumOrphans(spark: SparkSession,
      warehouse: String): Map[String, Seq[String]] = {
    val (tables, _) = state(warehouse)
    // ALIASES: two catalog names may pin ONE table path at different
    // versions (r13 advice) — they share the table's history, so
    // reclaiming past the lower pin would delete versions the other
    // alias still serves. Group by ABSOLUTE path (also fixing
    // relative-path entries, which the per-entry form resolved
    // against the working directory) and reclaim only past the MAX
    // pin across the aliases; every lower pin stays readable because
    // both reclaim paths only drop versions ABOVE the horizon.
    tables.toSeq
      .groupBy { case (_, e) => absPath(warehouse, e.path) }
      .flatMap { case (abs, aliases) =>
        val maxPin = aliases.map(_._2.version).max
        val names = aliases.map(_._1).sorted
        val formats = aliases.map(_._2.format).distinct
        require(formats.size == 1,
          s"graft catalog: $abs is registered under two formats " +
            s"(${formats.mkString(", ")} — ${names.mkString(", ")}); " +
            "one of the entries is wrong — fix it before vacuuming")
        val format = formats.head
        val reclaimed = format match {
          case "graft-deltalake" =>
            if (DeltaLake.latestVersion(spark, abs) > maxPin)
              DeltaLake.truncateAfter(spark, abs, maxPin)
            else Seq.empty
          case "graft-iceberg" =>
            if (Iceberg.currentSnapshotId(abs) != maxPin) {
              Iceberg.rollback(spark, abs, maxPin)
              Iceberg.expireSnapshots(spark, abs, keepLast = 1,
                dropAfter = Some(maxPin))
            } else Seq.empty
          case other => throw new IllegalArgumentException(
            s"graft catalog: unknown format '$other' for " +
              names.mkString(","))
        }
        if (reclaimed.isEmpty) None
        else Some(names.mkString(",") -> reclaimed)
      }
  }

  /** A MULTI-TABLE TRANSACTION: stage writes against any number of
    * catalog tables, then swap every pin in ONE exclusive catalog
    * commit. The table-level writes land first (each table's own log
    * grows — path readers may see them early, the documented
    * catalog-vs-path visibility split every table-format catalog has);
    * CATALOG readers see all of them or none. A failure before the
    * swap leaves every pin untouched — the staged table versions are
    * orphans for vacuum/expire. A concurrent catalog commit between
    * this transaction's read and its swap throws
    * ConcurrentModificationException: re-run the transaction.
    *
    * Staging is HEAD-BASED (the write lands on the table's current
    * head, like every path-addressed lakehouse writer): an aborted
    * transaction's orphan versions are therefore ADOPTED by the next
    * pin advance on that table. The guarantee is atomicity of the
    * swap, not head rollback — vacuum/expire orphans (or re-create the
    * table) before re-pinning if that matters.
    */
  def transaction(spark: SparkSession, warehouse: String)
      (body: Tx => Unit): Long = {
    val (tables, v) = state(warehouse)
    val tx = new Tx(spark, tables)
    body(tx)
    require(tx.touched,
      "graft catalog transaction: no table operations staged")
    // every operation may have been a no-op (e.g. a delete matching
    // nothing): a legitimate empty transaction, nothing to swap
    if (tx.newPins.isEmpty) v
    else commit(warehouse, tables ++ tx.newPins, v)
  }

  /** The in-flight transaction handle: reads resolve the transaction's
    * BASE pins (snapshot isolation); writes go through the native
    * writers and collect the produced versions for the final swap.
    */
  final class Tx private[GraftCatalog] (spark: SparkSession,
      base: Map[String, CatalogEntry]) {
    private[GraftCatalog] var newPins = Map.empty[String, CatalogEntry]
    private[GraftCatalog] var touched = false

    private def entryOf(name: String): CatalogEntry =
      newPins.getOrElse(name, base.getOrElse(name,
        throw new IllegalArgumentException(
          s"graft catalog transaction: no table '$name' " +
            s"(registered: ${base.keys.toSeq.sorted.mkString(", ")})")))

    /** Read `name` as of this transaction's pins — its own staged
      * writes visible, everything else the base snapshot.
      */
    def read(name: String): DataFrame = {
      val e = entryOf(name)
      GraftCatalogTable(name, e, "", name).resolved(spark)
    }

    /** Append/overwrite `name` through its native writer; the new
      * version joins the swap set.
      */
    def write(name: String, df: DataFrame,
        mode: String = "append"): Unit = {
      touched = true
      val e = entryOf(name)
      newPins += name -> e.copy(version =
        writeVia(spark, e.format, e.path, df, mode, name))
    }

    /** Row-level DELETE on `name` through its native writer. A delete
      * matching no live row is a NO-OP (no table commit, no pin move)
      * — the transaction still commits.
      */
    def delete(name: String,
        predicate: org.apache.spark.sql.Column): Unit = {
      touched = true
      val e = entryOf(name)
      val newVersion = e.format match {
        case "graft-deltalake" => DeltaLake.delete(spark, e.path, predicate)
        case "graft-iceberg" => Iceberg.delete(spark, e.path, predicate)
        case other => throw new IllegalArgumentException(
          s"graft catalog: unknown format '$other' for $name")
      }
      if (newVersion >= 0) newPins += name -> e.copy(version = newVersion)
    }
  }
}
