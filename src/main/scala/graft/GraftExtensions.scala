package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.sources.GraftLakeRelation

/** Session extensions making the lakehouse readers first-class in SQL
  * and in the DataFrame reader — install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`).
  *
  * One analyzer rule, two jobs:
  *
  *  1. `spark.read.format("graft-deltalake"/"graft-iceberg")` plans
  *     resolve to a [[GraftLakeRelation]] leaf; the rule SPLICES the
  *     library-built logical plan in its place (same output attribute
  *     ids, so parent references hold). The executed plan is then the
  *     native log-backed parquet scan — pushdown, partition pruning,
  *     stats skipping, whole-stage codegen — not the V1 row fallback.
  *  2. Temp-view-free SQL access:
  *     `SELECT ... FROM graft_delta.`/path/to/table`` and
  *     `graft_iceberg.`...`` resolve the path directly (the two-part
  *     "schema" names are claimed by this rule before catalog lookup
  *     can fail them).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => new ResolveGraftRelations(session))
    ()
  }
}

/** The splice rule (see [[GraftExtensions]]). Runs in the analyzer's
  * resolution batch: by the time any downstream rule sees the plan,
  * graft relations are ordinary analyzed subtrees.
  */
class ResolveGraftRelations(session: SparkSession)
    extends Rule[LogicalPlan] {

  private val SqlSchemes = GraftDml.SqlSchemes

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Fast bail-out, ONE traversal: the resolution batch runs this
    // rule to fixpoint on EVERY analysis pass, and Structured
    // Streaming re-analyzes every micro-batch — a plan with no graft
    // leaf and no DML root must not pay the splice machinery (three
    // traversals, catalog state reads) per pass. Every case the body
    // below can act on is a node this predicate matches.
    val touchesGraft = plan.exists {
      case lr: LogicalRelation =>
        lr.relation.isInstanceOf[GraftLakeRelation]
      case u: UnresolvedRelation =>
        u.multipartIdentifier.length == 2 &&
          SqlSchemes.contains(u.multipartIdentifier.head.toLowerCase)
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation =>
        r.table.isInstanceOf[graft.sources.GraftCatalogTable]
      case _ => false
    }
    if (!touchesGraft) return plan
    // SQL row-level DML over catalog tables converts to an eager
    // native-writer command once resolved (GraftDml); until then the
    // DML target relation is SHIELDED from the splice below — the
    // conversion needs the V2 relation and its pin, not a Project
    GraftDml.convert(session, plan) match {
      case Some(cmd) => return cmd
      case None => ()
    }
    val shielded = GraftDml.shieldedRelations(plan)
    // CROSS-TABLE CONSISTENCY for catalog reads: each loadTable reads
    // the catalog independently, so a transaction committing between
    // two resolutions of one query could produce exactly the torn
    // read transactions exist to prevent. The rule sees the WHOLE
    // plan: one state read per warehouse re-pins every catalog
    // relation of this query to the SAME catalog version (a name
    // dropped in between keeps its loadTable pin).
    val catWarehouses = plan.collect {
      // time-traveled relations carry an explicit pin and are exempt
      // from the re-pin — don't pay their catalog read
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.GraftCatalogTable] &&
            !r.table.asInstanceOf[graft.sources.GraftCatalogTable]
              .timeTravel =>
        r.table.asInstanceOf[graft.sources.GraftCatalogTable].warehouse
    }.distinct
    val consistent: Map[String, Map[String, graft.sources.CatalogEntry]] =
      catWarehouses.map(wh =>
        wh -> graft.sources.GraftCatalog.entries(wh)).toMap
    plan.resolveOperatorsUp {
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[GraftLakeRelation] =>
        val spliced = lr.relation.asInstanceOf[GraftLakeRelation]
          .resolved.queryExecution.analyzed
        val byName = spliced.output.map(a => a.name -> a).toMap
        // keep the leaf's attribute ids: references already bound to
        // the relation's output must keep resolving after the splice
        Project(lr.output.map { o =>
          val src = byName.getOrElse(o.name,
            throw new IllegalStateException(
              s"graft splice: relation output '${o.name}' missing " +
                s"from the library plan (${byName.keys.mkString(",")})"))
          Alias(src, o.name)(exprId = o.exprId)
        }, spliced)

      case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            SqlSchemes.contains(u.multipartIdentifier.head.toLowerCase) =>
        val path = u.multipartIdentifier(1)
        val fmt = SqlSchemes(u.multipartIdentifier.head.toLowerCase)
        SubqueryAlias(u.multipartIdentifier.last,
          GraftLakeRelation.resolve(session, fmt, path, Map.empty)
            .queryExecution.analyzed)

      // the file-based catalog's V2 relations splice the same way:
      // the pinned native snapshot plan replaces the leaf, attribute
      // ids preserved — using THIS QUERY's consistent pins (above)
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.GraftCatalogTable] &&
            !shielded.exists(_ eq r) =>
        val t = r.table.asInstanceOf[graft.sources.GraftCatalogTable]
        // a VERSION/TIMESTAMP AS OF relation carries an EXPLICIT pin —
        // the consistency re-pin must not override it
        val pinned =
          if (t.timeTravel) t
          else consistent.get(t.warehouse).flatMap(_.get(t.key))
            .map(e => graft.sources.GraftCatalogTable(
              t.fullName, e, t.warehouse, t.key))
            .getOrElse(t)
        val spliced = pinned.resolved(session).queryExecution.analyzed
        val byName = spliced.output.map(a => a.name -> a).toMap
        Project(r.output.map { o =>
          val src = byName.getOrElse(o.name,
            throw new IllegalStateException(
              s"graft catalog splice: output '${o.name}' missing from " +
                s"the pinned plan (${byName.keys.mkString(",")})"))
          Alias(src, o.name)(exprId = o.exprId)
        }, spliced)
    }
  }
}
