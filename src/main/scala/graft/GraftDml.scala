package graft

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, Exists, Expression, InSet, InSubquery, ListQuery, OuterReference, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, Filter, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.GraftSql

import graft.sources.{DeltaLake, GraftCatalog, GraftCatalogTable, Iceberg}

/** The eagerly-executed leaf a SQL row-level DML statement over a
  * catalog table converts into (see [[GraftDml]]): `run` drives the
  * native writer and the catalog re-pin. V1 commands execute once,
  * eagerly, at `spark.sql(...)` time — the DML statement behaves like
  * any other Spark SQL command.
  */
case class GraftDmlCommand(statement: String, body: SparkSession => Unit)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    body(spark)
    Seq.empty
  }
}

/** SQL ROW-LEVEL DML over [[graft.sources.GraftCatalog]] tables —
  * `DELETE FROM gcat.db.t WHERE …`, `UPDATE gcat.db.t SET … WHERE …`,
  * `MERGE INTO gcat.db.t USING s ON … WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *` — routed to the NATIVE DML writers
  * ([[DeltaLake.delete]]/[[DeltaLake.update]]/[[DeltaLake.merge]] and
  * their Iceberg twins, all hash-oracled since the write-path round)
  * the same way the INSERT bridge routes batch writes: the analyzer
  * intercepts the resolved logical DML node, lowers its expressions to
  * name-based Columns, and replaces the node with a
  * [[GraftDmlCommand]] that commits through the native writer and
  * MONOTONE-re-pins the catalog entry ([[GraftCatalog.advancePin]] —
  * a racing catalog commit retries the pin, never the table write).
  *
  * Scope is the native writers' scope, refused loudly beyond it:
  * subqueries in predicates lower by MATERIALIZATION
  * ([[lowerSubqueries]] — uncorrelated IN/scalar, single-equality
  * EXISTS; other correlation shapes refuse), MERGE needs at least
  * one same-name key equality in ON (extra conjuncts refine the
  * match; canonical upserts route to the lean native merge, every
  * other clause combination — conditional matched UPDATE/DELETE,
  * explicit value lists, NOT MATCHED BY SOURCE — to the general-form
  * writers), and a time-traveled relation is not a write target.
  *
  * Like the INSERT bridge and [[GraftCatalog.transaction]], staging is
  * HEAD-BASED: the DML commits on the TABLE's current head and the
  * re-pin publishes it — so unpinned orphan versions (an aborted
  * transaction's staging) are ADOPTED by the next DML, the documented
  * catalog trade. Run [[GraftCatalog.vacuumOrphans]] after an abort if
  * adoption is not wanted; a head==pin gate here would instead refuse
  * legitimate concurrent statements (another statement's table write
  * lands before its re-pin).
  */
object GraftDml {

  /** The temp-view-free SQL path schemes — shared with the read-side
    * resolution ([[GraftExtensions]]).
    */
  val SqlSchemes: Map[String, String] =
    Map("graft_delta" -> "graft-deltalake",
      "graft_iceberg" -> "graft-iceberg")

  private def stripAliases(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => stripAliases(child)
    case other => other
  }

  /** A PATH-identifier DML target (`DELETE FROM graft_delta.`/p``) —
    * recognized PRE-resolution (the parser's own shapes), because the
    * scheme identifier never resolves through a catalog. `alias` is
    * the statement's table alias, stripped from qualified column
    * references at lowering.
    */
  private final case class PathTarget(format: String, path: String,
      alias: Option[String])

  private def pathTargetOf(p: LogicalPlan): Option[PathTarget] =
    p match {
      case SubqueryAlias(ident, child) =>
        pathTargetOf(child).map(_.copy(alias = Some(ident.name)))
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            SqlSchemes.contains(u.multipartIdentifier.head.toLowerCase) =>
        Some(PathTarget(
          SqlSchemes(u.multipartIdentifier.head.toLowerCase),
          u.multipartIdentifier(1), None))
      case _ => None
    }

  private def targetOf(p: LogicalPlan): Option[GraftCatalogTable] =
    stripAliases(p) match {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftCatalogTable] =>
        Some(r.table.asInstanceOf[GraftCatalogTable])
      case _ => None
    }

  /** DML target relations the splice rule must leave intact: the
    * conversion below needs the V2 relation (and its catalog pin), not
    * a spliced Project over the snapshot plan. Reads elsewhere in the
    * same statement (e.g. a MERGE source) still splice normally.
    */
  def shieldedRelations(plan: LogicalPlan): Seq[LogicalPlan] =
    (plan match {
      case DeleteFromTable(t, _) => Seq(t)
      case UpdateTable(t, _, _) => Seq(t)
      case m: MergeIntoTable => Seq(m.targetTable)
      case _ => Seq.empty
    }).map(stripAliases).filter(targetOf(_).isDefined)

  /** Convert a RESOLVED root-level DML node over a catalog table into
    * its [[GraftDmlCommand]]. None = not a catalog DML statement (or
    * not yet resolved — the analyzer fixpoint will come back).
    */
  def convert(session: SparkSession,
      plan: LogicalPlan): Option[LogicalPlan] = plan match {

    case d @ DeleteFromTable(target, cond) =>
      targetOf(target).collect { case t if d.resolved =>
        val stmt = s"DELETE FROM ${t.fullName}"
        checkWritable(t, stmt)
        val pred = nameBased(session, cond, stmt)
        GraftDmlCommand(stmt, spark => commitVia(t,
          DeltaLake.delete(spark, t.entry.path, pred),
          Iceberg.delete(spark, t.entry.path, pred)))
      }.orElse(pathTargetOf(target).map { pt =>
        // path identifiers convert PRE-resolution: the parser's
        // predicate is already name-based (UnresolvedAttributes), so
        // the native writer resolves it against its own scan directly
        val stmt = s"DELETE FROM ${pt.format} `${pt.path}`"
        val pred = unresolvedColumn(session, cond, pt.alias, stmt)
        GraftDmlCommand(stmt, spark => pathVia(pt,
          DeltaLake.delete(spark, pt.path, pred),
          Iceberg.delete(spark, pt.path, pred)))
      })

    case u @ UpdateTable(target, assignments, condOpt) =>
      targetOf(target).collect { case t if u.resolved =>
        val stmt = s"UPDATE ${t.fullName}"
        checkWritable(t, stmt)
        val tAttrIds = stripAliases(target).outputSet.map(_.exprId).toSet
        def canon(raw: String): String = stripAliases(target).output
          .find(_.name.equalsIgnoreCase(raw)).map(_.name).getOrElse(raw)
        // identity assignments (a column set to itself — alignment
        // fill-ins) are no-ops, dropped rather than rewritten;
        // NESTED struct-member targets (`SET s.a = …`) lower to a
        // whole-column rebuild via [[foldNestedSets]]
        val set: Seq[(String, Seq[String], Column)] =
          assignments.flatMap { a =>
            val (name, path) = keyPathOf(a.key, canon, stmt)
            (path, stripCasts(a.value)) match {
              case (Seq(), ar: AttributeReference)
                  if tAttrIds.contains(ar.exprId) &&
                    ar.name.equalsIgnoreCase(name) =>
                None
              case _ =>
                Some((name, path, nameBased(session, a.value, stmt)))
            }
          }
        val pred = condOpt.map(nameBased(session, _, stmt)).getOrElse(lit(true))
        // an ALL-IDENTITY statement (`SET a = a`) still REWRITES the
        // matched rows in Spark/Delta semantics — history and CDF
        // observers see the commit — so route ONE identity assignment
        // through the native writer instead of silently no-opping
        // (r13 advice). The identity drop above only exists to peel
        // the analyzer's alignment fill-ins off real SET lists.
        val effective: Map[String, Column] =
          if (set.nonEmpty) foldNestedSets(set, stmt)
          else identitySetOf(assignments, stmt, canon)
        GraftDmlCommand(stmt, spark => commitVia(t,
          DeltaLake.update(spark, t.entry.path, pred, effective),
          Iceberg.update(spark, t.entry.path, pred, effective)))
      }.orElse(pathTargetOf(target).map { pt =>
        val stmt = s"UPDATE ${pt.format} `${pt.path}`"
        val set: Seq[(String, Seq[String], Column)] =
          assignments.flatMap { a =>
            val parts = a.key match {
              case ua: UnresolvedAttribute =>
                dealias(ua, pt.alias).nameParts
              case other => refuse(s"$stmt: SET target must be a " +
                s"column or struct member, got '${other.sql}'")
            }
            val (name, path) = (parts.head, parts.tail)
            a.value match {
              // identity `SET a = a` — CASE-INSENSITIVE like the
              // resolved catalog arm (Spark SQL resolution is);
              // top-level only (a nested member set to itself still
              // rebuilds the struct — a legal no-op rewrite)
              case ua: UnresolvedAttribute
                  if path.isEmpty &&
                    (dealias(ua, pt.alias).nameParts match {
                      case Seq(one) => one.equalsIgnoreCase(name)
                      case _ => false
                    }) =>
                None
              case v => Some((name, path,
                unresolvedColumn(session, v, pt.alias, stmt)))
            }
          }
        val pred = condOpt.map(unresolvedColumn(session, _, pt.alias, stmt))
          .getOrElse(lit(true))
        // all-identity: same rewrite semantics as the catalog arm
        val effective: Map[String, Column] =
          if (set.nonEmpty) foldNestedSets(set, stmt)
          else identitySetOf(assignments, stmt)
        GraftDmlCommand(stmt, spark => pathVia(pt,
          DeltaLake.update(spark, pt.path, pred, effective),
          Iceberg.update(spark, pt.path, pred, effective)))
      })

    case m: MergeIntoTable =>
      // WITH SCHEMA EVOLUTION and a source struct WIDER than the
      // target's: Spark's own star alignment inserts a NARROWING
      // struct cast (source struct → pre-evolution target struct)
      // that can never type-check, so `m.resolved` stays false and
      // validation would fail the statement before this bridge runs.
      // Accept the node when everything EXCEPT those casts is
      // resolved — the lowering reads assignment values through
      // [[stripCasts]] anyway (the star detection and the full-row
      // forms never execute the narrowing cast).
      def evolutionReady: Boolean = m.withSchemaEvolution &&
        m.targetTable.resolved && m.sourceTable.resolved &&
        m.mergeCondition.resolved &&
        (m.matchedActions ++ m.notMatchedActions ++
          m.notMatchedBySourceActions).forall {
          case ua: UpdateAction =>
            ua.condition.forall(_.resolved) && ua.assignments.forall(
              a => a.key.resolved && stripCasts(a.value).resolved)
          case ia: InsertAction =>
            ia.condition.forall(_.resolved) && ia.assignments.forall(
              a => a.key.resolved && stripCasts(a.value).resolved)
          case da: DeleteAction => da.condition.forall(_.resolved)
          case ua: UpdateStarAction => ua.condition.forall(_.resolved)
          case ia: InsertStarAction => ia.condition.forall(_.resolved)
          case _ => false
        }
      targetOf(m.targetTable).collect {
        case t if m.resolved || evolutionReady =>
        val stmt = s"MERGE INTO ${t.fullName}"
        checkWritable(t, stmt)
        // WITH SCHEMA EVOLUTION: source-only columns ADD to the table
        // (nullable, in their own evolution commit ahead of the
        // merge — [[DeltaLake.addColumns]]/[[Iceberg.addFields]], the
        // CDC shape where the feed gains a column). Same-name type
        // conflicts refuse (widening is an explicit ALTER, never a
        // merge side effect), and with columns actually added the
        // clause set must be STAR-SHAPED — an explicit assignment
        // list was resolved against the pre-evolution schema and
        // would silently drop the new columns it cannot name.
        // evolution units are (parent path, field): an empty path is a
        // new TOP-LEVEL column; a non-empty one a new STRUCT MEMBER
        // (the source struct gained a field — sound only when the
        // source carries the target's members as a positional PREFIX,
        // because the writers align structs positionally; diverging
        // layouts refuse with the reorder hint)
        def nestedAdds(path: Seq[String],
            ti: org.apache.spark.sql.types.StructType,
            si: org.apache.spark.sql.types.StructType)
            : Seq[(Seq[String], org.apache.spark.sql.types.StructField)] = {
          refuseIf(si.length < ti.length ||
              !ti.fields.zip(si.fields).forall { case (a, b) =>
                a.name.equalsIgnoreCase(b.name) },
            s"$stmt: WITH SCHEMA EVOLUTION: struct " +
              s"'${path.mkString(".")}' — the source's member layout " +
              s"(${si.fieldNames.mkString(", ")}) does not start with " +
              s"the target's (${ti.fieldNames.mkString(", ")}); the " +
              "writers align structs positionally, so new members " +
              "must APPEND — reorder the source struct")
          val deeper = ti.fields.zip(si.fields).flatMap {
            case (a, b) => (a.dataType, b.dataType) match {
              case (x: org.apache.spark.sql.types.StructType,
                  y: org.apache.spark.sql.types.StructType) =>
                nestedAdds(path :+ a.name, x, y)
              case (x, y) =>
                refuseIf(x.catalogString != y.catalogString,
                  s"$stmt: WITH SCHEMA EVOLUTION: member " +
                    s"'${(path :+ a.name).mkString(".")}' is " +
                    s"${x.simpleString} in the target but " +
                    s"${y.simpleString} in the source — types never " +
                    "evolve through a merge; widen explicitly, then " +
                    "merge")
                Seq.empty
            }
          }.toSeq
          deeper ++ si.fields.drop(ti.length).map(nf =>
            (path, org.apache.spark.sql.types.StructField(
              nf.name, nf.dataType, nullable = true)))
        }
        val evolveCols
            : Seq[(Seq[String], org.apache.spark.sql.types.StructField)] =
          if (!m.withSchemaEvolution) Seq.empty
          else {
            val tFields = stripAliases(m.targetTable).output
            m.sourceTable.output.flatMap { sa =>
              tFields.find(_.name.equalsIgnoreCase(sa.name)) match {
                case Some(ta) =>
                  (ta.dataType, sa.dataType) match {
                    case (ti: org.apache.spark.sql.types.StructType,
                        si: org.apache.spark.sql.types.StructType) =>
                      nestedAdds(Seq(ta.name), ti, si)
                    case (x, y) =>
                      refuseIf(x.catalogString != y.catalogString,
                        s"$stmt: WITH SCHEMA EVOLUTION: column " +
                          s"'${sa.name}' is ${x.simpleString} " +
                          s"in the target but ${y.simpleString} " +
                          "in the source — types never evolve " +
                          "through a merge; widen explicitly (ALTER " +
                          "TABLE … ALTER COLUMN … TYPE), then merge")
                      None
                  }
                case None => Some((Seq.empty[String],
                  org.apache.spark.sql.types.StructField(
                    sa.name, sa.dataType, nullable = true)))
              }
            }.toSeq
          }
        val tOut = stripAliases(m.targetTable).outputSet
        val sOut = m.sourceTable.outputSet
        // ON = same-name key equalities (file locality) + optional
        // EXTRA conjuncts refining the match (lowered per the matched
        // scope; the writers treat key-equal-but-extra-failed pairs
        // as NOT matched on both sides)
        val (keyConjuncts, extraConjuncts) =
          splitConjuncts(m.mergeCondition).partitionMap {
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if tOut.contains(a) && sOut.contains(b) &&
                  a.name.equalsIgnoreCase(b.name) => Left(a.name)
            case EqualTo(b: AttributeReference, a: AttributeReference)
                if tOut.contains(a) && sOut.contains(b) &&
                  a.name.equalsIgnoreCase(b.name) => Left(a.name)
            case other => Right(other)
          }
        val keys = keyConjuncts
        // pure theta ON: refused by default (no file locality), but a
        // session can opt into the documented full-table fallback
        val thetaOk = keys.isEmpty && session.conf
          .get("spark.graft.merge.allowThetaFullScan", "false")
          .toBoolean
        refuseIf(keys.isEmpty && !thetaOk,
          s"$stmt: ON must contain at least one same-name " +
            "target/source key equality — a pure theta-ON has no " +
            "file locality to exploit (set spark.graft.merge." +
            "allowThetaFullScan=true to accept a full-table rewrite)")
        refuseIf(thetaOk && extraConjuncts.isEmpty,
          s"$stmt: empty ON")
        val targetCols = stripAliases(m.targetTable).output.map(_.name)
        // the CANONICAL UPSERT routes to the lean native merge; every
        // other legal clause combination lowers to the general-form
        // writer ([[MergeActions]]) below
        val canonical = extraConjuncts.isEmpty &&
          m.notMatchedBySourceActions.isEmpty &&
          (m.matchedActions match {
            case Seq(ua: UpdateAction) if ua.condition.isEmpty =>
              isAllColumnCopy(ua.assignments, targetCols, sOut)
            case Seq(_: UpdateStarAction) => m.matchedActions.head
              .asInstanceOf[UpdateStarAction].condition.isEmpty
            case _ => false
          }) &&
          (m.notMatchedActions match {
            case Seq() => true
            case Seq(ia: InsertAction) if ia.condition.isEmpty =>
              isAllColumnCopy(ia.assignments, targetCols, sOut)
            case Seq(ia: InsertStarAction) => ia.condition.isEmpty
            case _ => false
          })
        // with columns actually evolving, every value-carrying action
        // must be star-shaped: an explicit list was resolved against
        // the pre-evolution schema and cannot name the new columns —
        // running it anyway would silently drop them from updates
        val starOnly =
          m.matchedActions.forall {
            case _: UpdateStarAction => true
            case ua: UpdateAction =>
              isAllColumnCopy(ua.assignments, targetCols, sOut)
            case _: DeleteAction => true
            case _ => false
          } && m.notMatchedActions.forall {
            case _: InsertStarAction => true
            case ia: InsertAction =>
              isAllColumnCopy(ia.assignments, targetCols, sOut)
            case _ => false
          }
        refuseIf(evolveCols.nonEmpty && !starOnly,
          s"$stmt: WITH SCHEMA EVOLUTION adds column(s) " +
            s"${evolveCols.map { case (p, f) =>
              (p :+ f.name).mkString(".") }.mkString(", ")} but the " +
            "statement carries explicit assignment lists — those " +
            "were resolved against the pre-evolution schema; use " +
            "UPDATE SET * / INSERT *, or ALTER the table first")
        // the evolution commit itself, run ahead of the merge in the
        // same statement (its own retry — a lost race replays against
        // fresh state; the concurrent winner adding the same column
        // surfaces loudly as 'already exists')
        def evolveFirst(spark: SparkSession): Unit =
          if (evolveCols.nonEmpty) GraftCatalog.retryOnCatalogRace {
            val v = t.entry.format match {
              case "graft-deltalake" =>
                DeltaLake.addFields(spark, t.entry.path, evolveCols)
              case "graft-iceberg" =>
                Iceberg.addFields(spark, t.entry.path, evolveCols)
              case other => unknownFormat(other, t)
            }
            if (v >= 0L) {
              GraftCatalog.advancePin(t.warehouse, t.key, v); ()
            }
          }
        val source = m.sourceTable
        if (canonical) {
          val insertNotMatched = m.notMatchedActions.nonEmpty
          GraftDmlCommand(stmt, spark => {
            evolveFirst(spark)
            val src = GraftSql.ofRows(spark, source)
            commitVia(t,
              DeltaLake.merge(spark, t.entry.path, src, keys,
                insertNotMatched),
              Iceberg.merge(spark, t.entry.path, src, keys,
                insertNotMatched))
          })
        } else {
          // GENERAL FORM: conditions/assignments lowered per scope —
          // matched clauses see target columns by name and source
          // columns as MergeActions.src; insert clauses see only the
          // source; by-source clauses see only the target
          def lowerMixed(e: Expression): Column =
            lowered(session, e, stmt) {
              case a if tOut.contains(a) =>
                UnresolvedAttribute(Seq(a.name))
              case a if sOut.contains(a) =>
                UnresolvedAttribute(
                  Seq(graft.sources.MergeActions.SrcPrefix + a.name))
            }
          def lowerSource(e: Expression): Column =
            lowered(session, e, stmt) {
              case a if sOut.contains(a) =>
                UnresolvedAttribute(Seq(a.name))
            }
          def lowerTarget(e: Expression): Column =
            lowered(session, e, stmt) {
              case a if tOut.contains(a) =>
                UnresolvedAttribute(Seq(a.name))
            }
          // nested struct-member targets fold into whole-column
          // rebuilds exactly like UPDATE ([[foldNestedSets]]); the
          // withField base resolves against the clause's TARGET row
          def setOf(assigns: Seq[Assignment],
              lower: Expression => Column): Map[String, Column] =
            foldNestedSets(assigns.map { a =>
              val (name, path) = keyPathOf(a.key,
                raw => targetCols.find(_.equalsIgnoreCase(raw))
                  .getOrElse(raw), stmt)
              (name, path, lower(a.value))
            }, stmt)
          import graft.sources.MergeActions._
          val matchedActs: Seq[Matched] = m.matchedActions.map {
            case ua: UpdateAction =>
              // under live evolution the (star-verified) explicit
              // list cannot name the new columns — lower to the
              // full-row form so they update from the source too
              MatchedUpdate(ua.condition.map(lowerMixed),
                if (evolveCols.nonEmpty) None
                else Some(setOf(ua.assignments, lowerMixed)))
            case ua: UpdateStarAction =>
              MatchedUpdate(ua.condition.map(lowerMixed), None)
            case da: DeleteAction =>
              MatchedDelete(da.condition.map(lowerMixed))
            case other => refuse(s"$stmt: unsupported WHEN MATCHED " +
              s"action '$other'")
          }
          val insertActs: Seq[NotMatchedInsert] =
            m.notMatchedActions.map {
              case ia: InsertAction =>
                NotMatchedInsert(ia.condition.map(lowerSource),
                  if (evolveCols.nonEmpty) None
                  else Some(setOf(ia.assignments, lowerSource)))
              case ia: InsertStarAction =>
                NotMatchedInsert(ia.condition.map(lowerSource), None)
              case other => refuse(s"$stmt: unsupported WHEN NOT " +
                s"MATCHED action '$other'")
            }
          val bySourceActs: Seq[BySource] =
            m.notMatchedBySourceActions.map {
              case ua: UpdateAction =>
                BySourceUpdate(ua.condition.map(lowerTarget),
                  setOf(ua.assignments, lowerTarget))
              case da: DeleteAction =>
                BySourceDelete(da.condition.map(lowerTarget))
              case other => refuse(s"$stmt: unsupported WHEN NOT " +
                s"MATCHED BY SOURCE action '$other'")
            }
          val extra: Option[Column] =
            if (extraConjuncts.isEmpty) None
            else Some(extraConjuncts.map(lowerMixed)
              .reduce(_ && _))
          GraftDmlCommand(stmt, spark => {
            evolveFirst(spark)
            val src = GraftSql.ofRows(spark, source)
            commitVia(t,
              DeltaLake.mergeGeneral(spark, t.entry.path, src, keys,
                matchedActs, insertActs, bySourceActs, extra,
                thetaFullScan = thetaOk),
              Iceberg.mergeGeneral(spark, t.entry.path, src, keys,
                matchedActs, insertActs, bySourceActs, extra,
                thetaFullScan = thetaOk))
          })
        }
      }.orElse(pathTargetOf(m.targetTable).map { pt =>
        val stmt = s"MERGE INTO ${pt.format} `${pt.path}`"
        refuseIf(m.withSchemaEvolution, s"$stmt: WITH SCHEMA " +
          "EVOLUTION is not supported")
        refuseIf(m.notMatchedBySourceActions.nonEmpty, s"$stmt: WHEN " +
          "NOT MATCHED BY SOURCE is not supported")
        // pre-resolution only the STAR actions are verifiable — and
        // stars ARE the canonical upsert the native merge implements
        m.matchedActions match {
          case Seq(ua: UpdateStarAction) if ua.condition.isEmpty => ()
          case _ => refuse(s"$stmt: path-identifier MERGE takes " +
            "exactly one unconditional WHEN MATCHED THEN UPDATE SET " +
            "* — explicit assignment lists go through a registered " +
            "catalog table or the library API")
        }
        val insertNotMatched = m.notMatchedActions match {
          case Seq() => false
          case Seq(ia: InsertStarAction) if ia.condition.isEmpty => true
          case _ => refuse(s"$stmt: WHEN NOT MATCHED must be a " +
            "single unconditional INSERT * (or absent)")
        }
        val keys = splitConjuncts(m.mergeCondition).map {
          case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
              if l.nameParts.last.equalsIgnoreCase(r.nameParts.last) =>
            // pre-resolution we can't BIND sides, but qualifiers are
            // checkable: both sides under ONE qualifier (`t.id = t.id`
            // — a typo for `t.id = s.id`) is a self-comparison, and
            // with the target aliased, a qualified pair must put the
            // alias on exactly one side — silently accepting either
            // would run a different merge than the user wrote
            val lq = l.nameParts.dropRight(1)
            val rq = r.nameParts.dropRight(1)
            refuseIf(lq.nonEmpty && lq.map(_.toLowerCase) ==
              rq.map(_.toLowerCase),
              s"$stmt: ON compares '${l.nameParts.mkString(".")}' " +
                "with itself — the equality must pair a target and a " +
                "source column")
            pt.alias.foreach { a =>
              if (lq.nonEmpty && rq.nonEmpty) {
                val lIsTarget = lq.head.equalsIgnoreCase(a)
                val rIsTarget = rq.head.equalsIgnoreCase(a)
                refuseIf(lIsTarget == rIsTarget,
                  s"$stmt: ON must pair the target alias '$a' with " +
                    s"the source on each equality, got '${EqualTo(l, r)
                      .sql}'")
              }
            }
            l.nameParts.last
          case other => refuse(s"$stmt: ON must be a conjunction of " +
            s"same-name column equalities, got '${other.sql}'")
        }
        val source = m.sourceTable
        GraftDmlCommand(stmt, spark => {
          val src = GraftSql.ofRows(spark, source)
          pathVia(pt,
            DeltaLake.merge(spark, pt.path, src, keys,
              insertNotMatched),
            Iceberg.merge(spark, pt.path, src, keys, insertNotMatched))
        })
      })

    case _ => None
  }

  /** Every assignment must copy a same-name source column, and the
    * assignment set must cover every target column — the shape
    * `UPDATE SET *` / `INSERT *` expand to, and exactly what the
    * native merge commits (all columns from the source row).
    */
  private def requireAllColumnCopy(
      assigns: Seq[org.apache.spark.sql.catalyst.plans.logical.Assignment],
      targetCols: Seq[String],
      sOut: org.apache.spark.sql.catalyst.expressions.AttributeSet,
      stmt: String, clause: String): Unit = {
    val covered = assigns.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => refuse(s"$stmt: $clause target must be a " +
          s"top-level column, got '${other.sql}'")
      }
      stripCasts(a.value) match {
        case ar: AttributeReference
            if sOut.contains(ar) && ar.name.equalsIgnoreCase(name) => ()
        case other => refuse(s"$stmt: $clause must copy the " +
          s"same-name source column ($name = source.$name), got " +
          s"'$name = ${other.sql}' — computed merge columns go " +
          "through the library API (pre-compute them in the source)")
      }
      name.toLowerCase
    }.toSet
    val missing = targetCols.filterNot(c => covered.contains(c.toLowerCase))
    refuseIf(missing.nonEmpty, s"$stmt: $clause must cover every " +
      s"target column (the native merge writes full rows) — missing: " +
      missing.mkString(", "))
  }

  /** Non-refusing twin of [[requireAllColumnCopy]] — does this
    * assignment list expand to `SET * / INSERT *` (every target column
    * copied from its same-name source column)?
    */
  private def isAllColumnCopy(assigns: Seq[Assignment],
      targetCols: Seq[String],
      sOut: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Boolean = {
    val copies = assigns.map { a =>
      (a.key, stripCasts(a.value)) match {
        case (k: AttributeReference, v: AttributeReference)
            if sOut.contains(v) && v.name.equalsIgnoreCase(k.name) =>
          Some(k.name.toLowerCase)
        case _ => None
      }
    }
    copies.forall(_.isDefined) && {
      val covered = copies.flatten.toSet
      targetCols.forall(c => covered.contains(c.toLowerCase))
    }
  }

  /** SUBQUERIES IN DML PREDICATES, lowered by MATERIALIZATION: the
    * native writers take a plain Column predicate (that is what the
    * stats-pruned hit-file discovery evaluates per file), so a
    * subquery's result set is executed ONCE here and baked in:
    *  - uncorrelated `x IN (SELECT …)` → an [[InSet]] over the
    *    collected distinct values (internal representation — the set
    *    rides the task closure as a hash set, never a literal tree);
    *    `NOT IN` keeps SQL null semantics (InSet three-valued logic).
    *  - `EXISTS (SELECT … WHERE inner = outer [AND residual])` with
    *    single-equality correlation decorrelates to the IN form
    *    (`outer IN (SELECT inner FROM … WHERE residual)`); residual
    *    conjuncts must be uncorrelated. NOT EXISTS rides the same
    *    rewrite under its Not.
    *  - uncorrelated scalar subqueries evaluate to a literal
    *    (0 rows → NULL, >1 row refuses — the SQL runtime error).
    * The distinct-value cap (`spark.graft.dml.subqueryLimit`,
    * default 100k) bounds what lands on the driver and in the task
    * closure; a bigger key set is a join-shaped rewrite the library
    * API expresses directly. Everything else (multi-equality or
    * non-equality correlation, correlated scalars) refuses loudly
    * with the shape named.
    */
  private def lowerSubqueries(session: SparkSession, e: Expression,
      stmt: String): Expression = {
    def isCorrelated(p: LogicalPlan): Boolean =
      p.exists(_.expressions.exists(
        _.exists(_.isInstanceOf[OuterReference])))
    def materialize(p: LogicalPlan,
        what: String): (Seq[Any], org.apache.spark.sql.types.DataType) = {
      val df = GraftSql.ofRows(session, p)
      refuseIf(df.schema.length != 1,
        s"$stmt: $what subquery must produce exactly one column, " +
          s"got ${df.schema.fieldNames.mkString(", ")}")
      val cap = session.conf
        .get("spark.graft.dml.subqueryLimit", "100000").toInt
      val rows = df.distinct().limit(cap + 1).collect()
      refuseIf(rows.length > cap,
        s"$stmt: $what subquery produced more than $cap distinct " +
          "values (spark.graft.dml.subqueryLimit) — a key set this " +
          "large is a join-shaped rewrite; use the library API")
      (rows.toSeq.map(_.get(0)), df.schema.head.dataType)
    }
    def inSet(value: Expression, plan: LogicalPlan,
        what: String): Expression = {
      val (vals, dt) = materialize(plan, what)
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(dt)
      InSet(value, vals.map(conv).toSet)
    }
    def splitAnd(x: Expression): Seq[Expression] = x match {
      case And(l, r) => splitAnd(l) ++ splitAnd(r)
      case other => Seq(other)
    }
    def hasOuter(x: Expression): Boolean =
      x.exists(_.isInstanceOf[OuterReference])
    // EXISTS plan → (outer value, inner plan producing the matched
    // column) for the single-correlated-equality shape; None = not
    // that shape (refused by the caller with the honest message)
    def decorrelate(p: LogicalPlan)
        : Option[(Expression, LogicalPlan)] = p match {
      case Project(_, child) => decorrelate(child)
      case Filter(cond, child) =>
        val (corr, residual) = splitAnd(cond).partition(hasOuter)
        if (residual.exists(hasOuter)) None
        else corr match {
          case Seq(EqualTo(inner, OuterReference(outer)))
              if !hasOuter(inner) =>
            Some((outer,
              Project(Seq(org.apache.spark.sql.catalyst.expressions
                .Alias(inner, "__gd_in")()),
                residual.reduceOption(And)
                  .map(Filter(_, child)).getOrElse(child))))
          case Seq(EqualTo(OuterReference(outer), inner))
              if !hasOuter(inner) =>
            Some((outer,
              Project(Seq(org.apache.spark.sql.catalyst.expressions
                .Alias(inner, "__gd_in")()),
                residual.reduceOption(And)
                  .map(Filter(_, child)).getOrElse(child))))
          case _ => None
        }
      case _ => None
    }
    e.transformUp {
      case in @ InSubquery(values, lq: ListQuery) =>
        refuseIf(values.length != 1,
          s"$stmt: multi-column IN subqueries are not supported — " +
            "pair the columns explicitly or use the library API")
        refuseIf(isCorrelated(lq.plan),
          s"$stmt: correlated IN subqueries are not supported — " +
            "rewrite as EXISTS with a single equality, or use the " +
            s"library API (${in.sql})")
        inSet(values.head, lq.plan, "IN")
      case ex: Exists if !isCorrelated(ex.plan) =>
        // uncorrelated EXISTS: a constant — true iff any row exists
        val df = GraftSql.ofRows(session, ex.plan)
        org.apache.spark.sql.catalyst.expressions.Literal(
          !df.isEmpty, org.apache.spark.sql.types.BooleanType)
      case ex: Exists =>
        decorrelate(ex.plan) match {
          case Some((outer, innerPlan)) =>
            refuseIf(isCorrelated(innerPlan),
              s"$stmt: EXISTS correlation beyond one equality is " +
                "not supported — use the library API")
            inSet(outer, innerPlan, "EXISTS")
          case None => refuse(
            s"$stmt: only EXISTS subqueries correlated by a single " +
              "equality (EXISTS (SELECT … WHERE s.k = t.k [AND " +
              "uncorrelated…])) are supported — use the library API")
        }
      case sc: ScalarSubquery =>
        refuseIf(isCorrelated(sc.plan),
          s"$stmt: correlated scalar subqueries are not supported — " +
            "use the library API")
        val df = GraftSql.ofRows(session, sc.plan)
        refuseIf(df.schema.length != 1,
          s"$stmt: scalar subquery must produce exactly one column")
        val rows = df.limit(2).collect()
        refuseIf(rows.length > 1,
          s"$stmt: scalar subquery returned more than one row")
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          rows.headOption.map(_.get(0)).orNull, df.schema.head.dataType)
    }
  }

  /** Lower a clause expression to a name-based Column under the
    * clause's SCOPE: `bind` maps in-scope attributes to their
    * name-based form; anything else (an attribute from the other
    * side, in a clause where that side has no row) refuses loudly.
    */
  private def lowered(session: SparkSession, e: Expression,
      stmt: String)(
      bind: PartialFunction[AttributeReference, UnresolvedAttribute])
      : Column = {
    val e2 = lowerSubqueries(session, e, stmt)
    refuseIf(e2.exists(_.isInstanceOf[SubqueryExpression]),
      s"$stmt: unsupported subquery shape in a DML " +
        "predicate/value — materialize it and use the library API")
    GraftSql.column(e2.transform {
      case a: AttributeReference =>
        bind.applyOrElse(a, (x: AttributeReference) => refuse(
          s"$stmt: column '${x.name}' is not in scope for this " +
            "clause (matched clauses see target+source, NOT MATCHED " +
            "sees only the source, NOT MATCHED BY SOURCE only the " +
            "target)"))
    })
  }

  /** A resolved SET target as (top-level column, nested member path):
    * `s` → ("s", Nil); `s.a.b` → ("s", ["a","b"]). `canon` maps the
    * top name to the TABLE's case (SQL resolves case-insensitively,
    * the writers do not).
    */
  private def keyPathOf(e: Expression, canon: String => String,
      stmt: String): (String, Seq[String]) = e match {
    case ar: AttributeReference => (canon(ar.name), Seq.empty)
    case gsf: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      val (top, p) = keyPathOf(gsf.child, canon, stmt)
      (top, p :+ gsf.name.getOrElse(gsf.extractFieldName))
    case other => refuse(s"$stmt: SET target must be a column or " +
      s"struct member, got '${other.sql}' — array/map element " +
      "updates are not expressible as a column rewrite")
  }

  /** Fold a SET list that may contain NESTED struct-member targets
    * into the writers' top-level (column -> value) form: each nested
    * member lowers to `Column.withField` over the target's CURRENT
    * struct (one rebuild per top-level column, members chained), so
    * `SET s.a = x, s.b = y` rewrites `s` with both members replaced
    * and every other member untouched. A whole-column assignment and
    * a nested one on the same column conflict (the order would be
    * ambiguous) and refuse; so do duplicate whole-column targets.
    */
  private def foldNestedSets(set: Seq[(String, Seq[String], Column)],
      stmt: String): Map[String, Column] =
    // CASE-INSENSITIVE grouping (SQL resolution is): `SET S.a, s.b`
    // is one column's rebuild, not two conflicting top-level targets
    set.groupBy(_._1.toLowerCase).map { case (_, group) =>
      val top = group.head._1
      val (whole, nested) = group.partition(_._2.isEmpty)
      refuseIf(whole.nonEmpty && nested.nonEmpty,
        s"$stmt: conflicting assignments to '$top' — both the whole " +
          "column and a nested member are SET targets")
      refuseIf(whole.size > 1,
        s"$stmt: duplicate SET target '$top'")
      // duplicate or OVERLAPPING nested targets (one path a prefix of
      // another) would make the chained rebuild order-dependent —
      // exactly the ambiguity SQL refuses for repeated assignments
      val paths = nested.map(_._2.map(_.toLowerCase))
      paths.indices.foreach { i =>
        ((i + 1) until paths.size).foreach { jj =>
          val (a, b) = (paths(i), paths(jj))
          refuseIf(a.startsWith(b) || b.startsWith(a),
            s"$stmt: conflicting SET targets '$top." +
              s"${nested(i)._2.mkString(".")}' and '$top." +
              s"${nested(jj)._2.mkString(".")}' — one contains the " +
              "other, so the result would depend on assignment order")
        }
      }
      if (whole.nonEmpty) top -> whole.head._3
      else top -> nested.foldLeft(
        org.apache.spark.sql.functions.col(top)) {
        case (acc, (_, path, v)) =>
          acc.withField(path.map(p => s"`$p`").mkString("."), v)
      }
    }

  /** One identity assignment (`a -> col(a)`) from the statement's own
    * SET list — the native-writer payload for an ALL-IDENTITY UPDATE
    * (Spark/Delta semantics: matched rows rewrite, history and CDF
    * observers see the commit). Uses the FIRST assignment's target
    * column, so `SET p = p` on a partition column refuses exactly
    * like any other SET on it.
    */
  private def identitySetOf(assigns: Seq[Assignment], stmt: String,
      canon: String => String = identity): Map[String, Column] = {
    val raw = assigns.head.key match {
      case ar: AttributeReference => ar.name
      case ua: UnresolvedAttribute => ua.nameParts.last
      case other => refuse(s"$stmt: SET target must be a top-level " +
        s"column, got '${other.sql}'")
    }
    // the statement's case may differ from the table's (SQL is
    // case-insensitive; the writers are not) — canonicalize
    val name = canon(raw)
    Map(name -> org.apache.spark.sql.functions.col(name))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** A resolved DML expression lowered to a NAME-BASED Column the
    * native writers re-resolve against their own scan (attribute ids
    * from the statement's relation don't exist there). Subqueries
    * materialize first ([[lowerSubqueries]]).
    */
  private def nameBased(session: SparkSession, e: Expression,
      stmt: String): Column = {
    val e2 = lowerSubqueries(session, e, stmt)
    refuseIf(e2.exists(_.isInstanceOf[SubqueryExpression]),
      s"$stmt: unsupported subquery shape in a DML " +
        "predicate/value — materialize it and use the library API")
    GraftSql.column(e2.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })
  }

  private def stripCasts(e: Expression): Expression = e match {
    case c: Cast => stripCasts(c.child)
    case other => other
  }

  /** Strip the statement's table alias off a qualified column
    * reference (`t.id` → `id`) so it resolves against the native scan.
    */
  private def dealias(ua: UnresolvedAttribute,
      alias: Option[String]): UnresolvedAttribute = alias match {
    case Some(a) if ua.nameParts.length > 1 &&
        ua.nameParts.head.equalsIgnoreCase(a) =>
      UnresolvedAttribute(ua.nameParts.tail)
    case _ => ua
  }

  /** A PRE-resolution DML expression as a Column — the parser's shape
    * is already name-based; only alias qualifiers need stripping.
    * Uncorrelated IN/scalar subqueries materialize (their raw plans
    * analyze independently); a correlated one fails that analysis
    * loudly (the inner plan cannot resolve the outer column), and
    * EXISTS is unresolvable pre-resolution (no outer-reference
    * marking to decorrelate by) — refused with the route named.
    */
  private def unresolvedColumn(session: SparkSession, e: Expression,
      alias: Option[String], stmt: String): Column = {
    refuseIf(e.exists(_.isInstanceOf[Exists]),
      s"$stmt: EXISTS on a path-identifier target is not supported " +
        "(no outer-reference marking pre-resolution) — register the " +
        "table in a graft catalog or use the library API")
    val e2 = lowerSubqueries(session, e, stmt)
    refuseIf(e2.exists(_.isInstanceOf[SubqueryExpression]),
      s"$stmt: unsupported subquery shape in a DML " +
        "predicate/value — materialize it and use the library API")
    GraftSql.column(e2.transform {
      case ua: UnresolvedAttribute => dealias(ua, alias)
    })
  }

  /** Path-identifier dispatch: the native commit (statement-retried
    * like the catalog route), no pin to advance.
    */
  private def pathVia(pt: PathTarget, delta: => Long,
      iceberg: => Long): Unit = {
    withStatementRetry {
      pt.format match {
        case "graft-deltalake" => delta
        case "graft-iceberg" => iceberg
        case other => throw new IllegalArgumentException(
          s"graft DML: unknown format '$other' for ${pt.path}")
      }
    }
    ()
  }

  private def checkWritable(t: GraftCatalogTable, stmt: String): Unit =
    refuseIf(t.timeTravel, s"$stmt: cannot run DML against a " +
      "time-traveled relation — DML targets the table, not a " +
      "historical pin")

  /** STATEMENT-LEVEL RETRY for a lost table-version race: the native
    * writers pin their commit to the state they replayed and fail
    * LOUDLY when a concurrent commit wins the version (the library
    * contract — a programmatic caller must know its exact predicate
    * ran against exactly that state). A SQL statement's contract is
    * weaker and retryable: re-running the WHOLE native DML against the
    * fresh state is statement-level serialization (the second DELETE
    * applies to the table the first one left), which is what every SQL
    * engine gives concurrent DML. Bounded — pathological contention
    * still surfaces. One policy, shared with the catalog's DDL/
    * TRUNCATE paths ([[GraftCatalog.retryOnCatalogRace]]).
    */
  private def withStatementRetry[T](body: => T): T =
    GraftCatalog.retryOnCatalogRace(body)

  /** Dispatch ONE DML commit to the target's native writer (by-name
    * args — only the matching format's writer runs, re-evaluated per
    * retry), then advance the catalog pin to the produced table
    * version; a no-op DML (predicate matched nothing → no table
    * commit, version -1) leaves the pin untouched.
    */
  private def commitVia(t: GraftCatalogTable, delta: => Long,
      iceberg: => Long): Unit = {
    val v = withStatementRetry {
      t.entry.format match {
        case "graft-deltalake" => delta
        case "graft-iceberg" => iceberg
        case other => unknownFormat(other, t)
      }
    }
    if (v >= 0L) {
      GraftCatalog.advancePin(t.warehouse, t.key, v)
      ()
    }
  }

  private def unknownFormat(fmt: String, t: GraftCatalogTable): Nothing =
    throw new IllegalArgumentException(
      s"graft catalog: unknown format '$fmt' for ${t.fullName}")

  private def refuse(msg: String): Nothing =
    throw new UnsupportedOperationException(msg)

  private def refuseIf(cond: Boolean, msg: String): Unit =
    if (cond) refuse(msg)
}
