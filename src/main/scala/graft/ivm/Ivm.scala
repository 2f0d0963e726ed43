package graft.ivm

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.graft.GraftSql

/** Public API for incremental view maintenance (the reference's novel
  * capability, `src/delta_node.rs` + `src/optimizer_rules/mod.rs`).
  *
  * `Ivm.delta(df)` marks a query's analyzed plan with [[PosDelta]], applies
  * the delta-propagation rewrite + incremental-source resolution, and
  * re-wraps the result as a DataFrame. The returned plan contains only
  * standard operators, so the full Catalyst optimizer (pushdown, pruning,
  * join selection, AQE) runs on it — unlike the reference, whose tests run
  * the custom rule *instead of* the stock optimizer.
  */
object Ivm {

  /** Inserts-only delta of the given query, per the registered
    * [[DeltaSources]] split model, satisfying the algebraic identity
    * `delta(Q) == Q(full) − Q(base)` as multisets (pinned by
    * `DeltaIdentitySpec`).
    *
    * The rewrite clones subtrees into multiple Union/Join arms, so identical
    * attribute ExprIds appear across arms; re-wrapping through
    * [[GraftSql.ofRows]] re-runs the analyzer, whose `DeduplicateRelations`
    * re-instances the clones. That analyzer pass is load-bearing — which is
    * why the rules are applied eagerly here rather than injected as
    * optimizer rules via `SparkSessionExtensions` (post-analysis, no dedup
    * would run and the duplicated ExprIds could mis-bind).
    */
  def delta(df: Dataset[_]): DataFrame = {
    val plan = GraftSql.analyzed(df)
    requireRegisteredSource(plan, "delta")
    rewriteDf(df.sparkSession, PosDelta(plan))
  }

  /** Guard for every public delta-rewrite entry point: static
    * (unregistered) tables inside a query contribute EMPTY deltas —
    * δ(fact ⋈ static dim) = δfact ⋈ dim — but a query with NO registered
    * source anywhere has an identically-empty delta, which is far more
    * likely a forgot-to-register mistake than intent (the maintained view
    * would go silently, permanently stale): fail with the fix named
    * rather than returning zero rows forever. Shared with
    * [[IvmAgg.deltaPartial]], which builds its `PosDelta` directly and
    * would otherwise bypass [[delta]]'s check.
    */
  private[ivm] def requireRegisteredSource(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      api: String): Unit = {
    val scans = PosDeltaRule.deltaSourceScans(plan)
    if (!scans.exists(ResolvePosDeltaScan.isRegistered)) {
      val names = scans.flatMap(ResolvePosDeltaScan.tableNameOf).distinct
      throw new UnsupportedOperationException(
        s"$api: no registered delta source anywhere in the query " +
          s"(scanned: ${names.mkString(", ")}) — register the fact table " +
          "in DeltaSources (or Snapshots.track / FileSnapshots.track); " +
          "static tables joined to a registered source contribute empty " +
          "deltas automatically")
    }
  }

  private def rewriteDf(spark: org.apache.spark.sql.SparkSession,
      marked: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    GraftSql.ofRows(spark, ResolvePosDeltaScan(PosDeltaRule(marked)))

  /** The query evaluated against the pre-delta base snapshot: every
    * delta-source scan reads its base partition; all operators (including
    * aggregates/windows/sorts) pass through unchanged.
    */
  def baseOf(df: Dataset[_]): DataFrame =
    rewriteDf(df.sparkSession, BaseRel(GraftSql.analyzed(df)))

  /** Delta by differencing: `δQ = Q(full) ∖all Q(base)` for ARBITRARY
    * queries — a full recompute, so no incremental speedup, but a
    * correctness-preserving fallback when the algebraic rewrite does not
    * apply (e.g. windows, sorts, non-mergeable aggregates). Prefer
    * [[delta]] / [[IvmAgg]] whenever the query fits their envelopes.
    */
  def deltaByDiff(df: Dataset[_]): DataFrame =
    df.toDF().exceptAll(baseOf(df))

  /** Mark only (no rewrite) — for plan-shape tests mirroring the reference. */
  def mark(df: Dataset[_]): PosDelta = PosDelta(GraftSql.analyzed(df))

  // ---- self-serve maintenance ladder ----------------------------------

  /** What [[maintainAuto]] chose, and what to do with it. */
  sealed trait AutoMaintenance

  /** The algebraic delta applied (envelope queries): `rows` are δQ — append
    * them to the materialized view. The cheap path: δ arms read only the
    * pruned delta partitions.
    */
  final case class AppendDelta(rows: DataFrame) extends AutoMaintenance

  /** A mergeable-aggregate partial (Aggregate-rooted queries): fold into
    * the materialized view with [[IvmAgg.merge]] (an upsert on the group
    * keys in production sinks). Aggregated over the pruned delta scan only.
    */
  final case class MergePartial(delta: IvmAgg.AggDelta) extends AutoMaintenance

  /** A signed insert/retract pair for a LEFT OUTER / LEFT ANTI join root:
    * apply as `view' = (view ∪all inserts) ∖all retracts` (an upsert +
    * delete in production sinks). Incremental: every term keys on the
    * pruned delta partitions, no full recompute.
    */
  final case class ApplySigned(delta: SignedDelta) extends AutoMaintenance

  /** Differencing fallback (windows, sorts, non-mergeable aggregates):
    * `rows` are `Q(full) ∖all Q(base)` from a full recompute — correct for
    * ANY deterministic query, with no incremental speedup.
    */
  final case class DiffRows(rows: DataFrame) extends AutoMaintenance

  /** A signed delta: `inserts` to append, `retracts` to remove (one
    * instance per row, multiset semantics). The maintained view identity:
    * `Q(full) == (Q(base) ∪all inserts) ∖all retracts` — pinned by
    * `DeltaIdentitySpec`.
    */
  final case class SignedDelta(inserts: DataFrame, retracts: DataFrame) {

    /** The blessed application: `(view ∪all inserts) ∖all retracts`, with
      * BOTH delta frames pinned (eager `localCheckpoint`) first.
      *
      * Composing the two lazy frames directly into one query can return
      * wrong results on Spark 4.1: with `spark.sql.exchange.reuse` (default
      * on), a query containing several canonically-identical
      * window-over-semi-join exchange subtrees from the two frames
      * mis-evaluates one copy (observed concretely: a key-scoped delta's
      * `inserts ∪ retracts` emitted base rows that net to zero; disabling
      * exchange reuse fixed it, and the analyzed AND optimized plans were
      * both correct). Checkpointing cuts the shared plan shapes out of the
      * composed query — and matches production behavior, where a sink
      * applies materialized deltas as upsert + delete anyway. The deltas
      * are small by design (that is the point of incremental maintenance),
      * so the materialization cost is the delta's own size.
      */
    def applyTo(view: DataFrame): DataFrame = {
      // exceptAll matches columns by POSITION: re-project both frames to
      // the view's column order first (rungs built over using-column
      // joins emit key-first order, which need not match the view's)
      val cols = view.columns.toSeq
        .map(org.apache.spark.sql.functions.col)
      // LAZY checkpoint (guide §2.4/§5 — fewer driver barriers): the plan
      // is cut to a LogicalRDD leaf at construction exactly as before
      // (which is what defuses the exchange-reuse hazard documented
      // above), but materialization happens inside the first consuming
      // job instead of one standalone barrier job per pin
      graft.engine.Labeled.job(view.sparkSession, "ivm:applyTo-pin") {
        view.unionByName(inserts.localCheckpoint(false).select(cols: _*))
          .exceptAll(retracts.localCheckpoint(false).select(cols: _*))
      }
    }
  }

  /** Construct a [[SignedDelta]] with every ExprId in both plans re-minted
    * tree-order ([[PosDeltaRule.freshInstance]]). The signed constructors
    * build plans whose union/join arms REPEAT subtrees (the same scan under
    * δ and base, the affected-key set under both restrictions); a plan with
    * internally repeated ExprIds composes wrongly once a caller duplicates
    * it again — `view ∪all inserts ∖all retracts` puts several copies in
    * one query, and the analyzer's DeduplicateRelations untangles
    * cross-branch duplicates only when each branch is internally
    * duplicate-free (observed concretely: without this,
    * `inserts.exceptAll(inserts)` on a key-scoped delta returned rows).
    */
  private def signed(inserts: DataFrame, retracts: DataFrame): SignedDelta =
    SignedDelta(reMint(inserts), reMint(retracts))

  /** `df` with every ExprId re-minted tree-order (see [[signed]]'s doc for
    * why internally repeated ids are a composition hazard).
    */
  private def reMint(df: DataFrame): DataFrame =
    GraftSql.ofRows(df.sparkSession,
      PosDeltaRule.freshInstance(GraftSql.analyzed(df)))

  /** Eagerly pin a DELTA-SIZED intermediate (δ partials, affected-group
    * views, signed net inputs) so frames the rungs reference several times
    * execute ONCE instead of once per plan occurrence — exchange reuse is
    * deliberately not trusted here (see [[signedNet]]'s netting comment),
    * so without pinning the maintenance cycle's cost is multiplicative in
    * how often a subplan is inlined (measured 2–4× on the agg-join and
    * two-level rungs). Every pinned frame is |touched-groups|- or
    * |delta|-sized by design — the materialization is the delta's own
    * size, the same rationale as [[SignedDelta.applyTo]], and matches
    * production, where partials and view probes are materialized state.
    * ONE caller stretches the "delta-sized" rationale: the key-scoped
    * rung's [[signedNet]] inputs are affected-KEY restricted full/base
    * recomputes, which under broad-key churn (a delta touching most
    * keys) approach corpus size — there the pin trades memory for the
    * guaranteed-once execution, and the rung itself is the wrong choice
    * anyway (differencing wins when the delta spans most keys, which is
    * why maintainAuto keeps both). Note also that pinning makes the
    * rung-building APIs (deltaKeyScoped/maintainAuto) run cluster jobs
    * at CONSTRUCTION time, not first consumption. Callers can disable
    * via `spark.graft.ivm.pinSignedNet=false` — tests do, to audit the
    * full LAZY maintenance plan (pinning would execute the interesting
    * subtrees at construction time, leaving only RDD scans to inspect).
    */
  private def pinSmall(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
        .get("spark.graft.ivm.pinSignedNet", "true").toBoolean)
      // constraint normalization: a raw checkpoint leaf re-minted by
      // [[reMint]] can carry STALE constraint ExprIds into a Union and
      // blow up its constraint rewrite (see GraftSql.normalizeRddConstraints).
      // LAZY checkpoint (guide §2.4/§5): same LogicalRDD leaf (the
      // guaranteed-once execution and plan-cut are unchanged — the RDD is
      // computed once and cached at first use), but without one standalone
      // barrier job per pin: the group-scoped/two-level rungs ran 20–30
      // sequential eager-pin micro-jobs per cycle, ~2.5 s of delta_minmax's
      // 4.0 s warm pass in the r18 profile, pure job-launch fixed cost
      graft.engine.Labeled.job(df.sparkSession, "ivm:pin") {
        GraftSql.normalizeRddConstraints(df.localCheckpoint(false))
      }
    else df

  /** Signed delta of a LEFT OUTER join under insert-only source deltas —
    * the case the append-only rewrite correctly refuses (see
    * [[PosDeltaRule]]): a new right-side row matching a previously
    * UNMATCHED left row must RETRACT the null-extended row the view
    * already holds. The signed algebra:
    *
    *   inserts  =  δA ⟕ (B ∪ δB)          — new left rows, matched or null-extended
    *            ∪  baseA ⋈ δB             — old left rows gaining new matches
    *   retracts =  null-extend( (baseA ▷ baseB) ⋉ δB )
    *               — formerly matchless left rows that δB now matches
    *
    * Each side may be any query inside the delta envelope (δ/base
    * propagate through it). `cond` must reference columns BY NAME and the
    * two sides' column names must be disjoint. At scale every term is a
    * keyed join whose δ side reads only the pruned delta partition; the
    * anti/semi pair in `retracts` shares the base-A scan.
    */
  def deltaLeftJoin(left: Dataset[_], right: Dataset[_],
      cond: org.apache.spark.sql.Column): SignedDelta = {
    val rFull = right.toDF()
    val inserts = delta(left).join(rFull, cond, "left")
      .unionByName(baseOf(left).join(delta(right), cond, "inner"))
    val nullRight = rFull.schema.fields.toSeq.map(f =>
      org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name))
    val retracts = baseOf(left)
      .join(baseOf(right), cond, "left_anti")
      .join(delta(right), cond, "left_semi")
      .select(org.apache.spark.sql.functions.col("*") +: nullRight: _*)
    signed(inserts, retracts)
  }

  /** Signed delta of a FULL OUTER join under insert-only source deltas —
    * the join type with retractions on BOTH sides: a new right row can
    * invalidate a left row's null extension AND a new left row can
    * invalidate a right row's null extension. The signed algebra extends
    * [[deltaLeftJoin]] symmetrically:
    *
    *   inserts  =  δA ⟕ (B ∪ δB)             — new left rows, matched or null-extended
    *            ∪  baseA ⋈ δB                — old left rows gaining new matches
    *            ∪  null-left( δB ▷ (A ∪ δA) ) — new right rows matching nothing
    *   retracts =  null-right( (baseA ▷ baseB) ⋉ δB )
    *            ∪  null-left( (baseB ▷ baseA) ⋉ δA )
    *
    * Identity: `Q(full) == (Q(base) ∪all inserts) ∖all retracts`
    * (DeltaIdentitySpec). Same naming/condition contract as
    * [[deltaLeftJoin]]. At scale all five terms are keyed joins whose δ
    * sides read only the pruned delta partitions.
    */
  def deltaFullJoin(left: Dataset[_], right: Dataset[_],
      cond: org.apache.spark.sql.Column): SignedDelta = {
    import org.apache.spark.sql.functions.{col, lit}
    val lFull = left.toDF()
    val rFull = right.toDF()
    val nullLeft = lFull.schema.fields.toSeq.map(f =>
      lit(null).cast(f.dataType).as(f.name))
    val nullRight = rFull.schema.fields.toSeq.map(f =>
      lit(null).cast(f.dataType).as(f.name))
    val lCols = lFull.columns.toSeq.map(col)
    val rCols = rFull.columns.toSeq.map(col)
    val inserts = delta(left).join(rFull, cond, "left")
      .unionByName(baseOf(left).join(delta(right), cond, "inner"))
      .unionByName(delta(right).join(lFull, cond, "left_anti")
        .select(nullLeft ++ rCols: _*))
    val retracts = baseOf(left)
      .join(baseOf(right), cond, "left_anti")
      .join(delta(right), cond, "left_semi")
      .select(lCols ++ nullRight: _*)
      .unionByName(baseOf(right)
        .join(baseOf(left), cond, "left_anti")
        .join(delta(left), cond, "left_semi")
        .select(nullLeft ++ rCols: _*))
    signed(inserts, retracts)
  }

  /** Signed delta of a RIGHT OUTER join: the mirror of [[deltaLeftJoin]]
    * (swap the sides, then restore Spark's left-columns-first output
    * layout).
    */
  def deltaRightJoin(left: Dataset[_], right: Dataset[_],
      cond: org.apache.spark.sql.Column): SignedDelta = {
    import org.apache.spark.sql.functions.col
    val sd = deltaLeftJoin(right, left, cond)
    val order = (left.toDF().columns ++ right.toDF().columns).toSeq.map(col)
    SignedDelta(sd.inserts.select(order: _*), sd.retracts.select(order: _*))
  }

  /** Signed delta of a LEFT ANTI join ("A rows with NO match in B") under
    * insert-only source deltas. Anti joins are anti-monotone on the right:
    * a new right row RETRACTS previously emitted left rows it matches.
    *
    *   inserts  =  δA ▷ (B ∪ δB)       — new left rows that match nothing
    *   retracts =  (baseA ▷ baseB) ⋉ δB — old no-match rows δB now matches
    *
    * Identity: `Q(full) == (Q(base) ∪all inserts) ∖all retracts`
    * (DeltaIdentitySpec). Same naming/condition contract as
    * [[deltaLeftJoin]].
    */
  def deltaAntiJoin(left: Dataset[_], right: Dataset[_],
      cond: org.apache.spark.sql.Column): SignedDelta = {
    val inserts = delta(left).join(right.toDF(), cond, "left_anti")
    val retracts = baseOf(left)
      .join(baseOf(right), cond, "left_anti")
      .join(delta(right), cond, "left_semi")
    signed(inserts, retracts)
  }

  /** Insert-only delta of a set INTERSECT view (`A ∩ B`, distinct
    * semantics). Intersect is MONOTONE under inserts — a value once in
    * both sides never leaves — so the delta is append-only: the values
    * newly present in both sides that were not in both bases. Derivation:
    *
    *   candidates = distinct(δA ∪ δB) ∩ A_full ∩ B_full
    *   δ⁺(A ∩ B)  = candidates ∖ (baseA ∩ baseB)
    *              = (candidates ∖ baseA) ∪set (candidates ∖ baseB)
    *
    * (the last step distributes the difference so each term plans as an
    * anti join of the SMALL candidate set against one base side — never a
    * base×base intersect materialization). Column names are aligned
    * positionally to `left`'s, as `Dataset.intersect` does. At scale every
    * term keys on the delta partitions; the full/base sides are probed,
    * not re-shuffled against each other.
    */
  def deltaIntersect(left: Dataset[_], right: Dataset[_]): DataFrame = {
    val l = left.toDF()
    val align = (df: DataFrame) => df.toDF(l.columns.toSeq: _*)
    val r = align(right.toDF())
    val cands = delta(l).union(align(delta(right))).distinct()
      .intersect(l).intersect(r)
    // cands appears in both union arms: re-mint the second use so the
    // composed plan has no internally repeated ExprIds (see [[signed]])
    cands.except(baseOf(l))
      .union(reMint(cands).except(align(baseOf(right))))
      .distinct()
  }

  /** Signed delta of a set EXCEPT view (`A ∖set B`): anti-monotone on the
    * right — an insert into B RETRACTS a value A previously kept. The
    * signed set algebra (each term verified against the full/base
    * membership definitions):
    *
    *   inserts  = (distinct(δA) ∖ baseA) ∖ B_full — genuinely new A values
    *              no B row cancels
    *   retracts = ((distinct(δB) ∩ baseA) ∖ baseB) — old result values δB
    *              now cancels
    *
    * Identity: `Q(full) == (Q(base) ∪all inserts) ∖all retracts`
    * (DeltaIdentitySpec). Both frames are delta-keyed: each plans as the
    * small distinct-δ set anti/semi-joined against the bases — the result
    * view is never rescanned. Column names align positionally to `left`'s.
    */
  def deltaExcept(left: Dataset[_], right: Dataset[_]): SignedDelta = {
    val l = left.toDF()
    val align = (df: DataFrame) => df.toDF(l.columns.toSeq: _*)
    val inserts = delta(l).distinct().except(baseOf(l)).except(align(right.toDF()))
    val retracts = align(delta(right)).distinct()
      .intersect(baseOf(l)).except(align(baseOf(right)))
    signed(inserts, retracts)
  }

  /** One maintenance step of a TOP-K view (`ORDER BY … LIMIT k`): top-k
    * over a total order is a monoid under insert-only deltas —
    * `topk(T ∪ δ) = topk(topk(T) ∪ topk(δ))` — so a stored k-row view
    * absorbs a delta by merging with the delta's OWN top-k. The base
    * corpus is never rescanned: both top-k's plan as TakeOrderedAndProject
    * (per-partition heap of k, driver merge of k per partition — no full
    * sort anywhere), and the merge input is ≤ 2k rows.
    *
    * `order` must be a TOTAL order (include a unique tiebreak column):
    * with ties at the k-th position the view's content is nondeterministic
    * in any engine, and maintenance would be chasing an unpinned target
    * (same determinism rule the declared `sort_limit` query follows).
    */
  def topKMerge(prev: DataFrame, deltaRows: DataFrame, order: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    prev.unionByName(deltaRows.orderBy(order: _*).limit(k))
      .orderBy(order: _*).limit(k)
  }

  /** Signed delta of a TOP-K view under the registered source split:
    * inserts = delta rows entering the view, retracts = previous rows
    * falling out. Derived entirely from the k-row base view and the
    * delta's own top-k (see [[topKMerge]]) — both frames are ≤ k rows.
    * `maintainAuto` routes `orderBy(total order).limit(k)` roots here when
    * every sort key is a plain column and the query below the sort is
    * delta-rewritable.
    */
  def deltaTopK(source: Dataset[_], order: Seq[Column], k: Int): SignedDelta = {
    val src = source.toDF()
    val prev = baseOf(src).orderBy(order: _*).limit(k)
    // prev appears under both signedNet arms — the second use gets its own
    // ExprIds (cross-branch dedup only untangles internally-clean branches)
    signedNet(topKMerge(prev, delta(src), order, k), reMint(prev))
  }

  /** Per-group top-k (`ROW_NUMBER() OVER (PARTITION BY keys ORDER BY …)
    * <= k`) — the grouped sibling of `ORDER BY … LIMIT k`, and the shape a
    * training pipeline uses for "keep the best k documents per
    * language/domain". One shuffle on `keys`; the rank filter runs inside
    * the window operator's per-partition sort, so no group ever
    * materializes more than its frame. `order` must totally order rows
    * WITHIN a group (same tiebreak rule as [[topKMerge]]).
    */
  def groupTopK(df: Dataset[_], keys: Seq[String], order: Seq[Column],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{functions => F}
    require(k > 0, s"group top-k needs k > 0, got $k")
    require(keys.nonEmpty, "group top-k needs at least one key (use " +
      "topKMerge/deltaTopK for the global form)")
    val w = Window.partitionBy(keys.map(F.col): _*).orderBy(order: _*)
    df.toDF().withColumn("__graft_rn", F.row_number().over(w))
      .filter(F.col("__graft_rn") <= k).drop("__graft_rn")
  }

  /** One maintenance step of a GROUPED top-k view: per-group top-k is a
    * monoid per group under insert-only deltas —
    * `topk_g(T ∪ δ) = topk_g(topk_g(T) ∪ topk_g(δ))` for every group g —
    * and groups the delta never touches keep their stored rows verbatim.
    * The stored view is PROBED, never re-ranked wholesale: the δ top-k's
    * group keys (|touched-groups|-sized, broadcast) split `prev` with a
    * semi/anti pair, and only `affected ∪ δ-topk` (≤ 2k rows per touched
    * group) re-ranks. The base corpus is never rescanned.
    */
  def groupTopKMerge(prev: DataFrame, deltaRows: DataFrame,
      keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    val dTop = pinSmall(groupTopK(deltaRows, keys, order, k))
    // every reuse beyond the first gets its own ExprIds ([[signed]]'s
    // hazard): prev feeds both split arms and dTop feeds both touched-key
    // sets plus the merge union — with pinning disabled (or a lazy caller
    // frame) the repeated non-leaf subtrees otherwise mis-bind
    def touched(df: DataFrame): DataFrame =
      F.broadcast(df.select(keys.map(F.col): _*).distinct())
    // using-column joins emit the keys FIRST: re-project both split arms
    // back to the stored view's column order, so the merged view keeps it
    // (downstream appliers difference positionally)
    val outCols = prev.columns.toSeq.map(F.col)
    val untouched = prev.join(touched(reMint(dTop)), keys, "left_anti")
      .select(outCols: _*)
    val affected = reMint(prev).join(touched(reMint(dTop)), keys, "left_semi")
      .select(outCols: _*)
    untouched.unionByName(
      groupTopK(affected.unionByName(dTop), keys, order, k))
  }

  /** Signed delta of a GROUPED top-k view under the registered source
    * split: inserts = delta rows entering some group's top-k, retracts =
    * stored rows they push out. Both arms are restricted to the δ top-k's
    * touched groups BEFORE ranking (restriction commutes with per-group
    * top-k), so the signed pair is |touched-groups × k|-sized and the
    * netting ([[signedNet]]) erases groups whose membership didn't change.
    * The affected-view probe is recomputed from base here (declared-query
    * harness); a production store reads those ≤ k·|touched| rows by key.
    */
  def deltaGroupTopK(source: Dataset[_], keys: Seq[String],
      order: Seq[Column], k: Int): SignedDelta = {
    import org.apache.spark.sql.{functions => F}
    val src = source.toDF()
    val dTop = pinSmall(groupTopK(delta(src), keys, order, k))
    val touched =
      F.broadcast(reMint(dTop).select(keys.map(F.col): _*).distinct())
    // re-project the semi-join's key-first column order back to the
    // source's, so the signed frames difference positionally against any
    // view derived from the source (applyTo / the identity spec)
    val outCols = src.columns.toSeq.map(F.col)
    val affected = pinSmall(groupTopK(
      baseOf(src).join(touched, keys, "left_semi"), keys, order, k)
      .select(outCols: _*))
    val merged = groupTopK(reMint(affected).unionByName(dTop), keys, order, k)
    signedNet(merged, reMint(affected))
  }

  /** Signed delta of a GROUPED-AGGREGATE view computed from its
    * MATERIALIZED state plus the delta partial — the merge rung
    * ([[IvmAgg]]) lifted to a signed insert/retract pair so aggregates can
    * sit MID-TREE (feeding joins) instead of only at the root:
    *
    *   affected = view ⋉ (distinct group keys of the δ partial)   — old rows
    *   inserts  = IvmAgg.merge(affected, δ partial)                — new rows
    *   retracts = affected
    *
    * netted ([[signedNet]]) so groups whose value did not change (a min
    * the delta never beat, a sum advanced by zero) produce no traffic.
    * Unlike the key-scoped rung this NEVER re-aggregates source rows:
    * the δ partial aggregates only the pruned delta scan and `affected` is
    * a keyed lookup into the materialized view (here expressed as a
    * broadcast-semi-join against the δ partial's keys; an index lookup in
    * a production view store). Identity (DeltaIdentitySpec):
    * `Q(full) == (view ∪all inserts) ∖all retracts` for `view == Q(base)`.
    *
    * Same envelope as [[IvmAgg.deltaPartial]] (sum/count/min/max,
    * count/sum DISTINCT; avg via [[IvmAgg.mergeableForm]]); the group keys
    * must surface in the select list to key the lookup.
    */
  def deltaAgg(view: DataFrame, q: Dataset[_]): SignedDelta = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val ad0 = IvmAgg.deltaPartial(q)
    // the δ partial feeds both the affected-key probe and the merge; the
    // affected view feeds both signed frames — pin each once
    val ad = ad0.copy(partial = pinSmall(ad0.partial))
    val affected = pinSmall(
      if (ad.keys.isEmpty) view // global aggregate: the single row
      else {
        val affKeys = reMint(ad.partial.select(ad.keys.map(k =>
          col(k).as(s"__aff_$k")): _*).distinct())
        val cond = ad.keys.map(k => col(k) <=> col(s"__aff_$k"))
          .reduce(_ && _)
        view.join(broadcast(affKeys), cond, "left_semi")
      })
    signedNet(IvmAgg.merge(affected, ad), reMint(affected))
  }

  /** Key-scoped differencing — the rung between the signed deltas and full
    * [[deltaByDiff]]: when a query DECOMPOSES PER KEY (every window is
    * partitioned by ⊇ `keys`, every aggregate grouped by ⊇ `keys`, no
    * joins, no global limit), rows for keys untouched by the delta cannot
    * change, so the view is maintainable by recomputing ONLY the affected
    * key partitions:
    *
    *   aff      = distinct `keys` of δ(source)          — small, broadcast
    *   inserts  = Q(source ⋉ aff) ∖all Q(base ⋉ aff)
    *   retracts = Q(base ⋉ aff) ∖all Q(source ⋉ aff)
    *
    * The canonical use is sessionization/window maintenance: a day's new
    * events touch a sliver of users; this recomputes those users' sessions
    * and leaves every other user's rows untouched — at 100 TB the
    * difference between a full-corpus window shuffle and a broadcast-
    * semi-join-pruned one. The semi joins push the affected-key filter to
    * the scans, so both recomputes read only the affected rows.
    *
    * `q` must be deterministic and key-decomposable — validated against
    * the analyzed plan of `q(source)`, rejecting windows/aggregates not
    * keyed by `keys`, joins that do not equate every key between their
    * sides, and global limits (a Sort is allowed: the signed contract is
    * multiset-level). Key-co-partitioned equi-joins ARE decomposable —
    * each output row for key k derives only from both sides' key-k rows —
    * so `q` may join the source with dimension tables (or other delta
    * sources) ON the scoping keys; every registered delta-source scan in
    * the plan is base/full-split and every scan is restricted to the
    * union of the affected keys. Identity (DeltaIdentitySpec):
    * `Q(full) == (Q(base) ∪all inserts) ∖all retracts`.
    */
  def deltaKeyScoped(q: DataFrame => DataFrame, source: Dataset[_],
      keys: Seq[String]): SignedDelta = {
    require(keys.nonEmpty, "need at least one partition key")
    keyScopedSigned(source.sparkSession,
      GraftSql.analyzed(q(source.toDF())), keys)
  }

  /** The signed multiset difference of two same-schema frames — inserts =
    * plus ∖all minus, retracts = minus ∖all plus — computed as ONE
    * signed-count aggregation (±1 tags, group by every column, replicate
    * by the net count) instead of two `exceptAll`s. Besides halving the
    * shuffles, this avoids nesting Except nodes: Spark's EXCEPT ALL
    * rewrite mis-binds when one Except subtree appears inside another with
    * shared lineage (even `d.exceptAll(d)` on an exceptAll-built `d`
    * returns rows), which is exactly how callers compose a SignedDelta —
    * `view.unionByName(inserts).exceptAll(retracts)`.
    */
  private def signedNet(plus: DataFrame, minus: DataFrame): SignedDelta = {
    import org.apache.spark.sql.{Column, functions => F}
    val cols = plus.columns.toSeq
    require(!cols.exists(_.startsWith("__graft_")),
      "__graft_ column names are reserved")
    def tag(df: DataFrame, s: Long): DataFrame =
      df.select(cols.map(F.col) :+ F.lit(s).as("__graft_sign"): _*)
    def replicate(df: DataFrame, n: Column): DataFrame =
      df.withColumn("__graft_i", F.explode(F.sequence(F.lit(1L), n)))
        .select(cols.map(F.col): _*)
    val pinOn = plus.sparkSession.conf
      .get("spark.graft.ivm.pinSignedNet", "true").toBoolean
    if (pinOn) {
      // ONE net aggregation for both directions (guide §2.4): the net
      // frame is pinned to a LogicalRDD leaf, so inserts (`net > 0`) and
      // retracts (`net < 0`, replicated −net times) are two filters over
      // the SAME materialized RDD — the exchange-reuse hazard documented
      // in the else-branch cannot arise (one leaf, not two canonically
      // identical aggregate subtrees), and the netting runs one
      // aggregation over |plus|+|minus| rows instead of two. The inputs
      // are each referenced once, so they no longer need their own pins
      // (previously: two input pins + two aggregations per signedNet).
      val net0 = pinSmall(tag(plus, 1L).unionByName(tag(minus, -1L))
        .groupBy(cols.map(F.col): _*)
        .agg(F.sum(F.col("__graft_sign")).as("__graft_net")))
      signed(
        replicate(net0.filter(F.col("__graft_net") > 0),
          F.col("__graft_net")),
        replicate(net0.filter(F.col("__graft_net") < 0),
          -F.col("__graft_net")))
    } else {
      // pinning disabled (tests/Explain auditing the lazy algebra): each
      // direction gets its OWN net aggregation with its own sign
      // orientation and an identical `> 0` consumer — so the inserts and
      // retracts plans are NOT canonicalization-equal. With one shared
      // orientation and `> 0` / `< 0` filters, Spark's exchange reuse
      // (spark.sql.exchange.reuse, default on) collided the two arms'
      // canonically identical aggregate subtrees when a caller composed
      // both frames into one query, and the retract side returned the
      // wrong rows (observed: a windowed key-scoped delta's
      // `inserts ∪ retracts` emitted base rows that net to zero;
      // disabling exchange reuse fixed it).
      def net(pos: DataFrame, neg: DataFrame): DataFrame =
        tag(pos, 1L).unionByName(tag(neg, -1L))
          .groupBy(cols.map(F.col): _*)
          .agg(F.sum(F.col("__graft_sign")).as("__graft_net"))
          .filter(F.col("__graft_net") > 0)
      signed(replicate(net(plus, minus), F.col("__graft_net")),
        replicate(net(minus, plus), F.col("__graft_net")))
    }
  }

  private def requireKeyDecomposable(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      keys: Seq[String]): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, GlobalLimit, Join, Project, Window}
    def names(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      exprs.collect {
        case a: Attribute => a.name
        case Alias(a: Attribute, name) => name
      }.toSet
    val need = keys.toSet
    // the walk stops at the source-scan boundary: renames INSIDE the
    // source's own definition (a temp view's stored plan, toDF tuple
    // aliases) define what the source's columns ARE; only the operators
    // q adds ABOVE the scan can illegally re-bind a key name
    val boundaries = PosDeltaRule.deltaSourceScans(plan)
    def walk(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
      if (boundaries.exists(_ eq p)) return
      // the signed difference runs TWO independent restricted recomputes;
      // a nondeterministic expression (rand()/uuid()/sample) makes them
      // disagree on untouched partitions, surfacing as spurious
      // insert/retract pairs with no error — same rejection the join/limit
      // cases get
      p.expressions.filterNot(_.deterministic).foreach { e =>
        throw new UnsupportedOperationException(
          s"deltaKeyScoped: nondeterministic expression $e — two " +
            "independent restricted recomputes would disagree on untouched " +
            "key partitions; use Ivm.deltaByDiff over a materialized input")
      }
      check(p)
      p.children.foreach(walk)
    }
    def check(node: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = node match {
      // key identity is tracked BY NAME, so a projection must not re-bind
      // a key name to a different column/expression — the window would
      // then partition by something the scan-level key restriction does
      // not select, silently recomputing over partial partitions
      case p: Project =>
        p.projectList.foreach {
          case Alias(child, name) if need.contains(name) =>
            child match {
              case a: Attribute if a.name == name => ()
              case other => throw new UnsupportedOperationException(
                s"deltaKeyScoped: projection re-binds key column '$name' " +
                  s"to $other — the key name no longer traces to the " +
                  "source column; use Ivm.deltaByDiff")
            }
          case _ => ()
        }
      case w: Window =>
        if (!need.subsetOf(names(w.partitionSpec)))
          throw new UnsupportedOperationException(
            s"deltaKeyScoped: window partitioned by ${names(w.partitionSpec)} " +
              s"does not cover keys $need — rows of one key could depend on " +
              "another key's rows; use Ivm.deltaByDiff")
      case a: Aggregate =>
        if (!need.subsetOf(names(a.groupingExpressions)))
          throw new UnsupportedOperationException(
            s"deltaKeyScoped: aggregate grouped by " +
              s"${names(a.groupingExpressions)} does not cover keys $need; " +
              "use IvmAgg (mergeable) or Ivm.deltaByDiff")
      case d: Deduplicate =>
        if (!need.subsetOf(names(d.keys)))
          throw new UnsupportedOperationException(
            "deltaKeyScoped: deduplication keys do not cover the partition " +
              "keys; use Ivm.deltaByDiff")
      // a join is per-key decomposable iff its condition EQUATES every
      // scoping key between the two sides (then an output row for key k
      // derives only from both sides' key-k rows, and restricting every
      // scan to the affected keys restricts the output to those keys);
      // extra conjuncts only narrow within a key partition, so they are
      // fine. Anything else can correlate one key's rows with another's.
      case j: Join =>
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case And(l, r) => conjuncts(l) ++ conjuncts(r)
          case other => Seq(other)
        }
        def acrossSides(a: Attribute, b: Attribute): Boolean =
          (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) ||
            (j.right.outputSet.contains(a) && j.left.outputSet.contains(b))
        def equated(k: String): Boolean =
          j.condition.toSeq.flatMap(conjuncts).exists {
            case EqualTo(a: Attribute, b: Attribute) =>
              a.name == k && b.name == k && acrossSides(a, b)
            case EqualNullSafe(a: Attribute, b: Attribute) =>
              a.name == k && b.name == k && acrossSides(a, b)
            case _ => false
          }
        val typeOk = j.joinType match {
          case Inner | LeftOuter | RightOuter | FullOuter |
               LeftSemi | LeftAnti => true
          case _ => false
        }
        if (!typeOk || !need.forall(equated))
          throw new UnsupportedOperationException(
            s"deltaKeyScoped: ${j.joinType} join does not equate every " +
              s"scoping key $need between its sides (only key-co-" +
              "partitioned equi-joins are per-key decomposable); use the " +
              "signed join deltas or Ivm.deltaByDiff")
      case _: GlobalLimit =>
        throw new UnsupportedOperationException(
          "deltaKeyScoped: a global limit is not per-key decomposable; " +
            "use Ivm.deltaByDiff")
      case _ => ()
    }
    walk(plan)
  }

  /** Route a query down the maintenance ladder instead of throwing:
    * algebraic delta → mergeable-aggregate partial → append-only
    * INTERSECT rung → signed delta (outer / anti join and EXCEPT roots;
    * aggregate ⋈ other inner joins incl. row-wise tops, [[deltaAgg]];
    * top-k roots; key-scoped decomposable queries) →
    * differencing. Every query the engine
    * can run is maintainable through this entry point; the returned case
    * tells the caller how to apply the result (append / merge / signed
    * upsert / diff-apply), and WHICH rung it got — so the cost cliff
    * between the incremental rungs and the recompute rung stays visible.
    *
    * Top-k caveat: a root `ORDER BY plain columns LIMIT k` routes to the
    * top-k merge rung, whose correctness needs a TOTAL order (include a
    * unique tiebreak column — see [[topKMerge]]). Uniqueness is not
    * statically checkable, so the auto path cannot validate it; a
    * tie-ambiguous ORDER BY at the k-th position is equally ill-defined
    * under full recompute (any engine may return either tie), but a
    * maintained view can additionally DRIFT from what a recompute would
    * pick. Callers with non-total sort keys should maintain via
    * [[deltaByDiff]] instead.
    */
  def maintainAuto(df: Dataset[_]): AutoMaintenance =
    try AppendDelta(delta(df))
    catch {
      case _: UnsupportedOperationException =>
        try MergePartial(IvmAgg.deltaPartial(df))
        catch {
          case _: UnsupportedOperationException => signedOrDiff(df)
        }
    }

  private def signedOrDiff(df: Dataset[_]): AutoMaintenance = {
    import org.apache.spark.sql.catalyst.plans.logical.{Except, Intersect, Join}
    import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftAnti, LeftOuter, RightOuter}
    val spark = df.sparkSession
    GraftSql.analyzed(df) match {
      // set ops at the root: INTERSECT is monotone (append-only rung),
      // EXCEPT is anti-monotone on the right (signed rung)
      case Intersect(l, r, false) =>
        AppendDelta(deltaIntersect(
          GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r)))
      case Except(l, r, false) =>
        ApplySigned(deltaExcept(
          GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r)))
      case Join(l, r, LeftOuter, Some(cond), _) =>
        ApplySigned(deltaLeftJoin(
          GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r),
          GraftSql.column(cond)))
      case Join(l, r, RightOuter, Some(cond), _) =>
        ApplySigned(deltaRightJoin(
          GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r),
          GraftSql.column(cond)))
      case Join(l, r, FullOuter, Some(cond), _) =>
        ApplySigned(deltaFullJoin(
          GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r),
          GraftSql.column(cond)))
      case Join(l, r, LeftAnti, Some(cond), _) =>
        ApplySigned(deltaAntiJoin(
          GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r),
          GraftSql.column(cond)))
      case plan =>
        // deterministic row-wise tops over a signed-rung core commute
        // with the insert/retract pair — peel them so projected/filtered
        // outer-join and set-difference VIEWS maintain signed instead of
        // differencing (the condition re-resolves BY NAME against the
        // peeled core's frames, so it needs unique names — peelRowwise
        // already requires that)
        lazy val peeled: Option[AutoMaintenance] = {
          val (core, post) = peelRowwise(plan)
          if (post.isEmpty) None
          else core match {
            case Join(l, r, LeftOuter, Some(cond), _) =>
              Some(ApplySigned(applyPost(deltaLeftJoin(
                GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r),
                GraftSql.column(cond)), post)))
            case Join(l, r, RightOuter, Some(cond), _) =>
              Some(ApplySigned(applyPost(deltaRightJoin(
                GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r),
                GraftSql.column(cond)), post)))
            case Join(l, r, FullOuter, Some(cond), _) =>
              Some(ApplySigned(applyPost(deltaFullJoin(
                GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r),
                GraftSql.column(cond)), post)))
            case Join(l, r, LeftAnti, Some(cond), _) =>
              Some(ApplySigned(applyPost(deltaAntiJoin(
                GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r),
                GraftSql.column(cond)), post)))
            case Except(l, r, false) =>
              Some(ApplySigned(applyPost(deltaExcept(
                GraftSql.ofRows(spark, l), GraftSql.ofRows(spark, r)), post)))
            case _ => None
          }
        }
        aggJoinAuto(df).map(ApplySigned(_))
          .orElse(peeled)
          .orElse(aggOverSignedAuto(df).map(ApplySigned(_)))
          .orElse(topKAuto(df).map(ApplySigned(_)))
          .orElse(keyScopedAuto(df).map(ApplySigned(_)))
          .orElse(aggGroupScopedAuto(df).map(ApplySigned(_)))
          .getOrElse(DiffRows(deltaByDiff(df)))
    }
  }

  /** TWO-LEVEL maintenance (r6): a SUBTRACTABLE grouped aggregate whose
    * child maintains through any SIGNED rung — aggregate over agg-join,
    * over set difference, over top-k — the F-IVM-style composition one
    * level above [[aggJoinAuto]]. For child' = child − R + I, every
    * group's counts and sums advance by ONE sign-weighted partial
    *
    *   P = γ_keys( (I × +1) ⊎ (R × −1) ):
    *     count(x) → Σ sign·[x IS NOT NULL],   sum(x) → Σ sign·x
    *
    * and view' = view ⊕ P groupwise (plain addition — the weighted
    * partial already nets inserts against retracts); groups whose
    * count(*) tracker reaches 0 drop. The envelope is enforced honestly:
    *   - sum/count only (min/max are NOT subtractable — a retracted max
    *     needs the runner-up the view no longer has), no DISTINCT, no
    *     FILTER, grouped only (a global aggregate's empty-input row has
    *     NULL sums the subtract algebra cannot produce);
    *   - one count(*) output is REQUIRED as the group-liveness tracker;
    *   - every summed expression must be NON-NULLABLE (wrap in
    *     coalesce(x, 0)): a nullable sum cannot distinguish "every
    *     non-null contributor retracted" (NULL) from "values cancel to 0"
    *     without a per-column non-null count the view does not carry —
    *     the classic higher-order-IVM caveat, rejected statically here.
    * Scale shape matches [[deltaAgg]]: P aggregates only the child's
    * (small) signed frames, the view lookup is a broadcast-semi keyed
    * probe, and the base corpus is never re-aggregated at either level.
    */
  private def aggOverSignedAuto(df: Dataset[_]): Option[SignedDelta] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression => CExpr}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, sum, when}

    val spark = df.sparkSession
    def strip(e: CExpr): Column = GraftSql.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(a.name)
    })

    GraftSql.analyzed(df) match {
      case Aggregate(groupExprs, aggExprs, child, _) if groupExprs.nonEmpty =>
        val cNames = child.output.map(_.name)
        if (cNames.distinct.size != cNames.size) return None

        // each grouping expression must surface as a named output (the
        // merge and the signed frames key by NAME)
        val keyNames: Seq[String] = groupExprs.map {
          case a: Attribute => aggExprs.collectFirst {
            case o: Attribute if o.exprId == a.exprId => o.name
            case Alias(o: Attribute, name) if o.exprId == a.exprId => name
          }.getOrElse(return None)
          case e => aggExprs.collectFirst {
            case Alias(c, name) if c.semanticEquals(e) => name
          }.getOrElse(return None)
        }

        // classify outputs: group keys pass through; everything else must
        // be a subtractable aggregate, re-expressed sign-weighted
        var tracker: Option[String] = None
        val weighted: Seq[Column] = aggExprs.flatMap {
          case ne if keyNames.contains(ne.name) => None
          case Alias(ae: AggregateExpression, name)
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case c: Count =>
                // tracker soundness rides the no-FILTER invariant checked
                // above (ae.filter.isEmpty): count over NON-NULLABLE
                // children ≡ count(*) ≡ group row count ONLY while no
                // FILTER clause can thin it. If the envelope ever admits
                // FILTER, the tracker must be restricted to a literal
                // count(*)/count(lit) — a filtered count(nonnull_x) would
                // mis-track group liveness and drop live groups at 0.
                if (c.children.forall(!_.nullable) && tracker.isEmpty)
                  tracker = Some(name)
                val live = c.children.map(ch => strip(ch).isNotNull)
                  .reduceOption(_ && _).getOrElse(lit(true))
                Some(sum(when(live, col("__graft_w")).otherwise(lit(0L)))
                  .cast("long").as(name))
              case s: Sum if !s.child.nullable =>
                Some(sum(strip(s.child) * col("__graft_w")).as(name))
              case _ => return None // min/max/avg/nullable sum: not here
            }
          case _ => return None
        }
        if (tracker.isEmpty) return None // need a count(*) liveness column

        val childDf = GraftSql.ofRows(spark, child)
        val childSd: SignedDelta =
          (try Some(SignedDelta(delta(childDf), childDf.limit(0).toDF()))
          catch {
            case _: UnsupportedOperationException =>
              (try Some(deltaAgg(baseOf(childDf), childDf))
              catch { case _: UnsupportedOperationException => None })
                .orElse(aggJoinAuto(childDf))
                .orElse(topKAuto(childDf))
                .orElse(keyScopedAuto(childDf))
          }).getOrElse(return None)

        val keyCols = groupExprs.zip(keyNames).map { case (e, n) =>
          strip(e).as(n)
        }
        // the sign-weighted partial feeds the affected-key probe, the
        // merge, and (via pKeys) the retract frame — pin once; it is
        // |touched-groups|-sized by construction
        val partial = pinSmall(
          childSd.inserts.withColumn("__graft_w", lit(1L))
            .unionByName(childSd.retracts.withColumn("__graft_w", lit(-1L)))
            .groupBy(keyCols: _*)
            .agg(weighted.head, weighted.tail: _*))

        // the maintained view (base recompute stands in for the stored
        // view, as in deltaAgg) probed by the touched-group keys
        val view = baseOf(df)
        val pKeys = reMint(partial.select(keyNames.map(k =>
          col(k).as(s"__aff_$k")): _*))
        val affCond = keyNames.map(k => col(k) <=> col(s"__aff_$k"))
          .reduce(_ && _)
        val affected =
          pinSmall(view.join(broadcast(pKeys), affCond, "left_semi"))

        // view ⊕ P groupwise through the one-exchange key-aligned combine
        // (IvmAgg.alignByKeys) — both sides are ≤ 1 row per key, so the
        // previous full-outer join (2 exchanges + SMJ sorts) computes the
        // same rows as a union + single hash aggregate
        val outCols = df.toDF().schema.map { f =>
          if (keyNames.contains(f.name)) col(f.name)
          else
            (coalesce(col(s"__graft_l_${f.name}"), lit(0)) +
              coalesce(col(s"__graft_r_${f.name}"), lit(0)))
              .cast(f.dataType).as(f.name)
        }
        val merged = IvmAgg.alignByKeys(affected, reMint(partial),
            keyNames).select(outCols: _*)
        Some(signedNet(
          merged.filter(col(tracker.get) > 0),
          reMint(affected)))
      case _ => None
    }
  }

  /** GROUP-SCOPED recompute (r7): grouped aggregates OUTSIDE the
    * subtractable envelope — min/max (a retracted max needs the runner-up
    * the view no longer has), avg, DISTINCT, FILTER clauses — over a
    * child that maintains through any signed rung. Where
    * [[aggOverSignedAuto]] must honestly refuse, this rung applies the
    * [[keyScopedSigned]] restriction idea AT THE GROUP LEVEL:
    *
    *   touched  = group keys present in the child's insert/retract frames
    *   retracts = stored view ⋉ touched    (broadcast semi probe)
    *   inserts  = γ( child' ⋉ touched )    (recompute ONLY touched groups)
    *
    * then net the pair, so value-stable groups vanish from the delta.
    * Recompute is exact for ANY deterministic aggregate — no per-function
    * algebra, which is exactly why it sits BELOW the subtractable rung
    * (cheap partials win when they apply) and below scan-level key
    * scoping (restriction at the parquet scan prunes more than
    * restriction above the child). At 100 TB the semi joins broadcast the
    * |touched-groups|-sized key frame; only touched groups' rows flow
    * through the aggregate exchange, and the view is probed, never
    * re-aggregated. (The child recompute under the restriction reads the
    * child's inputs — in production the child of a second-level aggregate
    * is itself a materialized view, making that read |touched|-sized
    * too.)
    */
  private def aggGroupScopedAuto(df: Dataset[_]): Option[SignedDelta] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualNullSafe, SubqueryExpression, Expression => CExpr}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, HintInfo, Join, JoinHint, ResolvedHint}
    import org.apache.spark.sql.functions.{broadcast, col}

    val spark = df.sparkSession
    def strip(e: CExpr): Column = GraftSql.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(a.name)
    })

    GraftSql.analyzed(df) match {
      case agg @ Aggregate(groupExprs, aggExprs, child, _)
          if groupExprs.nonEmpty =>
        val cNames = child.output.map(_.name)
        if (cNames.distinct.size != cNames.size) return None
        // recompute is exact for any DETERMINISTIC aggregate; reject
        // nondeterminism and correlated subqueries outright
        if (!(groupExprs ++ aggExprs).forall(e => e.deterministic &&
            !e.exists(_.isInstanceOf[SubqueryExpression]))) return None
        // each grouping expression must surface as a named output: the
        // touched-key frame, the view probe, and the net key by NAME
        val keyNames: Seq[String] = groupExprs.map {
          case a: Attribute => aggExprs.collectFirst {
            case o: Attribute if o.exprId == a.exprId => o.name
            case Alias(o: Attribute, name) if o.exprId == a.exprId => name
          }.getOrElse(return None)
          case e => aggExprs.collectFirst {
            case Alias(c, name) if c.semanticEquals(e) => name
          }.getOrElse(return None)
        }
        if (keyNames.distinct.size != keyNames.size) return None

        // the child's own signed step, through whichever rung fits:
        // append-only envelope, merge-partial aggregate, then the whole
        // signed ladder (set ops, outer joins, agg-join, top-k,
        // key-scoped — signedOrDiff's dispatch). A child that itself
        // falls to differencing gives this rung nothing to scope by —
        // decline and let the root difference once.
        val childDf = GraftSql.ofRows(spark, child)
        val childSd: SignedDelta =
          (try Some(SignedDelta(delta(childDf), childDf.limit(0).toDF()))
          catch {
            case _: UnsupportedOperationException =>
              (try Some(deltaAgg(baseOf(childDf), childDf))
              catch { case _: UnsupportedOperationException => None })
                .orElse(signedOrDiff(childDf) match {
                  case ApplySigned(sd) => Some(sd)
                  case _ => None
                })
          }).getOrElse(return None)

        // δ-touched groups: key values present in either signed frame —
        // |touched|-sized by construction, feeds three probes: pin once
        val keyCols = groupExprs.zip(keyNames).map { case (e, n) =>
          strip(e).as(n)
        }
        val touched = pinSmall(
          childSd.inserts.select(keyCols: _*)
            .unionByName(childSd.retracts.select(keyCols: _*))
            .distinct())
        val affOf = () => reMint(touched.select(keyNames.map(k =>
          col(k).as(s"__aff_$k")): _*))

        // insert side: the aggregate recomputed over ONLY the touched
        // groups' child rows. The broadcast semi join grafts UNDER the
        // Aggregate node — a LEFT SEMI preserves the child's output
        // attributes exactly, so the grouping/aggregate expressions
        // rebind unchanged (the keyScopedSigned graft, one level up).
        // Null-safe equality: a NULL group key is a real group.
        val affPlan = ResolvedHint(
          PosDeltaRule.freshInstance(GraftSql.analyzed(affOf())),
          HintInfo(strategy = Some(BROADCAST)))
        val cond = groupExprs.zip(keyNames).map { case (e, n) =>
          val ge = e match { case al: Alias => al.child; case x => x }
          EqualNullSafe(ge,
            affPlan.output.find(_.name == s"__aff_$n").get): CExpr
        }.reduce(And(_, _))
        val inserts = GraftSql.ofRows(spark, agg.copy(child =
          Join(child, affPlan, LeftSemi, Some(cond), JoinHint.NONE)))

        // retract side: the stored view probed by the touched keys (base
        // recompute stands in for the stored view, as in deltaAgg)
        val vCond = keyNames.map(k => col(k) <=> col(s"__aff_$k"))
          .reduce(_ && _)
        val retracts = baseOf(df).join(broadcast(affOf()), vCond, "left_semi")
        try Some(signedNet(inserts, retracts))
        catch { case _: UnsupportedOperationException => None }
      case _ => None
    }
  }

  /** Auto-detected signed maintenance of an `Aggregate ⋈ other` INNER-join
    * root — the mid-tree-aggregate promotion (VERDICT r5 #2): the
    * aggregate side maintains through [[deltaAgg]] (merge algebra, no
    * source re-aggregation) and the signed pair propagates through the
    * join. For A' = A − R + I (the aggregate side's signed step) and
    * B' = B ∪all δB (the other side, inside the insert-only envelope):
    *
    *   A'⋈B' − A⋈B = I⋈B − R⋈B + A'⋈δB
    *
    * so  inserts  = I ⋈ baseB  ∪all  merged-view ⋈ δB
    *     retracts = R ⋈ baseB
    *
    * — every term is delta-keyed: I/R are the changed-group rows, δB is
    * the pruned other-side delta, and the only base-side reads are the
    * view lookup inside [[deltaAgg]] and baseB probed BY the small I/R
    * sides (at 100 TB: broadcast I/R against the dim, never a corpus
    * shuffle). A static (unregistered) other side degenerates to
    * `I⋈B ∪ ∅ / R⋈B`. Unlike the key-scoped rung this does not require
    * the join to be ON the group keys. Requirements for the auto route:
    * INNER join with a condition, disjoint+unique column names across the
    * sides (the signed frames re-join by name), mergeable aggregate
    * ([[IvmAgg]] envelope), other side inside the delta envelope; anything
    * else falls through to the next rung. The aggregate may sit on either
    * side (output column order is preserved). Deterministic Project/Filter
    * tops above the join — `agg.join(dim).select(...)`, HAVING-style
    * `agg.filter(...)`, including over a BARE aggregate root — are peeled
    * and re-applied to both signed frames (row-wise operators commute with
    * the insert/retract pair).
    */
  // ---- row-wise-top peeling (shared by the signed rungs) ---------------
  //
  // Row-wise operators ABOVE a maintainable core commute with the signed
  // pair — A' = A − R + I implies f(A') = f(A) − f(R) + f(I) for any
  // deterministic per-row f — so deterministic Project/Filter tops are
  // PEELED and re-applied (by name) to both signed frames. This is what
  // routes `agg.join(dim).select(...)`, HAVING-style `agg.filter(...)`,
  // and projected/filtered outer-join views through their signed rungs
  // instead of differencing.

  private def stripRefs(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    e.transform { case a: AttributeReference => UnresolvedAttribute(a.name) }
  }

  private def peelRowwise(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        List[DataFrame => DataFrame]) = {
    import org.apache.spark.sql.catalyst.expressions.{Expression => CExpr, SubqueryExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
    def peelable(exprs: Seq[CExpr], child: LogicalPlan): Boolean =
      exprs.forall(e => e.deterministic &&
        !e.exists(_.isInstanceOf[SubqueryExpression])) &&
        child.output.map(_.name).distinct.size == child.output.size
    p match {
      case Project(exprs, child) if peelable(exprs, child) =>
        val cols = exprs.map(ne => GraftSql.column(stripRefs(ne)))
        val (inner, fs) = peelRowwise(child)
        (inner, fs :+ ((d: DataFrame) => d.select(cols: _*)))
      case Filter(cond, child) if peelable(Seq(cond), child) =>
        val c = GraftSql.column(stripRefs(cond))
        val (inner, fs) = peelRowwise(child)
        (inner, fs :+ ((d: DataFrame) => d.filter(c)))
      case other => (other, Nil)
    }
  }

  private def applyPost(sd: SignedDelta,
      post: List[DataFrame => DataFrame]): SignedDelta =
    SignedDelta(
      post.foldLeft(sd.inserts)((d, f) => f(d)),
      post.foldLeft(sd.retracts)((d, f) => f(d)))

  private def aggJoinAuto(df: Dataset[_]): Option[SignedDelta] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression => CExpr, SubqueryExpression}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    def peel(p: LogicalPlan) = peelRowwise(p)

    def build(aggSide: LogicalPlan, other: LogicalPlan,
        cond: org.apache.spark.sql.catalyst.expressions.Expression,
        aggLeft: Boolean): Option[SignedDelta] = {
      // the aggregate side may itself carry row-wise tops
      // (`agg.filter(having).join(dim)`): peel them side-locally — the
      // signed pair commutes, and the peeled transforms restore exactly
      // the output names the join condition references
      val (sideCore, sideFs) = peel(aggSide)
      val agg = sideCore match {
        case a: Aggregate => a
        case _ => return None
      }
      val aNames = aggSide.output.map(_.name)
      val oNames = other.output.map(_.name)
      val outOrder =
        (if (aggLeft) aNames ++ oNames else oNames ++ aNames).map(col)
      if (aNames.intersect(oNames).nonEmpty ||
          aNames.distinct.size != aNames.size ||
          oNames.distinct.size != oNames.size) return None
      try {
        val aggDf = GraftSql.ofRows(spark, agg)
        val oDf = GraftSql.ofRows(spark, other)
        // the analyzed condition binds to the original plan's ExprIds; the
        // signed frames are re-minted, so the join must re-resolve BY NAME
        // (names are disjoint and unique — checked above)
        val byName = GraftSql.column(cond.transform {
          case a: AttributeReference => UnresolvedAttribute(a.name)
        })
        val sd = applyPost(deltaAgg(baseOf(aggDf), aggDf), sideFs)
        val oHasDelta = PosDeltaRule.deltaSourceScans(other)
          .exists(ResolvePosDeltaScan.isRegistered)
        val oBase = if (oHasDelta) baseOf(oDf) else oDf
        // referenced up to twice (insert + retract arms of the Signed
        // case) and |groups|-sized — pin once
        lazy val aFull = pinSmall(sideFs.foldLeft(
          IvmAgg.merge(baseOf(aggDf), IvmAgg.deltaPartial(aggDf)))(
          (d, f) => f(d)))
        // the other side's own step, three ways: STATIC (no registered
        // source below it — the A'⋈δB term vanishes), INSERT-ONLY (the
        // envelope rewrite applies — one extra insert arm), or SIGNED
        // (the other side is ITSELF a peeled mergeable aggregate — the
        // agg⋈agg case; its insert/retract pair both propagate through
        // A'). Anything else aborts the rung (→ key-scoped/differencing).
        sealed trait OtherStep
        object Static extends OtherStep
        final case class InsertOnly(rows: DataFrame) extends OtherStep
        final case class Signed(osd: SignedDelta) extends OtherStep
        val oStep: OtherStep =
          if (!oHasDelta) Static
          else try InsertOnly(delta(oDf))
          catch {
            case _: UnsupportedOperationException =>
              val (oCore, oFs) = peel(other)
              val oAgg = oCore match {
                case a: Aggregate => a
                case _ => return None
              }
              val oCoreDf = GraftSql.ofRows(spark, oAgg)
              Signed(applyPost(deltaAgg(baseOf(oCoreDf), oCoreDf), oFs))
          }
        val inserts0 = sd.inserts.join(oBase, byName, "inner")
        val retracts0 = sd.retracts.join(reMint(oBase), byName, "inner")
        // Δ(A⋈B) = δA⋈B + A'⋈δB  (A' = the merged full agg view): with a
        // signed δB = Ib − Rb the second term splits by sign, so Rb rows
        // retract their A'-joined tuples — exactly the agg⋈agg algebra
        oStep match {
          case Static =>
            Some(signed(inserts0.select(outOrder: _*),
              retracts0.select(outOrder: _*)))
          case InsertOnly(rows) =>
            // arms are disjoint by construction (I vs R groups net inside
            // deltaAgg; δB rows exist in no base-joined arm) — no netting
            Some(signed(
              inserts0.unionByName(aFull.join(rows, byName, "inner"))
                .select(outOrder: _*),
              retracts0.select(outOrder: _*)))
          case Signed(osd) =>
            // a key changed on BOTH sides emits cancelling pairs across
            // arms (Ia⋈B also appears as A'⋈Rb): net the final pair so
            // the delta is the minimal signed difference
            Some(signedNet(
              inserts0.unionByName(aFull.join(osd.inserts, byName, "inner"))
                .select(outOrder: _*),
              retracts0.unionByName(
                reMint(aFull).join(osd.retracts, byName, "inner"))
                .select(outOrder: _*)))
        }
      } catch { case _: UnsupportedOperationException => None }
    }

    val (core, post) = peel(GraftSql.analyzed(df))
    val sd = core match {
      case Join(l, r, Inner, Some(cond), _) =>
        build(l, r, cond, aggLeft = true)
          .orElse(build(r, l, cond, aggLeft = false))
      // a bare aggregate under the peeled tops (HAVING / projected view):
      // the signed merge pair, filtered/projected per row
      case agg: Aggregate if post.nonEmpty =>
        try {
          val aggDf = GraftSql.ofRows(spark, agg)
          Some(deltaAgg(baseOf(aggDf), aggDf))
        } catch { case _: UnsupportedOperationException => None }
      case _ => None
    }
    sd.map(applyPost(_, post))
  }

  /** Auto-detected [[deltaTopK]]: a root `orderBy(…).limit(k)` whose sort
    * keys are all plain columns and whose input query is delta-rewritable
    * maintains as a top-k view. Expression sort keys or a non-rewritable
    * input → None (→ key-scoped / differencing). The caller owns the
    * total-order requirement ([[topKMerge]]) — it is not statically
    * checkable, and a tie-ambiguous ORDER BY is equally ill-defined under
    * recompute.
    */
  private def topKAuto(df: Dataset[_]): Option[SignedDelta] = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, IntegerLiteral, NullsFirst, NullsLast}
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Sort}
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    GraftSql.analyzed(df) match {
      case GlobalLimit(IntegerLiteral(k),
          LocalLimit(_, Sort(order, true, child, _))) if k > 0 =>
        // re-express each sort key BY NAME: the rewritten delta/base plans
        // re-mint attribute ExprIds, so the original resolved SortOrder
        // expressions would not bind against them
        val ord = order.map { so =>
          so.child match {
            case a: Attribute => Some((so.direction, so.nullOrdering) match {
              case (Ascending, NullsFirst)  => col(a.name).asc_nulls_first
              case (Ascending, NullsLast)   => col(a.name).asc_nulls_last
              case (Descending, NullsFirst) => col(a.name).desc_nulls_first
              case (Descending, NullsLast)  => col(a.name).desc_nulls_last
            })
            case _ => None
          }
        }
        if (ord.exists(_.isEmpty)) None
        else try Some(deltaTopK(GraftSql.ofRows(spark, child),
          ord.flatten, k))
        catch { case _: UnsupportedOperationException => None }
      case _ => None
    }
  }

  /** Auto-detected [[deltaKeyScoped]]: when every window / aggregate /
    * dedup in the plan keys on a common non-empty column set, maintain by
    * recomputing only the affected key partitions. Returns None
    * (→ differencing) when any precondition fails — no joins off the keys,
    * no global limits, no key-shadowing projections, at least one
    * registered delta source (see [[keyScopedSigned]]).
    */
  private def keyScopedAuto(df: Dataset[_]): Option[SignedDelta] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Window}
    val plan = GraftSql.analyzed(df)
    def attrNames(exprs: Seq[Expression]): Set[String] = exprs.collect {
      case a: Attribute => a.name
      case Alias(a: Attribute, n) => n
    }.toSet
    val keySets = plan.collect {
      case w: Window => attrNames(w.partitionSpec)
      case a: Aggregate => attrNames(a.groupingExpressions)
      case d: Deduplicate => attrNames(d.keys)
    }
    if (keySets.isEmpty || keySets.exists(_.isEmpty)) return None
    val keys = keySets.reduce(_ intersect _)
    if (keys.isEmpty) return None
    try Some(keyScopedSigned(df.sparkSession, plan, keys.toSeq.sorted))
    catch {
      // unregistered source, unresolvable predicate, non-decomposable
      // shape … → differencing
      case _: UnsupportedOperationException => None
    }
  }

  /** The key-scoped core shared by [[deltaKeyScoped]] and the auto route:
    * validate per-key decomposability, then rewrite the plan twice — a
    * "full" and a "base" instance — with EVERY scan restricted to the
    * affected keys and every REGISTERED delta-source scan base/full-split.
    * The signed difference of the two restricted recomputes is the delta.
    *
    * Multi-source: the affected-key set is the UNION of each registered
    * scan's delta keys, so a delta on any side selects that key's
    * partitions for recompute everywhere. Static scans (not registered in
    * [[DeltaSources]]) read the same rows in both instances — restricting
    * them is not needed for correctness (their non-affected rows cancel in
    * the difference) but prunes both recomputes AND the net aggregation to
    * the affected keys, which is the rung's whole point at scale.
    *
    * The restriction is grafted at the SCAN, as a broadcast semi join
    * against the affected-key set — a LEFT SEMI preserves the scan's
    * output attributes exactly, so every operator above rebinds unchanged.
    * Each graft gets its own re-minted aff instance: aff's inner scan
    * shares ExprIds with the restricted scan itself, and same-ExprId
    * clones nested INSIDE one join arm are the analyzer blind spot
    * (without this the semi join conflated with the delta filter and the
    * "full" restriction silently read only the delta rows — caught by the
    * parquet-backed IncrementalKeyScopedView spec; LocalRelation-backed
    * views mask it). The semi condition is NULL-SAFE (<=>): windows and
    * aggregates treat a NULL key as a real partition, so a delta row with
    * a null key must select the null partition for recompute.
    */
  private def keyScopedSigned(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      keys: Seq[String]): SignedDelta = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, Expression}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.functions.col
    requireKeyDecomposable(plan, keys)
    val scans = PosDeltaRule.deltaSourceScans(plan)
    val deltaScans = scans.filter(ResolvePosDeltaScan.isRegistered)
    if (deltaScans.isEmpty)
      throw new UnsupportedOperationException(
        "deltaKeyScoped: no registered delta source in the plan — " +
          "register the table in DeltaSources or use Ivm.deltaByDiff")
    for (s <- scans if !keys.toSet.subsetOf(s.output.map(_.name).toSet))
      throw new UnsupportedOperationException(
        s"deltaKeyScoped: scan of ${s.nodeName} does not output the " +
          s"scoping keys $keys — the affected-key restriction cannot " +
          "graft there; use Ivm.deltaByDiff")
    val aff = deltaScans.map(s => delta(GraftSql.ofRows(spark, s))
        .select(keys.map(col): _*))
      .reduce(_ unionByName _).distinct()
    def affJoin(child: LogicalPlan): LogicalPlan = {
      val affPlan = ResolvedHint(
        PosDeltaRule.freshInstance(GraftSql.analyzed(aff)),
        HintInfo(strategy = Some(BROADCAST)))
      val cond = keys.map { k =>
        EqualNullSafe(child.output.find(_.name == k).get,
          affPlan.output.find(_.name == k).get): Expression
      }.reduce(And(_, _))
      Join(child, affPlan, LeftSemi, Some(cond), JoinHint.NONE)
    }
    def isIn(set: Seq[LogicalPlan])(s: LogicalPlan) = set.exists(_ eq s)
    val fullR = plan.transformUp {
      case s if isIn(scans)(s) => affJoin(s)
    }
    val baseR = ResolvePosDeltaScan(plan.transformUp {
      case s if isIn(deltaScans)(s) => affJoin(BaseScan(s))
      case s if isIn(scans)(s) => affJoin(s)
    })
    signedNet(GraftSql.ofRows(spark, fullR), GraftSql.ofRows(spark, baseR))
  }
}
