package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Par, QueryDef, Tables}

/** Text-analysis operators for an LLM-training-data pipeline over the
  * `documents` table: token counting, quality scoring, language-ID and
  * document fingerprinting (builder brief: first-class pipeline operators
  * beyond the reference's own surface).
  *
  * Everything is codegen'd string built-ins (`regexp_count`, `length`,
  * `regexp_replace`, `md5`) — no UDFs — so whole-stage codegen spans from
  * the parquet scan through the per-doc computation; the only shuffles are
  * the final (small) aggregations/sorts. At 100 TB the per-doc stage is
  * embarrassingly parallel and column-pruned to `doc_id`+`text`(+group key).
  */
object TextOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Par.spread(Tables(s, dir, n))  // regex-heavy per-row stages: see Par

  /** Whitespace word count as pure arithmetic (dialect-safe, see
    * PipelineQueries.wordCount).
    */
  private def words(c: Column): Column =
    (length(c) - length(regexp_replace(c, lit(" "), lit(""))) + 1).cast("long")

  /** BPE-ish tokenization: letter runs, digit runs, and single non-space
    * symbols each count as one token — the standard pre-tokenizer shape.
    * Same RE2-compatible pattern on the DuckDB side.
    */
  private val TokenPat = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** English-y function words for stopword-ratio quality scoring. */
  private val StopPat = "\\b(the|a|of|and|to|in)\\b"

  /** PII scrubbing rules (name, pattern, replacement tag), applied
    * SPECIFIC → GENERIC so a phone number is not first mangled by the
    * digit rule (tags carry no digits, so later rules never re-match
    * inside an earlier tag). Every pattern is written in the common
    * Java-regex ∩ RE2 dialect — no backreferences, no lookaround — so the
    * SAME string drives Spark's codegen'd `regexp_replace`/`regexp_count`
    * and the DuckDB oracle's RE2. Known (documented) overlaps: a bare
    * digit run of ≥8 classifies as a phone (conservative,
    * PII-positive), and per-rule counts are taken on the RAW text, so an
    * email's local digits also count under `num`.
    * (Defined before `all`: the generated oracle SQL reads these at
    * object-init time.)
    */
  private[graft] val PiiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>"),
    ("ip", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("num", "[0-9]+", "<NUM>"))

  /** `c` with every [[PiiRules]] rule applied in order — a single
    * codegen'd projection (regexp_replace composes; no intermediate
    * columns, no UDF).
    */
  private[graft] def piiScrub(c: Column): Column =
    PiiRules.foldLeft(c) { case (acc, (_, re, tag)) =>
      regexp_replace(acc, lit(re), lit(tag))
    }

  /** Per-language marker-word profiles for the language-ID heuristic.
    * Priority order = tie-break order (first max wins).
    */
  private val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|is)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|la|les|et|est)\\b",
    "es" -> "\\b(el|la|los|y|es)\\b",
    "zh" -> "\\b(de|le|shi|he|zai)\\b")

  /** The Gopher-rule per-source filter report (shared by the batch query
    * and its maintained twin): every column is a count/sum, so the report
    * is an [[graft.ivm.IvmAgg]]-mergeable view keyed by `source`.
    */
  private[graft] def gopherReport(docs: DataFrame): DataFrame = {
    val nw = words(col("text"))
    val ns = length(regexp_replace(col("text"), lit(" "), lit("")))
    val mwl = ns.cast("double") / nw.cast("double")
    val ttr = size(array_distinct(split(col("text"), " ")))
      .cast("double") / nw.cast("double")
    val stops = regexp_count(col("text"), lit(StopPat)).cast("long")
    val kept = (c: Column) => sum(when(c, 1L).otherwise(0L))
    docs
      .select(col("source"),
        nw.between(30, 1000).as("r_len"),
        mwl.between(3.0, 10.0).as("r_mwl"),
        (ttr >= 0.45).as("r_ttr"),
        (stops >= 2).as("r_stop"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        kept(!col("r_len")).as("drop_len"),
        kept(!col("r_mwl")).as("drop_mwl"),
        kept(!col("r_ttr")).as("drop_ttr"),
        kept(!col("r_stop")).as("drop_stop"),
        kept(col("r_len") && col("r_mwl") && col("r_ttr") &&
          col("r_stop")).as("kept"))
  }

  /** DuckDB recompute of [[gopherReport]] over the full table — the oracle
    * for both the batch query and the maintained twin (merge identity).
    */
  private val GopherOracle: String =
    s"""WITH f AS (
       |  SELECT source,
       |    (LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1) AS nw,
       |    LENGTH(REPLACE(text,' ','')) AS ns,
       |    len(list_distinct(string_split(text, ' '))) AS nd,
       |    len(regexp_extract_all(text, '$StopPat')) AS stops
       |  FROM documents),
       |r AS (
       |  SELECT source,
       |    (nw BETWEEN 30 AND 1000) AS r_len,
       |    (CAST(ns AS DOUBLE)/CAST(nw AS DOUBLE)
       |       BETWEEN 3.0 AND 10.0) AS r_mwl,
       |    (CAST(nd AS DOUBLE)/CAST(nw AS DOUBLE) >= 0.45) AS r_ttr,
       |    (stops >= 2) AS r_stop
       |  FROM f)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN NOT r_len THEN 1 ELSE 0 END) AS BIGINT)
       |    AS drop_len,
       |  CAST(SUM(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END) AS BIGINT)
       |    AS drop_mwl,
       |  CAST(SUM(CASE WHEN NOT r_ttr THEN 1 ELSE 0 END) AS BIGINT)
       |    AS drop_ttr,
       |  CAST(SUM(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT)
       |    AS drop_stop,
       |  CAST(SUM(CASE WHEN r_len AND r_mwl AND r_ttr AND r_stop
       |    THEN 1 ELSE 0 END) AS BIGINT) AS kept
       |FROM r GROUP BY source ORDER BY source""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // Token counting per source: whitespace tokens + BPE-ish regex tokens.
    QueryDef("token_count",
      (s, d) => t(s, d, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(words(col("text"))).as("ws_tokens"),
          sum(regexp_count(col("text"), lit(TokenPat)).cast("long"))
            .as("bpe_tokens"),
          max(regexp_count(col("text"), lit(TokenPat)).cast("long"))
            .as("max_doc_tokens"))
        .orderBy("source"),
      Some(s"""SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1) AS BIGINT) AS ws_tokens,
             |  CAST(SUM(len(regexp_extract_all(text, '$TokenPat'))) AS BIGINT) AS bpe_tokens,
             |  CAST(MAX(len(regexp_extract_all(text, '$TokenPat'))) AS BIGINT) AS max_doc_tokens
             |FROM documents GROUP BY source
             |ORDER BY source""".stripMargin)),

    // Per-document quality scoring: stopword ratio, punctuation density,
    // length-based low-quality flag — the classic corpus-filter features.
    QueryDef("quality_score",
      (s, d) => {
        val w = words(col("text"))
        val stops = regexp_count(col("text"), lit(StopPat)).cast("long")
        val punct = regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("long")
        val score = stops.cast("double") * lit(100.0) / w.cast("double")
        t(s, d, "documents").select(
            col("doc_id"),
            w.as("n_words"),
            stops.as("stop_cnt"),
            punct.as("punct_cnt"),
            score.as("stop_pct"),
            (w < 30 || score < lit(1.0)).as("low_quality"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
             |  CAST(LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1 AS BIGINT) AS n_words,
             |  CAST(len(regexp_extract_all(text, '$StopPat')) AS BIGINT) AS stop_cnt,
             |  CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS punct_cnt,
             |  CAST(len(regexp_extract_all(text, '$StopPat')) AS DOUBLE) * 100.0
             |    / CAST(LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1 AS DOUBLE) AS stop_pct,
             |  (LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1 < 30
             |    OR CAST(len(regexp_extract_all(text, '$StopPat')) AS DOUBLE) * 100.0
             |       / CAST(LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1 AS DOUBLE) < 1.0)
             |    AS low_quality
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language-ID heuristic: marker-word score per language, argmax with a
    // fixed priority tie-break; output is the lang × predicted confusion
    // matrix. (On synthetic text the value is the deterministic contract,
    // not linguistic accuracy.)
    QueryDef("lang_id",
      (s, d) => {
        val scores = LangMarkers.map { case (l, pat) =>
          l -> regexp_count(col("text"), lit(pat)).cast("long")
        }
        val maxScore = greatest(scores.map(_._2): _*)
        // first language (in priority order) reaching the max wins
        val pred = scores.tail.foldLeft(
            when(scores.head._2 === maxScore, lit(scores.head._1))) {
          case (acc, (l, c)) => acc.when(c === maxScore, lit(l))
        }
        t(s, d, "documents")
          .select(col("lang"), pred.as("pred_lang"))
          .groupBy("lang", "pred_lang")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("lang", "pred_lang")
      },
      Some {
        val scoreSql = LangMarkers.map { case (l, pat) =>
          s"len(regexp_extract_all(text, '$pat'))" -> l
        }
        val greatest = scoreSql.map(_._1).mkString("greatest(", ", ", ")")
        val cases = scoreSql
          .map { case (e, l) => s"WHEN $e = $greatest THEN '$l'" }
          .mkString("\n           ")
        s"""SELECT lang, pred_lang, COUNT(*) AS cnt FROM (
           |  SELECT lang,
           |    CASE $cases
           |    END AS pred_lang
           |  FROM documents)
           |GROUP BY lang, pred_lang
           |ORDER BY lang, pred_lang""".stripMargin
      }),

    // Document fingerprints over the normalized text (lowercase, strip
    // punctuation, collapse whitespace): an md5 digest and a Karp–Rabin
    // polynomial rolling hash (native codegen'd expression) — the cheap
    // exact-after-normalization dedup keys; at scale they shuffle 8–16-byte
    // digests instead of documents.
    QueryDef("fingerprint",
      (s, d) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), lit("[^a-z0-9 ]"), lit("")),
          lit(" +"), lit(" ")))
        t(s, d, "documents")
          .select(col("doc_id"), md5(norm.cast("binary")).as("fp"),
            graft.functions.VecFunctions.rollingHash(norm).as("fp_roll"))
          .orderBy("doc_id")
      },
      // the oracle replays the byte fold with list_reduce (text is ASCII,
      // so ascii(char) == utf-8 byte)
      Some("""SELECT doc_id,
             |  md5(norm) AS fp,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT), list_transform(
             |      generate_series(1, length(norm)),
             |      i -> ascii(substr(norm, i, 1)))),
             |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_roll
             |FROM (
             |  SELECT doc_id, trim(regexp_replace(
             |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             |    ' +', ' ', 'g')) AS norm
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Corpus-fluency quality signal with INTEGER-ONLY arithmetic: the
    // fraction of a document's distinct word bigrams that appear in the
    // corpus's top-100 bigrams by document frequency — a language-model-
    // free perplexity proxy (a log-prob score would sum irrational doubles
    // in engine-dependent order and break the hash compare). The top-K
    // table is TakeOrdered over the vocabulary-sized df aggregate and
    // BROADCAST; bigram generation is the shuffle-free WordShingles(2)
    // kernel, so the only corpus-sized exchange is the per-doc aggregate
    // of (1-bit membership, count) pairs. Boundary ties break lexically —
    // deterministic top-K in both engines.
    QueryDef("bigram_coverage",
      (s, d) => {
        val bgr = t(s, d, "documents")
          .select(col("doc_id"),
            explode(graft.functions.VecFunctions.wordShingles(col("text"), 2))
              .as("bg"))
        val top = bgr.groupBy("bg").agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("bg").asc).limit(100)
          .select(col("bg"), lit(1L).as("is_top"))
        bgr.join(broadcast(top), Seq("bg"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(coalesce(col("is_top"), lit(0L))).as("n_common"))
          .select(col("doc_id"), col("n_bigrams"), col("n_common"),
            expr("n_common * 100 div n_bigrams").as("pct"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |bgr AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |    generate_series(1, len(w)-1),
             |    i -> w[i] || ' ' || w[i+1]))) AS bg
             |  FROM d),
             |top AS (SELECT bg FROM (
             |  SELECT bg, COUNT(*) AS df FROM bgr GROUP BY bg
             |  ORDER BY df DESC, bg ASC LIMIT 100))
             |SELECT b.doc_id, COUNT(*) AS n_bigrams,
             |  CAST(COUNT(t.bg) AS BIGINT) AS n_common,
             |  CAST(COUNT(t.bg) * 100 // COUNT(*) AS BIGINT) AS pct
             |FROM bgr b LEFT JOIN top t ON b.bg = t.bg
             |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin)),

    // Per-language vocabulary head: top-10 tokens by frequency (corpus
    // profiling / stopword discovery). Token explosion is partition-local
    // (WordShingles-free: explode over split), then ONE hash agg by
    // (lang, token) with map-side combine carries 2-column rows — at
    // 100 TB the shuffle is vocabulary-sized per language, not corpus-
    // sized. Integer counts + lexical tie-break keep the ranking exact in
    // both engines.
    QueryDef("top_tokens",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang")
          .orderBy(col("cnt").desc, col("token").asc)
        t(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("token"))
          .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .select("lang", "rk", "token", "cnt")
          .orderBy("lang", "rk")
      },
      Some("""WITH tok AS (
             |  SELECT lang, unnest(string_split(text, ' ')) AS token
             |  FROM documents),
             |cnt AS (
             |  SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
             |rk AS (
             |  SELECT lang, token, cnt,
             |    ROW_NUMBER() OVER (PARTITION BY lang
             |      ORDER BY cnt DESC, token ASC) AS rk
             |  FROM cnt)
             |SELECT lang, rk, token, cnt FROM rk WHERE rk <= 10
             |ORDER BY lang, rk""".stripMargin)),

    // Per-document keyword extraction: top-3 tokens ranked by term
    // frequency, breaking ties toward RARER corpus-wide tokens (lower
    // document frequency — the tf-idf ordering with integer-only keys, so
    // the ranking is bit-exact in both engines where a floating ln(N/df)
    // score could diverge in the last ulp and flip ties). The df table is
    // vocabulary-sized → broadcast; the tf agg is the only corpus shuffle.
    QueryDef("keywords",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df = tok.select("doc_id", "token").distinct()
          .groupBy("token").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("token").asc)
        tf.join(broadcast(df), "token")
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("doc_id", "rk", "token", "tf", "df")
          .orderBy("doc_id", "rk")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |  FROM documents),
             |tf AS (
             |  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
             |df AS (
             |  SELECT token, COUNT(*) AS df
             |  FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1),
             |rk AS (
             |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
             |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
             |      ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rk
             |  FROM tf JOIN df ON tf.token = df.token)
             |SELECT doc_id, rk, token, tf, df FROM rk WHERE rk <= 3
             |ORDER BY doc_id, rk""".stripMargin)),

    // Gopher-style rule filter report (r6): the published pre-training
    // corpus gates — word-count bounds, mean-word-length bounds,
    // type-token ratio (the single-line corpus's analog of the
    // repetition rules), stopword presence — evaluated per document and
    // rolled up per source as independent drop counters + the kept count.
    // Thresholds are part of the declared contract. Everything is
    // codegen'd built-ins on a (source, text)-pruned scan; the only
    // shuffle is the |sources|-row rollup, so at 100 TB this is one
    // embarrassingly-parallel pass. The oracle recomputes every rule in
    // DuckDB (same regexes, same double arithmetic).
    QueryDef("gopher_quality",
      (s, d) => gopherReport(t(s, d, "documents")).orderBy("source"),
      Some(GopherOracle)),

    // MAINTAINED quality report (r6): the same Gopher gate kept
    // incremental under document appends — every report column is a
    // count/sum, so the per-source view merges by addition (IvmAgg): a
    // maintenance cycle scores ONLY the appended documents and upserts
    // |sources| rows; the corpus is never re-scored. The oracle is the
    // full-table recompute, pinning the merge identity.
    QueryDef("delta_gopher",
      (s, d) => {
        import graft.ivm.{DeltaSources, IvmAgg}
        val full = t(s, d, "documents")
        val basePred = DeltaSources.predicateFor("documents").get.sql
        val baseView = gopherReport(full.filter(expr(s"NOT ($basePred)")))
        IvmAgg.merge(baseView, IvmAgg.deltaPartial(gopherReport(full)))
          .orderBy("source")
      },
      Some(GopherOracle)),

    // Intra-document repetition (r6): EXACT adjacent-duplicate-word count
    // per document (the within-doc analog of Gopher's duplicate-line
    // rules, computed exactly rather than via a heuristic regex — RE2 has
    // no backreferences, so the portable form is index arithmetic over
    // the split array with higher-order filter, identical semantics in
    // both engines). Per-row array work, no shuffle beyond the final
    // sort; at 100 TB this rides the same single corpus pass as the
    // other per-doc features.
    // The split array is PROJECTED once (`withColumn`) rather than inlined
    // into the higher-order lambda: ArrayFilter evaluates its lambda body
    // per element with no cross-lambda CSE, so an inlined split() re-runs
    // twice per word — O(doc_len²) per document (measured 200× on
    // 2000-word docs). An attribute reference evaluates once per row.
    // Single-word docs get rep_ratio 0.0 on both sides (the unguarded
    // 0/0 diverges: IEEE NaN in DuckDB vs NULL-on-cast corners in Spark).
    QueryDef("word_repetition",
      (s, d) => wordRepetition(t(s, d, "documents")).orderBy("doc_id"),
      Some("""WITH f AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |r AS (
             |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             |    CAST(len(list_filter(generate_series(2, len(w)),
             |      i -> w[i] = w[i-1])) AS BIGINT) AS rep_adj
             |  FROM f),
             |g AS (
             |  SELECT doc_id, n_words, rep_adj,
             |    CASE WHEN n_words > 1
             |      THEN CAST(rep_adj AS DOUBLE) / CAST(n_words - 1 AS DOUBLE)
             |      ELSE 0.0 END AS rep_ratio
             |  FROM r)
             |SELECT doc_id, n_words, rep_adj, rep_ratio,
             |  (rep_ratio > 0.05) AS repetitive
             |FROM g ORDER BY doc_id""".stripMargin)),

    // PII / IDENTIFIER SCRUBBING (r7): the redaction pass every training
    // pipeline runs before packing, as chained codegen'd regexp_replace —
    // one projection per row, no UDFs, no shuffle before the (result)
    // sort; at 100 TB this is the embarrassingly parallel scan→project
    // shape. The synthetic documents plant no PII, so the declared query
    // runs the rules over events.props (JSON payloads, digit-bearing):
    // the generic digit rule scrubs every numeric identifier
    // (non-vacuous, hash-pinned) and the email/phone/IP counts pin a
    // ZERO false-positive rate across the corpus's JSON strings —
    // redaction that mangles clean text is as much a bug as redaction
    // that misses. The rules themselves are behavior-pinned on planted
    // emails/phones/IPs by PipelineSpec. Both engines run the SAME
    // pattern strings (PiiRules, shared with the generated oracle SQL).
    QueryDef("pii_scrub",
      (s, d) => {
        val counts = PiiRules.map { case (n, re, _) =>
          regexp_count(col("props"), lit(re)).cast("long").as(s"n_$n")
        }
        t(s, d, "events")
          .select(Seq(col("event_id"),
            piiScrub(col("props")).as("scrubbed")) ++ counts: _*)
          .orderBy("event_id")
      },
      Some {
        val scrubbed = PiiRules.foldLeft("props") {
          case (acc, (_, re, tag)) =>
            s"regexp_replace($acc, '$re', '$tag', 'g')"
        }
        val counts = PiiRules.map { case (n, re, _) =>
          s"  CAST(len(regexp_extract_all(props, '$re')) AS BIGINT) AS n_$n"
        }.mkString(",\n")
        s"""SELECT event_id, $scrubbed AS scrubbed,
           |$counts
           |FROM events ORDER BY event_id""".stripMargin
      })
  )

  /** Per-document adjacent-duplicate-word stats (the `word_repetition`
    * query body, shared with the doc-length scale probe). Unordered —
    * the declared query adds its total ORDER BY.
    */
  def wordRepetition(docs: DataFrame): DataFrame = {
    val w = col("w")
    val nw = size(w).cast("long")
    val rep = when(size(w) >= 2,
      size(filter(sequence(lit(2), size(w)),
        i => element_at(w, i) === element_at(w, i - 1))))
      .otherwise(0).cast("long")
    val ratio = when(nw > 1,
      rep.cast("double") / (nw - 1).cast("double")).otherwise(lit(0.0))
    docs
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), nw.as("n_words"), rep.as("rep_adj"),
        ratio.as("rep_ratio"), (ratio > 0.05).as("repetitive"))
  }
}
