package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Par, QueryDef, Tables}
import graft.functions.VecFunctions

/** Similarity search over `embeddings.embedding: array<float>` — cosine
  * top-k, expressed with codegen'd higher-order functions (`zip_with` +
  * `aggregate`), never per-row UDFs (SURVEY.md §2D D3).
  *
  * Two paths:
  *   - [[bruteTopK]]: query-set × corpus with the small query side
  *     broadcast — exact, one corpus scan, no shuffle of the big side. The
  *     right baseline whenever |queries| is broadcast-sized.
  *   - [[lshTopK]]: random-hyperplane (SimHash) LSH — sign-bit signatures,
  *     banded into buckets; candidates meet only within a bucket, then exact
  *     cosine + windowed top-k. At 100 TB this replaces the |Q|×|C| expansion
  *     with a bucket-local join whose fan-in AQE handles (skewed buckets
  *     split by the band key salt).
  *
  * Hyperplanes are deterministic (seeded PRNG, embedded as literals) so
  * results are stable run-to-run — required by the driver's hash compare.
  *
  * Determinism upgrade (round 6): the DECLARED ranking queries score with
  * [[graft.functions.VecFunctions.vecDotScaled]] — the exact integer
  * quantized dot `Σ floor(aᵢ·1e6)·floor(bᵢ·1e6)` — instead of a double
  * cosine, and the LSH hyperplanes carry small INTEGER coefficients. Every
  * arithmetic step (band signatures, candidate sets, scores, top-k order)
  * is then exact int64 on both engines, so DuckDB replays the full pipeline
  * bit-for-bit and the driver hash-checks rows it previously could only
  * count. For the unit-norm embeddings table the quantized score is the
  * cosine to within dim·1e-6; the float cosine path ([[bruteTopK]],
  * [[ivfTopK]]) remains the recall-spec ground truth.
  */
object Similarity {

  /** Component quantization scale for the oracle-checkable score path. */
  val Scale = 1000000L

  /** Exact integer similarity score (quantized inner product). */
  def sdot(a: Column, b: Column): Column =
    VecFunctions.vecDotScaled(a, b, Scale, Scale)

  /** Σ aᵢ·bᵢ via the native [[graft.functions.FloatVecDot]] kernel — a fused
    * codegen loop. (The declarative `zip_with` + `aggregate` form computes
    * the same thing but is CodegenFallback: per-row lambda binding plus an
    * intermediate array, and it breaks the enclosing whole-stage-codegen
    * span — measured ~3× slower on the ann_lsh re-rank at sf0.1.)
    */
  def dot(a: Column, b: Column): Column = VecFunctions.vecDot(a, b)

  def norm(a: Column): Column = VecFunctions.vecNorm(a)

  def cosine(a: Column, b: Column): Column = VecFunctions.vecCosine(a, b)

  /** Exact top-k neighbors for each query vector (self excluded). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("n_id").asc)
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "n_id", "rk")
  }

  /** Exact top-k under the integer-quantized score — same plan shape as
    * [[bruteTopK]] (broadcast query side, one corpus scan), but every score
    * and the rank order are exact int64, so the result is hash-checkable.
    */
  def bruteTopKScaled(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sdot").desc, col("n_id").asc)
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sdot", sdot(col("q_emb"), col("n_emb")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "n_id", "sdot", "rk")
  }

  /** Deterministic random hyperplanes with INTEGER coefficients in
    * [-1000, 1000] (seeded PRNG). Integer coefficients keep the sign test
    * `Σ floor(eᵢ·1e6)·pᵢ ≥ 0` exact int64 arithmetic — the bit that makes
    * band signatures replayable in the DuckDB oracle — while the direction
    * distribution stays as uniform as the double version for LSH purposes
    * (2001 quantization levels per axis).
    */
  private[pipeline] def quantPlanes(nPlanes: Int, dim: Int): Seq[Seq[Int]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextInt(2001) - 1000))
  }

  /** Sign-bit LSH signature as one BIGINT per band (`bandBits` planes per
    * band). Rows sharing any band value become candidates. Signatures are
    * exact-integer (see [[quantPlanes]]): the plane ships as an
    * integer-valued float literal (|c| ≤ 1000, float-exact), scaleRight = 1
    * floors it back to the same integer.
    */
  def withBands(df: DataFrame, nBands: Int, bandBits: Int, dim: Int): DataFrame = {
    val planes = quantPlanes(nBands * bandBits, dim)
    val bandCols = (0 until nBands).map { b =>
      val bits = (0 until bandBits).map { i =>
        val plane = typedLit(planes(b * bandBits + i).map(_.toFloat))
        when(VecFunctions.vecDotScaled(col("embedding"), plane, Scale, 1L) >= 0,
          lit(1L << i)).otherwise(lit(0L))
      }
      bits.reduce(_.bitwiseOR(_)).as(s"band_$b")
    }
    df.select(col("*") +: bandCols: _*)
  }

  /** Approximate top-k: candidates = pairs agreeing on ≥1 LSH band, then
    * exact cosine re-rank within each query's candidate set.
    *
    * Shuffle discipline (the thing that matters at scale): the band join
    * and the band-duplicate-collapsing distinct run over (vec_id, band,
    * sig) scalars ONLY — candidate ID pairs come out, and the embedding
    * arrays are re-joined by vec_id afterwards for the exact cosine
    * re-rank. Each embedding therefore crosses the wire once per join
    * side, not once per band replica (the nBands× amplification the
    * banded-join-with-payload plan pays); the cosine is computed in the
    * re-join's codegen'd output pipeline so only (q_id, n_id, cos) rows
    * reach the top-k window's exchange.
    */
  def lshTopK(emb: DataFrame, k: Int, nBands: Int = 4, bandBits: Int = 8,
      dim: Int = 64): DataFrame = {
    // spread the signature build + bucket self-join off the (often
    // 1-split) scan parallelism; no-op at real scan sizes
    val keyed = withBands(Par.spread(emb), nBands, bandBits, dim)
      .select(col("vec_id"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"), col(s"band_$b").as("sig"))): _*)).as("bs"))
      .select(col("vec_id"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
    val pairs = keyed.select(col("band"), col("sig"), col("vec_id").as("q_id"))
      .join(keyed.select(col("band"), col("sig"), col("vec_id").as("n_id")),
        Seq("band", "sig"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
      .distinct()
    val scored = pairs
      .join(emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id")
      .join(emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
        "n_id")
      .select(col("q_id"), col("n_id"),
        sdot(col("q_emb"), col("n_emb")).as("sdot"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sdot").desc, col("n_id").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "n_id", "sdot", "rk")
  }

  /** IVF-style ANN: a coarse quantizer assigns every vector to a centroid
    * cell; a query probes only its `nProbe` nearest cells and re-ranks
    * exactly within them. Complementary to [[lshTopK]]: IVF adapts to the
    * data distribution (cells follow density), LSH is data-independent.
    *
    * Scale design: the quantizer is fit ONCE (cached per corpus, see
    * [[IvfCentroids]] — in production it is trained offline and passed in
    * via the `centroids` overload) and shipped to executors as a reference
    * object inside the native `vec_top_cells` kernel, so cell assignment
    * (`k=1`) and probe selection (`k=nProbe`) are each a fully codegen'd
    * argmax over `nCells` dot products — no MLlib prediction UDF, no
    * in-query iterative training job. The probe join shuffles by cell and
    * touches nProbe/nCells of the corpus; at 100 TB `nCells` grows ~√N so
    * cells stay executor-sized. Each (query, neighbor) pair arises in
    * exactly one cell (the neighbor's own), so no pair-dedup agg is needed
    * before the top-k window.
    */
  def ivfTopK(emb: DataFrame, k: Int, nCells: Int = 16, nProbe: Int = 4)
      : DataFrame =
    ivfTopK(emb, k, IvfCentroids.forFrame(emb, nCells), nProbe)

  def ivfTopK(emb: DataFrame, k: Int, centroids: Array[Array[Float]],
      nProbe: Int): DataFrame = {
    import org.apache.spark.sql.graft.VecColumns
    val assigned = emb.select(
      col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      element_at(VecColumns.topCells(col("embedding"), centroids, 1), 1)
        .as("cell"))
    val probes = emb.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      explode(VecColumns.topCells(col("embedding"), centroids, nProbe))
        .as("cell"))
    // exact re-rank within probed cells; cosine computed in the join's
    // codegen'd output pipeline, so only (q_id, n_id, cos) scalars reach
    // the top-k window's exchange
    val cand = probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("n_emb")).as("cos"))
    val wk = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("n_id").asc)
    cand.withColumn("rk", row_number().over(wk).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "n_id", "rk")
  }

  /** Oracle-checkable IVF: the coarse quantizer is a SAMPLED quantizer —
    * the `nCells` strided rows of the vec_id-ordered 512-row sample, with
    * components quantized to scaled longs — and cell assignment/probing is
    * argmin of the exact integer squared distance
    * (`vec_near_cells_scaled`). A sampled quantizer is the standard
    * cheap-training IVF variant (cells follow data density because seeds
    * ARE data points); recall is marginally below Lloyd's (re-rank is exact
    * either way), and in exchange every step — seed choice, assignment,
    * probe order, score, rank — is integer-deterministic, so DuckDB replays
    * the whole query and the driver hash-checks it. [[ivfTopK]] (Lloyd,
    * float) stays as the quality path, pinned by the recall spec.
    *
    * Scale shape is identical to [[ivfTopK]]: quantizer fit once per corpus
    * from a bounded O(nCells)-row sample, shipped per task as a reference
    * object; the probe join shuffles by cell, nProbe/nCells of the corpus.
    */
  def ivfTopKSampled(emb: DataFrame, k: Int, nCells: Int = 16, nProbe: Int = 4)
      : DataFrame = {
    import org.apache.spark.sql.graft.VecColumns
    val cents = QuantCentroids.forFrame(emb, nCells)
    // spread the corpus before the candidate expansion (guide §2.5/§2.6):
    // at bench scale the embeddings table packs into ONE scan split, so
    // the whole probes×cell-members expansion + integer re-rank ran as a
    // single task on one core (measured: one 2.5 s single-task stage in
    // ann_ivfpq's 3.0 s warm pass). Par.spread is scale-adaptive — a
    // corpus whose scan already splits ≥ defaultParallelism ways is
    // untouched, so this only fixes the small-input under-parallelism.
    val base = Par.spread(emb.filter(col("embedding").isNotNull))
    val assigned = base.select(
      col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      element_at(VecColumns.nearCellsScaled(col("embedding"), cents, 1, Scale), 1)
        .as("cell"))
    val probes = base.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      explode(VecColumns.nearCellsScaled(col("embedding"), cents, nProbe, Scale))
        .as("cell"))
    val cand = probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        sdot(col("q_emb"), col("n_emb")).as("sdot"))
    val wk = Window.partitionBy("q_id")
      .orderBy(col("sdot").desc, col("n_id").asc)
    cand.withColumn("rk", row_number().over(wk).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "n_id", "sdot", "rk")
  }

  /** PRODUCT-QUANTIZATION ANN (r17): encode each corpus vector as `nSub`
    * small codes (nearest sub-centroid per 16-dim subspace), score queries
    * against the DECODED reconstruction — asymmetric distance computation
    * (ADC), the memory-bounded ANN representation at 100 TB: the corpus
    * index stores `nSub` bytes per vector (here 4) instead of `dim`
    * floats (256 bytes), a 64× compression that is what lets a
    * billion-vector index live in RAM. Codebooks are the SAME strided
    * deterministic sample as [[ivfTopKSampled]]'s quantizer, sliced into
    * subspaces (sub-centroid `m,c` = sample row `⌊c·n/nCells⌋`'s m-th
    * subvector, integer-quantized) — bounded collect, never O(corpus);
    * production trains offline and passes the codebooks in.
    *
    * Everything stays exact int64 so the oracle replays it bit-for-bit:
    * encoding = argmin of Σ(qᵢ−cᵢ)² over scaled longs (lowest cell wins
    * ties — [[org.apache.spark.sql.graft.VecNearCellsScaled]]'s order),
    * decoding = codebook lookup (scaled values ≤ 1e6 < 2²⁴ are
    * float-exact), ADC = Σ floor(qᵢ·1e6)·decᵢ. Encode and decode fuse
    * into ONE codegen'd projection over the corpus scan (no shuffle
    * before the top-k window); the query side broadcasts.
    */
  def pqTopK(emb: DataFrame, k: Int, nSub: Int = 4, nCells: Int = 16)
      : DataFrame = {
    val cents = QuantCentroids.forFrame(emb, nCells)
    val base = emb.filter(col("embedding").isNotNull)
    // spread the FULL corpus here, not inside pqTopKWith: the maintained
    // twin calls pqTopKWith with δ-sized corpora where a repartition
    // costs more than the single-task decode it spreads
    pqTopKWith(base.filter(col("vec_id") < 10), Par.spread(base), k,
      cents, nSub)
  }

  /** [[pqTopK]] against EXPLICIT codebook centroids — the production
    * shape (codebooks trained offline and passed in) and what the
    * maintained twin needs: `delta_pq_topk` FREEZES its codebooks on
    * the base snapshot (PQ codes are append-stable only under frozen
    * codebooks — retraining on the grown corpus would re-encode
    * everything, which is a view rebuild, not maintenance). Uncached
    * explicit sampling matters here because a filtered frame shares
    * its parquet files with the full table, so the file-keyed
    * [[QuantCentroids]] cache cannot tell base from base∪δ.
    */
  def pqTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
      cents: Array[Array[Long]], nSub: Int = 4): DataFrame = {
    import org.apache.spark.sql.graft.VecColumns
    val dim = cents.head.length
    require(dim % nSub == 0,
      s"pqTopK: dim $dim must divide into $nSub subspaces")
    val subLen = dim / nSub
    val codebooks: Seq[Array[Array[Long]]] = (0 until nSub)
      .map(m => cents.map(_.slice(m * subLen, (m + 1) * subLen)))
    val decCols = (0 until nSub).map { m =>
      val code = element_at(VecColumns.nearCellsScaled(
        slice(col("embedding"), m * subLen + 1, subLen),
        codebooks(m), 1, Scale), 1)
      val lut = typedLit(codebooks(m).map(_.toSeq.map(_.toFloat)).toSeq)
      element_at(lut, code + 1)
    }
    val decoded = corpus.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("n_id"),
        flatten(array(decCols: _*)).as("dec"))
    val q = queries.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("adc").desc, col("n_id").asc)
    decoded.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("adc",
        VecFunctions.vecDotScaled(col("q_emb"), col("dec"), Scale, 1L))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "n_id", "adc", "rk")
  }

  /** IVF+PQ ANN (r17) — the production composition (FAISS's IVFPQ):
    * coarse IVF cells bound WHO meets whom (each query scores only its
    * `nProbe` nearest cells' members — the candidate set is
    * Σ|probed cells|, never corpus²), and PQ codes bound the BYTES per
    * candidate (ADC against the 4-byte decoded reconstruction instead
    * of the raw vector). At 100 TB the two compose into the only shape
    * that fits: cell-bucketed equality join for locality, RAM-resident
    * byte codes for the scan. One codebook source serves both roles —
    * the strided sample rows are the coarse centroids AND, sliced, the
    * PQ sub-centroids — exactly how IVFPQ shares its training set.
    * Everything stays exact int64 (coarse assignment, encoding, ADC),
    * so the oracle replays cells→probes→codes→ADC→top-k bit-for-bit.
    */
  def ivfpqTopK(emb: DataFrame, k: Int, nCells: Int = 16,
      nProbe: Int = 4, nSub: Int = 4): DataFrame = {
    import org.apache.spark.sql.graft.VecColumns
    val cents = QuantCentroids.forFrame(emb, nCells)
    val dim = cents.head.length
    require(dim % nSub == 0,
      s"ivfpqTopK: dim $dim must divide into $nSub subspaces")
    val subLen = dim / nSub
    val codebooks: Seq[Array[Array[Long]]] = (0 until nSub)
      .map(m => cents.map(_.slice(m * subLen, (m + 1) * subLen)))
    val decCols = (0 until nSub).map { m =>
      val code = element_at(VecColumns.nearCellsScaled(
        slice(col("embedding"), m * subLen + 1, subLen),
        codebooks(m), 1, Scale), 1)
      val lut = typedLit(codebooks(m).map(_.toSeq.map(_.toFloat)).toSeq)
      element_at(lut, code + 1)
    }
    // spread before the expansion — same rationale (and measurement) as
    // [[ivfTopKSampled]]; no-op when the scan already splits enough
    val base = Par.spread(emb.filter(col("embedding").isNotNull))
    // index side: coarse cell + PQ-decoded reconstruction, ONE
    // codegen'd projection over the corpus scan
    val assigned = base.select(
      col("vec_id").as("n_id"),
      flatten(array(decCols: _*)).as("dec"),
      element_at(VecColumns.nearCellsScaled(col("embedding"), cents, 1,
        Scale), 1).as("cell"))
    val probes = base.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      explode(VecColumns.nearCellsScaled(col("embedding"), cents,
        nProbe, Scale)).as("cell"))
    val cand = probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        VecFunctions.vecDotScaled(col("q_emb"), col("dec"), Scale, 1L)
          .as("adc"))
    val wk = Window.partitionBy("q_id")
      .orderBy(col("adc").desc, col("n_id").asc)
    cand.withColumn("rk", row_number().over(wk).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "n_id", "adc", "rk")
  }

  /** Strided-sample centroids from an EXPLICIT frame, uncached — the
    * same derivation as [[QuantCentroids.forFrame]] (vec_id-ordered
    * ≤[[QuantCentroids.SampleN]]-row sample, stride `⌊c·n/nCells⌋`,
    * integer-quantized), for callers whose sampling frame is NOT the
    * whole table (frozen-codebook maintenance). Bounded collect.
    */
  def sampleCentroids(frame: DataFrame, nCells: Int): Array[Array[Long]] = {
    val pts = frame.filter(col("embedding").isNotNull)
      .orderBy("vec_id").limit(QuantCentroids.SampleN)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    require(pts.nonEmpty, "cannot seed PQ/IVF cells on an empty corpus")
    Array.tabulate(nCells) { c =>
      pts((c.toLong * pts.length / nCells).toInt)
        .map(x => math.floor(x.toDouble * Scale).toLong)
    }
  }

  /** Sampled-quantizer centroids for [[ivfTopKSampled]]: the strided
    * `nCells` rows of the vec_id-ordered (≤512-row) sample, quantized to
    * scaled longs. Same bounded-collect + per-corpus cache discipline as
    * [[IvfCentroids]]; `SampleN` and the stride `⌊c·n/nCells⌋` are part of
    * the declared query's contract (the oracle replays them).
    */
  object QuantCentroids {
    val SampleN = 512
    private val cache =
      new scala.collection.concurrent.TrieMap[(String, Int), Array[Array[Long]]]

    def forFrame(emb: DataFrame, nCells: Int): Array[Array[Long]] = {
      val files = emb.inputFiles.sorted.mkString(",")
      // the derivation lives in [[sampleCentroids]] (shared with the
      // frozen-codebook callers, who must NOT hit this file-keyed
      // cache — a filtered frame lists the same files)
      if (files.isEmpty) sampleCentroids(emb, nCells)
      else cache.getOrElseUpdate((files, nCells),
        sampleCentroids(emb, nCells))
    }
  }

  /** The IVF coarse quantizer: plain Lloyd k-means over a BOUNDED
    * deterministic sample (32 rows per cell, lowest vec_ids), fit on the
    * driver and cached per (corpus files, nCells).
    *
    * Driver-side fitting on 512 sampled rows is deliberate: quantizer cell
    * QUALITY barely moves IVF recall (the re-rank is exact), and the
    * alternative — an in-query MLlib training job — welds a
    * driver-coordinated iterative computation onto every query execution,
    * a non-starter at 100 TB. The sample collect is O(nCells), never
    * O(corpus). Production path: train offline, pass the matrix to the
    * `ivfTopK(emb, k, centroids, nProbe)` overload.
    *
    * Centroids are unit-normalized so the `vec_top_cells` dot ranking is
    * the cosine ranking, making assignment and probing consistent (a
    * query's first probe is always its own cell).
    */
  object IvfCentroids {
    private val cache =
      new scala.collection.concurrent.TrieMap[(String, Int), Array[Array[Float]]]

    def forFrame(emb: DataFrame, nCells: Int): Array[Array[Float]] = {
      val files = emb.inputFiles.sorted.mkString(",")
      def fitNow() = fit(sample(emb, 32 * nCells), nCells)
      if (files.isEmpty) fitNow()                     // local test frames: no stable key
      else cache.getOrElseUpdate((files, nCells), fitNow())
    }

    private def sample(emb: DataFrame, n: Int): Array[Array[Float]] =
      emb.filter(col("embedding").isNotNull)
        .orderBy("vec_id").limit(n)                   // TakeOrderedAndProject: bounded
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray)

    def fit(points: Array[Array[Float]], nCells: Int, iters: Int = 4)
        : Array[Array[Float]] = {
      require(points.nonEmpty, "cannot fit IVF centroids on an empty corpus")
      val dim = points.head.length
      // deterministic strided init over the vec_id-ordered sample
      val cents = Array.tabulate(nCells)(c =>
        points((c.toLong * points.length / nCells).toInt).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(nCells)(new Array[Double](dim))
        val counts = new Array[Long](nCells)
        points.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < nCells) {
            var d = 0.0; var i = 0
            while (i < dim) {
              val t = p(i) - cents(c)(i); d += t * t; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dim) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        for (c <- 0 until nCells if counts(c) > 0; i <- 0 until dim)
          cents(c)(i) = (sums(c)(i) / counts(c)).toFloat
      }
      cents.map { c =>
        val n = math.sqrt(c.map(x => x.toDouble * x).sum)
        if (n > 0) c.map(x => (x / n).toFloat) else c
      }
    }
  }

  /** DuckDB oracle fragments for the integer-quantized ANN family. Every
    * fragment replays the EXACT arithmetic of the Spark kernels in int64 —
    * `FLOOR(CAST(x AS DOUBLE)·S)` matches the kernels' quantization
    * (the explicit DOUBLE cast matters: DuckDB would otherwise multiply in
    * single precision and floor a different integer — same gotcha the
    * embedding_centroids oracle documents), `SUM` of products is exact, and
    * every rank is `row_number()` over a total integer order.
    */
  private[pipeline] object SqlOracle {
    /** Long-form quantized embeddings: (vec_id, pos, q). */
    val quantCte: String =
      s"""e AS (SELECT vec_id,
         |  CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * $Scale) AS BIGINT)
         |    AS q,
         |  unnest(generate_series(1, len(embedding))) AS pos
         |  FROM embeddings WHERE embedding IS NOT NULL)""".stripMargin

    /** The [[quantPlanes]] coefficients as a VALUES table
      * (band, pw = 1<<bit, pos, c) — the single source of truth is the same
      * seeded generator the Spark side embeds as literals.
      */
    def planesCte(nBands: Int, bandBits: Int, dim: Int): String = {
      val ps = quantPlanes(nBands * bandBits, dim)
      val rows = for {
        b <- 0 until nBands; i <- 0 until bandBits; p <- 0 until dim
      } yield s"($b,${1L << i},${p + 1},${ps(b * bandBits + i)(p)})"
      s"planes(band, pw, pos, c) AS (VALUES ${rows.mkString(",")})"
    }

    /** Per-(vec_id, band) signature from the plane sign bits. */
    val sigCte: String =
      """sig AS (SELECT vec_id, band,
        |    CAST(SUM(CASE WHEN pd >= 0 THEN pw ELSE 0 END) AS BIGINT) AS sig
        |  FROM (SELECT e.vec_id, p.band, p.pw, SUM(e.q * p.c) AS pd
        |        FROM e JOIN planes p ON e.pos = p.pos
        |        GROUP BY e.vec_id, p.band, p.pw) bits
        |  GROUP BY vec_id, band)""".stripMargin

    /** Exact re-rank of `cand(q_id, n_id)`: score, top-k, total order. */
    def rerank(k: Int): String =
      s"""d AS (SELECT c.q_id, c.n_id, CAST(SUM(ea.q * eb.q) AS BIGINT) AS sdot
         |  FROM cand c
         |  JOIN e ea ON ea.vec_id = c.q_id
         |  JOIN e eb ON eb.vec_id = c.n_id AND eb.pos = ea.pos
         |  GROUP BY c.q_id, c.n_id),
         |r AS (SELECT q_id, n_id, sdot,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |                            ORDER BY sdot DESC, n_id) AS BIGINT) AS rk
         |  FROM d)
         |SELECT q_id, n_id, sdot, rk FROM r WHERE rk <= $k
         |ORDER BY q_id, rk""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    // Exact top-5 for the first 10 vectors under the integer-quantized
    // score — brute-force baseline, hash-checked end to end.
    QueryDef("similarity_topk",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        bruteTopKScaled(emb.filter(col("vec_id") < 10), emb, 5)
          .orderBy("q_id", "rk")
      },
      Some(s"""WITH ${SqlOracle.quantCte},
             |cand AS (SELECT a.q_id, b.n_id
             |  FROM (SELECT DISTINCT vec_id AS q_id FROM e WHERE vec_id < 10) a
             |  CROSS JOIN (SELECT DISTINCT vec_id AS n_id FROM e) b
             |  WHERE a.q_id <> b.n_id),
             |${SqlOracle.rerank(5)}""".stripMargin)),

    // LSH-bucketed ANN over the whole corpus — the 100 TB-shaped variant.
    // Integer band signatures + integer re-rank ⇒ the full candidate
    // pipeline (banding, bucket join, dedup, score, top-k) hash-checks.
    QueryDef("ann_lsh",
      (s, d) => lshTopK(Tables(s, d, "embeddings"), 5).orderBy("q_id", "rk"),
      Some(s"""WITH ${SqlOracle.quantCte},
             |${SqlOracle.planesCte(4, 8, 64)},
             |${SqlOracle.sigCte},
             |cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id
             |  FROM sig a JOIN sig b
             |    ON a.band = b.band AND a.sig = b.sig
             |   AND a.vec_id <> b.vec_id),
             |${SqlOracle.rerank(5)}""".stripMargin)),

    // IVF ANN with the sampled quantizer (strided seed rows, integer
    // distances) — cells, probes, and re-rank all replayed by the oracle.
    QueryDef("ann_ivf",
      (s, d) => ivfTopKSampled(Tables(s, d, "embeddings"), 5)
        .orderBy("q_id", "rk"),
      Some(s"""WITH ${SqlOracle.quantCte},
             |samp AS (SELECT vec_id,
             |    row_number() OVER (ORDER BY vec_id) - 1 AS rn
             |  FROM embeddings WHERE embedding IS NOT NULL
             |  ORDER BY vec_id LIMIT ${QuantCentroids.SampleN}),
             |cidx AS (SELECT CAST(g.c AS INT) AS cell,
             |    CAST(FLOOR(g.c * (SELECT COUNT(*) FROM samp) / 16.0)
             |         AS BIGINT) AS rn
             |  FROM (SELECT unnest(generate_series(0, 15)) AS c) g),
             |cents AS (SELECT cidx.cell, e.pos, e.q AS cq
             |  FROM cidx JOIN samp ON samp.rn = cidx.rn
             |  JOIN e ON e.vec_id = samp.vec_id),
             |dist AS (SELECT e.vec_id, c.cell,
             |    SUM((e.q - c.cq) * (e.q - c.cq)) AS d2
             |  FROM e JOIN cents c ON e.pos = c.pos
             |  GROUP BY e.vec_id, c.cell),
             |ranked AS (SELECT vec_id, cell,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell)
             |      AS cr
             |  FROM dist),
             |cand AS (SELECT p.vec_id AS q_id, a.vec_id AS n_id
             |  FROM (SELECT vec_id, cell FROM ranked WHERE cr <= 4) p
             |  JOIN (SELECT vec_id, cell FROM ranked WHERE cr = 1) a
             |    ON p.cell = a.cell AND p.vec_id <> a.vec_id),
             |${SqlOracle.rerank(5)}""".stripMargin)),

    // PRODUCT-QUANTIZED ANN (r17): 4-byte PQ codes + asymmetric distance
    // against the decoded reconstruction — the RAM-bounded index shape
    // (64× smaller than the raw vectors). The oracle replays the whole
    // pipeline from first principles: strided codebooks, per-subspace
    // argmin encoding (ties → lowest cell), decode, integer ADC, top-k.
    QueryDef("ann_pq",
      (s, d) => pqTopK(Tables(s, d, "embeddings"), 5)
        .orderBy("q_id", "rk"),
      Some(s"""WITH ${SqlOracle.quantCte},
             |samp AS (SELECT vec_id,
             |    row_number() OVER (ORDER BY vec_id) - 1 AS rn
             |  FROM embeddings WHERE embedding IS NOT NULL
             |  ORDER BY vec_id LIMIT ${QuantCentroids.SampleN}),
             |cidx AS (SELECT CAST(g.c AS INT) AS cell,
             |    CAST(FLOOR(g.c * (SELECT COUNT(*) FROM samp) / 16.0)
             |         AS BIGINT) AS rn
             |  FROM (SELECT unnest(generate_series(0, 15)) AS c) g),
             |cents AS (SELECT cidx.cell, e.pos, e.q AS cq
             |  FROM cidx JOIN samp ON samp.rn = cidx.rn
             |  JOIN e ON e.vec_id = samp.vec_id),
             |d2 AS (SELECT n.vec_id,
             |    CAST(FLOOR((n.pos - 1) / 16.0) AS INT) AS sub, c.cell,
             |    SUM((n.q - c.cq) * (n.q - c.cq)) AS d2
             |  FROM e n JOIN cents c ON n.pos = c.pos
             |  GROUP BY 1, 2, 3),
             |enc AS (SELECT vec_id, sub, cell FROM (
             |    SELECT vec_id, sub, cell, row_number() OVER (
             |      PARTITION BY vec_id, sub ORDER BY d2, cell) AS cr
             |    FROM d2) WHERE cr = 1),
             |dec AS (SELECT enc.vec_id, c.pos, c.cq
             |  FROM enc JOIN cents c ON c.cell = enc.cell
             |   AND CAST(FLOOR((c.pos - 1) / 16.0) AS INT) = enc.sub),
             |adc AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id,
             |    CAST(SUM(q.q * d.cq) AS BIGINT) AS adc
             |  FROM e q JOIN dec d ON q.pos = d.pos
             |  WHERE q.vec_id < 10 AND q.vec_id <> d.vec_id
             |  GROUP BY 1, 2),
             |r AS (SELECT q_id, n_id, adc,
             |    CAST(row_number() OVER (PARTITION BY q_id
             |      ORDER BY adc DESC, n_id) AS BIGINT) AS rk
             |  FROM adc)
             |SELECT q_id, n_id, adc, rk FROM r WHERE rk <= 5
             |ORDER BY q_id, rk""".stripMargin)),

    // IVF+PQ ANN (r17): cells bound WHO meets whom, PQ codes bound the
    // bytes per candidate — the composed production index shape (FAISS
    // IVFPQ). Cell-equality join (no product), codegen'd encode/decode
    // in one corpus projection, integer ADC; the oracle replays the
    // full composition.
    QueryDef("ann_ivfpq",
      (s, d) => ivfpqTopK(Tables(s, d, "embeddings"), 5)
        .orderBy("q_id", "rk"),
      Some(s"""WITH ${SqlOracle.quantCte},
             |samp AS (SELECT vec_id,
             |    row_number() OVER (ORDER BY vec_id) - 1 AS rn
             |  FROM embeddings WHERE embedding IS NOT NULL
             |  ORDER BY vec_id LIMIT ${QuantCentroids.SampleN}),
             |cidx AS (SELECT CAST(g.c AS INT) AS cell,
             |    CAST(FLOOR(g.c * (SELECT COUNT(*) FROM samp) / 16.0)
             |         AS BIGINT) AS rn
             |  FROM (SELECT unnest(generate_series(0, 15)) AS c) g),
             |cents AS (SELECT cidx.cell, e.pos, e.q AS cq
             |  FROM cidx JOIN samp ON samp.rn = cidx.rn
             |  JOIN e ON e.vec_id = samp.vec_id),
             |dist AS (SELECT e.vec_id, c.cell,
             |    SUM((e.q - c.cq) * (e.q - c.cq)) AS d2
             |  FROM e JOIN cents c ON e.pos = c.pos
             |  GROUP BY e.vec_id, c.cell),
             |ranked AS (SELECT vec_id, cell,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell)
             |      AS cr
             |  FROM dist),
             |cand AS (SELECT p.vec_id AS q_id, a.vec_id AS n_id
             |  FROM (SELECT vec_id, cell FROM ranked WHERE cr <= 4) p
             |  JOIN (SELECT vec_id, cell FROM ranked WHERE cr = 1) a
             |    ON p.cell = a.cell AND p.vec_id <> a.vec_id),
             |subd AS (SELECT n.vec_id,
             |    CAST(FLOOR((n.pos - 1) / 16.0) AS INT) AS sub, c.cell,
             |    SUM((n.q - c.cq) * (n.q - c.cq)) AS d2
             |  FROM e n JOIN cents c ON n.pos = c.pos
             |  GROUP BY 1, 2, 3),
             |enc AS (SELECT vec_id, sub, cell FROM (
             |    SELECT vec_id, sub, cell, row_number() OVER (
             |      PARTITION BY vec_id, sub ORDER BY d2, cell) AS cr
             |    FROM subd) WHERE cr = 1),
             |dec AS (SELECT enc.vec_id, c.pos, c.cq
             |  FROM enc JOIN cents c ON c.cell = enc.cell
             |   AND CAST(FLOOR((c.pos - 1) / 16.0) AS INT) = enc.sub),
             |adc AS (SELECT cd.q_id, cd.n_id,
             |    CAST(SUM(q.q * d.cq) AS BIGINT) AS adc
             |  FROM cand cd
             |  JOIN e q ON q.vec_id = cd.q_id
             |  JOIN dec d ON d.vec_id = cd.n_id AND d.pos = q.pos
             |  GROUP BY 1, 2),
             |r AS (SELECT q_id, n_id, adc,
             |    CAST(row_number() OVER (PARTITION BY q_id
             |      ORDER BY adc DESC, n_id) AS BIGINT) AS rk
             |  FROM adc)
             |SELECT q_id, n_id, adc, rk FROM r WHERE rk <= 5
             |ORDER BY q_id, rk""".stripMargin)),

    // MAINTAINED ANN VIEW (round 6): per-query top-k under corpus appends
    // via the top-k monoid — topk(corpus ∪ δ) = topk(topk(corpus) ∪
    // topk(δ)) per query, exact because the integer-quantized score order
    // is total (sdot desc, n_id asc). A maintenance cycle scores queries
    // against ONLY the delta embeddings (broadcast query side × pruned δ
    // scan) and merges ≤ 2k rows per query against the stored view — the
    // base corpus is never re-scored, which is the difference between a
    // per-cycle brute sweep and an incremental similarity index at 100 TB.
    // The oracle ranks against the FULL corpus from first principles, so
    // hash equality pins the monoid merge against an independent
    // derivation (the embedding twin of delta_topk).
    QueryDef("delta_ann_topk",
      (s, d) => {
        import graft.ivm.DeltaSources
        val emb = Tables(s, d, "embeddings")
        val basePred = DeltaSources.predicateFor("embeddings").get.sql
        val base = emb.filter(expr(s"NOT ($basePred)"))
        val deltaE = emb.filter(expr(basePred))
        // static query set: base vectors with vec_id < 10 (membership must
        // not change between snapshots — new queries are a view rebuild)
        val queries = base.filter(col("vec_id") < 10)
        val prev = bruteTopKScaled(queries, base, 5)   // the stored view
        val dTop = bruteTopKScaled(queries, deltaE, 5) // δ's own top-k
        val w = Window.partitionBy("q_id")
          .orderBy(col("sdot").desc, col("n_id").asc)
        prev.select("q_id", "n_id", "sdot")
          .unionByName(dTop.select("q_id", "n_id", "sdot"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .orderBy("q_id", "rk")
      },
      Some(s"""WITH ${SqlOracle.quantCte},
             |cand AS (SELECT a.q_id, b.n_id
             |  FROM (SELECT DISTINCT vec_id AS q_id FROM e
             |        WHERE vec_id < 10 AND NOT (vec_id % 10 = 0)) a
             |  CROSS JOIN (SELECT DISTINCT vec_id AS n_id FROM e) b
             |  WHERE a.q_id <> b.n_id),
             |${SqlOracle.rerank(5)}""".stripMargin)),

    // MAINTAINED PQ VIEW (r17): the ann_pq index maintained under corpus
    // appends — codebooks FROZEN on the base snapshot (PQ codes are
    // append-stable only under frozen codebooks; retraining is a view
    // rebuild by definition), a cycle encodes + scores ONLY the delta
    // embeddings against the broadcast query set, and the per-query
    // top-k monoid merges ≤2k rows per query — the base corpus is never
    // re-encoded or re-scored. The oracle recomputes from first
    // principles over the FULL corpus with base-sample codebooks, so
    // hash equality pins merge(stored view, δ top-k) == recompute.
    QueryDef("delta_pq_topk",
      (s, d) => {
        import graft.ivm.DeltaSources
        val emb = Tables(s, d, "embeddings")
        val basePred = DeltaSources.predicateFor("embeddings").get.sql
        val base = emb.filter(expr(s"NOT ($basePred)"))
        val deltaE = emb.filter(expr(basePred))
        val cents = sampleCentroids(base, 16) // frozen on the base cut
        val queries = base.filter(col("vec_id") < 10)
        val prev = pqTopKWith(queries, base, 5, cents)   // stored view
        val dTop = pqTopKWith(queries, deltaE, 5, cents) // δ's own top-k
        val w = Window.partitionBy("q_id")
          .orderBy(col("adc").desc, col("n_id").asc)
        prev.select("q_id", "n_id", "adc")
          .unionByName(dTop.select("q_id", "n_id", "adc"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .orderBy("q_id", "rk")
      },
      Some(s"""WITH ${SqlOracle.quantCte},
             |samp AS (SELECT vec_id,
             |    row_number() OVER (ORDER BY vec_id) - 1 AS rn
             |  FROM embeddings WHERE embedding IS NOT NULL
             |    AND NOT (vec_id % 10 = 0)
             |  ORDER BY vec_id LIMIT ${QuantCentroids.SampleN}),
             |cidx AS (SELECT CAST(g.c AS INT) AS cell,
             |    CAST(FLOOR(g.c * (SELECT COUNT(*) FROM samp) / 16.0)
             |         AS BIGINT) AS rn
             |  FROM (SELECT unnest(generate_series(0, 15)) AS c) g),
             |cents AS (SELECT cidx.cell, e.pos, e.q AS cq
             |  FROM cidx JOIN samp ON samp.rn = cidx.rn
             |  JOIN e ON e.vec_id = samp.vec_id),
             |d2 AS (SELECT n.vec_id,
             |    CAST(FLOOR((n.pos - 1) / 16.0) AS INT) AS sub, c.cell,
             |    SUM((n.q - c.cq) * (n.q - c.cq)) AS d2
             |  FROM e n JOIN cents c ON n.pos = c.pos
             |  GROUP BY 1, 2, 3),
             |enc AS (SELECT vec_id, sub, cell FROM (
             |    SELECT vec_id, sub, cell, row_number() OVER (
             |      PARTITION BY vec_id, sub ORDER BY d2, cell) AS cr
             |    FROM d2) WHERE cr = 1),
             |dec AS (SELECT enc.vec_id, c.pos, c.cq
             |  FROM enc JOIN cents c ON c.cell = enc.cell
             |   AND CAST(FLOOR((c.pos - 1) / 16.0) AS INT) = enc.sub),
             |adc AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id,
             |    CAST(SUM(q.q * d.cq) AS BIGINT) AS adc
             |  FROM e q JOIN dec d ON q.pos = d.pos
             |  WHERE q.vec_id < 10 AND NOT (q.vec_id % 10 = 0)
             |    AND q.vec_id <> d.vec_id
             |  GROUP BY 1, 2),
             |r AS (SELECT q_id, n_id, adc,
             |    CAST(row_number() OVER (PARTITION BY q_id
             |      ORDER BY adc DESC, n_id) AS BIGINT) AS rk
             |  FROM adc)
             |SELECT q_id, n_id, adc, rk FROM r WHERE rk <= 5
             |ORDER BY q_id, rk""".stripMargin)),

    // Per-label centroid (mean embedding) — the distributed primitive
    // behind IVF training, cluster summarization, and class prototypes.
    // One hash aggregate with the native VecSumScaled state: each map task
    // combines its rows into ONE dim-sized long buffer per label, so the
    // exchange carries |labels| × dim longs — the posexplode alternative
    // shuffles |corpus| × dim rows, a dim× amplification that is the
    // difference between kilobytes and the corpus itself at 100 TB.
    // Integer-scaled components (floor(x·1e6)) make the sum exact and
    // merge-order-independent, so the centroid is bit-deterministic and
    // DuckDB-checkable; the tiny |labels|-row result explodes to long form
    // only for the hash compare. (The oracle casts each float component to
    // DOUBLE before scaling — DuckDB otherwise multiplies in single
    // precision and floors a different integer.)
    // INCREMENTAL centroid maintenance (round 6): the same per-label
    // centroid view maintained through the IvmAgg merge — VecSumScaled is
    // elementwise-addition mergeable (exact integer-scaled components), so
    // a maintenance cycle aggregates ONLY the delta embeddings and the
    // merge is a |labels|-row zip_with against the stored view; the corpus
    // is never re-scanned. The oracle recomputes the centroid from the
    // full table, so hash equality pins merge(base view, δ partial) ==
    // recompute — the same independent-derivation pattern as delta_minhash.
    QueryDef("delta_centroids",
      (s, d) => {
        import graft.ivm.{DeltaSources, IvmAgg}
        val q = (df: DataFrame) => df
          .groupBy(col("label").cast("long").as("label"))
          .agg(VecFunctions.vecSumScaled(col("embedding"), 1000000L).as("sv"),
            count(lit(1)).as("n"))
        val full = Tables(s, d, "embeddings")
        val basePred = DeltaSources.predicateFor("embeddings").get.sql
        val baseView = q(full.filter(expr(s"NOT ($basePred)")))
        IvmAgg.merge(baseView, IvmAgg.deltaPartial(q(full)))
          .select(col("label"), col("n"),
            posexplode(col("sv")).as(Seq("pos", "s")))
          .select(col("label"), col("n"), (col("pos") + 1).cast("long").as("pos"),
            (col("s").cast("double") / (lit(1000000.0) * col("n"))).as("c"))
          .orderBy("label", "pos")
      },
      Some("""WITH ex AS (
             |  SELECT label,
             |         unnest(embedding) AS e,
             |         unnest(generate_series(1, len(embedding))) AS ord
             |  FROM embeddings)
             |SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n,
             |  CAST(ord AS BIGINT) AS pos,
             |  CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
             |       AS DOUBLE)
             |    / (1000000.0 * COUNT(*)) AS c
             |FROM ex GROUP BY label, ord
             |ORDER BY label, pos""".stripMargin)),

    QueryDef("embedding_centroids",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        emb.groupBy(col("label").cast("long").as("label"))
          .agg(VecFunctions.vecSumScaled(col("embedding"), 1000000L).as("sv"),
            count(lit(1)).as("n"))
          .select(col("label"), col("n"),
            posexplode(col("sv")).as(Seq("pos", "s")))
          .select(col("label"), col("n"), (col("pos") + 1).cast("long").as("pos"),
            (col("s").cast("double") / (lit(1000000.0) * col("n"))).as("c"))
          .orderBy("label", "pos")
      },
      Some("""WITH ex AS (
             |  SELECT label,
             |         unnest(embedding) AS e,
             |         unnest(generate_series(1, len(embedding))) AS ord
             |  FROM embeddings)
             |SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n,
             |  CAST(ord AS BIGINT) AS pos,
             |  CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
             |       AS DOUBLE)
             |    / (1000000.0 * COUNT(*)) AS c
             |FROM ex GROUP BY label, ord
             |ORDER BY label, pos""".stripMargin))
  )
}
