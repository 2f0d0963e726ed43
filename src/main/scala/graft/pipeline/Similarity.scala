package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}
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
  */
object Similarity {

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

  /** Deterministic unit-free hyperplanes: `planes(p)(i)` in [-1, 1). */
  private def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Sign-bit LSH signature as one BIGINT per band (`bandBits` planes per
    * band). Rows sharing any band value become candidates.
    */
  def withBands(df: DataFrame, nBands: Int, bandBits: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nBands * bandBits, dim)
    val bandCols = (0 until nBands).map { b =>
      val bits = (0 until bandBits).map { i =>
        val plane = typedLit(planes(b * bandBits + i))
        when(dot(col("embedding"), plane) >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      bits.reduce(_.bitwiseOR(_)).as(s"band_$b")
    }
    df.select(col("*") +: bandCols: _*)
  }

  /** Approximate top-k: candidates = pairs agreeing on ≥1 LSH band, then
    * exact cosine re-rank within each query's candidate set.
    *
    * Shuffle discipline (the thing that matters at scale): cosine is
    * computed IN the band join's codegen'd output pipeline — before any
    * exchange — so the embedding arrays never shuffle. Band-duplicate pairs
    * recompute the (cheap, fused-loop) cosine and collapse in a
    * scalar-only groupBy; only (q_id, n_id, cos) rows ever hit the wire.
    */
  def lshTopK(emb: DataFrame, k: Int, nBands: Int = 4, bandBits: Int = 8,
      dim: Int = 64): DataFrame = {
    val banded = withBands(emb, nBands, bandBits, dim)
    val bandIdx = explode(array((0 until nBands).map(b =>
      struct(lit(b).as("band"), col(s"band_$b").as("sig"))): _*)).as("bs")
    val keyed = banded.select(col("vec_id"), col("embedding"), bandIdx)
      .select(col("vec_id"), col("embedding"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
    val left = keyed.select(col("band"), col("sig"),
      col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val right = keyed.select(col("band"), col("sig"),
      col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val scored = left.join(right, Seq("band", "sig"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("n_emb")).as("cos"))
      .groupBy("q_id", "n_id").agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "n_id", "rk")
  }

  /** IVF-style ANN: a coarse quantizer (MLlib k-means, fixed seed) assigns
    * every vector to a centroid cell; a query probes only its `nProbe`
    * nearest cells and re-ranks exactly within them. Complementary to
    * [[lshTopK]]: IVF adapts to the data distribution (cells follow
    * density), LSH is data-independent. At 100 TB the assignment is one
    * pass, cells are the partitioning key, and the probe join touches
    * nProbe/k of the corpus.
    */
  def ivfTopK(emb: DataFrame, k: Int, nCells: Int = 16, nProbe: Int = 4)
      : DataFrame = {
    import org.apache.spark.ml.clustering.KMeans

    val spark = emb.sparkSession
    val withVec = emb.select(col("vec_id"), col("embedding"),
      org.apache.spark.ml.functions.array_to_vector(
        col("embedding").cast("array<double>")).as("features"))
    // 2 Lloyd iterations, random init (one sampling pass, not k-means||),
    // trained on a deterministic subsample: cell QUALITY barely moves
    // recall (the re-rank is exact), and in production the quantizer is
    // trained once offline and reused — the per-query fit exists only to
    // keep the declared query self-contained
    val trainSet = withVec.orderBy("vec_id").limit(32 * nCells)
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(2)
      .setInitMode("random")
      .fit(trainSet)
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))

    // centroid table (tiny): cell id + centroid as float array
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "centroid")

    // each query vector probes its nProbe nearest centroid cells
    val w = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell").asc)
    val probes = assigned.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))
      .join(broadcast(centroids))
      .withColumn("ccos", cosine(col("q_emb"), col("centroid")))
      .withColumn("crk", row_number().over(w))
      .filter(col("crk") <= nProbe)
      .select("q_id", "q_emb", "cell")

    // exact re-rank within probed cells; cosine before any exchange
    val cand = probes.join(assigned.select(col("cell"),
        col("vec_id").as("n_id"), col("embedding").as("n_emb")), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("n_emb")).as("cos"))
      .groupBy("q_id", "n_id").agg(max(col("cos")).as("cos"))
    val wk = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("n_id").asc)
    cand.withColumn("rk", row_number().over(wk).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "n_id", "rk")
  }

  val all: Seq[QueryDef] = Seq(
    // Exact cosine top-5 for the first 10 vectors. No oracle (fp cosine
    // ordering is not DuckDB-stable) → driver records rows-only.
    QueryDef("similarity_topk",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        bruteTopK(emb.filter(col("vec_id") < 10), emb, 5)
          .orderBy("q_id", "rk")
      },
      None),

    // LSH-bucketed ANN over the whole corpus — the 100 TB-shaped variant.
    QueryDef("ann_lsh",
      (s, d) => lshTopK(Tables(s, d, "embeddings"), 5).orderBy("q_id", "rk"),
      None),

    // IVF-bucketed ANN (k-means cells + probe). No oracle: fp/iterative.
    QueryDef("ann_ivf",
      (s, d) => ivfTopK(Tables(s, d, "embeddings"), 5).orderBy("q_id", "rk"),
      None)
  )
}
