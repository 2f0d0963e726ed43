package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The native vec_dot kernel: interpreted vs codegen agreement, null
  * handling, and mixed-type (double-literal) operands.
  */
class VecExpressionsSpec extends AnyFunSuite with SparkFixture {

  private def mkDf = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)),
      (3L, null, Seq(1.0f))
    ).toDF("id", "a", "b")
  }

  test("vec_dot computes the dot product (interpreted and codegen paths)") {
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val rows = mkDf.select(col("id"), VecFunctions.vecDot(col("a"), col("b")))
          .orderBy("id").collect()
        assert(rows(0).getDouble(1) == 32.0, s"mode=$codegen")
        assert(rows(1).getDouble(1) == 0.0)
        assert(rows(2).isNullAt(1), "null input must yield null")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("vec_dot of mismatched dimensions is null, not a truncated partial") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val r = df.select(VecFunctions.vecDot(col("a"), col("b"))).head()
        assert(r.isNullAt(0), s"mode=$codegen: ragged dims must yield null")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("word_shingles: distinct consecutive n-grams, codegen and interpreted") {
    import spark.implicits._
    val df = Seq(("a b c a b c d"), ("a b"), (null: String)).toDF("s")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val rows = df.select(VecFunctions.wordShingles(col("s"), 3)).collect()
        assert(rows(0).getSeq[String](0) ==
          Seq("a b c", "b c a", "c a b", "b c d"), s"mode=$codegen")
        assert(rows(1).getSeq[String](0).isEmpty, "short doc: no trigrams")
        assert(rows(2).isNullAt(0))
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("vec_top_cells ranks centroids by dot, desc, index tiebreak") {
    import spark.implicits._
    val cents = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(0.7f, 0.7f))
    val df = Seq(Seq(1.0f, 0.1f)).toDF("v")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val r = df.select(org.apache.spark.sql.graft.VecColumns
          .topCells(col("v"), cents, 3)).head().getSeq[Int](0)
        // dots: 1.0, 0.1, 0.77 → order 0, 2, 1
        assert(r == Seq(0, 2, 1), s"mode=$codegen")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("vec_top_cells tolerates NaN embeddings (deterministic, no crash)") {
    import spark.implicits._
    val cents = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val df = Seq(Seq(Float.NaN, 1.0f)).toDF("v")
    val r = df.select(org.apache.spark.sql.graft.VecColumns
      .topCells(col("v"), cents, 2)).head().getSeq[Int](0)
    assert(r == Seq(0, 1), s"NaN ranking must fall back to index order: $r")
  }

  test("vec_cosine of identical vectors is 1.0") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val c = df.select(VecFunctions.vecCosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("double-array literals implicit-cast into the float kernel") {
    import spark.implicits._
    val df = Seq(Seq(1.0f, 1.0f)).toDF("a")
    val v = df.select(
        VecFunctions.vecDot(col("a"), typedLit(Seq(2.0, 3.0))).as("d"))
      .head().getDouble(0)
    assert(v == 5.0)
  }

  test("kernels are callable from SQL text after registration") {
    import spark.implicits._
    VecFunctions.registerSql(spark)
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), "ab"))
      .toDF("a", "b", "s").createOrReplaceTempView("vec_sql_t")
    val r = spark.sql(
      "SELECT vec_dot(a, b) AS d, rolling_hash(s) AS h FROM vec_sql_t").head()
    assert(r.getDouble(0) == 11.0 && r.getLong(1) == 3105L)
    // the round-6 kernels: scalar quantized dot and the vector-sum AGGREGATE
    val r2 = spark.sql(
      "SELECT vec_dot_scaled(a, b, 10, 10) AS sd FROM vec_sql_t").head()
    assert(r2.getLong(0) == 10L * 30 + 20L * 40)
    val r3 = spark.sql(
      "SELECT vec_sum_scaled(a, 10) AS sv FROM vec_sql_t").head()
    assert(r3.getSeq[Long](0) == Seq(10L, 20L))
  }

  test("rolling_hash matches the reference fold (both execution paths)") {
    import spark.implicits._
    // h("ab") = ((0*31+97)%M*31+98)%M = 3105
    val df = Seq(("ab"), (""), (null: String)).toDF("s")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val rows = df.select(VecFunctions.rollingHash(col("s"))).collect()
        assert(rows(0).getLong(0) == 3105L, s"mode=$codegen")
        assert(rows(1).getLong(0) == 0L)
        assert(rows(2).isNullAt(0))
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("vec_sum_scaled agrees with the posexplode reference across partitions") {
    import spark.implicits._
    // 64 rows spread over 8 partitions exercises partial buffers + merge;
    // NULL rows are skipped, not zero-contributing
    val rows = (0 until 64).map(i =>
      (i % 3, Seq(i * 0.25f, -i * 0.5f, 1.0f / (i + 1)))) :+ (0, null)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8)).toDF("k", "v")
    val fast = df.groupBy("k")
      .agg(VecFunctions.vecSumScaled(col("v"), 1000000L).as("s"))
      .select(col("k"), posexplode(col("s")).as(Seq("pos", "s")))
    val ref = df.filter(col("v").isNotNull)
      .select(col("k"), posexplode(col("v")).as(Seq("pos", "e")))
      .groupBy("k", "pos")
      .agg(sum(floor(col("e").cast("double") * 1000000L).cast("long")).as("s"))
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("vec_sum_scaled: all-null group yields NULL; ragged input throws") {
    import spark.implicits._
    val allNull = Seq((1, null: Seq[Float])).toDF("k", "v")
      .groupBy("k").agg(VecFunctions.vecSumScaled(col("v"), 1000L).as("s"))
      .head()
    assert(allNull.isNullAt(1))
    val ragged = Seq((1, Seq(1.0f)), (1, Seq(1.0f, 2.0f))).toDF("k", "v")
      .groupBy("k").agg(VecFunctions.vecSumScaled(col("v"), 1000L).as("s"))
    val e = intercept[Exception] { ragged.collect() }
    assert(e.getMessage != null)
  }

  test("vec_dot_scaled: exact quantized products, floor semantics, both paths") {
    import spark.implicits._
    // floor(-1.5·10)·floor(2.5·10) + floor(0.25·10)·floor(4.0·10)
    //   = (-15)·25 + 2·40 = -295  — floor (not truncation) on negatives
    val df = Seq((Seq(-1.5f, 0.25f), Seq(2.5f, 4.0f))).toDF("a", "b")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val r = df.select(VecFunctions.vecDotScaled(col("a"), col("b"), 10L, 10L))
          .head()
        assert(r.getLong(0) == -295L, s"mode=$codegen: got ${r.getLong(0)}")
        // asymmetric scales: floor(x·10)·floor(y·1)
        val r2 = df.select(VecFunctions.vecDotScaled(col("a"), col("b"), 10L, 1L))
          .head()
        assert(r2.getLong(0) == (-15L * 2 + 2L * 4), s"mode=$codegen")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("vec_dot_scaled: ragged dims null; null input null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(1.0f)),
      (2L, null: Seq[Float], Seq(1.0f))
    ).toDF("id", "a", "b")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val rows = df.select(col("id"),
          VecFunctions.vecDotScaled(col("a"), col("b"), 10L, 10L))
          .orderBy("id").collect()
        assert(rows(0).isNullAt(1), s"mode=$codegen: ragged must be null")
        assert(rows(1).isNullAt(1), s"mode=$codegen: null input must be null")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("vec_dot_scaled: property — matches a BigInt reference on random vectors") {
    import spark.implicits._
    // randomized vectors (seeded), checked against an exact BigInt fold —
    // so the kernel's long arithmetic (floor on negatives included) can't
    // drift from the declared quantized-dot semantics the oracles replay
    val rnd = new scala.util.Random(1234)
    val S = 1000000L
    val cases = List.fill(40)(
      (Seq.fill(16)(rnd.nextFloat() * 2 - 1f),
        Seq.fill(16)(rnd.nextFloat() * 2 - 1f)))
    def ref(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) =>
        BigInt(math.floor(x.toDouble * S).toLong) *
          BigInt(math.floor(y.toDouble * S).toLong)
      }.sum.toLong
    val got = cases.toDF("a", "b")
      .select(VecFunctions.vecDotScaled(col("a"), col("b"), S, S))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => ref(a, b) },
      "kernel diverged from the BigInt reference")
  }

  test("vec_near_cells_scaled: integer-distance order, index tiebreak, both paths") {
    import spark.implicits._
    // quantized v = (10, 1); distances: c0=(10,0)→1, c1=(0,10)→181,
    // c2=(10,2)→1 (tie with c0 → lower index first), c3=(9,1)→1 (3-way tie)
    val cents = Array(Array(10L, 0L), Array(0L, 10L), Array(10L, 2L),
      Array(9L, 1L))
    val df = Seq(Seq(1.0f, 0.1f)).toDF("v")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val r = df.select(org.apache.spark.sql.graft.VecColumns
          .nearCellsScaled(col("v"), cents, 4, 10L)).head().getSeq[Int](0)
        assert(r == Seq(0, 2, 3, 1), s"mode=$codegen: got $r")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
