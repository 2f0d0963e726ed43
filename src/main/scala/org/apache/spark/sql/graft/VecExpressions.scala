package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native float-vector dot product as a codegen'd Catalyst expression.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express a dot
  * product declaratively but are CodegenFallback: every row pays lambda-
  * variable binding and an intermediate array allocation, and the enclosing
  * operator drops out of whole-stage codegen. For the similarity/ANN path —
  * O(|pairs| × dim) dot products in the hot loop — a fused loop over the
  * underlying `ArrayData` keeps the whole stage codegen'd. This is the one
  * place the engine needs a custom `Expression`; everything else uses
  * built-ins (extension-preference order per the builder brief).
  *
  * Lives in the `org.apache.spark.sql` namespace because the expression API
  * surface it extends (`AbstractDataType`, `ExpressionUtils`) is
  * `private[sql]` — the standard shim idiom, see [[GraftSql]].
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  // NOT nullIntolerant: the mismatch case below returns null for non-null
  // inputs, so optimizer rules must not assume null-in ⇔ null-out
  override def nullIntolerant: Boolean = false
  override def prettyName: String = "vec_dot"

  // mismatched dimensions yield NULL, never a silently truncated partial
  // dot product (a ragged embedding would otherwise skew ann/neardup
  // rankings undetectably)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Integer-quantized dot product: Σ floor(aᵢ·scaleA) · floor(bᵢ·scaleB),
  * accumulated in exact 64-bit integer arithmetic, as LONG.
  *
  * The determinism kernel behind the oracle-checkable ANN family. A double
  * cosine is fp-order-dependent and DuckDB floors a different last bit, so
  * ranking queries built on it can only ever be rows-only checked. Quantizing
  * each component to a scaled long FIRST makes the whole score integer: the
  * sum is exact and associative, Spark and DuckDB (`SUM(floor(x·S)·floor(y·S))`
  * over zipped unnests) compute bit-identical values, and top-k becomes a
  * total integer order (score desc, id asc). For unit-norm embeddings at
  * scale 1e6 the quantized score differs from the true cosine by < dim·1e-6
  * — far below any meaningful similarity resolution, and the recall specs
  * keep pinning the float path.
  *
  * Overflow bounds: |floor(x·S)| ≤ S·max|x|; the product sum needs
  * dim·(S·max|x|)·(S'·max|y|) < 2⁶³ — at S=S'=1e6, dim=64, |x|≤1 the worst
  * case is 6.4e13, five orders under the limit. Mismatched dims → NULL
  * (same contract as [[FloatVecDot]]).
  */
case class FloatVecDotScaled(
    left: Expression, right: Expression, scaleLeft: Long, scaleRight: Long)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_scaled"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(x.getFloat(i).toDouble * scaleLeft).toLong *
        math.floor(y.getFloat(i).toDouble * scaleRight).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (long) Math.floor(((double) $a.getFloat($i)) * ${scaleLeft}L)
         |        * (long) Math.floor(((double) $b.getFloat($i)) * ${scaleRight}L);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDotScaled =
    copy(left = newLeft, right = newRight)
}

/** Karp–Rabin polynomial rolling hash over a string's UTF-8 bytes:
  * `h = Σ bᵢ·mult^(n-1-i) mod modulus`, folded left-to-right as
  * `h = (h·mult + bᵢ) mod modulus`.
  *
  * The classic streaming document fingerprint — cheaper than a
  * cryptographic digest and windowable for chunk-level fingerprints. A
  * native codegen'd loop for the same reason as [[FloatVecDot]]: the
  * `aggregate(split(text,''))` HOF form is interpreted per character.
  * Parameters are fixed (mult 31, modulus 1e9+7) so the DuckDB oracle can
  * replay the fold exactly in 64-bit integer arithmetic.
  */
case class RollingHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * RollingHash.Mult + (bytes(i) & 0xff)) % RollingHash.Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Mult = 31L
  val Mod = 1000000007L

  /** Called from generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Mult + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }
}

/** Distinct consecutive word n-grams ("shingles") of a space-separated
  * string, as one `array<string>` per row.
  *
  * The relational form (posexplode + windowed `lead` + concat + distinct)
  * computes the same set but pays a hash-shuffle + sort of EVERY TOKEN ROW
  * of the corpus — at 100 TB that token exchange is the dedup pipeline's
  * bottleneck, for an operation that is per-document local. This kernel
  * generates the shingle set inside the scan's codegen stage; the only
  * exchange left in the dedup path is the per-document aggregation of
  * 16-byte digests. Tokenization matches `split(text, ' ')` / DuckDB
  * `string_split` exactly (single-space split, empty tokens kept) so the
  * oracle CTE replays it; the per-document distinct lives here too
  * (first-occurrence order, deterministic).
  */
case class WordShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Called from generated code. */
  def shingle(s: UTF8String, n: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/** Indices of the `k` centroids with the highest dot product against the
  * row's embedding, as `array<int>` (dot desc, index asc tiebreak).
  *
  * The IVF quantizer's inner loop: with unit-normalized centroids the dot
  * ranking IS the cosine ranking, so `k = 1` is cell assignment and
  * `k = nProbe` is probe selection — both pure codegen over a centroid
  * matrix shipped once per task as a reference object (the
  * `ctx.addReferenceObj` mechanism Spark itself uses for literals too large
  * to inline). This replaces an MLlib `model.transform` prediction UDF,
  * which at 100 TB would glue a black-box non-codegen UDF into every
  * corpus scan.
  */
case class VecTopCells(child: Expression, centroids: Array[Array[Float]], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  require(k >= 1 && centroids.nonEmpty, "need k >= 1 and at least one centroid")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_top_cells"

  override def nullSafeEval(input: Any): Any =
    VecTopCells.topCells(input.asInstanceOf[ArrayData], centroids, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.VecTopCells.topCells($c, $ref, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): VecTopCells =
    copy(child = newChild)
}

object VecTopCells {
  /** Called from generated code. */
  def topCells(v: ArrayData, cents: Array[Array[Float]], k: Int): ArrayData = {
    val n = cents.length
    val dots = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cent = cents(c)
      val d = math.min(v.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < d) { s += v.getFloat(i).toDouble * cent(i); i += 1 }
      dots(c) = s
      c += 1
    }
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < kk) {
      // `best == -1` seeds with the first untaken index, so NaN dots (a
      // NaN element in a dirty embedding makes every product NaN, and
      // NaN > x is always false) rank deterministically last instead of
      // leaving best at -1 and crashing the stage
      var best = -1
      var bestDot = Double.NegativeInfinity
      var j = 0
      while (j < n) {
        if (!taken(j) && (best == -1 || dots(j) > bestDot)) {
          best = j; bestDot = dots(j)
        }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Indices of the `k` centroids NEAREST to the row's embedding under
  * integer-quantized squared euclidean distance:
  * `d(v,c) = Σ (floor(vᵢ·scale) − cᵢ)²` with `cᵢ` already-scaled longs
  * (distance asc, index asc tiebreak), as `array<int>`.
  *
  * The exact-arithmetic twin of [[VecTopCells]]: where that kernel ranks by
  * double dot products (fine for the float IVF path, not oracle-stable),
  * this one is pure int64, so cell assignment (`k = 1`) and probe selection
  * (`k = nProbe`) are bit-reproducible in DuckDB as a
  * `row_number() OVER (ORDER BY d2, cell)` over a summed quantized-diff
  * join. Overflow: dim·(2·S·max|x|)² < 2⁶³ — at S=1e6, dim=64, |x|≤1 the
  * worst case is 2.6e14. Centroid matrix ships once per task via
  * `addReferenceObj`, same as [[VecTopCells]].
  */
case class VecNearCellsScaled(
    child: Expression, centroids: Array[Array[Long]], k: Int, scale: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  require(k >= 1 && centroids.nonEmpty, "need k >= 1 and at least one centroid")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_near_cells_scaled"

  override def nullSafeEval(input: Any): Any =
    VecNearCellsScaled.nearCells(
      input.asInstanceOf[ArrayData], centroids, k, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qcentroids", centroids, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.VecNearCellsScaled.nearCells($c, $ref, $k, ${scale}L)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): VecNearCellsScaled =
    copy(child = newChild)
}

object VecNearCellsScaled {
  /** Called from generated code. */
  def nearCells(v: ArrayData, cents: Array[Array[Long]], k: Int, scale: Long)
      : ArrayData = {
    val dim = v.numElements()
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      q(i) = math.floor(v.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    val n = cents.length
    val dists = new Array[Long](n)
    var c = 0
    while (c < n) {
      val cent = cents(c)
      val d = math.min(dim, cent.length)
      var s = 0L
      var j = 0
      while (j < d) { val t = q(j) - cent(j); s += t * t; j += 1 }
      dists(c) = s
      c += 1
    }
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < kk) {
      // strict `<` with ascending j ⇒ lowest index wins ties — the same
      // total order as the oracle's ORDER BY d2, cell
      var best = -1
      var bestD = Long.MaxValue
      var j = 0
      while (j < n) {
        if (!taken(j) && (best == -1 || dists(j) < bestD)) {
          best = j; bestD = dists(j)
        }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-level constructors for the native kernels (Expression → Column
  * wrapping needs `private[sql]` ExpressionUtils, hence here; the public
  * user-facing API is `graft.functions.VecFunctions`).
  */
/** Fixed-size elementwise vector-sum aggregate over integer-SCALED float
  * components: each input array contributes `floor(x * scale)` per
  * position, accumulated into one `Array[Long]` buffer of the embedding
  * dimension.
  *
  * Why this shape at 100 TB: summing embeddings per group with
  * posexplode + groupBy(key, pos) shuffles |corpus| × dim rows — a dim×
  * amplification of the exchange. A TypedImperativeAggregate gets Spark's
  * PARTIAL aggregation for free, so each map task combines its rows into
  * one dim-sized long buffer and the shuffle carries |groups| × dim longs.
  * Integer scaling makes the sum EXACT and associative — merge order across
  * partitions cannot change the result (a double sum would be fp-order-
  * dependent, and therefore nondeterministic under shuffle), which also
  * makes the derived centroid oracle-checkable bit-for-bit.
  *
  * Mismatched dimensions throw (a ragged embedding corrupting a centroid
  * silently is worse than a failed job); NULL arrays are skipped.
  */
case class VecSumScaled(
    child: Expression,
    scale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum_scaled"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.length == 0) new Array[Long](n) else buf
    if (acc.length != n)
      throw new IllegalArgumentException(
        s"vec_sum_scaled: ragged input — expected dim ${acc.length}, got $n")
    var i = 0
    while (i < n) {
      acc(i) += math.floor(arr.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vec_sum_scaled: ragged partials — dims ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumScaled =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumScaled =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VecSumScaled =
    copy(child = c)
}

object VecColumns {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def rollingHash(s: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(s)))

  def wordShingles(s: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(s), n))

  def topCells(v: Column, centroids: Array[Array[Float]], k: Int): Column =
    ExpressionUtils.column(
      VecTopCells(ExpressionUtils.expression(v), centroids, k))

  def vecDotScaled(a: Column, b: Column, scaleA: Long, scaleB: Long): Column =
    ExpressionUtils.column(
      FloatVecDotScaled(ExpressionUtils.expression(a),
        ExpressionUtils.expression(b), scaleA, scaleB))

  def nearCellsScaled(v: Column, centroids: Array[Array[Long]], k: Int,
      scale: Long): Column =
    ExpressionUtils.column(
      VecNearCellsScaled(ExpressionUtils.expression(v), centroids, k, scale))

  def vecSumScaled(v: Column, scale: Long): Column =
    ExpressionUtils.column(
      VecSumScaled(ExpressionUtils.expression(v), scale)
        .toAggregateExpression())

  /** Register the native kernels in the session's function registry so SQL
    * text can call them: `SELECT vec_dot(a, b)`, `rolling_hash(s)`.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs(0),
        exprs(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"word_shingles(text, n): n must be an integer literal, got $other")
        }), "scala_udf")
    def longLit(e: Expression, fn: String): Long = e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$fn: scale must be an integer literal, got $other")
    }
    reg.createOrReplaceTempFunction("vec_dot_scaled",
      exprs => FloatVecDotScaled(exprs(0), exprs(1),
        longLit(exprs(2), "vec_dot_scaled"),
        longLit(exprs(3), "vec_dot_scaled")), "scala_udf")
    reg.createOrReplaceTempFunction("vec_sum_scaled",
      exprs => VecSumScaled(exprs(0),
        longLit(exprs(1), "vec_sum_scaled")).toAggregateExpression(),
      "scala_udf")
  }
}
