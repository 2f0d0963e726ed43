package graft.sources

import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Property-style test for IN-set stats skipping: randomized member
  * sets against randomized file bounds, checked against a brute-force
  * linear reference. The property that matters is ONE-SIDED SOUNDNESS
  * — [[StatsSkip]] may keep a file it could prune (conservative) but
  * must NEVER prune a file containing a member (a wrong proof is
  * silent row loss the re-applied filter can never recover). For
  * sortable homogeneous sets the check is also EXACT (the binary
  * search equals the linear reference), which is what makes the
  * O(log) path trustworthy. Seeded PRNG keeps runs deterministic; no
  * SparkSession needed (pure driver logic).
  */
class InSetSkipPropSpec extends AnyFunSuite {

  import org.apache.spark.sql.graft.GraftSql.PredInSet

  private val Cases = 400

  private val longSchema = StructType(Seq(StructField("k", LongType)))
  private val strSchema = StructType(Seq(StructField("k", StringType)))
  private val dblSchema = StructType(Seq(StructField("k", DoubleType)))

  private def stats(mn: String, mx: String): Option[String] =
    Some(s"""{"minValues":{"k":${mn}},"maxValues":{"k":${mx}}}""")

  test("longs: exact vs the linear reference across randomized " +
      "sets and bounds (soundness AND minimality)") {
    val rnd = new scala.util.Random(20260816L)
    (1 to Cases).foreach { i =>
      val values = Vector.fill(rnd.nextInt(40))(
        (rnd.nextInt(2000) - 1000).toLong)
      val a = rnd.nextInt(2000) - 1000
      val b = rnd.nextInt(2000) - 1000
      val (mn, mx) = (math.min(a, b).toLong, math.max(a, b).toLong)
      val expected = values.exists(v => v >= mn && v <= mx)
      val got = StatsSkip.mayMatch(PredInSet("k", values), longSchema,
        Seq.empty, Map.empty, stats(mn.toString, mx.toString))
      assert(got == expected,
        s"case $i: values=$values bounds=[$mn,$mx] got=$got")
    }
  }

  test("strings: exact vs the code-point reference (the sort and the " +
      "bounds comparator must agree)") {
    val rnd = new scala.util.Random(7L)
    def randStr(): String =
      // include a supplementary char to exercise the code-point order
      List.fill(1 + rnd.nextInt(3))(
        List("a", "b", "z", "😀", "m")(rnd.nextInt(5)))
        .mkString
    def cp(x: String, y: String): Int =
      StatsSkip.compareCodePoints(x, y)
    (1 to Cases).foreach { i =>
      val values = Vector.fill(rnd.nextInt(20))(randStr())
      val x = randStr(); val y = randStr()
      val (mn, mx) = if (cp(x, y) <= 0) (x, y) else (y, x)
      val expected = values.exists(v => cp(v, mn) >= 0 && cp(v, mx) <= 0)
      val got = StatsSkip.mayMatch(
        PredInSet("k", values), strSchema, Seq.empty, Map.empty,
        Some(s"""{"minValues":{"k":${json(mn)}},""" +
          s""""maxValues":{"k":${json(mx)}}}"""))
      assert(got == expected,
        s"case $i: values=$values bounds=[$mn,$mx] got=$got")
    }
  }

  test("doubles: sound under the float-widening stat envelope (never " +
      "prunes a file whose widened bounds admit a member)") {
    val rnd = new scala.util.Random(99L)
    (1 to Cases).foreach { i =>
      val values = Vector.fill(rnd.nextInt(30))(
        math.floor(rnd.nextDouble() * 200 - 100) / 4.0)
      val a = math.floor(rnd.nextDouble() * 200 - 100) / 4.0
      val b = math.floor(rnd.nextDouble() * 200 - 100) / 4.0
      val (mn, mx) = (math.min(a, b), math.max(a, b))
      // the envelope can only WIDEN [mn,mx], so matching the raw
      // bounds is sufficient evidence the file must be kept
      val mustKeep = values.exists(v => v >= mn && v <= mx)
      val got = StatsSkip.mayMatch(PredInSet("k", values), dblSchema,
        Seq.empty, Map.empty, stats(mn.toString, mx.toString))
      assert(!mustKeep || got,
        s"case $i PRUNED A MATCHING FILE: values=$values " +
          s"bounds=[$mn,$mx]")
    }
  }

  test("partition-column membership: exact equality against the log " +
      "value across randomized sets") {
    val rnd = new scala.util.Random(4242L)
    (1 to Cases).foreach { i =>
      val values = Vector.fill(rnd.nextInt(25))(
        rnd.nextInt(50).toLong)
      val pv = rnd.nextInt(50).toLong
      val expected = values.contains(pv)
      val got = StatsSkip.mayMatch(PredInSet("k", values), longSchema,
        Seq("k"), Map("k" -> pv.toString), None)
      assert(got == expected,
        s"case $i: values=$values pv=$pv got=$got")
    }
  }

  test("mixed-type member lists never throw and stay sound") {
    val rnd = new scala.util.Random(1717L)
    (1 to Cases).foreach { i =>
      val values: Vector[Any] = Vector.fill(1 + rnd.nextInt(10))(
        rnd.nextInt(4) match {
          case 0 => rnd.nextInt(100).toLong
          case 1 => java.math.BigDecimal.valueOf(rnd.nextInt(100))
          case 2 => rnd.nextInt(100)
          case _ => rnd.nextInt(100).toDouble
        })
      val (mn, mx) = (rnd.nextInt(50).toLong, (50 + rnd.nextInt(50)).toLong)
      // reference on the NUMERIC value of every member
      val mustKeep = values.exists { v =>
        val d = new java.math.BigDecimal(v.toString)
        d.compareTo(java.math.BigDecimal.valueOf(mn)) >= 0 &&
          d.compareTo(java.math.BigDecimal.valueOf(mx)) <= 0
      }
      val got = StatsSkip.mayMatch(PredInSet("k", values), longSchema,
        Seq.empty, Map.empty, stats(mn.toString, mx.toString))
      assert(!mustKeep || got,
        s"case $i PRUNED A MATCHING FILE: values=$values " +
          s"bounds=[$mn,$mx]")
    }
  }

  test("cross-class members (string renderings on a LONG column) are " +
      "EXACT vs the numeric reference — the sorted fast path must " +
      "disable itself, never search a misordered vector (r16 advice)") {
    val rnd = new scala.util.Random(20260817L)
    (1 to Cases).foreach { i =>
      // numeric values rendered as STRINGS: they sort code-point
      // (["10","9"]) but compare numerically under LongType — the
      // exact class/dt disagreement the soundness guard exists for
      val nums = Vector.fill(rnd.nextInt(30))(
        (rnd.nextInt(2000) - 1000).toLong)
      val values: Vector[Any] = nums.map(_.toString)
      val a = rnd.nextInt(2000) - 1000
      val b = rnd.nextInt(2000) - 1000
      val (mn, mx) = (math.min(a, b).toLong, math.max(a, b).toLong)
      val expected = nums.exists(v => v >= mn && v <= mx)
      val got = StatsSkip.mayMatch(PredInSet("k", values), longSchema,
        Seq.empty, Map.empty, stats(mn.toString, mx.toString))
      assert(got == expected,
        s"case $i: values=$values bounds=[$mn,$mx] got=$got")
      // partition-value equality under the same mismatch
      val pv = (rnd.nextInt(2000) - 1000).toLong
      val pGot = StatsSkip.mayMatch(PredInSet("k", values), longSchema,
        Seq("k"), Map("k" -> pv.toString), None)
      assert(pGot == nums.contains(pv),
        s"case $i: values=$values pv=$pv got=$pGot")
    }
  }

  private def json(s: String): String =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(s)
}
