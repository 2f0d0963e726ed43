package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Schema-drift canary (round 8): the driver regenerates the testdata
  * between rounds, and a silent physical-type change costs a round of red
  * (round 7: `events.ts` flipped TIMESTAMP(NANOS) → `timestamp[us]` and 11
  * queries threw with no artifact diagnosis). This spec reads every table
  * and asserts the engine's EXPECTED post-normalization logical types —
  * one obvious failure naming the drifted column, instead of eleven
  * downstream stack traces. Columns with a type-adaptive consumer
  * ([[Tables.tsUs]], the split predicates) accept every encoding the
  * adapter handles; everything else is pinned exactly.
  */
class SchemaCanarySpec extends AnyFunSuite with SparkFixture {

  /** expected types per column: a set = every encoding the engine adapts
    * to; missing column or foreign type fails with the observed schema */
  private val expected: Map[String, Map[String, Set[DataType]]] = {
    val ts: Set[DataType] = Set(TimestampNTZType, TimestampType, LongType)
    Map(
      "region" -> Map("r_regionkey" -> Set(IntegerType),
        "r_name" -> Set(StringType)),
      "nation" -> Map("n_nationkey" -> Set(IntegerType),
        "n_name" -> Set(StringType), "n_regionkey" -> Set(IntegerType)),
      "customer" -> Map("c_custkey" -> Set(LongType),
        "c_name" -> Set(StringType), "c_nationkey" -> Set(IntegerType),
        "c_acctbal" -> Set(DoubleType), "c_mktsegment" -> Set(StringType)),
      "supplier" -> Map("s_suppkey" -> Set(LongType),
        "s_name" -> Set(StringType), "s_nationkey" -> Set(IntegerType),
        "s_acctbal" -> Set(DoubleType)),
      "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
        "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
        "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
      "orders" -> Map("o_orderkey" -> Set(LongType),
        "o_custkey" -> Set(LongType), "o_orderstatus" -> Set(StringType),
        "o_totalprice" -> Set(DoubleType),
        "o_orderdate" -> (ts + DateType),
        "o_orderpriority" -> Set(StringType)),
      "lineitem" -> Map("l_orderkey" -> Set(LongType),
        "l_partkey" -> Set(LongType), "l_suppkey" -> Set(LongType),
        "l_linenumber" -> Set(IntegerType), "l_quantity" -> Set(DoubleType),
        "l_extendedprice" -> Set(DoubleType), "l_discount" -> Set(DoubleType),
        "l_tax" -> Set(DoubleType), "l_returnflag" -> Set(StringType),
        "l_linestatus" -> Set(StringType), "l_shipdate" -> (ts + DateType)),
      "events" -> Map("event_id" -> Set(LongType), "ts" -> ts,
        "user_id" -> Set(LongType), "event_type" -> Set(StringType),
        "value" -> Set(DoubleType), "props" -> Set(StringType)),
      "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
        "lang" -> Set(StringType), "source" -> Set(StringType),
        "n_chars" -> Set(LongType)),
      "embeddings" -> Map("vec_id" -> Set(LongType),
        "embedding" -> Set(ArrayType(FloatType, containsNull = true),
          ArrayType(FloatType, containsNull = false)),
        "label" -> Set(IntegerType)))
  }

  /** Returns the drift complaints for one table frame — extracted so the
    * canary's own failure mode is testable on synthetic drift. */
  private def drifts(table: String, df: DataFrame): Seq[String] = {
    val want = expected(table)
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    val missing = (want.keySet -- have.keySet).toSeq.sorted
      .map(c => s"$table.$c: MISSING (observed schema: ${df.schema.simpleString})")
    val drifted = want.toSeq.sortBy(_._1).collect {
      case (c, ok) if have.contains(c) && !ok.contains(have(c)) =>
        s"$table.$c: observed ${have(c).simpleString}, engine adapts to " +
          s"{${ok.map(_.simpleString).mkString(", ")}} " +
          s"(observed schema: ${df.schema.simpleString})"
    }
    missing ++ drifted
  }

  for (t <- Tables.names) {
    test(s"testdata schema canary: $t") {
      val complaints = drifts(t, Tables(spark, sfDir, t))
      assert(complaints.isEmpty, complaints.mkString("; "))
    }
  }

  test("canary names the drifted column on synthetic drift") {
    import spark.implicits._
    // events with ts as STRING — an encoding no adapter handles
    val bad = Seq((1L, "2024-01-01", 2L, "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val c = drifts("events", bad)
    assert(c.nonEmpty && c.head.contains("events.ts") &&
      c.head.contains("string"), c.mkString("; "))
    val gone = drifts("events", bad.drop("user_id"))
    assert(gone.exists(_.contains("events.user_id: MISSING")), gone)
  }
}
