package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.ivm.{DeltaSources, Ivm}

/** The events.ts physical-encoding contract (round 8): the testdata has
  * shipped as both parquet TIMESTAMP(NANOS) — read as a raw INT64 via the
  * `nanosAsLong` legacy flag — and plain `timestamp[us]` (TIMESTAMP_NTZ).
  * [[Tables.tsUs]]/[[Tables.tsMicros]] and the registered events split
  * predicate must produce identical logical values on every encoding, so
  * a driver-side regeneration can never again take down the event-time
  * query family (the round-7 breakage). Synthetic frames pin the LEGACY
  * long path even while the on-disk data is µs, and vice versa.
  */
class TsEncodingSpec extends AnyFunSuite with SparkFixture {

  private val cutUs = 1706400000000000L // 2024-01-28T00:00:00 in epoch-µs

  // one row below the split cut, one at it, one above — all µs-exact
  private val usVals = Seq(cutUs - 1500000L, cutUs, cutUs + 2500000L)

  private def nsFrame = {
    import spark.implicits._
    usVals.map(_ * 1000L).toDF("ts") // INT64 epoch-nanos, the legacy read
  }
  private def ntzFrame = {
    import spark.implicits._
    usVals.map(u => java.time.LocalDateTime.ofEpochSecond(
        u / 1000000L, ((u % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)).toDF("ts") // TIMESTAMP_NTZ
  }
  private def ltzFrame = {
    import spark.implicits._
    usVals.map(_ * 1000L).toDF("ns")
      .select(timestamp_micros(expr("ns div 1000")).as("ts")) // TIMESTAMP
  }

  test("tsUs: identical epoch-µs longs from all three encodings") {
    assert(ntzFrame.schema("ts").dataType == TimestampNTZType)
    assert(ltzFrame.schema("ts").dataType == TimestampType)
    assert(nsFrame.schema("ts").dataType == LongType)
    for (f <- Seq(nsFrame, ntzFrame, ltzFrame)) {
      val got = f.select(Tables.tsUs(f).as("tus"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == usVals, s"encoding ${f.schema("ts").dataType}")
    }
  }

  test("tsMicros: TimestampType with the same µs value on all encodings") {
    for (f <- Seq(nsFrame, ntzFrame, ltzFrame)) {
      val out = f.select(Tables.tsMicros(f).as("tsm"))
      assert(out.schema("tsm").dataType == TimestampType,
        s"encoding ${f.schema("ts").dataType}")
      val got = out.select(unix_micros(col("tsm")))
        .collect().map(_.getLong(0)).toSeq
      assert(got == usVals, s"encoding ${f.schema("ts").dataType}")
    }
  }

  test("tsUsFor rejects an unexpected physical type with a clear message") {
    val e = intercept[IllegalStateException] {
      Tables.tsUsFor(org.apache.spark.sql.types.StringType)
    }
    assert(e.getMessage.contains("events.ts"))
  }

  test("events split predicate partitions BOTH encodings at the same cut") {
    // the SAME registered predicate text as the production events entry:
    // resolution must type-adapt (PosDeltaRule literal coercion rewrites
    // the timestamp literal to epoch-nanos against the legacy long column)
    val pred = "ts >= TIMESTAMP_NTZ '2024-01-28 00:00:00'"
    for ((f, tag) <- Seq((nsFrame, "ns_long"), (ntzFrame, "ntz"),
                         (ltzFrame, "ltz"))) {
      val view = s"events_enc_$tag"
      f.createOrReplaceTempView(view)
      DeltaSources.register(view, pred)
      val delta = Ivm.delta(spark.table(view)).count()
      val base = Ivm.baseOf(spark.table(view)).count()
      assert(delta == 2, s"$tag: rows at/after the cut are the delta")
      assert(base == 1, s"$tag: rows before the cut are the base")
    }
  }

  test("real events table: split is a partition and tsUs is µs-ranged") {
    val ev = Tables(spark, sfDir, "events")
    val full = ev.count()
    val delta = Ivm.delta(ev).count()
    val base = Ivm.baseOf(ev).count()
    assert(delta + base == full, "split must partition the scan")
    assert(delta > 0 && base > 0, "both snapshot arms must be non-empty")
    val Array(lo, hi) = ev.select(min(Tables.tsUs(ev)), max(Tables.tsUs(ev)))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    // Jan 2024 data, µs domain: epoch-µs of 2023..2025 brackets it; a ns
    // or ms mis-derivation is off by 10^3 either way and fails loudly
    assert(lo > 1672531200000000L && hi < 1735689600000000L,
      s"tsUs out of µs range: [$lo, $hi]")
  }
}
