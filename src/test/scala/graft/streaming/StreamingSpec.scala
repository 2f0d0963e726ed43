package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.streaming.Event

/** Structured-Streaming surface: windowed counts, stateful sessionization,
  * and the streaming IVM loop, all driven through MemoryStream micro-batches.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("hourlyCounts: tumbling-window counts over a watermarked stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.hourlyCounts(
        in.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      in.addData((ts(5), "click", 1.0), (ts(10), "click", 2.0),
        (ts(20), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("event_type", "cnt", "sum_value")
        .orderBy("event_type").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("hourlyCounts: events older than the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.hourlyCounts(
        in.toDF().toDF("ts", "event_type", "value"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      in.addData((ts(30), "click", 1.0))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 window + watermark
      in.addData((Timestamp.valueOf("2024-01-01 12:00:00"), "click", 1.0))
      q.processAllAvailable()
      // this event is hours behind the watermark → must be dropped
      in.addData((ts(31), "click", 99.0))
      q.processAllAvailable()
      val rows = spark.table("late").collect()
      val hour10 = rows.filter(_.getTimestamp(0) ==
        Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(hour10.length == 1 && hour10.head.getLong(2) == 1L,
        s"late event leaked into a closed window: ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("sessionize: gap-based sessions close via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS(), gapMs = 5 * 60 * 1000,
        watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 2min apart (one session), then 20min silence
      in.addData(Event(ts(0), 1L, "click", 1.0), Event(ts(2), 1L, "view", 2.0))
      q.processAllAvailable()
      // advance the watermark far past user 1's gap so the timeout fires
      in.addData(Event(ts(40), 2L, "click", 7.0))
      q.processAllAvailable()
      in.addData(Event(ts(59), 3L, "click", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .select("userId", "nEvents", "totalValue").orderBy("userId").collect()
      assert(sessions.nonEmpty, "no session closed")
      val u1 = sessions.find(_.getLong(0) == 1L)
      assert(u1.isDefined, s"user 1 session missing: ${sessions.mkString}")
      assert(u1.get.getLong(1) == 2L && u1.get.getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("dedupWithinWatermark: duplicate content emits once, state is bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.dedupWithinWatermark(
        in.toDF().toDF("ts", "doc_id", "text"), keyCols = Seq("text"),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      // same-batch duplicate (doc 3) and cross-batch duplicate (doc 4)
      in.addData((ts(5), 1L, "the quick brown fox"),
        (ts(6), 2L, "a different document"),
        (ts(7), 3L, "the quick brown fox"))
      q.processAllAvailable()
      in.addData((ts(9), 4L, "the quick brown fox"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L),
        s"duplicates leaked or originals dropped: $ids")
    } finally q.stop()
  }

  test("stream-stream join: purchases correlate with clicks within bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val buys = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.correlate(
        clicks.toDF().toDF("ts", "user_id", "event_type"),
        buys.toDF().toDF("ts", "user_id", "event_type"),
        withinSeconds = 10 * 60)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      clicks.addData((ts(0), 1L, "click"), (ts(45), 1L, "click"),
        (ts(0), 2L, "click"))
      buys.addData((ts(5), 1L, "purchase")) // 5 min after user 1's click
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("l_user", "l_type", "r_type").collect()
      assert(rows.length == 1, s"expected one attribution: ${rows.mkString}")
      assert(rows.head.getLong(0) == 1L)
    } finally q.stop()
  }

  test("asofMatch: streaming as-of finalizes after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[AsofIn]
    val q = EventStreams.asofMatch(in.toDS(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    try {
      // out-of-order arrival: the 10:05 purchase lands AFTER the 10:10
      // click; matches must still be correct because nothing finalizes
      // until the watermark passes the click
      in.addData(
        AsofIn(1L, ts(10), isLeft = true, 1000L, 0.0),   // click c1 @10:10
        AsofIn(1L, ts(15), isLeft = false, 101L, 2.0))   // purchase @10:15
      q.processAllAvailable()
      in.addData(
        AsofIn(1L, ts(5), isLeft = false, 100L, 1.0),    // purchase @10:05 (late)
        AsofIn(1L, ts(20), isLeft = true, 1001L, 0.0),   // click c2 @10:20
        AsofIn(1L, ts(2), isLeft = true, 1002L, 0.0))    // click c0 @10:02
      q.processAllAvailable()
      assert(spark.table("asof").isEmpty,
        "matches emitted before the watermark finalized them")
      // push the watermark past every click (12:00 − 30min = 11:30)
      in.addData(AsofIn(99L, Timestamp.valueOf("2024-01-01 12:00:00"),
        isLeft = false, 9L, 0.0))
      q.processAllAvailable()
      val got = spark.table("asof")
        .select("clickId", "matchId", "matchValue")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got == Set(
        (1000L, Some(100L), Some(1.0)),   // c1 @10:10 → purchase @10:05
        (1001L, Some(101L), Some(2.0)),   // c2 @10:20 → purchase @10:15
        (1002L, None, None)),             // c0 @10:02 → nothing precedes
        s"wrong as-of matches: $got")
    } finally q.stop()
  }

  test("asofMatch: buffered right rows survive a probe-finalizing timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[AsofIn]
    val q = EventStreams.asofMatch(in.toDS(), watermark = "30 minutes",
        retentionMs = 24L * 3600 * 1000)
      .writeStream.format("memory").queryName("asof_keep")
      .outputMode("append").start()
    try {
      // click + a purchase ABOVE the eventual watermark
      in.addData(
        AsofIn(1L, ts(0), isLeft = true, 1L, 0.0),
        AsofIn(1L, Timestamp.valueOf("2024-01-01 11:10:00"),
          isLeft = false, 500L, 9.0))
      q.processAllAvailable()
      // advance the watermark past the click (11:00) but below the
      // purchase — the click finalizes (no match), and the purchase must
      // STAY buffered for future probes
      in.addData(AsofIn(2L, Timestamp.valueOf("2024-01-01 11:30:00"),
        isLeft = false, 9L, 0.0))
      q.processAllAvailable()
      // a later click must still find the buffered 11:10 purchase
      in.addData(AsofIn(1L, Timestamp.valueOf("2024-01-01 11:40:00"),
        isLeft = true, 2L, 0.0))
      q.processAllAvailable()
      in.addData(AsofIn(3L, Timestamp.valueOf("2024-01-01 13:00:00"),
        isLeft = false, 10L, 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_keep")
        .select("clickId", "matchId").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got == Set((1L, None), (2L, Some(500L))),
        s"buffered purchase was evicted: $got")
    } finally q.stop()
  }

  test("file-stream source: windowed counts over parquet files arriving") {
    import spark.implicits._
    val dir = Files.createTempDirectory("file_stream").toString
    val in = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(in))

    def writeBatch(name: String, rows: Seq[(Timestamp, String, Double)]): Unit =
      rows.toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)

    writeBatch("b1", Seq((ts(5), "click", 1.0), (ts(10), "view", 2.0)))
    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .parquet(in)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("filehourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      writeBatch("b2", Seq((ts(20), "click", 3.0)))
      q.processAllAvailable()
      val clicks = spark.table("filehourly")
        .filter(col("event_type") === "click").collect()
      assert(clicks.length == 1 && clicks.head.getAs[Long]("cnt") == 2L,
        s"expected 2 clicks in one window: ${clicks.mkString(", ")}")
    } finally q.stop()
  }

  test("streaming IVM: maintained view equals full recompute after N batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dir = Files.createTempDirectory("ivm_stream").toString
    val basePath = s"$dir/base"
    val sinkPath = s"$dir/sink"

    // envelope-limited query: filter + projection over the streamed table
    val view = new IncrementalView(spark, "sev", "event_id",
      df => df.filter(col("value") > 0.5).select("event_id", "value"),
      sinkPath)

    val in = MemoryStream[(Long, Double)]
    val accumulate: DataFrame => DataFrame = { batch =>
      batch.toDF("event_id", "value").write.mode("append").parquet(basePath)
      spark.read.parquet(basePath)
    }
    val q = IvmStream.maintain(view, in.toDF(), accumulate).start()
    try {
      in.addData((1L, 0.9), (2L, 0.1), (3L, 0.7))
      q.processAllAvailable()
      in.addData((4L, 0.2), (5L, 0.8))
      q.processAllAvailable()
      in.addData((6L, 0.95))
      q.processAllAvailable()

      val maintained = view.result.orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val recomputed = spark.read.parquet(basePath)
        .filter(col("value") > 0.5).select("event_id", "value")
        .orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(maintained == recomputed,
        s"maintained=$maintained recomputed=$recomputed")
      assert(maintained == Seq((1L, 0.9), (3L, 0.7), (5L, 0.8), (6L, 0.95)))
    } finally q.stop()
  }

  test("signed view: left-join view survives retractions over append cycles") {
    import spark.implicits._
    val dir = Files.createTempDirectory("signed_view").toString
    def writeL(rows: Seq[(Long, String)]): Unit =
      rows.toDF("k", "av").write.mode("append").parquet(s"$dir/l")
    def writeR(rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("rid", "k2", "bv").write.mode("append").parquet(s"$dir/r")
    def l() = spark.read.parquet(s"$dir/l")
    def r() = spark.read.parquet(s"$dir/r")

    val view = new IncrementalSignedView(spark,
      "svl", "k", "svr", "rid", "left",
      col("k") === col("k2"), s"$dir/sink")
    def checkAgainstRecompute(): Unit = {
      val full = l().join(r(), col("k") === col("k2"), "left")
      assert(view.result.exceptAll(full).isEmpty &&
        full.exceptAll(view.result).isEmpty,
        "signed view diverged from the full recompute")
    }

    // cycle 0: initial load — rows 1..3, only row 2 matched
    writeL(Seq((1L, "a1"), (2L, "a2"), (3L, "a3")))
    writeR(Seq((100L, 2L, 10L)))
    view.update(l(), r())
    checkAgainstRecompute()
    assert(view.result.count() == 3)

    // cycle 1: new right row matches OLD matchless row 3 — its
    // null-extended form must be RETRACTED, not duplicated alongside
    writeL(Seq((4L, "a4")))
    writeR(Seq((101L, 3L, 20L)))
    view.update(l(), r())
    checkAgainstRecompute()
    val row3 = view.result.filter(col("k") === 3L).collect()
    assert(row3.length == 1 && !row3.head.isNullAt(3),
      s"retraction failed: ${row3.mkString(",")}")

    // cycle 2: second match for an already-matched row (pure insert)
    writeR(Seq((102L, 2L, 30L)))
    view.update(l(), r())
    checkAgainstRecompute()
    assert(view.result.filter(col("k") === 2L).count() == 2)
  }

  test("key-scoped view: windowed view maintained across append cycles") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dir = Files.createTempDirectory("ks_view").toString
    def write(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user", "eid", "v").write.mode("append").parquet(s"$dir/ev")
    def ev() = spark.read.parquet(s"$dir/ev")
    val q = (df: DataFrame) => {
      val w = Window.partitionBy("user").orderBy("eid")
      df.select(col("user"), col("eid"),
        sum(col("v")).over(w).as("running"))
    }
    val view = new IncrementalKeyScopedView(spark,
      "ksv", "eid", q, Seq("user"), s"$dir/sink")
    def checkAgainstRecompute(): Unit = {
      val full = q(ev())
      assert(view.result.exceptAll(full).isEmpty &&
        full.exceptAll(view.result).isEmpty,
        "key-scoped view diverged from the full recompute")
    }

    // cycle 0: initial load, two users
    write(Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 3.0)))
    view.update(ev())
    checkAgainstRecompute()
    assert(view.result.count() == 3)

    // cycle 1: new events for user 1 only — user 1's running sums extend,
    // user 2's rows must carry through UNTOUCHED (no recompute of its key)
    write(Seq((1L, 4L, 10.0)))
    view.update(ev())
    checkAgainstRecompute()
    assert(view.result.filter(col("user") === 1L).count() == 3)

    // cycle 2: a new user appears — delta-only key partition
    write(Seq((3L, 5L, 5.0)))
    view.update(ev())
    checkAgainstRecompute()
    assert(view.result.filter(col("user") === 3L)
      .collect().map(_.getDouble(2)).toSeq == Seq(5.0))
  }

  test("streaming aggregate IVM: maintained rollup equals full recompute") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dir = Files.createTempDirectory("ivm_agg_stream").toString
    val basePath = s"$dir/base"

    val aggQ = (df: DataFrame) => df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        max(col("v")).as("max_v"))
    val view = new IncrementalAggView(spark, "sav", "event_id", aggQ,
      s"$dir/sink")

    val in = MemoryStream[(Long, String, Long)]
    val accumulate: DataFrame => DataFrame = { batch =>
      batch.toDF("event_id", "k", "v").write.mode("append").parquet(basePath)
      spark.read.parquet(basePath)
    }
    val q = IvmStream.maintain(view, in.toDF(), accumulate).start()
    try {
      in.addData((1L, "a", 10L), (2L, "b", 5L))
      q.processAllAvailable()
      in.addData((3L, "a", 7L), (4L, "c", 1L)) // "c": delta-only group
      q.processAllAvailable()
      in.addData((5L, "b", 100L))
      q.processAllAvailable()

      val got = view.result.orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val expect = aggQ(spark.read.parquet(basePath)).orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expect, s"got $got expect $expect")
      assert(got == Seq(("a", 2L, 17L, 10L), ("b", 2L, 105L, 100L),
        ("c", 1L, 1L, 1L)))
    } finally q.stop()
  }

  test("streaming auto view: agg-join shape maintains on the SIGNED rung") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dir = Files.createTempDirectory("ivm_auto_stream").toString
    val basePath = s"$dir/base"
    // static dimension (parquet-backed like every real dim)
    Seq(("a", "alpha"), ("b", "beta"), ("c", "gamma")).toDF("dk", "dn")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = () => spark.read.parquet(s"$dir/dim")

    // the r6 merge-rung shape: rollup feeding an inner dim join with a
    // row-wise top — the streaming twin of delta_agg_join
    val q = (df: DataFrame) => df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
      .join(dim(), col("k") === col("dk"), "inner")
      .select(col("dn"), col("cnt"), col("sum_v"))
    val view = new IncrementalAutoView(spark, "sauto", "event_id", q,
      s"$dir/sink")

    val in = MemoryStream[(Long, String, Long)]
    val accumulate: DataFrame => DataFrame = { batch =>
      batch.toDF("event_id", "k", "v").write.mode("append").parquet(basePath)
      spark.read.parquet(basePath)
    }
    val s = IvmStream.maintain(view, in.toDF(), accumulate).start()
    try {
      in.addData((1L, "a", 10L), (2L, "b", 5L))
      s.processAllAvailable()
      in.addData((3L, "a", 7L), (4L, "c", 1L)) // changes a, introduces c
      s.processAllAvailable()

      assert(view.lastRoute.contains("signed"),
        s"agg-join must take the signed merge rung, got ${view.lastRoute}")
      val got = view.result.orderBy("dn").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val expect = q(spark.read.parquet(basePath)).orderBy("dn").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect, s"got $got expect $expect")
      assert(got == Seq(("alpha", 2L, 17L), ("beta", 1L, 5L),
        ("gamma", 1L, 1L)))
    } finally s.stop()
  }

  test("streaming auto view: TWO-LEVEL aggregate maintains on the SIGNED rung") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dir = Files.createTempDirectory("ivm_auto_stream2").toString
    val basePath = s"$dir/base"
    Seq(("a", "g1"), ("b", "g1"), ("c", "g2")).toDF("dk", "grp")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = () => spark.read.parquet(s"$dir/dim")

    // per-key rollup ⋈ dim, re-aggregated per dim GROUP — the r6
    // aggOverSignedAuto shape, driven through the streaming view
    val q = (df: DataFrame) => df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(coalesce(col("v"), lit(0L))).as("sum_v"))
      .join(dim(), col("k") === col("dk"), "inner")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        sum(coalesce(col("sum_v"), lit(0L))).as("tot"))
    val view = new IncrementalAutoView(spark, "sauto2", "event_id", q,
      s"$dir/sink")

    val in = MemoryStream[(Long, String, Long)]
    val accumulate: DataFrame => DataFrame = { batch =>
      batch.toDF("event_id", "k", "v").write.mode("append").parquet(basePath)
      spark.read.parquet(basePath)
    }
    val s = IvmStream.maintain(view, in.toDF(), accumulate).start()
    try {
      in.addData((1L, "a", 10L), (2L, "b", 5L))
      s.processAllAvailable()
      in.addData((3L, "a", 7L), (4L, "c", 1L)) // changes g1, introduces g2
      s.processAllAvailable()

      assert(view.lastRoute.contains("signed"),
        s"two-level must take the signed rung, got ${view.lastRoute}")
      val got = view.result.orderBy("grp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      val expect = q(spark.read.parquet(basePath)).orderBy("grp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == expect, s"got $got expect $expect")
      assert(got == Seq(("g1", 2L, 3L, 22L), ("g2", 1L, 1L, 1L)))
    } finally s.stop()
  }
}
