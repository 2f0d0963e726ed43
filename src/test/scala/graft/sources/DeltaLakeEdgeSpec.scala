package graft.sources

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Edge cases of the Delta-log reader raised by the r8 advisory: URI
  * (not form-urlencoded) path decoding, exact decimal and code-point
  * string stats comparisons, checkpoint selection below `_last_checkpoint`,
  * and the schema-change disqualifier on the append-only window guard.
  * Lives in `graft.sources` for access to the package-private helpers.
  */
class DeltaLakeEdgeSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_dle_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("variantType: binary variant columns read, extract, and time-travel") {
    import org.apache.spark.sql.functions.{parse_json, variant_get}
    val dir = freshDir("variant")
    val mk = (r: Range) => r.map(i =>
      (i.toLong, s"""{"a": $i, "s": "x$i"}""")).toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v")).coalesce(1)
    DeltaLake.stageCommit(spark, dir, mk(1 to 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, mk(11 to 15), Seq.empty, 1L)
    // the commit-0 protocol carries the table-features shape (reader 3
    // + variantType) and the gate admits it
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.schema("v").dataType ==
      org.apache.spark.sql.types.VariantType)
    val got = snap
      .select(col("id"), variant_get(col("v"), "$.a", "long").as("a"),
        variant_get(col("v"), "$.s", "string").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == (1L to 15L).map(i => (i, i, s"x$i")).toSet)
    // time travel to v0 sees only the first commit's variants
    assert(DeltaLake.snapshot(spark, dir, version = Some(0L))
      .count() == 10L)
  }

  test("percentDecode: '+' is a literal plus, %XX decodes, UTF-8 multibyte survives") {
    assert(DeltaLake.percentDecode("a+b") == "a+b")
    assert(DeltaLake.percentDecode("a%20b") == "a b")
    assert(DeltaLake.percentDecode("ts=2020-01-01%2000:00+00:00") ==
      "ts=2020-01-01 00:00+00:00")
    assert(DeltaLake.percentDecode("%C3%A9%2B") == "é+")
  }

  test("compareCodePoints matches UTF-8 byte order for supplementary characters") {
    // U+FFFF < U+1F600 by code point; UTF-16 code-unit compare says the
    // opposite (the surrogate 0xD83D sorts below 0xFFFF)
    assert(DeltaLake.compareCodePoints("￿", "😀") < 0)
    assert("￿".compareTo("😀") > 0, "fixture: UTF-16 diverges")
    assert(DeltaLake.compareCodePoints("ab", "ab") == 0)
    assert(DeltaLake.compareCodePoints("ab", "abc") < 0)
  }

  test("a partition value containing '+' round-trips stage → log → snapshot") {
    val dir = freshDir("plus")
    val df = Seq((1L, "2020-01-01 00:00+00:00"), (2L, "2020-01-02 00:00+00:00"))
      .toDF("id", "tz")
    DeltaLake.stageCommit(spark, dir, df, Seq("tz"), 0L)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "2020-01-01 00:00+00:00"), (2L, "2020-01-02 00:00+00:00")))
    // and partition pruning on the '+'-bearing value still works
    assert(snap.filter(col("tz") === "2020-01-02 00:00+00:00").count() == 1L)
  }

  test("string stats with supplementary characters: no wrong skip proof") {
    val dir = freshDir("surr")
    // Spark's min/max (binary UTF-8 order) puts the emoji as max
    val df = Seq((1L, "￿"), (2L, "😀")).toDF("id", "v")
      .coalesce(1)
    DeltaLake.stageCommit(spark, dir, df, Seq.empty, 0L)
    // UTF-16 compare would prove max("😀") <= "￿" and drop the file,
    // silently losing the matching emoji row
    val got = DeltaLake.snapshotWhere(spark, dir, col("v") > "￿")
    assert(got.inputFiles.length == 1)
    assert(got.collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("decimal stats beyond double precision: exact compare, no wrong skip") {
    val dir = freshDir("dec")
    val df = spark.sql(
      "SELECT 1L AS id, CAST('10000000000000000001' AS DECIMAL(20,0)) AS d")
      .coalesce(1)
    DeltaLake.stageCommit(spark, dir, df, Seq.empty, 0L)
    // stageCommit doesn't emit decimal stats (foreign writers do): inject
    // them into the commit JSON to model a foreign-writer table
    val log0 = new java.io.File(dir,
      "_delta_log/00000000000000000000.json")
    val txt = java.nio.file.Files.readString(log0.toPath)
    val munged = txt
      .replace("""\"minValues\":{""",
        """\"minValues\":{\"d\":\"10000000000000000001\",""")
      .replace("""\"maxValues\":{""",
        """\"maxValues\":{\"d\":\"10000000000000000001\",""")
    assert(munged != txt, "fixture drift: expected stats in commit 0")
    java.nio.file.Files.writeString(log0.toPath, munged)
    // both sides equal as doubles (1e19): a double compare proves
    // max <= literal and drops the file — the exact compare keeps it
    val pred = col("d") > lit(new java.math.BigDecimal("10000000000000000000"))
    val got = DeltaLake.snapshotWhere(spark, dir, pred)
    assert(got.inputFiles.length == 1, "file wrongly skipped on decimal stats")
    assert(got.count() == 1L)
    // and the skip direction still proves correctly when exact
    assert(DeltaLake.snapshotWhere(spark, dir,
      col("d") > lit(new java.math.BigDecimal("10000000000000000001")))
      .inputFiles.isEmpty)
  }

  test("time travel below _last_checkpoint falls back to an older on-disk checkpoint") {
    val dir = freshDir("cpsel")
    DeltaLake.stageCommit(spark, dir,
      Seq((1L, "a")).toDF("id", "v").coalesce(1), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir,
      Seq((2L, "b")).toDF("id", "v").coalesce(1), Seq.empty, 1L)
    DeltaLake.stageCheckpoint(spark, dir, 1L)
    DeltaLake.stageCommit(spark, dir,
      Seq((3L, "c")).toDF("id", "v").coalesce(1), Seq.empty, 2L)
    DeltaLake.stageCommit(spark, dir,
      Seq((4L, "d")).toDF("id", "v").coalesce(1), Seq.empty, 3L)
    DeltaLake.stageCheckpoint(spark, dir, 3L) // _last_checkpoint → 3
    val log = new java.io.File(dir, "_delta_log")
    // clean every JSON commit at/below the v1 checkpoint
    assert(new java.io.File(log, f"${0L}%020d.json").delete())
    assert(new java.io.File(log, f"${1L}%020d.json").delete())
    // v2 needs the v1 checkpoint (the hint points above the request)
    val v2 = DeltaLake.snapshot(spark, dir, Some(2L))
    assert(v2.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // latest still resolves through the hint
    assert(DeltaLake.snapshot(spark, dir).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("add.stats survive a checkpoint: skipping still plans fewer files behind it") {
    val dir = freshDir("cpstats")
    val lo = Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
    val hi = Seq((100L, "c"), (200L, "d")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, lo, Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, hi, Seq.empty, 1L)
    DeltaLake.stageCheckpoint(spark, dir, 1L)
    val log = new java.io.File(dir, "_delta_log")
    // the JSON commits (and their stats) are GONE: whatever skips now
    // was read back from the checkpoint rows
    assert(new java.io.File(log, f"${0L}%020d.json").delete())
    assert(new java.io.File(log, f"${1L}%020d.json").delete())
    assert(DeltaLake.snapshot(spark, dir).inputFiles.length == 2)
    val skipped = DeltaLake.snapshotWhere(spark, dir, col("id") >= 100L)
    assert(skipped.inputFiles.length == 1,
      "stats must survive the checkpoint, not silently disable skipping")
    assert(skipped.count() == 2L)
  }

  test("multi-part checkpoint: fold resumes from all parts, stats intact") {
    val dir = freshDir("cpmulti")
    val lo = Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
    val mid = Seq((50L, "m")).toDF("id", "v").coalesce(1)
    val hi = Seq((100L, "c"), (200L, "d")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, lo, Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, mid, Seq.empty, 1L)
    DeltaLake.stageCommit(spark, dir, hi, Seq.empty, 2L)
    DeltaLake.stageCheckpoint(spark, dir, 2L, parts = 3)
    val log = new java.io.File(dir, "_delta_log")
    // the subsumed JSON commits are GONE: the fold can only come from
    // the three checkpoint parts together
    (0L to 2L).foreach(v =>
      assert(new java.io.File(log, f"$v%020d.json").delete()))
    assert(DeltaLake.snapshot(spark, dir).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 50L, 100L, 200L))
    // stats ride the multi-part rows too
    assert(DeltaLake.snapshotWhere(spark, dir, col("id") >= 100L)
      .inputFiles.length == 1)
  }

  test("incomplete multi-part checkpoint is ignored, never partially read") {
    val dir = freshDir("cppartial")
    DeltaLake.stageCommit(spark, dir,
      Seq((1L, "a")).toDF("id", "v").coalesce(1), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir,
      Seq((2L, "b")).toDF("id", "v").coalesce(1), Seq.empty, 1L)
    DeltaLake.stageCheckpoint(spark, dir, 1L, parts = 2)
    val log = new java.io.File(dir, "_delta_log")
    // lose one part: reading the survivor alone would silently drop
    // actions — the whole checkpoint must be ignored and the fold come
    // from the (still present) JSON commits
    assert(new java.io.File(log,
      f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet").delete())
    assert(DeltaLake.snapshot(spark, dir).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
    // with the JSON commits also gone there is no complete source left:
    // fail loudly, never a silently partial snapshot
    assert(new java.io.File(log, f"${0L}%020d.json").delete())
    assert(new java.io.File(log, f"${1L}%020d.json").delete())
    intercept[IllegalArgumentException] {
      DeltaLake.snapshot(spark, dir).collect()
    }
  }

  test("pushed data filters stats-skip files inside the log-backed FileIndex") {
    // r9: skipping is also wired into LogFileIndex.listFiles, so a plain
    // snapshot().filter(...) — or any predicate Spark pushes onto the
    // scan (version cuts, join pushdowns) — prunes files WITHOUT going
    // through snapshotWhere. numFiles is the runtime-planned file count.
    import org.apache.spark.sql.classic
    val dir = freshDir("pushskip")
    val lo = Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
    val hi = Seq((100L, "c"), (200L, "d")).toDF("id", "v").coalesce(1)
    DeltaLake.stageCommit(spark, dir, lo, Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, hi, Seq.empty, 1L)
    val q = DeltaLake.snapshot(spark, dir)
      .filter(org.apache.spark.sql.functions.col("id") >= 100L)
    assert(q.collect().map(_.getLong(0)).toSet == Set(100L, 200L))
    val scan = q.asInstanceOf[classic.Dataset[_]].queryExecution
      .executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
    assert(scan.metrics("numFiles").value == 1L,
      "the lo file must be stats-skipped at the FileIndex, not scanned")
  }

  test("isAppendOnly rejects a window containing a schema-evolution commit") {
    val dir = freshDir("evoguard")
    DeltaLake.stageCommit(spark, dir,
      Seq((1L, "a")).toDF("id", "v").coalesce(1), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir,
      Seq((2L, "b", 20L)).toDF("id", "v", "w").coalesce(1), Seq.empty, 1L)
    assert(!DeltaLake.isAppendOnly(dir, 0L, 1L),
      "schema evolution in the window must disqualify the file-set cut")
  }
}
