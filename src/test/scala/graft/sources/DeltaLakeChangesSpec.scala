package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.ivm.{DeltaLakeSnapshots, Ivm}

/** The delete-aware signed Delta-log source (r9): [[DeltaLake.changes]]'
  * signed row diff, the [[DeltaLakeSnapshots.signedRows]] /
  * [[DeltaLakeSnapshots.maintainAgg]] maintenance cycle through a real
  * DELETE rewrite, and the fail-fast guards (schema drift, rewrite-delete
  * ambiguity, inconsistent removes).
  */
class DeltaLakeChangesSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_dlc_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(df: DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("id")),
      r.getLong(r.fieldIndex("v")), r.getString(r.fieldIndex("p")))).toSet

  /** id 0..19, v = id*10, p = partition A/B by id parity. */
  private def frame(ids: Range): DataFrame =
    ids.map(i => (i.toLong, i.toLong * 10,
      if (i % 2 == 0) "A" else "B")).toDF("id", "v", "p")

  /** Two appends then a partition-scoped row-level delete at version 2. */
  private def stagedWithDelete(): String = {
    val dir = freshDir("del")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    DeltaLake.stageCommit(spark, dir, frame(10 until 20), Seq("p"), 1L)
    // DELETE WHERE id % 3 = 0 AND p = 'A' — hits files in partition A
    // of BOTH commits; partition B untouched
    DeltaLake.stageDeleteCommit(spark, dir,
      col("id") % 3 === 0 && col("p") === "A", 2L)
    dir
  }

  test("stageDeleteCommit: snapshot reflects the delete, partition B untouched") {
    val dir = stagedWithDelete()
    val got = rows(DeltaLake.snapshot(spark, dir))
    val want = (0 until 20).filterNot(i => i % 3 == 0 && i % 2 == 0)
      .map(i => (i.toLong, i.toLong * 10,
        if (i % 2 == 0) "A" else "B")).toSet
    assert(got == want)
    // time travel still sees the pre-delete snapshot
    assert(rows(DeltaLake.snapshot(spark, dir, Some(1L))).size == 20)
  }

  test("changes: signed diff nets to exactly the deleted rows") {
    val dir = stagedWithDelete()
    val ch = DeltaLake.changes(spark, dir, afterVersion = 1L)
    val deleted = Set(0, 6, 12, 18)
      .map(i => (i.toLong, i.toLong * 10, "A"))
    // the rewrite shape is file-granular (retract whole hit files,
    // re-insert their survivors — file splits vary with parallelism),
    // but the NET must be exactly the deleted rows, all in partition A
    val (rets, ins) = (rows(ch.retracts), rows(ch.inserts))
    assert(deleted.subsetOf(rets))
    assert(ins == rets -- deleted)
    assert(rets.forall(_._3 == "A"))
    // signed identity: snapshot(v1) ∪ inserts ∖ retracts == snapshot(v2)
    val applied = Ivm.SignedDelta(ch.inserts, ch.retracts)
      .applyTo(DeltaLake.snapshot(spark, dir, Some(1L)))
    assert(rows(applied) == rows(DeltaLake.snapshot(spark, dir)))
  }

  test("changes over an append-only window degrades to appended (no retracts)") {
    val dir = freshDir("app")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    DeltaLake.stageCommit(spark, dir, frame(10 until 20), Seq("p"), 1L)
    val ch = DeltaLake.changes(spark, dir, afterVersion = 0L)
    assert(ch.retracts.isEmpty)
    assert(rows(ch.inserts) == rows(
      DeltaLake.appended(spark, dir, afterVersion = 0L)))
  }

  test("changes from the beginning (afterVersion = -1): everything is an insert") {
    val dir = stagedWithDelete()
    val ch = DeltaLake.changes(spark, dir, afterVersion = -1L)
    assert(ch.retracts.isEmpty)
    assert(rows(ch.inserts) == rows(DeltaLake.snapshot(spark, dir)))
  }

  test("signedThrough: a row-wise view maintains through the delete window") {
    val dir = stagedWithDelete()
    DeltaLakeSnapshots.track(spark, "dlc_rows", dir, at = Some(1L))
    val q = (df: DataFrame) =>
      df.filter(col("v") >= 30).select(col("id"), col("p"))
    val sd = DeltaLakeSnapshots.signedThrough(spark, "dlc_rows")(q)
    val stored = q(DeltaLake.snapshot(spark, dir, Some(1L)))
    val maintained = sd.applyTo(stored)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val full = q(DeltaLake.snapshot(spark, dir))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(maintained == full)
  }

  test("maintainAgg: group-scoped splice equals full recompute (countDistinct " +
      "included) and advances the cut") {
    val dir = stagedWithDelete()
    DeltaLakeSnapshots.track(spark, "dlc_agg", dir, at = Some(1L))
    val aggOf = (df: DataFrame) => df.groupBy("p")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"),
        countDistinct(col("id") % 5).as("nd"), max(col("v")).as("mx"))
    val stored = aggOf(DeltaLake.snapshot(spark, dir, Some(1L)))
    val got = DeltaLakeSnapshots.maintainAgg(spark, "dlc_agg", stored,
      Seq("p"), aggOf)
    val want = aggOf(DeltaLake.snapshot(spark, dir))
    assert(got.orderBy("p").collect().toSeq ==
      want.orderBy("p").collect().toSeq)
    assert(DeltaLakeSnapshots.cut("dlc_agg").contains(2L))
    // second cycle on an already-advanced cut: empty window, view stands
    val again = DeltaLakeSnapshots.maintainAgg(spark, "dlc_agg", got,
      Seq("p"), aggOf)
    assert(again.orderBy("p").collect().toSeq ==
      want.orderBy("p").collect().toSeq)
  }

  test("stageUpdateCommit: the signed diff nets to old-row retract + " +
      "updated-row insert") {
    val dir = freshDir("upd")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    DeltaLake.stageCommit(spark, dir, frame(10 until 20), Seq("p"), 1L)
    // UPDATE v = v + 1 WHERE id % 3 = 0 AND p = 'A'
    DeltaLake.stageUpdateCommit(spark, dir,
      col("id") % 3 === 0 && col("p") === "A",
      Map("v" -> (col("v") + 1)), 2L)
    val want = (0 until 20).map { i =>
      val updated = i % 3 == 0 && i % 2 == 0
      (i.toLong, i.toLong * 10 + (if (updated) 1 else 0),
        if (i % 2 == 0) "A" else "B")
    }.toSet
    assert(rows(DeltaLake.snapshot(spark, dir)) == want)
    // signed identity through the update window
    val ch = DeltaLake.changes(spark, dir, afterVersion = 1L)
    val applied = Ivm.SignedDelta(ch.inserts, ch.retracts)
      .applyTo(DeltaLake.snapshot(spark, dir, Some(1L)))
    assert(rows(applied) == want)
    // and the group-scoped splice maintains an aggregate through it
    import org.apache.spark.sql.functions.{count, lit, sum}
    DeltaLakeSnapshots.track(spark, "dlc_upd", dir, at = Some(1L))
    val aggOf = (df: DataFrame) => df.groupBy("p")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
    val got = DeltaLakeSnapshots.maintainAgg(spark, "dlc_upd",
      aggOf(DeltaLake.snapshot(spark, dir, Some(1L))), Seq("p"), aggOf)
    assert(got.orderBy("p").collect().toSeq ==
      aggOf(DeltaLake.snapshot(spark, dir)).orderBy("p").collect().toSeq)
  }

  test("UPDATE: predicate and every SET expression see the OLD row") {
    import org.apache.spark.sql.functions.concat
    val dir = freshDir("updold")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq.empty, 0L)
    // SET v = 0, p = 'x' || v  WHERE v > 50: p must read the OLD v —
    // a column-by-column fold would feed p the freshly-zeroed v (and
    // which column goes wrong would follow hash-map iteration order)
    DeltaLake.stageUpdateCommit(spark, dir, col("v") > 50,
      Map("v" -> lit(0L), "p" -> concat(lit("x"), col("v"))), 1L)
    val got = rows(DeltaLake.snapshot(spark, dir))
    val want = (0 until 10).map { i =>
      if (i * 10 > 50) (i.toLong, 0L, s"x${i * 10}")
      else (i.toLong, i.toLong * 10, if (i % 2 == 0) "A" else "B")
    }.toSet
    assert(got == want)
  }

  test("maintainAgg recompute arm prunes files to the touched partitions") {
    import org.apache.spark.sql.classic
    import org.apache.spark.sql.functions.{count, lit}
    val dir = stagedWithDelete() // delete touched partition A only
    DeltaLakeSnapshots.track(spark, "dlc_prune", dir, at = Some(1L))
    var captured: DataFrame = null
    val aggOf = (df: DataFrame) => {
      captured = df // the restricted recompute input
      df.groupBy("p").agg(count(lit(1)).as("cnt"))
    }
    val stored = DeltaLake.snapshot(spark, dir, Some(1L))
      .groupBy("p").agg(count(lit(1)).as("cnt"))
    DeltaLakeSnapshots.maintainAgg(spark, "dlc_prune", stored,
      Seq("p"), aggOf)
    // the touched set (p = 'A') inlines as a literal predicate, so the
    // log-backed index prunes partition-B files from the PLAN
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scan = try {
      captured.collect()
      captured.asInstanceOf[classic.Dataset[_]].queryExecution
        .executedPlan.collectLeaves().collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.get
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    val aFiles = DeltaLake.snapshotWhere(spark, dir,
      org.apache.spark.sql.functions.col("p") === "A").inputFiles.length
    val allFiles = DeltaLake.snapshot(spark, dir).inputFiles.length
    assert(aFiles < allFiles, "fixture: partition B must have files")
    assert(scan.metrics("numFiles").value == aFiles.toLong,
      s"recompute arm must plan only partition-A files " +
        s"(${scan.metrics("numFiles").value} vs $aFiles of $allFiles)")
  }

  test("TIMESTAMP AS OF resolves by commit mtime; pre-table timestamps fail") {
    val dir = freshDir("asof")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq.empty, 0L)
    val t0 = new java.io.File(dir,
      f"_delta_log/${0L}%020d.json").lastModified()
    // commit 1 strictly later on the mtime clock
    val log1 = new java.io.File(dir, f"_delta_log/${1L}%020d.json")
    DeltaLake.stageCommit(spark, dir, frame(10 until 20), Seq.empty, 1L)
    assert(log1.setLastModified(t0 + 10000))
    assert(DeltaLake.versionAt(spark, dir, t0) == 0L)
    assert(DeltaLake.versionAt(spark, dir, t0 + 20000) == 1L)
    assert(rows(DeltaLake.snapshotAsOf(spark, dir, t0)).size == 10)
    assert(rows(DeltaLake.snapshotAsOf(spark, dir, t0 + 20000)).size == 20)
    intercept[IllegalArgumentException] {
      DeltaLake.versionAt(spark, dir, t0 - 1000000)
    }
  }

  test("a vacuumed (missing) data file fails LOUDLY, never an empty split") {
    val dir = freshDir("vacuumed")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq.empty, 0L)
    // simulate VACUUM past a consumer's cut: physically delete one
    // data file the log still lists
    val victim = new java.io.File(
      DeltaLake.snapshot(spark, dir).inputFiles.head.stripPrefix("file:"))
    assert(victim.delete())
    // the scan plans the file with the LOG's size (never a 0-length
    // File.length() stat that Spark would plan as an empty split —
    // silent row loss); the read then fails loudly
    val e = intercept[Exception] {
      DeltaLake.snapshot(spark, dir).collect()
    }
    assert(e.toString.contains("FileNotFound") ||
      Option(e.getCause).exists(_.toString.contains("FileNotFound")) ||
      e.toString.toLowerCase.contains("does not exist"),
      s"expected a loud missing-file failure, got: $e")
  }

  test("signedRows(to) + advanceTo: a mid-cycle commit is never skipped") {
    val dir = freshDir("midcycle")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    DeltaLake.stageCommit(spark, dir, frame(10 until 15), Seq("p"), 1L)
    DeltaLakeSnapshots.track(spark, "dlc_mid", dir, at = Some(0L))
    // resolve the window end ONCE
    val v = DeltaLake.latestVersion(spark, dir) // = 1
    val sd = DeltaLakeSnapshots.signedRows(spark, "dlc_mid", to = Some(v))
    // a commit lands between the read and the advance
    DeltaLake.stageCommit(spark, dir, frame(15 until 20), Seq("p"), 2L)
    val applied = sd.applyTo(DeltaLake.snapshot(spark, dir, Some(0L)))
    assert(rows(applied) == rows(DeltaLake.snapshot(spark, dir, Some(v))))
    DeltaLakeSnapshots.advanceTo(spark, "dlc_mid", v)
    assert(DeltaLakeSnapshots.cut("dlc_mid").contains(v))
    // the mid-cycle commit is still in the NEXT window — not skipped
    val sd2 = DeltaLakeSnapshots.signedRows(spark, "dlc_mid")
    assert(rows(sd2.inserts) ==
      (15 until 20).map(i => (i.toLong, i.toLong * 10,
        if (i % 2 == 0) "A" else "B")).toSet)
  }

  test("fail-fast: schema evolution inside the window") {
    val dir = freshDir("evo")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    DeltaLake.stageCommit(spark, dir,
      frame(10 until 20).withColumn("extra", lit(1L)), Seq("p"), 1L)
    val e = intercept[IllegalStateException] {
      DeltaLake.changes(spark, dir, afterVersion = 0L)
    }
    assert(e.getMessage.contains("rebase"))
  }

  test("fail-fast: deleting a compaction-rewritten file is ambiguous") {
    val dir = freshDir("compdel")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, frame(10 until 20), Seq.empty, 1L)
    DeltaLake.stageCompactCommit(spark, dir, 2L)
    // the compacted file is the only live one; remove it as a delete
    val live = DeltaLake.liveFileNames(spark, dir, 2L)
    assert(live.size == 1)
    DeltaLake.stageRemoveCommit(dir, live, 3L)
    val e = intercept[IllegalStateException] {
      DeltaLake.changes(spark, dir, afterVersion = 1L)
    }
    assert(e.getMessage.contains("straddle"))
    // but a window cut AFTER the compaction attributes cleanly: the
    // rewrite is cut-live there, so its delete is a plain retraction
    val ch = DeltaLake.changes(spark, dir, afterVersion = 2L)
    assert(ch.inserts.isEmpty)
    assert(ch.retracts.count() == 20L)
  }

  test("pure-compaction window: both signed frames EMPTY, zero files " +
      "planned (OPTIMIZE costs the seam nothing)") {
    val dir = freshDir("optwin")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq.empty, 0L)
    DeltaLake.stageCommit(spark, dir, frame(10 until 20), Seq.empty, 1L)
    DeltaLake.stageCompactCommit(spark, dir, 2L)
    val ch = DeltaLake.changes(spark, dir, afterVersion = 1L)
    // content no-op: not just zero rows — zero FILES read on each arm
    assert(ch.inserts.inputFiles.isEmpty && ch.retracts.inputFiles.isEmpty,
      "a dataChange=false rewrite pair must contribute no frame files")
    assert(ch.inserts.isEmpty && ch.retracts.isEmpty)
    // append-then-OPTIMIZE window: frames are APPEND-sized — the
    // compaction neither replays the rewritten file nor cancels the
    // append (the appended file stays on disk and readable)
    val ch2 = DeltaLake.changes(spark, dir, afterVersion = 0L)
    assert(ch2.retracts.isEmpty)
    assert(ch2.inserts.count() == 10L)
    // the insert arm reads the APPEND's files, never the rewrite
    val compacted = DeltaLake.liveFileNames(spark, dir, 2L).toSet
    assert(compacted.size == 1)
    assert(!ch2.inserts.inputFiles.exists(f =>
      compacted.contains(new java.io.File(f).getName)))
  }

  test("fail-fast: removing a file the log never added") {
    val dir = freshDir("ghost")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq.empty, 0L)
    DeltaLake.stageRemoveCommit(dir, Seq("no-such-file.parquet"), 1L)
    val e = intercept[IllegalStateException] {
      DeltaLake.changes(spark, dir, afterVersion = 0L)
    }
    assert(e.getMessage.contains("inconsistent log"))
  }

  test("view() still fail-fasts on a delete window and points at signedRows") {
    val dir = stagedWithDelete()
    DeltaLakeSnapshots.track(spark, "dlc_guard", dir, at = Some(1L))
    val e = intercept[IllegalArgumentException] {
      DeltaLakeSnapshots.view(spark, "dlc_guard")
    }
    assert(e.getMessage.contains("signedRows"))
  }

  test("stageMergeCommit: one commit mixes rewrites and new-file adds; " +
      "the signed window nets to exactly the merge") {
    val dir = freshDir("merge")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    DeltaLake.stageCommit(spark, dir, frame(10 until 20), Seq("p"), 1L)
    // MERGE: matched rows (id % 4 = 0, partition A) get v += 1;
    // not-matched new rows 100..104 insert
    DeltaLake.stageMergeCommit(spark, dir,
      col("id") % 4 === 0 && col("p") === "A",
      Map("v" -> (col("v") + 1)), frame(100 until 105), 2L)

    val want = ((0 until 20).map(i => (i.toLong,
        if (i % 4 == 0) i * 10L + 1 else i * 10L,
        if (i % 2 == 0) "A" else "B")) ++
      (100 until 105).map(i => (i.toLong, i * 10L,
        if (i % 2 == 0) "A" else "B"))).toSet
    assert(rows(DeltaLake.snapshot(spark, dir)) == want)

    // the signed window: retract = old rows of rewritten files, insert
    // = their updated rewrite + the new files; survivors cancel so the
    // NET is retract(old matched) + insert(updated matched + new rows)
    val ch = DeltaLake.changes(spark, dir, 1L)
    val ins = rows(ch.inserts)
    val rets = rows(ch.retracts)
    val newRows = (100 until 105).map(i => (i.toLong, i * 10L,
      if (i % 2 == 0) "A" else "B")).toSet
    assert(newRows.subsetOf(ins))
    val updated = (0 until 20).filter(i => i % 4 == 0)
      .map(i => (i.toLong, i * 10L + 1, "A")).toSet
    assert(updated.subsetOf(ins))
    assert((0 until 20).filter(i => i % 4 == 0)
      .map(i => (i.toLong, i * 10L, "A")).toSet.subsetOf(rets))
    assert((ins -- rets) == newRows ++ updated)

    // maintained aggregate through the merge window via the splice
    DeltaLakeSnapshots.track(spark, "dlc_merge", dir, at = Some(1L))
    val aggOf = (df: DataFrame) => df.groupBy("p")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"),
        countDistinct(col("id")).as("nid"))
    val stored = aggOf(DeltaLake.snapshot(spark, dir, Some(1L)))
    val maintained = DeltaLakeSnapshots.maintainAgg(spark, "dlc_merge",
      stored, Seq("p"), aggOf)
    val expect = aggOf(DeltaLake.snapshot(spark, dir))
    assert(maintained.exceptAll(expect).isEmpty &&
      expect.exceptAll(maintained).isEmpty)
  }

  test("change data feed: cdc actions serve DELTA-SIZED signed frames") {
    val dir = freshDir("cdf")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    DeltaLake.stageCommit(spark, dir, frame(10 until 20), Seq("p"), 1L)
    // UPDATE with CDF: the commit carries cdc actions, so changes()
    // reads ONLY the change files — insert frame = updated post-images,
    // retract frame = pre-images, never the rewritten files' full rows
    DeltaLake.stageUpdateCommit(spark, dir,
      col("id") % 4 === 0 && col("p") === "A",
      Map("v" -> (col("v") + 1)), 2L, cdf = true)

    val ch = DeltaLake.changes(spark, dir, 1L)
    val updatedIds = (0 until 20).filter(_ % 4 == 0).map(_.toLong).toSet
    assert(rows(ch.inserts) ==
      updatedIds.map(i => (i, i * 10 + 1, "A")))
    assert(rows(ch.retracts) ==
      updatedIds.map(i => (i, i * 10, "A")))
    // delta-sized: the frames read change files ONLY (the rewritten
    // data files' survivor rows never enter the diff)
    assert(ch.inserts.inputFiles.forall(_.contains("_change_data")),
      ch.inserts.inputFiles.mkString(","))
    assert(ch.retracts.inputFiles.forall(_.contains("_change_data")))

    // snapshot still reflects the rewrite (cdc is diff-only metadata)
    val snap = rows(DeltaLake.snapshot(spark, dir))
    assert(snap == (0 until 20).map(i => (i.toLong,
      if (i % 4 == 0) i * 10L + 1 else i * 10L,
      if (i % 2 == 0) "A" else "B")).toSet)

    // maintained aggregate through the CDF window
    DeltaLakeSnapshots.track(spark, "dlc_cdf", dir, at = Some(1L))
    val aggOf = (df: DataFrame) => df.groupBy("p")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"))
    val stored = aggOf(DeltaLake.snapshot(spark, dir, Some(1L)))
    val maintained = DeltaLakeSnapshots.maintainAgg(spark, "dlc_cdf",
      stored, Seq("p"), aggOf)
    val expect = aggOf(DeltaLake.snapshot(spark, dir))
    assert(maintained.exceptAll(expect).isEmpty &&
      expect.exceptAll(maintained).isEmpty)

    // CDF DELETE in a later window: delete-typed change rows retract
    DeltaLake.stageDeleteCommit(spark, dir, col("id") >= 18, 3L,
      cdf = true)
    val ch2 = DeltaLake.changes(spark, dir, 2L)
    assert(rows(ch2.retracts) ==
      Set((18L, 180L, "A"), (19L, 190L, "B")))
    assert(ch2.inserts.isEmpty)
    assert(ch2.retracts.inputFiles.forall(_.contains("_change_data")))
  }

  test("change data feed: a mixed window composes cdc with plain appends") {
    val dir = freshDir("cdfmix")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    // window: plain append (no cdc) + CDF update touching BOTH the
    // cut-live and the window-added rows — the stale window-add insert
    // plus the cdc pre/post pair must net to the updated content
    DeltaLake.stageCommit(spark, dir, frame(10 until 16), Seq("p"), 1L)
    DeltaLake.stageUpdateCommit(spark, dir, col("id") % 5 === 0,
      Map("v" -> (col("v") + 7)), 2L, cdf = true)
    val ch = DeltaLake.changes(spark, dir, 0L)
    val net = Ivm.SignedDelta(ch.inserts, ch.retracts)
      .applyTo(DeltaLake.snapshot(spark, dir, Some(0L)))
    val expect = DeltaLake.snapshot(spark, dir)
    assert(net.exceptAll(expect).isEmpty && expect.exceptAll(net).isEmpty,
      "cut snapshot + signed window must equal the end snapshot")
  }

  test("remove-then-re-add window (RESTORE shape) nets to zero") {
    val dir = freshDir("restore")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    // v1 removes every file; v2 re-adds the same paths (RESTORE): the
    // identity pair must CANCEL — the old guard threw 'inconsistent
    // log' on this perfectly consistent history
    val live = DeltaLake.snapshot(spark, dir).inputFiles
      .map(_.replaceFirst("^file:/+", "/"))
      .map(_.stripPrefix(dir).stripPrefix("/"))
    DeltaLake.stageRemoveCommit(dir, live.toSeq, 1L)
    // re-add with the same paths and partition values
    val adds = live.map { rel =>
      val pv = rel.split("/").toSeq.init.map(_.split("=", 2))
        .map(a => a(0) -> a(1)).toMap
      (rel, pv)
    }
    val actions = adds.map { case (rel, pv) =>
      val f = new java.io.File(dir, rel)
      val pvJson = pv.map { case (k, v) => s"""\"$k\":\"$v\"""" }
        .mkString("{", ",", "}")
      // the SAME percent-encoding the original add used — identity is
      // the log's path string
      s"""{"add":{"path":"${DeltaLake.percentEncode(rel)}",""" +
        s""""partitionValues":$pvJson,"size":${f.length()},""" +
        s""""modificationTime":${f.lastModified()},"dataChange":true}}"""
    }
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir/_delta_log", f"${2L}%020d.json").toPath,
      actions.mkString("", "\n", "\n"))
    val ch = DeltaLake.changes(spark, dir, 0L)
    assert(ch.inserts.isEmpty && ch.retracts.isEmpty,
      "remove->re-add of identical file versions must net to zero")
    // and the snapshot still reads in full
    assert(rows(DeltaLake.snapshot(spark, dir)).size == 10)
  }

  test("plain re-add after a CDC delete window inserts the restored rows") {
    val dir = freshDir("cdcrestore")
    DeltaLake.stageCommit(spark, dir, frame(0 until 10), Seq("p"), 0L)
    // CDC delete wipes ALL rows (every file removed via cdc commit)
    DeltaLake.stageDeleteCommit(spark, dir, col("id") >= 0, 1L,
      cdf = true)
    assert(DeltaLake.snapshot(spark, dir).isEmpty)
    // plain RESTORE re-adds the original files (still on disk)
    val restored = (0 until 10).map(i =>
      (if (i % 2 == 0) "A" else "B", i)).groupBy(_._1).keys
    val logLines = java.nio.file.Files.readAllLines(
      new java.io.File(s"$dir/_delta_log/00000000000000000000.json")
        .toPath)
    val addLines = logLines.toArray(Array.empty[String])
      .filter(_.contains("\"add\""))
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir/_delta_log", f"${2L}%020d.json").toPath,
      addLines.mkString("", "\n", "\n"))
    assert(rows(DeltaLake.snapshot(spark, dir)).size == 10)
    // the window nets to: cdc retract(all rows) + restore insert(all
    // rows) — a cut snapshot plus the signed window equals the end
    val ch = DeltaLake.changes(spark, dir, 0L)
    val net = Ivm.SignedDelta(ch.inserts, ch.retracts)
      .applyTo(DeltaLake.snapshot(spark, dir, Some(0L)))
    val expect = DeltaLake.snapshot(spark, dir)
    assert(net.exceptAll(expect).isEmpty && expect.exceptAll(net).isEmpty)
  }

  test("float-widened stats never skip a file the widened read matches") {
    import org.apache.spark.sql.functions.lit
    val dir = freshDir("widen")
    // v0: FLOAT column; its stats render "0.1" (the float), but the
    // widened read surfaces 0.10000000149… — a skip that trusts the
    // parsed double 0.1 as the max would lose this row on `x > 0.1`
    val narrow = Seq((1L, 0.1f)).toDF("id", "x").coalesce(1)
    DeltaLake.stageCommit(spark, dir, narrow, Seq.empty, 0L)
    val wide = Seq((2L, 7.5d)).toDF("id", "x").coalesce(1)
    DeltaLake.stageCommit(spark, dir, wide, Seq.empty, 1L)
    val got = DeltaLake.snapshotWhere(spark, dir,
      col("x") > lit(0.1d))
    assert(got.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L),
      "the float-stats file must be KEPT: its widened values exceed 0.1")
  }
}
