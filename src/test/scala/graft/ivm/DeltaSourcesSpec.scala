package graft.ivm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Error paths of the incremental-source resolution layer: clear messages
  * are part of the contract (the reference dies opaquely at physical
  * planning instead, `mod.rs:187`).
  */
class DeltaSourcesSpec extends AnyFunSuite with SparkFixture {

  test("unregistered table fails with the table name in the message") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
    df.createOrReplaceTempView("no_such_delta_source")
    val e = intercept[UnsupportedOperationException] {
      Ivm.delta(spark.table("no_such_delta_source")).collect()
    }
    assert(e.getMessage.contains("no_such_delta_source"), e.getMessage)
  }

  test("delta predicate naming a missing column fails with column context") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
    df.createOrReplaceTempView("bad_pred_table")
    DeltaSources.register("bad_pred_table", "not_a_column % 2 = 0")
    val e = intercept[UnsupportedOperationException] {
      Ivm.delta(spark.table("bad_pred_table")).collect()
    }
    assert(e.getMessage.contains("not_a_column"), e.getMessage)
  }

  test("register overrides and predicateFor parses to an expression") {
    DeltaSources.register("prop_probe", "k > 5")
    assert(DeltaSources.tables.contains("prop_probe"))
    assert(DeltaSources.predicateFor("prop_probe").get.sql.contains("5"))
    assert(DeltaSources.predicateFor("never_registered_xyz").isEmpty)
  }

  test("empty delta: predicate matching nothing yields empty delta, full base") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    df.createOrReplaceTempView("empty_delta_t")
    DeltaSources.register("empty_delta_t", "k > 1000000")
    assert(Ivm.delta(spark.table("empty_delta_t")).count() == 0)
    assert(Ivm.baseOf(spark.table("empty_delta_t")).count() == 2)
    // identity trivially holds: Q(full) − Q(base) = ∅
    val q = spark.table("empty_delta_t").select("k")
    assert(Ivm.delta(q).count() == 0)
  }

  test("snapshot watermark: two maintenance cycles over parquet appends") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val src = s"$dir/src"
    val sink = s"$dir/sink"
    def refresh(): Unit =
      spark.read.parquet(src).createOrReplaceTempView("snap_t")
    def maintained(): org.apache.spark.sql.DataFrame =
      Ivm.delta(spark.table("snap_t").filter(col("v") =!= "skip")
        .select("id", "v"))

    // cycle 0: initial state — everything is delta (the initial full load)
    Seq((1L, "a"), (2L, "b"), (3L, "skip")).toDF("id", "v")
      .write.mode("append").parquet(src)
    refresh()
    Snapshots.track("snap_t", "id")
    maintained().write.mode("append").parquet(sink)
    assert(Snapshots.advance("snap_t", spark.table("snap_t")))

    // cycle 1: append a batch; only the new rows flow
    Seq((4L, "c"), (5L, "skip"), (6L, "d")).toDF("id", "v")
      .write.mode("append").parquet(src)
    refresh()
    val d1 = maintained()
    assert(d1.collect().map(_.getLong(0)).toSet == Set(4L, 6L))
    d1.write.mode("append").parquet(sink)
    assert(Snapshots.advance("snap_t", spark.table("snap_t")))

    // cycle 2: another append
    Seq((7L, "e")).toDF("id", "v").write.mode("append").parquet(src)
    refresh()
    val d2 = maintained()
    assert(d2.collect().map(_.getLong(0)).toSet == Set(7L))
    d2.write.mode("append").parquet(sink)
    assert(Snapshots.advance("snap_t", spark.table("snap_t")))

    // no appends → idempotent: the mark doesn't move, the delta is empty
    assert(!Snapshots.advance("snap_t", spark.table("snap_t")))
    assert(maintained().count() == 0)

    // the accumulated sink equals a full recompute of the view
    val full = spark.table("snap_t").filter(col("v") =!= "skip")
      .select("id", "v")
    assert(spark.read.parquet(sink).exceptAll(full).isEmpty &&
      full.exceptAll(spark.read.parquet(sink)).isEmpty,
      "maintained sink diverged from the full recompute")
  }

  test("file-append log: maintenance cycles select appended FILES, no data " +
      "predicate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_flog").toString
    val src = s"$dir/src"
    // a temp VIEW hides file metadata columns, so an append-log view must
    // expose `_metadata` in its definition (FileSnapshots scaladoc); a
    // bare spark.read.parquet frame needs nothing
    def refresh(): Unit =
      spark.read.parquet(src).select(col("*"), col("_metadata"))
        .createOrReplaceTempView("flog_t")
    def maintained(): org.apache.spark.sql.DataFrame =
      Ivm.delta(spark.table("flog_t").filter(col("v") =!= "skip")
        .select("id", "v"))
    // distinct filesystem mtime ticks per batch: the strict `>` cut means
    // an append inside the SAME tick as an advance would be missed (see
    // FileSnapshots scaladoc — production logs cut on commit versions)
    def stampAll(millis: Long): Unit = {
      val d = java.nio.file.Paths.get(src)
      val it = java.nio.file.Files.list(d).iterator()
      while (it.hasNext) {
        val f = it.next()
        if (java.nio.file.Files.getLastModifiedTime(f).toMillis >= millis)
          java.nio.file.Files.setLastModifiedTime(f,
            java.nio.file.attribute.FileTime.fromMillis(millis))
      }
    }

    // cycle 0: initial files — everything is delta (the initial load)
    Seq((1L, "a"), (2L, "b"), (3L, "skip")).toDF("id", "v")
      .write.mode("append").parquet(src)
    stampAll(1000000L)
    refresh()
    FileSnapshots.track("flog_t", src)
    assert(maintained().collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(FileSnapshots.advance(spark, "flog_t"))
    val predAfterCut = DeltaSources.predicateFor("flog_t").get.sql
    assert(predAfterCut.contains("file_modification_time"),
      s"cut must be file-level, got: $predAfterCut")
    assert(maintained().count() == 0, "advanced cut must empty the delta")

    // cycle 1: append NEW FILES (ids overlap nothing; the data columns are
    // untouched by the cut — including an id LOWER than everything in the
    // base, which any data-column watermark would misclassify)
    Seq((0L, "z"), (9L, "c")).toDF("id", "v").write.mode("append").parquet(src)
    stampAll(2000000L)
    refresh()
    // the registered predicate text is UNCHANGED by the append — new files
    // are selected purely by listing against the existing cut
    assert(DeltaSources.predicateFor("flog_t").get.sql == predAfterCut,
      "append must not require re-registration")
    val d1 = maintained()
    assert(d1.collect().map(_.getLong(0)).toSet == Set(0L, 9L))
    // base arm = the complement: exactly the pre-append view
    val b1 = Ivm.baseOf(spark.table("flog_t").filter(col("v") =!= "skip")
      .select("id", "v"))
    assert(b1.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(FileSnapshots.advance(spark, "flog_t"))

    // cycle 2: no appends → advance is a no-op and the delta stays empty
    assert(!FileSnapshots.advance(spark, "flog_t"))
    assert(maintained().count() == 0)

    // δQ == Q(full) − Q(base) through a join: the file-level source
    // composes with the standard algebra (mixed arms read the base files)
    Seq((7L, "e")).toDF("id", "v").write.mode("append").parquet(src)
    stampAll(3000000L)
    refresh()
    // a static dimension: registered with an empty delta ("1 = 0"), so its
    // base arm is the full table and its δ arm contributes nothing.
    // Parquet-backed like every real dim — a LocalRelation-backed view's
    // alias Project trips the DeduplicateRelations alias limitation when
    // cloned across the rewrite's union arms (SURVEY §7.3 / memory note)
    Seq((0L, "small"), (7L, "big")).toDF("k", "sz")
      .write.mode("overwrite").parquet(s"$dir/dim")
    spark.read.parquet(s"$dir/dim").createOrReplaceTempView("flog_dim")
    DeltaSources.register("flog_dim", "1 = 0")
    val joined = spark.table("flog_t")
      .join(spark.table("flog_dim"), col("id") === col("k"), "inner")
      .select("id", "sz")
    val dj = Ivm.delta(joined).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(dj.toSet == Set((7L, "big")), s"join delta wrong: ${dj.toSet}")
  }

  test("file-append log × IvmAgg: aggregate view maintains from appended files") {
    import spark.implicits._
    // the production-shaped combo: a STORED aggregate view (parquet) plus
    // a file-append source — a maintenance cycle aggregates only the
    // appended files' rows and merges/upserts into the store; the signed
    // form (deltaAgg) additionally retracts the changed groups' old rows
    val dir = java.nio.file.Files.createTempDirectory("graft_flog_agg").toString
    val src = s"$dir/src"
    def refresh(): Unit =
      spark.read.parquet(src).select(col("*"), col("_metadata"))
        .createOrReplaceTempView("flog_agg_t")
    def stampAll(millis: Long): Unit = {
      val it = java.nio.file.Files.list(java.nio.file.Paths.get(src)).iterator()
      while (it.hasNext) {
        val f = it.next()
        if (java.nio.file.Files.getLastModifiedTime(f).toMillis >= millis)
          java.nio.file.Files.setLastModifiedTime(f,
            java.nio.file.attribute.FileTime.fromMillis(millis))
      }
    }
    val q = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("k").agg(count(lit(1)).as("cnt"), sum(col("x")).as("sx"))
    def current() = q(spark.table("flog_agg_t").select("k", "x"))

    Seq(("a", 1L), ("b", 2L)).toDF("k", "x").write.mode("append").parquet(src)
    stampAll(1000000L); refresh()
    FileSnapshots.track("flog_agg_t", src)
    assert(FileSnapshots.advance(spark, "flog_agg_t"))
    current().write.parquet(s"$dir/view")         // the stored view
    def view() = spark.read.parquet(s"$dir/view")

    // appended files touch group a and introduce group c
    Seq(("a", 10L), ("c", 5L)).toDF("k", "x").write.mode("append").parquet(src)
    stampAll(2000000L); refresh()

    // merge rung: stored view + δ-files partial == full recompute
    val merged = IvmAgg.merge(view(), IvmAgg.deltaPartial(current()))
    assert(merged.exceptAll(current()).isEmpty &&
      current().exceptAll(merged).isEmpty,
      "file-log aggregate merge must equal the recompute")

    // signed rung: retracts exactly group a's old row, applies to the view
    val sd = Ivm.deltaAgg(view(), current())
    val r = sd.retracts.collect()
    assert(r.length == 1 && r.head.getString(0) == "a" &&
      r.head.getLong(2) == 1L, s"expected group a's old row, got ${r.toSeq}")
    val applied = sd.applyTo(view())
    assert(applied.exceptAll(current()).isEmpty &&
      current().exceptAll(applied).isEmpty,
      "signed aggregate delta must reproduce the full view")
  }

  test("snapshot advanceAll: one consistent cut across a two-table join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snap2").toString
    def refresh(): Unit = {
      spark.read.parquet(s"$dir/a").createOrReplaceTempView("snap_a")
      spark.read.parquet(s"$dir/b").createOrReplaceTempView("snap_b")
    }
    Seq((1L, 10L)).toDF("ak", "bk").write.mode("append").parquet(s"$dir/a")
    Seq((10L, "x")).toDF("bk2", "bv").write.mode("append").parquet(s"$dir/b")
    refresh()
    Snapshots.track("snap_a", "ak")
    Snapshots.track("snap_b", "bk2")
    val q = () => Ivm.delta(
      spark.table("snap_a").join(spark.table("snap_b"),
        col("bk") === col("bk2"), "inner").select("ak", "bv"))
    assert(q().count() == 1)                          // initial load: all delta
    Snapshots.advanceAll(Map(
      "snap_a" -> spark.table("snap_a"), "snap_b" -> spark.table("snap_b")))
    assert(q().count() == 0)                          // cut advanced: empty δ

    // appends on BOTH tables; one cycle sees the cross terms exactly once
    Seq((2L, 10L), (3L, 20L)).toDF("ak", "bk")
      .write.mode("append").parquet(s"$dir/a")
    Seq((20L, "y")).toDF("bk2", "bv").write.mode("append").parquet(s"$dir/b")
    refresh()
    val d = q().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // δ = (new a=2 × old b=10) ∪ (new a=3 × new b=20); old×old excluded
    assert(d == Set((2L, "x"), (3L, "y")), s"wrong cycle delta: $d")
    Snapshots.advanceAll(Map(
      "snap_a" -> spark.table("snap_a"), "snap_b" -> spark.table("snap_b")))
    assert(q().count() == 0)
  }

  test("delta of a registered table under a user alias still resolves") {
    import spark.implicits._
    val df = Seq((2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "v")
    df.createOrReplaceTempView("alias_base")
    DeltaSources.register("alias_base", "k % 2 = 0")
    val n = Ivm.delta(spark.table("alias_base").alias("ab")).count()
    assert(n == 2, s"expected the two even-key delta rows, got $n")
  }

  test("delta-lake log: maintenance cycles select COMMITTED files by " +
      "version cut") {
    import spark.implicits._
    import graft.sources.DeltaLake
    val dir = java.nio.file.Files.createTempDirectory("graft_dlsnap")
      .toString

    def maintained(): org.apache.spark.sql.DataFrame = {
      DeltaLakeSnapshots.view(spark, "dlsnap_t")
      Ivm.delta(spark.table("dlsnap_t").filter(col("v") =!= "skip")
        .select("id", "v"))
    }

    // cycle 0: initial commit — everything is delta (the initial load)
    DeltaLake.stageCommit(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "skip")).toDF("id", "v"),
      Seq.empty, 0L)
    DeltaLakeSnapshots.track(spark, "dlsnap_t", dir)
    assert(maintained().collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(DeltaLakeSnapshots.advance(spark, "dlsnap_t"))
    assert(DeltaLakeSnapshots.cut("dlsnap_t").contains(0L))
    val predAfterCut = DeltaSources.predicateFor("dlsnap_t").get.sql
    assert(predAfterCut.contains("file_name"),
      s"cut must be file-level, got: $predAfterCut")
    // INDEX-NATIVE cut (r10): one graft_post_cut node, the file set as
    // a reference object — never an O(snapshot files) IN-list of plan
    // literals (the r9 shape, the round's standing `weak`)
    assert(predAfterCut.contains("graft_post_cut"),
      s"cut must resolve through the registry function: $predAfterCut")
    assert(!predAfterCut.contains(" IN ("),
      s"cut must not inline the file set as literals: $predAfterCut")
    locally {
      val analyzed = maintained()
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed.toString
      assert(analyzed.contains("graft_post_cut") &&
        !analyzed.contains(" IN ("),
        s"δ-arm analyzed plan must carry the O(1) cut node:\n$analyzed")
    }
    assert(maintained().count() == 0, "advanced cut must empty the delta")

    // cycle 1: a new COMMIT — including an id BELOW the base range,
    // which any data-column watermark would misclassify; the registered
    // predicate text is unchanged (new files are delta by construction)
    DeltaLake.stageCommit(spark, dir,
      Seq((0L, "z"), (9L, "c")).toDF("id", "v"), Seq.empty, 1L)
    assert(DeltaSources.predicateFor("dlsnap_t").get.sql == predAfterCut,
      "a commit must not require re-registration")
    assert(maintained().collect().map(_.getLong(0)).toSet == Set(0L, 9L))
    val b1 = Ivm.baseOf(spark.table("dlsnap_t").filter(col("v") =!= "skip")
      .select("id", "v"))
    assert(b1.collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "base arm must be exactly the cut snapshot")
    assert(DeltaLakeSnapshots.advance(spark, "dlsnap_t"))

    // cycle 2: no commits → advance no-ops, delta stays empty
    assert(!DeltaLakeSnapshots.advance(spark, "dlsnap_t"))
    assert(maintained().count() == 0)

    // δQ through a join with a static dim: the version-cut source
    // composes with the standard algebra (mixed arms read base files)
    DeltaLake.stageCommit(spark, dir, Seq((7L, "a")).toDF("id", "v"),
      Seq.empty, 2L)
    val dim = Seq(("a", 10L), ("b", 20L), ("z", 30L), ("c", 40L))
      .toDF("v", "w").localCheckpoint()
    DeltaLakeSnapshots.view(spark, "dlsnap_t")
    val dj = Ivm.delta(spark.table("dlsnap_t").select("id", "v")
      .join(dim, "v").select("id", "w"))
    assert(dj.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((7L, 10L)), "join delta must be the new commit's rows only")

    // a compaction between cuts breaks the pure-append assumption: the
    // guard must refuse (rewritten files would replay as inserts), and
    // advancing the cut rebases cleanly
    DeltaLake.stageCompactCommit(spark, dir, 3L)
    val err = intercept[IllegalArgumentException] {
      DeltaLakeSnapshots.view(spark, "dlsnap_t")
    }
    assert(err.getMessage.contains("pure appends"))
    assert(DeltaLakeSnapshots.advance(spark, "dlsnap_t"))
    assert(maintained().count() == 0,
      "rebased cut over the compacted snapshot must have an empty delta")
  }

  test("delta-lake log × IvmAgg: aggregate view maintains from commits") {
    import spark.implicits._
    import graft.sources.DeltaLake
    val dir = java.nio.file.Files.createTempDirectory("graft_dlagg")
      .toString
    val q = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("k").agg(count(lit(1)).as("cnt"), sum(col("x")).as("sx"))
    def current() = {
      DeltaLakeSnapshots.view(spark, "dlagg_t")
      q(spark.table("dlagg_t").select("k", "x"))
    }
    DeltaLake.stageCommit(spark, dir,
      Seq(("a", 1L), ("b", 2L)).toDF("k", "x"), Seq.empty, 0L)
    DeltaLakeSnapshots.track(spark, "dlagg_t", dir)
    assert(DeltaLakeSnapshots.advance(spark, "dlagg_t"))
    val viewDir = java.nio.file.Files
      .createTempDirectory("graft_dlagg_view").toString
    current().write.mode("overwrite").parquet(viewDir)
    def view() = spark.read.parquet(viewDir)

    // the next commit touches group a and introduces group c
    DeltaLake.stageCommit(spark, dir,
      Seq(("a", 10L), ("c", 5L)).toDF("k", "x"), Seq.empty, 1L)

    // merge rung: stored view + δ-commit partial == full recompute
    val merged = IvmAgg.merge(view(), IvmAgg.deltaPartial(current()))
    assert(merged.exceptAll(current()).isEmpty &&
      current().exceptAll(merged).isEmpty,
      "commit-log aggregate merge must equal the recompute")
    // signed rung applies to the stored view
    val sd = Ivm.deltaAgg(view(), current())
    val applied = sd.applyTo(view())
    assert(applied.exceptAll(current()).isEmpty &&
      current().exceptAll(applied).isEmpty,
      "signed aggregate delta over commits must reproduce the view")
  }

  test("untrack releases the cut set AND the source registration") {
    import graft.sources.DeltaLake
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_untrack")
      .toString
    DeltaLake.stageCommit(spark, dir,
      Seq((1L, "a")).toDF("id", "v"), Seq.empty, 0L)
    DeltaLakeSnapshots.track(spark, "untrack_t", dir, at = Some(0L))
    assert(DeltaSources.tables.contains("untrack_t"))
    DeltaLakeSnapshots.view(spark, "untrack_t")
    assert(Ivm.delta(spark.table("untrack_t").select("id")).count() == 0)
    DeltaLakeSnapshots.untrack("untrack_t")
    // the registration is gone — an untracked table is exactly like a
    // never-tracked one (no dangling graft_post_cut that would fail
    // analysis), and re-tracking works from scratch
    assert(!DeltaSources.tables.contains("untrack_t"))
    assert(DeltaSources.predicateFor("untrack_t").isEmpty)
    DeltaLakeSnapshots.track(spark, "untrack_t", dir, at = Some(0L))
    DeltaLakeSnapshots.view(spark, "untrack_t")
    assert(Ivm.delta(spark.table("untrack_t").select("id")).count() == 0)
    DeltaLakeSnapshots.untrack("untrack_t")
  }

  test("re-sync onto the all-delta branch releases the prior cut set") {
    import graft.sources.DeltaLake
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_resync")
      .toString
    DeltaLake.stageCommit(spark, dir,
      Seq((1L, "a")).toDF("id", "v"), Seq.empty, 0L)
    // cut at v0 registers a set; re-tracking with NO cut must release
    // it — otherwise a stale million-file set stays pinned for the
    // JVM's life behind a '1 = 1' registration that never reads it
    DeltaLakeSnapshots.track(spark, "resync_t", dir, at = Some(0L))
    assert(CutRegistry.has("deltalake/resync_t"))
    DeltaLakeSnapshots.track(spark, "resync_t", dir, at = None)
    assert(!CutRegistry.has("deltalake/resync_t"),
      "all-delta re-sync must release the stale cut set")
    // and the registration still works: everything is delta now
    DeltaLakeSnapshots.view(spark, "resync_t")
    assert(Ivm.delta(spark.table("resync_t").select("id")).count() == 1)
    DeltaLakeSnapshots.untrack("resync_t")
  }

  test("cut tokens embedding quotes or control chars are rejected loudly") {
    // the token is interpolated into predicate SQL inside single
    // quotes — a quote would render unparseable SQL (or a different
    // literal than the registry key), so registration must refuse
    val e = intercept[IllegalArgumentException] {
      CutRegistry.put(spark, "deltalake/bad'name", Seq("f1"))
    }
    assert(e.getMessage.contains("quote"))
    intercept[IllegalArgumentException] {
      CutRegistry.predicateSql("a\\b")
    }
    intercept[IllegalArgumentException] {
      CutRegistry.predicateSql("a\nb")
    }
  }
}
