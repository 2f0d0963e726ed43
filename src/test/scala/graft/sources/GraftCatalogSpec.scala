package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The file-based transactional catalog ([[GraftCatalog]]): named SQL
  * access over pinned table versions, atomic multi-table transactions
  * (all pins swap in one exclusive catalog commit — catalog readers
  * see everything or nothing), snapshot isolation against later table
  * heads, and loud lost-race behavior.
  */
class GraftCatalogSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  // one warehouse per JVM: Spark caches a catalog instance per NAME at
  // first use, so the name binds to this suite's warehouse for good
  private lazy val wh: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_cat_wh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.tcat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tcat.warehouse", d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_cat_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"g${i % 2}")).toDF("id", "g").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("registered tables read by NAME through SQL — both formats, " +
      "spliced to native scans, pinned at registration") {
    val dd = freshDir("orders")
    DeltaLake.write(spark, dd, frame(1 to 20))
    val ii = freshDir("items")
    Iceberg.write(spark, ii, frame(11 to 30))
    GraftCatalog.register(spark, wh, "db.orders", "graft-deltalake", dd)
    GraftCatalog.register(spark, wh, "db.items", "graft-iceberg", ii)
    assert(spark.sql("SELECT count(*) AS n FROM tcat.db.orders")
      .head().getLong(0) == 20L)
    // cross-format, cross-table join by NAME only
    assert(spark.sql(
      """SELECT count(*) AS n FROM tcat.db.orders o
        |JOIN tcat.db.items i ON o.id = i.id""".stripMargin)
      .head().getLong(0) == 10L)
    // PINNED: a later table-head write is invisible until re-register
    DeltaLake.write(spark, dd, frame(21 to 25))
    assert(spark.sql("SELECT count(*) AS n FROM tcat.db.orders")
      .head().getLong(0) == 20L,
      "a catalog read followed the table head instead of its pin")
    GraftCatalog.register(spark, wh, "db.orders", "graft-deltalake", dd)
    assert(spark.sql("SELECT count(*) AS n FROM tcat.db.orders")
      .head().getLong(0) == 25L)
    // the splice leaves a native file scan
    val plan = spark.sql("SELECT * FROM tcat.db.orders WHERE id > 3")
      .queryExecution.executedPlan
    assert(plan.collectLeaves().exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
      s"catalog read did not splice to a native scan:\n$plan")
  }

  test("SQL writes through the catalog: INSERT INTO / INSERT " +
      "OVERWRITE / writeTo().append() commit natively and AUTO " +
      "RE-PIN; time-traveled relations refuse writes") {
    val dd = freshDir("ins")
    DeltaLake.write(spark, dd, frame(1 to 10))
    GraftCatalog.register(spark, wh, "ins.a", "graft-deltalake", dd)
    spark.sql("INSERT INTO tcat.ins.a VALUES (11, 'g1'), (12, 'g0')")
    // the write re-pinned: visible through the catalog immediately
    assert(ids(spark.sql("SELECT * FROM tcat.ins.a").toDF()) ==
      (1L to 12L).toSet)
    // INSERT ... SELECT across the catalog and a path identifier
    spark.sql(
      s"INSERT INTO tcat.ins.a SELECT id + 20, g FROM graft_delta.`$dd`" +
        " WHERE id <= 2")
    assert(ids(spark.sql("SELECT * FROM tcat.ins.a").toDF()) ==
      ((1L to 12L) ++ Seq(21L, 22L)).toSet)
    // INSERT OVERWRITE replaces the content (and re-pins)
    spark.sql("INSERT OVERWRITE tcat.ins.a VALUES (100, 'gx')")
    assert(ids(spark.sql("SELECT * FROM tcat.ins.a").toDF()) ==
      Set(100L))
    // the DataFrameWriterV2 path
    frame(101 to 105).writeTo("tcat.ins.a").append()
    assert(ids(spark.sql("SELECT * FROM tcat.ins.a").toDF()) ==
      (Set(100L) ++ (101L to 105L)))
    // iceberg tables write the same way
    val ii = freshDir("insi")
    Iceberg.write(spark, ii, frame(1 to 5))
    GraftCatalog.register(spark, wh, "ins.b", "graft-iceberg", ii)
    spark.sql("INSERT INTO tcat.ins.b VALUES (6, 'g0')")
    assert(ids(spark.sql("SELECT * FROM tcat.ins.b").toDF()) ==
      (1L to 6L).toSet)
    // a historical pin is read-only — exercised DIRECTLY (Spark's
    // parser rejects a temporal clause on an INSERT target before the
    // guard could even run, so SQL can't reach it)
    val ttRel = GraftCatalogTable("tcat.ins.a",
      GraftCatalog.entries(wh)("ins.a"), wh, "ins.a", timeTravel = true)
    val ett = intercept[IllegalArgumentException] {
      ttRel.newWriteBuilder(null)
    }
    assert(ett.getMessage.contains("time-traveled"), ett.getMessage)
    // the STORED schema's required fields are enforced even though the
    // V2 resolver only saw the all-nullable read schema
    val enull = intercept[Exception] {
      spark.sql(
        "INSERT INTO tcat.ins.a VALUES (CAST(NULL AS BIGINT), 'g')")
    }
    assert(enull.getMessage.contains("required") ||
      (enull.getCause != null &&
        enull.getCause.getMessage.contains("required")),
      s"expected the required-column guard, got: $enull")
  }

  test("SQL time travel through the catalog: VERSION AS OF and " +
      "TIMESTAMP AS OF override the pin for that query only") {
    val dd = freshDir("tt")
    DeltaLake.write(spark, dd, frame(1 to 10))
    DeltaLake.write(spark, dd, frame(11 to 20))
    GraftCatalog.register(spark, wh, "tt.a", "graft-deltalake", dd)
    assert(spark.sql("SELECT count(*) AS n FROM tcat.tt.a")
      .head().getLong(0) == 20L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM tcat.tt.a VERSION AS OF 0")
      .head().getLong(0) == 10L)
    // TIMESTAMP AS OF now = the latest version
    assert(spark.sql(
      "SELECT count(*) AS n FROM tcat.tt.a TIMESTAMP AS OF " +
        "current_timestamp()")
      .head().getLong(0) == 20L)
    // the pin itself is untouched
    assert(spark.sql("SELECT count(*) AS n FROM tcat.tt.a")
      .head().getLong(0) == 20L)
    // iceberg snapshot-id travel (snapshot ids are version ordinals)
    val ii = freshDir("tti")
    val s1 = Iceberg.write(spark, ii, frame(1 to 10))
    Iceberg.write(spark, ii, frame(11 to 20))
    GraftCatalog.register(spark, wh, "tt.b", "graft-iceberg", ii)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tcat.tt.b VERSION AS OF $s1")
      .head().getLong(0) == 10L)
  }

  test("multi-table transaction: BOTH pins swap atomically; a reader " +
      "between the table writes and the swap sees the OLD state of " +
      "both") {
    val d1 = freshDir("t1")
    DeltaLake.write(spark, d1, frame(1 to 10))
    val d2 = freshDir("t2")
    Iceberg.write(spark, d2, frame(1 to 10))
    GraftCatalog.register(spark, wh, "tx.a", "graft-deltalake", d1)
    GraftCatalog.register(spark, wh, "tx.b", "graft-iceberg", d2)
    GraftCatalog.transaction(spark, wh) { tx =>
      tx.write("tx.a", frame(11 to 20))
      // mid-transaction: the CATALOG still serves the old pins even
      // though tx.a's table head already advanced
      assert(ids(GraftCatalog.entries(wh)("tx.a") match {
        case e => GraftCatalogTable("tx.a", e, wh, "tx.a").resolved(spark)
      }) == (1L to 10L).toSet,
        "a catalog reader saw a partial transaction")
      tx.write("tx.b", frame(11 to 20))
      // the transaction's own reads see its staged writes
      assert(ids(tx.read("tx.a")) == (1L to 20L).toSet)
    }
    // post-swap: both visible together
    assert(spark.sql("SELECT count(*) AS n FROM tcat.tx.a")
      .head().getLong(0) == 20L)
    assert(spark.sql("SELECT count(*) AS n FROM tcat.tx.b")
      .head().getLong(0) == 20L)
  }

  test("a transaction that FAILS before the swap leaves every pin " +
      "untouched — the staged table version is an orphan, not a " +
      "partial commit") {
    val d1 = freshDir("f1")
    DeltaLake.write(spark, d1, frame(1 to 10))
    GraftCatalog.register(spark, wh, "fx.a", "graft-deltalake", d1)
    intercept[RuntimeException] {
      GraftCatalog.transaction(spark, wh) { tx =>
        tx.write("fx.a", frame(11 to 20))
        throw new RuntimeException("validation failed")
      }
    }
    assert(spark.sql("SELECT count(*) AS n FROM tcat.fx.a")
      .head().getLong(0) == 10L,
      "a failed transaction leaked its staged write into the catalog")
    // the table head DID advance (documented path-vs-catalog split)
    assert(ids(DeltaLake.snapshot(spark, d1)) == (1L to 20L).toSet)
  }

  test("lost race: a catalog commit landing mid-transaction fails the " +
      "swap loudly; DML rides transactions too") {
    val d1 = freshDir("r1")
    DeltaLake.write(spark, d1, frame(1 to 10))
    GraftCatalog.register(spark, wh, "rx.a", "graft-deltalake", d1)
    intercept[java.util.ConcurrentModificationException] {
      GraftCatalog.transaction(spark, wh) { tx =>
        tx.write("rx.a", frame(11 to 12))
        // an interloper advances the catalog before our swap
        GraftCatalog.register(spark, wh, "rx.loser", "graft-deltalake",
          d1)
      }
    }
    // DML in a transaction: delete through the native writer — on a
    // FRESH table (rx.a's head carries the aborted transaction's
    // orphaned rows: staging is head-based, so a later pin advance
    // ADOPTS orphans — the documented catalog-vs-path split; atomicity
    // of the swap is the guarantee, not head rollback)
    val d3 = freshDir("r2")
    DeltaLake.write(spark, d3, frame(1 to 10))
    GraftCatalog.register(spark, wh, "rx.d", "graft-deltalake", d3)
    GraftCatalog.transaction(spark, wh) { tx =>
      tx.delete("rx.d", col("id") % 2 === 0)
    }
    assert(ids(spark.sql("SELECT * FROM tcat.rx.d").toDF()) ==
      (1L to 10L).filter(_ % 2 == 1).toSet)
    // a transaction whose only operation is a NO-OP delete commits
    // trivially (nothing to swap) — never an abort
    GraftCatalog.transaction(spark, wh) { tx =>
      tx.delete("rx.d", col("id") > 1000)
    }
    assert(ids(spark.sql("SELECT * FROM tcat.rx.d").toDF()) ==
      (1L to 10L).filter(_ % 2 == 1).toSet)
    // dotted identifier segments are refused (flat-key ambiguity)
    intercept[IllegalArgumentException] {
      GraftCatalog.register(spark, wh, "db..bad", "graft-deltalake", d3)
    }
    // drop + rename round out the catalog ops
    GraftCatalog.rename(wh, "rx.d", "rx.z")
    assert(spark.sql("SELECT count(*) AS n FROM tcat.rx.z")
      .head().getLong(0) == 5L)
    assert(GraftCatalog.drop(wh, "rx.z"))
    intercept[Exception] {
      spark.sql("SELECT * FROM tcat.rx.z").collect()
    }
  }

  test("vacuumOrphans reclaims aborted-transaction staging: table " +
      "heads return to the pins, orphan assets are deleted, pinned " +
      "content (and its time travel) is never touched") {
    val d1 = freshDir("vo1")
    DeltaLake.write(spark, d1, frame(1 to 10))
    DeltaLake.write(spark, d1, frame(11 to 15))
    val d2 = freshDir("vo2")
    Iceberg.write(spark, d2, frame(1 to 10))
    GraftCatalog.register(spark, wh, "vo.a", "graft-deltalake", d1)
    GraftCatalog.register(spark, wh, "vo.b", "graft-iceberg", d2)
    // an aborted transaction: both table heads advance, no pin moves
    intercept[RuntimeException] {
      GraftCatalog.transaction(spark, wh) { tx =>
        tx.write("vo.a", frame(16 to 30))
        tx.write("vo.b", frame(11 to 30))
        throw new RuntimeException("abort")
      }
    }
    assert(ids(DeltaLake.snapshot(spark, d1)) == (1L to 30L).toSet,
      "precondition: the orphan staged write is on the delta head")
    assert(ids(Iceberg.snapshot(spark, d2)) == (1L to 30L).toSet,
      "precondition: the orphan staged write is on the iceberg head")
    val reclaimed = GraftCatalog.vacuumOrphans(spark, wh)
    // the suite's warehouse is shared: earlier tests' aborted/raced
    // stagings are legitimate orphans too — require ours, allow theirs
    assert(Set("vo.a", "vo.b").subsetOf(reclaimed.keySet),
      s"expected both orphaned tables reclaimed: ${reclaimed.keySet}")
    assert(reclaimed.values.forall(_.nonEmpty))
    // heads are back at the pins; catalog reads unchanged
    assert(ids(DeltaLake.snapshot(spark, d1)) == (1L to 15L).toSet,
      "delta head did not return to the pin")
    assert(ids(Iceberg.snapshot(spark, d2)) == (1L to 10L).toSet,
      "iceberg head did not return to the pin")
    assert(ids(spark.sql("SELECT * FROM tcat.vo.a").toDF()) ==
      (1L to 15L).toSet)
    assert(ids(spark.sql("SELECT * FROM tcat.vo.b").toDF()) ==
      (1L to 10L).toSet)
    // time travel BEFORE the pin is untouched
    assert(ids(spark.sql("SELECT * FROM tcat.vo.a VERSION AS OF 0")
      .toDF()) == (1L to 10L).toSet,
      "reclaim touched pre-pin history")
    // a clean catalog reclaims nothing
    assert(GraftCatalog.vacuumOrphans(spark, wh)
      .filterKeys(Set("vo.a", "vo.b")).isEmpty)
    // an orphan that RE-ADDS a pre-pin historical file (a direct
    // restore nobody pinned): reclaiming it must not delete the file
    // — pre-pin time travel stays readable (the keep set spans every
    // retained version, not just the cut state)
    val d3 = freshDir("vo3")
    DeltaLake.write(spark, d3, frame(1 to 10))
    DeltaLake.write(spark, d3, frame(11 to 20), mode = "overwrite")
    GraftCatalog.register(spark, wh, "vo.c", "graft-deltalake", d3)
    DeltaLake.restore(spark, d3, 0L) // orphan v2 re-adds v0's file
    assert(GraftCatalog.vacuumOrphans(spark, wh).contains("vo.c"))
    assert(ids(spark.sql("SELECT * FROM tcat.vo.c").toDF()) ==
      (11L to 20L).toSet)
    assert(ids(DeltaLake.snapshot(spark, d3, Some(0L))) ==
      (1L to 10L).toSet,
      "reclaiming the re-add orphan destroyed pre-pin time travel")
    // the next transaction stages from the reclaimed head and commits
    GraftCatalog.transaction(spark, wh) { tx =>
      tx.write("vo.a", frame(16 to 20))
    }
    assert(ids(spark.sql("SELECT * FROM tcat.vo.a").toDF()) ==
      (1L to 20L).toSet)
  }

  test("SQL DELETE/UPDATE through the catalog: native DML commit + " +
      "monotone re-pin; a no-op DML moves nothing") {
    val dd = freshDir("dml_a")
    DeltaLake.write(spark, dd, frame(1 to 10))
    GraftCatalog.register(spark, wh, "dml.a", "graft-deltalake", dd)
    val pin0 = GraftCatalog.entries(wh)("dml.a").version
    spark.sql("DELETE FROM tcat.dml.a WHERE id % 2 = 0")
    assert(ids(spark.sql("SELECT * FROM tcat.dml.a").toDF()) ==
      Set(1L, 3L, 5L, 7L, 9L))
    val pin1 = GraftCatalog.entries(wh)("dml.a").version
    assert(pin1 > pin0, "DELETE did not re-pin the catalog entry")
    // the delete rode a VERSIONED table commit: time travel still
    // serves the pre-delete content
    assert(ids(spark.sql(
      s"SELECT * FROM tcat.dml.a VERSION AS OF $pin0").toDF()) ==
      (1L to 10L).toSet)
    // a DELETE matching nothing is a table no-op AND a pin no-op
    spark.sql("DELETE FROM tcat.dml.a WHERE id > 1000")
    assert(GraftCatalog.entries(wh)("dml.a").version == pin1,
      "a no-op DELETE moved the pin")
    // UPDATE through the same route
    spark.sql("UPDATE tcat.dml.a SET g = 'zz' WHERE id = 3")
    assert(spark.sql(
      "SELECT g FROM tcat.dml.a WHERE id = 3").head().getString(0)
      == "zz")
    assert(GraftCatalog.entries(wh)("dml.a").version > pin1,
      "UPDATE did not re-pin")
    // an ALL-IDENTITY update (`SET g = g`) REWRITES matched rows
    // (Spark/Delta semantics, r13 advice) — the pin moves with the
    // commit and content is unchanged
    val pinNoop = GraftCatalog.entries(wh)("dml.a").version
    spark.sql("UPDATE tcat.dml.a SET g = g")
    assert(GraftCatalog.entries(wh)("dml.a").version == pinNoop + 1,
      "an identity UPDATE must commit a rewrite")
    // iceberg tables take the same statements
    val ii = freshDir("dml_i")
    Iceberg.write(spark, ii, frame(1 to 10))
    GraftCatalog.register(spark, wh, "dml.i", "graft-iceberg", ii)
    spark.sql("DELETE FROM tcat.dml.i WHERE id <= 4")
    spark.sql("UPDATE tcat.dml.i SET g = concat(g, '!') WHERE id = 5")
    assert(spark.sql("SELECT * FROM tcat.dml.i ORDER BY id").toDF()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((5L, "g1!"), (6L, "g0"), (7L, "g1"), (8L, "g0"), (9L, "g1"),
        (10L, "g0")))
  }

  test("DML subqueries lower by materialization: IN (SELECT …), " +
      "NOT IN, single-equality EXISTS, scalar; unsupported " +
      "correlation refuses") {
    val dd = freshDir("dml_sq")
    DeltaLake.write(spark, dd, frame(1 to 20))
    GraftCatalog.register(spark, wh, "dml.sq", "graft-deltalake", dd)
    val ii = freshDir("dml_sqi")
    Iceberg.write(spark, ii, frame(1 to 20))
    GraftCatalog.register(spark, wh, "dml.sqi", "graft-iceberg", ii)
    Seq(2L, 4L, 6L, 8L).toDF("k").createOrReplaceTempView("sq_aux")
    // uncorrelated IN — the lowered InSet predicate still stats-prunes
    spark.sql("DELETE FROM tcat.dml.sq WHERE id IN " +
      "(SELECT k FROM sq_aux WHERE k <= 6)")
    assert(ids(spark.sql("SELECT * FROM tcat.dml.sq").toDF()) ==
      (1L to 20L).toSet -- Set(2L, 4L, 6L))
    // NOT IN (SQL three-valued semantics ride the same InSet)
    spark.sql("DELETE FROM tcat.dml.sq WHERE id >= 15 AND id NOT IN " +
      "(SELECT k FROM sq_aux)")
    assert(ids(spark.sql("SELECT * FROM tcat.dml.sq").toDF()) ==
      ((1L to 14L).toSet -- Set(2L, 4L, 6L)),
      "NOT IN must delete 15..20 (none are in the aux set)")
    // correlated EXISTS (single equality + uncorrelated residual),
    // on the ICEBERG table, referencing the DELTA table
    spark.sql("DELETE FROM tcat.dml.sqi t WHERE EXISTS " +
      "(SELECT 1 FROM tcat.dml.sq s WHERE s.id = t.id AND s.id > 9)")
    assert(ids(spark.sql("SELECT * FROM tcat.dml.sqi").toDF()) ==
      (1L to 20L).toSet -- (10L to 14L).toSet)
    // NOT EXISTS rides the same decorrelation under its Not
    spark.sql("UPDATE tcat.dml.sqi SET g = 'none' WHERE id <= 3 AND " +
      "NOT EXISTS (SELECT 1 FROM sq_aux a WHERE a.k = id)")
    assert(spark.sql("SELECT g FROM tcat.dml.sqi WHERE id = 1")
      .head().getString(0) == "none")
    assert(spark.sql("SELECT g FROM tcat.dml.sqi WHERE id = 2")
      .head().getString(0) == "g0", "id=2 is in aux — NOT EXISTS false")
    // uncorrelated scalar subquery → literal
    spark.sql("UPDATE tcat.dml.sq SET g = 'top' " +
      "WHERE id = (SELECT MAX(id) FROM tcat.dml.sq)")
    assert(spark.sql("SELECT g FROM tcat.dml.sq WHERE id = 14")
      .head().getString(0) == "top")
    // scalar subqueries lower on the VALUE side of SET too
    spark.sql("UPDATE tcat.dml.sq SET g = " +
      "concat('v', (SELECT MAX(k) FROM sq_aux)) WHERE id = 1")
    assert(spark.sql("SELECT g FROM tcat.dml.sq WHERE id = 1")
      .head().getString(0) == "v8",
      "SET value must take the materialized scalar")
    // refusals: non-equality correlation, correlated scalar
    val e1 = intercept[Exception] {
      spark.sql("DELETE FROM tcat.dml.sq t WHERE EXISTS " +
        "(SELECT 1 FROM sq_aux a WHERE a.k > t.id)")
    }
    assert(e1.getMessage.contains("single"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("DELETE FROM tcat.dml.sq t WHERE id > " +
        "(SELECT MIN(a.k) FROM sq_aux a WHERE a.k = t.id)")
    }
    assert(e2.getMessage.contains("correlated scalar"), e2.getMessage)
    // the cap refuses loudly, and a conf raise lifts it
    spark.conf.set("spark.graft.dml.subqueryLimit", "2")
    val e3 = intercept[Exception] {
      spark.sql("DELETE FROM tcat.dml.sq WHERE id IN " +
        "(SELECT k FROM sq_aux)")
    }
    assert(e3.getMessage.contains("subqueryLimit"), e3.getMessage)
    spark.conf.unset("spark.graft.dml.subqueryLimit")
  }

  test("correlated IN decorrelates to a keyed PAIR membership " +
      "(single-equality envelope, NOT IN keeps empty-group rows); " +
      "IN members coerce to the outer column's type") {
    val dd = freshDir("dml_cin")
    DeltaLake.write(spark, dd,
      (1 to 12).map(i => (i.toLong, (i % 3).toLong, s"g$i"))
        .toDF("id", "grp", "g").coalesce(1))
    GraftCatalog.register(spark, wh, "dml.cin", "graft-deltalake", dd)
    Seq((0L, "g3"), (0L, "g6"), (1L, "g4"), (2L, "nope"))
      .toDF("ak", "av").createOrReplaceTempView("cin_aux")
    // delete rows whose g appears among the aux values FOR THE SAME
    // group — the correlated-IN shape the r16 bridge refused
    spark.sql("DELETE FROM tcat.dml.cin t WHERE t.g IN " +
      "(SELECT a.av FROM cin_aux a WHERE a.ak = t.grp)")
    assert(ids(spark.sql("SELECT * FROM tcat.dml.cin").toDF()) ==
      (1L to 12L).toSet -- Set(3L, 4L, 6L),
      "(grp,g) pairs (0,g3) (0,g6) (1,g4) must delete; (2,nope) " +
        "matches no row")
    // NOT IN against an EMPTY correlated group is TRUE (x IN ∅ =
    // false) — the rows must be kept/updated, not null-filtered
    spark.sql("UPDATE tcat.dml.cin t SET g = 'kept' WHERE id <= 2 " +
      "AND t.g NOT IN (SELECT a.av FROM cin_aux a " +
      "WHERE a.ak = t.grp AND a.ak = 999)")
    assert(spark.sql(
      "SELECT COUNT(*) FROM tcat.dml.cin WHERE g = 'kept'")
      .head().getLong(0) == 2L,
      "empty correlated groups must satisfy NOT IN")
    // correlation beyond one equality still refuses loudly
    val e1 = intercept[Exception] {
      spark.sql("DELETE FROM tcat.dml.cin t WHERE t.g IN " +
        "(SELECT a.av FROM cin_aux a WHERE a.ak > t.grp)")
    }
    assert(e1.getMessage.contains("one equality"), e1.getMessage)
    // UNCORRELATED IN with a narrower subquery type, CATALOG arm:
    // the analyzer's own coercion has already cast one side — pin
    // that the lowered InSet honors it (a silent no-op here was the
    // r16-advice failure shape)
    Seq(1, 2).toDF("ki").createOrReplaceTempView("cin_int")
    spark.sql(
      "DELETE FROM tcat.dml.cin WHERE id IN (SELECT ki FROM cin_int)")
    assert(ids(spark.sql("SELECT * FROM tcat.dml.cin").toDF()) ==
      (5L to 12L).toSet -- Set(6L),
      "int members must coerce to the bigint id column")
    // PATH arm (pre-resolution): subquery-bearing predicates resolve
    // against a LocalRelation of the target's STORED schema, so the
    // analyzer's own IN coercion applies exactly like the catalog arm
    // (r16 advice: an uncoerced Integer-vs-Long InSet compared
    // different runtime classes and the DELETE silently no-opped)
    val dp = freshDir("dml_cin_p")
    DeltaLake.write(spark, dp,
      (1 to 8).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1))
    spark.sql(
      s"DELETE FROM graft_delta.`$dp` WHERE id IN (SELECT ki FROM cin_int)")
    assert(DeltaLake.snapshot(spark, dp).select("id").collect()
      .map(_.getLong(0)).toSet == (3L to 8L).toSet,
      "path-arm int members must coerce to the bigint column")
    // the reverse: INT column, BIGINT members — SQL compares at the
    // wider type; the out-of-range key matches no row
    val di = freshDir("dml_cin_i")
    DeltaLake.write(spark, di,
      (1 to 6).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1))
    Seq(3L, 5000000000L).toDF("kb").createOrReplaceTempView("cin_big")
    spark.sql(
      s"DELETE FROM graft_delta.`$di` WHERE k IN (SELECT kb FROM cin_big)")
    assert(DeltaLake.snapshot(spark, di).select("k").collect()
      .map(_.getInt(0)).toSet == Set(1, 2, 4, 5, 6),
      "3 deletes; 5000000000 matches no int row")
    // fractional members against a bigint column — both arms compare
    // as double per SQL coercion: 5.0 deletes id=5, 1.5 nothing
    Seq(1.5, 5.0).toDF("kd").createOrReplaceTempView("cin_dbl")
    spark.sql(
      s"DELETE FROM graft_delta.`$dp` WHERE id IN (SELECT kd FROM cin_dbl)")
    assert(DeltaLake.snapshot(spark, dp).select("id").collect()
      .map(_.getLong(0)).toSet == Set(3L, 4L, 6L, 7L, 8L),
      "path arm compares as double")
    spark.sql(
      "DELETE FROM tcat.dml.cin WHERE id IN (SELECT kd FROM cin_dbl)")
    assert(ids(spark.sql("SELECT * FROM tcat.dml.cin").toDF()) ==
      (7L to 12L).toSet,
      "catalog arm compares as double: 5.0 deletes id=5, 1.5 nothing")
    // EXISTS on a PATH target (r16 verdict #5 — the refusal was an
    // inconsistent surface): correlation marks against the resolved
    // LocalRelation, correlated EXISTS and correlated IN both work
    spark.sql(s"DELETE FROM graft_delta.`$dp` t WHERE EXISTS " +
      "(SELECT 1 FROM cin_int a WHERE a.ki + 2 = t.id)")
    assert(DeltaLake.snapshot(spark, dp).select("id").collect()
      .map(_.getLong(0)).toSet == Set(6L, 7L, 8L),
      "path-arm correlated EXISTS must delete ids 3 and 4")
    spark.sql(s"UPDATE graft_delta.`$dp` t SET v = 'none' WHERE " +
      "NOT EXISTS (SELECT 1 FROM cin_int a WHERE a.ki * 4 = t.id)")
    assert(DeltaLake.snapshot(spark, dp)
      .filter(org.apache.spark.sql.functions.col("v") === "none")
      .count() == 2L, "NOT EXISTS keeps 4*ki hits (id 8) unscrubbed")
  }

  test("NESTED-FIELD SET: UPDATE and MERGE assign struct members " +
      "(whole-column rebuild via withField); conflicts refuse") {
    import org.apache.spark.sql.functions.struct
    def structFrame = (1 to 4).map(i =>
      (i.toLong, i * 1.0, s"v$i", i.toLong * 10))
      .toDF("id", "a", "b", "c")
      .select(col("id"),
        struct(col("a"), col("b"),
          struct(col("c")).as("inner")).as("s")).coalesce(1)
    val dd = freshDir("nset_d")
    DeltaLake.write(spark, dd, structFrame)
    GraftCatalog.register(spark, wh, "nset.d", "graft-deltalake", dd)
    val ii = freshDir("nset_i")
    Iceberg.write(spark, ii, structFrame)
    GraftCatalog.register(spark, wh, "nset.i", "graft-iceberg", ii)
    for (tbl <- Seq("tcat.nset.d", "tcat.nset.i")) {
      // two members of one struct + a DEEP member, one statement:
      // every other member must survive the rebuild
      spark.sql(s"UPDATE $tbl SET s.a = s.a + 100.0, " +
        "s.inner.c = 999 WHERE id = 2")
      val r = spark.sql(
        s"SELECT s.a, s.b, s.inner.c FROM $tbl WHERE id = 2").head()
      assert((r.getDouble(0), r.getString(1), r.getLong(2)) ==
        (102.0, "v2", 999L), s"$tbl: $r")
      assert(spark.sql(
        s"SELECT s.a FROM $tbl WHERE id = 3").head().getDouble(0)
        == 3.0, "untouched rows must keep their values")
    }
    // MERGE matched-update with a nested SET target
    Seq((1L, 7.5)).toDF("id", "na").createOrReplaceTempView("nset_src")
    spark.sql(
      """MERGE INTO tcat.nset.d t USING nset_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.s.a = s.na
        |""".stripMargin)
    val m = spark.sql(
      "SELECT s.a, s.b FROM tcat.nset.d WHERE id = 1").head()
    assert((m.getDouble(0), m.getString(1)) == (7.5, "v1"))
    // conflicting whole-column + nested assignment refuses
    val e = intercept[Exception] {
      spark.sql("UPDATE tcat.nset.d SET s = named_struct('a', 1.0, " +
        "'b', 'x', 'inner', named_struct('c', 1L)), s.a = 2.0")
    }
    assert(e.getMessage.contains("conflicting") ||
      e.getMessage.toLowerCase.contains("duplicate"), e.getMessage)
    // OVERLAPPING nested targets (one path contains the other) refuse
    // — the chained rebuild would be assignment-order-dependent
    val e2 = intercept[Exception] {
      spark.sql("UPDATE tcat.nset.d SET s.inner = named_struct(" +
        "'c', 1L), s.inner.c = 2")
    }
    assert(e2.getMessage.contains("conflicting SET targets"),
      e2.getMessage)
    // path-identifier arm takes nested SET too — MIXED CASE included
    // (SQL resolution is case-insensitive; the writers canonicalize)
    spark.sql(s"UPDATE graft_delta.`$dd` SET S.b = 'zz' WHERE id = 4")
    assert(spark.sql(s"SELECT s.b FROM graft_delta.`$dd` " +
      "WHERE id = 4").head().getString(0) == "zz")
  }

  test("MAP-KEY SET: UPDATE assigns map entries (whole-map key " +
      "upsert — existing keys replace, absent keys insert); through-" +
      "map paths and non-parsing keys refuse") {
    import org.apache.spark.sql.functions.{expr => sqlExpr}
    def mapFrame = (1 to 4).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v")
      .withColumn("m", sqlExpr("map('a', id * 10, 'b', id * 100)"))
      .withColumn("mi", sqlExpr("map(id, v)"))
      .coalesce(1)
    // Delta only: the Iceberg WRITER refuses MAP columns wholesale
    // (icebergSchemaJson has no map arm — a pre-existing, honest
    // write-side boundary this feature does not change)
    val dd = freshDir("mset_d")
    DeltaLake.write(spark, dd, mapFrame)
    GraftCatalog.register(spark, wh, "mset.d", "graft-deltalake", dd)
    for (tbl <- Seq("tcat.mset.d")) {
      // replace an existing key, insert an absent one, key the value
      // off ANOTHER column's old value
      spark.sql(s"UPDATE $tbl SET m.a = id * 1000, m.c = 7 " +
        "WHERE id <= 2")
      val rows = spark.sql(
        s"SELECT id, m['a'] AS a, m['b'] AS b, m['c'] AS c FROM $tbl " +
          "ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
      assert(rows == Seq((1L, 1000L, 100L, 7L), (2L, 2000L, 200L, 7L),
        (3L, 30L, 300L, -1L), (4L, 40L, 400L, -1L)),
        s"$tbl: $rows — a replaced, b kept, c inserted, others " +
          "untouched")
      // a NON-STRING key type: the segment re-casts to the key type
      spark.sql(s"UPDATE $tbl SET mi.`3` = 'three!' WHERE id = 3")
      assert(spark.sql(s"SELECT mi[3] FROM $tbl WHERE id = 3")
        .head().getString(0) == "three!")
    }
    // PATH arm rides the stored schema for the same lowering
    spark.sql(s"UPDATE graft_delta.`$dd` SET m.b = 0 WHERE id = 4")
    assert(spark.sql(s"SELECT m['b'] FROM graft_delta.`$dd` " +
      "WHERE id = 4").head().getLong(0) == 0L)
    // refusals: a path THROUGH a map value; a key that cannot parse
    // as the key type
    val e1 = intercept[Exception] {
      spark.sql("UPDATE tcat.mset.d SET m.a.deep = 1")
    }
    // (a scalar map value makes Spark's own extraction refuse first;
    // rebuildStep's THROUGH-a-map refusal covers struct-valued maps)
    assert(e1.getMessage.contains("THROUGH a map value") ||
      e1.getMessage.contains("INVALID_EXTRACT_BASE_FIELD_TYPE"),
      e1.getMessage)
    // (ANSI mode: the analyzer's own Cast of the key literal throws
    // first; rebuildStep's parse refusal covers the legacy-mode and
    // path-arm shapes)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE tcat.mset.d SET mi.notanum = 'x' WHERE id = 1")
    }
    assert(e2.getMessage.contains("does not parse as the key type") ||
      e2.getMessage.contains("CAST_INVALID_INPUT"), e2.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns ADD before " +
      "the merge on both formats; type conflicts and explicit " +
      "assignment lists refuse") {
    val dd = freshDir("mev_d")
    DeltaLake.write(spark, dd, frame(1 to 4))
    GraftCatalog.register(spark, wh, "mev.d", "graft-deltalake", dd)
    val ii = freshDir("mev_i")
    Iceberg.write(spark, ii, frame(1 to 4))
    GraftCatalog.register(spark, wh, "mev.i", "graft-iceberg", ii)
    Seq((3L, "x3", 30L), (5L, "x5", 50L))
      .toDF("id", "g", "extra").createOrReplaceTempView("mev_src")
    for (tbl <- Seq("tcat.mev.d", "tcat.mev.i")) {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t
           |USING mev_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)
      val rows = spark.sql(
        s"SELECT id, g, extra FROM $tbl ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
      assert(rows == Seq((1L, "g1", -1L), (2L, "g0", -1L),
        (3L, "x3", 30L), (4L, "g0", -1L), (5L, "x5", 50L)),
        s"$tbl: $rows — matched rows take the new column from the " +
          "source, pre-evolution rows surface null, inserts land full")
    }
    // type conflict on a same-name column (g: string vs double) →
    // refuse with the named column, even though the analyzer would
    // happily insert a store-assignment cast
    Seq((3L, 9.5, 30L)).toDF("id", "g", "extra")
      .createOrReplaceTempView("mev_bad")
    val e1 = intercept[Exception] {
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO tcat.mev.d t " +
        "USING mev_bad s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e1.getMessage.contains("never evolve through a merge"),
      e1.getMessage)
    Seq((3L, "y", 7L, "n")).toDF("id", "g", "extra", "extra2")
      .createOrReplaceTempView("mev_src2")
    // WITHOUT the keyword nothing evolves: the same wider source
    // merges fine, extra source-only columns are simply not adopted
    // (checked FIRST — the evolving statements below add extra2)
    spark.sql("MERGE INTO tcat.mev.d t USING mev_src2 s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET *")
    assert(spark.sql("SELECT * FROM tcat.mev.d").columns.toSeq ==
      Seq("id", "g", "extra"), "no silent evolution without the keyword")
    assert(spark.sql("SELECT g FROM tcat.mev.d WHERE id = 3")
      .head().getString(0) == "y")
    // EXPLICIT assignment lists now resolve against the
    // POST-evolution schema (r16 verdict #3): named columns update,
    // untouched columns keep their values, and the new column lands
    // NULL where the list does not name it
    spark.sql("MERGE WITH SCHEMA EVOLUTION INTO tcat.mev.d t " +
      "USING mev_src2 s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET g = concat(s.g, '!')")
    val row3 = spark.sql(
      "SELECT g, extra, extra2 FROM tcat.mev.d WHERE id = 3").head()
    // extra was last set to 7 by the no-keyword SET * above — the
    // explicit list must LEAVE it there (only g is named)
    assert(row3.getString(0) == "y!" && row3.getLong(1) == 7L &&
      row3.isNullAt(2),
      s"explicit-list evolution: $row3 — g updates, extra keeps its " +
        "prior value, extra2 (new) lands NULL")
    // explicit UPDATE + explicit INSERT lists on the ICEBERG table:
    // evolution adds extra2; both lists name only existing columns,
    // so the new column lands NULL on updates AND inserts
    Seq((5L, "z5", 55L, "n5"), (7L, "z7", 77L, "n7"))
      .toDF("id", "g", "extra", "extra2")
      .createOrReplaceTempView("mev_src3")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO tcat.mev.i t
        |USING mev_src3 s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET g = s.g
        |WHEN NOT MATCHED THEN INSERT (id, g, extra)
        |  VALUES (s.id, s.g, NULL)
        |""".stripMargin)
    val r5 = spark.sql(
      "SELECT g, extra, extra2 FROM tcat.mev.i WHERE id = 5").head()
    assert(r5.getString(0) == "z5" && r5.getLong(1) == 50L &&
      r5.isNullAt(2),
      s"explicit UPDATE: named column updates, evolved lands NULL: $r5")
    val r7 = spark.sql(
      "SELECT g, extra, extra2 FROM tcat.mev.i WHERE id = 7").head()
    assert(r7.getString(0) == "z7" && r7.isNullAt(1) && r7.isNullAt(2),
      s"explicit INSERT: unnamed columns (old and new) land NULL: $r7")
    // NAMING the not-yet-added column in an explicit list surfaces
    // Spark's own UNRESOLVED_COLUMN during resolution (the analyzer
    // checks merge assignments before any extension rule runs) — a
    // documented boundary, never a silent drop
    val e2 = intercept[Exception] {
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO tcat.mev.i t " +
        "USING mev_src3 s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET extra9 = s.extra2")
    }
    assert(e2.getMessage.contains("extra9"), e2.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION, NESTED: a source struct gaining " +
      "a trailing member ADDs it; diverging member layouts refuse") {
    import org.apache.spark.sql.functions.struct
    def base = (1 to 3).map(i => (i.toLong, i * 1.0, s"v$i"))
      .toDF("id", "a", "b")
      .select(col("id"), struct(col("a"), col("b")).as("s")).coalesce(1)
    val dd = freshDir("mevn_d")
    DeltaLake.write(spark, dd, base)
    GraftCatalog.register(spark, wh, "mevn.d", "graft-deltalake", dd)
    val ii = freshDir("mevn_i")
    Iceberg.write(spark, ii, base)
    GraftCatalog.register(spark, wh, "mevn.i", "graft-iceberg", ii)
    // source struct = target members (in order) ++ a new member
    Seq((2L, (20.0, "x2", 200L)), (9L, (90.0, "x9", 900L)))
      .toDF("id", "raw")
      .selectExpr("id", "named_struct('a', raw._1, 'b', raw._2, " +
        "'c', raw._3) AS s")
      .createOrReplaceTempView("mevn_src")
    for (tbl <- Seq("tcat.mevn.d", "tcat.mevn.i")) {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t
           |USING mevn_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)
      val rows = spark.sql(
        s"SELECT id, s.a, s.b, s.c FROM $tbl ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
      assert(rows == Seq((1L, 1.0, "v1", -1L), (2L, 20.0, "x2", 200L),
        (3L, 3.0, "v3", -1L), (9L, 90.0, "x9", 900L)),
        s"$tbl: $rows — matched rows take the new member, " +
          "pre-evolution rows surface null, inserts land full")
    }
    // a source struct whose member layout DIVERGES (not a prefix)
    // refuses — the writers align structs positionally
    Seq((2L, (201L, 21.0, "y2"))).toDF("id", "raw")
      .selectExpr("id", "named_struct('c', raw._1, 'a', raw._2, " +
        "'b', raw._3) AS s")
      .createOrReplaceTempView("mevn_bad")
    val e = intercept[Exception] {
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO tcat.mevn.d t " +
        "USING mevn_bad s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e.getMessage.contains("positionally"), e.getMessage)
  }

  test("SQL MERGE through the catalog: canonical upsert shape routes " +
      "to the native merge; off-shape statements refuse loudly") {
    val dd = freshDir("dml_m")
    DeltaLake.write(spark, dd, frame(1 to 5))
    GraftCatalog.register(spark, wh, "dml.m", "graft-deltalake", dd)
    spark.sql(
      """MERGE INTO tcat.dml.m t
        |USING (SELECT * FROM VALUES (CAST(2 AS BIGINT), 'up'),
        |       (CAST(30 AS BIGINT), 'new') AS v(id, g)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT * FROM tcat.dml.m ORDER BY id").toDF()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "g1"), (2L, "up"), (3L, "g1"), (4L, "g0"), (5L, "g1"),
        (30L, "new")))
    // matched-only merge (no INSERT arm) is the update-join
    spark.sql(
      """MERGE INTO tcat.dml.m t
        |USING (SELECT * FROM VALUES (CAST(30 AS BIGINT), 'n2'),
        |       (CAST(99 AS BIGINT), 'never') AS v(id, g)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val after = spark.sql("SELECT g FROM tcat.dml.m WHERE id = 30")
      .head().getString(0)
    assert(after == "n2")
    assert(spark.sql(
      "SELECT count(*) AS n FROM tcat.dml.m WHERE id = 99")
      .head().getLong(0) == 0L, "matched-only merge inserted")
    // MATCHED DELETE routes through the GENERAL-FORM writer (r15 —
    // formerly a refusal): the matched row goes away
    spark.sql(
      """MERGE INTO tcat.dml.m t
        |USING (SELECT * FROM VALUES (CAST(2 AS BIGINT), 'x')
        |       AS v(id, g)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql(
      "SELECT count(*) AS n FROM tcat.dml.m WHERE id = 2")
      .head().getLong(0) == 0L, "general-form MATCHED DELETE lost")
    // a genuinely off-shape ON still refuses loudly
    val eOn = intercept[UnsupportedOperationException] {
      spark.sql(
        """MERGE INTO tcat.dml.m t
          |USING (SELECT * FROM VALUES (CAST(2 AS BIGINT), 'x')
          |       AS v(id, g)) s
          |ON t.id < s.id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(eOn.getMessage.contains("equalit"), eOn.getMessage)
    // subqueries in a DML predicate lower by materialization (r16 —
    // the dedicated coverage is the 'DML subqueries' test; here just
    // pin that the statement shape is ACCEPTED, not refused)
    val before = spark.sql("SELECT count(*) AS n FROM tcat.dml.m")
      .head().getLong(0)
    spark.sql("DELETE FROM tcat.dml.m WHERE id IN " +
      "(SELECT CAST(-999 AS BIGINT) AS id)")
    assert(spark.sql("SELECT count(*) AS n FROM tcat.dml.m")
      .head().getLong(0) == before,
      "no-match IN-subquery DELETE must be a no-op")
  }

  test("SQL DDL lifecycle: CREATE TABLE / CTAS / INSERT / DML / DROP " +
      "— managed data purges on DROP, registered tables only unpin") {
    spark.sql("CREATE TABLE tcat.ddl.t (id BIGINT, g STRING) " +
      "USING `graft-deltalake` PARTITIONED BY (g)")
    val e = GraftCatalog.entries(wh)("ddl.t")
    assert(e.managed && e.format == "graft-deltalake")
    assert(spark.sql("SELECT count(*) AS n FROM tcat.ddl.t")
      .head().getLong(0) == 0L)
    spark.sql("INSERT INTO tcat.ddl.t SELECT id, g FROM VALUES " +
      "(CAST(1 AS BIGINT), 'a'), (CAST(2 AS BIGINT), 'b') AS v(id, g)")
    // (SET on the partition column g is refused by the native
    // writer — a data-column update exercises the DML route)
    spark.sql("UPDATE tcat.ddl.t SET id = 20 WHERE id = 2")
    assert(spark.sql("SELECT * FROM tcat.ddl.t ORDER BY id").toDF()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (20L, "b")))
    // the partition layout came from PARTITIONED BY
    val tDir = new java.io.File(e.path)
    assert(Option(tDir.listFiles()).toSeq.flatten
      .exists(_.getName.startsWith("g=")),
      s"PARTITIONED BY was dropped: ${tDir.listFiles().toSeq}")
    // CTAS on the second format
    spark.sql("CREATE TABLE tcat.ddl.c USING `graft-iceberg` AS " +
      "SELECT * FROM tcat.ddl.t WHERE id = 1")
    assert(spark.sql("SELECT g FROM tcat.ddl.c").head()
      .getString(0) == "a")
    // duplicate CREATE refuses; creating over leftover data refuses
    intercept[Exception] {
      spark.sql("CREATE TABLE tcat.ddl.t (x INT) USING `graft-deltalake`")
    }
    // DROP purges managed data
    val cPath = GraftCatalog.entries(wh)("ddl.c").path
    spark.sql("DROP TABLE tcat.ddl.t")
    spark.sql("DROP TABLE tcat.ddl.c")
    assert(!tDir.exists(), "managed table data survived DROP")
    assert(!new java.io.File(cPath).exists())
    // re-create at the now-clean location works (the CTAS-rerun shape)
    spark.sql("CREATE TABLE tcat.ddl.t USING `graft-deltalake` AS " +
      "SELECT CAST(9 AS BIGINT) AS id, 'q' AS g")
    assert(spark.sql("SELECT id FROM tcat.ddl.t").head().getLong(0)
      == 9L)
    spark.sql("DROP TABLE tcat.ddl.t")
    // re-pinning a MANAGED table via register keeps it managed —
    // DROP still purges
    spark.sql("CREATE TABLE tcat.ddl.m2 USING `graft-deltalake` AS " +
      "SELECT CAST(1 AS BIGINT) AS id")
    val m2Path = GraftCatalog.entries(wh)("ddl.m2").path
    GraftCatalog.register(spark, wh, "ddl.m2", "graft-deltalake", m2Path)
    assert(GraftCatalog.entries(wh)("ddl.m2").managed,
      "re-register demoted a managed table to external")
    spark.sql("DROP TABLE tcat.ddl.m2")
    assert(!new java.io.File(m2Path).exists(),
      "managed table data survived DROP after a re-register")
    // a REGISTERED (external) table's data survives DROP
    val xd = freshDir("ddl_ext")
    DeltaLake.write(spark, xd, frame(1 to 5))
    GraftCatalog.register(spark, wh, "ddl.x", "graft-deltalake", xd)
    spark.sql("DROP TABLE tcat.ddl.x")
    assert(new java.io.File(xd, "_delta_log").exists(),
      "DROP purged a registered external table's data")
    assert(ids(DeltaLake.snapshot(spark, xd)) == (1L to 5L).toSet)
    // non-graft providers refuse loudly
    val eP = intercept[Exception] {
      spark.sql("CREATE TABLE tcat.ddl.bad (id INT) USING parquet")
    }
    assert(eP.getMessage.contains("graft-deltalake"), eP.getMessage)
    // the DataFrame-API-by-name story: saveAsTable creates through
    // the catalog, insertInto appends through the bridge
    frame(1 to 4).write.format("graft-deltalake")
      .saveAsTable("tcat.ddl.sat")
    assert(ids(spark.sql("SELECT * FROM tcat.ddl.sat").toDF()) ==
      (1L to 4L).toSet)
    frame(5 to 6).write.insertInto("tcat.ddl.sat")
    assert(ids(spark.sql("SELECT * FROM tcat.ddl.sat").toDF()) ==
      (1L to 6L).toSet)
    assert(GraftCatalog.entries(wh)("ddl.sat").managed)
    spark.sql("DROP TABLE tcat.ddl.sat")
    // TRUNCATE TABLE: an all-rows native delete, history readable
    val td = freshDir("ddl_tr")
    DeltaLake.write(spark, td, frame(1 to 8))
    GraftCatalog.register(spark, wh, "ddl.tr", "graft-deltalake", td)
    spark.sql("TRUNCATE TABLE tcat.ddl.tr")
    assert(spark.sql("SELECT count(*) AS n FROM tcat.ddl.tr")
      .head().getLong(0) == 0L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM tcat.ddl.tr VERSION AS OF 0")
      .head().getLong(0) == 8L,
      "TRUNCATE destroyed history instead of committing a delete")
    spark.sql("INSERT INTO tcat.ddl.tr VALUES (99, 'x')")
    assert(ids(spark.sql("SELECT * FROM tcat.ddl.tr").toDF()) ==
      Set(99L))
  }

  test("PATH-identifier SQL DML: DELETE/UPDATE/MERGE on " +
      "graft_delta.`path` route to the native writers — no catalog, " +
      "no temp view; aliases and qualified columns work") {
    val dd = freshDir("pdml")
    DeltaLake.write(spark, dd, frame(1 to 10))
    spark.sql(s"DELETE FROM graft_delta.`$dd` t WHERE t.id % 2 = 0")
    assert(ids(spark.sql(s"SELECT * FROM graft_delta.`$dd`").toDF()) ==
      Set(1L, 3L, 5L, 7L, 9L))
    spark.sql(s"UPDATE graft_delta.`$dd` SET g = 'zz' WHERE id = 3")
    assert(spark.sql(
      s"SELECT g FROM graft_delta.`$dd` WHERE id = 3").head()
      .getString(0) == "zz")
    // identity UPDATE rewrites matched rows (one commit each),
    // case-insensitively on both arms (r13 advice)
    val head0 = DeltaLake.latestVersion(spark, dd)
    spark.sql(s"UPDATE graft_delta.`$dd` SET g = g")
    spark.sql(s"UPDATE graft_delta.`$dd` SET g = G")
    assert(DeltaLake.latestVersion(spark, dd) == head0 + 2,
      "identity UPDATE must commit rewrites")
    // the canonical star-merge, source inline
    spark.sql(
      s"""MERGE INTO graft_delta.`$dd` t
         |USING (SELECT * FROM VALUES (CAST(3 AS BIGINT), 'up'),
         |       (CAST(40 AS BIGINT), 'new') AS v(id, g)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT * FROM graft_delta.`$dd` ORDER BY id")
      .toDF().collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "g1"), (3L, "up"), (5L, "g1"), (7L, "g1"), (9L, "g1"),
        (40L, "new")))
    // iceberg path DML too
    val ii = freshDir("pdml_i")
    Iceberg.write(spark, ii, frame(1 to 6))
    spark.sql(s"DELETE FROM graft_iceberg.`$ii` WHERE id <= 2")
    assert(ids(spark.sql(s"SELECT * FROM graft_iceberg.`$ii`").toDF())
      == (3L to 6L).toSet)
    // explicit merge assignment lists on a path target refuse (only
    // star actions are verifiable pre-resolution)
    val eM = intercept[UnsupportedOperationException] {
      spark.sql(
        s"""MERGE INTO graft_delta.`$dd` t
           |USING (SELECT * FROM VALUES (CAST(3 AS BIGINT), 'x')
           |       AS v(id, g)) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET g = s.g""".stripMargin)
    }
    assert(eM.getMessage.contains("UPDATE SET"), eM.getMessage)
    // a self-comparison ON (t.id = t.id — a typo for t.id = s.id)
    // refuses instead of silently running a keyed upsert
    val eSelf = intercept[UnsupportedOperationException] {
      spark.sql(
        s"""MERGE INTO graft_delta.`$dd` t
           |USING (SELECT * FROM VALUES (CAST(3 AS BIGINT), 'x')
           |       AS v(id, g)) s
           |ON t.id = t.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(eSelf.getMessage.contains("itself"), eSelf.getMessage)
  }

  test("DML predicate lowering survives analyzer literal casts — " +
      "`id = 3` on a BIGINT column still stats-skips") {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Literal}
    import org.apache.spark.sql.graft.GraftSql
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val e = EqualTo(UnresolvedAttribute(Seq("id")),
      Cast(Literal(3, IntegerType), LongType))
    assert(GraftSql.predicateTreeOf(e) ==
      GraftSql.PredCmp("id", 3L, "EQ"),
      s"cast-wrapped literal degraded to ${GraftSql.predicateTreeOf(e)}")
    // flipped side too
    val f = EqualTo(Cast(Literal(7, IntegerType), LongType),
      UnresolvedAttribute(Seq("id")))
    assert(GraftSql.predicateTreeOf(f) ==
      GraftSql.PredCmp("id", 7L, "EQ"))
  }

  test("randomized DML semantics: eight rounds of SQL DELETE/UPDATE " +
      "with varied predicate shapes track an independent model " +
      "exactly (seeded)") {
    val rnd = new scala.util.Random(42)
    val dd = freshDir("fuzz")
    var model: Seq[(Long, String, Long)] = (1 to 300).map(i =>
      (i.toLong, s"g${i % 7}", (i * 37 % 101).toLong))
    DeltaLake.write(spark, dd, model.toDF("id", "g", "x"))
    GraftCatalog.register(spark, wh, "fz.t", "graft-deltalake", dd)
    def pred(): (String, ((Long, String, Long)) => Boolean) =
      rnd.nextInt(5) match {
        case 0 =>
          val k = rnd.nextInt(7)
          (s"g = 'g$k'", t => t._2 == s"g$k")
        case 1 =>
          val lo = rnd.nextInt(250)
          (s"id > $lo AND id <= ${lo + 40}",
            t => t._1 > lo && t._1 <= lo + 40)
        case 2 =>
          val m = 2 + rnd.nextInt(5)
          (s"x % $m = 0", t => t._3 % m == 0)
        case 3 =>
          val k = rnd.nextInt(7)
          val lo = rnd.nextInt(200)
          (s"g = 'g$k' OR id < $lo",
            t => t._2 == s"g$k" || t._1 < lo)
        case _ =>
          val vals = Seq.fill(4)(rnd.nextInt(300) + 1)
          (s"id IN (${vals.mkString(",")})",
            t => vals.contains(t._1.toInt))
      }
    (1 to 8).foreach { round =>
      val (sqlP, fn) = pred()
      if (round % 2 == 1) {
        spark.sql(s"DELETE FROM tcat.fz.t WHERE $sqlP")
        model = model.filterNot(fn)
      } else {
        spark.sql(s"UPDATE tcat.fz.t SET x = id % 13 WHERE $sqlP")
        model = model.map(t =>
          if (fn(t)) (t._1, t._2, t._1 % 13) else t)
      }
      val actual = spark.sql("SELECT * FROM tcat.fz.t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(actual == model.toSet,
        s"round $round: predicate '$sqlP' diverged from the model " +
          s"(${actual.size} vs ${model.size} rows)")
    }
  }

  test("catalog introspection SQL: SHOW TABLES, DESCRIBE, ALTER " +
      "TABLE RENAME all work through the DSv2 surface") {
    val dd = freshDir("meta")
    DeltaLake.write(spark, dd, frame(1 to 3))
    GraftCatalog.register(spark, wh, "meta.a", "graft-deltalake", dd)
    val shown = spark.sql("SHOW TABLES IN tcat.meta").collect()
      .map(_.getString(1)).toSet
    assert(shown.contains("a"), s"SHOW TABLES missed meta.a: $shown")
    val desc = spark.sql("DESCRIBE TABLE tcat.meta.a").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("id").contains("bigint") &&
      desc.get("g").contains("string"), s"DESCRIBE wrong: $desc")
    spark.sql("ALTER TABLE tcat.meta.a RENAME TO meta.b")
    assert(spark.sql("SELECT count(*) AS n FROM tcat.meta.b")
      .head().getLong(0) == 3L)
    intercept[Exception] {
      spark.sql("SELECT * FROM tcat.meta.a").collect()
    }
    // concurrent SQL DML on ONE table: both statements commit (the
    // table-level exclusive-commit retry) and the final pin sees both
    // effects — the monotone advancePin under real concurrency
    val cd = freshDir("conc")
    DeltaLake.write(spark, cd, frame(1 to 20))
    GraftCatalog.register(spark, wh, "meta.c", "graft-deltalake", cd)
    val threads = Seq(
      new Thread(() => spark.sql(
        "DELETE FROM tcat.meta.c WHERE id <= 5"): Unit),
      new Thread(() => spark.sql(
        "DELETE FROM tcat.meta.c WHERE id > 15"): Unit))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(ids(spark.sql("SELECT * FROM tcat.meta.c").toDF()) ==
      (6L to 15L).toSet,
      "a concurrent DML's effect was lost (pin or commit race)")
  }

  test("ALL-IDENTITY UPDATE (SET a = a) rewrites matched rows like " +
      "Spark/Delta — history observers see the commit (r13 advice)") {
    val d = freshDir("ident")
    DeltaLake.write(spark, d, frame(1 to 6))
    GraftCatalog.register(spark, wh, "idn.t", "graft-deltalake", d)
    val v0 = DeltaLake.latestVersion(spark, d)
    spark.sql("UPDATE tcat.idn.t SET g = g WHERE id <= 3")
    assert(DeltaLake.latestVersion(spark, d) == v0 + 1,
      "identity UPDATE must commit (matched rows rewrite)")
    assert(ids(spark.sql("SELECT * FROM tcat.idn.t").toDF()) ==
      (1L to 6L).toSet)
    // case-insensitive identity detection (G vs g) behaves the same
    spark.sql("UPDATE tcat.idn.t SET G = g WHERE id <= 2")
    assert(DeltaLake.latestVersion(spark, d) == v0 + 2)
    // PARTITIONED table: the analyzer aligns fill-ins for EVERY
    // column, so an all-identity statement reaches the writer with a
    // partition-column identity in the set — tolerated (no move), the
    // data columns still rewrite
    val pd = freshDir("identp")
    DeltaLake.write(spark, pd, frame(1 to 6), partitionBy = Seq("g"))
    GraftCatalog.register(spark, wh, "idn.p", "graft-deltalake", pd)
    spark.sql("UPDATE tcat.idn.p SET g = g WHERE id <= 3")
    assert(DeltaLake.latestVersion(spark, pd) == 1L,
      "identity UPDATE on a partitioned table must commit")
    assert(ids(spark.sql("SELECT * FROM tcat.idn.p").toDF()) ==
      (1L to 6L).toSet)
    // a REAL value on the partition column keeps refusing (a move)
    val ep = intercept[Exception] {
      spark.sql("UPDATE tcat.idn.p SET g = 'zz' WHERE id = 1")
    }
    assert(ep.getMessage.contains("partition"), ep.getMessage)
  }

  test("vacuumOrphans with ALIASES: one path registered under two " +
      "names with different pins reclaims only past the MAX pin — " +
      "the higher alias keeps reading (r13 advice)") {
    val d = freshDir("alias")
    DeltaLake.write(spark, d, frame(1 to 10)) // v0
    GraftCatalog.register(spark, wh, "al.low", "graft-deltalake", d)
    DeltaLake.write(spark, d, frame(11 to 20)) // v1
    GraftCatalog.register(spark, wh, "al.high", "graft-deltalake", d)
    // al.low pins v0, al.high pins v1; v1 is NOT an orphan — it is
    // al.high's pinned content. Nothing may be reclaimed.
    assert(GraftCatalog.entries(wh)("al.low").version == 0L)
    assert(GraftCatalog.entries(wh)("al.high").version == 1L)
    val reclaimed = GraftCatalog.vacuumOrphans(spark, wh)
    assert(!reclaimed.keySet.exists(_.contains("al.")),
      s"reclaimed a pinned alias version: $reclaimed")
    assert(ids(spark.sql("SELECT * FROM tcat.al.high").toDF()) ==
      (1L to 20L).toSet)
    assert(ids(spark.sql("SELECT * FROM tcat.al.low").toDF()) ==
      (1L to 10L).toSet)
    // a genuine orphan ABOVE the max pin reclaims; both aliases
    // survive it
    DeltaLake.write(spark, d, frame(21 to 25)) // v2, unpinned
    val r2 = GraftCatalog.vacuumOrphans(spark, wh)
    assert(r2.keySet.exists(k => k.contains("al.high") &&
        k.contains("al.low")), s"expected the alias group, got $r2")
    assert(DeltaLake.latestVersion(spark, d) == 1L)
    assert(ids(spark.sql("SELECT * FROM tcat.al.high").toDF()) ==
      (1L to 20L).toSet)
  }
}
