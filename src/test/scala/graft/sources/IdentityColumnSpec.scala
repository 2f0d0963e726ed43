package graft.sources

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** IDENTITY columns, allocated (formerly refused):
  * [[DeltaLake.withIdentityColumn]] stamps `delta.identity.*` at
  * creation; [[DeltaLake.write]] allocates unique step-directional
  * values for null/omitted entries (gaps permitted — block
  * allocation), advances `delta.identity.highWaterMark` from the
  * LANDED files' stats in the same commit's metaData, refuses
  * explicit values on GENERATED ALWAYS columns, and fails loudly when
  * a concurrent writer advanced the mark under an in-flight
  * allocation. DML paths keep refusing (only the batch writer
  * allocates).
  */
class IdentityColumnSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_idn_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (s"v$i", i * 1.0)).toDF("v", "x")

  test("allocation: unique increasing values across batches, high " +
      "water persisted, explicit values refused on GENERATED ALWAYS") {
    val dir = freshDir("alloc")
    DeltaLake.write(spark, dir,
      DeltaLake.withIdentityColumn(frame(1 to 10).repartition(3),
        "id", start = 100L, step = 5L))
    val first = DeltaLake.snapshot(spark, dir)
      .select("id").as[Long].collect()
    assert(first.length == 10 && first.distinct.length == 10,
      s"identity values must be unique: ${first.toSeq}")
    assert(first.forall(v => v >= 100L && (v - 100L) % 5L == 0L),
      s"values must be start + k*step: ${first.toSeq}")
    // the high-water mark persisted into the table schema
    val hw1 = DeltaLake.snapshot(spark, dir).schema("id").metadata
      .getLong("delta.identity.highWaterMark")
    assert(hw1 == first.max)
    // a second batch (column omitted) allocates strictly PAST it
    DeltaLake.write(spark, dir, frame(11 to 15).coalesce(1))
    val second = DeltaLake.snapshot(spark, dir)
      .select("id").as[Long].collect()
    assert(second.length == 15 && second.distinct.length == 15)
    assert(second.count(_ > hw1) == 5,
      "the appended batch must allocate past the high-water mark")
    // explicit values refuse (GENERATED ALWAYS)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, dir,
        Seq((999L, "x", 0.0)).toDF("id", "v", "x"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    // UPDATE works when the SET leaves the identity column alone —
    // and refuses when it touches it; row-creating DML (merge) keeps
    // refusing identity tables wholesale
    DeltaLake.update(spark, dir, col("x") === 1.0,
      Map("v" -> org.apache.spark.sql.functions.lit("y")))
    assert(DeltaLake.snapshot(spark, dir)
      .filter(col("v") === "y").count() == 1)
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.update(spark, dir, col("x") === 2.0,
        Map("id" -> org.apache.spark.sql.functions.lit(5L)))
    }
    assert(e2.getMessage.contains("immutable"), e2.getMessage)
  }

  test("merge on an identity-keyed table: matched rows keep their " +
      "surrogate, inserts allocate past the mark, the mark advances " +
      "in the merge commit") {
    val dir = freshDir("mrg")
    // business key `v`, surrogate `rid` GENERATED ALWAYS
    DeltaLake.write(spark, dir,
      DeltaLake.withIdentityColumn(frame(1 to 5), "rid",
        start = 100L, step = 3L))
    val before = DeltaLake.snapshot(spark, dir)
      .select("v", "rid").as[(String, Long)].collect().toMap
    val hw0 = DeltaLake.snapshot(spark, dir).schema("rid").metadata
      .getLong("delta.identity.highWaterMark")
    // CDC source: update v3, insert v8/v9 — rid rides as null
    val src = Seq((None: Option[Long], "v3", 33.0),
      (None, "v8", 88.0), (None, "v9", 99.0))
      .toDF("rid", "v", "x").coalesce(1)
    assert(DeltaLake.merge(spark, dir, src, Seq("v")) >= 0)
    val after = DeltaLake.snapshot(spark, dir)
      .select("rid", "v", "x")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(after.length == 7 &&
      after.map(_._1).distinct.length == 7)
    // matched row kept its surrogate AND took the source values
    val v3 = after.find(_._2 == "v3").get
    assert(v3._1 == before("v3") && v3._3 == 33.0)
    // inserted rows allocated past the pre-merge mark, step-aligned
    val fresh = after.filter(r => r._2 == "v8" || r._2 == "v9")
    assert(fresh.forall(r => r._1 > hw0 && (r._1 - 100L) % 3L == 0L))
    // and the mark advanced in the merge commit itself
    assert(DeltaLake.snapshot(spark, dir).schema("rid").metadata
      .getLong("delta.identity.highWaterMark") == after.map(_._1).max)
    // explicit rid values in the INSERT arm refuse (GENERATED ALWAYS)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.merge(spark, dir,
        Seq((Some(9999L), "zz", 1.0)).toDF("rid", "v", "x"), Seq("v"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    // mergeGeneral: explicit INSERT list may omit the identity
    // column (the writer allocates); SET may not assign it
    import graft.sources.MergeActions._
    assert(DeltaLake.mergeGeneral(spark, dir,
      Seq(("v10", 110.0)).toDF("v", "x"), Seq("v"),
      notMatched = Seq(NotMatchedInsert(None,
        Some(Map("v" -> col("v"), "x" -> col("x")))))) >= 0)
    val v10 = DeltaLake.snapshot(spark, dir)
      .filter(col("v") === "v10").select("rid").as[Long].collect()
    assert(v10.length == 1 && v10.head > hw0 &&
      (v10.head - 100L) % 3L == 0L)
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.mergeGeneral(spark, dir,
        Seq(("v10", 0.0)).toDF("v", "x"), Seq("v"),
        matched = Seq(MatchedUpdate(None,
          Some(Map("rid" -> org.apache.spark.sql.functions.lit(1L))))))
    }
    assert(e2.getMessage.contains("immutable"), e2.getMessage)
  }

  test("streaming sink batches allocate: two commitStreamBatch " +
      "calls yield unique values and a monotone mark") {
    val dir = freshDir("sink")
    DeltaLake.write(spark, dir,
      DeltaLake.withIdentityColumn(frame(1 to 4), "rid",
        start = 10L, step = 2L))
    val hw0 = DeltaLake.snapshot(spark, dir).schema("rid").metadata
      .getLong("delta.identity.highWaterMark")
    // batches omit the identity column entirely (the streaming shape)
    DeltaLake.commitStreamBatch(spark, dir,
      frame(5 to 7).coalesce(1), Seq.empty, "app1", 0L,
      overwrite = false)
    DeltaLake.commitStreamBatch(spark, dir,
      frame(8 to 9).coalesce(1), Seq.empty, "app1", 1L,
      overwrite = false)
    val ids = DeltaLake.snapshot(spark, dir)
      .select("rid").as[Long].collect()
    assert(ids.length == 9 && ids.distinct.length == 9,
      s"sink batches must allocate uniquely: ${ids.sorted.toSeq}")
    assert(ids.forall(v => v >= 10L && (v - 10L) % 2L == 0L))
    val hw2 = DeltaLake.snapshot(spark, dir).schema("rid").metadata
      .getLong("delta.identity.highWaterMark")
    assert(hw2 == ids.max && hw2 > hw0)
    // the identity metadata SURVIVED the sink commits (no wipe)
    assert(DeltaLake.snapshot(spark, dir).schema("rid").metadata
      .contains("delta.identity.start"))
  }

  test("SQL DDL end to end: GENERATED ALWAYS AS IDENTITY and " +
      "GENERATED ALWAYS AS (expr) through CREATE TABLE; INSERT " +
      "allocates and computes") {
    val wh = freshDir("sqlddl")
    spark.conf.set("spark.sql.catalog.idn",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.idn.warehouse", wh)
    spark.sql("CREATE TABLE idn.db.t (id BIGINT GENERATED ALWAYS AS " +
      "IDENTITY (START WITH 100 INCREMENT BY 5), v STRING, " +
      "d STRING GENERATED ALWAYS AS (UPPER(v))) " +
      "USING `graft-deltalake`")
    spark.sql("INSERT INTO idn.db.t (v) VALUES ('a'), ('b')")
    spark.sql("INSERT INTO idn.db.t (v) VALUES ('c')")
    val rows = spark.sql("SELECT id, v, d FROM idn.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.map(_._1).distinct.length == 3)
    assert(rows.forall { case (i, _, _) => (i - 100) % 5 == 0 && i >= 100 })
    assert(rows.forall { case (_, v, d) => d == v.toUpperCase })
    // explicit identity values refuse through SQL too
    val e = intercept[Exception] {
      spark.sql("INSERT INTO idn.db.t VALUES (999, 'x', 'X')")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("GENERATED ALWAYS")),
      s"expected the identity refusal, got $e")
    // a wrong provided generated value refuses; NULL computes
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO idn.db.t (v, d) VALUES ('y', 'WRONG')")
    }
    assert(e2.getMessage.contains("generated:d") ||
      (e2.getCause != null &&
        e2.getCause.getMessage.contains("generated:d")),
      s"expected the generated validation, got $e2")
  }

  test("BY DEFAULT (allowExplicitInsert): provided values kept, nulls " +
      "allocated; negative step allocates downward") {
    val dir = freshDir("bydef")
    DeltaLake.write(spark, dir,
      DeltaLake.withIdentityColumn(frame(1 to 5), "id",
        start = 1L, step = 1L, allowExplicitInsert = true))
    // a mixed batch: one explicit value, nulls allocate
    DeltaLake.write(spark, dir,
      Seq((Some(777L), "e", 0.0), (None, "f", 0.0))
        .toDF("id", "v", "x"))
    val ids = DeltaLake.snapshot(spark, dir)
      .select("id").as[Long].collect().toSet
    assert(ids.contains(777L))
    assert(ids.size == 7)
    // negative step
    val d2 = freshDir("neg")
    DeltaLake.write(spark, d2,
      DeltaLake.withIdentityColumn(frame(1 to 6), "id",
        start = -1L, step = -2L))
    val neg = DeltaLake.snapshot(spark, d2)
      .select("id").as[Long].collect()
    assert(neg.forall(_ <= -1L) && neg.distinct.length == 6)
    val hw = DeltaLake.snapshot(spark, d2).schema("id").metadata
      .getLong("delta.identity.highWaterMark")
    assert(hw == neg.min, "negative step: high water is the minimum")
    DeltaLake.write(spark, d2, frame(7 to 8).coalesce(1))
    val neg2 = DeltaLake.snapshot(spark, d2)
      .select("id").as[Long].collect()
    assert(neg2.distinct.length == 8 && neg2.count(_ < hw) == 2)
  }

  test("high-water mark never regresses: an explicit batch entirely " +
      "behind the mark leaves it, later allocation stays unique") {
    val dir = freshDir("clamp")
    DeltaLake.write(spark, dir,
      DeltaLake.withIdentityColumn(frame(1 to 5), "id",
        start = 1L, step = 1L, allowExplicitInsert = true))
    val hw0 = DeltaLake.snapshot(spark, dir).schema("id").metadata
      .getLong("delta.identity.highWaterMark")
    // an explicit batch behind the mark must NOT move it backwards
    // (a regressed mark re-allocates already-handed-out ids)
    DeltaLake.write(spark, dir,
      Seq((-50L, "e", 0.0)).toDF("id", "v", "x"))
    assert(DeltaLake.snapshot(spark, dir).schema("id").metadata
      .getLong("delta.identity.highWaterMark") == hw0)
    DeltaLake.write(spark, dir, frame(6 to 8).coalesce(1))
    val ids = DeltaLake.snapshot(spark, dir)
      .select("id").as[Long].collect()
    assert(ids.length == 9 && ids.distinct.length == 9,
      s"allocation after the behind-the-mark batch must stay " +
        s"unique: ${ids.sorted.toSeq}")
    assert(ids.count(_ > hw0) == 3)
  }

  test("merge on a CDF+identity table pins allocation: the change " +
      "feed's insert rows carry the SAME surrogates as the landed " +
      "data files") {
    import org.apache.spark.sql.functions.lit
    val dir = freshDir("cdfpin")
    DeltaLake.write(spark, dir,
      DeltaLake.withIdentityColumn(
        Seq(("k1", 1.0)).toDF("v", "x").coalesce(1),
        "id", start = 100L, step = 7L),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    // upsert: k1 matched (keeps its surrogate), k2/k3 insert
    // (allocate) — the allocation expression is nondeterministic
    // across executions, so the insert rows must be PINNED before the
    // data files and the CDF change files both consume them
    val src = Seq(("k1", 5.0), ("k2", 6.0), ("k3", 7.0))
      .toDF("v", "x").repartition(3)
      .withColumn("id", lit(null).cast("long"))
    assert(DeltaLake.merge(spark, dir, src, Seq("v")) == 1L)
    val table = DeltaLake.snapshot(spark, dir)
      .select("v", "id").as[(String, Long)].collect().toMap
    assert(table.keySet == Set("k1", "k2", "k3"))
    assert(table("k1") == 100L, "matched row keeps its surrogate")
    val cdcIns = spark.read
      .parquet(new java.io.File(dir, "_change_data").getAbsolutePath)
      .filter(col("_change_type") === "insert")
      .select("v", "id").as[(String, Long)].collect().toMap
    assert(cdcIns.keySet == Set("k2", "k3"))
    assert(cdcIns == table.filterNot(_._1 == "k1"),
      s"CDF insert surrogates ($cdcIns) must equal the landed data " +
        s"files' (${table.filterNot(_._1 == "k1")})")
    // same pin through the general-form writer
    val dir2 = freshDir("cdfpin2")
    DeltaLake.write(spark, dir2,
      DeltaLake.withIdentityColumn(
        Seq(("k1", 1.0)).toDF("v", "x").coalesce(1),
        "id", start = 100L, step = 7L),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    assert(DeltaLake.mergeGeneral(spark, dir2, src, Seq("v"),
      matched = Seq(MergeActions.MatchedUpdate(None, None)),
      notMatched = Seq(MergeActions.NotMatchedInsert(None, None))) == 1L)
    val table2 = DeltaLake.snapshot(spark, dir2)
      .select("v", "id").as[(String, Long)].collect().toMap
    val cdcIns2 = spark.read
      .parquet(new java.io.File(dir2, "_change_data").getAbsolutePath)
      .filter(col("_change_type") === "insert")
      .select("v", "id").as[(String, Long)].collect().toMap
    assert(cdcIns2 == table2.filterNot(_._1 == "k1"),
      s"general-form CDF insert surrogates ($cdcIns2) must equal " +
        s"the landed data files' (${table2.filterNot(_._1 == "k1")})")
  }
}
