package graft.sources

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The PUBLIC row-level DML ([[DeltaLake.delete]] /
  * [[DeltaLake.update]] / [[DeltaLake.merge]]): merge-on-read deletes
  * that grow per-file deletion vectors executor-side, copy-on-write
  * updates that materialize DVs and rewrite only hit files, and the
  * upsert-shaped merge — plus the SQL NULL semantics and the
  * touch-only-what-matched locality each must keep.
  */
class DeltaDmlSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_dml_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def commitText(dir: String, version: Long): String =
    java.nio.file.Files.readString(new java.io.File(dir,
      "_delta_log/" + f"$version%020d.json").toPath)

  test("delete grows per-file DVs, upgrades the protocol by union, " +
      "nets a no-op to -1, and NULL predicates keep rows") {
    val dir = freshDir("del")
    DeltaLake.write(spark, dir, frame(1 to 30))
    assert(DeltaLake.delete(spark, dir, col("id") % 3 === 0) == 1L)
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (1L to 30L).filterNot(_ % 3 == 0).toSet)
    val c1 = commitText(dir, 1L)
    assert(c1.contains("deletionVectors"), "protocol upgrade expected")
    assert(c1.contains("deletionVector"), "DV add expected")
    // second delete GROWS the DV (old dead rows stay dead)
    assert(DeltaLake.delete(spark, dir, col("id") === 1L) == 2L)
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (2L to 30L).filterNot(_ % 3 == 0).toSet)
    // re-deleting already-dead rows is a no-op: no commit
    assert(DeltaLake.delete(spark, dir, col("id") === 3L) == -1L)
    assert(DeltaLake.latestVersion(spark, dir) == 2L)
    // NULL predicate = survive (SQL DELETE semantics)
    val d2 = freshDir("delnull")
    DeltaLake.write(spark, d2,
      Seq((1L, "a"), (2L, null), (3L, "b")).toDF("id", "v"))
    DeltaLake.delete(spark, d2, col("v") =!= "a")
    assert(ids(DeltaLake.snapshot(spark, d2)) == Set(1L, 2L))
  }

  test("delete on a partitioned table touches only the matching " +
      "partition's files (stats/partition pruning drives the scan)") {
    val dir = freshDir("delpart")
    val df = (1 to 40).map(i => (i.toLong, i % 4, s"v$i"))
      .toDF("id", "bucket", "v")
    DeltaLake.write(spark, dir, df, partitionBy = Seq("bucket"))
    assert(DeltaLake.delete(spark, dir,
      col("bucket") === 2 && col("id") <= 20L) == 1L)
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (1L to 40L).filterNot(i => i % 4 == 2 && i <= 20).toSet)
    // the commit names ONLY bucket=2 files
    val c = commitText(dir, 1L)
    // add.path is percent-encoded in the log ('=' → %3D)
    c.linesIterator.filter(_.contains("\"remove\"")).foreach(l =>
      assert(l.contains("bucket%3D2"), s"foreign partition touched: $l"))
  }

  test("update rewrites only hit files with old-row semantics and " +
      "materializes DVs; a partition-column SET is refused") {
    val dir = freshDir("upd")
    // two files: ids 1-10 and 11-20
    DeltaLake.write(spark, dir, frame(1 to 10))
    DeltaLake.write(spark, dir, frame(11 to 20))
    // DV-delete 11, then update 12: the rewrite must not resurrect 11
    DeltaLake.delete(spark, dir, col("id") === 11L)
    val v = DeltaLake.update(spark, dir, col("id") === 12L,
      Map("v" -> lit("CHANGED")))
    assert(v == 3L)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(ids(snap) == (1L to 20L).toSet - 11L)
    assert(snap.filter(col("v") === "CHANGED").count() == 1L)
    // only file 2 was touched: file 1's rows survive in place and the
    // commit carries exactly one remove
    val c = commitText(dir, 3L)
    assert(c.linesIterator.count(_.contains("\"remove\"")) == 1)
    // nothing matched → -1, no commit
    assert(DeltaLake.update(spark, dir, col("id") === 999L,
      Map("v" -> lit("X"))) == -1L)
    assert(DeltaLake.latestVersion(spark, dir) == 3L)
    // old-row semantics: SET uses the OLD value of the other column
    val d2 = freshDir("updold")
    DeltaLake.write(spark, d2,
      Seq((1L, 10L, 0L)).toDF("id", "a", "b"))
    DeltaLake.update(spark, d2, col("id") === 1L,
      Map("a" -> lit(99L), "b" -> (col("a") + 1L)))
    val row = DeltaLake.snapshot(spark, d2).collect().head
    assert(row.getLong(1) == 99L && row.getLong(2) == 11L,
      s"b must see the OLD a: $row")
    // partition-column SET refused
    val d3 = freshDir("updpart")
    DeltaLake.write(spark, d3,
      (1 to 8).map(i => (i.toLong, i % 2, s"v$i")).toDF("id", "p", "v"),
      partitionBy = Seq("p"))
    val e = intercept[IllegalArgumentException] {
      DeltaLake.update(spark, d3, col("id") === 1L, Map("p" -> lit(9)))
    }
    assert(e.getMessage.contains("partition"))
    // case-colliding SET keys canonicalize to the SAME column — a
    // duplicate assignment must refuse, never silently last-win
    // (r16 advice; the SQL bridge dedups earlier, this is the
    // library-API seam)
    val eDup = intercept[IllegalArgumentException] {
      DeltaLake.update(spark, d3, col("id") === 1L,
        Map("v" -> lit("a"), "V" -> lit("b")))
    }
    assert(eDup.getMessage.contains("duplicate SET target"),
      eDup.getMessage)
  }

  test("merge upserts: matched rows replaced, unmatched inserted, " +
      "NULL-key source rows insert, duplicate source keys refused") {
    val dir = freshDir("mrg")
    DeltaLake.write(spark, dir, frame(1 to 10))
    val source = Seq((5L, "UPDATED"), (6L, "UPDATED"), (42L, "NEW"))
      .toDF("id", "v")
    assert(DeltaLake.merge(spark, dir, source, Seq("id")) == 1L)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(ids(snap) == ((1L to 10L).toSet + 42L))
    assert(snap.filter(col("v") === "UPDATED").count() == 2L)
    assert(snap.filter(col("id") === 42L && col("v") === "NEW")
      .count() == 1L)
    // insert-only merge (no matches): commit lands with adds only
    assert(DeltaLake.merge(spark, dir,
      Seq((100L, "I")).toDF("id", "v"), Seq("id")) == 2L)
    assert(commitText(dir, 2L).linesIterator
      .count(_.contains("\"remove\"")) == 0)
    // a no-change merge returns -1
    assert(DeltaLake.merge(spark, dir,
      spark.emptyDataset[(Long, String)].toDF("id", "v"),
      Seq("id")) == -1L)
    // NULL key matches nothing → INSERT (SQL ON semantics)
    assert(DeltaLake.merge(spark, dir,
      Seq((Option.empty[Long], "NULLKEY")).toDF("id", "v"),
      Seq("id")) == 3L)
    assert(DeltaLake.snapshot(spark, dir)
      .filter(col("id").isNull).count() == 1L)
    // duplicate non-null source keys = cardinality violation
    val e = intercept[IllegalArgumentException] {
      DeltaLake.merge(spark, dir,
        Seq((5L, "A"), (5L, "B")).toDF("id", "v"), Seq("id"))
    }
    assert(e.getMessage.contains("duplicate"))
    // insertNotMatched=false: unmatched source rows are dropped
    DeltaLake.merge(spark, dir,
      Seq((1L, "ONLY_UPD"), (777L, "DROPPED")).toDF("id", "v"),
      Seq("id"), insertNotMatched = false)
    val s2 = DeltaLake.snapshot(spark, dir)
    assert(s2.filter(col("id") === 777L).count() == 0L)
    assert(s2.filter(col("v") === "ONLY_UPD").count() == 1L)
  }

  test("merge on a partitioned table: partition columns must be keys; " +
      "matched rows stay in their partition") {
    val dir = freshDir("mrgpart")
    val df = (1 to 12).map(i => (i.toLong, i % 3, s"v$i"))
      .toDF("id", "p", "v")
    DeltaLake.write(spark, dir, df, partitionBy = Seq("p"))
    val e = intercept[IllegalArgumentException] {
      DeltaLake.merge(spark, dir,
        Seq((1L, 1, "X")).toDF("id", "p", "v"), Seq("id"))
    }
    assert(e.getMessage.contains("partition"))
    DeltaLake.merge(spark, dir,
      Seq((3L, 0, "UPD"), (13L, 1, "NEW")).toDF("id", "p", "v"),
      Seq("id", "p"))
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.filter(col("v") === "UPD").count() == 1L)
    assert(ids(snap) == (1L to 13L).toSet)
    assert(ids(DeltaLake.snapshotWhere(spark, dir, col("p") === 1)) ==
      (1L to 13L).filter(i => i % 3 == 1 || i == 13L).toSet)
  }

  private def stageConfTable(dir: String, configJson: String): Unit = {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.StringType)
    val ss = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val meta = s"""{"metaData":{"id":"t","format":{"provider":"parquet",""" +
      s""""options":{}},"schemaString":"$ss","partitionColumns":[],""" +
      s""""configuration":$configJson}}"""
    val ld = new java.io.File(dir, "_delta_log")
    ld.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(ld, f"${0L}%020d.json").toPath,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}\n$meta\n""")
    ()
  }

  test("DML gates: update/merge refuse declared CHECK constraints; a " +
      "CDF overwrite is refused (full-table change files)") {
    // update/merge EVALUATE declared constraints (r15): violating
    // outputs refuse with the constraint named, satisfying ones land;
    // delete only removes rows and never checks
    val d2 = freshDir("gatecons")
    stageConfTable(d2, """{"delta.constraints.pos":"id > 0"}""")
    DeltaLake.write(spark, d2, frame(1 to 3))
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.update(spark, d2, col("id") === 1L,
        Map("id" -> lit(-1L)))
    }
    assert(e2.getMessage.contains("pos"), e2.getMessage)
    DeltaLake.update(spark, d2, col("id") === 1L, Map("v" -> lit("X")))
    val e3 = intercept[IllegalArgumentException] {
      DeltaLake.merge(spark, d2,
        frame(1 to 2).withColumn("id", -col("id")), Seq("id"))
    }
    assert(e3.getMessage.contains("pos"), e3.getMessage)
    DeltaLake.merge(spark, d2, frame(2 to 4), Seq("id"))
    assert(ids(DeltaLake.snapshot(spark, d2)) == Set(1L, 2L, 3L, 4L))
    val d3 = freshDir("gatecdfow")
    DeltaLake.write(spark, d3, frame(1 to 3),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    val e4 = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, d3, frame(4 to 6), mode = "overwrite")
    }
    assert(e4.getMessage.contains("Change Data Feed"))
  }

  test("CDF-enabled tables: DML writes change files — delete, update " +
      "(pre/post pair), and merge (pre/post + insert) all read back " +
      "through the change feed delta-sized") {
    import org.apache.spark.sql.functions.lit
    val dir = freshDir("cdfdml")
    DeltaLake.write(spark, dir, frame(1 to 20),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLake.delete(spark, dir, col("id") % 5 === 0)          // v1
    DeltaLake.update(spark, dir, col("id") === 3L,             // v2
      Map("v" -> lit("UPD")))
    DeltaLake.merge(spark, dir,                                // v3
      Seq((4L, "MRG"), (42L, "NEW")).toDF("id", "v"), Seq("id"))
    // the table reads correctly through the final DVs + rewrites
    val snap = DeltaLake.snapshot(spark, dir)
    assert(ids(snap) == ((1L to 20L).filterNot(_ % 5 == 0).toSet + 42L))
    // the FEED reconstructs every change from the cdc files alone
    val feed = DeltaLake.changeFeed(spark, dir, afterVersion = 0L)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expected =
      (1L to 20L).filter(_ % 5 == 0).map(i => (i, "delete", 1L)).toSet ++
      Set((3L, "update_preimage", 2L), (3L, "update_postimage", 2L),
        (4L, "update_preimage", 3L), (4L, "update_postimage", 3L),
        (42L, "insert", 3L))
    assert(feed == expected, s"feed mismatch: $feed")
    // the signed seam consumes the same commits via the change files
    val ch = DeltaLake.changes(spark, dir, afterVersion = 0L)
    assert(ids(ch.retracts) == (1L to 20L).filter(_ % 5 == 0).toSet
      ++ Set(3L, 4L))
    assert(ids(ch.inserts) == Set(3L, 4L, 42L))
  }

  test("ICT tables: every DML commit leads with " +
      "commitInfo.inCommitTimestamp") {
    val dir = freshDir("ictdml")
    stageConfTable(dir, """{"delta.enableInCommitTimestamps":"true"}""")
    DeltaLake.write(spark, dir, frame(1 to 10))
    DeltaLake.delete(spark, dir, col("id") === 1L)
    val firstLine = java.nio.file.Files.readAllLines(
      new java.io.File(dir, "_delta_log/" + f"${2L}%020d.json").toPath)
      .get(0)
    assert(firstLine.contains("commitInfo") &&
      firstLine.contains("inCommitTimestamp"), firstLine)
    DeltaLake.update(spark, dir, col("id") === 2L, Map("v" -> lit("X")))
    val updFirst = java.nio.file.Files.readAllLines(
      new java.io.File(dir, "_delta_log/" + f"${3L}%020d.json").toPath)
      .get(0)
    assert(updFirst.contains("inCommitTimestamp"), updFirst)
  }

  test("insert-only merge on a CDF table commits insert change rows " +
      "(no matched rows, no hit-file scan)") {
    val dir = freshDir("cdfinsmrg")
    DeltaLake.write(spark, dir, frame(1 to 5),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLake.merge(spark, dir,
      Seq((100L, "A"), (101L, "B")).toDF("id", "v"), Seq("id"))
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      ((1L to 5L).toSet ++ Set(100L, 101L)))
    val feed = DeltaLake.changeFeed(spark, dir, afterVersion = 0L)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed == Set((100L, "insert"), (101L, "insert")), s"$feed")
  }

  test("null partition values round-trip: the write records JSON null " +
      "(never the Hive sentinel string) and CDF change files agree") {
    val dir = freshDir("nullpart")
    val df = Seq((1L, "a", "x"), (2L, Option.empty[String].orNull, "y"),
      (3L, "a", "z")).toDF("id", "p", "v")
    DeltaLake.write(spark, dir, df, partitionBy = Seq("p"),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.filter(col("p").isNull).count() == 1L,
      "the null partition value must read back as NULL, not as the " +
        "__HIVE_DEFAULT_PARTITION__ sentinel string")
    assert(snap.filter(col("p") === "__HIVE_DEFAULT_PARTITION__")
      .count() == 0L)
    // a CDF delete touching the null partition keeps the null in its
    // change rows too
    DeltaLake.delete(spark, dir, col("id") === 2L)
    val feed = DeltaLake.changeFeed(spark, dir, afterVersion = 0L)
      .filter(col("_change_type") === "delete")
    assert(feed.count() == 1L && feed.filter(col("p").isNull)
      .count() == 1L)
    assert(ids(DeltaLake.snapshot(spark, dir)) == Set(1L, 3L))
  }

  test("ICT timestamps are strictly monotonic across rapid commits") {
    val dir = freshDir("ictmono")
    stageConfTable(dir, """{"delta.enableInCommitTimestamps":"true"}""")
    DeltaLake.write(spark, dir, frame(1 to 10))
    DeltaLake.delete(spark, dir, col("id") === 1L)
    DeltaLake.update(spark, dir, col("id") === 2L, Map("v" -> lit("X")))
    val icts = (1L to 3L).map { v =>
      val first = java.nio.file.Files.readAllLines(new java.io.File(dir,
        "_delta_log/" + f"$v%020d.json").toPath).get(0)
      val n = com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().readTree(first)
      n.get("commitInfo").get("inCommitTimestamp").asLong()
    }
    assert(icts == icts.sorted && icts.distinct.size == 3,
      s"ICT must be strictly increasing: $icts")
  }

  test("restore resets content to a prior version in one commit: " +
      "history stays readable, the signed window nets it, vacuumed " +
      "targets refuse loudly, CDF tables carry the restore diff") {
    val dir = freshDir("restore")
    DeltaLake.write(spark, dir, frame(1 to 20))              // v0
    DeltaLake.delete(spark, dir, col("id") % 5 === 0)        // v1 (DV)
    DeltaLake.write(spark, dir, frame(21 to 25))             // v2
    val v = DeltaLake.restore(spark, dir, 0L)                // v3
    assert(v == 3L)
    assert(ids(DeltaLake.snapshot(spark, dir)) == (1L to 20L).toSet)
    // the undone versions stay time-travel readable
    assert(ids(DeltaLake.snapshot(spark, dir, Some(2L))) ==
      ((1L to 20L).filterNot(_ % 5 == 0).toSet ++ (21L to 25L)))
    // the restore window nets under the signed algebra: the appended
    // file retracts, the DV'd file version swaps for the original
    val ch = DeltaLake.changes(spark, dir, afterVersion = 2L)
    assert(ids(ch.inserts) == (1L to 20L).toSet)
    assert(ids(ch.retracts) ==
      ((1L to 20L).filterNot(_ % 5 == 0).toSet ++ (21L to 25L)))
    // no-op restore → -1, no commit
    assert(DeltaLake.restore(spark, dir, 3L) == -1L)
    assert(DeltaLake.latestVersion(spark, dir) == 3L)
    // a vacuumed restore target refuses up front
    val d2 = freshDir("restvac")
    DeltaLake.write(spark, d2, frame(1 to 10))
    DeltaLake.update(spark, d2, col("id") === 1L, Map("v" -> lit("X")))
    DeltaLake.vacuum(spark, d2, retainVersions = 1)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.restore(spark, d2, 0L)
    }
    assert(e.getMessage.contains("vacuumed"))
    // a CONFIGURATION-only drift still restores (the metaData carries
    // behavior the restore must reset — a file-set-only check would
    // silently skip it)
    val d4 = freshDir("restconf")
    DeltaLake.write(spark, d4, frame(1 to 5))
    val schema4 = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.StringType)
    val ss4 = schema4.json.replace("\\", "\\\\").replace("\"", "\\\"")
    java.nio.file.Files.writeString(new java.io.File(d4,
      "_delta_log/" + f"${1L}%020d.json").toPath,
      s"""{"metaData":{"id":"t","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"$ss4","partitionColumns":[],""" +
        s""""configuration":{"custom.pipeline.tag":"v1-era"}}}\n""")
    assert(DeltaLake.restore(spark, d4, 0L) == 2L,
      "a configuration-only drift must still restore")
    val restored = commitText(d4, 2L)
    assert(restored.contains("\"metaData\"") &&
      !restored.contains("custom.pipeline.tag"),
      s"the restore must reset the configuration: $restored")
    assert(ids(DeltaLake.snapshot(spark, d4)) == (1L to 5L).toSet)
    // CDF tables EMIT the restore's row-level diff as change files
    // (file-level: leaving files' visible rows as deletes, returning
    // files' rows as inserts — same-commit delete+insert pairs net out
    // for any per-commit consumer)
    val d3 = freshDir("restcdf")
    DeltaLake.write(spark, d3, frame(1 to 5),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLake.delete(spark, d3, col("id") === 1L)
    assert(DeltaLake.restore(spark, d3, 0L) == 2L)
    assert(ids(DeltaLake.snapshot(spark, d3)) == (1L to 5L).toSet)
    val c3 = commitText(d3, 2L)
    assert(c3.contains("\"cdc\""),
      s"restore on a CDF table must carry change files: $c3")
    // the restore window of the feed carries exactly the file diff:
    // the DV'd file's visible rows leave (2-5), the clean file's rows
    // return (1-5) — the same-commit pairs net out, restoring id 1
    val feed = DeltaLake.changeFeed(spark, d3, 1L, None)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(feed.toSet ==
      ((2L to 5L).map(i => (i, "delete", 2L)) ++
        (1L to 5L).map(i => (i, "insert", 2L))).toSet,
      s"restore change rows: ${feed.toSeq}")
    // ICT + CDF restore: commitInfo (with the authoritative timestamp)
    // must be the commit's FIRST line — the cdc actions land in the
    // buffer earlier, and an append-after-cdc ordering silently drops
    // the ICT timestamp (the reader takes it from the first line only)
    val d5 = freshDir("restict")
    DeltaLake.write(spark, d5, frame(1 to 5),
      properties = Map("delta.enableChangeDataFeed" -> "true",
        "delta.enableInCommitTimestamps" -> "true"))
    DeltaLake.delete(spark, d5, col("id") === 2L)
    assert(DeltaLake.restore(spark, d5, 0L) == 2L)
    val first5 = java.nio.file.Files.readAllLines(new java.io.File(d5,
      "_delta_log/" + f"${2L}%020d.json").toPath).get(0)
    assert(first5.contains("commitInfo") &&
      first5.contains("inCommitTimestamp") &&
      first5.contains("RESTORE"), first5)
  }

  test("a checkpoint carries the table's protocol VERBATIM: features " +
      "survive a checkpoint-only resume and are not re-upgraded") {
    val dir = freshDir("ckproto")
    DeltaLake.write(spark, dir, frame(1 to 20))
    DeltaLake.delete(spark, dir, col("id") % 5 === 0) // → (3,7) DV protocol
    DeltaLake.stageCheckpoint(spark, dir, 1L)
    // resume from the checkpoint alone: the subsumed commits go
    assert(new java.io.File(dir, "_delta_log/" + f"${0L}%020d.json").delete())
    assert(new java.io.File(dir, "_delta_log/" + f"${1L}%020d.json").delete())
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (1L to 20L).filterNot(_ % 5 == 0).toSet,
      "DV descriptors must survive the checkpoint")
    // the replay-restored protocol already carries deletionVectors:
    // a second delete must NOT emit another protocol action
    DeltaLake.delete(spark, dir, col("id") === 1L)
    val c2 = commitText(dir, 2L)
    assert(!c2.contains("\"protocol\""),
      s"protocol re-upgraded after checkpoint resume — the checkpoint " +
        s"dropped features: $c2")
    assert(ids(DeltaLake.snapshot(spark, dir)) ==
      (2L to 20L).filterNot(_ % 5 == 0).toSet)
  }
}
