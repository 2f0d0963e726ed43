package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The native Iceberg reader (r9): manifest fold, snapshot read, time
  * travel, the snapshot-to-snapshot append diff, append-only guard,
  * partition pruning through the shared log-backed scan, and the
  * fail-fast guards (non-identity transforms, delete manifests).
  */
class IcebergSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_ice_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(ids: Range): DataFrame =
    ids.map(i => (i.toLong, i.toLong * 10,
      if (i % 2 == 0) "A" else "B")).toDF("id", "v", "p")

  private def rows(df: DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("id")),
      r.getLong(r.fieldIndex("v")), r.getString(r.fieldIndex("p")))).toSet

  private def twoSnapshots(): (String, Long, Long) = {
    val dir = freshDir("two")
    val s1 = Iceberg.stageAppend(spark, dir, frame(0 until 10), Seq("p"))
    val s2 = Iceberg.stageAppend(spark, dir, frame(10 until 20), Seq("p"))
    (dir, s1, s2)
  }

  test("snapshot reads the staged two-snapshot partitioned table") {
    val (dir, _, s2) = twoSnapshots()
    assert(Iceberg.currentSnapshotId(dir) == s2)
    assert(rows(Iceberg.snapshot(spark, dir)) ==
      (0 until 20).map(i => (i.toLong, i.toLong * 10,
        if (i % 2 == 0) "A" else "B")).toSet)
  }

  test("time travel to the first snapshot sees only its rows") {
    val (dir, s1, _) = twoSnapshots()
    assert(rows(Iceberg.snapshot(spark, dir, Some(s1))) ==
      (0 until 10).map(i => (i.toLong, i.toLong * 10,
        if (i % 2 == 0) "A" else "B")).toSet)
  }

  test("TIMESTAMP AS OF resolves from the snapshot log's timestamp-ms") {
    val (dir, s1, s2) = twoSnapshots()
    // fixture timestamps are 1700000000000 + version
    val t1 = 1700000000000L + s1
    assert(Iceberg.snapshotIdAt(dir, t1) == s1)
    // anything at/after s2's timestamp (1 ms later) resolves to s2
    assert(Iceberg.snapshotIdAt(dir, t1 + 500) == s2)
    assert(Iceberg.snapshotIdAt(dir, 1700000000000L + s2) == s2)
    assert(rows(Iceberg.snapshotAsOf(spark, dir, t1)).size == 10)
    intercept[IllegalArgumentException] {
      Iceberg.snapshotIdAt(dir, t1 - 1000)
    }
  }

  test("appended: the snapshot-to-snapshot live-file diff") {
    val (dir, s1, _) = twoSnapshots()
    assert(rows(Iceberg.appended(spark, dir, afterSnapshotId = s1)) ==
      (10 until 20).map(i => (i.toLong, i.toLong * 10,
        if (i % 2 == 0) "A" else "B")).toSet)
  }

  test("isAppendOnly and snapshotIds over the staged history") {
    val (dir, s1, s2) = twoSnapshots()
    assert(Iceberg.snapshotIds(dir) == Seq(s1, s2))
    assert(Iceberg.isAppendOnly(spark, dir, s1, s2))
    assert(Iceberg.liveFileNames(spark, dir, s1).nonEmpty)
  }

  test("partition predicate reaches the single scan as a PartitionFilters entry") {
    import org.apache.spark.sql.classic
    val (dir, _, _) = twoSnapshots()
    val q = Iceberg.snapshot(spark, dir).filter(col("p") === "A")
    val p = q.asInstanceOf[classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"expected one scan over the log-backed index:\n$p")
    assert("PartitionFilters: \\[[^\\]]*p#".r.findFirstIn(p).nonEmpty,
      s"partition predicate must reach the scan:\n$p")
    assert(q.collect().forall(_.getString(2) == "A"))
  }

  test("schema round-trip: Spark -> Iceberg JSON -> Spark") {
    import org.apache.spark.sql.types._
    val s = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType),
      StructField("c", DoubleType),
      StructField("d", DecimalType(20, 2)),
      StructField("e", TimestampNTZType)))
    val back = Iceberg.structFromIceberg(
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Iceberg.icebergSchemaJson(s)))
    assert(back.map(f => (f.name, f.dataType, f.nullable)) ==
      s.map(f => (f.name, f.dataType, f.nullable)))
  }

  test("manifest bounds: stats skipping plans only intersecting files") {
    val dir = freshDir("bounds")
    // range-clustered: two snapshots with disjoint id ranges, each one
    // unpartitioned file per append (coalesce(1))
    Iceberg.stageAppend(spark, dir,
      frame(0 until 10).coalesce(1), Seq.empty)
    Iceberg.stageAppend(spark, dir,
      frame(100 until 110).coalesce(1), Seq.empty)
    assert(Iceberg.snapshot(spark, dir).inputFiles.length == 2)
    val hi = Iceberg.snapshotWhere(spark, dir, col("id") >= 100L)
    assert(hi.inputFiles.length == 1,
      "upper/lower bounds must prove the low file empty")
    assert(hi.count() == 10L)
    // string bounds skip too
    val byP = Iceberg.snapshotWhere(spark, dir, col("p") > "Z")
    assert(byP.inputFiles.isEmpty || byP.count() == 0L)
    // pushed filters skip inside the index as well (plain filter on the
    // snapshot — LogFileIndex keep path)
    import org.apache.spark.sql.classic
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val q = try {
      val f = Iceberg.snapshot(spark, dir).filter(col("id") >= 100L)
      f.collect()
      f
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    val scan = q.asInstanceOf[classic.Dataset[_]].queryExecution
      .executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
    assert(scan.metrics("numFiles").value == 1L,
      "pushed filter must stats-skip the low file inside listFiles")
  }

  test("frame with nulls: bounds drop null-only columns, skipping stays " +
      "conservative") {
    val dir = freshDir("nulls")
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "s").coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq.empty)
    // a predicate on the null-only column keeps the file (no bounds)
    assert(Iceberg.snapshotWhere(spark, dir, col("s") > "x")
      .inputFiles.length == 1)
  }

  test("stageDelete + changes: the signed diff nets to the deleted rows " +
      "and the splice equals full recompute") {
    import org.apache.spark.sql.functions.{count, countDistinct, lit, sum}
    val dir = freshDir("del")
    val s1 = Iceberg.stageAppend(spark, dir, frame(0 until 10), Seq("p"))
    val s2 = Iceberg.stageAppend(spark, dir, frame(10 until 20), Seq("p"))
    val s3 = Iceberg.stageDelete(spark, dir,
      col("id") % 3 === 0 && col("p") === "A")
    assert(Iceberg.snapshotIds(dir) == Seq(s1, s2, s3))
    // snapshot reflects the delete; time travel sees the pre-delete state
    val want = (0 until 20).filterNot(i => i % 3 == 0 && i % 2 == 0)
      .map(i => (i.toLong, i.toLong * 10,
        if (i % 2 == 0) "A" else "B")).toSet
    assert(rows(Iceberg.snapshot(spark, dir)) == want)
    assert(rows(Iceberg.snapshot(spark, dir, Some(s2))).size == 20)
    // signed diff: retracts ⊇ deleted; inserts = survivors re-added
    val ch = Iceberg.changes(spark, dir, afterSnapshotId = s2)
    val deleted = Set(0, 6, 12, 18).map(i => (i.toLong, i.toLong * 10, "A"))
    val (rets, ins) = (rows(ch.retracts), rows(ch.inserts))
    assert(deleted.subsetOf(rets))
    assert(ins == rets -- deleted)
    // append-only guard now refuses the window; signedRows serves it
    graft.ivm.IcebergSnapshots.track(spark, "ice_del", dir, at = Some(s2))
    intercept[IllegalArgumentException] {
      graft.ivm.IcebergSnapshots.view(spark, "ice_del")
    }
    // group-scoped splice == full recompute (countDistinct included)
    val aggOf = (df: org.apache.spark.sql.DataFrame) => df.groupBy("p")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"),
        countDistinct(col("id") % 5).as("nd"))
    val stored = aggOf(Iceberg.snapshot(spark, dir, Some(s2)))
    val got = graft.ivm.IcebergSnapshots.maintainAgg(spark, "ice_del",
      stored, Seq("p"), aggOf)
    assert(got.orderBy("p").collect().toSeq ==
      aggOf(Iceberg.snapshot(spark, dir)).orderBy("p").collect().toSeq)
    assert(graft.ivm.IcebergSnapshots.cut("ice_del").contains(s3))
  }

  test("bounds field ids survive a nested struct between columns") {
    // icebergSchemaJson assigns ids PRE-ORDER (a=1, s=2, s.u=3, b=4);
    // keying bounds by a bare top-level ordinal would attribute b's
    // bounds to id 3 (s.u) — or worse, another column's — and skipping
    // would prove files empty that aren't
    val dir = freshDir("nested")
    import org.apache.spark.sql.functions.struct
    val df1 = Seq((1L, 5L, 10L), (2L, 6L, 20L)).toDF("a", "u", "b")
      .select(col("a"), struct(col("u")).as("s"), col("b")).coalesce(1)
    val df2 = Seq((3L, 7L, 100L), (4L, 8L, 200L)).toDF("a", "u", "b")
      .select(col("a"), struct(col("u")).as("s"), col("b")).coalesce(1)
    Iceberg.stageAppend(spark, dir, df1, Seq.empty)
    Iceberg.stageAppend(spark, dir, df2, Seq.empty)
    val hi = Iceberg.snapshotWhere(spark, dir, col("b") >= 100L)
    assert(hi.count() == 2L, "bounds on b must not mis-skip the high file")
    assert(hi.inputFiles.length == 1,
      "bounds on b must still skip the low file")
  }

  test("partition spec evolution with an unchanged identity set READS " +
      "via per-manifest decoding (r11 — was an interim fail-fast)") {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    val dir = freshDir("specevo")
    val df = (1L to 20L).map(i => (i, s"p${i % 2}")).toDF("id", "p")
      .coalesce(1)
    Iceberg.stageAppend(spark, dir, df, Seq("p"))
    // simulate a spec evolution: a NEW default spec id lands while the
    // existing manifests still carry the old spec id. Each manifest's
    // partition records decode against the spec it was WRITTEN under,
    // and the identity column set is unchanged — so the read must
    // surface every row with its real partition values, never nulls
    // (IDENTITY-set evolution, the one unreadable layout, is pinned
    // loud in IcebergTransformSpec)
    val mdDir = new java.io.File(dir, "metadata")
    val latest = mdDir.listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val M = new ObjectMapper()
    val md = M.readTree(
      java.nio.file.Files.readString(latest.toPath)).asInstanceOf[ObjectNode]
    val specs = md.get("partition-specs").asInstanceOf[ArrayNode]
    val evolved = specs.get(0).deepCopy[ObjectNode]()
    evolved.put("spec-id", 1)
    specs.add(evolved)
    md.put("default-spec-id", 1)
    java.nio.file.Files.writeString(
      new java.io.File(mdDir, "v2.metadata.json").toPath,
      M.writeValueAsString(md))
    java.nio.file.Files.writeString(
      new java.io.File(mdDir, "version-hint.text").toPath, "2")
    val rows = Iceberg.snapshot(spark, dir)
      .select("id", "p").collect()
    assert(rows.length == 20)
    assert(rows.forall(r => !r.isNullAt(1) &&
      r.getString(1) == s"p${r.getLong(0) % 2}"),
      "pre-evolution files must decode their partition values under " +
        "their own spec, never null")
  }

  test("an expired (missing) data file fails LOUDLY, never an empty split") {
    val dir = freshDir("expired")
    Iceberg.stageAppend(spark, dir, frame(0 until 10).coalesce(1), Seq.empty)
    val victim = new java.io.File(Iceberg.snapshot(spark, dir)
      .inputFiles.head.stripPrefix("file:"))
    assert(victim.delete())
    val e = intercept[Exception] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e.toString.contains("FileNotFound") ||
      Option(e.getCause).exists(_.toString.contains("FileNotFound")) ||
      e.toString.toLowerCase.contains("does not exist"),
      s"expected a loud missing-file failure, got: $e")
  }

  test("stageUpdate: old-row SET semantics, signed diff nets to the " +
      "updated rows, splice equals recompute") {
    import org.apache.spark.sql.functions.{count, lit, sum}
    val dir = freshDir("upd")
    val s1 = Iceberg.stageAppend(spark, dir, frame(0 until 10), Seq("p"))
    val s2 = Iceberg.stageUpdate(spark, dir,
      col("id") % 3 === 0 && col("p") === "A",
      Map("v" -> (col("v") + 1)))
    val want = (0 until 10).map { i =>
      val hit = i % 3 == 0 && i % 2 == 0
      (i.toLong, i.toLong * 10 + (if (hit) 1 else 0),
        if (i % 2 == 0) "A" else "B")
    }.toSet
    assert(rows(Iceberg.snapshot(spark, dir)) == want)
    // signed identity + splice through the update snapshot
    val ch = Iceberg.changes(spark, dir, afterSnapshotId = s1)
    val applied = graft.ivm.Ivm.SignedDelta(ch.inserts, ch.retracts)
      .applyTo(Iceberg.snapshot(spark, dir, Some(s1)))
    assert(rows(applied) == want)
    graft.ivm.IcebergSnapshots.track(spark, "ice_upd", dir, at = Some(s1))
    val aggOf = (df: org.apache.spark.sql.DataFrame) => df.groupBy("p")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
    val got = graft.ivm.IcebergSnapshots.maintainAgg(spark, "ice_upd",
      aggOf(Iceberg.snapshot(spark, dir, Some(s1))), Seq("p"), aggOf)
    assert(got.orderBy("p").collect().toSeq ==
      aggOf(Iceberg.snapshot(spark, dir)).orderBy("p").collect().toSeq)
    assert(graft.ivm.IcebergSnapshots.cut("ice_upd").contains(s2))
  }

  test("fail-fast: an UNKNOWN partition transform (bucket now reads)") {
    val (dir, _, _) = twoSnapshots()
    // bucket/truncate/days are SUPPORTED since r10; an unknown
    // transform (e.g. void) must still fail fast — a derived value
    // with an unknown derivation cannot be pruned or trusted
    val md = new java.io.File(dir, "metadata")
    val f = Option(md.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toLong)
    val txt = java.nio.file.Files.readString(f.toPath)
      .replace("\"transform\":\"identity\"", "\"transform\":\"void\"")
    java.nio.file.Files.writeString(f.toPath, txt)
    val e = intercept[UnsupportedOperationException] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e.getMessage.contains("not supported"))
  }

  test("fail-fast: a malformed delete manifest (non-positional entries)") {
    val (dir, _, s2) = twoSnapshots()
    // rewrite the current manifest list with content=1 (delete manifest)
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    val md = new java.io.File(dir, "metadata")
    val ml = new java.io.File(md, s"snap-$s2.avro")
    val rd = new DataFileReader[GenericRecord](ml,
      new GenericDatumReader[GenericRecord]())
    val schema = rd.getSchema
    val recs = { import scala.jdk.CollectionConverters._
      rd.iterator().asScala.toList }
    rd.close()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, ml)
    recs.foreach { r => r.put("content", 1); w.append(r) }
    w.close()
    // marking a DATA manifest as a delete manifest leaves content=0
    // entries inside a content=1 manifest: positional-only enforcement
    // must reject it loudly (equality deletes, content=2, hit the same
    // guard) instead of planning data files as delete files
    val e = intercept[IllegalArgumentException] {
      Iceberg.snapshot(spark, dir).collect()
    }
    assert(e.getMessage.contains("delete manifest"))
  }

  test("catalog-layout metadata names (<N>-<uuid>.metadata.json) resolve") {
    val (dir, s1, s2) = twoSnapshots()
    // rename the Hadoop-layout files to the catalog layout: the reader
    // must order by the leading ordinal across either naming scheme
    val md = new java.io.File(dir, "metadata")
    Option(md.listFiles()).toSeq.flatten
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .foreach { f =>
        val n = f.getName.stripPrefix("v")
          .stripSuffix(".metadata.json").toLong
        val uuid = java.util.UUID.nameUUIDFromBytes(
          f.getName.getBytes("UTF-8"))
        assert(f.renameTo(new java.io.File(md,
          f"$n%05d-$uuid.metadata.json")))
      }
    assert(Iceberg.currentSnapshotId(dir) == s2)
    assert(rows(Iceberg.snapshot(spark, dir)).size == 20)
    assert(rows(Iceberg.snapshot(spark, dir, Some(s1))).size == 10)
  }
}
