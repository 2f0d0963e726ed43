package graft.sources

import org.apache.spark.sql.functions.{col, lit, parse_json}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The PUBLIC batch writer ([[DeltaLake.write]]): table creation,
  * append, overwrite, additive schema evolution (old files surface new
  * columns as null; type changes refused), partition-layout guards,
  * protocol-feature union upgrades, and the writer-feature /
  * appendOnly / constraints gates — the contracts a production writer
  * must keep so OTHER readers of the table stay correct.
  */
class DeltaWriteSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_write_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def frame(r: Range) =
    r.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  /** Hand-stage a v0 log (protocol + metaData only) so gate tests can
    * carry arbitrary protocol/configuration shapes no fixture emits.
    */
  private def stageBareTable(dir: String, protocolJson: String,
      configJson: String,
      schema: org.apache.spark.sql.types.StructType =
        new org.apache.spark.sql.types.StructType()
          .add("id", org.apache.spark.sql.types.LongType)
          .add("v", org.apache.spark.sql.types.StringType)): Unit = {
    val ss = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val meta = s"""{"metaData":{"id":"t","format":{"provider":"parquet",""" +
      s""""options":{}},"schemaString":"$ss","partitionColumns":[],""" +
      s""""configuration":$configJson}}"""
    val ld = new java.io.File(dir, "_delta_log")
    ld.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(ld, f"${0L}%020d.json").toPath,
      s"$protocolJson\n$meta\n")
    ()
  }

  test("write creates, appends, and overwrites; history + time travel " +
      "see each commit") {
    val dir = freshDir("basic")
    assert(DeltaLake.write(spark, dir, frame(1 to 10)) == 0L)
    assert(DeltaLake.write(spark, dir, frame(11 to 20)) == 1L)
    assert(ids(DeltaLake.snapshot(spark, dir)) == (1L to 20L).toSet)
    assert(ids(DeltaLake.snapshot(spark, dir, Some(0L))) ==
      (1L to 10L).toSet)
    assert(DeltaLake.write(spark, dir, frame(21 to 25),
      mode = "overwrite") == 2L)
    assert(ids(DeltaLake.snapshot(spark, dir)) == (21L to 25L).toSet)
    // pre-overwrite versions stay readable until vacuum
    assert(ids(DeltaLake.snapshot(spark, dir, Some(1L))) ==
      (1L to 20L).toSet)
    val ops = DeltaLake.history(spark, dir)
      .orderBy("version").select("operation")
      .collect().map(_.getString(0)).toSeq
    // r17: public commits stamp commitInfo.operation — creation and
    // overwrite report their own names instead of the derived WRITE
    assert(ops == Seq("CREATE TABLE", "WRITE", "OVERWRITE"))
  }

  test("partitioned create; later appends inherit the layout; a " +
      "mismatched layout is refused") {
    val dir = freshDir("parts")
    val df = (1 to 20).map(i => (i.toLong, i % 4, s"v$i"))
      .toDF("id", "bucket", "v")
    DeltaLake.write(spark, dir, df, partitionBy = Seq("bucket"))
    // no partitionBy given: the table's own layout applies
    DeltaLake.write(spark, dir,
      Seq((21L, 1, "v21")).toDF("id", "bucket", "v"))
    assert(ids(DeltaLake.snapshot(spark, dir)) == (1L to 21L).toSet)
    assert(ids(DeltaLake.snapshotWhere(spark, dir, col("bucket") === 1))
      == (1L to 21L).filter(i => i % 4 == 1 || i == 21L).toSet)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, dir,
        Seq((22L, 2, "v22")).toDF("id", "bucket", "v"),
        partitionBy = Seq("id"))
    }
    assert(e.getMessage.contains("partition"))
    // a batch MISSING a partition column is refused (null-filling it
    // would land every row in the default partition)
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, dir, Seq((23L, "v23")).toDF("id", "v"))
    }
    assert(e2.getMessage.contains("partition column"))
  }

  test("additive evolution: a new column joins the schema, old files " +
      "surface it as null; a type change is refused; a batch missing " +
      "a data column is null-filled") {
    val dir = freshDir("evolve")
    DeltaLake.write(spark, dir, frame(1 to 5))
    DeltaLake.write(spark, dir,
      Seq((6L, "v6", 3.5)).toDF("id", "v", "score"))
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(snap.filter(col("score").isNotNull).count() == 1L)
    assert(snap.count() == 6L)
    // type change refused
    val e = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, dir, Seq((7L, 9, 1.0)).toDF("id", "v", "score"))
    }
    assert(e.getMessage.contains("type"))
    // missing data column null-filled
    DeltaLake.write(spark, dir, Seq((8L, "v8")).toDF("id", "v"))
    val last = DeltaLake.snapshot(spark, dir).filter(col("id") === 8L)
    assert(last.select("score").collect().head.isNullAt(0))
  }

  test("a batch introducing VARIANT upgrades the protocol by UNION — " +
      "the table's existing reader features survive") {
    val dir = freshDir("variant")
    DeltaLake.write(spark, dir, frame(1 to 10))
    // a DV delete moves the table to (3, 7) with deletionVectors
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") === 1L, 1L)
    DeltaLake.write(spark, dir, (11 to 12).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v")
      .withColumn("payload", parse_json(lit("""{"a":1}"""))))
    // both features must be live: DV rows stay deleted AND the variant
    // column reads
    val snap = DeltaLake.snapshot(spark, dir)
    assert(ids(snap) == (2L to 12L).toSet)
    assert(snap.filter(col("payload").isNotNull).count() == 2L)
    val log = new java.io.File(dir, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).map(_.toPath).sortBy(_.toString)
    val lastCommit = java.nio.file.Files.readString(log.last)
    assert(lastCommit.contains("deletionVectors") &&
      lastCommit.contains("variantType"),
      s"the upgrade must UNION features, got: $lastCommit")
  }

  test("gates: unsupported writer features, appendOnly overwrite, and " +
      "declared constraints are refused before any byte lands") {
    val d1 = freshDir("gate1")
    stageBareTable(d1, """{"protocol":{"minReaderVersion":1,""" +
      """"minWriterVersion":7,"writerFeatures":["rowTracking"]}}""",
      "{}")
    val e1 = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, d1, frame(1 to 3))
    }
    assert(e1.getMessage.contains("rowTracking"))

    val d2 = freshDir("gate2")
    stageBareTable(d2,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"delta.appendOnly":"true"}""")
    DeltaLake.write(spark, d2, frame(1 to 3)) // append is fine
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, d2, frame(4 to 6), mode = "overwrite")
    }
    assert(e2.getMessage.contains("appendOnly"))

    // CHECK constraints are EVALUATED (r15): satisfying rows land,
    // a violating batch refuses with the constraint named
    val d3 = freshDir("gate3")
    stageBareTable(d3,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""",
      """{"delta.constraints.positive":"id > 0"}""")
    DeltaLake.write(spark, d3, frame(1 to 3))
    assert(DeltaLake.snapshot(spark, d3).count() == 3)
    val e3 = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, d3,
        frame(1 to 3).withColumn("id", -col("id")))
    }
    assert(e3.getMessage.contains("positive"), e3.getMessage)
    assert(DeltaLake.snapshot(spark, d3).count() == 3)
  }

  test("schema evolution preserves the table's configuration and id — " +
      "a metaData action replaces its predecessor wholesale") {
    val dir = freshDir("metacarry")
    stageBareTable(dir,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"delta.enableInCommitTimestamps":"true"}""")
    DeltaLake.write(spark, dir, frame(1 to 3))
    // evolving append: the fresh metaData must CARRY config + id "t"
    DeltaLake.write(spark, dir,
      Seq((4L, "v4", 1.5)).toDF("id", "v", "score"))
    val evo = java.nio.file.Files.readString(new java.io.File(dir,
      "_delta_log/" + f"${2L}%020d.json").toPath)
    assert(evo.contains("delta.enableInCommitTimestamps"),
      s"configuration silently dropped by evolution: $evo")
    assert(evo.contains("\"id\":\"t\""),
      s"table id silently re-keyed by evolution: $evo")
  }

  test("declared GENERATED columns are computed/validated (r15, " +
      "formerly refused): wrong provided values refuse, omitted " +
      "values compute") {
    val dir = freshDir("gencol")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.StringType,
        nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.generationExpression", "CAST(id AS STRING)")
          .build())
    stageBareTable(dir,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      "{}", schema)
    // frame provides v = "v1".. which diverges from CAST(id AS STRING)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, dir, frame(1 to 3))
    }
    assert(e.getMessage.contains("generated:v"), e.getMessage)
    // omitting v: computed per the generation expression
    DeltaLake.write(spark, dir,
      (1 to 3).map(_.toLong).toDF("id"))
    assert(DeltaLake.snapshot(spark, dir)
      .filter(col("v") === col("id").cast("string")).count() == 3)
  }

  test("creation properties: unmappable protocol-backed keys are " +
      "refused; enableDeletionVectors pre-lists the feature so the " +
      "first delete needs no upgrade; an ICT table's checkpoint keeps " +
      "minReaderVersion 1 verbatim") {
    val d1 = freshDir("prop1")
    val e = intercept[IllegalArgumentException] {
      DeltaLake.write(spark, d1, frame(1 to 3),
        properties = Map("delta.columnMapping.mode" -> "name"))
    }
    assert(e.getMessage.contains("columnMapping"))
    val d2 = freshDir("prop2")
    DeltaLake.write(spark, d2, frame(1 to 10),
      properties = Map("delta.enableDeletionVectors" -> "true"))
    DeltaLake.delete(spark, d2, col("id") === 1L)
    val c1 = java.nio.file.Files.readString(new java.io.File(d2,
      "_delta_log/" + f"${1L}%020d.json").toPath)
    assert(!c1.contains("\"protocol\""),
      s"the feature was pre-listed at creation — no upgrade needed: $c1")
    assert(ids(DeltaLake.snapshot(spark, d2)) == (2L to 10L).toSet)
    // checkpoint VERBATIM on a (1,7) ICT protocol: minReader stays 1
    val d3 = freshDir("prop3")
    DeltaLake.write(spark, d3, frame(1 to 5),
      properties = Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaLake.stageCheckpoint(spark, d3, 0L)
    val ck = spark.read.parquet(
      d3 + "/_delta_log/" + f"${0L}%020d.checkpoint.parquet")
    val proto = ck.filter(col("protocol").isNotNull)
      .select("protocol.minReaderVersion").collect().head.getInt(0)
    assert(proto == 1,
      "a checkpoint must not bump minReaderVersion past the live protocol")
    assert(ids(DeltaLake.snapshot(spark, d3)) == (1L to 5L).toSet)
  }

  test("an ICT table's commit leads with commitInfo.inCommitTimestamp") {
    val dir = freshDir("ict")
    stageBareTable(dir,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"delta.enableInCommitTimestamps":"true"}""")
    DeltaLake.write(spark, dir, frame(1 to 3))
    val commit = new java.io.File(dir,
      "_delta_log/" + f"${1L}%020d.json")
    val first = java.nio.file.Files.readAllLines(commit.toPath).get(0)
    assert(first.contains("commitInfo") &&
      first.contains("inCommitTimestamp"), first)
  }

  test("overwrite carries a removed file's DV on its remove action " +
      "(the signed changelog nets the window correctly)") {
    val dir = freshDir("dvow")
    DeltaLake.write(spark, dir, frame(1 to 10))
    DeltaLake.stageDvDeleteCommit(spark, dir, col("id") <= 2L, 1L)
    DeltaLake.write(spark, dir, frame(21 to 22), mode = "overwrite")
    assert(ids(DeltaLake.snapshot(spark, dir)) == Set(21L, 22L))
    // the overwrite window nets: retract the 8 live pre-overwrite rows
    // (NOT the 2 DV-dead ones), insert the 2 new rows
    val ch = DeltaLake.changes(spark, dir, afterVersion = 1L)
    assert(ids(ch.inserts) == Set(21L, 22L))
    assert(ids(ch.retracts) == (3L to 10L).toSet)
  }
}
