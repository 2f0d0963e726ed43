package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Scratch probe: does Spark's parquet reader serve EXISTS_DEFAULT
  * metadata for columns missing from a file (vectorized + non-vec)?
  */
object DefaultProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("defprobe")
      .toFile.getAbsolutePath
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write
      .mode("overwrite").parquet(dir)
    val meta = new MetadataBuilder()
      .putString("EXISTS_DEFAULT", "'web'")
      .putString("CURRENT_DEFAULT", "'web'").build()
    val metaN = new MetadataBuilder()
      .putString("EXISTS_DEFAULT", "42").build()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("channel", StringType, nullable = true, meta),
      StructField("qty", LongType, nullable = true, metaN)))
    for (vec <- Seq("true", "false")) {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", vec)
      val rows = spark.read.schema(schema).parquet(dir)
        .orderBy("id").collect().toSeq
      println(s"VEC=$vec -> $rows")
    }
    // nested: file has info struct<pri:int, price:float>; read with
    // added member (flag) and widened member types (long, double)
    val dir2 = java.nio.file.Files.createTempDirectory("defprobe2")
      .toFile.getAbsolutePath
    Seq((1L, (10, 1.5f)), (2L, (20, 2.5f))).toDF("id", "info")
      .selectExpr("id",
        "named_struct('pri', info._1, 'price', info._2) AS info")
      .write.mode("overwrite").parquet(dir2)
    val schema2 = StructType(Seq(
      StructField("id", LongType),
      StructField("info", StructType(Seq(
        StructField("pri", LongType),
        StructField("price", DoubleType),
        StructField("flag", StringType))))))
    for (vec <- Seq("true", "false")) {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", vec)
      val rows = try spark.read.schema(schema2).parquet(dir2)
        .orderBy("id").collect().toSeq.toString
      catch { case e: Throwable =>
        "FAIL: " + String.valueOf(e.getMessage).linesIterator
          .take(1).mkString }
      println(s"NESTED VEC=$vec -> $rows")
    }
    spark.stop()
  }
}
