package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.functions.col
import graft.ivm.{DeltaSources, Ivm}

object GtkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .appName("gtk-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L),
      (5L, "a", 50L)).toDF("id", "g", "v").createOrReplaceTempView("gtk_src")
    DeltaSources.register("gtk_src", "id >= 5")
    val full = spark.table("gtk_src")
    val ord = Seq(col("v").desc, col("id").asc)
    val sd = Ivm.deltaGroupTopK(full, Seq("g"), ord, 1)
    println("=== inserts filter")
    println(sd.inserts.filter(col("g") === "b").isEmpty)
    println(sd.retracts.filter(col("g") === "b").isEmpty)
    println("=== insert ids")
    println(sd.inserts.select("id").collect().map(_.getLong(0)).toSet)
    println(sd.retracts.select("id").collect().map(_.getLong(0)).toSet)
    println("=== applyTo")
    val prev = Ivm.groupTopK(Ivm.baseOf(full), Seq("g"), ord, 1)
    val lhs = sd.applyTo(prev)
    val rhs = Ivm.groupTopK(full, Seq("g"), ord, 1)
    println(lhs.exceptAll(rhs).count() + " " + rhs.exceptAll(lhs).count())
    spark.stop()
  }
}
