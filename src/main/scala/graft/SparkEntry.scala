package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{Olap, Queries, QueryDef}
import graft.pipeline.{Dedup, Multimodal, PipelineQueries, Similarity, TextOps}
import graft.streaming.StreamQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private val defs: Seq[QueryDef] =
    Queries.all ++ Olap.all ++ PipelineQueries.all ++ Similarity.all ++
      TextOps.all ++ Dedup.all ++ Multimodal.all ++ StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * `delta_join` exercises the whole novel surface in one query: custom
    * nodes, the delta rewrite, incremental scans, a 3-arm join union
    * (SURVEY.md §7.1).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("delta_join").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (fp
    * cosine ranking, Spark-hash-based sketches) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
