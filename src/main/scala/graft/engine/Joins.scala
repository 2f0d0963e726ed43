package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join helpers for hostile key distributions at scale.
  *
  * Spark's AQE splits skewed sort-merge partitions automatically
  * (`spark.sql.adaptive.skewJoin`), which is the first line of defense.
  * [[saltedJoin]] is the explicit fallback for the pathological case AQE
  * can't fix: ONE key so hot that a single task would still own it after
  * splitting (every split of the partition holds the same key). Salting
  * shards the hot key's rows across `salt` sub-keys and replicates the
  * small side's matching rows to each shard, so the hot key's work spreads
  * over `salt` tasks.
  */
object Joins {

  /** Inner equi-join `big ⋈ small` on `bigKey == smallKey`, with the big
    * side sharded into `salt` sub-keys and the small side replicated
    * `salt`×. Result is row-identical to the plain join (pinned by
    * `JoinsSpec`); cost is `salt`× the small side's shuffle volume — use
    * only when the small side is small and a key is genuinely hot.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // the shard must be DETERMINISTIC PER ROW CONTENT, not per arrival
    // order: monotonically_increasing_id would reassign shards when a task
    // retry or speculative attempt replays an upstream shuffle partition in
    // a different order, duplicating or losing join rows under the exact
    // fault model salting targets (hot keys at cluster scale). Hashing the
    // big side's hashable columns (xxhash64 rejects MapType) is stable
    // across recomputation; rows identical in every hashed column share a
    // shard, so a hot key whose rows differ only in a map column (or not
    // at all) needs an explicit disambiguating column from the caller.
    val hashable = big.schema.fields.filterNot(f =>
      hasMapType(f.dataType)).map(f => col(f.name))
    require(hashable.nonEmpty,
      "saltedJoin: big side has no hashable (non-map) columns to derive a " +
        "deterministic shard from")
    val shard = pmod(xxhash64(hashable.toIndexedSeq: _*), lit(salt.toLong))
    val b = big.withColumn("__salt", shard)
    val s = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"), "inner")
      .drop("__salt")
  }

  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case ArrayType(e, _) => hasMapType(e)
      case StructType(fields) => fields.exists(f => hasMapType(f.dataType))
      case _ => false
    }
  }
}
