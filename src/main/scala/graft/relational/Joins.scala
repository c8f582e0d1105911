package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join strategies for scale: skew salting and bucketed co-location.
  *
  * At 100 TB the two failure modes of a plain equi-join are (a) one hot
  * key landing an entire shuffle partition on one task and (b) re-shuffling
  * a table that is joined on the same key every day. Salting fixes (a)
  * without touching semantics; bucketing fixes (b) at write time. */
object Joins {

  /** Salted equi-join against a (broadcast-able or replicated) build side:
    * the probe side gets a deterministic per-row salt in [0, salts); the
    * build side is replicated once per salt value, so a hot key's rows
    * spread over `salts` shuffle partitions instead of one straggler task.
    *
    * The salt derives from a row hash, not `rand()` — plans stay
    * deterministic and re-executable (a task retry computes the same
    * salt). Results are identical to the unsalted join. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Build-side replication is only sound for probe-preserving joins: a
    // right/full join would emit every unmatched build row once per salt.
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti", "cross")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports probe-preserving join types only, not $joinType")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(salts.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Write both sides bucketed on the join key so subsequent joins are
    * exchange-free: `bucketBy` hashes rows into `buckets` files per
    * partition at WRITE time; a later join of two tables bucketed on the
    * same key with the same bucket count reads co-located buckets and
    * skips the shuffle entirely. Returns the catalog table names. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): String = {
    val spark = df.sparkSession
    // clear both the catalog entry and any stale warehouse location
    if (spark.catalog.tableExists(table)) spark.sql(s"DROP TABLE $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
    table
  }
}
