package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X142: RENDEZVOUS (HIGHEST-RANDOM-WEIGHT) SHARDING (Thaler &
  * Ravishankar 1996, public knowledge) — assign every row the shard
  * whose per-(id, shard) hash is highest. The property that matters at
  * fleet scale: growing K → K+1 shards moves ONLY the rows whose new
  * shard's hash wins — an expected 1/(K+1) of the data, each moving TO
  * the new shard — where `id % K` reshuffles (K−1)/K ≈ everything.
  * That is the difference between a shard split that recopies ~11% of
  * 100 TB and one that recopies ~89%.
  *
  * Determinism: the weight is the repo's seeded md5 uniform
  * ([[graft.curate.Curation.uniformHash]] — mirrored digit-for-digit
  * by the oracle), the argmax is a `greatest` over (hash, shard)
  * structs (ties — cryptographically negligible — break to the
  * HIGHEST shard id, pinned). Pure per-row projection: zero shuffle,
  * codegen-friendly, `shards` is a small literal fan (≤ 64). */
object Sharding {

  def rendezvousShards(df: DataFrame, idCol: String, shards: Int,
      seed: String = "hrw"): DataFrame = {
    require(shards >= 1 && shards <= 64,
      s"shards must be in [1, 64], got $shards")
    val cands = (0 until shards).map { k =>
      struct(graft.curate.Curation.uniformHash(
        concat_ws("#", col(idCol).cast("string"), lit(k)), seed)
        .as("h"), lit(k).as("k"))
    }
    df.withColumn("shard", greatest(cands: _*).getField("k"))
  }

  /** Per-shard balance summary: (shard, n_rows). */
  def shardPlan(df: DataFrame, idCol: String, shards: Int,
      seed: String = "hrw"): DataFrame =
    rendezvousShards(df, idCol, shards, seed)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"))
}
