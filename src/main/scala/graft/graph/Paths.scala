package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X98: multi-source BFS hop distances — "how far is every document
  * from the trusted seed set", the reachability companion to seeded
  * personalized PageRank (distance-from-seed is a standard crawl-depth
  * / trust-tier curation signal).
  *
  * Frontier propagation with the [[EntityResolution]] /[[PageRank]]
  * loop discipline: the edge table is partitioned by `src` and
  * checkpointed ONCE; each round joins only the frontier (at most
  * node-sized, typically much smaller) onto that static partitioning,
  * anti-joins the already-settled set, and eagerly localCheckpoints the
  * new frontier so every round analyzes a constant-size plan. Rounds
  * stop early when the frontier drains — the count is already
  * materialized by the eager checkpoint, so the check is free.
  *
  * BFS (not Dijkstra): every edge costs 1 hop, so the first time a node
  * is reached IS its minimum distance — no relaxation needed, each node
  * settles exactly once and per-round shuffle volume only shrinks. */
object Paths {

  /** Minimum hop count from ANY seed along directed edges, up to
    * `maxHops`. Output: (node, hops) for reached nodes only — seeds at
    * 0; unreachable nodes are absent (their distance is not a number,
    * not a sentinel). */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val ed = graft.util.Caches.trackCheckpointed(
      e.repartition(col("src")).localCheckpoint(true))
    var settled = graft.util.Caches.trackCheckpointed(
      seeds.select(col(seedCol).cast("long").as("node")).distinct()
        .withColumn("hops", lit(0L)).localCheckpoint(true))
    var frontier = settled
    var hop = 0L
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = graft.util.Caches.trackCheckpointed(
        ed.join(frontier.withColumnRenamed("node", "src").drop("hops"),
            "src")
          .select(col("dst").as("node")).distinct()
          .join(settled, Seq("node"), "left_anti")
          .withColumn("hops", lit(hop))
          .localCheckpoint(true))
      settled = graft.util.Caches.trackCheckpointed(
        settled.unionByName(next).localCheckpoint(true))
      frontier = next
    }
    settled
  }
}
