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

  /** X108: deterministic RANDOM-WALK corpus generation — the DeepWalk /
    * node2vec first stage (Perozzi 2014, public knowledge): emit one
    * walk of ≤ `length` steps per seed, where the step out of node u at
    * step t picks neighbor index `(u·13 + t·17) mod deg(u)` among
    * dst-ordered neighbors. A HASH-INDEXED pick, not `rand()`: walk
    * corpora feed embedding training, and a re-run must produce the
    * SAME corpus (the X12 determinism discipline) — and the arithmetic
    * pick is exactly mirrorable by a SQL oracle where a PRNG is not.
    * Walks end early at sink nodes (no out-edges).
    *
    * Shape: the indexed adjacency (neighbor rank + degree per src —
    * one window over the edge set) is partitioned by src and
    * checkpointed once; each step joins the seeds-sized position table
    * against it (every position has EXACTLY one successor, so the walk
    * table never grows within a step), eagerly localCheckpoint'ed.
    * Output: (walk_id, step, node) — walk_id = seed node. */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, length: Int): DataFrame = {
    require(length >= 0, s"length must be >= 0, got $length")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dst"))
    val adj = graft.util.Caches.trackCheckpointed(
      e.withColumn("idx", row_number().over(w).cast("long") - 1L)
        .withColumn("deg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src")))
          .cast("long"))
        .repartition(col("src")).localCheckpoint(true))
    var cur = graft.util.Caches.trackCheckpointed(
      seeds.select(col(seedCol).cast("long").as("walk_id")).distinct()
        .withColumn("step", lit(0L))
        .withColumn("node", col("walk_id")).localCheckpoint(true))
    var out = cur
    var t = 0L
    while (t < length && !cur.isEmpty) {
      val next = graft.util.Caches.trackCheckpointed(
        cur.withColumnRenamed("node", "src")
          .join(adj, Seq("src"))
          .filter(col("idx") ===
            pmod(col("src") * 13L + col("step") * 17L, col("deg")))
          .select(col("walk_id"), (col("step") + 1L).as("step"),
            col("dst").as("node"))
          .localCheckpoint(true))
      out = graft.util.Caches.trackCheckpointed(
        out.unionByName(next).localCheckpoint(true))
      cur = next
      t += 1
    }
    out
  }

  /** X107: WEIGHTED shortest distances from a seed set — bounded
    * BELLMAN–FORD (the relaxation form that distributes; Dijkstra's
    * priority queue is inherently sequential): `rounds` synchronous
    * relaxation sweeps, so the result is exact over paths of ≤ `rounds`
    * edges (for non-negative integer weights the full fixpoint needs
    * ≤ |V|−1 rounds; a bounded horizon is both the distributed-cost
    * contract and what a trust-tier consumer wants). Distances stay
    * LONG — integer weights add exactly, so cross-engine results are
    * not float-tolerance-dependent.
    *
    * Loop discipline as [[bfsHops]]/[[PageRank]]: weighted edges
    * partitioned by src + checkpointed once; per round ONE node-keyed
    * min-aggregate after the frontier join; dist eagerly
    * localCheckpoint'ed (constant-size plans). Unlike BFS, a node can
    * improve after it is first reached (a longer-hop lighter path), so
    * no settled anti-join — the min fold is the correctness. */
  def weightedDistances(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, seedCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      col(weightCol).cast("long").as("w"))
    val ed = graft.util.Caches.trackCheckpointed(
      e.repartition(col("src")).localCheckpoint(true))
    var dist = graft.util.Caches.trackCheckpointed(
      seeds.select(col(seedCol).cast("long").as("node")).distinct()
        .withColumn("dist", lit(0L)).localCheckpoint(true))
    for (_ <- 1 to rounds) {
      val relaxed = ed
        .join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = graft.util.Caches.trackCheckpointed(
        dist.unionByName(relaxed)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .localCheckpoint(true))
    }
    dist
  }
}
