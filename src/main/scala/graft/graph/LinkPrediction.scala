package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X99: ADAMIC–ADAR link prediction (Adamic & Adar 2003, "Friends and
  * neighbors on the Web" — public knowledge): score non-adjacent node
  * pairs by their common neighbors, weighting each shared neighbor z by
  * `1/ln(deg(z))` — a neighbor shared through a small hub is far more
  * informative than one shared through a giant one. The standard
  * "suggest related documents / detect near-duplicate link contexts"
  * primitive over a link graph.
  *
  * Distributed shape: ONE wedge self-join keyed on the shared neighbor
  * z — cost Σ_z deg(z)², the inherent wedge count, never an all-pairs
  * product. Each adjacency row carries its neighbor's degree weight out
  * of the same aggregate that built it, so the score is a plain
  * map-side-combined `sum` over wedges. Existing edges are removed with
  * an anti-join BEFORE any scoring consumer sees them.
  *
  * Skew: a degree-D hub contributes D² wedges while its weight
  * `1/ln(D)` vanishes — the standard mitigation is to drop super-hubs
  * from the WEDGE CENTER role entirely (`maxDegree`); they still count
  * toward degrees and still suppress their own existing edges. At
  * 100 TB this is the difference between Σ deg² over a capped
  * distribution and one 10⁹-follower account exploding the join. */
object LinkPrediction {

  /** X115: NEGATIVE-EDGE SAMPLING — the labeled pair set a link-
    * prediction / graph-embedding trainer consumes (the graph analog
    * of word2vec's negative sampling, public knowledge): every
    * unordered edge as a positive (label 1), plus `perNode`
    * hash-proposed non-edges per node as negatives (label 0). The
    * proposal is ARITHMETIC (`(u·17 + s·23) mod nNodes`), never
    * `rand()` — epochs are re-runnable bit-for-bit and a SQL oracle
    * reproduces the draw; proposals that collide with a real edge or
    * self-loop are dropped by an anti-join (proposal sampling: a node
    * may yield fewer than `perNode` negatives — resample with a
    * larger `perNode` upstream if exact counts matter; documented).
    *
    * CONTRACT: node ids must live in the DENSE range 0..nNodes−1 —
    * the modular proposal draws `v` from exactly that space, so a
    * sparse or offset id space would emit "negatives" touching ids
    * that are not graph nodes at all. Remap ids first (the
    * [[graft.star.Star]] dense surrogate-id pass is the scale-safe
    * way) before sampling a non-contiguous graph.
    *
    * Shape: positives are the distinct unordered projection;
    * negatives are a ×perNode fan-out anti-joined against it on the
    * normalized pair key — node-keyed, no pair explosion. Output:
    * (src, dst, label). */
  def negativeSampledPairs(edges: DataFrame, srcCol: String,
      dstCol: String, nNodes: Long, perNode: Int = 2): DataFrame = {
    require(nNodes >= 2, s"nNodes must be >= 2, got $nNodes")
    require(perNode >= 1, s"perNode must be >= 1, got $perNode")
    val e = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val und = graft.util.Caches.persistTracked(
      e.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b")).distinct())
    val nodes = und.select(col("a").as("u"))
      .unionByName(und.select(col("b").as("u"))).distinct()
    val proposals = nodes
      .select(col("u"), explode(sequence(lit(1), lit(perNode))).as("s"))
      .withColumn("v", pmod(col("u") * 17L + col("s") * 23L,
        lit(nNodes)))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()
    val negatives = proposals.join(und, Seq("a", "b"), "left_anti")
    und.select(col("a").as("src"), col("b").as("dst"),
        lit(1).as("label"))
      .unionByName(negatives.select(col("a").as("src"),
        col("b").as("dst"), lit(0).as("label")))
  }

  /** Adamic–Adar scores for non-adjacent pairs sharing ≥ `minCommon`
    * neighbors in the UNDIRECTED view of `edges`. Output:
    * (node_a, node_b, common, score) with node_a < node_b.
    * `maxDegree`: neighbors with undirected degree above this cap do
    * not act as wedge centers (None = uncapped). Note deg(z) = 1 never
    * reaches a wedge anyway (z needs two distinct neighbors), so
    * `ln(deg)` is always positive where it is used. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Long = 1L, maxDegree: Option[Long] = None): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    // undirected distinct edge set, one row per unordered pair
    val und = graft.util.Caches.persistTracked(
      e.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct())
    // full adjacency (both orientations) + per-node degree
    val adj = und.select(col("a").as("z"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("z"), col("a").as("nbr")))
    val deg = adj.groupBy(col("z"))
      .agg(count(lit(1)).as("deg"))
    // deg = 1 cannot center a wedge (needs two distinct neighbors) and
    // its ln(1) = 0 weight would be a division by zero under ANSI —
    // drop it here, which changes nothing downstream
    val centers = maxDegree.fold(deg)(cap => deg.filter(col("deg") <= cap))
      .filter(col("deg") >= 2)
    // adjacency annotated with the wedge-center weight 1/ln(deg(z))
    val weighted = graft.util.Caches.persistTracked(
      adj.join(centers, "z")
        .select(col("z"), col("nbr"),
          (lit(1.0) / log(col("deg").cast("double"))).as("w")))
    val wedges = weighted.as("l")
      .join(weighted.as("r"), col("l.z") === col("r.z") &&
        col("l.nbr") < col("r.nbr"))
      .select(col("l.nbr").as("node_a"), col("r.nbr").as("node_b"),
        col("l.w").as("w"))
    wedges
      .groupBy(col("node_a"), col("node_b"))
      .agg(count(lit(1)).as("common"), sum(col("w")).as("score"))
      .filter(col("common") >= minCommon)
      // predicted links only: drop pairs that are already edges
      .join(und.withColumnRenamed("a", "node_a")
        .withColumnRenamed("b", "node_b"), Seq("node_a", "node_b"),
        "left_anti")
  }
}
