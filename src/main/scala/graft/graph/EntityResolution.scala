package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution over an id-mapping table (SURVEY.md §2.12 G1/G2).
  *
  * The reference walked the mapping graph with GraphX Pregel plus a
  * driver-side `collect` fallback and flagged its own approach as wrong
  * (reference: diamond/load/CustomerResolver.scala:11,59-65,77). Here the
  * semantics are connected components via iterative min-label propagation
  * with ADAPTIVE POINTER JUMPING expressed in DataFrames: shallow
  * id-mapping stars converge in 2-3 one-aggregate rounds; if convergence
  * has not arrived by round [[JumpAfter]] (a deep chain), jumping engages
  * and the remaining rounds are O(log diameter). `localCheckpoint`
  * truncates the plan lineage so the loop does not accumulate a growing
  * DAG. Nothing is ever collected to the driver.
  */
object EntityResolution {

  /** G1: connected components of the undirected (src, dst) edge set.
    * Returns (vertex, component) where component = the lexicographic
    * minimum vertex id in the component. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    connectedComponentsLoop(edges, srcCol, dstCol, maxIter)
  }

  /** The symmetrized, join-key-partitioned, checkpointed edge set the
    * propagation loop re-reads every iteration. Package-private so
    * PlanGuardSpec can assert the no-re-exchange property on the real
    * construction. */
  private[graft] def symmetrized(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    graft.util.Caches.trackCheckpointed(
      edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
        .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
        .distinct()
        .repartition(col("b"))
        .localCheckpoint(true))

  /** One propagation round over `sym` given current `labels` — the loop
    * body's plan, minus the observe/checkpoint bookkeeping.
    *
    * Always: the neighbourhood min `m(v)` (one aggregate — one exchange;
    * neither join side re-exchanges, see PlanGuardSpec). With
    * `jump = true`, POINTER JUMPING is fused on top —
    * `next(v) = min(m(v), label(m(v)))` — compressing label chains so the
    * remaining convergence is O(log diameter) rounds instead of
    * O(diameter): plain propagation walks the minimum one hop per round,
    * so a 1000-hop near-dup chain (real in boilerplate-heavy corpora
    * feeding [[graft.text.Dedup.nearDuplicateClusters]]) would need 1000
    * shuffle rounds, with jumping ~10. Labels are ids of in-component
    * vertices and only ever decrease, so the jump preserves both
    * invariants; at the stable fixpoint every label equals the component
    * minimum (same argument as plain propagation, plus idempotence
    * `label(label(v)) = label(v)`). The jump costs one extra exchange per
    * round (the O(V) aggregate output re-keyed for the lookup), so the
    * loop engages it ADAPTIVELY — shallow star graphs, the common
    * entity-resolution shape, converge in 2-3 plain rounds and never pay
    * for it (measured +20-70% per consumer when unconditional).
    *
    * Skew note: the jump join keys the aggregate output by its label
    * value, and late rounds concentrate a giant component's vertices on
    * one key. That is the canonical AQE skewed-join case — runtime
    * partition splitting handles it (AQE is on by default and in every
    * entry point here); with AQE off, expect stragglers on huge
    * components in jump rounds. Output: (v, component, __old). */
  private[graft] def propagationPlan(sym: DataFrame, labels: DataFrame,
      jump: Boolean = false): DataFrame = {
    val contrib = sym
      .join(labels.select(col("v").as("b"), col("component").as("nc")), "b")
      .select(col("a"), col("nc"), lit(false).as("self"))
      .unionByName(labels.select(col("v").as("a"), col("component").as("nc"),
        lit(true).as("self")))
    val m = contrib
      .groupBy(col("a"))
      .agg(min(col("nc")).as("component"),
        min(when(col("self"), col("nc"))).as("__old"))
      .select(col("a").as("v"), col("component"), col("__old"))
    if (!jump) m
    else
      // label(m(v)): every label value IS a vertex id, so the lookup is an
      // equi-join of the aggregate output against the label table (left +
      // coalesce only guards the theoretical miss — labels cover vertices)
      m.join(labels.select(col("v").as("component"),
          col("component").as("__jump")), Seq("component"), "left")
        .select(col("v"),
          least(col("component"), coalesce(col("__jump"), col("component")))
            .as("component"),
          col("__old"))
  }

  /** Plain rounds before pointer jumping engages: shallow graphs converge
    * inside this budget and never pay the jump join. */
  private val JumpAfter = 4

  private def connectedComponentsLoop(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int): DataFrame = {
    // sym is re-joined on `b` every iteration: partition it by the join key
    // BEFORE the checkpoint. localCheckpoint preserves outputPartitioning,
    // so the per-iteration join never re-exchanges the (static) edge side.
    val sym = symmetrized(edges, srcCol, dstCol)
    // Seed labels with the first propagation round for free: the vertex
    // set needs a groupBy(a) anyway (the old distinct), and aggregating
    // min(b) in that same shuffle yields each vertex's 1-hop neighbour
    // min — one fewer loop iteration for every graph.
    var labels = sym.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("component"))
      .select(col("a").as("v"), col("component"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // One shuffle join + one aggregation per iteration: each vertex's own
      // label enters the same groupBy as its neighbours' labels (tagged
      // `self`), so next = min(own, neighbour min) and the previous label
      // (min over the single self row) come out of ONE aggregate — no
      // second join back onto `labels`. The convergence probe rides the
      // checkpoint job as an observe() metric: the eager localCheckpoint
      // is the one action per iteration, and the changed-label count is
      // collected by that same job — no separate count() pass.
      val obs = org.apache.spark.sql.Observation(s"cc_changed_$i")
      val next = propagationPlan(sym, labels, jump = i >= JumpAfter)
        // count(when) never returns NULL, even over an empty vertex set
        .observe(obs, count(when(col("component") =!= col("__old"), 1))
          .as("changed"))
        .localCheckpoint(true)
      // `next` is materialized (eager checkpoint), so the PREVIOUS round's
      // label blocks are unreachable — drop them now instead of pinning
      // O(iterations) copies of the vertex set until session end
      graft.util.Caches.checkpointRdds(labels).foreach(_.unpersist(false))
      labels = next.drop("__old")
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      i += 1
    }
    // Silently returning unconverged labels would split true components
    // into several — fail loudly instead.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations; " +
          "with pointer jumping that needs a component of diameter " +
          "~2^maxIter — raise maxIter")
    // the surviving blocks (edge set + final labels) are the caller's to
    // release once results are materialized
    graft.util.Caches.trackCheckpointed(labels)
  }

  /** G2 `mapEntities`: resolve every id of `fromType` to an id of `toType`
    * in the same component, honouring a confidence threshold on the edges.
    * Vertices are `<idType>:<id>` strings; when a component holds several
    * target ids the lexicographic minimum wins (deterministic). */
  def resolve(mapping: DataFrame, srcCol: String, dstCol: String,
      confidenceCol: String, minConfidence: Double,
      fromType: String, toType: String): DataFrame = {
    val cc = connectedComponents(
      mapping.filter(col(confidenceCol) >= minConfidence), srcCol, dstCol)
    val from = cc.filter(col("v").startsWith(s"$fromType:"))
      .select(col("v").as("from_id"), col("component"))
    val to = cc.filter(col("v").startsWith(s"$toType:"))
      .groupBy(col("component")).agg(min(col("v")).as("to_id"))
    from.join(to, Seq("component"), "left")
      .select(col("from_id"), col("to_id"))
  }
}
