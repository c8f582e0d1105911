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

  /** G3: FELLEGI–SUNTER record-linkage scoring (Fellegi & Sunter 1969,
    * JASA — the probabilistic-linkage standard): per comparison field,
    * estimate `m = P(agree | match)` and `u = P(agree | non-match)`
    * from the LABELED pairs with the +0.5/+1 adjusted shares (a field
    * that always/never agrees would put ln(0) into every score), turn
    * them into agreement/disagreement log-weights `ln(m/u)` /
    * `ln((1−m)/(1−u))`, and score EVERY pair — labeled or not — by the
    * summed field weights. The score is the log-likelihood ratio of
    * match vs non-match under field independence; `classified` applies
    * the caller's threshold.
    *
    * Determinism: m/u come from one exact-BIGINT aggregate over the
    * labeled pairs (broadcast back as a 1-row cross join); the per-pair
    * score is a FIXED left-associated sum of per-field ln trees —
    * column arithmetic, not an aggregation, so no ordering anywhere.
    * Agreement columns must be 0/1 ints; NULL labels mean "unlabeled,
    * score only". Output: the input pair columns + score (quantized-6)
    * + classified. 100 TB: the scored relation never shuffles — one
    * labeled-pair aggregate, broadcast, map. */
  def fellegiSunter(pairs: DataFrame, agreementCols: Seq[String],
      labelCol: String, threshold: Double): DataFrame = {
    require(agreementCols.nonEmpty, "need at least one comparison field")
    val y = col(labelCol)
    val aggs =
      Seq(coalesce(sum(when(y === 1, 1L)), lit(0L)).as("__nm"),
        coalesce(sum(when(y === 0, 1L)), lit(0L)).as("__nu")) ++
        agreementCols.flatMap { c =>
          Seq(coalesce(sum(when(y === 1 && col(c) === 1, 1L)), lit(0L))
            .as(s"__ma_$c"),
            coalesce(sum(when(y === 0 && col(c) === 1, 1L)), lit(0L))
              .as(s"__ua_$c"))
        }
    val est = pairs.agg(aggs.head, aggs.tail: _*)
    val scored = pairs.crossJoin(broadcast(est))
    val fieldScores = agreementCols.map { c =>
      val m = (col(s"__ma_$c").cast("double") + lit(0.5)) /
        (col("__nm").cast("double") + lit(1.0))
      val u = (col(s"__ua_$c").cast("double") + lit(0.5)) /
        (col("__nu").cast("double") + lit(1.0))
      when(col(c) === 1, log(m / u))
        .otherwise(log((lit(1.0) - m) / (lit(1.0) - u)))
    }
    val score = fieldScores.reduce(_ + _)
    scored
      .withColumn("score", graft.functions.q6(score))
      .withColumn("classified", (col("score") >= threshold).cast("int"))
      .select(pairs.columns.map(col) :+ col("score") :+
        col("classified"): _*)
  }

  /** G4: BLOCKING-QUALITY REPORT — the two numbers every candidate
    * generator (sorted neighborhood, LSH bands, IVF buckets) is judged
    * by (Christen 2012): REDUCTION RATIO `1 − |cand| / (n·(n−1)/2)`
    * (how much of the all-pairs space the blocker skipped) and PAIR
    * COMPLETENESS `|cand ∩ truth| / |truth|` (how many true matches
    * survived blocking). Exact integers; n(n−1)/2 in DECIMAL(38,0)
    * (n² overflows LONG past ~4.3e9 rows); pairs are normalized to
    * (least, greatest) before the intersection so orientation never
    * splits a match. Output: 1 row. */
  def blockingQuality(candidates: DataFrame, truth: DataFrame,
      aCol: String, bCol: String, nRecords: Long): DataFrame = {
    require(nRecords >= 2, s"need nRecords >= 2, got $nRecords")
    def norm(df: DataFrame) = df.select(
      least(col(aCol), col(bCol)).as("__a"),
      greatest(col(aCol), col(bCol)).as("__b")).distinct()
    val c = norm(candidates)
    val t = norm(truth)
    val hit = c.join(t, Seq("__a", "__b"), "inner")
      .agg(count(lit(1)).as("n_hit"))
    val nc = c.agg(count(lit(1)).as("n_candidates"))
    val nt = t.agg(count(lit(1)).as("n_truth"))
    val allPairs = lit(nRecords).cast("decimal(38,0)") *
      lit(nRecords - 1).cast("decimal(38,0)") / lit(2).cast("decimal(38,0)")
    nc.crossJoin(broadcast(nt)).crossJoin(broadcast(hit))
      .select(col("n_candidates"), col("n_truth"), col("n_hit"),
        allPairs.cast("decimal(38,0)").as("n_all_pairs"),
        graft.functions.q6(lit(1.0) -
          col("n_candidates").cast("double") / allPairs.cast("double"))
          .as("reduction_ratio"),
        graft.functions.q6(when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth").cast("double")))
          .as("pair_completeness"))
  }
}
