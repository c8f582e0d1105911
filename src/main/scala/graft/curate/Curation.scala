package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators (north-star scope; no counterpart in
  * the reference): deterministic stratified sampling for class balancing
  * and token-budget sequence packing for context-window construction.
  *
  * Both are single-pass column/window expressions — no driver state, no
  * RNG: sampling decisions and pack boundaries are pure functions of the
  * row, so reruns are idempotent, results are engine-reproducible (DuckDB
  * oracle), and adding data never reshuffles previous decisions.
  */
object Curation {

  /** Uniform-in-[0,1) per row: first 8 md5 hex digits of (seed, id) over
    * 2^32. Deterministic, uniform, and independent across seeds. */
  def uniformHash(idCol: Column, seed: String): Column =
    conv(substring(md5(concat_ws(":", lit(seed), idCol.cast("string"))), 1, 8),
      16, 10).cast("double") / lit(4294967296.0)

  /** X43: DSIR importance weighting — Data Selection via Importance
    * Resampling (Xie et al. 2023, public knowledge): score every raw doc
    * by how target-like its HASHED n-gram feature distribution is,
    * `imp(x) = Σ_f [ln p_target(bucket(f)) − ln p_raw(bucket(f))]` over
    * the doc's unigram + bigram features hashed into `buckets` bins
    * (add-alpha smoothed bucket distributions). Positive = looks more
    * like the target corpus than like the raw pool; select by threshold
    * or top-fraction downstream.
    *
    * 100 TB shape: the two bucket-distribution tables have exactly
    * `buckets` rows — a CONSTANT (2^10..2^17), independent of corpus
    * size — so broadcasting them is the scale-correct plan (unlike the
    * X42 LM whose tables grow with the corpus and must be key-joined).
    * Everything else is one explode + one per-doc aggregate; the
    * bucket hash is the engine-neutral md5-hex arithmetic every other
    * deterministic operator shares. Output: (doc_id, n_feats,
    * importance, keep = importance > 0); docs with no features (empty
    * text) keep their row with NULL importance and keep = false. */
  def dsirImportance(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, buckets: Int = 1024,
      alpha: Double = 0.5): DataFrame = {
    require(buckets > 0 && alpha > 0, "buckets and alpha must be positive")
    def feats(df: DataFrame, text: String, cols: Column*): DataFrame =
      df.select(cols :+ explode(concat(
        graft.text.Dedup.words(col(text)),
        graft.text.Dedup.shingles(col(text), 2))).as("__f"): _*)
    def bucket(c: Column): Column =
      pmod(conv(substring(md5(c), 1, 8), 16, 10).cast("long"),
        lit(buckets.toLong))
    def dist(f: DataFrame): DataFrame = f
      .select(bucket(col("__f")).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    val tDist = dist(feats(target, targetTextCol))
    val rDist = dist(feats(corpus, textCol))
    val tTot = tDist.agg(sum(col("__c")).as("__nt"))
    val rTot = rDist.agg(sum(col("__c")).as("__nr"))
    val scored = feats(corpus, textCol, col(idCol).as("doc_id"))
      .withColumn("__b", bucket(col("__f")))
      .join(broadcast(tDist.withColumnRenamed("__c", "__tc")), Seq("__b"), "left")
      .join(broadcast(rDist.withColumnRenamed("__c", "__rc")), Seq("__b"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .withColumn("__w",
        log((coalesce(col("__tc"), lit(0L)) + alpha) /
          (col("__nt") + buckets * alpha)) -
        log((coalesce(col("__rc"), lit(0L)) + alpha) /
          (col("__nr") + buckets * alpha)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("__w")), 3).as("importance"))
    corpus.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("importance"),
        coalesce(col("importance") > 0, lit(false)).as("keep"))
  }

  /** X109: LARGEST-REMAINDER (Hamilton) apportionment — turn a fixed
    * sample budget into EXACT integer per-domain counts that sum to the
    * budget. The gap X12/X46 leave open: hash-threshold sampling
    * realizes a fraction in expectation (budget drift ±√n), while a
    * training-data order for "exactly N docs, proportionally by
    * domain" needs the apportionment to be exact, deterministic and
    * fair (each domain gets ⌊quota⌋, the leftover goes to the largest
    * fractional remainders — the standard seat-allocation method,
    * public knowledge; ties break by domain name, never float order).
    *
    * Scale: domains are FEW by construction — everything after the
    * one corpus-sized count aggregate runs on a domains-sized table
    * (the remainder-rank window is a single partition OF THAT TABLE,
    * documented constant-size). Quota arithmetic is one multiply one
    * divide on exact integers — bit-identical cross-engine, so ⌊·⌋
    * and the remainder ranking agree. Output: (domain, n_docs, quota,
    * base, extra, alloc) with Σ alloc = budget exactly. */
  def apportion(df: DataFrame, domainCol: String, budget: Long)
      : DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val dom = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = dom.agg(sum(col("n_docs")).as("__t"))
    val q = graft.util.Caches.persistTracked(
      dom.crossJoin(broadcast(tot))
        .withColumn("quota",
          lit(budget.toDouble) * col("n_docs") / col("__t"))
        .withColumn("base", floor(col("quota")).cast("long"))
        .withColumn("__rem", col("quota") - col("base")))
    val sb = q.agg(sum(col("base")).as("__sb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col("domain"))
    q.withColumn("__rrank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(sb))
      .withColumn("extra",
        when(col("__rrank") <= lit(budget) - col("__sb"), 1L)
          .otherwise(0L))
      .select(col("domain"), col("n_docs"),
        graft.functions.q6(col("quota")).as("quota"),
        col("base"), col("extra"),
        (col("base") + col("extra")).as("alloc"))
  }

  /** X46: temperature-scaled domain mixing (the GLaM/Gopher mixture rule,
    * public knowledge): per-domain token shares `s_d` are flattened to
    * `w_d ∝ s_d^α` (α ∈ (0,1]; α = 1 is the natural mix, α → 0
    * approaches uniform), and each document receives `n_copies` =
    * ⌊f_d⌋ + Bernoulli(frac(f_d)) where `f_d = w_d / s_d` is the
    * domain's epoch factor — the deterministic-hash realization of
    * "domain d is seen f_d times per epoch of the mixture". The
    * Bernoulli draw is the (seed, id) md5 hash every sampling operator
    * here shares, so reruns are idempotent and engine-reproducible;
    * upsampled tails replicate (n_copies ≥ 1 possible per doc),
    * downsampled heads thin (n_copies ∈ {0, 1}).
    *
    * 100 TB shape: the mixture table has one row per DOMAIN — a
    * constant — so both reductions (domain token totals, weight
    * normalizer) are map-side-combined aggregates over tiny results, and
    * the factor joins back onto the corpus as a broadcast. The corpus is
    * scanned once; no shuffle touches corpus-sized data. Output:
    * (doc_id, <domainCol>, n_tokens, mix_factor, n_copies); NULL text
    * counts 0 tokens but still receives its domain's factor. */
  def temperatureMixture(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, alpha: Double, seed: String = "mix"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val toks = df.select(col(idCol).as("doc_id"), col(domainCol),
      coalesce(size(graft.text.Dedup.words(col(textCol))), lit(0))
        .cast("long").as("n_tokens"))
    val dom = toks.groupBy(col(domainCol))
      .agg(sum(col("n_tokens")).as("__toks"))
    val tot = dom.agg(sum(col("__toks")).as("__t"))
    val wts = dom.crossJoin(broadcast(tot))
      // pow(0, α) = 0 without touching the share ratio, whose t = 0
      // denominator would throw on an all-empty corpus
      .withColumn("__raw",
        when(col("__toks") > 0, pow(col("__toks") / col("__t"), lit(alpha)))
          .otherwise(lit(0.0)))
    val norm = wts.agg(sum(col("__raw")).as("__w"))
    // a domain whose docs carry zero tokens has zero share — it gets
    // factor 0 (no epochs of nothing) rather than the 0/0 the ratio
    // would hit (ANSI division would throw on the zero denominator)
    val fac = wts.crossJoin(broadcast(norm))
      .withColumn("__f",
        when(col("__toks") > 0,
          (col("__raw") / col("__w")) / (col("__toks") / col("__t")))
          .otherwise(lit(0.0)))
      .select(col(domainCol), col("__f"))
    toks.join(broadcast(fac), Seq(domainCol))
      .select(col("doc_id"), col(domainCol), col("n_tokens"),
        graft.functions.q6(col("__f")).as("mix_factor"),
        (floor(col("__f")) +
          when(uniformHash(col("doc_id"), seed) <
            col("__f") - floor(col("__f")), 1L).otherwise(0L))
          .cast("long").as("n_copies"))
  }

  /** X12: deterministic stratified sampling — keep a row of stratum `s`
    * when its [0,1) hash falls under `fractions(s)` (strata absent from
    * the map are dropped). The classic class-balancing primitive for
    * training mixes, as a pure filter: one scan, no shuffle, reproducible
    * row-for-row from (seed, id) alone — unlike `sampleBy`, whose RNG is
    * partition-layout-dependent and not mirrorable across engines. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], seed: String): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(uniformHash(col(idCol), seed) < frac)
  }

  /** Deterministic fixed-k carve per stratum (the eval-set / inspection
    * sampler X12's rate-based form cannot express): EXACTLY
    * `min(k, |stratum|)` rows per stratum, chosen by md5-hash rank with
    * id tie-break — rerun-stable, engine-reproducible, and stable under
    * corpus growth in the hash-prefix sense (a kept doc is only ever
    * displaced by a new doc hashing ahead of it, never by reordering).
    *
    * Scale shape: one exchange on the stratum key for the rank window.
    * For a pathologically large stratum, pre-thin with
    * [[stratifiedSample]] at rate ~2k/n first — the hash ORDER is shared
    * by both operators, so pre-thinning at any rate that keeps ≥ k rows
    * leaves the final carve IDENTICAL (same hash prefix wins). */
  def carveTopK(df: DataFrame, idCol: String, strataCol: String, k: Int,
      seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(uniformHash(col(idCol), seed), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** X87: PRIORITY SAMPLING — weight-proportional k-sample without
    * replacement (Duffield, Lund & Thorup 2007, public knowledge): each
    * row draws priority `q = w / u` with `u` uniform in (0,1], and the
    * k highest-priority rows form the sample. Heavier rows (longer
    * docs, higher quality scores) are proportionally likelier to be
    * kept, but every row has a chance — the estimator behind
    * weight-aware corpus subsampling.
    *
    * Engine-exact by construction: `u = (x+1)/2^32` with `x` the first
    * 8 md5 hex digits of (seed, id), so
    * `q = w·2^32 / (x+1)` is ONE IEEE division of two exactly
    * representable integers (w·2^32 stays < 2^53 for any weight
    * < 2^21) — correctly rounded, hence BIT-IDENTICAL in any IEEE-754
    * engine; the oracle needs no float tolerance and the k-th/k+1-th
    * boundary can never flip between engines. The +1 shifts `u` off 0
    * (no infinite priority) at a 2^-32 distribution cost.
    *
    * Scale shape: priorities are a pure projection and the top-k is
    * `orderBy(q desc).limit(k)` — TakeOrdered, which prunes every
    * partition to its local k before the single-reducer merge; the
    * rank window then runs over only k rows.
    * Returns the sampled rows with `priority` and `sample_rank`. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val x = conv(substring(md5(concat_ws(":", lit(seed),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("double")
    val q = (col(weightCol).cast("double") * lit(4294967296.0)) /
      (x + lit(1.0))
    // BOUNDED global window: ranks run AFTER limit(k) — a k-row
    // relation by construction (PlanGuardSpec census).
    val w = Window.orderBy(col("priority").desc, col(idCol))
    df.withColumn("priority", q)
      .orderBy(col("priority").desc, col(idCol)).limit(k)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
  }

  /** X123: GROUPED PRIORITY SAMPLE — [[prioritySample]]'s
    * weight-proportional without-replacement draw, k PER GROUP (the
    * per-domain / per-language cap a mixture materialization applies:
    * "keep up to 10k docs per domain, longest-favored"): the identical
    * engine-exact priority `q = w·2^32/(x+1)` ranked inside a
    * GROUP-KEYED window — no global sort, no TakeOrdered bottleneck;
    * every group's sample is independent and deterministic in
    * (seed, id).
    *
    * Returns the sampled rows with `priority` and `sample_rank`
    * (1..≤k within each group). */
  def groupedPrioritySample(df: DataFrame, groupCol: String,
      idCol: String, weightCol: String, k: Int,
      seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val x = conv(substring(md5(concat_ws(":", lit(seed),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("double")
    val q = (col(weightCol).cast("double") * lit(4294967296.0)) /
      (x + lit(1.0))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority").desc, col(idCol))
    df.withColumn("priority", q)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** X119: EXACT-PROPORTION STRATIFIED SPLIT — train/val/test with
    * the split sizes exact PER STRATUM (source, language, label),
    * not Bernoulli-approximate: hash-splitting (the X94 shape) gives
    * each stratum binomial jitter, which at small strata mis-sizes
    * the very eval sets stratification exists to protect. Each
    * stratum's rows are ordered by (seeded md5 uniform, id) — a
    * deterministic shuffle, re-runnable bit-for-bit — and cut at
    * integer rank boundaries `⌊cumweight·n / W⌋`, so sizes are the
    * exact floor apportionment of the requested weights and every
    * row's split is a pure function of (id, seed).
    *
    * Scale: one stratum-keyed rank window (never global). Output:
    * input row → (id, stratum, split). */
  def exactStratifiedSplit(df: DataFrame, idCol: String,
      stratumCol: String,
      splits: Seq[(String, Int)] =
        Seq(("train", 8), ("val", 1), ("test", 1)),
      seed: String = "split"): DataFrame = {
    require(splits.nonEmpty, "exactStratifiedSplit: no splits")
    splits.foreach { case (name, wgt) =>
      require(wgt >= 1, s"split '$name': weight must be >= 1, got $wgt")
    }
    val total = splits.map(_._2.toLong).sum
    val cum = splits.map(_._2.toLong).scanLeft(0L)(_ + _).drop(1)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(idCol))
    val wn = Window.partitionBy(col(stratumCol))
    val ranked = df
      .select(col(idCol), col(stratumCol))
      .withColumn("__h", uniformHash(col(idCol), seed))
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn).cast("long"))
    // split of rank r: the first k with r <= floor(cum_k * n / W) —
    // exact floor apportionment, last boundary = n always
    val assigned = splits.map(_._1).zip(cum).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, (name, cw)) =>
        when(col("__r") * lit(total) <= lit(cw) * col("__n"), name)
          .otherwise(acc)
      }
    ranked.select(col(idCol), col(stratumCol).as("stratum"),
      assigned.as("split"))
  }

  /** X167: GROUPED k-FOLD with SNAKE-RANK BALANCING — cross-validation
    * folds where a GROUP (user, domain, document cluster) never
    * straddles folds (the grouped sibling of [[leakageSafeSplit]] and
    * of F72's purged time-series folds: per-row folds leak through
    * correlated rows of the same group), and fold SIZES stay balanced
    * even under skewed group sizes, which plain hash-folding cannot
    * promise: rank groups by (size desc, group), then deal them out
    * boustrophedon (1..k, k..1, 1..k, …) so every consecutive 2k-block
    * of the size ranking contributes exactly 2 groups — one large-ish,
    * one small-ish — to each fold. The greedy argmin-load dealer is
    * marginally tighter but inherently SEQUENTIAL over groups; the
    * snake is a pure function of the rank — fully parallel, and a
    * deterministic relation a re-run reproduces bit-for-bit.
    *
    * Scale shape: one hash aggregate (group sizes), one two-phase
    * global rank ([[graft.relational.Ranks.globalRank]] — no
    * global-order window), one fold projection. All-integer output:
    * (group, n_rows, size_rank, fold). */
  def groupedKFold(df: DataFrame, groupCol: String, k: Int = 5)
      : DataFrame = {
    require(k >= 2, s"groupedKFold: k must be >= 2, got $k")
    val sizes = df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n_rows"))
    val ranked = graft.relational.Ranks.globalRank(sizes,
      Seq(col("n_rows").desc, col("group")), "size_rank")
    val r0 = pmod(col("size_rank") - 1, lit(2L * k))
    ranked.select(col("group"), col("n_rows"), col("size_rank"),
      when(r0 < k, r0).otherwise(lit(2L * k - 1) - r0).as("fold"))
  }

  /** X94: LEAKAGE-SAFE train/test SPLIT — the dedup-aware split that
    * hash-splitting by document id cannot give: near-duplicate
    * documents must land on the SAME side, or the test set leaks into
    * training through paraphrase-level copies (the classic eval
    * contamination the Lee et al. 2021 line of work measures). Groups
    * are the X17 MinHash+LSH near-dup clusters (singletons group as
    * themselves); the split decision hashes the GROUP id, so every
    * member inherits one verdict.
    *
    * Scale shape: prices one X2/X17 clustering pass (banded LSH, never
    * O(n²)) plus one left join of the corpus against the cluster table
    * and a pure hash projection — rerun-stable, engine-reproducible,
    * and growing the corpus never flips an existing group's side
    * (the [[stratifiedSample]] determinism contract, at group level).
    * Output: (id, group_id, split). */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
      testFraction: Double, seed: String, shingleN: Int = 3,
      k: Int = 16, bands: Int = 4, minMatch: Int = 8): DataFrame = {
    require(testFraction >= 0 && testFraction <= 1,
      s"testFraction must be in [0, 1], got $testFraction")
    val clusters = graft.text.Dedup.nearDuplicateClusters(df, idCol,
        textCol, shingleN, k, bands, minMatch)
      .select(col("doc_id").as("__cd"), col("cluster_id"))
    df.select(col(idCol))
      .join(clusters, col(idCol) === col("__cd"), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("split",
        when(uniformHash(col("group_id"), seed) < testFraction,
          lit("test")).otherwise(lit("train")))
      .select(col(idCol), col("group_id"), col("split"))
  }

  /** X34: the COMPOSED curation pipeline — normalize → quality-rule
    * verdict → exact dedup (canonical = min id over the NORMALIZED text,
    * so documents differing only in markup/whitespace dedup together —
    * the reason normalization runs first) → deterministic hash sampling,
    * producing ONE verdict row per input document with every stage's
    * flag (`keep_quality`, `is_canonical`, `sampled`) plus the composite
    * `keep`. Per-stage flags are what let a curation run REPORT loss by
    * stage instead of just shrinking.
    *
    * Plan shape (the [[graft.text.Dedup.dedupPipeline]] contract): the
    * normalized + quality projection is computed ONCE and persisted —
    * the dedup aggregate and the final join-back both read the cached
    * projection, so the corpus is scanned a single time. The only
    * shuffle is the dedup hash-groupBy; quality and sampling are pure
    * column expressions. Null-safe on the text hash (md5(NULL) is NULL;
    * a plain equi-join would drop null-text docs from the output). */
  def curationPipeline(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      sampleFraction: Double = 1.0, seed: String = "curate"): DataFrame = {
    require(sampleFraction >= 0 && sampleFraction <= 1,
      "sampleFraction must be in [0, 1]")
    import graft.text.TextStats
    val base = graft.util.Caches.persistTracked(
      TextStats.qualityRuleVerdict(
          TextStats.normalizeText(df, textCol), idCol, "norm_text",
          minWords, maxWords)
        .select(col(idCol), md5(col("norm_text")).as("__th"),
          col("n_words"), col("keep").as("keep_quality")))
    val canon = base.groupBy(col("__th").as("__gth"))
      .agg(min(col(idCol)).as("canonical_id"))
    base.join(canon, col("__th") <=> col("__gth"))
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
      .withColumn("sampled",
        uniformHash(col(idCol), seed) < lit(sampleFraction))
      .select(col(idCol), col("n_words"), col("keep_quality"),
        col("canonical_id"), col("is_canonical"), col("sampled"),
        (col("keep_quality") && col("is_canonical") && col("sampled"))
          .as("keep"))
  }

  /** X13: sequence packing — lay documents out in (`shardCol`,
    * `orderCol`) order as one token stream per shard and cut context
    * windows of `tokenBudget` tokens; a document belongs to the pack
    * where its FIRST token lands (`pack_id`), with `pack_offset` giving
    * its start position inside the pack. This is the
    * concatenate-then-chunk packing LLM pretraining uses (documents may
    * straddle a boundary; the consumer decides whether to split or drop
    * the tail).
    *
    * The running sum is a window per SHARD: shards pack independently, so
    * the operator scales by adding shards — a global ordering would be a
    * single-partition bottleneck at 100 TB. Pack ids are therefore only
    * unique per shard; (shard, pack_id) is the global key. */
  def packSequences(df: DataFrame, tokenCountCol: String, shardCol: String,
      orderCol: String, tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCountCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCountCol)) / tokenBudget).cast("long"))
      .withColumn("pack_offset",
        (col("__cum") - col(tokenCountCol)) % tokenBudget)
      .drop("__cum")
  }

  /** X77: cross-document fixed-context packing MANIFEST — the GPT-style
    * "concatenate everything, split every `contextTokens`" pretraining
    * layout (docs cross sequence boundaries; `sepTokens` EOS slots sit
    * between docs), as the manifest that maps each training sequence to
    * the doc slices composing it: one row per (doc, sequence) overlap —
    * `(seq_id, doc_id, doc_start_tok, seq_start_pos, n_toks)`. X13
    * packs whole docs into per-shard budgets; THIS is the
    * boundary-crossing global layout an autoregressive trainer actually
    * consumes.
    *
    * The global token offset of each doc is a TWO-PHASE PREFIX SUM, not
    * a global-order window (`Window.orderBy` with no partition moves
    * the corpus to ONE partition — the classic scale-killer):
    * `repartitionByRange(doc_id)` gives range-ordered partitions,
    * within-partition cumsums run in parallel, and only the
    * per-partition TOTALS (rows = partitions, not docs) are collected,
    * prefix-summed on the driver, and broadcast-joined back. Offsets
    * are partition-boundary-invariant (each doc's offset is the sum
    * over all smaller doc_ids however they are split), so the manifest
    * is deterministic under any partitioning (spec-proven). The seq
    * explode is bounded: ≤ n/contextTokens + 1 rows per doc. */
  def contextManifest(df: DataFrame, idCol: String, tokenCountCol: String,
      contextTokens: Long, sepTokens: Long = 1L): DataFrame = {
    require(contextTokens >= 1,
      s"contextTokens must be >= 1, got $contextTokens")
    require(sepTokens >= 0, s"sepTokens must be >= 0, got $sepTokens")
    val spark = df.sparkSession
    import spark.implicits._
    val byPart = df
      .select(col(idCol).cast("long").as("doc_id"),
        col(tokenCountCol).cast("long").as("__n"))
      .repartitionByRange(col("doc_id"))
      .withColumn("__pid", spark_partition_id())
    val inPart = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graft.util.Caches.persistTracked(
      byPart.withColumn("__cum", sum(col("__n") + sepTokens).over(inPart)))
    // partition totals: rows = #partitions — driver prefix sum is bounded
    val totals = cum.groupBy(col("__pid"))
      .agg(max(col("__cum")).as("__t"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val prefix = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _)).toMap
    val prefixDf = prefix.toSeq.toDF("__pid", "__prefix")
    val L = contextTokens
    cum.join(broadcast(prefixDf), "__pid")
      .withColumn("__off", col("__prefix") + col("__cum")
        - col("__n") - sepTokens)
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__n"), col("__off"),
        explode(sequence(expr(s"__off DIV $L"),
          expr(s"(__off + __n - 1) DIV $L"))).as("seq_id"))
      .select(col("seq_id"),
        col("doc_id"),
        (greatest(col("__off"), col("seq_id") * L) - col("__off"))
          .as("doc_start_tok"),
        (greatest(col("__off"), col("seq_id") * L) - col("seq_id") * L)
          .as("seq_start_pos"),
        (least(col("__off") + col("__n"), (col("seq_id") + 1) * L)
          - greatest(col("__off"), col("seq_id") * L)).as("n_toks"))
  }

  /** X81: per-domain QUALITY-QUANTILE pruning — keep the top
    * `keepNum/keepDen` fraction of each domain by quality score (the
    * FineWeb-edu-style per-source cut: a global threshold would empty
    * low-scoring domains entirely; per-domain ranking keeps the mixture
    * while dropping each source's worst). EXACT rank arithmetic: row k
    * of an n-row domain survives iff `(k − 1) · keepDen < n · keepNum`
    * (⇔ k ≤ ceil(n·frac) without ever touching a float — a double
    * `ceil(0.2 · n)` can land either side of an integer depending on
    * the engine's literal type, so the fraction is a RATIONAL by
    * contract). Ranking is (score desc, id asc): deterministic,
    * engine-reproducible. ONE domain-keyed exchange. Output: one row
    * per doc — (doc_id, domain, score, rank, n_domain, keep). */
  def qualityPrune(df: DataFrame, idCol: String, domainCol: String,
      scoreCol: String, keepNum: Int, keepDen: Int): DataFrame = {
    require(keepDen >= 1 && keepNum >= 0 && keepNum <= keepDen,
      s"need 0 <= keepNum <= keepDen, got $keepNum/$keepDen")
    val byDomain = Window.partitionBy(col("domain"))
    val ranked = df.select(col(idCol).cast("long").as("doc_id"),
        col(domainCol).as("domain"), col(scoreCol).as("score"))
      .withColumn("rank", row_number().over(
        byDomain.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .withColumn("n_domain", count(lit(1)).over(byDomain).cast("long"))
    ranked.withColumn("keep",
      (col("rank") - 1) * keepDen < col("n_domain") * keepNum)
  }

  /** X56: deterministic sharded export — the trainer-facing
    * materialization step at the end of a curation pipeline: every doc
    * lands in shard `md5int(seed, id) mod nShards` (the engine-neutral
    * hex arithmetic [[uniformHash]] uses, so ANY engine — or a later
    * rerun over a grown corpus — reproduces the same placement; docs
    * never migrate between runs, which is what makes incremental
    * re-export and per-shard caching sound). Balance is hash-uniform,
    * ~Poisson per shard.
    *
    * One shuffle-free projection + a `partitionBy` write (each task
    * writes its rows' shard directories directly). The returned
    * manifest is computed by READING BACK the written files — (shard,
    * n_docs, n_tokens, texts_md5 content digest) — so a green manifest
    * proves the round trip, not just the intent. */
  def shardedExport(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, outDir: String, seed: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val spark = df.sparkSession
    df.select(col(idCol), col(textCol))
      .withColumn("shard",
        conv(substring(md5(concat_ws(":", lit(seed),
          col(idCol).cast("string"))), 1, 8), 16, 10)
          .cast("long") % nShards)
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.text.Dedup.words(col(textCol))).cast("long"))
          .as("n_tokens"),
        md5(concat_ws("", array_sort(collect_list(md5(col(textCol))))))
          .as("texts_md5"))
  }

  /** X62: data-constrained token-budget allocation (the Muennighoff et
    * al. 2022 "Scaling Data-Constrained Language Models" regime, public
    * knowledge): split `budgetTokens` training tokens across domains in
    * proportion to temperature-α mixture weights, but cap every domain
    * at `maxEpochs` passes over its available tokens and re-distribute
    * the freed budget over the uncapped domains — exact water-filling,
    * computed in CLOSED FORM with window functions (no driver loop, no
    * iteration):
    *
    * sort domains by cap-to-weight ratio `r_i = c_i/w_i` ascending; a
    * domain is capped iff its own cap binds under the λ that prefix
    * implies, `r_i ≤ (B − Σ_{j≤i} c_j) / Σ_{j>i} w_j`; then
    * `λ* = (B − Σ_capped c) / Σ_uncapped w` and the allocation is
    * `min(c_i, λ*·w_i)` — `Σ alloc = B` by construction (the spec
    * asserts it).
    *
    * Scale shape: the only corpus-sized work is the domain token count
    * (one map-side-combined aggregate); everything after runs on the
    * |domains|-row table, and the windows are driver-scale by nature.
    * Domains with zero tokens are excluded from the plan (zero weight,
    * zero capacity — nothing to allocate).
    *
    * Output per domain: tokens_available, weight, capacity
    * (= maxEpochs·tokens), allocated_tokens, epochs (= alloc/tokens),
    * capped. */
  def epochPlan(df: DataFrame, textCol: String, domainCol: String,
      budgetTokens: Long, maxEpochs: Double, alpha: Double): DataFrame =
    epochPlanFromSizes(
      df.select(col(domainCol).as("domain"),
          coalesce(size(graft.text.Dedup.words(col(textCol))), lit(0))
            .cast("long").as("__nt"))
        .groupBy(col("domain"))
        .agg(sum(col("__nt")).as("tokens_available")),
      budgetTokens, maxEpochs, alpha)

  /** [[epochPlan]] over a PRE-AGGREGATED `(domain, tokens_available)`
    * size table — the tokenize-once entry point: an X62→X70→X56
    * pipeline that calls the textCol overloads tokenizes the corpus
    * THREE times (budget total, plan sizes, per-doc copy counts); at
    * 100 TB the tokenize pass IS the cost, so the pipeline should
    * tokenize into one cached `(id, domain, n_toks)` relation and
    * derive the size table, the budget scalar and the
    * [[materializeCounted]] input from it (q_x70/q_x72 do exactly
    * this). Zero-token domains are dropped here, so callers may pass
    * raw aggregates. */
  def epochPlanFromSizes(domainSizes: DataFrame, budgetTokens: Long,
      maxEpochs: Double, alpha: Double,
      driverMaxDomains: Int = 1000000): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    // CACHED: every interior job below re-executes this relation's
    // lineage otherwise — in the tokenize-once pipelines that lineage
    // is the full corpus aggregate (wave-34 bisect, r13)
    val dom = graft.util.Caches.persistTracked(domainSizes
      .select(col("domain"), col("tokens_available").cast("long")
        .as("tokens_available"))
      .filter(col("tokens_available") > 0))
    // DRIVER FAST PATH — the wave-34 finding: the distributed interior
    // costs ~2 s of FIXED multi-job latency (two broadcast aggregates,
    // the range-sampling pass, the prefix cache fill, the totals
    // collect, the λ aggregate) regardless of domain count — 10× the
    // whole r11 global-sort interior on a 3-row table. The plan table
    // is broadcast into [[materializeCounted]] downstream, so k is
    // REQUIRED to be driver-sized anyway: below `driverMaxDomains` the
    // water-filling runs as plain Scala over the collected size table
    // (same IEEE expression trees literally — the q_x62/x70/x72
    // oracles and the equality spec pin driver ≡ distributed), and the
    // two-phase no-global-sort form remains the fallback above it.
    val k = dom.count()
    if (k <= driverMaxDomains)
      return epochPlanOnDriver(dom, budgetTokens, maxEpochs, alpha)
    val tot = dom.agg(
      sum(col("tokens_available")).cast("double").as("__t"))
    val wtd = dom.crossJoin(broadcast(tot))
      .withColumn("__wraw", pow(col("tokens_available") / col("__t"),
        lit(alpha)))
    val wnorm = wtd.agg(sum(col("__wraw")).as("__wsum"),
      sum(col("tokens_available")).cast("double").as("__cap_sum"))
    // B: the budget actually placeable — everything if capacity allows
    val staged = wtd.crossJoin(broadcast(wnorm))
      .withColumn("w", col("__wraw") / col("__wsum"))
      .withColumn("capacity", col("tokens_available") * maxEpochs)
      .withColumn("__b",
        least(lit(budgetTokens.toDouble), col("__cap_sum") * maxEpochs))
      .withColumn("__r", col("capacity") / col("w"))
    // Two-phase exact cumulatives over the (__r, domain) order — a web
    // corpus has millions of registrable domains, so the former
    // partition-less window here was the repo's last unbounded global
    // sort. Both running sums are carried as LONGs (exact, associative,
    // partition-boundary-immune, engine-identical): Σcapacity is
    // recovered as maxEpochs · Σtokens (one multiply over the exact
    // token prefix), and the weight prefix rides a floor(w·1e15 + 0.5)
    // integer proxy (w sums to 1, so the proxy total is ~1e15 — no
    // overflow at any domain count; resolution 1e-15 ≈ double ulp at 1).
    // The oracle mirrors the proxy literally.
    val quant = staged.withColumn("__wq",
      floor(col("w") * lit(1e15) + lit(0.5)).cast("long"))
    val (ranked, totals) = graft.relational.Ranks.prefixSumsWithTotals(
      quant, Seq(col("__r"), col("domain")),
      Seq("__cum_t" -> col("tokens_available"), "__cum_wq" -> col("__wq")))
    val totWq = totals(1)
    val flagged = ranked
      .withColumn("__cum_c", col("__cum_t").cast("double") * maxEpochs)
      .withColumn("__sfx_w",
        (lit(totWq) - col("__cum_wq")).cast("double") / lit(1e15))
      .withColumn("capped",
        when(col("__sfx_w") > 1e-12,
          col("__r") <= (col("__b") - col("__cum_c")) / col("__sfx_w"))
          .otherwise(col("__b") >= col("__cum_c") - 1e-6))
    val lam = flagged.agg(
      sum(when(col("capped"), col("capacity")).otherwise(0.0)).as("__cc"),
      sum(when(col("capped"), lit(0.0)).otherwise(col("w"))).as("__uw"))
    flagged.crossJoin(broadcast(lam))
      .withColumn("__lam",
        when(col("__uw") > 1e-12,
          (col("__b") - col("__cc")) / col("__uw")).otherwise(lit(0.0)))
      .select(col("domain"), col("tokens_available"),
        graft.functions.q6(col("w")).as("weight"),
        col("capacity"),
        graft.functions.quantize(when(col("capped"), col("capacity"))
          .otherwise(col("__lam") * col("w")), 2).as("allocated_tokens"),
        graft.functions.quantize(when(col("capped"), col("capacity"))
          .otherwise(col("__lam") * col("w")) / col("tokens_available"),
          4).as("epochs"),
        col("capped"))
  }

  /** The k-bounded driver form of [[epochPlanFromSizes]]'s interior:
    * the SAME water-filling arithmetic, expression tree by expression
    * tree (Math.pow/divide/floor are the identical correctly-rounded
    * IEEE primitives Catalyst evaluates), over the collected
    * `(domain, tokens_available)` table. Order-sensitive double sums
    * (Σ__wraw, the capped-capacity and uncapped-weight reductions) run
    * in the CANONICAL (__r, domain-UTF-8) order — a DEFINED order
    * where the distributed form's was engine-internal; the q_x62/x70/
    * x72 oracles and the driver≡distributed equality spec pin the
    * results together. */
  private def epochPlanOnDriver(dom: DataFrame, budgetTokens: Long,
      maxEpochs: Double, alpha: Double): DataFrame = {
    val spark = dom.sparkSession
    import spark.implicits._
    val rows: Array[(String, Long)] = dom
      .select(col("domain").cast("string"), col("tokens_available"))
      .as[(String, Long)].collect()
    if (rows.isEmpty)
      return Seq.empty[(String, Long, Double, Double, Double, Double,
        Boolean)].toDF("domain", "tokens_available", "weight",
        "capacity", "allocated_tokens", "epochs", "capped")
    // UTF-8 byte order = Spark's binary string order (a UTF-16
    // compareTo would diverge on supplementary-plane domain labels)
    val utf8 = new Ordering[String] {
      def compare(a: String, b: String): Int = {
        val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          val c = (x(i) & 0xff) - (y(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        x.length - y.length
      }
    }
    val totT = rows.map(_._2).sum.toDouble // exact long sum
    val byDomain = rows.sortBy(_._1)(utf8)
    val wraw = byDomain.map { case (_, ta) =>
      math.pow(ta.toDouble / totT, alpha) }
    val wsum = wraw.sum // canonical ascending-domain order
    val b = math.min(budgetTokens.toDouble, totT * maxEpochs)
    case class Staged(domain: String, ta: Long, w: Double,
      capacity: Double, r: Double, wq: Long)
    val staged = byDomain.zip(wraw).map { case ((d, ta), wr) =>
      val w = wr / wsum
      val capacity = ta.toDouble * maxEpochs
      Staged(d, ta, w, capacity, capacity / w,
        math.floor(w * 1e15 + 0.5).toLong)
    }
    val ordered = staged.sortBy(s => (s.r, s.domain))(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, utf8))
    val totWq = ordered.map(_.wq).sum
    var cumT = 0L; var cumWq = 0L
    val flagged = ordered.map { s =>
      cumT += s.ta; cumWq += s.wq
      val cumC = cumT.toDouble * maxEpochs
      val sfxW = (totWq - cumWq).toDouble / 1e15
      val capped =
        if (sfxW > 1e-12) s.r <= (b - cumC) / sfxW
        else b >= cumC - 1e-6
      (s, capped)
    }
    val cc = flagged.map { case (s, c) => if (c) s.capacity else 0.0 }.sum
    val uw = flagged.map { case (s, c) => if (c) 0.0 else s.w }.sum
    val lam = if (uw > 1e-12) (b - cc) / uw else 0.0
    def quant(x: Double, p: Int): Double = {
      val sc = math.pow(10, p)
      math.floor(x * sc + 0.5) / sc
    }
    flagged.map { case (s, capped) =>
      val alloc = if (capped) s.capacity else lam * s.w
      (s.domain, s.ta, quant(s.w, 6), s.capacity, quant(alloc, 2),
        quant(alloc / s.ta.toDouble, 4), capped)
    }.toSeq.toDF("domain", "tokens_available", "weight", "capacity",
      "allocated_tokens", "epochs", "capped")
  }

  /** Materialize an [[epochPlan]] into the training corpus it
    * prescribes: every document in a domain with `epochs = e` yields
    * `floor(e)` full copies plus one more iff its md5-derived uniform
    * draw falls below `frac(e)` — so per-domain token volume matches
    * the plan's allocation in expectation, and EXACTLY which documents
    * carry the fractional epoch is a pure function of (seed, doc id):
    * rerun-stable, partitioning-independent, reproducible by any
    * engine (the Bernoulli threshold is integer-compared against the
    * 32-bit hash, no float randomness).
    *
    * Output is the exploded copy table `(domain, id, copy_idx,
    * n_toks[, carryCols…])` — what X56's sharded export consumes
    * (`carryCols` lets the payload ride along so the export needs no
    * corpus-sized join back). Scale shape: ONE
    * broadcast join against the |domains|-row plan and a bounded
    * explode (`<= ceil(maxEpochs)` copies per row); no shuffle of the
    * corpus at all. */
  def materializePlan(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, plan: DataFrame, seed: Long,
      carryCols: Seq[String] = Nil): DataFrame =
    materializeCounted(
      df.select(col(idCol) +: col(domainCol).as("domain") +:
        coalesce(size(graft.text.Dedup.words(col(textCol))), lit(0))
          .cast("long").as("n_toks") +: carryCols.map(col): _*),
      idCol, "n_toks", "domain", plan, seed, carryCols)

  /** [[materializePlan]] over an ALREADY-COUNTED corpus (`nToksCol`
    * present) — the tokenize-once sibling of [[epochPlanFromSizes]]:
    * the plan's size table and the copy counts should come from ONE
    * tokenize pass, not one each. Same output, same md5 Bernoulli. */
  def materializeCounted(df: DataFrame, idCol: String, nToksCol: String,
      domainCol: String, plan: DataFrame, seed: Long,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(seed >= 0 && seed <= Int.MaxValue,
      s"seed must fit in [0, 2^31), got $seed")
    val docs = df.select(col(idCol) +: col(domainCol).as("domain") +:
      col(nToksCol).cast("long").as("n_toks") +: carryCols.map(col): _*)
    val p = plan.select(col("domain"), col("epochs"))
    val h = conv(substring(md5(concat(lit(s"ep|$seed|"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val frac = col("epochs") - floor(col("epochs"))
    val nCopies = floor(col("epochs")).cast("long") +
      when(h < floor(frac * lit(4294967296.0)).cast("long"), 1L)
        .otherwise(0L)
    docs.join(broadcast(p), Seq("domain"))
      .withColumn("__nc", nCopies)
      .filter(col("__nc") > 0)
      .select(col("domain") +: col(idCol) +:
        explode(sequence(lit(0L), col("__nc") - 1)).as("copy_idx") +:
        col("n_toks") +: carryCols.map(col): _*)
  }

  /** X127: PACKING-EFFICIENCY REPORT over an X77 [[contextManifest]] —
    * how much of every fixed context window is actual document tokens
    * vs separators/tail padding: per sequence the doc count, packed
    * doc tokens and fill ratio, plus corpus headline columns
    * (total_seqs, utilization = Σ doc_tokens / (total_seqs · L))
    * broadcast onto every row. The number a packing configuration is
    * tuned on — a low utilization means the context length or the
    * separator policy is wasting paid-for FLOPs.
    *
    * Exactness + scale: the manifest already carries exact integer
    * (seq_id, n_toks); this is one seq-keyed aggregate (rows = corpus
    * tokens / L) + a broadcast 1-row total — fixed IEEE divisions, no
    * rounding. Output: one row per sequence — (seq_id, n_docs,
    * doc_tokens, fill_ratio, total_seqs, utilization). */
  def packingEfficiency(manifest: DataFrame, contextTokens: Long)
      : DataFrame = {
    require(contextTokens >= 1,
      s"contextTokens must be >= 1, got $contextTokens")
    val perSeq = manifest.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("doc_tokens"))
    val summary = perSeq.agg(count(lit(1)).as("total_seqs"),
      coalesce(sum(col("doc_tokens")), lit(0L)).as("__tot"))
    perSeq.crossJoin(broadcast(summary))
      .select(col("seq_id"), col("n_docs"), col("doc_tokens"),
        (col("doc_tokens").cast("double") / lit(contextTokens.toDouble))
          .as("fill_ratio"),
        col("total_seqs"),
        (col("__tot").cast("double") /
          (col("total_seqs").cast("double") *
            lit(contextTokens.toDouble))).as("utilization"))
  }

  /** X129: PACKED-SEQUENCE SPLIT-LEAKAGE AUDIT — the governance check
    * X77 packing makes necessary: when documents from different
    * train/val/test splits land in the SAME fixed-context sequence,
    * the held-out text is literally inside a training context — a
    * leak no doc-level split audit (X125) can see. Joins a context
    * manifest to a (doc_id, split) assignment and reports every
    * sequence whose members span more than one split, with the sorted
    * distinct split list and the token count each split contributes.
    *
    * Exactness + scale: one manifest-sized join on doc_id + one
    * seq-keyed aggregate; `splits` is the comma-joined SORTED distinct
    * split set (set semantics + an explicit sort — engine-order-
    * immune, hashable cross-engine as a plain string). Output: one
    * row per LEAKY sequence — (seq_id, n_docs, n_splits, splits,
    * leaked_tokens = tokens NOT from the sequence's majority split);
    * empty means the packing respected the split. */
  def packedSplitLeakage(manifest: DataFrame, splits: DataFrame)
      : DataFrame = {
    val joined = manifest.join(splits, "doc_id")
    val perSeqSplit = joined.groupBy(col("seq_id"), col("split"))
      .agg(count(lit(1)).as("__nd"), sum(col("n_toks")).as("__nt"))
    perSeqSplit.groupBy(col("seq_id"))
      .agg(sum(col("__nd")).as("n_docs"),
        count(lit(1)).as("n_splits"),
        concat_ws(",", sort_array(collect_set(col("split"))))
          .as("splits"),
        (sum(col("__nt")) - max(col("__nt"))).as("leaked_tokens"))
      .filter(col("n_splits") > 1)
  }

  /** X134: IMPORTANCE-WEIGHT DIAGNOSTICS — the health check run before
    * trusting any weighted sample (DSIR keeps, mixture factors, X87
    * priorities): `ESS = (Σw)²/Σw²` (Kong 1992, public knowledge) — the
    * effective number of rows the weighting actually uses — plus the
    * ESS ratio and the single heaviest weight's share. An ESS ratio
    * near 0 means a handful of rows dominate and the "weighted corpus"
    * is really a tiny corpus; max_w_share ≈ 1 means ONE row is the
    * corpus. One aggregate pass, exact moment sums in doubles over the
    * given weights, fixed IEEE expression tree. Negative weights fail
    * loud (ESS is defined for nonnegative importance weights).
    * Output: one row — (n, sum_w, ess, ess_ratio, max_w_share). */
  def importanceDiagnostics(df: DataFrame, weightCol: Column)
      : DataFrame = {
    val w = weightCol.cast("double")
    val agg = df.filter(w.isNotNull)
      .agg(count(lit(1)).as("n"), sum(w).as("__sw"),
        sum(w * w).as("__sww"), max(w).as("__mx"),
        min(w).as("__mn"))
    val row = agg.head()
    require(row.getLong(0) == 0 || row.getDouble(4) >= 0,
      s"importanceDiagnostics: negative weight ${row.getDouble(4)}")
    agg.select(col("n"), col("__sw").as("sum_w"),
      when(col("__sww") > 0, col("__sw") * col("__sw") / col("__sww"))
        .as("ess"),
      when(col("__sww") > 0 && col("n") > 0,
        col("__sw") * col("__sw") / col("__sww") /
          col("n").cast("double")).as("ess_ratio"),
      when(col("__sw") > 0, col("__mx") / col("__sw"))
        .as("max_w_share"))
  }

  /** X138: CURRICULUM ORDER — the deterministic easy→hard training
    * schedule (Bengio et al. 2009): rank the corpus by a difficulty
    * score, cut into `stages` equal-height ntile stages, and within
    * each stage order by a content hash so consecutive documents are
    * UNCORRELATED (difficulty-sorted order inside a stage would feed
    * near-identical batches; the hash shuffle is the standard fix and
    * reproducible, unlike `rand()`).
    *
    * Two-phase everywhere: the stage cut is the exact SQL-ntile over
    * [[graft.relational.Ranks.globalRankAndCount]] under the total
    * order (difficulty, id); the within-stage sequence is a SECOND
    * global rank under (stage, md5(id)) minus the stage's minimum rank
    * — a stages-sized broadcast aggregate — so no window ever sees an
    * unbounded partition. Output: (id, difficulty, stage, seq) with
    * seq = 1..stage-size in hash order. */
  def curriculumOrder(df: DataFrame, idCol: String,
      difficultyCol: Column, stages: Int): DataFrame = {
    require(stages >= 1, s"stages must be >= 1, got $stages")
    val base = df.select(col(idCol).as("id"),
      difficultyCol.as("difficulty"))
    val (ranked, n) = graft.relational.Ranks.globalRankAndCount(base,
      Seq(col("difficulty"), col("id")), "__rank")
    val staged = ranked.withColumn("stage",
      graft.relational.Ranks.ntileOf(col("__rank"), n, stages))
    val hashed = staged.withColumn("__h",
      md5(col("id").cast("string")))
    val seqRanked = graft.relational.Ranks.globalRank(hashed,
      Seq(col("stage"), col("__h"), col("id")), "__seq_g")
    val stageMin = seqRanked.groupBy(col("stage").as("__st"))
      .agg(min(col("__seq_g")).as("__min_g"))
    seqRanked.join(broadcast(stageMin), col("stage") === col("__st"))
      .select(col("id"), col("difficulty"), col("stage"),
        (col("__seq_g") - col("__min_g") + 1L).as("seq"))
  }

  /** X151: GREEDY MAX-COVERAGE SELECTION — the facility-location
    * coreset picker ("choose k documents that together cover the most
    * distinct shingles"): classic lazy-free greedy (Nemhauser 1978's
    * 1−1/e guarantee, public knowledge), the shape behind
    * representative-subset selection for eval sets, prompt banks and
    * dedup seed choices. Iteration i computes every candidate's
    * MARGINAL gain — its shingles not yet covered — and takes the
    * argmax (gain desc, id asc — deterministic). The uncovered state
    * is kept as a SHRINKING `remaining` (__id, __sh) relation: each
    * winner's still-uncovered shingle set (exactly its marginal-gain
    * rows, bounded by ONE document's size, so broadcast-able at any
    * corpus scale) is anti-joined away, which also retires the winner
    * itself (its rows all vanish) and any fully-covered candidate —
    * no growing covered set, no union+distinct shuffle, no picked-id
    * filter. k driver iterations of one count-aggregate shuffle plus
    * one broadcast anti-join each — the textbook pass lower bound
    * without sketches; only the 1-row argmax ever reaches the driver,
    * and `remaining` stays a DISTRIBUTED relation (at 100 TB it is
    * billions of shingles — never a driver set). Stops early when no
    * candidate adds coverage (an exhausted corpus has zero remaining
    * rows — selection quality would be fiction). Output: (pick_rank,
    * id, gain, covered_total). */
  def greedyCoverageSelect(df: DataFrame, idCol: String,
      textCol: String, k: Int, shingleN: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    // ids keep their NATIVE type (string doc ids are first-class, like
    // trainingOrder) — a forced long cast would silently NULL-merge
    // every non-numeric id into one phantom candidate.
    val idType = df.select(col(idCol)).schema.head.dataType
    // (id, sh) pairs are unique after a PER-DOC array_distinct — ids
    // differ across docs, so a global distinct() would dedup exactly the
    // same rows while paying a full shuffle of every shingle string.
    var remaining = graft.util.Caches.persistTracked(
      df.select(col(idCol).as("__id"),
          explode(array_distinct(
            graft.text.Dedup.shingles(col(textCol), shingleN)))
            .as("__sh")))
    var prev: Option[DataFrame] = None
    val picks = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    var total = 0L
    var i = 1
    var done = false
    while (i <= k && !done) {
      // A doc whose shingles are all covered has no remaining rows, so
      // gain-0 candidates (and past winners) never appear in the agg.
      val top = remaining
        .groupBy(col("__id")).agg(count(lit(1)).as("__gain"))
        .orderBy(col("__gain").desc, col("__id"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val id = top(0).get(0); val gain = top(0).getLong(1)
        if (id == null) throw new IllegalArgumentException(
          s"greedyCoverageSelect: NULL value in id column '$idCol' — " +
            "ids must be non-null (a NULL would merge distinct documents " +
            "into one candidate)")
        total += gain
        picks += org.apache.spark.sql.Row(i.toLong, id, gain, total)
        val winnerSh = remaining.filter(col("__id") === lit(id))
          .select(col("__sh"))
        val next = graft.util.Caches.persistTracked(
          remaining.join(broadcast(winnerSh), Seq("__sh"), "left_anti"))
        prev.foreach(_.unpersist())
        prev = Some(remaining)
        remaining = next
      }
      i += 1
    }
    prev.foreach(_.unpersist())
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("pick_rank", LongType, nullable = false),
      StructField("id", idType, nullable = false),
      StructField("gain", LongType, nullable = false),
      StructField("covered_total", LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(picks.toSeq).asJava),
      schema)
  }

  /** X161: DETERMINISTIC TRAINING-ORDER MANIFEST — the epoch-level
    * global shuffle of a training corpus as a REPRODUCIBLE relation
    * instead of a runtime RNG: order = global rank over
    * (md5(seed:id), id) — re-runs, re-reads and a different cluster
    * all derive the identical order, and changing `seed` is a fresh
    * epoch permutation (the X71/X12 seeded-hash discipline). Shards
    * are ROUND-ROBIN over the shuffled order (shard = (order−1) mod
    * k, position = (order−1) div k), so every shard is an unbiased
    * interleave of the permutation — a data-parallel worker reading
    * shard s in position order replays its slice of the global
    * shuffle without coordination.
    *
    * Scale: one two-phase `Ranks.globalRank` (no global-order
    * window); everything else is per-row integer arithmetic. Output:
    * (id, global_order, shard, pos_in_shard). */
  def trainingOrder(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val hashed = df.select(col(idCol).as("id"))
      .withColumn("__h",
        md5(concat_ws(":", lit(seed), col("id").cast("string"))))
    graft.relational.Ranks.globalRank(hashed,
        Seq(col("__h"), col("id")), "global_order")
      .select(col("id"), col("global_order"),
        ((col("global_order") - 1) % nShards).as("shard"),
        expr(s"(global_order - 1) div $nShards").as("pos_in_shard"))
  }

  /** X159: IPF / RAKING cell weights toward UNIFORM marginals
    * (iterative proportional fitting — Deming & Stephan 1940, public
    * knowledge; "raking" in survey statistics): given two categorical
    * attributes (e.g. lang × source), compute per-cell sampling
    * weights whose weighted marginals approach EQUAL mass per
    * attribute value — the corpus-balancing step run before X46-style
    * mixing when a crawl over-represents one language or one source.
    * Iteration t alternates a row step (scale every cell so each
    * rowCol value carries total/n_rows mass) and a column step
    * (likewise for colCol); IPF converges geometrically on strictly
    * positive tables.
    *
    * Exact integer arithmetic end to end, which is what makes it
    * cross-engine reproducible: weights live as `scale`-scaled BigInt
    * (w₀ = n·scale), each step is w ← ⌊w·W / (v·rowsum)⌋ with W the
    * current total and v the attribute cardinality — multiply before
    * divide, one floor division, no doubles anywhere. The uniform
    * target share 1/v stays a RATIONAL inside the division instead of
    * a rounded ppm constant.
    *
    * Scale: raking marginals are low-cardinality BY DEFINITION (you
    * rake langs and sources, not doc ids) — the cell table is
    * v_row·v_col rows, collected to the driver like the k-bounded
    * centroid tables (`ann/Similarity` discipline), iterated exactly,
    * and returned as a local relation to broadcast-join downstream.
    * The only distributed work is the ONE map-side-combined cell
    * count. `maxCells` fails loud if someone rakes a high-cardinality
    * attribute. Output: (row_val, col_val, n, weight_scaled) with
    * weight_scaled/scale the multiplicative cell weight. */
  def rakeWeights(df: DataFrame, rowCol: String, colCol: String,
      iterations: Int = 3, scale: Long = 1000000L,
      maxCells: Int = 100000): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    val spark = df.sparkSession
    import spark.implicits._
    val cells0 = df.groupBy(col(rowCol).cast("string").as("__r"),
        col(colCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
      .as[(String, String, Long)].collect()
    require(cells0.length <= maxCells,
      s"rakeWeights: ${cells0.length} cells exceed maxCells=$maxCells " +
        "- raking is for low-cardinality marginals")
    require(cells0.nonEmpty, "rakeWeights: empty input")
    var w = cells0.map { case (r, c, n) =>
      (r, c, n, BigInt(n) * scale)
    }
    val nRows = w.map(_._1).distinct.length
    val nCols = w.map(_._2).distinct.length
    def step(key: ((String, String, Long, BigInt)) => String,
        v: Int): Unit = {
      val total = w.map(_._4).sum
      val sums = w.groupBy(key).map { case (k2, xs) =>
        k2 -> xs.map(_._4).sum
      }
      w = w.map { case t @ (r, c, n, x) =>
        val s = sums(key(t))
        (r, c, n, if (s == 0) x else x * total / (BigInt(v) * s))
      }
    }
    (1 to iterations).foreach { _ =>
      step(_._1, nRows)
      step(_._2, nCols)
    }
    w.toSeq.map { case (r, c, n, x) => (r, c, n, x.toLong) }
      .toDF("__r", "__c", "n", "weight_scaled")
      .select(col("__r").as(rowCol), col("__c").as(colCol), col("n"),
        col("weight_scaled"))
  }
}
