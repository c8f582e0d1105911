package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier calibration utilities — the step between a trained filter
  * ([[TextClassifier]]) and a production keep/drop threshold: how much
  * of the corpus survives each candidate cutoff, and how accurate the
  * kept slice is.
  */
object Eval {

  /** Precision / keep-volume sweep over `nBuckets` equal-width score
    * cutoffs. For each cutoff t (bucket lower edge): how many rows
    * score >= t, and what fraction of those are correct.
    *
    * Deliberately NOT a window over distinct scores: the distinct-score
    * sweep sorts the full relation through one task at 100 TB. The grid
    * form is one map-side-combined aggregate into `nBuckets` cells plus
    * a suffix-sum window over the GRID (nBuckets rows, constant) — the
    * same cutoff-table shape as `perplexityBucketsByCutoff`. Bucketing
    * uses only exactly-rounded IEEE ops (subtract, divide, floor), so
    * both engines place every row identically — no rounding-at-the-
    * boundary hazard, unlike ln/exp-derived keys.
    *
    * Rows with a NULL score are excluded (a one-class corpus has no
    * margin). Degenerate spread (max == min) collapses to bucket 0.
    *
    * Output: (bucket, threshold, n_kept, n_correct_kept, precision),
    * one row per bucket 0..nBuckets-1, precision NULL where nothing is
    * kept. */
  def thresholdSweep(spark: SparkSession, scored: DataFrame,
      scoreCol: String, correctCol: String, nBuckets: Int = 20)
      : DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    // one materialization of the (possibly expensive) scoring lineage:
    // stats, the bucket aggregate and the grid all re-read the cache
    val rows = graft.util.Caches.persistTracked(
      scored.filter(col(scoreCol).isNotNull)
        .select(col(scoreCol).cast("double").as("__s"),
          col(correctCol).cast("boolean").as("__ok")))
    val stats = rows.agg(min(col("__s")).as("__mn"),
      max(col("__s")).as("__mx"))
    val bucketed = rows.crossJoin(broadcast(stats))
      .withColumn("__step", (col("__mx") - col("__mn")) / nBuckets)
      .withColumn("bucket",
        when(col("__step") === 0, lit(0L)).otherwise(
          least(floor((col("__s") - col("__mn")) / col("__step")),
            lit(nBuckets - 1L))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__ok").cast("long")).as("__c"))
    val grid = spark.range(nBuckets).select(col("id").as("bucket"))
      .crossJoin(broadcast(stats))
      .withColumn("__step", (col("__mx") - col("__mn")) / nBuckets)
      .withColumn("threshold",
        graft.functions.q6(col("__mn") + col("bucket") * col("__step")))
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq("bucket"), "left")
      .withColumn("n_kept",
        sum(coalesce(col("__n"), lit(0L))).over(w))
      .withColumn("n_correct_kept",
        sum(coalesce(col("__c"), lit(0L))).over(w))
      .select(col("bucket"), col("threshold"), col("n_kept"),
        col("n_correct_kept"),
        when(col("n_kept") > 0,
          graft.functions.quantize(
            col("n_correct_kept") / col("n_kept"), 4)).as("precision"))
  }

  /** F15: CALIBRATION CURVE + ECE (reliability diagram, public
    * knowledge — Guo et al. 2017 popularized ECE): equal-width
    * confidence bins over the observed score range; per bin the
    * observed accuracy vs the mean predicted score, and the
    * bin-weighted |gap| sum `ece = Σ nᵢ/N·|accᵢ − confᵢ|` — the
    * standard "is the classifier's confidence honest" diagnostic run
    * before using scores as keep-thresholds in curation.
    *
    * Same scale discipline as [[thresholdSweep]]: bucketing uses only
    * exactly-rounded IEEE ops (both engines place every row
    * identically), ONE map-side-combined aggregate into nBuckets
    * cells, grid-sized everything after. Counts and accuracy are
    * exact; mean confidence and the gap/ECE carry a distributed score
    * sum, so those three are rounded to 6.
    *
    * Output: (bucket, threshold, n, n_correct, observed_acc,
    * mean_score, gap, ece) — one row per non-empty-range bucket. */
  /** F58: MURPHY BRIER DECOMPOSITION (Murphy 1973, public knowledge) —
    * `BS = reliability − resolution + uncertainty` over score buckets:
    * reliability `Σ n_k(conf̄_k − acc_k)²/N` (how wrong the stated
    * confidences are — what recalibration can fix), resolution
    * `Σ n_k(acc_k − ō)²/N` (how much the buckets separate outcomes —
    * what recalibration cannot add), uncertainty `ō(1−ō)`. The binned
    * identity is exact only for bucket-constant forecasts, so the
    * DISCRETIZATION RESIDUAL `BS − (rel − res + unc)` (the
    * within-bucket forecast variance) is REPORTED, not hidden.
    *
    * Determinism: scores and per-row (p−y)² quantize to scaled-1e9
    * LONGs summed as DECIMAL(38,0) (a raw double Σ re-orders between
    * engines); bucket terms cumulate over the ordered ≤ nBuckets grid
    * (bounded window, the [[calibrationCurve]] justification); the
    * final trees are fixed IEEE over exact operands. Same min-max
    * bucketing rule as [[calibrationCurve]]. Output 1 row:
    * (n, n_buckets, brier, reliability, resolution, uncertainty,
    * residual). */
  def brierDecomposition(spark: SparkSession, scored: DataFrame,
      scoreCol: String, correctCol: String, nBuckets: Int = 10)
      : DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val D = "decimal(38,0)"
    val rows = graft.util.Caches.persistTracked(
      scored.filter(col(scoreCol).isNotNull)
        .select(col(scoreCol).cast("double").as("__s"),
          col(correctCol).cast("boolean").cast("long").as("__y")))
    val stats = rows.agg(min(col("__s")).as("__mn"),
      max(col("__s")).as("__mx"))
    val err = (col("__s") - col("__y").cast("double")) *
      (col("__s") - col("__y").cast("double"))
    val bucketed = rows.crossJoin(broadcast(stats))
      .withColumn("__step", (col("__mx") - col("__mn")) / nBuckets)
      .withColumn("bucket",
        when(col("__step") === 0, lit(0L)).otherwise(
          least(floor((col("__s") - col("__mn")) / col("__step")),
            lit(nBuckets - 1L))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_k"),
        coalesce(sum(col("__y")), lit(0L)).as("c_k"),
        sum(floor(col("__s") * lit(1e9) + lit(0.5)).cast("long")
          .cast(D)).as("__sl"),
        sum(floor(err * lit(1e9) + lit(0.5)).cast("long").cast(D))
          .as("__bl"))
    val wB = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nAll = sum(col("n_k")).over(tot)
    val cAll = sum(col("c_k")).over(tot)
    val oBar = cAll.cast("double") / nAll.cast("double")
    val conf = col("__sl").cast("double") / lit(1e9) /
      col("n_k").cast("double")
    val acc = col("c_k").cast("double") / col("n_k").cast("double")
    val relT = col("n_k").cast("double") * (conf - acc) * (conf - acc)
    val resT = col("n_k").cast("double") * (acc - col("__ob")) *
      (acc - col("__ob"))
    val agg = bucketed
      .withColumn("__ob", oBar)
      .withColumn("__n", nAll)
      .withColumn("__c", cAll)
      .withColumn("__bsum", sum(col("__bl")).over(tot))
      .withColumn("__crel", sum(relT).over(wB))
      .withColumn("__cres", sum(resT).over(wB))
      .groupBy()
      .agg(first(col("__n")).as("n"), count(lit(1)).as("n_buckets"),
        first(col("__c")).as("__ct"),
        first(col("__bsum")).as("__bs"),
        max_by(col("__crel"), col("bucket")).as("__rel"),
        max_by(col("__cres"), col("bucket")).as("__res"))
    val nD = col("n").cast("double")
    val ob = col("__ct").cast("double") / nD
    val brier = col("__bs").cast("double") / lit(1e9) / nD
    val rel = col("__rel") / nD
    val res = col("__res") / nD
    val unc = ob * (lit(1.0) - ob)
    import graft.functions.q6
    agg.select(col("n"), col("n_buckets"),
      q6(brier).as("brier"),
      q6(rel).as("reliability"),
      q6(res).as("resolution"),
      q6(unc).as("uncertainty"),
      q6(brier - (rel - res + unc)).as("residual"))
  }

  def calibrationCurve(spark: SparkSession, scored: DataFrame,
      scoreCol: String, correctCol: String, nBuckets: Int = 10)
      : DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    // one materialization of the (possibly expensive) scoring lineage:
    // stats, the bucket aggregate and both grid consumers re-read it
    val rows = graft.util.Caches.persistTracked(
      scored.filter(col(scoreCol).isNotNull)
        .select(col(scoreCol).cast("double").as("__s"),
          col(correctCol).cast("boolean").as("__ok")))
    val stats = rows.agg(min(col("__s")).as("__mn"),
      max(col("__s")).as("__mx"))
    val bucketed = rows.crossJoin(broadcast(stats))
      .withColumn("__step", (col("__mx") - col("__mn")) / nBuckets)
      .withColumn("bucket",
        when(col("__step") === 0, lit(0L)).otherwise(
          least(floor((col("__s") - col("__mn")) / col("__step")),
            lit(nBuckets - 1L))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("__ok").cast("long")).as("n_correct"),
        sum(col("__s")).as("__ssum"))
    val grid = spark.range(nBuckets).select(col("id").as("bucket"))
      .crossJoin(broadcast(stats))
      .withColumn("__step", (col("__mx") - col("__mn")) / nBuckets)
      .withColumn("threshold",
        graft.functions.q6(col("__mn") + col("bucket") * col("__step")))
      .select(col("bucket"), col("threshold"))
    // BOUNDED global windows, by construction: perBucket is the grid
    // join — at most nBuckets (constant, default 10) rows — so the
    // partition-less window is a 10-row sort, not a scale hazard. The
    // r10 form computed __nt and ece as two extra broadcast one-row
    // aggregates instead; each broadcast is its own job and the ECE one
    // re-evaluated the whole perBucket lineage, tripling q_f15's wall
    // time (1.17 -> 3.36 s) for zero scale benefit.
    val tot = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grid.join(bucketed, Seq("bucket"), "inner")
      .withColumn("__nt", sum(col("n")).over(tot).cast("double"))
      .withColumn("observed_acc",
        graft.functions.q6(col("n_correct").cast("double") / col("n")))
      .withColumn("__conf", col("__ssum") / col("n"))
      .withColumn("mean_score", graft.functions.q6(col("__conf")))
      .withColumn("__g",
        col("n_correct").cast("double") / col("n") - col("__conf"))
      .withColumn("gap", graft.functions.q6(col("__g")))
      .withColumn("ece",
        graft.functions.q6(
          sum(abs(col("__g")) * col("n") / col("__nt")).over(tot)))
      .select(col("bucket"), col("threshold"), col("n"),
        col("n_correct"), col("observed_acc"), col("mean_score"),
        col("gap"), col("ece"))
  }

  /** F28: DECILE LIFT / GAINS TABLE — the campaign-targeting view of a
    * score (public knowledge): rank the population by score
    * descending, cut into `buckets` equal-height bins, and per bin
    * report positives, rates, the CUMULATIVE capture of all
    * positives ("top 2 deciles catch 45%") and lift vs the base rate.
    * This is the table a budget decision reads; AUC compresses it to
    * one number.
    *
    * Exactness + scale: ranks come from the two-phase prefix sum
    * ([[graft.relational.Ranks.globalRankAndCount]] over (score desc,
    * id) — no global-order window), bins from the computed
    * SQL-standard ntile; counts are exact and every rate/lift is a
    * fixed IEEE expression over them (cumulative counts ride an
    * ordered window over the BUCKETS-sized table). Output: one row
    * per bucket — (bucket, n, n_pos, pos_rate, cum_pos, capture,
    * lift); lift NULL when there are no positives. */
  def liftTable(df: DataFrame, scoreCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column, idCol: org.apache.spark.sql.Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"), idCol.as("__id"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val (ranked, n) = graft.relational.Ranks.globalRankAndCount(base,
      Seq(col("__s").desc, col("__id")), "__r")
    require(n >= buckets, s"liftTable: $n rows < $buckets buckets")
    val perBucket = ranked
      .withColumn("bucket",
        graft.relational.Ranks.ntileOf(col("__r"), n, buckets))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y") === 1, 1L).otherwise(0L)).as("n_pos"))
    liftFromCounts(perBucket)
  }

  /** The lift/gains arithmetic over any (bucket, n, n_pos) count table
    * — shared by [[liftTable]] and the streaming lift-monitor view
    * ([[graft.streaming.StreamingEvents.liftMonitorView]]): the counts
    * are exact integers and MERGEABLE (plain sums), so a table built
    * from per-batch persisted counts equals the batch table over the
    * union by construction. Input is bounded by the bucket count. */
  private[graft] def liftFromCounts(perBucket: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = perBucket.agg(sum(col("n_pos")).as("__tp"),
      sum(col("n")).as("__tn"))
    // bucket-sized ordered cumulative window: `buckets` rows, bounded
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"),
        col("cum_pos"),
        when(col("__tp") > 0, col("cum_pos").cast("double") /
          col("__tp").cast("double")).as("capture"),
        when(col("__tp") > 0,
          (col("n_pos").cast("double") / col("n").cast("double")) /
            (col("__tp").cast("double") / col("__tn").cast("double")))
          .as("lift"))
  }

  /** F74: HOSMER–LEMESHOW CALIBRATION χ² (Hosmer & Lemeshow 1980,
    * public knowledge) — the GOODNESS-OF-FIT test behind a calibration
    * curve's picture: rank by predicted probability, cut into
    * `buckets` equal-height bins, and test observed vs expected event
    * counts: `HL = Σ_g (O_g − E_g)² / (E_g·(1 − E_g/n_g))` on
    * `buckets − 2` dof. [[calibrationCurve]] shows WHERE the model is
    * off; HL says whether the miscalibration is beyond chance — the
    * pre-flight before using raw model scores as keep-probabilities.
    *
    * Exactness + scale: ranks from the two-phase prefix sum
    * ([[graft.relational.Ranks.globalRankAndCount]] over (p, id) — no
    * global-order window), bins from the computed SQL-standard ntile;
    * O_g is an exact LONG; E_g sums 1e9-scaled-LONG probabilities in
    * DECIMAL (order-immune — a double Σp would drift with partition
    * order; exact while n_g ≤ ~9e6 rows per bin at the 1e9 scale,
    * documented like the calibration kernels). Each bin's χ² term is a
    * fixed IEEE tree over (O, E, n); the cross-bin sum rides the
    * BOUNDED `buckets`-row ordered window ([[calibrationCurve]]'s ece
    * discipline). NULL and out-of-[0,1] probabilities fail loud.
    * Output: one row per bin — (bucket, n, n_obs, expected, term,
    * hl_chi2, dof), hl_chi2/dof repeated per row like ece. */
  def hosmerLemeshow(df: DataFrame, probCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column,
      idCol: org.apache.spark.sql.Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 3, s"buckets must be >= 3, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val D = "decimal(38,0)"
    val base = df.select(probCol.cast("double").as("__p"),
      labelCol.cast("int").as("__y"), idCol.as("__id"))
    val guarded = base.select(
      when(col("__p").isNull || col("__y").isNull ||
          col("__p") < 0.0 || col("__p") > 1.0,
        raise_error(concat(lit("hosmerLemeshow: NULL or out-of-[0,1] "),
          lit("probability/label at id "), col("__id").cast("string"))))
        .otherwise(col("__p")).as("__p"),
      col("__y"), col("__id"))
    val (ranked, n) = graft.relational.Ranks.globalRankAndCount(guarded,
      Seq(col("__p"), col("__id")), "__r")
    require(n >= buckets, s"hosmerLemeshow: $n rows < $buckets buckets")
    val perBin = ranked
      .withColumn("bucket",
        graft.relational.Ranks.ntileOf(col("__r"), n, buckets))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y").cast("long")).as("n_obs"),
        sum(floor(col("__p") * lit(1e9) + lit(0.5)).cast("long")
          .cast(D)).as("__el"))
    hlFromBins(perBin, buckets)
  }

  /** The [[hosmerLemeshow]] χ² finish over an already-aggregated bin
    * table `(bucket, n, n_obs, __el)` — bin counts and scaled-LONG
    * expected sums are exact and associative, so per-batch persisted
    * bin cells merge by plain addition (the streaming monitor's
    * contract). */
  private[graft] def hlFromBins(perBin: DataFrame, buckets: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = col("__el").cast("double") / lit(1e9)
    val o = col("n_obs").cast("double")
    val nG = col("n").cast("double")
    val term = when(e > 0 && e < nG,
      (o - e) * (o - e) / (e * (lit(1.0) - e / nG)))
    // bounded global window by construction: `buckets` rows (the f15
    // lesson — one window over the bin table, not extra broadcast jobs)
    val tot = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    import graft.functions.q6
    perBin
      .withColumn("expected", q6(e))
      .withColumn("term", q6(term))
      .withColumn("hl_chi2", q6(sum(term).over(tot)))
      .withColumn("dof", lit(buckets - 2))
      .select(col("bucket"), col("n"), col("n_obs"), col("expected"),
        col("term"), col("hl_chi2"), col("dof"))
  }

  /** F74 STREAMING FORM: Hosmer–Lemeshow over FIXED equal-width
    * probability bins (`bucket = min(⌊p·buckets⌋, buckets−1)`) instead
    * of [[hosmerLemeshow]]'s data-dependent rank deciles. Fixed
    * cutpoints are the standard variant the ORIGINAL paper also
    * tabulates (Hosmer & Lemeshow 1980's "fixed cutpoints" grouping)
    * and the ONLY binning whose per-bin counts are MERGEABLE across
    * micro-batches — rank deciles over a union are not a function of
    * per-batch deciles. Same exact O/scaled-E sums, same χ² tree, same
    * dof = buckets − 2; bins no row landed in are absent (their term
    * contributes 0, stated not hidden). Batch twin of the
    * hosmerLemeshowSink view — spec-pinned equal. */
  def hosmerLemeshowFixedBins(df: DataFrame,
      probCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column, buckets: Int = 10)
      : DataFrame = {
    require(buckets >= 3, s"buckets must be >= 3, got $buckets")
    hlFromBins(hlFixedBinCells(df, probCol, labelCol, buckets), buckets)
  }

  /** The per-bin cell aggregate of [[hosmerLemeshowFixedBins]] —
    * shared verbatim by the streaming sink's micro-batch write. */
  private[graft] def hlFixedBinCells(df: DataFrame,
      probCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column, buckets: Int): DataFrame = {
    val D = "decimal(38,0)"
    val base = df.select(
      when(probCol.isNull || labelCol.isNull ||
          probCol < 0.0 || probCol > 1.0,
        raise_error(lit("hosmerLemeshowFixedBins: NULL or " +
          "out-of-[0,1] probability/label")))
        .otherwise(probCol.cast("double")).as("__p"),
      labelCol.cast("int").as("__y"))
    base
      .withColumn("bucket", least(floor(col("__p") * lit(buckets))
        .cast("long"), lit(buckets - 1L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y").cast("long")).as("n_obs"),
        sum(floor(col("__p") * lit(1e9) + lit(0.5)).cast("long")
          .cast(D)).as("__el"))
  }

  /** F80: SPIEGELHALTER'S CALIBRATION Z (Spiegelhalter 1986, public
    * knowledge) — the ONE-NUMBER calibration test beside
    * [[hosmerLemeshow]]'s binned χ²: under perfect calibration
    * `Z = Σ(y−p)(1−2p) / √Σ(1−2p)²p(1−p)` is standard normal, with NO
    * binning choice to argue about (HL's verdict moves with the decile
    * cut; Z doesn't) — the pair is the standard calibration audit.
    *
    * ONE aggregate pass: both per-row terms are |·| ≤ 1 fixed IEEE
    * trees, floor-scaled to 1e9 LONGs and summed in DECIMAL (the
    * estimator is DEFINED on the 1e-9-quantized terms — the ipwAte
    * discipline — so the sums are exact and order-free at any row
    * count); z is two pinned divisions + one sqrt, published q6. NULL
    * or out-of-[0,1] p fails loud. All-deterministic boards (every
    * p ∈ {0,1}) have zero variance → NULL z. Output: 1 row — (n, z). */
  def spiegelhalterZ(df: DataFrame, probCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val D = "decimal(38,0)"
    val base = df.select(
      when(probCol.isNull || labelCol.isNull ||
          probCol < 0.0 || probCol > 1.0,
        raise_error(lit("spiegelhalterZ: NULL or out-of-[0,1] " +
          "probability/label")))
        .otherwise(probCol.cast("double")).as("__p"),
      labelCol.cast("int").cast("double").as("__y"))
    val num = (col("__y") - col("__p")) *
      (lit(1.0) - lit(2.0) * col("__p"))
    val den = (lit(1.0) - lit(2.0) * col("__p")) *
      (lit(1.0) - lit(2.0) * col("__p")) * col("__p") *
      (lit(1.0) - col("__p"))
    def s9(c: org.apache.spark.sql.Column) =
      sum(floor(c * lit(1e9) + lit(0.5)).cast("long").cast(D))
    spiegelhalterFromMoments(base.agg(count(lit(1)).as("n"),
      s9(num).as("__num"), s9(den).as("__den")))
  }

  /** The [[spiegelhalterZ]] finish over an already-aggregated moment
    * row `(n, __num, __den)` — DECIMAL moment sums are exact and
    * associative, so per-batch persisted rows merge by plain addition
    * and the streaming view equals the batch test by construction
    * (the welchFromMoments contract). */
  private[graft] def spiegelhalterFromMoments(agg: DataFrame)
      : DataFrame = {
    import graft.functions.q6
    agg.select(col("n"),
      q6(when(col("__den") > 0,
        (col("__num").cast("double") / lit(1e9)) /
          sqrt(col("__den").cast("double") / lit(1e9)))).as("z"))
  }

  /** F27: McNEMAR PAIRED TEST — "is classifier B actually better than
    * A, or did the same eval set just get re-scored" (McNemar 1947,
    * public knowledge): only the DISCORDANT pairs carry information —
    * `z = (b − c)/√(b + c)` over b = A-only-correct, c =
    * B-only-correct (χ² = z²); rows both got right or both got wrong
    * cancel out, which is why a paired test detects differences an
    * unpaired accuracy comparison buries in shared variance.
    *
    * One aggregate pass, exact integer counts, a fixed IEEE
    * expression tree — bit-identical cross-engine, no rounding. Zero
    * discordant pairs ⇒ NULL z/significance (no evidence either
    * way), never a division error. Output: one row — (n_both,
    * n_a_only, n_b_only, n_neither, z, chi2, significant). */
  def mcnemarTest(df: DataFrame, okA: org.apache.spark.sql.Column,
      okB: org.apache.spark.sql.Column,
      zThreshold: Double = 1.96): DataFrame = {
    val agg = df.agg(
      sum(when(okA && okB, 1L).otherwise(0L)).as("n_both"),
      sum(when(okA && !okB, 1L).otherwise(0L)).as("n_a_only"),
      sum(when(!okA && okB, 1L).otherwise(0L)).as("n_b_only"),
      sum(when(!okA && !okB, 1L).otherwise(0L)).as("n_neither"))
    val b = col("n_a_only").cast("double")
    val c = col("n_b_only").cast("double")
    val z = when(b + c > 0, (b - c) / sqrt(b + c))
    agg.select(col("n_both"), col("n_a_only"), col("n_b_only"),
      col("n_neither"), z.as("z"),
      when(b + c > 0, (b - c) * (b - c) / (b + c)).as("chi2"),
      (abs(z) > zThreshold).cast("int").as("significant"))
  }

  /** F22: EXACT ROC AUC via the Mann–Whitney rank-sum (public
    * knowledge: AUC = U/(n⁺n⁻) with U from the rank sum of the
    * positives, average ranks over ties) — the threshold-free
    * counterpart of [[thresholdSweep]]: one number for "does this
    * score order positives above negatives", computed EXACTLY rather
    * than by trapezoid over a bucketed curve.
    *
    * Everything is integer until the single final division: per
    * distinct score the positive/negative counts, the cumulative
    * pooled count via the two-phase prefix sum
    * ([[graft.relational.Ranks.prefixSums]] — no global-order window
    * at any score cardinality), and the doubled rank-sum numerator
    * `Σ n⁺_g·(2·cum_before + g + 1)` (ties share the average rank
    * `cum_before + (g+1)/2`; doubling keeps it integral). AUC =
    * (num − n⁺(n⁺+1)) / (2·n⁺·n⁻) — one correctly-rounded division,
    * bit-identical cross-engine, no rounding needed.
    *
    * Output: one row (n_pos, n_neg, auc); auc NULL when either class
    * is empty. */
  def rocAuc(df: DataFrame, scoreCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val grouped = df
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__np"),
        sum(when(col("__y") =!= 1, 1L).otherwise(0L)).as("__nn"))
    val ranked = graft.relational.Ranks.prefixSums(grouped,
      Seq(col("__s")), Seq("__cum" -> (col("__np") + col("__nn"))))
    ranked
      .agg(sum(col("__np")).as("__tp"), sum(col("__nn")).as("__tn"),
        // DECIMAL(38,0): the doubled rank-sum grows ~n² and overflows
        // BIGINT near n ≈ 3e9 rows (DuckDB widens to HUGEINT; matching
        // exactness keeps the 'exact at any cardinality' contract)
        sum(col("__np").cast("decimal(19,0)") *
          (lit(2L) * (col("__cum") - col("__np") - col("__nn")) +
            col("__np") + col("__nn") + lit(1L)).cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("__num"))
      .select(col("__tp").as("n_pos"), col("__tn").as("n_neg"),
        when(col("__tp") > 0 && col("__tn") > 0,
          (col("__num") - (col("__tp") * (col("__tp") + lit(1L)))
            .cast("decimal(38,0)"))
            .cast("double") /
            (lit(2.0) * col("__tp").cast("double") *
              col("__tn").cast("double"))).as("auc"))
  }

  /** F77: CLIFF'S DELTA ordinal effect size (Cliff 1993, public
    * knowledge) — `δ = (#(x₁>x₀) − #(x₁<x₀)) / (n₁·n₀)`, the
    * dominance probability difference: the NON-PARAMETRIC magnitude
    * companion to [[graft.ml.RankTests.mannWhitney]] exactly as F75's
    * Cohen's d is to F42's t — latency and revenue tails break d's
    * pooled-SD assumption, δ only asks "how often does one arm beat
    * the other". Ties contribute zero by definition (δ = 2·AUC − 1
    * only when tie mass is folded at half; this is the unfolded form).
    *
    * Exactness + scale: the [[rocAuc]] kernel — distinct-score groups,
    * one two-phase prefix sum (no global window), DECIMAL(38,0) pair
    * products (gt/lt grow ~n² — BIGINT dies near 3e9 rows), one final
    * division published raw (a single correctly-rounded IEEE op over
    * exact operands — bit-identical cross-engine, no quantize needed).
    * Output: 1 row — (n_pos, n_neg, gt, lt, delta); NULL δ when either
    * arm is empty. */
  def cliffsDelta(df: DataFrame, scoreCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val D = "decimal(38,0)"
    val grouped = df
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__np"),
        sum(when(col("__y") =!= 1, 1L).otherwise(0L)).as("__nn"))
    val ranked = graft.relational.Ranks.prefixSums(grouped,
      Seq(col("__s")), Seq("__cumnn" -> col("__nn")))
    val agg = ranked.agg(
      sum(col("__np")).as("__tp"), sum(col("__nn")).as("__tn"),
      sum(col("__np").cast("decimal(19,0)") *
        (col("__cumnn") - col("__nn")).cast("decimal(19,0)"))
        .cast(D).as("__gt"),
      sum(col("__np").cast("decimal(19,0)") * col("__cumnn")
        .cast("decimal(19,0)")).cast(D).as("__le"))
    // lt = Σ np·(TN − cumnn) = tp·TN − Σ np·cumnn — one broadcast-free
    // identity instead of carrying TN into the per-group row
    def pubLong(c: org.apache.spark.sql.Column, what: String) =
      when(c > lit(Long.MaxValue).cast(D),
        raise_error(lit(s"cliffsDelta: $what overflows BIGINT — " +
          "publish delta only at this cardinality")))
        .otherwise(c.cast("long"))
    agg.select(col("__tp").as("n_pos"), col("__tn").as("n_neg"),
      pubLong(col("__gt"), "gt").as("gt"),
      pubLong((col("__tp") * col("__tn")).cast(D) - col("__le"), "lt")
        .as("lt"),
      when(col("__tp") > 0 && col("__tn") > 0,
        (col("__gt") - ((col("__tp") * col("__tn")).cast(D) -
          col("__le"))).cast("double") /
          (col("__tp").cast("double") * col("__tn").cast("double")))
        .as("delta"))
  }

  /** F76: COCHRAN'S Q TEST (Cochran 1950, public knowledge) — the
    * k-classifier extension of [[mcnemarTest]]: over the SAME items,
    * did any of k matched binary raters/classifiers differ?
    * `Q = (k−1)·(k·ΣG_j² − T²) / (k·T − ΣL_i²)` with G_j = per-
    * classifier successes, L_i = per-item successes, T = ΣG; Q ~ χ²
    * on k−1 dof. Reduces to McNemar's χ² at k = 2. The gate an
    * ensemble-vs-members eval runs before pairwise drill-down.
    *
    * ONE aggregate pass; all counts exact integers, the quadratic
    * sums carried in DECIMAL(38,0) (T² ~ n²·k² passes 2^53 near 1e8
    * rows), one final division published raw. All-identical rows
    * (denominator 0) emit NULL Q. Output: 1 row — (n, k, t, q,
    * significant at the χ² cut the caller passes). */
  def cochranQ(df: DataFrame, okCols: Seq[org.apache.spark.sql.Column],
      chi2Threshold: Double): DataFrame = {
    require(okCols.size >= 2,
      s"cochranQ: need >= 2 classifiers, got ${okCols.size}")
    val D = "decimal(38,0)"
    val k = okCols.size
    // fail loud on NULL outputs: count(*) would include the row while
    // the per-classifier sums and the L² sum skip NULLs inconsistently
    // (li is NULL if ANY column is), so Q would mix mismatched n/G/L
    // populations silently — the hosmerLemeshow/spiegelhalterZ guard
    // convention. Matched designs require every rater on every item.
    val oks = okCols.zipWithIndex.map { case (c, j) =>
      when(c.isNull,
        raise_error(lit(s"cochranQ: NULL classifier output at " +
          s"column $j — a matched design needs every rater on " +
          "every item; filter or impute upstream")))
        .otherwise(c.cast("boolean").cast("long")).as(s"__ok$j") }
    val base = df.select(oks: _*)
    val li = okCols.indices.map(j => col(s"__ok$j")).reduce(_ + _)
    val aggCols = Seq(count(lit(1)).as("n"),
      sum((li * li).cast(D)).as("__l2")) ++
      okCols.indices.map(j => sum(col(s"__ok$j")).as(s"__g$j"))
    val agg = base.agg(aggCols.head, aggCols.tail: _*)
    val t = okCols.indices.map(j => col(s"__g$j")).reduce(_ + _)
    val g2 = okCols.indices.map(j =>
      (col(s"__g$j") * col(s"__g$j")).cast(D)).reduce(_ + _)
    val num = lit(k - 1).cast(D) *
      (lit(k).cast(D) * g2 - (t.cast(D) * t.cast(D)).cast(D))
    val den = lit(k).cast(D) * t.cast(D) - col("__l2")
    val q = when(den > 0, num.cast("double") / den.cast("double"))
    agg.select(col("n"), lit(k).as("k"), t.as("t"), q.as("q"),
      (q > chi2Threshold).cast("int").as("significant"))
  }

  /** F29: SPLIT-CONFORMAL PREDICTION INTERVALS (inductive conformal —
    * Papadopoulos et al. 2002, Lei et al. 2018; public knowledge): on a
    * held-out calibration set compute q̂ = the ⌈(1−α)(n+1)⌉-th smallest
    * absolute residual |y − ŷ|; every scored prediction then carries
    * [ŷ − q̂, ŷ + q̂], which covers the true label with probability
    * ≥ 1 − α in finite samples under exchangeability — the
    * distribution-free error bar a filtering threshold or SLA reads.
    *
    * Exactness: α stays a RATIONAL `alphaNum/alphaDen` — the rank is
    * `((aD−aN)·(n+1) + aD − 1) div aD`, never a float ceil (a double
    * `ceil(0.9·(n+1))` lands either side of an integer by engine).
    * Residual ties can swap rank order freely: equal values yield the
    * same q̂, so the pick is deterministic cross-engine.
    *
    * Scale: the residual rank rides the two-phase
    * [[graft.relational.Ranks.globalRankAndCount]] (no global-order
    * window at any calibration size); q̂ joins the scored side as a
    * broadcast 1-row table. A calibration set too small for the
    * requested coverage (rank > n ⇒ q̂ = ∞) fails loud. Output: one
    * row per scored row — (id, pred, qhat, lo, hi). */
  def conformalInterval(calibration: DataFrame,
      predCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column,
      scored: DataFrame, scoredPredCol: org.apache.spark.sql.Column,
      idCol: org.apache.spark.sql.Column,
      alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaDen >= 2 && alphaNum >= 1 && alphaNum < alphaDen,
      s"need 1 <= alphaNum < alphaDen, got $alphaNum/$alphaDen")
    val res = calibration.select(
      abs(labelCol.cast("double") - predCol.cast("double")).as("__res"))
      .filter(col("__res").isNotNull)
    val (ranked, n) = graft.relational.Ranks.globalRankAndCount(res,
      Seq(col("__res")), "__r")
    val rank = ((alphaDen - alphaNum).toLong * (n + 1) + alphaDen - 1) /
      alphaDen
    require(rank <= n, s"conformalInterval: calibration n=$n cannot " +
      s"support alpha=$alphaNum/$alphaDen (rank $rank > n; q-hat " +
      "would be infinite)")
    val qhat = ranked.filter(col("__r") === rank)
      .select(col("__res").as("qhat"))
    scored
      .select(idCol.as("id"), scoredPredCol.cast("double").as("pred"))
      .crossJoin(broadcast(qhat))
      .select(col("id"), col("pred"), col("qhat"),
        (col("pred") - col("qhat")).as("lo"),
        (col("pred") + col("qhat")).as("hi"))
  }

  /** F30: PRECISION–RECALL CURVE + AVERAGE PRECISION — the imbalanced-
    * class companion to F22's ROC (on a 0.1%-positive corpus filter,
    * ROC AUC can look superb while precision is unusable; the PR view
    * is what a curation threshold is actually set from). One row per
    * DISTINCT score (threshold = "keep everything scoring ≥ s"):
    * cumulative TP/FP via the two-phase prefix sum over (score desc)
    * groups, precision = TP/(TP+FP), recall = TP/P, plus the
    * step-interpolated average precision `AP = Σ_s (ΔTP_s/P)·prec_s`
    * — a PLAIN aggregate over the per-score rows (ΔTP is the group's
    * own positive count), broadcast onto every row.
    *
    * Exactness + scale: counts are exact integers, each ratio one
    * correctly-rounded division — no rounding needed; no global-order
    * window at any score cardinality (same discipline as [[rocAuc]]).
    * Ties share one row (a threshold admits the whole tie group).
    * Output: (score, n_pos_at, n_at, tp, fp, precision, recall, ap). */
  def prCurve(df: DataFrame, scoreCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val grouped = df
      .select(scoreCol.cast("double").as("score"),
        labelCol.cast("int").as("__y"))
      .filter(col("score").isNotNull && col("__y").isNotNull)
      .groupBy(col("score"))
      .agg(sum(when(col("__y") === 1, 1L).otherwise(0L)).as("n_pos_at"),
        count(lit(1)).as("n_at"))
    val (ranked0, totals) =
      graft.relational.Ranks.prefixSumsWithTotals(grouped,
        Seq(col("score").desc),
        Seq("tp" -> col("n_pos_at"), "__cum" -> col("n_at")))
    val p = totals.head
    require(p > 0, "prCurve: no positive labels")
    val ranked = graft.util.Caches.persistTracked(ranked0
      .withColumn("fp", col("__cum") - col("tp"))
      .withColumn("precision",
        col("tp").cast("double") / col("__cum").cast("double"))
      .withColumn("recall", col("tp").cast("double") / lit(p.toDouble)))
    val ap = ranked.agg(
      sum(col("n_pos_at").cast("double") / lit(p.toDouble) *
        col("precision")).as("ap"))
    ranked.crossJoin(broadcast(ap))
      .select(col("score"), col("n_pos_at"), col("n_at"), col("tp"),
        col("fp"), col("precision"), col("recall"), col("ap"))
  }

  /** F31: OPERATING-POINT PICKER — turn the F30 curve into the single
    * threshold a pipeline actually deploys. Two modes:
    * `maxF1Point` takes the distinct-score row maximizing
    * F1 = 2PR/(P+R) (tie → higher threshold: prefer precision at
    * equal F1); `precisionFloorPoint` takes the LOWEST threshold
    * (highest recall) whose precision still meets `num/den` — the
    * "keep everything we can while staying ≥ 99% clean" rule, with
    * the precision test in EXACT integer cross-multiplication
    * (tp·den ≥ cum·num — no float at the decision boundary).
    *
    * Both are one TakeOrdered over the distinct-score curve rows —
    * never a global sort. `precisionFloorPoint` fails loud when no
    * threshold meets the floor (deploying nothing is a decision the
    * caller must see, not an empty frame). Output: one row —
    * (score, tp, fp, precision, recall, f1). */
  def maxF1Point(df: DataFrame, scoreCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame =
    withF1(prCurve(df, scoreCol, labelCol))
      .orderBy(col("f1").desc, col("score").desc).limit(1)

  /** See [[maxF1Point]]. */
  def precisionFloorPoint(df: DataFrame,
      scoreCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column,
      num: Int, den: Int): DataFrame = {
    require(den >= 1 && num >= 0 && num <= den,
      s"need 0 <= num <= den, got $num/$den")
    val ok = withF1(prCurve(df, scoreCol, labelCol))
      .filter(col("tp") * den >= (col("tp") + col("fp")) * num)
    val picked = ok.orderBy(col("score")).limit(1)
    require(picked.count() == 1,
      s"precisionFloorPoint: no threshold reaches precision $num/$den")
    picked
  }

  private def withF1(curve: DataFrame): DataFrame =
    curve.select(col("score"), col("tp"), col("fp"), col("precision"),
      col("recall"),
      when(col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall"))).otherwise(0.0).as("f1"))

  /** F32: REGRESSION METRICS SUITE — the numeric-label counterpart of
    * the classification tier: MAE, RMSE, R² (1 − SSE/SST over the
    * label mean) and a GUARDED MAPE (rows with label 0 are excluded
    * from the MAPE mean and counted, instead of dividing by zero —
    * the standard footgun). One aggregate pass; every metric is a
    * fixed IEEE expression over plain sums; sqrt is correctly
    * rounded. R² NULL on a constant label (SST = 0). Output: one row
    * — (n, mae, rmse, r2, mape, n_mape_excluded). */
  def regressionMetrics(df: DataFrame,
      predCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val base = df.select(predCol.cast("double").as("__p"),
        labelCol.cast("double").as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
    base.agg(
      count(lit(1)).as("n"),
      sum(abs(col("__p") - col("__y"))).as("__sae"),
      sum((col("__p") - col("__y")) * (col("__p") - col("__y")))
        .as("__sse"),
      sum(col("__y")).as("__sy"),
      sum(col("__y") * col("__y")).as("__syy"),
      sum(when(col("__y") =!= 0,
        abs((col("__p") - col("__y")) / col("__y")))).as("__sape"),
      sum(when(col("__y") =!= 0, 1L).otherwise(0L)).as("__nm"))
      .select(col("n"),
        (col("__sae") / col("n")).as("mae"),
        sqrt(col("__sse") / col("n")).as("rmse"),
        when(col("__syy") - col("__sy") * col("__sy") / col("n") > 0,
          lit(1.0) - col("__sse") /
            (col("__syy") - col("__sy") * col("__sy") / col("n")))
          .as("r2"),
        when(col("__nm") > 0, col("__sape") / col("__nm")).as("mape"),
        (col("n") - col("__nm")).as("n_mape_excluded"))
  }

  /** E32: ROLLING-ORIGIN BACKTEST FOLDS (time-series cross-validation
    * — Tashman 2000; Hyndman's "evaluation on a rolling forecasting
    * origin"): fold i trains on everything before cutoff_i and tests
    * on the NEXT `horizonDays` — the temporal-discipline counterpart
    * of the hash-based X103 folds, which would leak the future into
    * training on any time-ordered target. Cutoffs advance by the
    * horizon so test windows tile without overlap; the initial train
    * span absorbs the remainder.
    *
    * Deterministic: pure date arithmetic from the observed min/max
    * (broadcast 1-row bounds); every row lands in fold i's train or
    * test by exact date comparison — re-runs reproduce, and the
    * assignment is derivable at any later time (no RNG, no state).
    * Output: one row per (row, fold) membership — (id, day, fold,
    * role) with role ∈ train|test; rows after fold i's test window
    * simply don't appear in fold i. Fails loud when the span can't
    * fit `folds` horizons. Scale: a ×folds fan-out of row-ids only
    * (id + date, not payloads), one broadcast of the bounds. */
  def rollingOriginFolds(df: DataFrame,
      idCol: org.apache.spark.sql.Column,
      tsCol: org.apache.spark.sql.Column, folds: Int,
      horizonDays: Int): DataFrame = {
    require(folds >= 1, s"folds must be >= 1, got $folds")
    require(horizonDays >= 1, s"horizonDays must be >= 1, got $horizonDays")
    val days = df.select(idCol.as("id"), tsCol.cast("date").as("day"))
    val bounds = days.agg(min(col("day")).as("__mn"),
      max(col("day")).as("__mx"))
    val spine = days.sparkSession.range(1, folds + 1)
      .select(col("id").cast("int").as("fold"))
    val withBounds = days.crossJoin(broadcast(bounds))
      .crossJoin(broadcast(spine))
      .withColumn("__span", datediff(col("__mx"), col("__mn")) + 1)
      .withColumn("__initial", col("__span") - lit(folds * horizonDays))
      .withColumn("__cutoff", date_add(col("__mn"),
        col("__initial") + (col("fold") - 1) * horizonDays))
    // the guard rides a kept column: a span too short for the fold
    // grid must fail loud, not emit folds with empty train sets
    val guarded = withBounds.withColumn("__cutoff",
      when(col("__initial") < 1,
        raise_error(concat(lit("rollingOriginFolds: span of "),
          col("__span"), lit(" days cannot fit "),
          lit(s"$folds folds x $horizonDays-day horizons"))))
        .otherwise(col("__cutoff")))
    guarded
      .withColumn("role",
        when(col("day") < col("__cutoff"), lit("train"))
          .when(col("day") < date_add(col("__cutoff"), horizonDays),
            lit("test")))
      .filter(col("role").isNotNull)
      .select(col("id"), col("day"), col("fold"), col("role"))
  }

  /** F73: DELONG TEST for comparing two correlated AUCs (DeLong,
    * DeLong & Clarke-Pearson 1988, public knowledge) — the McNemar
    * (F27) analogue for RANKERS: model A and model B score the SAME
    * test set, and the question is whether the AUC difference exceeds
    * what their shared examples explain. Per-example placement values
    * V10 (each positive's ψ-mean against all negatives) and V01
    * estimate the AUCs; the variance of the difference combines their
    * empirical covariance matrices: Var = (S10ᴬᴬ+S10ᴮᴮ−2S10ᴬᴮ)/m +
    * (S01ᴬᴬ+S01ᴮᴮ−2S01ᴬᴮ)/n, z = ΔAUC/√Var.
    *
    * Exactness: a placement is the rational (2·below + ties)/(2n) —
    * carried as its INTEGER numerator. Covariance numerators are the
    * exact decimal m·(Σa²+Σb²−2Σab) − (Σa−Σb)² (DECIMAL(38,0) — the
    * rocAuc overflow bound, ~10⁹ rows per class), and every double is
    * produced by the same literal division/sqrt tree the oracle
    * spells out: deterministic cross-engine (ties included — integer
    * test scores exercise them).
    *
    * Scale: placements come from the per-model DISTINCT-SCORE table —
    * counts per score, one two-phase prefix sum (`Ranks.prefixSums`,
    * no global window), one score-keyed join back — the F69 conformal
    * discipline; then ONE map-side-combined moment aggregate. Output:
    * one row — (n_pos, n_neg, auc_a, auc_b, delta_auc, var_delta, z);
    * z NULL when a class has < 2 members or Var = 0. */
  def deLongTest(df: DataFrame, idCol: org.apache.spark.sql.Column,
      scoreACol: org.apache.spark.sql.Column,
      scoreBCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val D = "decimal(38,0)"
    val base = graft.util.Caches.persistTracked(
      df.select(idCol.as("__id"), scoreACol.cast("double").as("__sa"),
        scoreBCol.cast("double").as("__sb"),
        labelCol.cast("int").as("__y")))
    def placements(scoreCol: String, numName: String): DataFrame = {
      val ds = base.groupBy(col(scoreCol).as("__s"))
        .agg(sum(when(col("__y") === 0, 1L).otherwise(0L)).as("__negAt"),
          sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__posAt"))
      val (pre, totals) = graft.relational.Ranks.prefixSumsWithTotals(
        ds, Seq(col("__s")),
        Seq("__cumNeg" -> col("__negAt"), "__cumPos" -> col("__posAt")))
      val m = totals(1)
      // positives: ψ-numerator vs negatives below/tied; negatives:
      // vs positives above/tied — both read off the same prefix row
      val stats = pre.select(col("__s"),
        (lit(2L) * (col("__cumNeg") - col("__negAt")) + col("__negAt"))
          .as("__n10"),
        (lit(2L) * (lit(m) - col("__cumPos")) + col("__posAt"))
          .as("__n01"))
      base.join(stats, base(scoreCol) === stats("__s"))
        .select(col("__id"), col("__y"),
          when(col("__y") === 1, col("__n10")).otherwise(col("__n01"))
            .as(numName))
    }
    val pa = placements("__sa", "__numA")
    val pb = placements("__sb", "__numB")
    val joined = pa.join(pb.select(col("__id").as("__idB"),
        col("__numB")), col("__id") === col("__idB"))
    def mom(yv: Int, sfx: String) = Seq(
      sum(when(col("__y") === yv, col("__numA"))).as(s"__sa$sfx"),
      sum(when(col("__y") === yv, col("__numB"))).as(s"__sb$sfx"),
      sum(when(col("__y") === yv,
        col("__numA").cast(D) * col("__numA").cast(D))).as(s"__saa$sfx"),
      sum(when(col("__y") === yv,
        col("__numB").cast(D) * col("__numB").cast(D))).as(s"__sbb$sfx"),
      sum(when(col("__y") === yv,
        col("__numA").cast(D) * col("__numB").cast(D))).as(s"__sab$sfx"),
      sum(when(col("__y") === yv, 1L).otherwise(0L)).as(s"__n$sfx"))
    val aggs = mom(1, "P") ++ mom(0, "N")
    val agg = joined.agg(aggs.head, aggs.tail: _*)
    val mD = col("__nP").cast("double")
    val nD = col("__nN").cast("double")
    def dnum(sfx: String) =
      (col(s"__n$sfx").cast(D) *
        (col(s"__saa$sfx") + col(s"__sbb$sfx") -
          lit(2).cast(D) * col(s"__sab$sfx")) -
        (col(s"__sa$sfx").cast(D) - col(s"__sb$sfx").cast(D)) *
          (col(s"__sa$sfx").cast(D) - col(s"__sb$sfx").cast(D)))
    val varD =
      when(col("__nP") >= 2 && col("__nN") >= 2,
        dnum("P").cast("double") /
          (lit(4.0) * nD * nD * mD * mD * (mD - lit(1.0))) +
          dnum("N").cast("double") /
            (lit(4.0) * mD * mD * nD * nD * (nD - lit(1.0))))
    val aucA = col("__saP").cast("double") / (lit(2.0) * mD * nD)
    val aucB = col("__sbP").cast("double") / (lit(2.0) * mD * nD)
    // fail-loud guard (the confusionSuite/fairnessReport discipline):
    // a NULL score never matches the score-equality join back and a
    // NULL label/id silently leaves the moment sums, while a duplicate
    // id would fan out the pa-pb join and inflate them — both ride the
    // final job as a broadcast 1-row aggregate, prune-proof via n_pos.
    val guard = base.agg(
      sum(when(col("__id").isNull || col("__sa").isNull ||
        col("__sb").isNull || col("__y").isNull, 1L).otherwise(0L))
        .as("__n_bad"),
      (count(lit(1)) - countDistinct(col("__id"))).as("__n_dup"))
    agg.crossJoin(broadcast(guard)).select(
      when(col("__n_bad") > 0,
        raise_error(concat(lit("deLongTest: NULL id/score/label rows: "),
          col("__n_bad"))))
        .otherwise(when(col("__n_dup") > 0,
          raise_error(concat(lit("deLongTest: duplicate ids: "),
            col("__n_dup"))))
          .otherwise(col("__nP"))).as("n_pos"),
      col("__nN").as("n_neg"),
      aucA.as("auc_a"), aucB.as("auc_b"),
      (aucA - aucB).as("delta_auc"), varD.as("var_delta"),
      when(varD > 0, (aucA - aucB) / sqrt(varD)).as("z"))
  }

  /** F72: PURGED K-FOLD TIME-SERIES CV WITH EMBARGO (López de Prado
    * 2018, "Advances in Financial Machine Learning" ch. 7 — public
    * knowledge): [[rollingOriginFolds]] walks forward; this is the
    * k-fold variant that lets every block serve as a test set while
    * still refusing leakage. The span [min day, max day] is tiled
    * into `folds` contiguous blocks; for fold i a row is
    *   - `test`    when its day lies in block i;
    *   - `purged`  when it precedes the block but its LABEL window
    *               (day .. day + horizonDays) overlaps it — its
    *               target was realized inside the test block, so
    *               training on it leaks the test outcome;
    *   - `embargo` when it lies in the `embargoDays` immediately
    *               after the block — serial correlation lets
    *               just-after rows carry test information backward;
    *   - `train`   otherwise.
    *
    * Deterministic: block edges are pure integer date arithmetic from
    * the broadcast 1-row bounds (edge_i = mn + floor(i·span/k) days,
    * so blocks tile exactly and re-runs reproduce); every role is an
    * exact date comparison — no RNG, no state. Fails loud when the
    * span has fewer days than `folds`. Scale: a ×folds fan-out of
    * (id, day) only, one broadcast of the bounds — the E32 shape.
    * Output: one row per (row, fold) — (id, day, fold, role). */
  def purgedTimeSeriesFolds(df: DataFrame,
      idCol: org.apache.spark.sql.Column,
      tsCol: org.apache.spark.sql.Column, folds: Int,
      horizonDays: Int, embargoDays: Int): DataFrame = {
    require(folds >= 2, s"folds must be >= 2, got $folds")
    require(horizonDays >= 0, s"horizonDays must be >= 0, got $horizonDays")
    require(embargoDays >= 0, s"embargoDays must be >= 0, got $embargoDays")
    val days = df.select(idCol.as("id"), tsCol.cast("date").as("day"))
    val bounds = days.agg(min(col("day")).as("__mn"),
      max(col("day")).as("__mx"))
    val spine = days.sparkSession.range(1, folds + 1)
      .select(col("id").cast("int").as("fold"))
    val withBounds = days.crossJoin(broadcast(bounds))
      .crossJoin(broadcast(spine))
      .withColumn("__span",
        (datediff(col("__mx"), col("__mn")) + 1).cast("long"))
    val guarded = withBounds.withColumn("__span",
      when(col("__span") < folds,
        raise_error(concat(lit("purgedTimeSeriesFolds: span of "),
          col("__span"), lit(s" days cannot fit $folds folds"))))
        .otherwise(col("__span")))
    // block i covers [mn + floor((i-1)*span/k), mn + floor(i*span/k))
    val start = date_add(col("__mn"),
      (((col("fold") - 1).cast("long") * col("__span")) / folds)
        .cast("int"))
    val end = date_add(col("__mn"),
      ((col("fold").cast("long") * col("__span")) / folds).cast("int"))
    guarded
      .withColumn("__bs", start).withColumn("__be", end)
      .withColumn("role",
        when(col("day") >= col("__bs") && col("day") < col("__be"),
          lit("test"))
          .when(col("day") < col("__bs") &&
            date_add(col("day"), horizonDays) >= col("__bs"),
            lit("purged"))
          .when(col("day") >= col("__be") &&
            col("day") < date_add(col("__be"), embargoDays),
            lit("embargo"))
          .otherwise(lit("train")))
      .select(col("id"), col("day"), col("fold"), col("role"))
  }

  /** F37: ISOTONIC CALIBRATION (pool-adjacent-violators fit) over
    * score buckets — the non-parametric monotone score→probability
    * map (Zadrozny & Elkan 2002; Robertson et al. 1988). PAV is
    * sequential, which doesn't distribute; instead we compute the
    * SAME fit from its closed-form minimax characterization
    * (Robertson–Wright–Dykstra Thm 1.4.4):
    * `fitted_i = max_{k≤i} min_{j≥i} mean(y[k..j])` — pure joins and
    * min/max aggregates, no ordered scan anywhere.
    *
    * Determinism: bucket counts and positive sums are exact BIGINTs;
    * every interval mean is ONE division of integer diffs (exact
    * rational → the same double on every engine); min/max over
    * identical doubles are order-free. No quantization needed.
    *
    * 100 TB: ONE map-side-combined pass buckets the data (equal-width
    * bins from a broadcast min/max — same scheme as
    * [[calibrationCurve]]); everything after runs on the ≤ nBuckets
    * bucket table (interval/minimax joins are ≤ B³ rows, B capped at
    * 100 by contract — the data relation is never touched again).
    * Output: (bucket, n, pos, rate, fitted), fitted non-decreasing in
    * bucket. */
  def isotonicCalibration(df: DataFrame,
      scoreCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column,
      nBuckets: Int = 20): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= 100,
      s"nBuckets must be in [1, 100], got $nBuckets")
    val rows = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"))
    val stats = rows.agg(min(col("__s")).as("__mn"),
      max(col("__s")).as("__mx"))
    val g = rows.crossJoin(broadcast(stats))
      .withColumn("__step", (col("__mx") - col("__mn")) / nBuckets)
      .withColumn("bucket",
        when(col("__step") === 0, lit(0L)).otherwise(
          least(floor((col("__s") - col("__mn")) / col("__step")),
            lit(nBuckets - 1L))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__y").cast("long")).as("pos"))
    val ivals = g.select(col("bucket").as("__k"))
      .join(broadcast(g.select(col("bucket").as("__j"))),
        col("__k") <= col("__j"))
      .join(broadcast(g.select(col("bucket").as("__b"),
        col("n").as("__n"), col("pos").as("__p"))),
        col("__b") >= col("__k") && col("__b") <= col("__j"))
      .groupBy(col("__k"), col("__j"))
      .agg(sum(col("__n")).as("__in"), sum(col("__p")).as("__ip"))
      .withColumn("__mean",
        col("__ip").cast("double") / col("__in").cast("double"))
    val fitted = g.select(col("bucket").as("__i"))
      .join(broadcast(ivals),
        col("__k") <= col("__i") && col("__j") >= col("__i"))
      .groupBy(col("__i"), col("__k")).agg(min(col("__mean")).as("__lo"))
      .groupBy(col("__i")).agg(max(col("__lo")).as("fitted"))
    g.join(broadcast(fitted), col("bucket") === col("__i"))
      .select(col("bucket"), col("n"), col("pos"),
        (col("pos").cast("double") / col("n").cast("double")).as("rate"),
        col("fitted"))
  }

  /** F36: CONFUSION-MATRIX SUITE — the full binary-classification
    * scorecard in ONE aggregate pass: exact BIGINT tp/fp/tn/fn plus
    * accuracy, precision, recall, specificity, F1 (as the single
    * division `2tp/(2tp+fp+fn)` — never the p·r composition, whose
    * intermediate rounding differs cross-engine), Matthews correlation
    * (Matthews 1975) and Cohen's κ (Cohen 1960, chance-corrected
    * agreement via the marginal products).
    *
    * Determinism: every ratio divides once from exact integer counts;
    * MCC factors are cast to double BEFORE multiplying — the BIGINT
    * product `(tp+fp)(tp+fn)(tn+fp)(tn+fn)` overflows at ~50k rows,
    * long before 100 TB; κ's pe uses the same double-first products
    * over n². Zero-denominator cases (one-class predictions or
    * labels) emit NULL, never a division error. All doubles
    * quantized-6. NULL preds/labels are rejected loudly — silently
    * dropping them would misreport accuracy.
    *
    * 100 TB: one map-side-combined aggregate; nothing shuffles but
    * four partial counters per partition. Output: 1 row. */
  def confusionSuite(df: DataFrame,
      predCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val p = predCol.cast("int")
    val y = labelCol.cast("int")
    confusionFromCounts(df.agg(
      coalesce(sum(when(p === 1 && y === 1, 1L)), lit(0L)).as("tp"),
      coalesce(sum(when(p === 1 && y === 0, 1L)), lit(0L)).as("fp"),
      coalesce(sum(when(p === 0 && y === 0, 1L)), lit(0L)).as("tn"),
      coalesce(sum(when(p === 0 && y === 1, 1L)), lit(0L)).as("fn"),
      coalesce(sum(when(p.isNull || y.isNull, 1L)), lit(0L))
        .as("__n_null")))
  }

  /** The [[confusionSuite]] derivation over an already-counted 1-row
    * (tp, fp, tn, fn, __n_null) table. The four counters are exact and
    * mergeable — the streaming monitor sums per-batch count rows and
    * publishes the identical scorecard. */
  def confusionFromCounts(agg: DataFrame): DataFrame = {
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val tn = col("tn").cast("double"); val fn = col("fn").cast("double")
    val n = tp + fp + tn + fn
    val mccDen = sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    val po = (tp + tn) / n
    val pe = ((tp + fp) * (tp + fn) + (tn + fn) * (tn + fp)) / (n * n)
    import graft.functions.q6
    agg.select(
      // prune-proof NULL guard: the error lives inside a kept column
      when(col("__n_null") > 0,
        raise_error(concat(lit("confusionSuite: NULL pred/label rows: "),
          col("__n_null")))).otherwise(col("tp")).as("tp"),
      col("fp"), col("tn"), col("fn"),
      q6((tp + tn) / n).as("accuracy"),
      q6(when(col("tp") + col("fp") > 0, tp / (tp + fp))).as("precision"),
      q6(when(col("tp") + col("fn") > 0, tp / (tp + fn))).as("recall"),
      q6(when(col("tn") + col("fp") > 0, tn / (tn + fp)))
        .as("specificity"),
      q6(when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
        (lit(2.0) * tp) / (lit(2.0) * tp + fp + fn))).as("f1"),
      q6(when(col("tp") + col("fp") > 0 && col("tp") + col("fn") > 0 &&
          col("tn") + col("fp") > 0 && col("tn") + col("fn") > 0,
        (tp * tn - fp * fn) / mccDen)).as("mcc"),
      q6(when(abs(lit(1.0) - pe) > 0, (po - pe) / (lit(1.0) - pe)))
        .as("kappa"))
  }

  /** F67: PER-GROUP ROC AUC — the segment-wise discrimination audit
    * ("the score separates classes overall, but does it still separate
    * them inside every language / source / market?") that catches
    * Simpson-style reversals a single pooled AUC hides. Same exact
    * Mann–Whitney rank-sum arithmetic as [[rocAuc]]: per (group,
    * distinct score) class counts, average-rank tie handling, doubled
    * integral numerator, one correctly-rounded final division —
    * bit-identical cross-engine, no rounding anywhere.
    *
    * Plan shape: the rank cumulation is a window PARTITIONED BY GROUP
    * over the (group, distinct-score) aggregate — parallel across
    * groups and spill-safe within one, the canonical grouped-rank
    * form (a single pathological group with ~1e9 distinct scores is
    * the global case — [[rocAuc]]'s two-phase Ranks path covers it).
    * Output: one row per group — (group, n_pos, n_neg, auc); auc NULL
    * where a class is empty in that group. */
  def groupedAuc(df: DataFrame, groupCol: String,
      scoreCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val grouped = df
      .select(col(groupCol).as("__g"), scoreCol.cast("double").as("__s"),
        labelCol.cast("int").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__g"), col("__s"))
      .agg(sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__np"),
        sum(when(col("__y") =!= 1, 1L).otherwise(0L)).as("__nn"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = grouped
      .withColumn("__cum", sum(col("__np") + col("__nn")).over(w))
    val agg = ranked.groupBy(col("__g"))
      .agg(sum(col("__np")).as("__tp"), sum(col("__nn")).as("__tn"),
        // DECIMAL(38,0) rank-sum numerator — same overflow-proofing as
        // rocAuc (LONG dies near n ≈ 3e9 rows per group)
        sum(col("__np").cast("decimal(19,0)") *
          (lit(2L) * (col("__cum") - col("__np") - col("__nn")) +
            col("__np") + col("__nn") + lit(1L)).cast("decimal(19,0)"))
          .as("__num"))
    agg.select(col("__g").as(groupCol),
      col("__tp").as("n_pos"), col("__tn").as("n_neg"),
      when(col("__tp") > 0 && col("__tn") > 0,
        (col("__num").cast("double") -
          col("__tp").cast("double") * (col("__tp").cast("double") + 1.0)) /
          (lit(2.0) * col("__tp").cast("double") *
            col("__tn").cast("double"))).as("auc"))
  }

  /** F68: GROUP FAIRNESS REPORT — per-segment selection / error-rate
    * disparities of a binary decision (public knowledge: demographic
    * parity, disparate-impact ratio per the four-fifths rule, and the
    * equalized-odds TPR/FPR gaps of Hardt et al. 2016). For a
    * keep/drop curation filter this is "does the filter throw away one
    * source or language disproportionately, and is its error rate
    * higher there" — the audit regulators and data cards both ask for.
    *
    * Exactness: per-group confusion cells are exact BIGINT counts in
    * ONE map-side-combined aggregate; overall rates ride a broadcast
    * 1-row total and the max selection rate a group-count-bounded
    * aggregate; every published rate/gap is a single IEEE division
    * quantized-6 (ratios of counts are the engine-`round` divergence
    * class — [[graft.functions.quantize]] scaladoc). NULL pred/label
    * rows FAIL LOUD (silently dropping them would fake parity).
    *
    * Output: one row per group — (group, n, n_pos_label, sel_rate,
    * base_rate, tpr, fpr, parity_gap = sel − overall sel,
    * di_ratio = sel / max group sel, tpr_gap, fpr_gap vs overall). */
  def fairnessReport(df: DataFrame, groupCol: String,
      predCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame =
    fairnessFromCells(fairnessCells(df, groupCol, predCol, labelCol))

  /** The exact per-group confusion cells [[fairnessReport]] derives
    * from — (group, n, __sel, __pos, __tp, __fp, __n_null). All
    * counters are plain sums, hence MERGEABLE: a cell table summed
    * from per-batch cell tables equals the cells of the union, which
    * is what lets the streaming fairness monitor publish the identical
    * report (spec-proven). */
  private[graft] def fairnessCells(df: DataFrame, groupCol: String,
      predCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val p = predCol.cast("int"); val y = labelCol.cast("int")
    df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(p === 1, 1L)), lit(0L)).as("__sel"),
        coalesce(sum(when(y === 1, 1L)), lit(0L)).as("__pos"),
        coalesce(sum(when(p === 1 && y === 1, 1L)), lit(0L)).as("__tp"),
        coalesce(sum(when(p === 1 && y === 0, 1L)), lit(0L)).as("__fp"),
        coalesce(sum(when(p.isNull || y.isNull, 1L)), lit(0L))
          .as("__n_null"))
  }

  /** The [[fairnessReport]] derivation over an already-counted cell
    * table — shared verbatim by the batch operator and the streaming
    * monitor view. */
  private[graft] def fairnessFromCells(cells: DataFrame): DataFrame = {
    import graft.functions.q6
    val tot = cells.agg(sum(col("n")).as("__tot_n"),
      sum(col("__sel")).as("__tot_sel"), sum(col("__pos")).as("__tot_pos"),
      sum(col("__tp")).as("__tot_tp"), sum(col("__fp")).as("__tot_fp"),
      max(when(col("n") > 0,
        col("__sel").cast("double") / col("n").cast("double")))
        .as("__maxSel"))
    val selR = col("__sel").cast("double") / col("n").cast("double")
    val ovSel = col("__tot_sel").cast("double") /
      col("__tot_n").cast("double")
    val ovTpr = when(col("__tot_pos") > 0,
      col("__tot_tp").cast("double") / col("__tot_pos").cast("double"))
    val ovFpr = when(col("__tot_n") - col("__tot_pos") > 0,
      col("__tot_fp").cast("double") /
        (col("__tot_n") - col("__tot_pos")).cast("double"))
    cells.crossJoin(broadcast(tot)).select(
      // prune-proof NULL guard (the confusionSuite discipline)
      when(col("__n_null") > 0,
        raise_error(concat(lit("fairnessReport: NULL pred/label rows: "),
          col("__n_null")))).otherwise(col("group")).as("group"),
      col("n"), col("__pos").as("n_pos_label"),
      q6(selR).as("sel_rate"),
      q6(col("__pos").cast("double") / col("n").cast("double"))
        .as("base_rate"),
      q6(when(col("__pos") > 0,
        col("__tp").cast("double") / col("__pos").cast("double")))
        .as("tpr"),
      q6(when(col("n") - col("__pos") > 0,
        col("__fp").cast("double") /
          (col("n") - col("__pos")).cast("double"))).as("fpr"),
      q6(selR - ovSel).as("parity_gap"),
      q6(when(col("__maxSel") > 0, selR / col("__maxSel")))
        .as("di_ratio"),
      q6(when(col("__pos") > 0 && ovTpr.isNotNull,
        col("__tp").cast("double") / col("__pos").cast("double") -
          ovTpr)).as("tpr_gap"),
      q6(when(col("n") - col("__pos") > 0 && ovFpr.isNotNull,
        col("__fp").cast("double") /
          (col("n") - col("__pos")).cast("double") - ovFpr))
        .as("fpr_gap"))
  }

  /** F69: SPLIT-CONFORMAL THRESHOLD TABLE — the distribution-free
    * coverage guarantee (Vovk et al. 2005; Lei et al. 2018): given a
    * calibration set of nonconformity scores, the cutoff
    * `q = score_(⌈(n+1)(1−α)⌉)` (k-th smallest, 1-based) guarantees
    * P(new score ≤ q) ≥ 1−α exchangeably — the principled way to turn
    * any scorer into a "flag the weirdest α of traffic" monitor.
    *
    * Exact integer order statistics: distinct-score counts cumulate
    * through the two-phase prefix sum (no global-order window at any
    * score cardinality); each α's k-th value is the min score whose
    * cumulative count reaches k, found by a broadcast grid ⋈ cum-table
    * range probe (grid is |alphas| rows). k > n (α too small for n)
    * yields a NULL threshold — "no finite cutoff guarantees that
    * coverage", reported, not invented. Empirical coverage is the
    * exact cum/n at the chosen row. The k = ⌈(n+1)(1−α)⌉ ceil runs the
    * same IEEE mult both engines, never a round() builtin.
    *
    * Output: one row per α — (alpha, n, k, threshold, emp_coverage). */
  def conformalThresholds(spark: SparkSession, df: DataFrame,
      scoreCol: org.apache.spark.sql.Column,
      alphas: Seq[Double] = Seq(0.01, 0.05, 0.1, 0.2)): DataFrame = {
    val counts = df.select(scoreCol.cast("double").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    conformalFromCounts(spark, counts, alphas)
  }

  /** The [[conformalThresholds]] order-statistic derivation over an
    * already-counted distinct-score table (__s, __c) — the counts are
    * plain sums, hence MERGEABLE: per-batch count tables summed by
    * score equal the counts of the union, which is what lets the
    * streaming conformal monitor publish the identical threshold table
    * (spec-proven). */
  private[graft] def conformalFromCounts(spark: SparkSession,
      counts: DataFrame, alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty && alphas.forall(a => a > 0 && a < 1),
      s"alphas must sit in (0,1), got $alphas")
    import spark.implicits._
    val (cum, totals) = graft.relational.Ranks.prefixSumsWithTotals(
      counts, Seq(col("__s")), Seq("__cum" -> col("__c")))
    val n = totals.head
    val grid = alphas.toDF("alpha")
      .withColumn("n", lit(n))
      .withColumn("k",
        ceil((lit(n) + lit(1.0)) * (lit(1.0) - col("alpha")))
          .cast("long"))
    // broadcast |alphas|-row grid against the cum table: each distinct
    // score row is probed by a handful of cutoffs, linear in scores
    val hit = broadcast(grid).join(cum, col("__cum") >= col("k"))
      .groupBy(col("alpha"), col("n"), col("k"))
      .agg(min(struct(col("__s"), col("__cum"))).as("__best"))
      .select(col("alpha"), col("n"), col("k"),
        col("__best.__s").as("threshold"),
        graft.functions.q6(col("__best.__cum").cast("double") /
          col("n").cast("double")).as("emp_coverage"))
    broadcast(grid).join(hit, Seq("alpha", "n", "k"), "left")
      .select(col("alpha"), col("n"), col("k"),
        when(col("k") <= col("n"), col("threshold")).as("threshold"),
        when(col("k") <= col("n"), col("emp_coverage"))
          .as("emp_coverage"))
  }

  /** F71: GROUP-CONDITIONAL CONFORMAL THRESHOLDS — the fairness-aware
    * refinement of [[conformalThresholds]] (Vovk's "Mondrian"
    * conformal, 2005): one marginal cutoff over a mixed population can
    * cover one segment at 99% and another at 80%; calibrating
    * per-group restores the 1−α guarantee INSIDE every group, at the
    * price of each group needing its own calibration mass (small
    * groups surface as NULL thresholds — reported, not papered over).
    *
    * Same exact integer order statistics, grouped: per-(group,
    * distinct score) counts, a GROUP-PARTITIONED cumulation window
    * (parallel across groups — the [[groupedAuc]] shape), per-group n,
    * and a (group × α) grid probed by a cum ≥ k range join keyed on
    * the group. Output: (group, alpha, n, k, threshold, emp_coverage)
    * — one row per group per α. */
  def groupedConformalThresholds(df: DataFrame, groupCol: String,
      scoreCol: org.apache.spark.sql.Column,
      alphas: Seq[Double] = Seq(0.01, 0.05, 0.1, 0.2)): DataFrame = {
    require(alphas.nonEmpty && alphas.forall(a => a > 0 && a < 1),
      s"alphas must sit in (0,1), got $alphas")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(col(groupCol).as("group"), scoreCol.cast("double").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col("group"), col("__s")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("group")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graft.util.Caches.persistTracked(
      counts.withColumn("__cum", sum(col("__c")).over(w)))
    val perGroup = cum.groupBy(col("group"))
      .agg(sum(col("__c")).as("n"))
    val grid = perGroup.crossJoin(broadcast(alphas.toDF("alpha")))
      .withColumn("k",
        ceil((col("n").cast("double") + lit(1.0)) *
          (lit(1.0) - col("alpha"))).cast("long"))
    // the cum side re-aliased: grid descends from cum, so a direct
    // two-sided column reference would be ambiguous self-lineage
    val probe = cum.select(col("group").as("__g2"), col("__s"),
      col("__cum"))
    val hit = grid.join(probe,
        col("group") === col("__g2") && col("__cum") >= col("k"))
      .groupBy(col("group"), col("alpha"), col("n"), col("k"))
      .agg(min(struct(col("__s"), col("__cum"))).as("__best"))
      .select(col("group"), col("alpha"), col("n"), col("k"),
        col("__best.__s").as("threshold"),
        graft.functions.q6(col("__best.__cum").cast("double") /
          col("n").cast("double")).as("emp_coverage"))
    grid.join(hit, Seq("group", "alpha", "n", "k"), "left")
      .select(col("group"), col("alpha"), col("n"), col("k"),
        when(col("k") <= col("n"), col("threshold")).as("threshold"),
        when(col("k") <= col("n"), col("emp_coverage"))
          .as("emp_coverage"))
  }
}
