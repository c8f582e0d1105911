package graft.ml

import graft.text.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive-Bayes text classification — the fastText-shaped
  * model CCNet-style pipelines use for language ID and quality
  * filtering (train on a trusted slice, score the open crawl, keep the
  * confident rows). Public-knowledge algorithm (McCallum & Nigam 1998);
  * the reference has no trainable classifier — this is north-star
  * surface next to the XGBoost-JSON scorer (`ml/Scoring.scala`).
  *
  * The model is NOT a driver-side object: it is two DataFrames (per-class
  * priors + per-(class, token) counts) consulted by key-partitioned
  * joins, so a vocabulary of hundreds of millions of tokens never has to
  * fit anywhere. Tokenization is the corpus-wide whitespace convention
  * ([[graft.text.Dedup.words]]) shared with the LM-perplexity and dedup
  * operators, so one tokenized pass can feed all of them.
  */
object TextClassifier {

  /** Trained model: `priors` is one row per class
    * `(label, log_prior, tok_total)` — broadcastable, classes are few;
    * `tokenCounts` is `(label, tok, cnt)` — token-partitioned, arbitrary
    * size; `vocab` is the single-row distinct-token count used by
    * add-alpha smoothing (kept as a DataFrame so nothing is collected). */
  final case class NbModel(priors: DataFrame, tokenCounts: DataFrame,
      vocab: DataFrame)

  /** Train add-alpha multinomial NB: one explode over the training slice,
    * two map-side-combined aggregates (per-(class, token) and per-class),
    * one tiny per-class doc count for the priors. At 100 TB the only
    * shuffles are hash-partitioned aggregates; nothing returns to the
    * driver. */
  def train(corpus: DataFrame, textCol: String, labelCol: String)
      : NbModel = {
    val toks = corpus.select(col(labelCol).as("label"),
      explode(Dedup.words(col(textCol))).as("tok"))
    val tokenCounts = toks.groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val totals = toks.groupBy(col("label"))
      .agg(count(lit(1)).as("tok_total"))
    val docTotal = corpus.agg(count(lit(1)).as("__n"))
    val priors = corpus.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("__nc"))
      .crossJoin(broadcast(docTotal))
      .select(col("label"), log(col("__nc") / col("__n")).as("log_prior"))
      .join(totals, "label")
    val vocab = toks.select(col("tok")).distinct()
      .agg(count(lit(1)).as("__v"))
    NbModel(priors, tokenCounts, vocab)
  }

  /** Score a corpus: per-document log-posterior under every class, the
    * argmax prediction, and the margin over the runner-up (the
    * confidence signal quality filters threshold on).
    *
    * Plan shape: documents explode to (doc, tok, n_t) — aggregated
    * BEFORE the model join so the join fans out per distinct token, not
    * per occurrence — then cross the (few, broadcast) classes, left-join
    * the token-partitioned counts (absent (class, token) pairs fall back
    * to the alpha floor), and one (doc, class)-keyed aggregate. The only
    * per-document sort is the C-row argmax window. Log-posteriors are
    * rounded to 3 decimals (double sums are order-sensitive at ~1e-12;
    * class gaps are O(1)).
    *
    * Output: (doc_id, label, log_prob, margin) — one row per document,
    * `label` the predicted class. */
  /** Per-(doc, class) log-posterior table — the pre-argmax state
    * [[score]] ranks and [[brierLogLoss]] normalizes. */
  /** The (doc_id, tok, __nt) distinct-token counts a scoring pass
    * consumes — factored out so the fold composites (X103/X112/F19)
    * can tokenize the corpus ONCE and slice the cached result per
    * fold instead of re-exploding the corpus per branch. */
  private[ml] def docTokenCounts(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpus.select(col(idCol).as("doc_id"),
      explode(Dedup.words(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("__nt"))

  private[ml] def scoreAll(model: NbModel, corpus: DataFrame,
      idCol: String, textCol: String, alpha: Double): DataFrame =
    scoreAllDt(model, docTokenCounts(corpus, idCol, textCol), alpha)

  /** [[scoreAll]] over an already-built [[docTokenCounts]] table. */
  private[ml] def scoreAllDt(model: NbModel, docToks: DataFrame,
      alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    docToks
      .crossJoin(broadcast(model.priors))
      .join(model.tokenCounts, Seq("label", "tok"), "left")
      .crossJoin(broadcast(model.vocab))
      .withColumn("__ll", col("__nt") *
        log((coalesce(col("cnt"), lit(0L)) + alpha) /
          (col("tok_total") + col("__v") * alpha)))
      .groupBy(col("doc_id"), col("label"), col("log_prior"))
      .agg(sum(col("__ll")).as("__sll"))
      .select(col("doc_id"), col("label"),
        (col("log_prior") + col("__sll")).as("__logp"))
  }

  def score(model: NbModel, corpus: DataFrame, idCol: String,
      textCol: String, alpha: Double = 1.0): DataFrame =
    scoreDt(model, docTokenCounts(corpus, idCol, textCol), alpha)

  /** [[score]] over an already-built [[docTokenCounts]] table. */
  private[ml] def scoreDt(model: NbModel, docToks: DataFrame,
      alpha: Double): DataFrame = {
    val scored = scoreAllDt(model, docToks, alpha)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("__logp").desc, col("label"))
    scored
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next", lead(col("__logp"), 1).over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("label"),
        round(col("__logp"), 3).as("log_prob"),
        round(col("__logp") - col("__next"), 3).as("margin"))
  }

  /** Per-(slice, label, token) occurrence counts + per-(slice, label)
    * doc counts over `corpus` — the shared sufficient statistics every
    * fold/slice model of the X103/X112/F19 composites aggregates from.
    * Deliberately UNPERSISTED: Catalyst pushes each fold's slice filter
    * below the aggregate to the scan, so a fold tokenizes only its own
    * training slices and the three per-model consumers (token counts /
    * totals / vocabulary) dedupe onto ONE exchange per fold via
    * ReuseExchange — where the old per-fold `train()` re-exploded the
    * corpus once per consumer (~5 passes per fold). Persist variants
    * (cnts+dc, or all three shared tables) measured 20–150% SLOWER at
    * sf0.1: the materialization barrier serializes the fold branches
    * that otherwise run as one fully parallel DAG. `sliceOf` must be a
    * deterministic integer column expression (fold id, slot id). */
  private def sliceStats(corpus: DataFrame, textCol: String,
      labelCol: String, sliceOf: Column): (DataFrame, DataFrame) = {
    val cnts = corpus.select(sliceOf.as("__f"),
        col(labelCol).as("label"),
        explode(Dedup.words(col(textCol))).as("tok"))
      .groupBy(col("__f"), col("label"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val dc = corpus.groupBy(sliceOf.as("__f"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("__nc"))
    (cnts, dc)
  }

  /** The [[train]] model of the sub-corpus whose slices satisfy `keep`,
    * derived from [[sliceStats]] tables by exact integer aggregation —
    * token counts, totals, doc counts and the distinct-vocabulary size
    * are sums/counts of disjoint slice partitions, so every model
    * statistic (and the doubles computed from them) is identical to
    * training on the filtered corpus directly; the corpus itself is
    * never re-read. */
  private def modelFromSlices(cnts: DataFrame, dc: DataFrame,
      keep: Column): NbModel = {
    val kc = cnts.filter(keep)
    val tokenCounts = kc.groupBy(col("label"), col("tok"))
      .agg(sum(col("cnt")).as("cnt"))
    val totals = kc.groupBy(col("label"))
      .agg(sum(col("cnt")).as("tok_total"))
    val kd = dc.filter(keep)
    val docTotal = kd.agg(sum(col("__nc")).as("__n"))
    val priors = kd.groupBy(col("label"))
      .agg(sum(col("__nc")).as("__nc"))
      .crossJoin(broadcast(docTotal))
      .select(col("label"), log(col("__nc") / col("__n")).as("log_prior"))
      .join(totals, "label")
    val vocab = kc.select(col("tok")).distinct()
      .agg(count(lit(1)).as("__v"))
    NbModel(priors, tokenCounts, vocab)
  }

  /** X103: K-FOLD CROSS-VALIDATION of the NB classifier — the honest
    * generalization estimate (a single train/test split's accuracy has
    * split-lottery variance; k folds use every document exactly once as
    * a test item). Folds assign by `id mod k` — deterministic and
    * engine-reproducible, never `rand()`. Each fold trains on the other
    * k−1 folds and scores its own; per-fold accuracy and mean margin
    * come back in one k-row frame.
    *
    * Plan shape: the k fold pipelines are INDEPENDENT branches of one
    * DAG (k count-aggregate model builds + k scoring joins — all
    * partial-aggregated, nothing collected); at 100 TB each branch
    * scans the corpus once, so the whole CV costs k× one training pass,
    * the textbook lower bound. Output: (fold, n_docs, n_correct,
    * accuracy, mean_margin). */
  def crossValidate(corpus: DataFrame, idCol: String, textCol: String,
      labelCol: String, folds: Int, alpha: Double = 1.0): DataFrame = {
    require(folds >= 2, s"folds must be >= 2, got $folds")
    // each fold's model aggregates the SHARED slice statistics (one
    // tokenize+shuffle per fold, reused by its token-count/total/vocab
    // consumers — see [[sliceStats]]) instead of re-training from the
    // raw corpus ~5 scans at a time; every statistic is an exact
    // integer aggregate of disjoint slices, bit-identical to per-fold
    // training. Scoring slices one shared doc-token table per fold.
    val (cnts, dc) = sliceStats(corpus, textCol, labelCol,
      pmod(col(idCol), lit(folds.toLong)))
    val dtAll = docTokenCounts(corpus, idCol, textCol)
    val perFold = (0 until folds).map { f =>
      val model = modelFromSlices(cnts, dc, col("__f") =!= f)
      scoreDt(model,
        dtAll.filter(pmod(col("doc_id"), lit(folds.toLong)) === f), alpha)
        .join(corpus.select(col(idCol).as("doc_id"),
          col(labelCol).as("__true")), "doc_id")
        .select(lit(f).as("fold"),
          (col("label") === col("__true")).cast("long").as("__ok"),
          col("margin"))
    }.reduce(_ unionByName _)
    perFold.groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ok")).as("n_correct"),
        (sum(col("__ok")).cast("double") / count(lit(1))).as("accuracy"),
        // margins are round-3 values, i.e. exact thousandths after a
        // decimal(18,3) cast — DECIMAL-sum them (exact, order-free) and
        // divide once, then quantize (engine round() builtins diverge on
        // half-boundary rationals like this sum/n — see functions.quantize)
        graft.functions.quantize(
          sum(col("margin").cast("decimal(18,3)")).cast("double") /
            count(lit(1)).cast("double"), 4).as("mean_margin"))
  }

  /** F19: LEARNING CURVE — held-out accuracy as a function of training
    * volume, the sample-efficiency report that answers "is more labeled
    * data still buying accuracy?" before anyone pays for labels.
    * Training subsets are NESTED deterministic slices of the train pool
    * (`(id div 2) mod totalSlots < k` — slice k=2 contains slice k=1,
    * so the curve is monotone in DATA, never re-shuffled), each
    * evaluated against the SAME held-out split; never `rand()`.
    *
    * Plan: one independent train+score branch per requested slice (all
    * count aggregates, nothing collected) — the X103 CV shape with
    * growing slices instead of rotating folds. Output: (train_slots,
    * n_train, n_test, n_correct, accuracy). */
  def learningCurve(corpus: DataFrame, idCol: String, textCol: String,
      labelCol: String, slots: Seq[Int] = Seq(1, 2, 4, 8),
      totalSlots: Int = 8, alpha: Double = 1.0): DataFrame = {
    require(slots.nonEmpty && slots.forall(s => s >= 1 && s <= totalSlots),
      s"slots must be in [1, $totalSlots]: $slots")
    val pool = corpus.filter(pmod(col(idCol), lit(2L)) === 0)
    val test = corpus.filter(pmod(col(idCol), lit(2L)) === 1)
    // every curve point's model aggregates the shared slot statistics
    // (slices are nested — slot < k — so each point sums exactly its
    // slots; one tokenize+shuffle per point, its three model consumers
    // deduped by ReuseExchange), and the SHARED held-out split's
    // doc-token table is one identical subtree across all points —
    // ReuseExchange collapses the old once-per-point test re-explode.
    val (cnts, dc) = sliceStats(pool, textCol, labelCol,
      pmod(expr(s"$idCol div 2"), lit(totalSlots.toLong)))
    val dtTest = docTokenCounts(test, idCol, textCol)
    slots.map { k =>
      val model = modelFromSlices(cnts, dc, col("__f") < k)
      // coalesce: sum over an empty training slice is NULL where the
      // old count() said 0 — pin the 0
      val nTrain = dc.filter(col("__f") < k)
        .agg(coalesce(sum(col("__nc")), lit(0L)).as("n_train"))
      scoreDt(model, dtTest, alpha)
        .join(corpus.select(col(idCol).as("doc_id"),
          col(labelCol).as("__true")), "doc_id")
        .agg(count(lit(1)).as("n_test"),
          sum((col("label") === col("__true")).cast("long"))
            .as("n_correct"))
        .crossJoin(broadcast(nTrain))
        .select(lit(k).as("train_slots"), col("n_train"), col("n_test"),
          col("n_correct"),
          (col("n_correct").cast("double") / col("n_test"))
            .as("accuracy"))
    }.reduce(_ unionByName _)
  }

  /** F21: PROPER-SCORING-RULE evaluation — multiclass BRIER score
    * `mean_d Σ_c (p_c − y_c)²` and LOG-LOSS `mean_d −ln p_true` from
    * the softmax-normalized NB posteriors (log-sum-exp with the
    * per-doc max subtracted — the standard overflow-safe form,
    * mirrored expression-for-expression). Accuracy says whether the
    * argmax was right; these say whether the PROBABILITIES are honest
    * — the metrics a threshold picker (X53) and calibrator (F15)
    * should optimize. Docs whose true class is outside the model's
    * class set have no defined p_true and are counted out
    * (`n_unscored`), not given an infinite loss. One |C|-sized window
    * per doc, one aggregate. Output: (n_docs, n_unscored, brier,
    * log_loss), round-6. */
  def brierLogLoss(model: NbModel, corpus: DataFrame, idCol: String,
      textCol: String, labelCol: String, alpha: Double = 1.0)
      : DataFrame = {
    val scored = scoreAll(model, corpus, idCol, textCol, alpha)
    val w = Window.partitionBy(col("doc_id"))
    val probs = scored
      .withColumn("__mx", max(col("__logp")).over(w))
      .withColumn("__e", exp(col("__logp") - col("__mx")))
      .withColumn("__z", sum(col("__e")).over(w))
      .withColumn("__p", col("__e") / col("__z"))
      .join(corpus.select(col(idCol).as("doc_id"),
        col(labelCol).as("__true")), "doc_id")
      .withColumn("__y",
        when(col("label") === col("__true"), 1.0).otherwise(0.0))
    val perDoc = probs.groupBy(col("doc_id"))
      .agg(sum((col("__p") - col("__y")) * (col("__p") - col("__y")))
        .as("__brier"),
        // p_true present iff the true class is in the model's classes
        max(when(col("__y") === 1.0, col("__p"))).as("__ptrue"))
    perDoc.agg(
      count(when(col("__ptrue").isNotNull, 1)).as("n_docs"),
      count(when(col("__ptrue").isNull, 1)).as("n_unscored"),
      round(avg(when(col("__ptrue").isNotNull, col("__brier"))), 6)
        .as("brier"),
      round(avg(-log(col("__ptrue"))), 6).as("log_loss"))
  }

  /** X112: LABEL-NOISE SUSPECTS via cross-validated disagreement (the
    * confident-learning intuition, Northcutt et al. 2021, public
    * knowledge): a document whose OUT-OF-FOLD prediction contradicts
    * its given label with high confidence is a candidate mislabel —
    * the triage list a labeling pipeline re-reviews. Out-of-fold is
    * the load-bearing part: an in-sample model has seen the label it
    * is supposed to audit. Fold mechanics identical to
    * [[crossValidate]] (id mod k, deterministic). Output: (doc_id,
    * given, predicted, margin) for disagreements with margin ≥
    * `minMargin`, strongest first consumers sort by margin. */
  def suspectLabels(corpus: DataFrame, idCol: String, textCol: String,
      labelCol: String, folds: Int, minMargin: Double,
      alpha: Double = 1.0): DataFrame = {
    require(folds >= 2, s"folds must be >= 2, got $folds")
    require(minMargin >= 0, s"minMargin must be >= 0, got $minMargin")
    // same shared-statistics shape as [[crossValidate]] — one tokenized
    // pass for all k out-of-fold models, one doc-token pass for scoring
    val (cnts, dc) = sliceStats(corpus, textCol, labelCol,
      pmod(col(idCol), lit(folds.toLong)))
    val dtAll = docTokenCounts(corpus, idCol, textCol)
    (0 until folds).map { f =>
      val model = modelFromSlices(cnts, dc, col("__f") =!= f)
      scoreDt(model,
        dtAll.filter(pmod(col("doc_id"), lit(folds.toLong)) === f), alpha)
    }.reduce(_ unionByName _)
      .join(corpus.select(col(idCol).as("doc_id"),
        col(labelCol).as("given")), "doc_id")
      .filter(col("label") =!= col("given") &&
        col("margin") >= minMargin)
      .select(col("doc_id"), col("given"), col("label").as("predicted"),
        col("margin"))
  }

  /** F18: per-class evaluation — confusion counts rolled up to
    * precision / recall / F1 per class (the report a quality-filter
    * owner actually reads; accuracy alone hides which class the
    * classifier sacrifices). `predictions` must carry one row per item
    * with a true column and a predicted column. Classes = every label
    * observed on either side; a class never predicted has NULL
    * precision (0/0 is not 0), a class never true has NULL recall, and
    * F1 is NULL unless both parts exist and P+R > 0.
    *
    * One aggregate over the predictions (true, predicted) pairs +
    * class-sized joins — at 100 TB the pair aggregate is the only pass
    * over the data. Exact counts, guarded divisions. Output: (label,
    * n_true, n_pred, tp, precision, recall, f1). */
  def classReport(predictions: DataFrame, trueCol: String,
      predCol: String): DataFrame = {
    val pairs = graft.util.Caches.persistTracked(
      predictions.groupBy(col(trueCol).as("__t"), col(predCol).as("__p"))
        .agg(count(lit(1)).as("__n")))
    val classes = pairs.select(col("__t").as("label"))
      .unionByName(pairs.select(col("__p").as("label"))).distinct()
    val trueCounts = pairs.groupBy(col("__t").as("label"))
      .agg(sum(col("__n")).as("n_true"))
    val predCounts = pairs.groupBy(col("__p").as("label"))
      .agg(sum(col("__n")).as("n_pred"))
    val tp = pairs.filter(col("__t") === col("__p"))
      .select(col("__t").as("label"), col("__n").as("tp"))
    val base = classes
      .join(trueCounts, Seq("label"), "left")
      .join(predCounts, Seq("label"), "left")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
    val p = when(col("n_pred") > 0, col("tp").cast("double") / col("n_pred"))
    val r = when(col("n_true") > 0, col("tp").cast("double") / col("n_true"))
    base.withColumn("precision", p)
      .withColumn("recall", r)
      .withColumn("f1",
        when(p.isNotNull && r.isNotNull && (p + r) > 0,
          lit(2.0) * p * r / (p + r)))
  }
}
