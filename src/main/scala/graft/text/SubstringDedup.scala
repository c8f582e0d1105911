package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X36: EXACT-SUBSTRING cross-document deduplication — the third standard
  * dedup modality of LLM training pipelines (after doc-level exact and
  * near-dup): find token SPANS that occur verbatim in more than one
  * document (licence blocks, boilerplate paragraphs, quoted headers) and
  * report/excise them per document, even when the documents as wholes are
  * unique. Public-knowledge algorithm: Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better" builds a corpus-wide
  * suffix array and extracts substrings of >= 50 tokens appearing twice.
  *
  * A suffix array is a single-machine structure; the DISTRIBUTED
  * re-expression is fixed-length window fingerprinting (the same
  * pigeonhole idea as winnowing): any shared span of >= `windowTokens`
  * tokens necessarily contains shared aligned windows of exactly
  * `windowTokens`, so
  *
  *   1. slide a `windowTokens`-token window over every document (one
  *      `posexplode` — rows = corpus token count, no shuffle),
  *   2. fingerprint each window (md5 of the window text — 128-bit, so
  *      false merges are vanishingly unlikely even at 10^13 windows;
  *      built-in expressions only, the whole stage is codegen'd),
  *   3. a fingerprint seen in >= 2 DISTINCT docs marks its windows
  *      duplicated — detected as `min(doc_id) != max(doc_id)` per
  *      fingerprint: ONE map-side-combined exchange, immune to the
  *      hot-fingerprint skew that a `collect_set`/window-function
  *      formulation would hit when one licence block spans millions of
  *      docs (no countDistinct expand, no per-key buffering),
  *   4. merge each doc's overlapping-or-adjacent duplicated windows into
  *      maximal spans (gaps-and-islands over one doc_id-keyed window —
  *      the third and last exchange).
  *
  * Granularity caveat (inherent to the pigeonhole): span boundaries are
  * reported at window resolution — a shared span's first/last partial
  * window is included only if the span covers it fully, so spans shorter
  * than `windowTokens` are invisible by design (Lee et al.'s 50-token
  * threshold plays the same role). Tokenization is [[Dedup.words]]
  * (lowercased whitespace split) so every text operator shares one token
  * coordinate system.
  */
object SubstringDedup {

  /** One row per (doc, window): (doc_id, pos, __fp) with `pos` the
    * 0-based token index of the window start. Windows come from
    * [[Dedup.shingles]] — the measured-fast shingle UDF every dedup
    * operator shares (an inline transform+slice+concat_ws HOF chain is
    * interpreted per element, the exact cost that kernel exists to
    * avoid); md5 over the exploded strings stays codegen'd. */
  private def windows(corpus: DataFrame, idCol: String, textCol: String,
      windowTokens: Int): DataFrame =
    corpus
      .select(col(idCol).as("doc_id"),
        Dedup.shingles(col(textCol), windowTokens).as("__ws"))
      .filter(size(col("__ws")) >= 1)
      .select(col("doc_id"), posexplode(col("__ws")))
      .select(col("doc_id"), col("pos"), md5(col("col")).as("__fp"))

  /** The persistable SPAN INDEX of a corpus: one row per (doc, window) —
    * (doc_id, pos, fp) — the projection a production pipeline stores so
    * incremental batches are checked for shared spans against history
    * without re-hashing it (the [[Dedup.buildDedupIndex]] pattern at
    * window grain). Append-only maintainable: indexing a new batch with
    * this same function and appending the rows IS the update. */
  def buildSpanIndex(corpus: DataFrame, idCol: String, textCol: String,
      windowTokens: Int): DataFrame =
    windows(corpus, idCol, textCol, windowTokens)
      .select(col("doc_id"), col("pos"), col("__fp").as("fp"))

  /** Incremental substring dedup: maximal spans of each BATCH doc that
    * occur verbatim somewhere in the indexed corpus — same output shape
    * as [[duplicatedSpans]] (span_start/span_end/span_tokens per batch
    * doc), but answered from the index alone; batch-internal sharing is
    * deliberately out of scope (run [[duplicatedSpans]] on the batch for
    * that). Scale shape mirrors the X22 contract: the batch fingerprint
    * set BROADCASTS into the join against the index — the index is
    * scanned once and NEVER shuffled (it streams through a broadcast
    * hash join) — the matched-fingerprint set, small by construction,
    * broadcasts back onto the batch windows, and only the batch flows
    * through the span-merge window. The plan's three exchanges
    * (batch-fingerprint distinct, matched-fingerprint distinct, span
    * merge) are all BATCH-sized; nothing index-sized moves
    * (plan-guarded under static plans). The batch window projection is
    * deliberately unpersisted — it is micro-batch-sized and recomputing
    * it twice is cheaper than pinning executor memory per call (and
    * keeps this operator safe under concurrent streaming sinks that
    * share one session). */
  def incrementalDuplicatedSpans(index: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, windowTokens: Int): DataFrame = {
    val bWins = windows(batch, idCol, textCol, windowTokens)
    val matched = index.select(col("fp").as("__fp"))
      .join(broadcast(bWins.select(col("__fp")).distinct()), "__fp")
      .distinct()
    mergeSpans(bWins.join(broadcast(matched), "__fp"), windowTokens)
  }

  /** Shared span-merge kernel: gaps-and-islands over (doc_id, pos)
    * duplicated-window rows — a window starts a new span iff it begins
    * past the furthest end seen so far (pos > running max end; equality
    * = adjacent windows, merged — the combined region is duplicated). */
  private def mergeSpans(dup: DataFrame, windowTokens: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + windowTokens)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    dup
      .withColumn("__new",
        when(prevEnd.isNull || col("pos") > prevEnd, 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(byDoc))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + windowTokens).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
  }

  /** Maximal duplicated spans per document: one row per merged span,
    * (doc_id, span_start, span_end, span_tokens) in token coordinates
    * (`span_end` exclusive). A span is reported when every
    * `windowTokens`-window inside it occurs verbatim in at least one
    * OTHER document; overlapping or exactly-adjacent duplicated windows
    * merge into one span. Docs shorter than `windowTokens` never match
    * (sub-threshold spans are out of scope — see the class note). */
  def duplicatedSpans(corpus: DataFrame, idCol: String, textCol: String,
      windowTokens: Int): DataFrame = {
    require(windowTokens >= 2,
      s"windowTokens must be >= 2, got $windowTokens — 1-token windows " +
        "would mark every repeated word a duplicated span")
    // Persist-tracked: the aggregate side and the probe side of the
    // self-join would otherwise EACH scan the corpus and md5 every token
    // window (the aggregate exchanges partial min/max rows, the probe
    // exchanges full rows — different subplans, so Catalyst cannot
    // ReusedExchange them). One cached pass halves the dominant cost;
    // released by the caller via Caches.releaseAll.
    val wins = graft.util.Caches.persistTracked(
      windows(corpus, idCol, textCol, windowTokens))
    // cross-doc test without countDistinct: a fingerprint is shared by
    // >= 2 distinct docs iff its min and max doc_id differ. Partial
    // aggregation keeps a hot fingerprint (one boilerplate in millions
    // of docs) combining map-side instead of flooding one reducer.
    val dupFp = wins.groupBy(col("__fp"))
      .agg(min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
      .filter(col("__mn") =!= col("__mx"))
      .select(col("__fp"))
    mergeSpans(wins.join(dupFp, "__fp"), windowTokens)
  }

  /** Excise every duplicated span from every document (Lee et al. drop
    * ALL occurrences; canonical-copy policies can filter the span table
    * themselves). Output: one row per input doc — (doc_id, kept_text,
    * n_tokens, n_dup_tokens); `kept_text` is the surviving tokens
    * re-joined with single spaces (token-space surgery is
    * whitespace-normalizing by construction), empty when the whole doc
    * is duplicated, the full token stream when nothing matched. The
    * span join is doc_id-keyed; the surgery itself is one codegen'd
    * higher-order projection (indexed `filter` + `exists`), no UDF. */
  def exciseDuplicates(corpus: DataFrame, idCol: String, textCol: String,
      windowTokens: Int): DataFrame = {
    val spans = duplicatedSpans(corpus, idCol, textCol, windowTokens)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    corpus
      .select(col(idCol).as("doc_id"), Dedup.words(col(textCol)).as("__w"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("__spans", coalesce(col("__spans"),
        array().cast("array<struct<span_start:bigint,span_end:bigint>>")))
      .select(
        col("doc_id"),
        expr("""concat_ws(' ', filter(__w, (tok, i) ->
               |  NOT exists(__spans, s ->
               |    i >= s.span_start AND i < s.span_end)))""".stripMargin)
          .as("kept_text"),
        coalesce(size(col("__w")), lit(0)).cast("long").as("n_tokens"),
        expr("""aggregate(__spans, 0L,
               |  (acc, s) -> acc + (s.span_end - s.span_start))"""
          .stripMargin).as("n_dup_tokens"))
  }

  /** Train→eval LEAKAGE report — the overlap audit decontamination
    * decisions are made on (Lee et al. 2021; the 13-gram overlap rule
    * of the GPT-3 analysis): for every EVAL document, the maximal token
    * spans it shares verbatim with ANY train document, rolled up to
    * `(n_toks, n_leak_spans, max_span_tokens, leaked_tokens,
    * contaminated)`. X14/X61 answer "drop this train doc?"; this
    * answers the reverse audit — "how compromised is each eval item,
    * and is it above the flag line?".
    *
    * Pure composition of shipped kernels: the train [[buildSpanIndex]]
    * probes the eval batch through [[incrementalDuplicatedSpans]], so
    * the train side is scanned once and NEVER shuffled, and every
    * exchange is eval-sized — the right asymmetry, since eval sets are
    * tiny against a 100 TB train corpus. */
  def leakageReport(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, windowTokens: Int, flagTokens: Int): DataFrame = {
    require(flagTokens >= windowTokens,
      s"flagTokens ($flagTokens) below windowTokens ($windowTokens) " +
        "cannot fire: no detected span is shorter than one window")
    val idx = buildSpanIndex(train, idCol, textCol, windowTokens)
    val spans = incrementalDuplicatedSpans(idx, evalSet, idCol, textCol,
      windowTokens)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_leak_spans"),
        max(col("span_tokens")).as("max_span_tokens"),
        sum(col("span_tokens")).as("leaked_tokens"))
    evalSet
      .select(col(idCol).as("doc_id"),
        coalesce(size(Dedup.words(col(textCol))), lit(0)).cast("long")
          .as("n_toks"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_leak_spans"), lit(0L)).as("n_leak_spans"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
        coalesce(col("leaked_tokens"), lit(0L)).as("leaked_tokens"))
      .withColumn("contaminated", col("max_span_tokens") >= flagTokens)
  }
}
