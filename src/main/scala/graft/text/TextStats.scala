package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language identification,
  * quality scoring, token counting and document fingerprinting.
  *
  * Everything is a single-projection column expression over the document
  * row — embarrassingly parallel, no shuffle, whole-stage codegen — so the
  * operators cost one scan regardless of corpus size. Heuristics are
  * deliberately deterministic and engine-neutral (token membership, length
  * arithmetic, md5) so the DuckDB oracle reproduces them exactly.
  */
object TextStats {

  /** Per-language stopword marker sets for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: membership counting is the mechanism; a
    * production deployment swaps in fuller lists. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  private def hits(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(set)))

  /** Stopword-hit count per candidate language, plus the predicted language
    * (argmax, ties broken by language code order). */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = Dedup.words(col(textCol))
    val withHits = Stopwords.foldLeft(df) { case (d, (lang, set)) =>
      d.withColumn(s"hits_$lang", hits(toks, set).cast("long"))
    }
    // argmax with deterministic ties: fold keeps the earlier (alphabetical)
    // language unless a later one is STRICTLY greater.
    val pred = Stopwords.tail.foldLeft(
      (lit(Stopwords.head._1), col(s"hits_${Stopwords.head._1}"))) {
      case ((bestLang, bestHits), (lang, _)) =>
        (when(col(s"hits_$lang") > bestHits, lit(lang)).otherwise(bestLang),
          greatest(bestHits, col(s"hits_$lang")))
    }._1
    withHits.withColumn("pred_lang", pred)
  }

  /** Whitespace token count plus a BPE-ish subword count: runs of letters,
    * runs of digits, and single other non-space characters each count as
    * one token — the shape a byte-pair tokenizer's pre-tokenizer produces. */
  def tokenCounts(text: Column): (Column, Column) = (
    size(Dedup.words(text)).cast("long"),
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long"))

  /** Quality heuristics: lengths, punctuation ratio, stopword ratio, and a
    * composite score in [0,1] (half length-based, half stopword-based). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = Dedup.words(text)
    val nTok = size(toks).cast("long")
    val punct = (length(text) -
      length(regexp_replace(text, "[.,!?;:'\"()]", ""))).cast("long")
    val stopHits = hits(toks, Stopwords.toMap.apply("en")).cast("long")
    df.withColumn("n_tokens", nTok)
      .withColumn("n_punct", punct)
      .withColumn("punct_ratio",
        graft.functions.quantize(punct / length(text).cast("double"), 4))
      .withColumn("stopword_ratio",
        graft.functions.quantize(stopHits / nTok.cast("double"), 4))
      .withColumn("quality",
        graft.functions.quantize(
          least(nTok.cast("double") / 100.0, lit(1.0)) * 0.5 +
          (stopHits / nTok.cast("double")) * lit(5.0) * 0.5, 4))
  }

  /** Normalization patterns — dialect-neutral regexes (no lookarounds /
    * backrefs) so an RE2-based engine (the DuckDB oracle) matches Java's
    * behaviour exactly, same contract as [[PiiPatterns]]. */
  val HtmlTagPattern = "<[^>]*>"
  val UrlPattern = "https?://[^\\s]+"
  val ControlCharPattern = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

  /** Corpus text normalization — the cleaning pass that PRECEDES dedup
    * and tokenization in a training-data pipeline (raw web text carries
    * markup, URLs and control bytes that poison shingles, signatures and
    * token counts). Strips HTML tags, URLs and control characters (each
    * replaced by a space so adjacent words never fuse), collapses
    * whitespace runs and trims; per-rule hit counts ride along so a
    * curation step can route heavily-marked-up documents. One
    * projection, no shuffle, whole-stage codegen — and every rule is
    * exact arithmetic on both engines. Unicode canonicalization is the
    * separate [[nfcNormalize]] (UDF — Spark has no NFC expression). */
  def normalizeText(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val cleaned = trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, HtmlTagPattern, " "),
          UrlPattern, " "),
        ControlCharPattern, " "),
      "\\s+", " "))
    df.withColumn("n_html_tags", regexp_count(text, lit(HtmlTagPattern)).cast("long"))
      .withColumn("n_urls", regexp_count(text, lit(UrlPattern)).cast("long"))
      .withColumn("n_control_chars",
        regexp_count(text, lit(ControlCharPattern)).cast("long"))
      .withColumn("norm_text", cleaned)
  }

  /** Unicode NFC canonicalization (é as one codepoint vs e+combining
    * accent hash differently — a real dedup hazard on web text). UDF:
    * Spark has no normalizer expression; java.text.Normalizer implements
    * the same Unicode NFC as DuckDB's nfc_normalize. */
  val nfcNormalize: Column => Column = {
    val f = udf { s: String =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }
    f(_)
  }

  /** Gopher-style quality-rule verdict (Rae et al. 2021 §A1.1 — public
    * knowledge): the standard pre-training keep/drop gate as NAMED rule
    * flags plus a composite `keep`, so curation can both filter and
    * report per-rule loss. Rules (all exact arithmetic, one projection):
    * word count in [minWords, maxWords]; mean word length in [3, 10];
    * symbol ratio (#/…) below `maxSymbolRatio`; at least `minStopwordHits`
    * English stopword hits; duplicate-shingle ratio below
    * `maxDupNgramRatio`; top-word share below `maxTopWordRatio`. */
  def qualityRuleVerdict(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      maxSymbolRatio: Double = 0.1, minStopwordHits: Int = 2,
      maxDupNgramRatio: Double = 0.3,
      maxTopWordRatio: Double = 0.2): DataFrame = {
    val text = col(textCol)
    val toks = Dedup.words(text)
    val nWords = size(toks).cast("long")
    val meanWordLen =
      (length(regexp_replace(text, "\\s+", "")).cast("double") /
        nWords.cast("double"))
    val symbols = regexp_count(text, lit("[#…]|\\.\\.\\.")).cast("long")
    val withStats = repetitionStats(df, idCol, textCol)
    withStats
      .withColumn("n_words", nWords)
      .withColumn("rule_word_count",
        nWords >= minWords && nWords <= maxWords)
      .withColumn("rule_mean_word_len",
        nWords > 0 && meanWordLen >= 3.0 && meanWordLen <= 10.0)
      .withColumn("rule_symbol_ratio",
        nWords > 0 && symbols.cast("double") / nWords <= maxSymbolRatio)
      .withColumn("rule_stopwords",
        hits(toks, Stopwords.toMap.apply("en")) >= minStopwordHits)
      .withColumn("rule_dup_ngrams",
        col("dup_ngram_ratio") <= maxDupNgramRatio)
      .withColumn("rule_top_word",
        col("top_word_ratio") <= maxTopWordRatio)
      .withColumn("keep",
        col("rule_word_count") && col("rule_mean_word_len") &&
          col("rule_symbol_ratio") && col("rule_stopwords") &&
          col("rule_dup_ngrams") && col("rule_top_word"))
  }

  /** Repetition heuristics (the Gopher-style within-document repetition
    * filters): duplicate n-gram fraction (1 − distinct/total over word
    * n-grams) and top-word fraction (most frequent word's share of all
    * words). High values mark boilerplate, keyword stuffing and
    * degenerate generations. One projection — the per-row counts run in a
    * tight UDF (an explode+groupBy would shuffle the whole corpus for a
    * per-document statistic). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val grams = Dedup.shingles(col(textCol), shingleN)
    val nGrams = size(grams).cast("long")
    val nDistinct = size(array_distinct(grams)).cast("long")
    df.withColumn("n_ngrams", nGrams)
      .withColumn("dup_ngram_ratio",
        when(nGrams > 0,
          graft.functions.quantize(
            (nGrams - nDistinct) / nGrams.cast("double"), 4))
          .otherwise(lit(0.0)))
      .withColumn("top_word_ratio",
        graft.functions.quantize(topFreqUdf(Dedup.words(col(textCol))), 4))
  }

  /** Share of the most frequent element; 0 for empty input. */
  private val topFreqUdf = udf { ws: Seq[String] =>
    if (ws == null || ws.isEmpty) 0.0
    else {
      val counts = new java.util.HashMap[String, Int]()
      var max = 0
      ws.foreach { w =>
        val c = counts.merge(w, 1, Integer.sum)
        if (c > max) max = c
      }
      max.toDouble / ws.length
    }
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** min(md5-hex) over a string array in one tight loop — the
    * `array_min(transform(_, md5))` form interprets the lambda per element
    * (see Dedup.shingles); the hex strings are byte-identical to Spark's
    * and DuckDB's `md5`. */
  private val minMd5Udf = udf { ss: Seq[String] =>
    if (ss == null || ss.isEmpty) null
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = new Array[Char](32)
      var best: String = null
      ss.foreach { s =>
        val d = md.digest(s.getBytes("UTF-8"))
        var i = 0
        while (i < 16) {
          hex(2 * i) = hexDigits((d(i) >> 4) & 0xf)
          hex(2 * i + 1) = hexDigits(d(i) & 0xf)
          i += 1
        }
        val h = new String(hex)
        if (best == null || h < best) best = h
      }
      best
    }
  }

  /** Rolling-hash document fingerprint: the minimum md5 over the document's
    * word 5-gram shingles (winnowing with a single global window). Documents
    * sharing long spans collide on the fingerprint; a banded variant is
    * [[Dedup.minhashNearDuplicates]]. */
  def fingerprint(text: Column, n: Int = 5): Column =
    minMd5Udf(Dedup.shingles(text, n))

  /** X24: corpus vocabulary statistics — (token, term_freq, doc_freq),
    * the frequency pass tokenizer training (BPE corpus preparation) and
    * stopword discovery run over a corpus. One explode + a distinct
    * aggregate: Catalyst plans `count` + `count_distinct(doc)` as TWO
    * partial-aggregated exchanges (the distinct count first de-dups on
    * the (token, doc) key), so shuffle rows are O(distinct (token, doc)
    * pairs per partition) — bounded by corpus tokens in the worst case
    * of document-unique tokens, and far below it on real text where
    * tokens repeat within documents. Deliberately returns NO global
    * rank column — ranking a 100M-token vocabulary needs a global sort;
    * callers take top-N via orderBy+limit, which Spark executes as a
    * scale-safe TakeOrdered. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__doc"),
        explode(Dedup.words(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("term_freq"),
        count_distinct(col("__doc")).as("doc_freq"))

  /** The `n` most frequent corpus tokens (ties broken by token asc —
    * deterministic); executed as TakeOrdered, no global sort. */
  def topTokens(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    vocabulary(df, idCol, textCol)
      .orderBy(col("term_freq").desc, col("token"))
      .limit(n)

  /** X33: adjacent-token-pair frequencies — the counting step of a BPE
    * merge iteration (the most frequent pair becomes the next merge
    * rule; re-running over re-tokenized text yields the next). Pairs are
    * the 2-gram output of the same shingle kernel every dedup operator
    * uses; tokens never contain spaces ([[Dedup.words]] splits on \s+),
    * so the space-joined pair splits back losslessly. Same scale shape
    * and output convention as [[vocabulary]]: one explode + the
    * two-exchange distinct-aggregate plan (occurrence count and
    * distinct-document count; shuffle rows bounded by distinct
    * (pair, doc) pairs per partition — see [[vocabulary]]'s note). */
  def bpePairFrequencies(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("__doc"),
        explode(Dedup.shingles(col(textCol), 2)).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("pair_freq"),
        count_distinct(col("__doc")).as("pair_doc_freq"))
      .select(
        split(col("pair"), " ").getItem(0).as("token_a"),
        split(col("pair"), " ").getItem(1).as("token_b"),
        col("pair_freq"), col("pair_doc_freq"))

  /** X143: HEAPS' LAW FIT — vocabulary growth `V(N) ≈ K·N^β` over the
    * corpus in doc-id order (Heaps 1978, public knowledge): the
    * capacity-planning curve behind every tokenizer/vocab decision —
    * β ≈ 0.5 means doubling the corpus grows the vocab ~41%; β near 1
    * means the "vocabulary" is unbounded junk (mangled encodings, ids).
    *
    * Distributed exactly: each token's FIRST document (a min
    * aggregate), new-token counts per doc, then ONE two-phase
    * [[graft.relational.Ranks.prefixSums]] pass yields both the doc's
    * rank N and the running vocab V(N) (no global-order window). The
    * log-log OLS runs over ALL doc points with ln values quantized to
    * scaled-1e9 LONGs and DECIMAL(38,0) moment sums — order-free; β,
    * K = e^intercept and R² are fixed IEEE trees. Output 1 row:
    * (n_docs, vocab, beta, k, r2). */
  def heapsLawFit(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val D = "decimal(38,0)"
    val tok = df.select(col(idCol).as("__d"),
      explode(split(col(textCol), "\\s+")).as("__t"))
      .filter(col("__t") =!= "")
    val firstDoc = tok.groupBy(col("__t"))
      .agg(min(col("__d")).as("__fd"))
    val newPerDoc = firstDoc.groupBy(col("__fd").as("__d"))
      .agg(count(lit(1)).as("__new"))
    val docs = df.select(col(idCol).as("__d")).distinct()
      .join(newPerDoc, Seq("__d"), "left")
      .na.fill(0L, Seq("__new"))
    val curve = graft.relational.Ranks.prefixSums(docs,
      Seq(col("__d")),
      Seq("__rank" -> lit(1L), "__v" -> col("__new")))
      .filter(col("__v") > 0)
    val xl = floor(log(col("__rank").cast("double")) * lit(1e9) +
      lit(0.5)).cast("long")
    val yl = floor(log(col("__v").cast("double")) * lit(1e9) +
      lit(0.5)).cast("long")
    val agg = curve.select(xl.as("__x"), yl.as("__y")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__x").cast(D)).as("__sx"),
      sum(col("__y").cast(D)).as("__sy"),
      sum(col("__x").cast(D) * col("__y").cast(D)).as("__sxy"),
      sum(col("__x").cast(D) * col("__x").cast(D)).as("__sxx"),
      sum(col("__y").cast(D) * col("__y").cast(D)).as("__syy"))
    val vocabTotal = firstDoc.agg(count(lit(1)).as("vocab"))
    val n = col("n_docs").cast("double")
    def d9(c: String) = col(c).cast("double") / lit(1e9)
    def d18(c: String) = col(c).cast("double") / lit(1e18)
    val num = n * d18("__sxy") - d9("__sx") * d9("__sy")
    val vx = n * d18("__sxx") - d9("__sx") * d9("__sx")
    val vy = n * d18("__syy") - d9("__sy") * d9("__sy")
    val beta = num / vx
    val logK = (d9("__sy") - beta * d9("__sx")) / n
    import graft.functions.q6
    agg.crossJoin(broadcast(vocabTotal)).select(
      col("n_docs"), col("vocab"),
      q6(when(col("n_docs") > 1 && vx > 0, beta)).as("beta"),
      q6(when(col("n_docs") > 1 && vx > 0, exp(logK))).as("k"),
      q6(when(col("n_docs") > 1 && vx > 0 && vy > 0,
        num * num / (vx * vy))).as("r2"))
  }

  /** Corpus type counts at word (shingleN = 1) or n-gram grain — the
    * shared front of [[goodTuring]] and [[zipfLawFit]]: real pipelines
    * run frequency-spectrum diagnostics over n-grams when the word
    * vocabulary is small or templated. */
  private def typeCounts(df: DataFrame, textCol: String,
      shingleN: Int): DataFrame = {
    val toks =
      if (shingleN == 1)
        df.select(explode(split(lower(col(textCol)), "\\s+")).as("__t"))
          .filter(col("__t") =!= "")
      else
        df.select(explode(
          graft.text.Dedup.shingles(col(textCol), shingleN)).as("__t"))
    toks.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
  }

  /** X154: GOOD–TURING FREQUENCY-OF-FREQUENCIES — the "how much of
    * the distribution is still unseen" estimate (Good 1953, public
    * knowledge): N_r = number of token TYPES occurring exactly r
    * times; the Good–Turing unseen-probability mass is N_1/N (the
    * hapax share of tokens), the number every smoothing scheme (and
    * every "have we crawled enough" decision) starts from. Output one
    * row per r in 1..maxR plus a tail row at r = −1 (the "> maxR"
    * sentinel): (r, n_types, n_tokens, type_share, token_share) —
    * token_share at r = 1 IS the unseen-mass estimate. Two aggregates
    * (type counts → count histogram), everything exact integers until
    * two quantized divisions; `shingleN` > 1 counts n-gram types
    * (via [[typeCounts]]). */
  /** X172: YULE'S CHARACTERISTIC K + hapax/dis legomena ratios (Yule
    * 1944, public knowledge) — lexical REPETITIVENESS in one number:
    * `K = 10⁴·(Σ_m m²·V_m − N)/N²` (V_m = types occurring m times),
    * the length-invariant "how template-y is this corpus" dial that
    * complements X162 Chao1 (how much vocabulary is MISSING) and X154
    * Good–Turing (how much probability mass is unseen): synthetic or
    * over-boilerplated corpora push K up long before exact dedup fires.
    *
    * One aggregate over the shared [[typeCounts]] front; every operand
    * an exact integer (Σm²V_m ≡ Σ_types c² carried in DECIMAL — it
    * passes 2^53 near 1e8-occurrence types), K/ratios published q6
    * over fixed IEEE trees. Output: 1 row — (n_types, n_tokens,
    * hapax, dis, yule_k, hapax_ratio, dis_ratio). */
  def yuleK(df: DataFrame, textCol: String): DataFrame = {
    val D = "decimal(38,0)"
    val agg = typeCounts(df, textCol, 1).agg(
      count(lit(1)).as("n_types"),
      coalesce(sum(col("__c")), lit(0L)).as("n_tokens"),
      coalesce(sum((col("__c") * col("__c")).cast(D)),
        lit(0).cast(D)).as("__m2"),
      sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax"),
      sum(when(col("__c") === 2, 1L).otherwise(0L)).as("dis"))
    val n = col("n_tokens").cast("double")
    import graft.functions.q6
    agg.select(col("n_types"), col("n_tokens"), col("hapax"), col("dis"),
      q6(when(col("n_tokens") > 0,
        lit(1e4) * (col("__m2").cast("double") - n) / (n * n)))
        .as("yule_k"),
      q6(when(col("n_types") > 0, col("hapax").cast("double") /
        col("n_types").cast("double"))).as("hapax_ratio"),
      q6(when(col("n_types") > 0, col("dis").cast("double") /
        col("n_types").cast("double"))).as("dis_ratio"))
  }

  /** X171: VOCABULARY JENSEN–SHANNON DRIFT between two corpora (Lin
    * 1991, public knowledge) — "did this crawl dump's LANGUAGE change,
    * not just its volume": JS(p‖q) over the two unigram distributions,
    * symmetric, bounded [0, ln 2], finite under disjoint vocabulary
    * (where KL explodes — exactly the new-tokens case a drifting crawl
    * produces). The vocabulary-level companion of the D5 numeric-PSI
    * drift monitor.
    *
    * Engine parity: per-word JS terms bear ln, and a double sum over a
    * million-type vocabulary is ORDER-DEPENDENT — so each term is
    * floor-scaled to a 1e15 LONG (terms are ≤ p·ln2 < 1, so the scaled
    * term is exact-integer safe; cumulative floor bias ≤ |V|·1e-15,
    * far under the published q6) and summed order-free in DECIMAL
    * (the RAKE/X160 discipline). Counts and totals are exact integers;
    * p, q, m are pinned division trees. Output: 1 row — (tokens_a,
    * tokens_b, types_a, types_b, shared_types, js). */
  def vocabJsDivergence(a: DataFrame, b: DataFrame, textCol: String)
      : DataFrame = {
    val D = "decimal(38,0)"
    val ca = typeCounts(a, textCol, 1)
      .select(col("__t"), col("__c").as("__ca"))
    val cb = typeCounts(b, textCol, 1)
      .select(col("__t"), col("__c").as("__cb"))
    val joined = ca.join(cb, Seq("__t"), "full_outer")
      .select(coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val tot = joined.agg(
      coalesce(sum(col("__ca")), lit(0L)).as("__na"),
      coalesce(sum(col("__cb")), lit(0L)).as("__nb"))
    val withTot = joined.crossJoin(broadcast(tot))
    val p = col("__ca").cast("double") / col("__na").cast("double")
    val q = col("__cb").cast("double") / col("__nb").cast("double")
    val m = (p + q) / lit(2.0)
    val term = when(col("__ca") > 0, p * log(p / m)).otherwise(lit(0.0)) +
      when(col("__cb") > 0, q * log(q / m)).otherwise(lit(0.0))
    val agg = withTot.agg(
      first(col("__na")).as("tokens_a"), first(col("__nb")).as("tokens_b"),
      sum(when(col("__ca") > 0, 1L).otherwise(0L)).as("types_a"),
      sum(when(col("__cb") > 0, 1L).otherwise(0L)).as("types_b"),
      sum(when(col("__ca") > 0 && col("__cb") > 0, 1L).otherwise(0L))
        .as("shared_types"),
      coalesce(sum(floor(term * lit(1e15) + lit(0.5)).cast("long")
        .cast(D)), lit(0).cast(D)).as("__js"))
    import graft.functions.q6
    agg.select(col("tokens_a"), col("tokens_b"), col("types_a"),
      col("types_b"), col("shared_types"),
      q6(lit(0.5) * col("__js").cast("double") / lit(1e15)).as("js"))
  }

  /** X173: TERM BURSTINESS / DISPERSION report (Church & Gale 1995,
    * public knowledge) — per frequent token, does it spread evenly
    * (function word) or clump into few documents (content/template
    * term)? `rate = tf/df` (occurrences per containing doc) and the
    * variance-to-mean ratio over ALL docs via the exact identity
    * `VMR = Σc²/tf − tf/n_docs` (zeros included without a dense
    * join — the algebra folds them in). The data-driven stopword/
    * keyword discriminator a tokenizer or BM25 stack reads at corpus
    * scale; VMR ≈ 1 is Poisson (uniform), ≫ 1 is bursty.
    *
    * One (doc, token) count aggregate + one token re-aggregate;
    * exact integers (Σc² in DECIMAL), two pinned divisions published
    * q6; `minDf` is an exact-integer cut (no float boundary). */
  def termBurstiness(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 10): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val D = "decimal(38,0)"
    val nDocs = df.count()
    val perDoc = df.select(col(idCol).as("__id"),
        explode(graft.text.Dedup.words(col(textCol))).as("token"))
      .groupBy(col("__id"), col("token"))
      .agg(count(lit(1)).as("__c"))
    val perTok = perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("__c")).as("tf"),
        sum((col("__c") * col("__c")).cast(D)).as("__s2"))
      .filter(col("df") >= minDf)
    import graft.functions.q6
    perTok.select(col("token"), col("df"), col("tf"),
      q6(col("tf").cast("double") / col("df").cast("double"))
        .as("rate"),
      q6(col("__s2").cast("double") / col("tf").cast("double") -
        col("tf").cast("double") / lit(nDocs.toDouble)).as("vmr"))
  }

  def goodTuring(df: DataFrame, idCol: String, textCol: String,
      maxR: Int = 10, shingleN: Int = 1): DataFrame = {
    require(maxR >= 1, s"maxR must be >= 1, got $maxR")
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    val counts = typeCounts(df, textCol, shingleN)
    val binned = counts
      .withColumn("r",
        when(col("__c") <= maxR, col("__c")).otherwise(lit(-1L)))
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_types"), sum(col("__c")).as("n_tokens"))
    val tot = binned.agg(sum(col("n_types")).as("__tt"),
      sum(col("n_tokens")).as("__tn"))
    import graft.functions.q6
    binned.crossJoin(broadcast(tot))
      .select(col("r"), col("n_types"), col("n_tokens"),
        q6(col("n_types").cast("double") / col("__tt").cast("double"))
          .as("type_share"),
        q6(col("n_tokens").cast("double") / col("__tn").cast("double"))
          .as("token_share"))
  }

  /** X162: CHAO1 VOCABULARY-RICHNESS ESTIMATE (Chao 1984; the
    * species-richness estimator ecology and corpus linguistics share —
    * public knowledge) — the "how much vocabulary have we NOT crawled
    * yet" number that completes the [[goodTuring]]/[[heapsLawFit]]
    * coverage dashboard: observed types D underestimate the true
    * vocabulary; the singleton/doubleton ratio bounds the unseen mass.
    * Bias-corrected form (defined even at f₂ = 0):
    * `chao1 = D + f₁(f₁−1)/(2(f₂+1))`, plus Good's sample coverage
    * `C = 1 − f₁/N` (the probability the next token is an already-seen
    * type — Good 1953).
    *
    * Exactness: f₁/f₂/D/N are exact BIGINTs from ONE aggregate over
    * the shared [[typeCounts]] front (`shingleN` picks the n-gram
    * grain, same as X143/X154/X155); the estimates are fixed IEEE
    * trees over those integers. chao1 publishes at quantize-2, NOT
    * q6: its magnitude is type-count-scale (10⁹ types × 10⁶ breaches
    * quantize's 2^53 contract — the audited f42 class); coverage ≤ 1
    * stays q6.
    *
    * Scale: typeCounts is one map-side-combined groupBy; everything
    * after is a 1-row aggregate. Output 1 row:
    * (n_tokens, n_types, f1, f2, chao1, unseen_types_est, coverage). */
  def chao1Richness(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 1): DataFrame = {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    import graft.functions.{q6, quantize}
    val counts = typeCounts(df, textCol, shingleN)
    val agg = counts.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n_tokens"),
      count(lit(1)).as("n_types"),
      coalesce(sum(when(col("__c") === 1L, 1L).otherwise(0L)), lit(0L))
        .as("f1"),
      coalesce(sum(when(col("__c") === 2L, 1L).otherwise(0L)), lit(0L))
        .as("f2"))
    val f1D = col("f1").cast("double")
    val unseen = f1D * (f1D - lit(1.0)) /
      (lit(2.0) * (col("f2").cast("double") + lit(1.0)))
    agg.select(col("n_tokens"), col("n_types"), col("f1"), col("f2"),
      quantize(col("n_types").cast("double") + unseen, 2).as("chao1"),
      quantize(unseen, 2).as("unseen_types_est"),
      q6(when(col("n_tokens") > 0,
        lit(1.0) - f1D / col("n_tokens").cast("double")))
        .as("coverage"))
  }

  /** X155: ZIPF RANK-FREQUENCY FIT — the other half of the corpus
    * power-law dashboard next to Heaps (X143): token frequency vs
    * frequency rank on log-log axes, slope ≈ −1 for natural text
    * (Zipf 1949, public knowledge); a much flatter slope flags
    * boilerplate/template corpora, a much steeper one flags id-like
    * unbounded vocabularies. Ranks come from the two-phase
    * [[graft.relational.Ranks.globalRank]] on (freq desc, token) — no
    * global-order window at any vocabulary size — and the log-log OLS
    * runs the X143 discipline verbatim: ln values floor-scaled to 1e9
    * LONGs, DECIMAL(38,0) moment sums (order-free), fixed IEEE trees,
    * quantized-6. `minCount` drops the long tail of hapax counts
    * whose quantized-log ties would dominate the fit (explicit
    * parameter, default 2). Output 1 row:
    * (n_types, total_tokens, slope, intercept_ln, r2). */
  def zipfLawFit(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2L, shingleN: Int = 1): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    val D = "decimal(38,0)"
    val counts = typeCounts(df, textCol, shingleN)
    val totals = counts.agg(count(lit(1)).as("n_types"),
      sum(col("__c")).as("total_tokens"))
    val ranked = graft.relational.Ranks.globalRank(
      counts.filter(col("__c") >= minCount),
      Seq(col("__c").desc, col("__t")), "__rank")
    val xl = floor(log(col("__rank").cast("double")) * lit(1e9) +
      lit(0.5)).cast("long")
    val yl = floor(log(col("__c").cast("double")) * lit(1e9) +
      lit(0.5)).cast("long")
    val agg = ranked.select(xl.as("__x"), yl.as("__y")).agg(
      count(lit(1)).as("__n"),
      sum(col("__x").cast(D)).as("__sx"),
      sum(col("__y").cast(D)).as("__sy"),
      sum(col("__x").cast(D) * col("__y").cast(D)).as("__sxy"),
      sum(col("__x").cast(D) * col("__x").cast(D)).as("__sxx"),
      sum(col("__y").cast(D) * col("__y").cast(D)).as("__syy"))
    val n = col("__n").cast("double")
    def d9(c: String) = col(c).cast("double") / lit(1e9)
    def d18(c: String) = col(c).cast("double") / lit(1e18)
    val num = n * d18("__sxy") - d9("__sx") * d9("__sy")
    val vx = n * d18("__sxx") - d9("__sx") * d9("__sx")
    val vy = n * d18("__syy") - d9("__sy") * d9("__sy")
    val slope = num / vx
    val icept = (d9("__sy") - slope * d9("__sx")) / n
    import graft.functions.q6
    agg.crossJoin(broadcast(totals)).select(
      col("n_types"), col("total_tokens"),
      q6(when(col("__n") > 1 && vx > 0, slope)).as("slope"),
      q6(when(col("__n") > 1 && vx > 0, icept)).as("intercept_ln"),
      q6(when(col("__n") > 1 && vx > 0 && vy > 0,
        num * num / (vx * vy))).as("r2"))
  }

  /** X88: PMI COLLOCATIONS (Church & Hanks 1990, public knowledge) —
    * adjacent token pairs whose co-occurrence beats chance:
    * `pmi(x,y) = ln( p(x,y) / (p(x)·p(y)) )`, with p from corpus
    * unigram/bigram occurrence counts. High-PMI pairs are the
    * multi-word expressions ("new york", "machine learning") that
    * vocabulary induction and phrase-aware tokenization mine from raw
    * corpora; `minCount` drops the unstable low-frequency tail.
    *
    * Engine parity: the ranking key is `lift = p(x,y)/(p(x)p(y))`
    * computed as `((c_xy/c_x) · (N_u/c_y)) · (N_u/N_b)` — every operand
    * is an exact-integer double and every step one correctly-rounded
    * IEEE op with a pinned association order, so lift is BIT-IDENTICAL
    * across engines and the top-k boundary cannot flip; only the
    * reported `pmi = ln(lift)` needs rounding (ln is ≤1-ulp, not
    * correctly-rounded, in both engines).
    *
    * Scale shape: unigram and bigram tables are one hash-aggregate
    * each over the [[Dedup.words]]/[[Dedup.shingles]] kernels; the two
    * count lookups join the minCount-filtered candidate set (bounded by
    * distinct frequent pairs, not corpus size) against the vocab table;
    * the top-k is TakeOrdered. Corpus totals are two driver scalars. */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5, topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val uni = graft.util.Caches.persistTracked(
      df.select(explode(Dedup.words(col(textCol))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt")))
    val nUni = uni.agg(coalesce(sum(col("cnt")), lit(0L)))
      .head().getLong(0)
    val bi = graft.util.Caches.persistTracked(
      df.select(explode(Dedup.shingles(col(textCol), 2)).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("pair_freq")))
    val nBi = bi.agg(coalesce(sum(col("pair_freq")), lit(0L)))
      .head().getLong(0)
    require(nUni > 0 && nBi > 0, "pmiCollocations: empty corpus")
    val sp = split(col("pair"), " ", 2)
    val lift = ((col("pair_freq").cast("double") /
        col("cx").cast("double")) *
      (lit(nUni.toDouble) / col("cy").cast("double"))) *
      (lit(nUni.toDouble) / lit(nBi.toDouble))
    bi.filter(col("pair_freq") >= minCount)
      .withColumn("x", sp.getItem(0))
      .withColumn("y", sp.getItem(1))
      .join(uni.select(col("token").as("x"), col("cnt").as("cx")), "x")
      .join(uni.select(col("token").as("y"), col("cnt").as("cy")), "y")
      .withColumn("lift", lift)
      .select(col("x"), col("y"), col("pair_freq"), col("lift"),
        round(log(col("lift")), 6).as("pmi"))
      .orderBy(col("lift").desc, col("x"), col("y"))
      .limit(topK)
  }

  /** X170: DUNNING LOG-LIKELIHOOD COLLOCATIONS (Dunning 1993, public
    * knowledge) — the G² test over the bigram 2×2 contingency table,
    * the statistically-grounded complement of [[pmiCollocations]]: PMI
    * over-ranks rare pairs (two hapaxes that co-occur once get the
    * maximum score); the likelihood ratio weighs the evidence MASS, so
    * "machine learning" at 500 occurrences beats a one-off typo pair.
    * Table per candidate pair (x,y): k₁₁ = c(x·y), marginals = x-as-
    * left and y-as-right bigram counts, `G² = 2·Σ k·ln((k/R)·(N/C))`
    * over the 4 cells (empty cells contribute 0; a positive cell's row
    * total is positive by construction, so every ln argument is > 0).
    *
    * Engine parity: candidate SELECTION is exact-integer
    * (`pair_freq ≥ minCount` — no top-k by the libm-bearing score, so
    * no boundary can flip); every ln argument is the pinned two-
    * division form `(k/R)·(N/C)` over exact-integer doubles (k·N could
    * exceed 2^53 on a 1e9-bigram corpus; two correctly-rounded
    * divisions cannot), the 4-term sum is one literal association
    * order, and only the published `llr` is quantized (q6).
    *
    * Scale shape: one bigram hash-aggregate over the [[Dedup.shingles]]
    * kernel, two marginal re-aggregates of the (already distinct-pair-
    * sized) bigram table, two joins against the minCount-filtered
    * candidate set; the corpus total is one driver scalar. */
  def dunningCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val bi = graft.util.Caches.persistTracked(
      df.select(explode(Dedup.shingles(col(textCol), 2)).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("pair_freq")))
    val nBi = bi.agg(coalesce(sum(col("pair_freq")), lit(0L)))
      .head().getLong(0)
    require(nBi > 0, "dunningCollocations: empty corpus")
    val sp = split(col("pair"), " ", 2)
    val xy = bi.withColumn("x", sp.getItem(0))
      .withColumn("y", sp.getItem(1))
    val left = xy.groupBy(col("x")).agg(sum(col("pair_freq")).as("cx"))
    val right = xy.groupBy(col("y")).agg(sum(col("pair_freq")).as("cy"))
    val n = lit(nBi.toDouble)
    val k11 = col("pair_freq").cast("double")
    val k12 = (col("cx") - col("pair_freq")).cast("double")
    val k21 = (col("cy") - col("pair_freq")).cast("double")
    val k22 = (lit(nBi) - col("cx") - col("cy") + col("pair_freq"))
      .cast("double")
    val cxD = col("cx").cast("double")
    val cyD = col("cy").cast("double")
    def term(k: Column, r: Column, c: Column): Column =
      when(k > 0, k * log((k / r) * (n / c))).otherwise(lit(0.0))
    val llr = lit(2.0) * (term(k11, cxD, cyD) +
      term(k12, cxD, n - cyD) +
      term(k21, n - cxD, cyD) +
      term(k22, n - cxD, n - cyD))
    // llr publishes at p=2, NOT the default q6: G² grows ~O(N) with the
    // corpus bigram count (a frequent pair at N≈1e13 bigrams yields
    // llr≈1e10), so |llr·1e6| would pass the quantize 2^53 contract —
    // the welchT var0/var1 precedent. Two decimals keep the published
    // value engine-stable to |llr| < ~4.5e13.
    xy.filter(col("pair_freq") >= minCount)
      .join(left, "x").join(right, "y")
      .select(col("x"), col("y"), col("pair_freq"), col("cx"),
        col("cy"), graft.functions.quantize(llr, 2).as("llr"))
  }

  /** The `n` most frequent adjacent pairs (freq desc, then tokens asc) —
    * the next BPE merge candidates; TakeOrdered, no global sort. */
  def topPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    bpePairFrequencies(df, idCol, textCol)
      .orderBy(col("pair_freq").desc, col("token_a"), col("token_b"))
      .limit(n)

  /** One BPE merge application: replace every left-to-right
    * non-overlapping adjacent occurrence of (a, b) in the token array
    * with the single merged token "a b" — exactly the BPE apply step
    * ("a a a" with rule (a,a) → ["a a", "a"], the first match consumes
    * its right token). Tokens never contain spaces ([[Dedup.words]]),
    * so the space-joined merge token is unambiguous and splits back
    * losslessly. Pure projection, ZERO shuffle.
    *
    * A tight UDF, not a SQL `aggregate` fold: the fold's `array_append`
    * accumulator copies the array per element (O(n²) per document) and
    * its lambda evaluates interpreted — the [[Dedup.shinglesUdf]]
    * lesson again. The imperative pass is O(n) (measured ~2× on the
    * 5-merge training loop at sf0.1). */
  private def mergePairUdf(a: String, b: String) = udf { ws: Seq[String] =>
    if (ws == null) null
    else if (ws.length < 2) ws
    else {
      val out = new scala.collection.mutable.ArrayBuffer[String](ws.length)
      val merged = a + " " + b
      var i = 0
      while (i < ws.length) {
        if (i < ws.length - 1 && ws(i) == a && ws(i + 1) == b) {
          out += merged; i += 2
        } else { out += ws(i); i += 1 }
      }
      out.toSeq
    }
  }

  private def mergePairExpr(toksCol: String, a: String, b: String): Column =
    mergePairUdf(a, b)(col(toksCol))

  /** X37: iterated word-level BPE TRAINING — the loop [[bpePairFrequencies]]
    * is one step of. Each of `nMerges` iterations counts adjacent pairs
    * over the CURRENT token streams (one map-side-combined exchange),
    * takes the global best pair (freq desc, then tokens asc — a
    * deterministic total order; one-row collect, the learned RULE is
    * driver-sized by definition), and applies it everywhere via the
    * shuffle-free [[mergePairExpr]] fold. The driver loop is over merge
    * ITERATIONS (inherent to BPE — rule k+1 depends on the corpus after
    * rule k), never over rows; each iteration's token streams are
    * persisted so iteration k scans cached state, not a k-deep
    * recompute chain.
    *
    * Returns the ranked merge table: (merge_rank 1-based, token_a,
    * token_b, pair_freq at learn time). Stops early when no adjacent
    * pair is left. */
  def bpeTrain(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = df.sparkSession
    var cur = graft.util.Caches.persistTracked(
      df.select(col(idCol).as("doc_id"),
        Dedup.words(col(textCol)).as("__toks")))
    // deferred unpersist: each iteration's pair-count job is the scan
    // that materializes `cur`'s cache (reading its parent's), so the
    // parent is dropped only AFTER that job returns — one job per merge
    // instead of pair-count + an extra count() materialization, and the
    // post-final-merge state (which nothing ever reads) is never built
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val top = cur.select(explode(expr(
          """CASE WHEN __toks IS NULL OR size(__toks) < 2
            |  THEN cast(array() as array<struct<a:string,b:string>>)
            |ELSE transform(sequence(1, size(__toks) - 1),
            |  i -> struct(element_at(__toks, i) as a,
            |    element_at(__toks, i + 1) as b)) END""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("a"), col("b"))
        .limit(1).collect()
      prev.foreach(_.unpersist()) // cur is materialized now
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((k + 1, a, b, f))
        val next = graft.util.Caches.persistTracked(cur.select(col("doc_id"),
          mergePairExpr("__toks", a, b).as("__toks")))
        prev = Some(cur)
        cur = next
      }
      k += 1
    }
    prev.foreach(_.unpersist())
    cur.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "token_a", "token_b", "pair_freq")
      .select(col("merge_rank").cast("long"), col("token_a"),
        col("token_b"), col("pair_freq"))
  }

  /** X37: TOKENIZE with a learned merge table — fold the ordered rules
    * over each document's token stream ([[mergePairExpr]] per rule:
    * one chained projection, zero shuffle, no driver loop over rows).
    * Output: (doc_id, tokens array, n_tokens) — the sequence lengths
    * [[graft.curate.Curation.packSequences]] packs. `merges` is
    * (token_a, token_b) in rank order, exactly [[bpeTrain]]'s table. */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val toks = merges.foldLeft(
      df.select(col(idCol).as("doc_id"),
        Dedup.words(col(textCol)).as("__toks"))) { case (d, (a, b)) =>
      d.select(col("doc_id"), mergePairExpr("__toks", a, b).as("__toks"))
    }
    toks.select(col("doc_id"), col("__toks").as("tokens"),
      coalesce(size(col("__toks")), lit(0)).cast("long").as("n_tokens"))
  }

  /** X149: WORDPIECE TOKENIZATION — greedy longest-match-first subword
    * segmentation against a fixed vocabulary (Wu et al. 2016; the
    * BERT-family tokenizer), completing the trained-tokenizer triad
    * next to BPE (merge-rule folds, X37/X39) and unigram-LM (Viterbi,
    * X66): per word, repeatedly consume the LONGEST vocab piece
    * (continuation pieces carry the `##` prefix); a word with no match
    * at any position collapses to `unk` whole — the BERT convention,
    * never a partial emission. One tight UDF per word (the greedy loop
    * is inherently sequential per word — an expression form would
    * interpret a lambda per (pos, len) pair), vocabulary broadcast in
    * the closure (vocab-bounded, the X39 merge-table precedent); zero
    * shuffle. Output: one row per (doc, word) — (doc_id, widx, word,
    * pieces, n_pieces, is_unk); empty words are dropped.
    *
    * The oracle mirrors the greedy loop as a recursive CTE with a
    * LATERAL longest-match probe — at each (word, pos) exactly one
    * vocab string can match each length, so `ORDER BY len DESC LIMIT
    * 1` is deterministic in both engines. */
  def wordpieceTokenize(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], unk: String = "[UNK]"): DataFrame = {
    require(vocab.nonEmpty, "wordpieceTokenize: empty vocabulary")
    require(vocab.forall(_.nonEmpty), "wordpieceTokenize: empty piece")
    val vset = vocab.toSet
    val maxLen = vocab.iterator
      .map(v => if (v.startsWith("##")) v.length - 2 else v.length).max
    val tokUdf = udf { w: String =>
      if (w == null || w.isEmpty) Seq.empty[String]
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        var dead = false
        while (pos < w.length && !dead) {
          var len = math.min(maxLen, w.length - pos)
          var found: String = null
          while (len >= 1 && found == null) {
            val sub = w.substring(pos, pos + len)
            val cand = if (pos == 0) sub else "##" + sub
            if (vset.contains(cand)) found = cand
            len -= 1
          }
          if (found == null) dead = true
          else {
            out += found
            pos += (if (pos == 0) found.length else found.length - 2)
          }
        }
        if (dead) Seq(unk) else out.toSeq
      }
    }
    df.select(col(idCol).as("doc_id"),
        posexplode(Dedup.words(col(textCol))).as(Seq("widx", "word")))
      .filter(col("word") =!= "")
      .withColumn("widx", col("widx").cast("long"))
      .withColumn("pieces", tokUdf(col("word")))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
      .withColumn("is_unk",
        (col("pieces") === array(lit(unk))).cast("int"))
  }

  /** X75: fixed-size token-window CHUNKING with stride — the context
    * windowing both RAG indexing (overlapping retrieval chunks) and
    * fixed-context pretraining (max_seq_len splits) run on every
    * document. Windows start at multiples of `strideTokens`; the last
    * window is the FIRST one whose end reaches the document's end
    * (full coverage, no redundant sub-windows of the final chunk — a
    * doc of `n <= chunkTokens` tokens yields exactly one chunk).
    * Pure projection + bounded posexplode (≤ ceil(n/stride) rows/doc),
    * ZERO shuffle; token coordinates are [[Dedup.words]], so chunk
    * spans compose with X36 span excision and X13 packing directly.
    * Output: (doc_id, chunk_idx, start_tok, end_tok, n_chunk_tokens,
    * chunk_text); empty docs yield no chunks. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(strideTokens >= 1,
      s"strideTokens must be >= 1, got $strideTokens")
    df.select(col(idCol).as("doc_id"), Dedup.words(col(textCol)).as("__w"))
      .withColumn("__n", coalesce(size(col("__w")), lit(0)))
      .filter(col("__n") > 0)
      // last start index m·stride: m = ceil((n - chunk)/stride), kept
      // integral (positive operands, so DIV is exact floor); the s < n
      // guard covers stride > chunk gap-sampling where m·stride can
      // land past the end
      .withColumn("__m",
        when(col("__n") <= chunkTokens, lit(0)).otherwise(
          expr(s"(__n - $chunkTokens + $strideTokens - 1) DIV " +
            s"$strideTokens").cast("int")))
      .select(col("doc_id"), col("__w"), col("__n"),
        posexplode(filter(
          transform(sequence(lit(0), col("__m")),
            k => k * strideTokens),
          s => s < col("__n"))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start_tok"),
        least(col("col") + chunkTokens, col("__n")).cast("long")
          .as("end_tok"),
        col("__w"), col("col"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("end_tok"),
        (col("end_tok") - col("start_tok")).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__w"), col("col") + 1,
          lit(chunkTokens))).as("chunk_text"))
  }

  /** X78: LINE-level quality signals — the C4/FineWeb rule family that
    * operates on lines where X32's Gopher rules operate on tokens
    * (Raffel et al. 2020 §2.2 keeps lines ending in terminal
    * punctuation and drops short/bullet/boilerplate lines; FineWeb
    * publishes the same shapes — public knowledge). One projection of
    * array HOFs over the newline-split doc (lines per doc are few, so
    * interpreted lambdas are immaterial here), ZERO shuffle; emits the
    * signals, not a verdict — thresholds belong to the caller's policy
    * (compose with X32's composite keep or the X34 pipeline). Output:
    * (doc_id, n_lines, frac_end_punct, frac_bullet, frac_short,
    * dup_line_frac, mean_line_tokens); empty/whitespace-only docs get
    * n_lines = 0 and NULL fractions (0/0 — honest, not fake zeros). */
  def lineQuality(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = filter(
      transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    val toks = (l: Column) => size(split(l, "\\s+"))
    // NULL denominator for empty docs: ANSI mode (the Spark 4 default)
    // throws on literal zero division; a NULL divisor yields the NULL
    // fraction the contract wants (and the oracle's nullif computes)
    val denom = when(size(lines) > 0, size(lines))
    df.select(col(idCol).as("doc_id"), lines.as("__l"), denom.as("__d"))
      .select(col("doc_id"),
        size(col("__l")).cast("long").as("n_lines"),
        (size(filter(col("__l"), l => l.rlike("[.!?\"']$")))
          / col("__d")).as("frac_end_punct"),
        (size(filter(col("__l"), l => l.rlike("^[-*•]")))
          / col("__d")).as("frac_bullet"),
        (size(filter(col("__l"), l => toks(l) < 3))
          / col("__d")).as("frac_short"),
        ((size(col("__l")) - size(array_distinct(col("__l"))))
          / col("__d")).as("dup_line_frac"),
        (aggregate(col("__l"), lit(0L), (acc, l) => acc + toks(l))
          / col("__d")).as("mean_line_tokens"))
  }

  /** X42: n-gram language-model PERPLEXITY scoring — the CCNet quality
    * signal (Wenzek et al. 2020, public knowledge: docs scored by an
    * n-gram LM's perplexity; low = fluent, high = noise/boilerplate
    * soup). Here the LM is a word-BIGRAM model with add-alpha smoothing
    * trained on the corpus itself (self-perplexity — the common
    * bootstrap when no external LM ships):
    * `P(b|a) = (c(ab) + alpha) / (c(a) + alpha·V)`, perplexity =
    * `exp(mean -ln P)` over the doc's bigrams.
    *
    * 100 TB shape: the "model" is never materialized driver-side or
    * broadcast — it IS two count tables (bigram, unigram), built by two
    * map-side-combined aggregates and consulted by two key-partitioned
    * joins; scoring is one per-doc aggregate. Five exchanges total, all
    * key-hashed, nothing collected. Docs with fewer than 2 tokens carry
    * NULL perplexity (no bigrams to judge — rows are kept, callers
    * quarantine). The unigram denominator counts every occurrence of
    * the context token (including final positions) — a documented
    * modeling simplification, mirrored exactly by the oracle. */
  def bigramPerplexity(corpus: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.4): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val bi = corpus.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), 2)).as("bigram"))
    val biCounts = bi.groupBy(col("bigram"))
      .agg(count(lit(1)).as("__cab"))
    val uni = corpus.select(
      explode(Dedup.words(col(textCol))).as("tok"))
    val uniCounts = uni.groupBy(col("tok")).agg(count(lit(1)).as("__ca"))
    val vocab = uniCounts.agg(count(lit(1)).as("__v"))
    val scored = bi
      .join(biCounts, "bigram")
      .withColumn("tok", split(col("bigram"), " ").getItem(0))
      .join(uniCounts, "tok")
      .crossJoin(broadcast(vocab)) // one global scalar, not the model
      .withColumn("__nll",
        -log((col("__cab") + alpha) / (col("__ca") + col("__v") * alpha)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(avg(col("__nll"))), 3).as("perplexity"))
    corpus.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("perplexity"))
  }

  /** X52: stupid-backoff trigram LM scoring (Brants et al. 2007, public
    * knowledge — the backoff designed FOR distributed count tables: no
    * discount normalization, so every model artifact is a plain count
    * aggregate). Score S of token w3 after context (w1, w2):
    * `f(w1w2w3)/f(w1w2)`, backing off to `λ·f(w2w3)/f(w2)`, then to
    * `λ²·f(w3)/N`, with `λ²/N` as the floor for words the training
    * slice never saw (keeps -ln finite; documented, mirrored by the
    * oracle). The chain is a CASE over LEFT-join hits — a trigram seen
    * in training implies its context bigram was seen, so no branch can
    * divide by zero or NULL.
    *
    * The model is three count DataFrames + one scalar, never collected:
    * scoring is three key-partitioned joins (trigram, two bigram
    * probes share one table, two unigram probes share one) and a
    * per-doc aggregate. Docs under 3 tokens score NULL (kept).
    *
    * Output: (doc_id, n_trigrams, sb_nll) — mean -ln S, rounded to 3
    * decimals (lower = more fluent under the training slice). */
  def stupidBackoffScore(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, lambda: Double = 0.4): DataFrame = {
    require(lambda > 0 && lambda <= 1, s"lambda must be in (0,1], got $lambda")
    val tri = train.select(explode(Dedup.shingles(col(textCol), 3)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("__c3"))
    val bi = train.select(explode(Dedup.shingles(col(textCol), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("__c2"))
    val uni = train.select(explode(Dedup.words(col(textCol))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("__c1"))
    val total = train.select(explode(Dedup.words(col(textCol))).as("g"))
      .agg(count(lit(1)).as("__n"))
    val pos = score.select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(col(textCol), 3)).as("__tri"))
      .withColumn("__w", split(col("__tri"), " "))
      .withColumn("__ctx2", concat_ws(" ", col("__w").getItem(0),
        col("__w").getItem(1)))
      .withColumn("__lo2", concat_ws(" ", col("__w").getItem(1),
        col("__w").getItem(2)))
      .withColumn("__w2", col("__w").getItem(1))
      .withColumn("__w3", col("__w").getItem(2))
      .drop("__w")
    val scored = pos
      .join(tri.withColumnRenamed("g", "__tri"), Seq("__tri"), "left")
      .join(bi.select(col("g").as("__ctx2"), col("__c2").as("__cctx2")),
        Seq("__ctx2"), "left")
      .join(bi.select(col("g").as("__lo2"), col("__c2").as("__clo2")),
        Seq("__lo2"), "left")
      .join(uni.select(col("g").as("__w2"), col("__c1").as("__cw2")),
        Seq("__w2"), "left")
      .join(uni.select(col("g").as("__w3"), col("__c1").as("__cw3")),
        Seq("__w3"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__s",
        when(col("__c3").isNotNull, col("__c3") / col("__cctx2"))
          .when(col("__clo2").isNotNull,
            lit(lambda) * col("__clo2") / col("__cw2"))
          .when(col("__cw3").isNotNull,
            lit(lambda) * lit(lambda) * col("__cw3") / col("__n"))
          .otherwise(lit(lambda * lambda) / col("__n")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        round(avg(-log(col("__s"))), 3).as("sb_nll"))
    score.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("sb_nll"))
  }

  /** X110: N-GRAM NOVELTY vs a reference corpus — the fraction of a
    * document's distinct n-gram shingles NEVER seen in the reference
    * (the memorization/novelty metric generation-quality audits run,
    * and the corpus-side complement of X14's eval-set decontamination:
    * X14 asks "is eval text in train", this asks "how much of this text
    * is new relative to train"). Exact counts by construction.
    *
    * Shape: the reference reduces to its DISTINCT shingle set once
    * (types-sized); scoring docs left-anti-probe it keyed on the
    * shingle — one key-partitioned join, no broadcast requirement (the
    * reference may be corpus-sized; X61's Bloom prefilter is the
    * documented cheapening when it is). Output: (doc_id, n_distinct,
    * n_unseen, novelty) — docs under n words have 0 shingles and NULL
    * novelty. */
  def ngramNovelty(reference: DataFrame, score: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val refSet = reference
      .select(explode(Dedup.shingles(col(textCol), n)).as("g")).distinct()
    val docShingles = score.select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(col(textCol), n)).as("g")).distinct()
    val unseen = docShingles.join(refSet, Seq("g"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_unseen"))
    val totals = docShingles.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct"))
    score.select(col(idCol).as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(unseen, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        when(col("n_distinct") > 0,
          coalesce(col("n_unseen"), lit(0L)).cast("double") /
            col("n_distinct")).as("novelty"))
  }

  /** X106: FLESCH READING EASE (Flesch 1948, public knowledge) — the
    * classic readability signal curation stacks use alongside the
    * Gopher rules: `206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words)`. Sentences count as `[.!?]+` runs
    * (floored at 1 — a fragment is one sentence); syllables per word
    * as `[aeiouy]+` vowel groups floored at 1 (the standard
    * dictionary-free approximation — silent-e refinements are
    * deliberately omitted so the oracle mirrors the arithmetic
    * token-for-token). All counts exact integers; two divisions; one
    * projection over the corpus, zero shuffles. The per-word floor
    * runs in an `aggregate` HOF lambda (interpreted per element —
    * acceptable for one projection; the regex dominates anyway).
    * Docs with no words score NULL. */
  def readability(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val words = Dedup.words(col(textCol))
    val nWords = size(words)
    val nSentences = greatest(
      regexp_count(col(textCol), lit("[.!?]+")), lit(1))
    val nSyllables = aggregate(words, lit(0),
      (acc, w) => acc + greatest(regexp_count(w, lit("[aeiouy]+")), lit(1)))
    val flesch = lit(206.835) -
      lit(1.015) * (nWords.cast("double") / nSentences) -
      lit(84.6) * (nSyllables.cast("double") / nWords)
    df.select(col(idCol).as("doc_id"),
      nWords.cast("long").as("n_words"),
      nSentences.cast("long").as("n_sentences"),
      nSyllables.cast("long").as("n_syllables"),
      when(nWords > 0, graft.functions.quantize(flesch, 3)).as("flesch"))
  }

  /** X100: interpolated KNESER-NEY bigram scoring (Kneser & Ney 1995;
    * Chen & Goodman 1998 §2.7 — public knowledge), the smoothing that
    * actually ships in n-gram LMs (KenLM): absolute discounting plus a
    * CONTINUATION-count unigram — "how many distinct contexts does w
    * follow" rather than "how often does w occur" ("San Francisco"
    * makes `Francisco` frequent but a terrible novel-context guess).
    *
    * `P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁) + D·N₁₊(w₁·)/c(w₁) · P_cont(w₂)`
    * with `P_cont(w₂) = N₁₊(·w₂)/|bigram types|`. Unseen context w₁
    * backs off to P_cont(w₂) alone; a w₂ never seen as a continuation
    * floors at one type (keeps −ln finite; documented, oracle-mirrored).
    * Every quantity is an exact integer count, so cross-engine scores
    * agree to IEEE division determinism.
    *
    * Model = ONE aggregated bigram-count table; context totals,
    * distinct-forward and distinct-backward counts all derive from it
    * by re-aggregation (types-sized, not corpus-sized), and the type
    * count is a broadcast scalar. The training corpus is scanned once.
    * Scoring is key-partitioned joins + a per-doc aggregate — the same
    * 100 TB shape as [[stupidBackoffScore]]. Docs under 2 tokens score
    * NULL (kept). Output: (doc_id, n_bigrams, kn_nll). */
  def kneserNeyScore(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val big = graft.util.Caches.persistTracked(
      train.select(explode(Dedup.shingles(col(textCol), 2)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("__c12")))
    val ctx = big
      .withColumn("__w1", split(col("g"), " ").getItem(0))
      .groupBy(col("__w1"))
      .agg(sum(col("__c12")).as("__c1"), count(lit(1)).as("__nfwd"))
    val cont = big
      .withColumn("__w2", split(col("g"), " ").getItem(1))
      .groupBy(col("__w2")).agg(count(lit(1)).as("__nback"))
    val types = big.agg(count(lit(1)).cast("double").as("__types"))
    val pos = score.select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(col(textCol), 2)).as("g"))
      .withColumn("__w1", split(col("g"), " ").getItem(0))
      .withColumn("__w2", split(col("g"), " ").getItem(1))
    val d = lit(discount)
    val scored = pos
      .join(big, Seq("g"), "left")
      .join(ctx, Seq("__w1"), "left")
      .join(cont, Seq("__w2"), "left")
      .crossJoin(broadcast(types))
      .withColumn("__pcont",
        greatest(col("__nback"), lit(1L)).cast("double") / col("__types"))
      .withColumn("__p",
        when(col("__c1").isNotNull,
          greatest(coalesce(col("__c12"), lit(0L)) - d, lit(0.0)) /
            col("__c1") +
            d * col("__nfwd") / col("__c1") * col("__pcont"))
          .otherwise(col("__pcont")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("__p"))), 3).as("kn_nll"))
    score.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("kn_nll"))
  }

  /** X48: CCNet head/middle/tail bucketing (Wenzek et al. 2020, public
    * knowledge) — the SELECTION step the X42 perplexity signal feeds:
    * per language, documents sort by perplexity and split into equal
    * thirds (head = most fluent, tail = noisiest; CCNet trains on head+
    * middle). Exact percent_rank form: rank ties are impossible (doc id
    * tiebreak), thresholds are the float thirds both engines compute
    * identically. Unscorable docs (NULL perplexity — under 2 tokens)
    * are EXCLUDED from the ranking and bucketed 'unscored', not allowed
    * to shift everyone else's percentile.
    *
    * Scale note: percent_rank puts each language in ONE window
    * partition — one task sorts that language's whole slice, which is
    * exactly wrong at 100 TB with 70% English. This form is the
    * oracle-exact reference; [[perplexityBucketsByCutoff]] is the scale
    * path (per-lang percentile CUTOFFS — a map-side-combinable
    * aggregate — broadcast back; no per-lang sort anywhere). Output:
    * (doc_id, <langCol>, perplexity, ppl_rank, bucket). */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String, alpha: Double = 0.4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col("perplexity"), col("doc_id"))
    val ppl = bigramPerplexity(df, idCol, textCol, alpha)
      .join(df.select(col(idCol).as("doc_id"), col(langCol)), Seq("doc_id"))
    val scored = ppl.filter(col("perplexity").isNotNull)
      .withColumn("ppl_rank", graft.functions.q6(percent_rank().over(w)))
      .withColumn("bucket",
        when(col("ppl_rank") < lit(1.0 / 3), "head")
          .when(col("ppl_rank") < lit(2.0 / 3), "middle")
          .otherwise("tail"))
    val unscored = ppl.filter(col("perplexity").isNull)
      .withColumn("ppl_rank", lit(null).cast("double"))
      .withColumn("bucket", lit("unscored"))
    scored.unionByName(unscored)
      .select(col("doc_id"), col(langCol), col("perplexity"),
        col("ppl_rank"), col("bucket"))
  }

  /** X48 (scale form): the same head/middle/tail verdicts from per-lang
    * percentile CUTOFFS instead of a rank — `percentile(ppl, 1/3)` and
    * `percentile(ppl, 2/3)` per language (one aggregate whose result is
    * language-count-sized), broadcast back onto the corpus as two
    * comparisons. No window, no per-lang sort task, corpus scanned
    * once past the X42 scoring. Boundary docs whose perplexity EQUALS a
    * cutoff go to the lower bucket (ties share a bucket here — the rank
    * form splits ties by doc id; the spec pins the agreement on
    * tie-free data). */
  def perplexityBucketsByCutoff(df: DataFrame, idCol: String,
      textCol: String, langCol: String, alpha: Double = 0.4): DataFrame = {
    val ppl = bigramPerplexity(df, idCol, textCol, alpha)
      .join(df.select(col(idCol).as("doc_id"), col(langCol)), Seq("doc_id"))
    val cuts = ppl.filter(col("perplexity").isNotNull)
      .groupBy(col(langCol))
      .agg(percentile(col("perplexity"), lit(1.0 / 3)).as("__c1"),
        percentile(col("perplexity"), lit(2.0 / 3)).as("__c2"))
    ppl.join(broadcast(cuts), Seq(langCol), "left")
      .withColumn("bucket",
        when(col("perplexity").isNull, "unscored")
          .when(col("perplexity") <= col("__c1"), "head")
          .when(col("perplexity") <= col("__c2"), "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col(langCol), col("perplexity"), col("bucket"))
  }

  /** PII patterns for [[redact]] — deliberately dialect-neutral regexes
    * (no lookarounds/backrefs) so an RE2-based engine matches Java's
    * behaviour exactly. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
    "phone" -> "\\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}",
    "ssn" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}")

  /** Training-data PII scrub: per pattern, count matches and replace them
    * with a `[TYPE]` placeholder. One projection, no shuffle; rows with
    * any hit are flagged for routing to quarantine. */
  def redact(df: DataFrame, textCol: String,
      patterns: Seq[(String, String)] = PiiPatterns): DataFrame = {
    val counted = patterns.foldLeft(df) { case (d, (name, p)) =>
      d.withColumn(s"n_$name", regexp_count(col(textCol), lit(p)).cast("long"))
    }
    val redacted = patterns.foldLeft(col(textCol)) { case (c, (name, p)) =>
      regexp_replace(c, p, s"[${name.toUpperCase}]")
    }
    counted
      .withColumn("redacted_text", redacted)
      .withColumn("has_pii",
        patterns.map(p => col(s"n_${p._1}") > 0).reduce(_ || _))
  }

  /** X150: IBAN MOD-97 VALIDATION — [[luhnCardCandidates]]'s sibling
    * for bank-account PII (ISO 13616 / ISO 7064, public knowledge):
    * a candidate only counts when the check passes — rearrange
    * (move the leading country+check 4 chars to the end), map letters
    * A..Z → 10..35, and fold the resulting digit stream mod 97; valid
    * iff the residue is 1. The fold multiplies the accumulator by 10
    * per digit and 100 per letter and reduces mod 97 EVERY step, so
    * the value never leaves INT range — a pure codegen `aggregate`
    * over character positions, no UDF, no big-integer; the oracle
    * mirrors it with `list_reduce`. Checksum-only by design (the
    * per-country length table is reference DATA, not an algorithm —
    * callers wanting it join one). Output: one row per candidate —
    * (id, candidate, n_chars, mod97, iban_valid). */
  def ibanCandidates(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val cand = regexp_extract_all(upper(col(textCol)),
      lit("[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}"), lit(0))
    val re = concat(col("candidate").substr(lit(5), lit(34)),
      col("candidate").substr(lit(1), lit(4)))
    val mod = aggregate(
      sequence(lit(0), length(col("__re")) - 1),
      lit(0),
      (acc, i) => {
        val ch = ascii(col("__re").substr(i + 1, lit(1)))
        when(ch >= 65, // A..Z -> two digits 10..35
          pmod(acc * 100 + (ch - 55), lit(97)))
          .otherwise(pmod(acc * 10 + (ch - 48), lit(97)))
      })
    df.select(col(idCol).as("id"), explode(cand).as("candidate"))
      .withColumn("__re", re)
      .withColumn("n_chars", length(col("candidate")).cast("long"))
      .withColumn("mod97", mod.cast("long"))
      .withColumn("iban_valid", (col("mod97") === 1).cast("int"))
      .drop("__re")
  }

  /** X148: UNICODE-SCRIPT PROFILE — the character-class census that
    * runs BEFORE language ID in web-corpus pipelines (a fasttext-style
    * lang model is useless on a page whose dominant script it never
    * saw; script routing is how CCNet shards the crawl). Per document:
    * counts of Latin / Cyrillic / CJK / Arabic / digit / whitespace
    * codepoints (character-class regexes written as LITERAL codepoint
    * ranges, not \\u escapes — Java regex and RE2 read those
    * identically), the dominant script by exact count with a fixed
    * precedence tie-break, and quantized ratios over total length.
    * One projection, zero shuffle, codegen-friendly `regexp_count`.
    * Empty texts report 'none'. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val classes = Seq(
      "latin" -> "[A-Za-zÀ-ɏ]",
      "cyrillic" -> "[Ѐ-ӿ]",
      "cjk" -> "[一-鿿぀-ヿ]",
      "arabic" -> "[؀-ۿ]",
      "digit" -> "[0-9]",
      "space" -> "[ \\t\\n]")
    val counted = classes.foldLeft(
      df.select(col(idCol).as("id"), col(textCol).as("__t"))) {
      case (d, (name, p)) =>
        d.withColumn(s"n_$name",
          regexp_count(col("__t"), lit(p)).cast("long"))
    }
    val scripts = Seq("latin", "cyrillic", "cjk", "arabic")
    val mx = greatest(scripts.map(s => col(s"n_$s")): _*)
    val dominant = scripts.foldRight(lit("none")) { (s, acc) =>
      when(mx > 0 && col(s"n_$s") === mx, s).otherwise(acc)
    }
    val total = length(col("__t")).cast("long")
    counted
      .withColumn("n_chars", total)
      .withColumn("dominant_script", dominant)
      .withColumn("latin_ratio",
        graft.functions.q6(when(total > 0,
          col("n_latin").cast("double") / total.cast("double"))))
      .withColumn("nonspace_other_ratio",
        graft.functions.q6(when(total > 0,
          (total - scripts.map(s => col(s"n_$s")).reduce(_ + _) -
            col("n_digit") - col("n_space")).cast("double") /
            total.cast("double"))))
      .drop("__t")
  }

  /** X147: LUHN-VALIDATED CARD-NUMBER DETECTION — the precision layer
    * over [[redact]]'s regex recall: a 13–19 digit run is only PII-risk
    * if it passes the Luhn mod-10 checksum (ISO/IEC 7812, public
    * knowledge — the check every real PAN satisfies), which kills the
    * order-id/timestamp false positives that make naive digit-run
    * scrubbing useless. One projection: candidates via a
    * dialect-neutral regex (digit runs with optional space/dash
    * separators), digits normalized, the checksum folded as a pure
    * `aggregate` expression over the reversed digit positions (double
    * every second digit, subtract 9 past 9) — codegen-friendly, no
    * UDF, mirrored digit-for-digit by the oracle. Output: one row per
    * candidate span — (id, candidate, digits, n_digits, luhn_valid);
    * docs without candidates emit nothing (count-style rollups join
    * back on id). */
  def luhnCardCandidates(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val cand = regexp_extract_all(col(textCol),
      lit("[0-9][0-9 -]{11,21}[0-9]"), lit(0))
    val digits = regexp_replace(col("candidate"), "[^0-9]", "")
    val rev = reverse(col("digits"))
    val luhnSum = aggregate(
      sequence(lit(0), length(col("digits")) - 1),
      lit(0),
      (acc, i) => {
        val d = rev.substr(i + 1, lit(1)).cast("int")
        acc + when(pmod(i, lit(2)) === 0, d)
          .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
      })
    df.select(col(idCol).as("id"), explode(cand).as("candidate"))
      .withColumn("digits", digits)
      .withColumn("n_digits", length(col("digits")).cast("long"))
      .filter(col("n_digits").between(13, 19))
      .withColumn("luhn_valid",
        (pmod(luhnSum, lit(10)) === 0).cast("int"))
  }

  /** Second-level labels under which the registrable domain keeps THREE
    * labels (a public-suffix-list-lite heuristic — the full PSL is a
    * data file, not an algorithm; this covers the common cc-TLD shapes
    * like `co.uk` / `com.au` / `ac.jp`). */
  private val SecondLevelSuffixes =
    Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** X65: URL-domain filtering (the C4 / RefinedWeb curation step:
    * drop documents from blocklisted domains, Raffel et al. 2020):
    * extract the host from a URL column, reduce it to its registrable
    * domain (last two labels, or three under `co.uk`-style suffixes),
    * and flag rows whose registrable domain is in `blocked` — subdomains
    * included by construction, since matching happens on the reduced
    * domain. One projection; the blocklist is a literal `isin` filter
    * (at a realistic million-domain blocklist: swap the isin for a
    * broadcast left-semi join on the same column — no other change).
    * Bad/relative URLs yield NULL host and are never blocked. */
  def domainVerdict(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    val host0 = regexp_extract(col(urlCol), "^https?://([^/:?#]+)", 1)
    val host = when(length(host0) > 0, lower(host0))
    val parts = split(host, "\\.")
    val n = size(parts)
    val reg = when(host.isNull, lit(null).cast("string"))
      .when(n <= 2, host)
      .when(element_at(parts, -2).isin(SecondLevelSuffixes: _*),
        concat_ws(".", slice(parts, -3, 3)))
      .otherwise(concat_ws(".", slice(parts, -2, 2)))
    df.withColumn("host", host)
      .withColumn("registered_domain", reg)
      .withColumn("is_blocked",
        coalesce(col("registered_domain").isin(blocked: _*), lit(false)))
  }

  /** X120: VOCABULARY COVERAGE CURVE — "what fraction of corpus
    * tokens does a top-k vocabulary cover": the first number a
    * tokenizer design fixes (the k where coverage crosses 99.x%
    * decides the vocab budget; everything past it lands on <unk> or
    * byte fallbacks). For each requested k (with k ≤ #types), the
    * cumulative token count of the k most frequent types under the
    * total (count desc, token) order, as an exact share.
    *
    * Scale: one map-side-combined token aggregate, then the two-phase
    * prefix sum ([[graft.relational.Ranks.prefixSums]]) carrying BOTH
    * the rank and the cumulative count — no global-order window at
    * any vocabulary size; the output is |ks| rows picked by rank.
    * Counts exact; coverage is one correctly-rounded division.
    * Output: (k, covered_tokens, total_tokens, coverage), one row per
    * requested k that exists (k > #types emits nothing — documented). */
  def vocabCoverage(df: DataFrame, textCol: String,
      ks: Seq[Long] = Seq(100L, 1000L, 10000L, 50000L)): DataFrame = {
    require(ks.nonEmpty, "vocabCoverage: no k values")
    ks.foreach(k => require(k >= 1, s"k must be >= 1, got $k"))
    val counts = df
      .select(explode(graft.text.Dedup.words(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("__c"))
    val (ranked, totals) = graft.relational.Ranks.prefixSumsWithTotals(
      counts, Seq(col("__c").desc, col("token")),
      Seq("__rank" -> lit(1L), "__cum" -> col("__c")))
    val total = totals(1)
    require(total > 0, "vocabCoverage: empty corpus")
    ranked.filter(col("__rank").isin(ks: _*))
      .select(col("__rank").as("k"), col("__cum").as("covered_tokens"),
        lit(total).as("total_tokens"),
        (col("__cum").cast("double") / lit(total.toDouble))
          .as("coverage"))
  }

  /** X118: UNIGRAM DIVERGENCE between two corpora — the vocabulary-
    * drift monitor mixture designers run when a new source lands:
    * which tokens are most over/under-represented in corpus A vs
    * corpus B, by per-token KL contribution `p_a·ln(p_a/p_b)` (and
    * the symmetric JS contribution), over add-half-smoothed
    * probabilities on the JOINT vocabulary (the chi²-drift smoothing
    * discipline: unseen tokens get mass, never a ln(0)).
    *
    * Deliberately emits the top-`topK` CONTRIBUTOR TABLE, not a
    * summed scalar: the table is what an operator acts on, and it
    * sidesteps the distributed-double-sum reproducibility hazard
    * entirely — every output value is exact counts through a fixed
    * IEEE expression (one division per probability, ln on identical
    * operands). Ranking is round-6 |kl| desc then token asc — total,
    * deterministic.
    *
    * Scale: two map-side-combined token aggregates, one vocab-sized
    * full-outer join, TakeOrdered top-k (per-partition k then one
    * k-sized merge — never a global sort). Output: (token, n_a, n_b,
    * p_a, p_b, kl_contrib, js_contrib), round-6. */
  def unigramDivergence(a: DataFrame, b: DataFrame, textCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    def counts(df: DataFrame) = df
      .select(explode(graft.text.Dedup.words(col(textCol)))
        .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
    val joint = graft.util.Caches.persistTracked(
      counts(a).withColumnRenamed("c", "n_a")
        .join(counts(b).withColumnRenamed("c", "n_b"),
          Seq("token"), "full_outer")
        .select(col("token"), coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b")))
    val tot = joint.agg(sum(col("n_a")), sum(col("n_b")),
      count(lit(1))).head()
    val (na, nb, v) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    require(na > 0 && nb > 0, "unigramDivergence: an empty corpus")
    val pa = (col("n_a").cast("double") + lit(0.5)) /
      lit(na.toDouble + 0.5 * v)
    val pb = (col("n_b").cast("double") + lit(0.5)) /
      lit(nb.toDouble + 0.5 * v)
    val m = (pa + pb) / lit(2.0)
    joint
      .withColumn("p_a", pa).withColumn("p_b", pb)
      .withColumn("__kl", col("p_a") * log(col("p_a") / col("p_b")))
      .withColumn("__js", lit(0.5) *
        (col("p_a") * log(col("p_a") / m) +
          col("p_b") * log(col("p_b") / m)))
      .orderBy(round(abs(col("__kl")), 6).desc, col("token"))
      .limit(topK)
      .select(col("token"), col("n_a"), col("n_b"),
        graft.functions.q6(col("p_a")).as("p_a"),
        graft.functions.q6(col("p_b")).as("p_b"),
        round(col("__kl"), 6).as("kl_contrib"),
        round(col("__js"), 6).as("js_contrib"))
  }

  /** X128: TF-IDF TOP TERMS per document (the classic smoothed
    * log-weighting, public knowledge — Salton & Buckley 1988):
    * `w = (1 + ln tf) · ln((N + 1)/(df + 1))`, top-`k` terms per doc
    * under the (w desc, token) total order — the per-document keyword
    * profile BM25 retrieval (X51) and DSIR targeting (X43) read, and
    * the cheap doc summary a curation dashboard shows.
    *
    * Determinism: tf/df/N are exact integers and the weight is one
    * fixed IEEE ln/multiply expression over them — bit-identical
    * cross-engine (the q_x51 BM25 oracle already pins engine-bitwise
    * `ln` on this input class); equal weights tie-break by token.
    *
    * Scale: one explode + two token aggregates (map-side combined),
    * the doc count a broadcast 1-row aggregate, and a doc-keyed rank
    * window (never global). Output: (doc_id, token, tf, df, tfidf,
    * rank), ≤ k rows per doc. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("doc_id"),
      explode(Dedup.words(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count_distinct(col(idCol)).as("__n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        (lit(1.0) + log(col("tf").cast("double"))) *
          log((col("__n").cast("double") + lit(1.0)) /
            (col("df").cast("double") + lit(1.0))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** X131: DISTINCT-N DIVERSITY REPORT per group — `distinct-n` =
    * distinct n-grams / total n-grams (Li et al. 2016, public
    * knowledge): the standard template/mode-collapse detector for
    * synthetic or over-deduplicated corpora (a distinct-2 collapsing
    * toward 0 means the corpus is repeating itself). One row per
    * (group, n) with exact total/distinct counts and the ratio.
    *
    * Scale: per n one explode + one map-side-combined aggregate over
    * (group, gram) then (group) — the exact-distinct is the honest
    * default (swap approx_count_distinct at extreme gram cardinality,
    * same contract). Groups with no n-grams at order n (all docs
    * shorter than n) emit no row rather than 0/0. */
  def distinctNgramReport(df: DataFrame, groupCol: String,
      textCol: String, ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n list: $ns")
    val perN = ns.map { n =>
      val grams =
        if (n == 1) df.select(col(groupCol).as("group"),
          explode(Dedup.words(col(textCol))).as("__g"))
        else df.select(col(groupCol).as("group"),
          explode(Dedup.shingles(col(textCol), n)).as("__g"))
      grams.groupBy(col("group"))
        .agg(count(lit(1)).as("total_ngrams"),
          count_distinct(col("__g")).as("distinct_ngrams"))
        .select(col("group"), lit(n).as("n"), col("total_ngrams"),
          col("distinct_ngrams"),
          (col("distinct_ngrams").cast("double") /
            col("total_ngrams").cast("double")).as("distinct_ratio"))
    }
    perN.reduce(_ unionByName _)
  }

  /** X132: SOURCE OVERLAP MATRIX — pairwise n-gram contamination
    * between corpus groups (sources, snapshots, vendors): for every
    * group pair the count of SHARED distinct `shingleN`-grams and the
    * Jaccard over distinct grams — the due-diligence table read before
    * mixing a new data source ("vendor B is 40% n-gram-identical to
    * what we already have"). Complements X14 decontamination (doc vs
    * eval-set) with a corpus-vs-corpus view.
    *
    * Scale: grams are DISTINCT per group first (bounds the join input
    * by vocabulary, not token volume), the self-join meets only on
    * equal grams (shuffle on the gram key — the inherent work), and
    * the output is |groups|²-bounded. Pairs sharing nothing emit no
    * row. Output: (group_a, group_b, n_a, n_b, n_shared, jaccard)
    * with group_a < group_b. */
  def sourceOverlapMatrix(df: DataFrame, groupCol: String,
      textCol: String, shingleN: Int = 8): DataFrame = {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    val grams = graft.util.Caches.persistTracked(
      df.select(col(groupCol).as("group"),
        explode(Dedup.shingles(col(textCol), shingleN)).as("__g"))
        .distinct())
    val sizes = grams.groupBy(col("group"))
      .agg(count(lit(1)).as("n"))
    val shared = grams.select(col("group").as("group_a"), col("__g"))
      .join(grams.select(col("group").as("group_b"), col("__g")), "__g")
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("group").as("group_a"),
        col("n").as("n_a")), "group_a")
      .join(sizes.select(col("group").as("group_b"),
        col("n").as("n_b")), "group_b")
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        (col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
          .as("jaccard"))
  }

  /** X133: CORPUS DATA CARD — the one-table headline summary a
    * training run publishes alongside its weights (the "datasheet"
    * practice, Gebru et al. 2018, public knowledge): document /
    * source / language counts, token and char volume, and the exact
    * duplicate incidence, as (metric, value) rows. Every number is a
    * plain exact aggregate — two passes (corpus stats + the md5 dup
    * census), both map-side combined; rates are single divisions.
    * Output: (metric, value) sorted by metric. */
  def dataCard(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.agg(
      count(lit(1)).cast("double").as("n_docs"),
      count_distinct(col(sourceCol)).cast("double").as("n_sources"),
      count_distinct(col(langCol)).cast("double").as("n_langs"),
      sum(coalesce(size(Dedup.words(col(textCol))), lit(0)))
        .cast("double").as("total_tokens"),
      sum(length(col(textCol))).cast("double").as("total_chars"))
    val dup = df.select(md5(col(textCol)).as("__h"))
      .groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)),
        lit(0L)).cast("double").as("dup_docs"),
        coalesce(sum(col("__c")), lit(0L)).cast("double").as("__n"))
    val joined = base.crossJoin(broadcast(dup))
    val metrics = Seq("n_docs" -> col("n_docs"),
      "n_sources" -> col("n_sources"), "n_langs" -> col("n_langs"),
      "total_tokens" -> col("total_tokens"),
      "total_chars" -> col("total_chars"),
      "exact_dup_docs" -> col("dup_docs"),
      "exact_dup_rate" -> col("dup_docs") / col("__n"))
    joined.select(explode(array(metrics.map { case (name, c) =>
      struct(lit(name).as("metric"), c.as("value")) }: _*)).as("__m"))
      .select(col("__m.*"))
  }

  /** X135: TOKENIZER FERTILITY REPORT per language — the
    * chars-per-token and subword-per-word ratios a tokenizer budget is
    * planned from (a high-fertility language pays more context per
    * sentence): exact corpus sums of whitespace words, BPE-ish regex
    * tokens (the X5 counter) and characters, with one exact division
    * per ratio. One aggregate; languages with zero words emit NULL
    * ratios. Output: (lang, n_docs, words, bpe_tokens, chars,
    * bpe_per_word, chars_per_bpe). */
  def tokenizerFertility(df: DataFrame, langCol: String,
      textCol: String): DataFrame = {
    val (nTok, nBpe) = tokenCounts(col(textCol))
    df.select(col(langCol).as("lang"), nTok.as("__w"), nBpe.as("__b"),
        length(col(textCol)).cast("long").as("__c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("words"),
        sum(col("__b")).as("bpe_tokens"), sum(col("__c")).as("chars"))
      .select(col("lang"), col("n_docs"), col("words"),
        col("bpe_tokens"), col("chars"),
        when(col("words") > 0, col("bpe_tokens").cast("double") /
          col("words").cast("double")).as("bpe_per_word"),
        when(col("bpe_tokens") > 0, col("chars").cast("double") /
          col("bpe_tokens").cast("double")).as("chars_per_bpe"))
  }

  /** F39: BLEU pair scorer (Papineni et al. 2002, ACL) — the n-gram
    * overlap metric for generated-vs-reference text, run as a relation:
    * one row per (candidate, reference) pair with the modified n-gram
    * precisions p_1..p_maxN (reference counts CLIP each candidate
    * gram's credit — the "the the the" defense), the brevity penalty
    * `min(1, e^{1−r/c})`, and BLEU = BP·exp(Σ ln p_n / N). A pair with
    * any zero precision (or an empty candidate) scores 0, the standard
    * unsmoothed convention — deterministic, no ln(0).
    *
    * Tokens/grams are the corpus-wide [[graft.text.Dedup.words]]/
    * [[Dedup.shingles]] used by every dedup operator (same strings,
    * same oracle mirror). Counts are exact BIGINTs; clip is
    * `least(c, r)` under a per-(pair, gram) left join; each precision
    * divides once; only ln/exp-bearing outputs are quantized-6.
    *
    * 100 TB: gram counting is groupBy (pair, gram) with map-side
    * combine; the clip join is an equi-join on the same key; per-order
    * results reduce onto the pair table by key — no windows, no
    * driver state. Output: (key, c_len, r_len, p_1..p_maxN, bp,
    * bleu). */
  /** F41: ROUGE-N pair scorer (Lin 2004) — the RECALL-oriented
    * complement of [[bleuPairs]] ("how much of the reference did the
    * candidate cover"), the summarization-eval standard. Per pair and
    * per order n ∈ {1, 2}: clipped overlap `Σ min(c_cand, c_ref)`,
    * recall = overlap/ref_total, precision = overlap/cand_total, and
    * F1 in its SINGLE-DIVISION form `2·overlap/(cand_total+ref_total)`
    * (the p·r composition would round twice and drift cross-engine).
    * Zero-gram sides emit NULL metrics, never a division error.
    *
    * Same exact-count/left-join clip shape and the same corpus-wide
    * word/shingle strings as BLEU; every ratio divides once from exact
    * BIGINTs — no quantization needed. Output: (key, c_len, r_len,
    * rouge1_overlap, rouge1_r, rouge1_p, rouge1_f, rouge2_overlap,
    * rouge2_r, rouge2_p, rouge2_f). */
  def rougePairs(pairs: DataFrame, keyCol: Column, candCol: Column,
      refCol: Column): DataFrame = {
    val base = pairs.select(keyCol.as("key"), candCol.as("__cand"),
      refCol.as("__ref"))
      .withColumn("c_len", size(Dedup.words(col("__cand"))).cast("long"))
      .withColumn("r_len", size(Dedup.words(col("__ref"))).cast("long"))
    def grams(c: Column, n: Int): Column =
      if (n == 1) Dedup.words(c) else Dedup.shingles(c, n)
    val perOrder = Seq(1, 2).map { n =>
      val cg = base.select(col("key"),
        explode(grams(col("__cand"), n)).as("__g"))
        .groupBy(col("key"), col("__g")).agg(count(lit(1)).as("__c"))
      val rg = base.select(col("key"),
        explode(grams(col("__ref"), n)).as("__g"))
        .groupBy(col("key"), col("__g")).agg(count(lit(1)).as("__r"))
      // drive from the REFERENCE side: recall's denominator must count
      // every reference gram even when the candidate lacks it
      rg.join(cg, Seq("key", "__g"), "left")
        .groupBy(col("key"))
        .agg(sum(least(coalesce(col("__c"), lit(0L)), col("__r")))
          .as(s"__ov_$n"),
          sum(col("__r")).as(s"__rt_$n"))
    }
    val candTotals = Seq(1, 2).map { n =>
      base.select(col("key"),
        explode(grams(col("__cand"), n)).as("__g"))
        .groupBy(col("key")).agg(count(lit(1)).as(s"__ct_$n"))
    }
    val joined = (perOrder ++ candTotals).foldLeft(
      base.select(col("key"), col("c_len"), col("r_len"))) {
      (acc, o) => acc.join(o, Seq("key"), "left")
    }
    def metrics(n: Int) = {
      val ov = coalesce(col(s"__ov_$n"), lit(0L))
      val rt = coalesce(col(s"__rt_$n"), lit(0L))
      val ct = coalesce(col(s"__ct_$n"), lit(0L))
      Seq(ov.as(s"rouge${n}_overlap"),
        when(rt > 0, ov.cast("double") / rt.cast("double"))
          .as(s"rouge${n}_r"),
        when(ct > 0, ov.cast("double") / ct.cast("double"))
          .as(s"rouge${n}_p"),
        when(ct + rt > 0,
          (lit(2.0) * ov.cast("double")) / (ct + rt).cast("double"))
          .as(s"rouge${n}_f"))
    }
    joined.select(Seq(col("key"), col("c_len"), col("r_len")) ++
      metrics(1) ++ metrics(2): _*)
  }

  def bleuPairs(pairs: DataFrame, keyCol: Column, candCol: Column,
      refCol: Column, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 4, s"maxN must be in [1, 4], got $maxN")
    val base = pairs.select(keyCol.as("key"), candCol.as("__cand"),
      refCol.as("__ref"))
      .withColumn("c_len", size(Dedup.words(col("__cand"))).cast("long"))
      .withColumn("r_len", size(Dedup.words(col("__ref"))).cast("long"))
    def grams(c: Column, n: Int): Column =
      if (n == 1) Dedup.words(c) else Dedup.shingles(c, n)
    val perOrder = (1 to maxN).map { n =>
      val cg = base.select(col("key"),
        explode(grams(col("__cand"), n)).as("__g"))
        .groupBy(col("key"), col("__g")).agg(count(lit(1)).as("__c"))
      val rg = base.select(col("key"),
        explode(grams(col("__ref"), n)).as("__g"))
        .groupBy(col("key"), col("__g")).agg(count(lit(1)).as("__r"))
      cg.join(rg, Seq("key", "__g"), "left")
        .groupBy(col("key"))
        .agg(sum(least(col("__c"), coalesce(col("__r"), lit(0L))))
          .as(s"__clip_$n"),
          sum(col("__c")).as(s"__tot_$n"))
    }
    val joined = perOrder.foldLeft(
      base.select(col("key"), col("c_len"), col("r_len"))) {
      (acc, o) => acc.join(o, Seq("key"), "left")
    }
    val withZeros = (1 to maxN).foldLeft(joined) { (d, n) =>
      d.withColumn(s"__clip_$n", coalesce(col(s"__clip_$n"), lit(0L)))
        .withColumn(s"__tot_$n", coalesce(col(s"__tot_$n"), lit(0L)))
    }
    val allPositive = (1 to maxN).map(n =>
      col(s"__clip_$n") > 0 && col(s"__tot_$n") > 0).reduce(_ && _)
    val logSum = (1 to maxN).map(n =>
      log(col(s"__clip_$n").cast("double") /
        col(s"__tot_$n").cast("double"))).reduce(_ + _)
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("r_len").cast("double") / col("c_len").cast("double")))
    val precisions = (1 to maxN).map(n =>
      graft.functions.q6(when(col(s"__tot_$n") > 0,
        col(s"__clip_$n").cast("double") /
          col(s"__tot_$n").cast("double"))).as(s"p_$n"))
    withZeros.select(Seq(col("key"), col("c_len"), col("r_len")) ++
      precisions ++ Seq(
      graft.functions.q6(when(col("c_len") > 0, bp)).as("bp"),
      graft.functions.q6(when(col("c_len") > 0 && allPositive,
        bp * exp(logSum / lit(maxN.toDouble))).otherwise(lit(0.0)))
        .as("bleu")): _*)
  }
}
