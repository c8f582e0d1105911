package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X163: RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010,
  * public knowledge) — the phrase-level complement of X160 TextRank
  * (which ranks single tokens) and X128 tf-idf (which rewards rarity):
  * candidate phrases are the maximal runs of non-stopword tokens, each
  * scored by the sum of its members' degree/frequency ratios, so
  * multi-word technical phrases ("data quality report") outrank their
  * common constituents.
  *
  * Definitions (the paper's §1.2): over every phrase occurrence,
  * `freq(w)` = number of occurrences of word w inside phrases and
  * `deg(w)` = Σ over those occurrences of the containing phrase's
  * length (deg counts the word itself — deg(w) ≥ freq(w));
  * `score(w) = deg(w)/freq(w)`; a phrase scores the sum of its member
  * word scores, and identical phrase STRINGS are one candidate (their
  * member multiset — hence score — is identical by construction) with
  * an occurrence count.
  *
  * Determinism: deg and freq are exact BIGINTs; each word score is ONE
  * correctly-rounded double division floor-scaled to a 1e9 LONG (the
  * X152/F65 discipline), so per-phrase sums are order-free integer
  * adds and cross-engine identical; the published score is the scaled
  * sum divided once, quantized-6; top-k order is (scaled score desc,
  * phrase asc) — total.
  *
  * Scale: one posexplode projection; the stopword-boundary run id is a
  * per-DOC window (bounded by document length, the sessionize
  * discipline); word stats are one map-side-combined groupBy over the
  * member table; phrase assembly is one (doc, run) groupBy whose
  * collect_list is bounded by phrase length (a handful of tokens —
  * boundaries are stopwords, the most frequent tokens in natural
  * text); candidates aggregate by phrase string. No pair joins, no
  * global windows; the final top-k is a TakeOrdered. */
object Rake {
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 20,
      stopwords: Seq[String] = TextStats.Stopwords.toMap.apply("en"))
      : DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(stopwords.nonEmpty, "rakeKeywords: empty stopword list")
    val toks = df.select(col(idCol).as("__d"),
        posexplode(Dedup.words(col(textCol))).as(Seq("__pos", "__w")))
      .filter(length(col("__w")) > 0)
      .withColumn("__stop",
        when(col("__w").isInCollection(stopwords), 1L).otherwise(0L))
    // run id = stopwords seen so far in the doc: a per-doc ordered
    // window (bounded by doc length); non-stop tokens sharing a run id
    // between two stopword boundaries form one phrase occurrence
    val w = Window.partitionBy(col("__d")).orderBy(col("__pos"))
    val members = graft.util.Caches.persistTracked(
      toks.withColumn("__run", sum(col("__stop")).over(w))
        .filter(col("__stop") === 0L)
        .select(col("__d"), col("__run"), col("__pos"), col("__w")))
    val phraseLen = members.groupBy(col("__d"), col("__run"))
      .agg(count(lit(1)).as("__len"))
    val withLen = members.join(phraseLen, Seq("__d", "__run"))
    val wordScores = withLen.groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      // ONE correctly-rounded division, floor-scaled: order-free
      // integer phrase sums, engine-identical (the X152 discipline)
      .withColumn("__ws", floor(
        col("__deg").cast("double") / col("__freq").cast("double") *
          lit(1e9) + lit(0.5)).cast("long"))
      .select(col("__w"), col("__ws"))
    val phrases = withLen.join(wordScores, "__w")
      .groupBy(col("__d"), col("__run"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__pos"), col("__w")))),
          s => s.getField("__w"))).as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("__ws")).as("__score"))
    import graft.functions.q6
    phrases.groupBy(col("phrase"))
      .agg(min(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        min(col("__score")).as("__s"))
      .orderBy(col("__s").desc, col("phrase"))
      .limit(topK)
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        q6(col("__s").cast("double") / lit(1e9)).as("score"))
  }
}
