package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (the SentencePiece unigram model, Kudo
  * 2018 — public knowledge), as hard-EM: E-step = Viterbi-best
  * segmentation of each distinct word under the current piece
  * log-probabilities, M-step = re-estimate probabilities from the
  * frequency-weighted piece counts, then prune to the vocabulary budget.
  * (Kudo's soft-EM uses forward–backward expected counts; the Viterbi
  * hard assignment is the standard simplification and converges on the
  * same high-probability pieces for corpus-scale counts.)
  *
  * Distributed shape — the insight that makes tokenizer training cheap
  * at 100 TB: after the first aggregate, NOTHING is corpus-sized. EM
  * runs over the distinct-WORD table (Zipf: orders of magnitude smaller
  * than the corpus) with each word carrying its corpus frequency; the
  * vocabulary is bounded (a tokenizer vocab is ~10⁴–10⁵ pieces BY
  * DESIGN) so it broadcasts to the Viterbi UDF; every count is a
  * map-side-combined aggregate. The driver holds only the vocab table.
  *
  * Determinism: counts are exact integers; every ranking ties-breaks on
  * the piece string; Viterbi prefers the FIRST strictly-better
  * extension scanning piece lengths ascending — independent engines and
  * partitionings reproduce identical vocabularies and segmentations
  * (spec-proven across repartitionings).
  */
object Unigram {
  private val UnkLogProb = -23.025850929940457 // ln(1e-10): always beaten

  /** Unsigned UTF-8 byte order — Spark's UTF8String (and DuckDB's
    * binary collation) string order, which JVM String.compareTo
    * (UTF-16 code units) diverges from on supplementary characters.
    * Driver-side tie-breaks must rank exactly like the engine sorts. */
  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    var r = 0
    while (i < n && r == 0) { r = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
    if (r != 0) r else x.length - y.length
  }

  /** (count desc, piece asc-utf8) — the engine-identical prune order. */
  private def pruneOrder: Ordering[(String, Long)] =
    Ordering.by[(String, Long), Long](-_._2)
      .orElse(Ordering.by[(String, Long), String](_._1)(utf8Order))

  /** Viterbi-best segmentation of `word` under `logp`; unknown single
    * characters survive at [[UnkLogProb]] so segmentation never fails. */
  private[text] def viterbi(word: String, logp: Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1) // piece length ending at i
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= maxPieceLen && j <= i) {
        val piece = word.substring(i - j, i)
        val lp = logp.getOrElse(piece,
          if (j == 1) UnkLogProb else Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && best(i - j) + lp > best(i)) {
          best(i) = best(i - j) + lp
          back(i) = j
        }
        j += 1
      }
      i += 1
    }
    var at = n
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    while (at > 0) { rev += word.substring(at - back(at), at); at -= back(at) }
    out ++= rev.reverse
    out.result()
  }

  /** Distinct words of the corpus with their total frequencies — the
    * table EM actually iterates on. */
  private def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))

  /** Train a unigram vocabulary of (up to) `vocabSize` pieces over the
    * corpus. Returns (piece, piece_count, logprob) — counts from the
    * final E-step, log-probabilities from the final M-step. Single
    * characters seen in the corpus are always retained (full coverage,
    * the SentencePiece `character_coverage = 1.0` contract) with
    * count floored at 1 so their probability never hits −∞. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 4, iterations: Int = 4,
      seedMultiplier: Int = 4): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = df.sparkSession
    // self-contained persist: train() materializes everything it needs
    // before returning (the vocab IS driver-sized), so the word table is
    // released here, not by the caller
    val words = wordCounts(df, textCol).persist()

    val subUdf = udf { (w: String) =>
      (for {
        i <- 0 until w.length
        j <- (i + 1) to math.min(i + maxPieceLen, w.length)
      } yield w.substring(i, j)): Seq[String]
    }
    // seed: substring occurrences weighted by word frequency, top
    // seedMultiplier·vocabSize by (count desc, piece) + all single chars.
    // The count table is vocab-candidate-sized (distinct substrings of
    // DISTINCT words, Zipf-bounded), so one collect and driver-side
    // prune/floor replaces what was previously a re-computed aggregate
    // per DAG branch — each EM iteration now segments the word table
    // exactly once.
    val subCounts = words
      .select(explode(subUdf(col("w"))).as("piece"), col("wc"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val charPieces = subCounts.filter(_._1.length == 1)
    val seed = (subCounts.sorted(pruneOrder)
      .take(vocabSize * seedMultiplier) ++ charPieces).distinct
    def toLogProbs(rows: Array[(String, Long)]): Map[String, Double] = {
      val total = rows.map(_._2.toDouble).sum
      rows.map { case (p, c) => p -> math.log(c / total) }.toMap
    }
    var logp = toLogProbs(seed)
    val multiBudget = math.max(0, vocabSize - charPieces.length)

    var vocab: Array[(String, Long)] = Array.empty
    for (_ <- 1 to iterations) {
      val bc = spark.sparkContext.broadcast(logp)
      val segUdf = udf((w: String) => viterbi(w, bc.value, maxPieceLen))
      val eCounts = words
        .select(explode(segUdf(col("w"))).as("piece"), col("wc"))
        .groupBy(col("piece")).agg(sum(col("wc")).as("piece_count"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val ecMap = eCounts.toMap
      // prune to budget; seen single chars are ALWAYS retained (full
      // character coverage) with their count floored at 1
      val multi = eCounts.filter(_._1.length > 1)
        .sorted(pruneOrder).take(multiBudget)
      val charRows = charPieces.map { case (p, _) =>
        (p, math.max(ecMap.getOrElse(p, 0L), 1L))
      }
      vocab = multi ++ charRows
      val total = vocab.map(_._2).sum.toDouble
      logp = vocab.map { case (p, c) => p -> math.log(c / total) }.toMap
    }
    words.unpersist(false)
    import spark.implicits._
    vocab.toSeq.map { case (p, c) => (p, c, logp(p)) }
      .toDF("piece", "piece_count", "logprob")
  }

  /** Tokenize `textCol` with a trained (piece, logprob) vocabulary:
    * Viterbi per word under the broadcast vocab, pieces concatenated in
    * word order. Output: (id, pieces, n_pieces) — `n_pieces` is the
    * sequence length X13 packing consumes. One projection; the vocab is
    * broadcast by construction. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Double)], maxPieceLen: Int = 4): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toMap)
    val tokUdf = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
        .flatMap(w => viterbi(w, bc.value, maxPieceLen))
    }
    df.select(col(idCol), tokUdf(col(textCol)).as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }
}
