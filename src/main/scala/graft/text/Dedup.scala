package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication: exact, MinHash+LSH, SimHash and
  * exact n-gram-Jaccard similarity joins.
  *
  * These extend the reference's feature-engineering surface toward
  * training-data pipelines (north-star scope; the reference itself has no
  * text operators). Design points for 100 TB:
  *
  *  - Signatures (minhash, simhash) are computed with *array expressions
  *    inside one projection* — no explode, no shuffle, no UDF; one pass over
  *    the corpus, fully whole-stage-codegen.
  *  - Candidate generation is LSH banding: explode to (band, band_hash) and
  *    self-join on the band hash. The shuffle key is the band hash —
  *    uniformly distributed by construction — and join fan-out is bounded by
  *    bucket size, never O(n²).
  *  - All hashes are md5-hex based so an independent engine (the DuckDB
  *    oracle) reproduces every signature bit-for-bit.
  */
object Dedup {

  /** Whitespace tokens of the lower-cased text. */
  def words(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles (space-joined); empty array when the document has
    * fewer than `n` words. */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: `k` independent permutations simulated as
    * `min(md5(k ':' shingle))` over the shingle set (min over a multiset
    * equals min over the set, so no distinct pass is needed).
    *
    * Implemented as a tight UDF loop over the shingle array: the
    * pure-expression form (an `aggregate` carrying k running minima)
    * interprets a lambda per (shingle, k) pair — ~10× slower over the
    * sf0.1 corpus' 8M hash evaluations. `MessageDigest` MD5 hex output is
    * byte-identical to Spark's `md5` and DuckDB's, so signatures are
    * unchanged. The `"\u007f"` (DEL) seed sorts above every hex digit. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    minhashUdf(k)(shingleArr)

  private val hexDigits = "0123456789abcdef".toCharArray

  private def minhashUdf(k: Int) = udf { shingles: Seq[String] =>
    val mins = Array.fill(k)("\u007f")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = new Array[Char](32)
    shingles.foreach { s =>
      var ki = 0
      while (ki < k) {
        md.reset()
        val d = md.digest((ki.toString + ":" + s).getBytes("UTF-8"))
        var i = 0
        while (i < 16) {
          hex(2 * i) = hexDigits((d(i) >> 4) & 0xf)
          hex(2 * i + 1) = hexDigits(d(i) & 0xf)
          i += 1
        }
        val h = new String(hex)
        if (h < mins(ki)) mins(ki) = h
        ki += 1
      }
    }
    mins.toSeq
  }

  /** 32-bit SimHash over the token multiset: token hash = first 8 md5 hex
    * digits as an integer; bit b of the result is set when strictly more
    * tokens have bit b set than clear. Bit extraction uses exact double
    * arithmetic (`floor(h / 2^b) % 2`) so an engine without bit-shift
    * built-ins can mirror it. */
  def simhash32(text: Column): Column = {
    val hs = transform(words(text),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val contrib = (b: Column) => aggregate(hs, lit(0L),
      (acc, h) => acc +
        when(floor(h / pow(lit(2.0), b)).cast("long") % 2 === 1, 1L).otherwise(-1L))
    aggregate(
      transform(sequence(lit(0), lit(31)),
        b => when(contrib(b) > 0,
          pow(lit(2.0), b).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Exact dedup: one row per input row with the canonical (minimum) id of
    * its identical-text group and the group size. Single hash-groupBy on
    * `md5(text)` — the only shuffle, keyed uniformly. */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = df.select(col(idCol), md5(col(textCol)).as("__th"))
    val groups = h.groupBy(col("__th"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("group_size"))
    h.join(groups, "__th")
      .select(col(idCol), col("canonical_id"), col("group_size"),
        (col(idCol) =!= col("canonical_id")).as("is_duplicate"))
  }

  /** MinHash+LSH near-duplicate pairs: signature → `bands` bands of
    * `k/bands` rows → self-join on (band, band-hash) → exact signature
    * agreement count for the surviving candidates. Returns
    * (doc_a, doc_b, n_match, est_jaccard) for pairs agreeing on at least
    * `minMatch` of the `k` minhashes. */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      minMatch: Int = 8): DataFrame = {
    val rows = k / bands
    require(bands * rows == k, "bands must divide k")
    // The signature plan feeds three consumers (banding + both sides of the
    // candidate join-back): persist it so 8M-odd md5 evaluations at sf0.1
    // run once, not three times.
    val sig = df
      .select(col(idCol).as("doc_id"),
        shingles(col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"), minhashSignature(col("__sh"), k).as("sig"))
      .persist()
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|", slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("__sa")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("__sb")), "doc_b")
      .withColumn("n_match",
        size(filter(zip_with(col("__sa"), col("__sb"), (x, y) => x === y),
          b => b)).cast("long"))
      .filter(col("n_match") >= minMatch)
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        round(col("n_match") / k.toDouble, 4).as("est_jaccard"))
  }

  /** Exact n-gram Jaccard similarity join via an inverted shingle index:
    * explode distinct shingles, self-join on the shingle, count shared,
    * then `|A∩B| / (|A|+|B|-|A∩B|)`. Scales with the number of co-occurring
    * shingle pairs (bounded by posting-list sizes), never materializing the
    * O(n²) pair space. */
  def jaccardSimilarityJoin(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    // Reused by the size aggregate and both sides of the self-join.
    val sh = df.select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(col(textCol), shingleN))).as("shingle"))
      .persist()
    val sizes = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val shared = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_shingles").as("__na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_shingles").as("__nb")), "doc_b")
      // threshold on the RAW ratio (rounding only for output): filtering on
      // the rounded value would admit pairs just below the threshold
      .withColumn("__j",
        col("n_shared") / (col("__na") + col("__nb") - col("n_shared")))
      .filter(col("__j") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("__j"), 4).as("jaccard"))
  }
}
