package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X73: HTML → text extraction — the step every web-crawl training
  * pipeline runs before ANY text operator can see a document (C4,
  * RefinedWeb, Gopher all start from WET/WARC HTML payloads; Raffel et
  * al. 2020 §2.2 describes the same strip-and-filter shape — public
  * knowledge). Deliberately a deterministic regex pipeline, not a DOM
  * parser: at 100 TB the extractor must be a pure per-row projection
  * (zero shuffle, codegen'd `regexp_replace` chain, no UDF, no
  * out-of-memory risk on pathological markup), and the SAME pattern
  * strings run on both engines (all RE2-compatible: no backreferences,
  * no lookarounds), so the DuckDB oracle reproduces extraction exactly.
  *
  * Stages, in load-bearing order:
  *   1. `<script>`/`<style>` BLOCKS go first (their text content is not
  *      document text — dropping tags alone would leak JS/CSS bodies),
  *   2. comments `<!-- -->`,
  *   3. every remaining tag → one space,
  *   4. entity decode AFTER tag stripping, `&amp;` LAST — so
  *      `&lt;b&gt;` decodes to a literal `<b>` that is (correctly) kept
  *      as text, and `&amp;lt;` decodes to the literal `&lt;` the
  *      author wrote, never double-decoded,
  *   5. whitespace collapse + trim.
  */
object HtmlExtract {

  /** (pattern → replacement) regex stages; shared verbatim with the
    * DuckDB oracle (which applies them with the 'g' flag — Spark's
    * `regexp_replace` is global by default). */
  val regexStages: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script\\s*>" -> " ",
    "(?is)<style[^>]*>.*?</style\\s*>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "(?s)<[^>]*>" -> " ")

  /** Literal entity decodes, applied after the regex stages; `&amp;`
    * deliberately last (see class note). */
  val entityStages: Seq[(String, String)] = Seq(
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** The full extraction as one Column expression (a codegen'd
    * `regexp_replace`/`replace` chain — pure projection). */
  def extractedText(html: Column): Column = {
    val stripped = regexStages.foldLeft(html) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    val decoded = entityStages.foldLeft(stripped) { case (c, (ent, ch)) =>
      // literal (non-regex) replace — entities contain regex metachars
      replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Extract text from `htmlCol`: (id, text, n_tokens) — `n_tokens` by
    * the shared [[Dedup.words]] coordinate system so every downstream
    * text operator (dedup, quality, chunking) composes directly. */
  def extractText(df: DataFrame, idCol: String,
      htmlCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        extractedText(col(htmlCol)).as("text"))
      .withColumn("n_tokens",
        when(length(col("text")) === 0, lit(0L))
          .otherwise(coalesce(size(Dedup.words(col("text"))), lit(0))
            .cast("long")))
}
