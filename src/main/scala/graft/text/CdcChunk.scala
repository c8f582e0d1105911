package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) dedup — the storage-dedup modality
  * (Muthitacharoen et al. 2001 LBFS; Xia et al. 2016 FastCDC) applied to
  * token streams: a chunk boundary falls after token `i` whenever the
  * hash of the trailing `k`-token gram is ≡ 0 (mod `divisor`), so
  * boundaries are a function of CONTENT, not position. Insert or delete
  * a token and only the chunks touching the edit change identity —
  * every downstream chunk re-aligns — where X36's fixed-width windows
  * all shift. Expected chunk length is `divisor` tokens.
  *
  * The boundary hash is the engine-neutral md5 idiom (first 8 hex
  * digits of the space-joined k-gram, mod divisor), so the DuckDB
  * oracle reproduces every boundary, chunk key, and verdict exactly.
  *
  * Scale shape: chunking is one tight UDF pass per document (no
  * explode-then-window over token rows), the chunk table is
  * ~`n_tokens/divisor` rows, and the only shuffles are one
  * `groupBy(chunk_key)` over that table and the per-doc rollup — the
  * same two-exchange shape as X1 exact dedup, on a table `divisor`×
  * smaller than the token stream.
  */
object CdcChunk {

  /** JVM-side mirror of `conv(substring(md5(s), 1, 8), 16, 10)` —
    * MUST stay in lock-step with the Spark/DuckDB column idiom. */
  private def md5Head8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** One-pass chunker: words → (start 1-based, n_toks, chunk_text)
    * rows. A boundary ENDS a chunk at the k-gram's last token; the tail
    * after the final boundary is always a chunk, so chunks partition
    * the token sequence exactly. Documents shorter than `k` tokens are
    * a single chunk. */
  private def chunkUdf(k: Int, divisor: Int) = udf { ws: Seq[String] =>
    if (ws == null || ws.isEmpty) Seq.empty[(Int, Int, String)]
    else {
      val n = ws.length
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
      var start = 1 // 1-based, inclusive
      var i = k
      while (i <= n) {
        val gram = ws.slice(i - k, i).mkString(" ")
        if (md5Head8(gram) % divisor == 0) {
          out += ((start, i - start + 1,
            ws.slice(start - 1, i).mkString(" ")))
          start = i + 1
        }
        i += 1
      }
      if (start <= n)
        out += ((start, n - start + 1,
          ws.slice(start - 1, n).mkString(" ")))
      out.toSeq
    }
  }

  /** Chunk table: one row per (document, chunk) with its 1-based token
    * start, token length, and md5 chunk key. */
  def chunks(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, divisor: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    df.select(col(idCol), explode(chunkUdf(k, divisor)(
        Dedup.words(col(textCol)))).as("__c"))
      .select(col(idCol),
        col("__c._1").cast("long").as("chunk_start"),
        col("__c._2").cast("long").as("chunk_tokens"),
        col("__c._3").as("chunk_text"))
      .withColumn("chunk_key", md5(col("chunk_text")))
  }

  /** Per-document CDC dedup report: how much of each document is made
    * of chunks that also occur in ANOTHER document. All-integer columns
    * plus a boolean verdict (`mostly_dup` ⇔ duplicated tokens are at
    * least half the document) — no float tolerance anywhere. */
  def chunkDedupReport(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, divisor: Int = 8): DataFrame = {
    val ch = chunks(df, idCol, textCol, k, divisor)
    // a chunk key is "shared" when >= 2 DISTINCT docs contain it
    val shared = ch.groupBy(col("chunk_key"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("chunk_key"))
    ch.join(shared.withColumn("__dup", lit(1L)), Seq("chunk_key"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__dup").isNotNull, 1L).otherwise(0L))
          .as("n_dup_chunks"),
        sum(col("chunk_tokens")).as("n_toks"),
        sum(when(col("__dup").isNotNull, col("chunk_tokens"))
          .otherwise(0L)).as("n_dup_toks"))
      .withColumn("mostly_dup", col("n_dup_toks") * 2 >= col("n_toks"))
  }
}
