package graft

import graft.text.{Dedup, HtmlExtract, TextStats}
import org.apache.spark.sql.functions._

/** X73 HTML extraction, X75 token chunking, X74 cluster-representative
  * selection. */
class HtmlChunkSpec extends SparkSpec {
  import spark.implicits._

  behavior of "HtmlExtract.extractText (X73)"

  it should "strip script/style bodies, comments and tags" in {
    val df = Seq((1L,
      "<html><script>var x = 1 < 2; s = \"</div>\";</script>" +
        "<style>p{a:b}</style><body><!-- hidden --><p>keep me</p>" +
        "</body></html>")).toDF("id", "html")
    val out = HtmlExtract.extractText(df, "id", "html").collect()
    out.length shouldBe 1
    out(0).getString(1) shouldBe "keep me"
    out(0).getLong(2) shouldBe 2L
  }

  it should "decode entities once, after tag stripping" in {
    val df = Seq(
      (1L, "<p>&lt;tag&gt; &amp;lt; &quot;q&quot; &#39;s&#39;&nbsp;x</p>"))
      .toDF("id", "html")
    val out = HtmlExtract.extractText(df, "id", "html").collect()
    // &lt;tag&gt; -> literal <tag> KEPT (decode happens after stripping);
    // &amp;lt; -> the literal &lt; the author wrote, not '<' twice over
    out(0).getString(1) shouldBe "<tag> &lt; \"q\" 's' x"
  }

  it should "return empty text and zero tokens for markup-only input" in {
    val df = Seq((1L, "<br/><!-- x --><style>a{}</style>")).toDF("id", "h")
    val out = HtmlExtract.extractText(df, "id", "h").collect()
    out(0).getString(1) shouldBe ""
    out(0).getLong(2) shouldBe 0L
  }

  behavior of "TextStats.chunkTokens (X75)"

  private def chunksOf(text: String, chunk: Int, stride: Int) =
    TextStats.chunkTokens(Seq((1L, text)).toDF("id", "text"), "id", "text",
        chunk, stride)
      .orderBy("chunk_idx")
      .select("start_tok", "end_tok", "chunk_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  it should "emit one chunk for a doc at or under the chunk size" in {
    chunksOf("a b c", 4, 2) shouldBe Array((0L, 3L, "a b c"))
    chunksOf("a b c d", 4, 2) shouldBe Array((0L, 4L, "a b c d"))
  }

  it should "overlap by chunk - stride and cover the tail" in {
    // 7 tokens, chunk 4, stride 2: starts 0, 2 (end 6 < 7), last start
    // m = ceil(3/2) = 2 -> 4 covering [4,7) -- wait: m*stride = 4,
    // end = min(8,7) = 7: full coverage, no window past the end
    chunksOf("t0 t1 t2 t3 t4 t5 t6", 4, 2) shouldBe Array(
      (0L, 4L, "t0 t1 t2 t3"),
      (2L, 6L, "t2 t3 t4 t5"),
      (4L, 7L, "t4 t5 t6"))
  }

  it should "guard stride-gap sampling from overshooting the end" in {
    // 10 tokens, chunk 2, stride 5: m = ceil(8/5) = 2 -> start 10 would
    // be an empty chunk; the s < n guard drops it
    chunksOf("a b c d e f g h i j", 2, 5) shouldBe Array(
      (0L, 2L, "a b"), (5L, 7L, "f g"))
  }

  it should "compose with span coordinates: concatenated stride=chunk " +
    "chunks rebuild the doc" in {
    val text = (0 until 23).map(i => s"w$i").mkString(" ")
    val parts = chunksOf(text, 5, 5)
    parts.map(_._3).mkString(" ") shouldBe text
    parts.map(p => p._2 - p._1).sum shouldBe 23L
  }

  behavior of "TextStats.lineQuality (X78)"

  it should "score each line rule on a crafted doc" in {
    val text = "A good sentence ends here.\n- bullet\nShort\n" +
      "A good sentence ends here.\n   \nlonger line without ending"
    val out = TextStats.lineQuality(Seq((1L, text)).toDF("id", "text"),
      "id", "text").collect()(0)
    out.getLong(1) shouldBe 5L // whitespace-only line dropped
    out.getDouble(2) shouldBe 2.0 / 5 // ends-with-punct
    out.getDouble(3) shouldBe 1.0 / 5 // bullet
    out.getDouble(4) shouldBe 2.0 / 5 // "- bullet" and "Short" are < 3 toks
    out.getDouble(5) shouldBe 1.0 / 5 // one duplicated line
  }

  it should "report NULL fractions, not fake zeros, for empty docs" in {
    val out = TextStats.lineQuality(
      Seq((1L, ""), (2L, " \n  \n")).toDF("id", "text"), "id", "text")
      .orderBy("doc_id").collect()
    out.foreach { r =>
      r.getLong(1) shouldBe 0L
      r.isNullAt(2) shouldBe true
      r.isNullAt(6) shouldBe true
    }
  }

  behavior of "Dedup.selectRepresentatives (X74)"

  it should "keep the argmax-score member, tie-breaking on min doc_id" in {
    val clusters = Seq((10L, 1L), (11L, 1L), (12L, 1L), (20L, 2L),
      (21L, 2L)).toDF("doc_id", "cluster_id")
    val scored = Seq((10L, 5L), (11L, 9L), (12L, 9L), (20L, 3L),
      (21L, 3L)).toDF("doc_id", "n_toks")
    val out = Dedup.selectRepresentatives(clusters, scored, "doc_id",
        "n_toks")
      .orderBy("doc_id")
      .select("doc_id", "is_representative", "representative_id")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    // cluster 1: 11 and 12 tie at 9 -> 11 wins (min id among argmax)
    // cluster 2: 20 and 21 tie at 3 -> 20 wins
    out shouldBe Array((10L, false, 11L), (11L, true, 11L),
      (12L, false, 11L), (20L, true, 20L), (21L, false, 20L))
  }

  it should "pick exactly one representative per cluster" in {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val clusters = Dedup.nearDuplicateClusters(docs, "doc_id", "text")
    val scored = docs.select(col("doc_id"),
      coalesce(org.apache.spark.sql.functions.size(
        Dedup.words(col("text"))), lit(0)).cast("long").as("n_toks"))
    val reps = Dedup.selectRepresentatives(clusters, scored, "doc_id",
      "n_toks")
    val perCluster = reps.groupBy("cluster_id")
      .agg(sum(when(col("is_representative"), 1).otherwise(0)).as("n"))
      .select("n").distinct().collect().map(_.getLong(0))
    perCluster shouldBe Array(1L)
    // every member agrees on its cluster's representative
    reps.groupBy("cluster_id")
      .agg(count_distinct(col("representative_id")).as("n"))
      .filter(col("n") =!= 1).count() shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }
}
