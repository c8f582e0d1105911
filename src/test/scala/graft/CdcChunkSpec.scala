package graft

import graft.text.CdcChunk
import org.apache.spark.sql.functions._

/** Content-defined chunking properties: chunks partition the token
  * stream exactly, boundaries survive a front-edit (the CDC claim fixed
  * windows cannot make), determinism under repartitioning, and the
  * dedup report on planted copies. */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private val prose = ("the quick brown fox jumps over the lazy dog " +
    "while bright stars shine above silent hills and rivers flow " +
    "gently through ancient valleys carrying whispered stories from " +
    "distant mountains toward endless patient seas tonight").trim

  behavior of "CdcChunk.chunks"

  it should "partition the token sequence exactly" in {
    val df = Seq((1L, prose)).toDF("doc_id", "text")
    val ch = CdcChunk.chunks(df, "doc_id", "text", k = 3, divisor = 4)
      .orderBy("chunk_start").collect()
    val nWords = prose.toLowerCase.split("\\s+").length
    // starts are contiguous: each chunk begins where the previous ended
    val startsAndLens = ch.map(r => (r.getLong(1), r.getLong(2)))
    startsAndLens.head._1 shouldBe 1L
    startsAndLens.sliding(2).foreach {
      case Array((s1, l1), (s2, _)) => s2 shouldBe s1 + l1
      case _ =>
    }
    startsAndLens.map(_._2).sum shouldBe nWords
    // re-joining chunk texts reconstructs the normalized document
    ch.map(_.getString(3)).mkString(" ") shouldBe prose.toLowerCase
  }

  it should "re-align chunk identities after a front insertion" in {
    val df = Seq((1L, prose), (2L, "inserted " + prose))
      .toDF("doc_id", "text")
    val ch = CdcChunk.chunks(df, "doc_id", "text", k = 3, divisor = 4)
    val k1 = ch.filter(col("doc_id") === 1).select("chunk_key")
      .as[String].collect().toSet
    val k2 = ch.filter(col("doc_id") === 2).select("chunk_key")
      .as[String].collect().toSet
    // only the chunk containing the edit (plus at most the k-1 grams
    // straddling it) may differ; everything downstream re-aligns
    (k1 intersect k2).size should be >= k1.size - 2
    (k1 -- k2).size should be <= 2
  }

  it should "emit a single chunk for documents shorter than k" in {
    val df = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val ch = CdcChunk.chunks(df, "doc_id", "text", k = 3, divisor = 4)
      .collect()
    ch.length shouldBe 1
    ch.head.getLong(2) shouldBe 2L
    ch.head.getString(3) shouldBe "tiny doc"
  }

  it should "be invariant to input partitioning" in {
    val docs = (1L to 40L).map(i => (i, s"$prose variant $i"))
      .toDF("doc_id", "text")
    val a = CdcChunk.chunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_start").collect().toSeq
    val b = CdcChunk.chunks(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id", "chunk_start").collect().toSeq
    a shouldBe b
  }

  behavior of "CdcChunk.chunkDedupReport"

  it should "flag full copies as mostly_dup and leave unique docs clean" in {
    val unique = "zebra quartz vortex nymph glyph jinx banjo fudge " +
      "sphinx waltz crypt dwarf blitz gawk"
    val df = Seq((1L, prose), (2L, prose), (3L, unique))
      .toDF("doc_id", "text")
    val rep = CdcChunk.chunkDedupReport(df, "doc_id", "text",
      k = 3, divisor = 4).orderBy("doc_id").collect()
    rep.length shouldBe 3
    // docs 1 and 2 are identical: every chunk shared
    Seq(0, 1).foreach { i =>
      rep(i).getLong(1) shouldBe rep(i).getLong(2) // n_chunks == n_dup
      rep(i).getBoolean(5) shouldBe true
    }
    // doc 3 shares no vocabulary, hence no chunks
    rep(2).getLong(2) shouldBe 0L
    rep(2).getLong(4) shouldBe 0L
    rep(2).getBoolean(5) shouldBe false
  }

  it should "not count within-document repetition as shared" in {
    // one doc repeating its own content twice, alone in the corpus
    val df = Seq((1L, prose + " " + prose)).toDF("doc_id", "text")
    val rep = CdcChunk.chunkDedupReport(df, "doc_id", "text",
      k = 3, divisor = 4).collect()
    rep.head.getLong(2) shouldBe 0L
  }
}
