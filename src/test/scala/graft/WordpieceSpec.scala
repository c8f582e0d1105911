package graft

import org.apache.spark.sql.functions._

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  behavior of "TextStats.wordpieceTokenize"

  private val vocab = Seq("a", "b", "c", "d", "ab", "##c", "##d",
    "##cd", "un", "##able", "##b")

  private def tok(text: String): Seq[(String, Seq[String], Int)] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    graft.text.TextStats.wordpieceTokenize(df, "doc_id", "text", vocab)
      .orderBy(col("widx"))
      .select(col("word"), col("pieces"), col("is_unk"))
      .as[(String, Seq[String], Int)].collect().toSeq
  }

  it should "take the longest matching piece at every position" in {
    // 'abcd': greedy takes 'ab' (len 2 beats 'a'), then '##cd' beats
    // '##c' -> [ab, ##cd], never the 4-piece single-char segmentation
    tok("abcd").head shouldBe ("abcd", Seq("ab", "##cd"), 0)
  }

  it should "collapse unmatched words to [UNK] whole, never partially" in {
    // 'abx': 'ab' matches, then 'x' has no continuation piece -> the
    // whole word is [UNK] (BERT convention), not [ab, UNK]
    val r = tok("abcd abx unable")
    r(1) shouldBe ("abx", Seq("[UNK]"), 1)
    r(2) shouldBe ("unable", Seq("un", "##able"), 0)
  }

  it should "be greedy, not optimal: a longest-first dead end still UNKs" in {
    // vocab has 'ab' and '##b' but word 'aab' needs a->##a which is
    // absent; greedy 'a' then no '##a' -> UNK even though no
    // segmentation exists anyway; and 'ab'+'b' exists for 'abb':
    tok("abb").head shouldBe ("abb", Seq("ab", "##b"), 0)
  }

  it should "lowercase and drop empty words via the corpus convention" in {
    val r = tok("  AB  cd ")
    r.map(_._1) shouldBe Seq("ab", "cd")
    r.head._2 shouldBe Seq("ab")
  }
}
