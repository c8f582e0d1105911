package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase tagging via Aho–Corasick (1975, public knowledge) — the
  * blocklist-phrase / keyword-tagging pass of a curation pipeline
  * (bad-word filters, licence-boilerplate markers, policy phrases).
  * A regex alternation of p phrases costs O(p) per position and breaks
  * down around thousands of patterns; the AC automaton matches ALL
  * phrases in one O(len) scan per document regardless of p, so a 10⁵
  * phrase list costs the same scan as 10.
  *
  * Scale shape: the automaton is built once on the driver from the
  * phrase list (10⁵ phrases ≈ a few MB of goto/fail tables) and
  * broadcast; matching is a single projection — no shuffle, no join.
  * Counts are ALL-occurrence counts (overlapping matches included — the
  * automaton reports every end position; the spec pins this contract).
  * Matching is case-insensitive via lower-casing both sides.
  */
object PhraseMatch {

  /** Flat-array Aho–Corasick automaton (built breadth-first so fail
    * links are resolved parents-before-children). Serializable for
    * broadcast. */
  private[text] final class Automaton(phrases: Seq[String])
      extends Serializable {
    require(phrases.nonEmpty, "phrase list must not be empty")
    require(phrases.forall(_.nonEmpty), "phrases must be non-empty")
    private val lowered = phrases.map(_.toLowerCase).toIndexedSeq
    // trie over a dense child map per node
    private val children =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
    private val out =
      scala.collection.mutable.ArrayBuffer(List.empty[Int])
    lowered.zipWithIndex.foreach { case (p, pi) =>
      var at = 0
      p.foreach { ch =>
        at = children(at).getOrElseUpdate(ch, {
          children += scala.collection.mutable.Map.empty[Char, Int]
          out += Nil
          children.size - 1
        })
      }
      out(at) = pi :: out(at)
    }
    private val fail = new Array[Int](children.size)
    // BFS: fail(child) = longest proper suffix state; outputs inherit
    private val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach(queue += _)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) =
          if (children(f).contains(ch) && children(f)(ch) != v)
            children(f)(ch)
          else 0
        out(v) = out(v) ++ out(fail(v))
        queue += v
      }
    }
    private val childArr: Array[Map[Char, Int]] =
      children.map(_.toMap).toArray
    private val outArr: Array[Array[Int]] = out.map(_.toArray).toArray

    /** All-occurrence counts per phrase index over `text`. */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](lowered.size)
      if (text == null) return counts
      var state = 0
      var i = 0
      val t = text.toLowerCase
      while (i < t.length) {
        val ch = t.charAt(i)
        while (state != 0 && !childArr(state).contains(ch))
          state = fail(state)
        state = childArr(state).getOrElse(ch, 0)
        val os = outArr(state)
        var j = 0
        while (j < os.length) { counts(os(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
    def phraseAt(i: Int): String = lowered(i)
  }

  /** Tag each document with its phrase-hit counts: one row per
    * (document, phrase) pair WITH at least one hit — output stays
    * bounded by actual matches, not |docs|·|phrases|. */
  def tagPhrases(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val auto = new Automaton(phrases)
    val bc = df.sparkSession.sparkContext.broadcast(auto)
    val hitsUdf = udf { (text: String) =>
      val c = bc.value.countAll(text)
      c.indices.collect {
        case i if c(i) > 0 => (bc.value.phraseAt(i), c(i))
      }.toSeq
    }
    df.select(col(idCol), explode(hitsUdf(col(textCol))).as("__h"))
      .select(col(idCol), col("__h._1").as("phrase"),
        col("__h._2").as("n_hits"))
  }
}
