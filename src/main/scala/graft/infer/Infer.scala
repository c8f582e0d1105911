package graft.infer

import java.text.SimpleDateFormat
import java.util.TimeZone

/** S17: CSV dialect sniffing — driver-side analysis of a text sample that
  * feeds `spark.read.csv` options (reference:
  * common/inference/FileMetadataExtractor.scala:31-428; same statistical
  * approach, compact implementation: candidate-delimiter consistency
  * voting, quote detection, and header detection by type disagreement
  * between the first row and the rest). */
case class CsvDialect(
    delimiter: Char,
    quote: Char = '"',
    hasHeader: Boolean = false,
    lineEnding: String = "\n")

object CsvSniffer {
  private val candidateDelims = Seq(',', '\t', ';', '|', ':', ' ')

  def detectLineEnding(sample: String): String =
    if (sample.contains("\r\n")) "\r\n"
    else if (sample.contains("\r")) "\r" else "\n"

  /** The delimiter whose per-line field count is maximal-and-consistent
    * across the sample lines (reference `guessDelimiter`'s char-frequency
    * vote, FileMetadataExtractor.scala:72-173). */
  def guessDelimiter(lines: Seq[String]): Char = {
    val scored = candidateDelims.map { d =>
      val counts = lines.map(_.count(_ == d))
      val consistent = counts.nonEmpty && counts.distinct.size == 1 && counts.head > 0
      (d, if (consistent) counts.head else 0)
    }
    scored.maxBy(_._2)._1 match {
      case d if scored.exists(_._2 > 0) => d
      case _ => ','
    }
  }

  def guessQuote(lines: Seq[String], delim: Char): Char = {
    val dq = lines.count(l => l.contains(s""""""" + delim) || l.startsWith("\""))
    val sq = lines.count(l => l.contains("'" + delim) || l.startsWith("'"))
    if (sq > dq) '\'' else '"'
  }

  /** Header voting: the sample has a header when first-row cells parse as
    * a different type than the majority of the rows below them
    * (reference `hasHeader`, FileMetadataExtractor.scala:342-402). */
  def hasHeader(lines: Seq[String], delim: Char): Boolean = {
    if (lines.size < 2) return false
    val first = lines.head.split(delim)
    val rest = lines.tail.map(_.split(delim))
    val votes = first.indices.map { i =>
      val headIsNum = graft.functions.isNumber(first.lift(i).getOrElse(""))
      val colNum = rest.flatMap(_.lift(i)).count(graft.functions.isNumber)
      val restIsNum = rest.nonEmpty && colNum * 2 > rest.size
      if (restIsNum && !headIsNum) 1 else if (headIsNum && restIsNum) -1 else 0
    }
    votes.sum > 0
  }

  def sniff(sample: String): CsvDialect = {
    val ending = detectLineEnding(sample)
    val lines = sample.split(ending).toSeq.filter(_.nonEmpty).take(50)
    val delim = guessDelimiter(lines)
    CsvDialect(delim, guessQuote(lines, delim), hasHeader(lines, delim), ending)
  }
}

/** S18: pluggable value parsers (reference: common/parsing/TypeParser.scala,
  * BooleanParser.scala:6-26, DateParser.scala:10-86 — including the
  * move-to-front pattern cache). */
trait Parser[T] extends Serializable { def parse(s: String): Option[T] }

object BooleanParser extends Parser[Boolean] {
  private val truthy = Set("true", "t", "yes", "y", "1", "on")
  private val falsy = Set("false", "f", "no", "n", "0", "off")
  def parse(s: String): Option[Boolean] = Option(s).map(_.trim.toLowerCase) match {
    case Some(v) if truthy(v) => Some(true)
    case Some(v) if falsy(v) => Some(false)
    case _ => None
  }
}

class DateParser(patterns: Seq[String] = DateParser.DefaultPatterns)
    extends Parser[java.sql.Timestamp] {
  private var order = patterns.toVector
  def parse(s: String): Option[java.sql.Timestamp] = synchronized {
    if (s == null || s.trim.isEmpty) return None
    val t = s.trim
    order.zipWithIndex.collectFirst(Function.unlift { case (p, i) =>
      try {
        val f = new SimpleDateFormat(p)
        f.setLenient(false)
        f.setTimeZone(TimeZone.getTimeZone("UTC"))
        val d = f.parse(t)
        // move-to-front: the matched pattern is tried first next time
        if (i > 0) order = order(i) +: (order.take(i) ++ order.drop(i + 1))
        Some(new java.sql.Timestamp(d.getTime))
      } catch { case _: Exception => None }
    })
  }
}
object DateParser {
  val DefaultPatterns: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd",
    "yyyy/MM/dd", "dd/MM/yyyy", "MM/dd/yyyy", "dd-MMM-yyyy", "yyyyMMdd",
    "dd.MM.yyyy", "yyyy-MM-dd HH:mm", "HH:mm:ss")
}

/** S16: EBCDIC (ibm500) text decoding (reference:
  * common/utility/encodingFunctions.scala:33-54). Driver-side for local
  * files; distributed via `spark.read.format("binaryFile")` +
  * `decodeBytes` per file. */
object Ebcdic {
  def decodeBytes(bytes: Array[Byte]): String =
    new String(bytes, java.nio.charset.Charset.forName("ibm500"))
  def readLocal(path: String): String =
    decodeBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
