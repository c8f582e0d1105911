package graft.infer

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
    lineEnding: String = "\n",
    doubleQuoted: Boolean = false,
    skipInitialSpace: Boolean = false) {

  /** The `spark.read.csv` options this dialect maps onto. RFC-4180
    * quote-doubling is Spark's `escape == quote`; skip-initial-space maps
    * to `ignoreLeadingWhiteSpace`. */
  def sparkOptions: Map[String, String] = Map(
    "sep" -> delimiter.toString,
    "quote" -> quote.toString,
    "header" -> hasHeader.toString,
    "lineSep" -> lineEnding,
    "escape" -> (if (doubleQuoted) quote.toString else "\\"),
    "ignoreLeadingWhiteSpace" -> skipInitialSpace.toString)
}

object CsvSniffer {
  private val candidateDelims = Seq(',', '\t', ';', '|', ':', ' ')

  def detectLineEnding(sample: String): String =
    if (sample.contains("\r\n")) "\r\n"
    else if (sample.contains("\r")) "\r" else "\n"

  /** Statistical mode-of-counts delimiter vote (reference
    * `guessDelimiter`'s char-frequency histogram,
    * FileMetadataExtractor.scala:72-173): for each candidate, take the
    * MODE of its per-line occurrence counts and score it
    * `modeVotes − otherVotes` — so a ragged sample (some lines with
    * extra or missing fields, embedded delimiters, blank lines) still
    * elects the character that is consistent on MOST lines, instead of
    * requiring a perfectly uniform count. A candidate wins only with a
    * positive score (its mode covers more than half the sample); score
    * ties break on the HIGHER modal count first (a real delimiter splits
    * more fields than a character merely embedded once per line — the old
    * consistency vote's magnitude rule), then on the conventional
    * delimiter order, mirroring the reference's `commonDelimiters`
    * preference list. */
  def guessDelimiter(lines: Seq[String]): Char = {
    val scored = candidateDelims.zipWithIndex.map { case (d, pref) =>
      val counts = lines.map(_.count(_ == d))
      val (modeCount, votes) = counts.filter(_ > 0)
        .groupBy(identity).view.mapValues(_.size)
        .maxByOption { case (c, n) => (n, c) }.getOrElse((0, 0))
      (d, 2 * votes - counts.size, modeCount, pref)
    }
    val (best, score, _, _) =
      scored.maxBy { case (_, s, m, p) => (s, m, -p) }
    if (score > 0) best else ','
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

  /** Quote-doubling detection (reference `guessQuoteAndDelimiter`'s
    * "extra quote between delimiters" rule,
    * FileMetadataExtractor.scala:252-260): a delimited cell that opens
    * with the quote and contains a doubled quote before closing means the
    * writer escapes quotes RFC-4180-style (`""`), not with a backslash. */
  def guessDoubleQuoted(lines: Seq[String], delim: Char, quote: Char): Boolean = {
    val d = java.util.regex.Pattern.quote(delim.toString)
    val q = java.util.regex.Pattern.quote(quote.toString)
    val re = (s"(?:^|$d)\\s*$q[^$d$q]*$q$q[^$d]*(?:$d|$$)").r
    lines.exists(l => re.findFirstIn(l).isDefined)
  }

  /** Skip-initial-space convention (reference
    * FileMetadataExtractor.scala:236-246 `delims(d) == spaces`): true when
    * EVERY delimiter occurrence is followed by a space — the
    * `", "`-separated dialect python's csv module calls
    * `skipinitialspace`. Any unspaced delimiter vetoes it. */
  def guessSkipInitialSpace(lines: Seq[String], delim: Char): Boolean = {
    val total = lines.map(_.count(_ == delim)).sum
    val spaced = lines.map(_.sliding(2).count(p =>
      p.length == 2 && p(0) == delim && p(1) == ' ')).sum
    total > 0 && total == spaced
  }

  def sniff(sample: String): CsvDialect = {
    val ending = detectLineEnding(sample)
    val lines = sample.split(ending).toSeq.filter(_.nonEmpty).take(50)
    val delim = guessDelimiter(lines)
    val quote = guessQuote(lines, delim)
    CsvDialect(delim, quote, hasHeader(lines, delim), ending,
      guessDoubleQuoted(lines, delim, quote),
      guessSkipInitialSpace(lines, delim))
  }

  /** Read the first `maxBytes` of `path` as the sniffing sample (reference
    * `fileFunctions.readSample`, common/utility/fileFunctions.scala:13-20).
    * Hadoop FS, not java.nio: the path may be any filesystem URI. The tail
    * is trimmed back to the last complete line so a mid-record cut can't
    * skew the vote. */
  def readSample(path: String, maxBytes: Int = 64 * 1024,
      encoding: String = "UTF-8",
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val in = fs.open(p)
    val buf = new Array[Byte](maxBytes)
    val n =
      try {
        var off = 0; var read = 0
        while (off < maxBytes && read >= 0) {
          read = in.read(buf, off, maxBytes - off)
          if (read > 0) off += read
        }
        off
      } finally in.close()
    val s = new String(buf, 0, n, encoding)
    // a full read (file smaller than maxBytes) keeps its last line
    if (n < maxBytes) s
    else s.lastIndexOf('\n') match {
      case -1 => s
      case cut => s.substring(0, cut)
    }
  }

  /** [[readSample]] + [[sniff]] in one step. */
  def sniffFile(path: String, maxBytes: Int = 64 * 1024): CsvDialect =
    sniff(readSample(path, maxBytes))
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
  import java.time._
  import java.time.format.DateTimeFormatter
  import java.time.temporal.{ChronoField, TemporalQueries}

  // formatter construction is the expensive part — build once per pattern
  private var order: Vector[(String, DateTimeFormatter)] = patterns.toVector
    .map(p => p -> DateTimeFormatter.ofPattern(p, java.util.Locale.ENGLISH))

  def parse(s: String): Option[java.sql.Timestamp] = synchronized {
    if (s == null || s.trim.isEmpty) return None
    val t = s.trim
    order.zipWithIndex.collectFirst(Function.unlift { case ((_, f), i) =>
      try {
        val ta = f.parse(t)
        // assemble from whatever fields the pattern carried: date-only →
        // midnight, time-only → epoch day, bare hour → HH:00, no offset →
        // UTC (matches the previous SimpleDateFormat-UTC behaviour)
        val ld = Option(ta.query(TemporalQueries.localDate))
          .getOrElse(LocalDate.EPOCH)
        val lt = Option(ta.query(TemporalQueries.localTime)).getOrElse(
          if (ta.isSupported(ChronoField.HOUR_OF_DAY))
            LocalTime.of(ta.get(ChronoField.HOUR_OF_DAY), 0)
          else LocalTime.MIDNIGHT)
        val off = Option(ta.query(TemporalQueries.offset)).getOrElse(ZoneOffset.UTC)
        // move-to-front: the matched pattern is tried first next time
        if (i > 0) order = order(i) +: (order.take(i) ++ order.drop(i + 1))
        Some(java.sql.Timestamp.from(LocalDateTime.of(ld, lt).toInstant(off)))
      } catch { case _: Exception => None }
    })
  }
}
object DateParser {
  /** The reference's full raw-feed pattern table (reference:
    * common/parsing/DateParser.scala:10-86 — millis/micros/offset ISO
    * forms, compact, named-weekday, the dotted/dashed/slashed d-m-y /
    * m-d-y / 2-digit-year families, and partial-precision ISO).
    * Ambiguous families resolve in list order (dd/MM before MM/dd, as the
    * reference chose); move-to-front then locks a feed onto its own
    * format after the first hit. */
  val DefaultPatterns: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSZ",   // 2001-07-04T12:08:56.235-0700
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX", // 2001-07-04T12:08:56.235-07:00
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", // 2001-07-04T12:08:56.235000
    "yyyy-MM-dd HH:mm:ss.SSSZ",
    "yyyy-MM-dd HH:mm:ss.SSSXXX",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyyMMdd HH:mm:ss",            // 20010704 12:08:56
    "EEE, MMM d, ''yy",             // Wed, Jul 4, '01
    "EEE, MMM d, yyyy",             // Wed, Jul 4, 2001
    "yyyy.MM.dd", "yyyy-MM-dd", "yyyy/MM/dd",
    "dd.MM.yyyy", "dd-MM-yyyy", "dd/MM/yyyy",
    "MM.dd.yyyy", "MM-dd-yyyy", "MM/dd/yyyy",
    "dd.MM.yy", "dd-MM-yy", "dd/MM/yy",
    "MM.dd.yy", "MM-dd-yy", "MM/dd/yy",
    "dd/MMM/yy",                    // 03/Apr/15
    "dd-MMM-yyyy",                  // 03-Apr-2015
    "yyyy-MM-dd'T'HH", "yyyy-MM-dd HH",
    "yyyy-MM-dd'T'HH:mm", "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSS", "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss Z", "yyyy-MM-dd HH:mm:ss Z",
    "yyyyMMdd", "HH:mm:ss")
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
