package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Core column library: entity-id / change-detection hashes, date helpers,
  * SQL string templating.
  *
  * Everything here is a thin composition of built-in (codegen'd) Catalyst
  * expressions — no UDFs. The reference used Scala UDFs for all three hashes
  * (reference: common/utility/hashFunctions.scala:30-62, registered in
  * diamond/load/ParquetDataLoader.scala:71-72); modern Spark ships `md5`,
  * `sha2` and `xxhash64` natively so the whole hot path stays inside
  * whole-stage codegen.
  */
package object functions {

  /** ASCII unit separator between hashed fields: without it, distinct tuples
    * like ("ab","c") and ("a","bc") concatenate identically and merge
    * distinct entities — at 100 TB that is silent data corruption, not a
    * corner case. DuckDB mirror: `chr(31)`. */
  val HashSep = "\u001f"

  /** Sentinel for NULL inside a hash input — keeps ("x",NULL), ("x","") and
    * (NULL,"x") all distinct (`concat_ws` alone silently *skips* nulls,
    * collapsing ("x",null) and ("x") to the same bytes). DuckDB mirror:
    * `coalesce(x, chr(1))`. */
  val HashNull = "\u0001"

  /** Version of the pre-hash encoding below. v1 was plain concatenation
    * (boundary-collision prone); v2 is [[HashSep]]/[[HashNull]]. Any change
    * to [[hashInput]] silently changes every persisted `entity_id` and
    * `hashed_value` — a merge against a history written under another
    * encoding would classify every entity as deleted+re-inserted — so
    * stores stamp this into meta.json and refuse cross-version merges
    * (see [[graft.load.Scd2Store.writeMeta]]/`runLoad`). Bump on ANY
    * change to the encoding. */
  val HashEncodingVersion = 2

  /** Cross-engine decimal quantizer: `floor(x * 10^p + 0.5) / 10^p`,
    * round-half-toward-+inf at `p` decimals (so −0.0000005 → 0, a
    * documented convention, NOT banker's or half-away rounding).
    *
    * WHY NOT `round(x, p)`: each engine's `round` builtin on DOUBLE uses a
    * different algorithm — Spark HALF_UP-rounds the SHORTEST DECIMAL
    * REPRESENTATION of the double (`BigDecimal.valueOf`), DuckDB rounds the
    * BINARY value via a ×10^p path — and the two disagree on doubles whose
    * shortest repr ends in `…5` at decimal p+1 (≈1.2% of that boundary
    * class; e.g. at p=6, `262.0005495` → DuckDB `262.000549`, Spark
    * `262.00055`). Small-denominator rationals (rates k/n, means over small
    * counts, `C − t·S/n` cumulative residues) land on those boundaries
    * routinely. This expression instead uses only IEEE-754
    * correctly-rounded primitives (`*`, `+`, `floor`, `/`), so ANY engine
    * executing the same literal expression produces bit-identical doubles.
    * SQL mirror (write it literally in the oracle): for p=6,
    * `floor(x * 1000000.0 + 0.5) / 1000000.0`.
    *
    * Contract: |x·10^p| < 2^53 (Spark's `floor` emits LONG, DuckDB's emits
    * DOUBLE; below 2^53 the long→double conversion is exact so the engines
    * cannot diverge). Metric-scale values — rates, variances, cumulative
    * sums of business values — sit far inside that. NULL passes through. */
  def quantize(c: Column, p: Int): Column = {
    val s = math.pow(10, p) // exact power of ten for p <= 22
    floor(c * lit(s) + lit(0.5)).cast("double") / lit(s)
  }

  /** [[quantize]] at 6 decimals — the library's standard metric precision. */
  def q6(c: Column): Column = quantize(c, 6)

  /** Fields joined with [[HashSep]], NULLs replaced by [[HashNull]] — the
    * canonical pre-hash encoding shared by every hash below and by the
    * DuckDB oracles. */
  def hashInput(cols: Seq[Column]): Column =
    concat_ws(HashSep, cols.map(c => coalesce(c.cast("string"), lit(HashNull))): _*)

  /** MD5-hex entity key over an id-type discriminator plus the natural-key
    * columns: `md5(idType || id1 || id2 …)`.
    * Reference semantics: common/utility/hashFunctions.scala:30-35 (`hashKey`),
    * applied as `hashKeyUDF(concat(lit(idType), concat(pk…)))`
    * (ParquetDataLoader.scala:304).
    */
  def entityIdHash(idType: String, idCols: Seq[Column]): Column =
    md5(hashInput(lit(idType) +: idCols))

  /** SHA-256 variant (reference: hashFunctions.scala:45-50). */
  def entityIdSha256(idType: String, idCols: Seq[Column]): Column =
    sha2(hashInput(lit(idType) +: idCols), 256)

  /** xxHash64 change-detection hash over the non-key attribute columns.
    * Reference: `fastHash` (hashFunctions.scala:60-62) stamped as
    * `hashed_value` (ParquetDataLoader.scala:312). Spark's `xxhash64` hashes
    * the raw typed values; we hash the string forms concatenated with a unit
    * separator so the result is stable across engines and type widenings.
    */
  def changeHash(cols: Seq[Column]): Column =
    xxhash64(hashInput(cols))

  /** MD5 change hash — used where the oracle (DuckDB) must reproduce the
    * value; DuckDB has `md5` but not Spark-compatible `xxhash64`. */
  def changeHashMd5(cols: Seq[Column]): Column =
    md5(hashInput(cols))

  /** Inclusive [start, end] timestamp-range predicate. */
  def tsBetween(ts: Column, start: String, end: String): Column =
    ts >= lit(start).cast("timestamp") && ts <= lit(end).cast("timestamp")

  /** `"…$var ${var}"` parameter substitution for templated SQL.
    * Quote-aware, regex-driven, same surface as the reference's
    * `String.template` (reference: common/utility/stringFunctions.scala:71-134,
    * behaviour spec StringUtilsSpec.scala:8-18): `$name` and `${name}` are
    * replaced from `params`; unknown names are left untouched; `$$` escapes a
    * literal dollar.
    */
  def template(sql: String, params: Map[String, String]): String = {
    val token = """\$\$|\$\{([A-Za-z_][A-Za-z0-9_]*)\}|\$([A-Za-z_][A-Za-z0-9_]*)""".r
    token.replaceAllIn(sql, m =>
      if (m.matched == "$$") java.util.regex.Matcher.quoteReplacement("$")
      else {
        val name = Option(m.group(1)).getOrElse(m.group(2))
        params.get(name) match {
          case Some(v) => java.util.regex.Matcher.quoteReplacement(v)
          case None    => java.util.regex.Matcher.quoteReplacement(m.matched)
        }
      })
  }

  /** snake_case → camelCase (reference: stringFunctions.scala:15-24). */
  def camelize(s: String): String = {
    val parts = s.split("_")
    (parts.head +: parts.tail.map(p =>
      if (p.isEmpty) p else p.head.toUpper +: p.tail)).mkString
  }

  /** camelCase → snake_case (reference: stringFunctions.scala:26-33). */
  def underscore(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  /** Numeric-literal detection, used to decide SQL quoting
    * (reference: stringFunctions.scala:55-64, use ParquetDataLoader.scala:175). */
  def isNumber(s: String): Boolean =
    s != null && s.nonEmpty && s.matches("""[+-]?\d+(\.\d+)?([eE][+-]?\d+)?""")
}
