package graft.config

import scala.collection.mutable

/** Minimal HOCON-subset parser — enough for the reference's `.conf`
  * surface (reference fixtures: src/test/resources/data.conf,
  * application.conf; schema: diamond/conf.scala:10-267) without pulling a
  * config library into the (offline) build:
  *
  *  - nested objects `key { … }`, dotted path keys `a.b = v`, re-opened
  *    blocks merge;
  *  - `key = value` and `key: value`; unquoted strings run to end of line
  *    (so `id-type = Customer Number` works), quoted strings unescape;
  *  - single-line lists `[a, b, "c"]`;
  *  - `${a.b.c}` substitutions anywhere inside a value, chained refs
  *    resolved to a fixed point;
  *  - `#` and `//` comments, blank lines.
  *
  * All scalars are kept as strings; [[Conf]] accessors coerce on read
  * (the typesafe library does the same lazily). Not supported (and not
  * used by the reference configs): multi-line lists, `include`,
  * concatenation of objects, `+=`.
  */
object Hocon {

  /** Cursor over a parsed tree: `Map[String, Any]` nodes where values are
    * `String`, `Seq[String]` or nested `Map`. */
  final case class Conf(root: Map[String, Any]) {
    private def at(path: String): Option[Any] =
      path.split('.').foldLeft(Option[Any](root)) {
        case (Some(m: Map[String @unchecked, Any @unchecked]), k) => m.get(k)
        case _ => None
      }
    def has(path: String): Boolean = at(path).isDefined
    def getString(path: String): String = at(path) match {
      case Some(s: String) => s
      case Some(other) => throw new IllegalArgumentException(
        s"$path is not a string: $other")
      case None => throw new NoSuchElementException(s"missing config: $path")
    }
    def getOpt(path: String): Option[String] = at(path) match {
      case Some(s: String) => Some(s)
      case _ => None
    }
    def getSeq(path: String): Seq[String] = at(path) match {
      case Some(xs: Seq[String @unchecked]) => xs
      case Some(s: String) => Seq(s)
      case Some(other) => throw new IllegalArgumentException(
        s"$path is not a list: $other")
      case None => throw new NoSuchElementException(s"missing config: $path")
    }
    def getBool(path: String, default: Boolean = false): Boolean =
      getOpt(path).map(_.toBoolean).getOrElse(default)
    /** Raw list access — elements may be strings or nested lists. */
    def getList(path: String): Seq[Any] = at(path) match {
      case Some(xs: Seq[Any @unchecked]) => xs
      case Some(other) => throw new IllegalArgumentException(
        s"$path is not a list: $other")
      case None => throw new NoSuchElementException(s"missing config: $path")
    }
    def getDouble(path: String): Double = getString(path).toDouble
    def getObj(path: String): Conf = at(path) match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => Conf(m)
      case Some(other) => throw new IllegalArgumentException(
        s"$path is not an object: $other")
      case None => throw new NoSuchElementException(s"missing config: $path")
    }
    /** Child objects of an object node, in declaration order. */
    def children(path: String): Seq[(String, Conf)] =
      if (!has(path)) Nil
      else getObj(path).root.toSeq.collect {
        case (k, m: Map[String @unchecked, Any @unchecked]) => k -> Conf(m)
      }
    /** String-valued entries of an object node (e.g. a rename map). */
    def stringMap(path: String): Map[String, String] =
      if (!has(path)) Map.empty
      else getObj(path).root.collect { case (k, v: String) => k -> v }
  }

  def parse(text: String): Conf = {
    def stripComment(l: String): String = {
      var inQ = false; var j = 0
      while (j < l.length) {
        val c = l.charAt(j)
        if (inQ && c == '\\') j += 1 // escaped char inside quotes
        else if (c == '"') inQ = !inQ
        else if (!inQ && (c == '#' ||
          (c == '/' && j + 1 < l.length && l.charAt(j + 1) == '/')))
          return l.substring(0, j)
        j += 1
      }
      l
    }
    // Normalize structure to one item per line so single-line nesting
    // (`a { b { x = 1 } }`, `m { a: 1, b: 2 }`) parses like its multi-line
    // form: outside quotes, substitutions and list brackets, a `{` ends its
    // line, a `}` stands alone, and a comma breaks the line.
    def preprocess(t: String): String = {
      val out = new java.lang.StringBuilder(t.length + 16)
      var inQ = false; var inSub = false; var depth = 0
      var j = 0
      while (j < t.length) {
        val c = t.charAt(j)
        if (inQ) {
          out.append(c)
          if (c == '\\' && j + 1 < t.length) { out.append(t.charAt(j + 1)); j += 1 }
          else if (c == '"') inQ = false
        }
        else if (inSub) { out.append(c); if (c == '}') inSub = false }
        else c match {
          case '"' => out.append(c); inQ = true
          case '$' if j + 1 < t.length && t.charAt(j + 1) == '{' =>
            out.append("${"); inSub = true; j += 1
          case '[' => depth += 1; out.append(c)
          case ']' => depth -= 1; out.append(c)
          case '{' if depth == 0 => out.append("{\n")
          case '}' if depth == 0 => out.append("\n}\n")
          case ',' if depth == 0 => out.append('\n')
          case c2 => out.append(c2)
        }
        j += 1
      }
      out.toString
    }
    val lines = preprocess(
      text.split("\n", -1).map(stripComment).mkString("\n")).split("\n", -1)
    var i = 0
    def unquote(s: String): String =
      if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\""))
        s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
      else s
    // recursive list parser: supports nesting ([[a, b], []]) and elements
    // separated by commas OR line breaks (the reference's star.conf lists
    // its dim specs one per line with no commas)
    def parseListBody(s: String, from: Int): (Seq[Any], Int) = {
      val out = mutable.ArrayBuffer.empty[Any]
      var j = from
      val scalar = new java.lang.StringBuilder
      def flush(): Unit = {
        val t = scalar.toString.trim
        if (t.nonEmpty) out += unquote(t)
        scalar.setLength(0)
      }
      var inQ = false
      while (j < s.length) {
        val c = s.charAt(j)
        if (inQ) {
          scalar.append(c)
          if (c == '\\' && j + 1 < s.length) { scalar.append(s.charAt(j + 1)); j += 1 }
          else if (c == '"') inQ = false
          j += 1
        } else c match {
          case '"' => scalar.append(c); inQ = true; j += 1
          case '[' =>
            val (nested, nj) = parseListBody(s, j + 1)
            out += nested; j = nj
          case ']' => flush(); return (out.toSeq, j + 1)
          case ',' | '\n' | '\r' => flush(); j += 1
          case c2 => scalar.append(c2); j += 1
        }
      }
      throw new IllegalArgumentException(s"unterminated list: $s")
    }
    def parseScalarList(s: String): Any =
      if (s.startsWith("[")) {
        val (xs, end) = parseListBody(s, 1)
        require(s.substring(end).trim.isEmpty,
          s"trailing content after list: ${s.substring(end)}")
        xs
      } else unquote(s)
    // path segments split on dots OUTSIDE quotes: `"a.csv"` is one key
    def splitPath(s: String): Seq[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      val cur = new java.lang.StringBuilder
      var inQ = false; var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        if (inQ && c == '\\' && j + 1 < s.length) {
          cur.append(c).append(s.charAt(j + 1)); j += 1
        }
        else if (c == '"') { inQ = !inQ; cur.append(c) }
        else if (c == '.' && !inQ) { out += cur.toString; cur.setLength(0) }
        else cur.append(c)
        j += 1
      }
      out += cur.toString
      out.toSeq.map(x => unquote(x.trim))
    }
    // mutable tree of LinkedHashMap (declaration order preserved)
    type MMap = mutable.LinkedHashMap[String, Any]
    def newMap(): MMap = mutable.LinkedHashMap.empty[String, Any]
    def descend(m: MMap, path: Seq[String]): MMap =
      path.foldLeft(m) { (cur, k) =>
        cur.getOrElseUpdate(k, newMap()) match {
          case child: MMap @unchecked => child
          case other => throw new IllegalArgumentException(
            s"config path $k is both a value ($other) and an object")
        }
      }
    def putKeyValue(into: MMap, kv: String): Unit = {
      // earliest unquoted '=' or ':' separates key and value
      var inQ = false; var sep = -1; var j = 0
      while (j < kv.length && sep < 0) {
        val c = kv.charAt(j)
        if (inQ && c == '\\') j += 1
        else if (c == '"') inQ = !inQ
        else if (!inQ && (c == '=' || c == ':')) sep = j
        j += 1
      }
      require(sep > 0, s"unparseable config line: $kv")
      val path = splitPath(kv.substring(0, sep).trim)
      val value = parseScalarList(kv.substring(sep + 1).trim)
      descend(into, path.init).put(path.last, value)
    }
    // index of the first unquoted '{' that opens an OBJECT (i.e. is not
    // the brace of a ${…} substitution) with no key/value separator
    // before it; -1 when the line is not an object opener
    def objectBrace(line: String): Int = {
      var inQ = false; var j = 0
      while (j < line.length) {
        val c = line.charAt(j)
        if (inQ && c == '\\') j += 1
        else if (c == '"') inQ = !inQ
        else if (!inQ && (c == '=' || c == ':')) return -1
        else if (!inQ && c == '{' && (j == 0 || line.charAt(j - 1) != '$'))
          return j
        j += 1
      }
      -1
    }
    def parseObject(into: MMap, depth: Int): Unit = {
      while (i < lines.length) {
        val line = stripComment(lines(i)).trim
        i += 1
        if (line.nonEmpty) {
          if (line == "}") {
            // a stray close at root would silently drop the rest of the
            // file if accepted — fail at the parse site instead
            if (depth == 0) throw new IllegalArgumentException(
              s"unmatched '}' at line $i")
            return
          }
          else {
            val obr = objectBrace(line)
            if (obr >= 0) {
              // preprocess guarantees an object-opening `{` ends its line
              val path = splitPath(line.substring(0, obr).trim)
              parseObject(descend(into, path), depth + 1)
            } else {
              // a list may span lines: accumulate until brackets balance
              var full = line
              while (bracketBalance(full) > 0 && i < lines.length) {
                full = full + "\n" + stripComment(lines(i))
                i += 1
              }
              putKeyValue(into, full)
            }
          }
        }
      }
      if (depth > 0) throw new IllegalArgumentException(
        s"unclosed block: $depth '}' missing at end of input")
    }
    def bracketBalance(s: String): Int = {
      var inQ = false; var bal = 0; var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        if (inQ && c == '\\') j += 1
        else if (c == '"') inQ = !inQ
        else if (!inQ && c == '[') bal += 1
        else if (!inQ && c == ']') bal -= 1
        j += 1
      }
      bal
    }
    val root = newMap()
    parseObject(root, 0)
    Conf(resolve(freeze(root)))
  }

  private def freeze(m: mutable.LinkedHashMap[String, Any]): Map[String, Any] = {
    // LinkedHashMap iteration order survives the copy (VectorMap keeps it)
    scala.collection.immutable.VectorMap.from(m.map {
      case (k, v: mutable.LinkedHashMap[String @unchecked, Any @unchecked]) =>
        k -> freeze(v)
      case (k, v) => k -> v
    })
  }

  private val SubRef = """\$\{([^}]+)\}""".r

  /** Resolve `${path}` refs against the root to a fixed point. */
  private def resolve(root: Map[String, Any]): Map[String, Any] = {
    def lookup(tree: Map[String, Any], path: String): Option[String] =
      path.split('.').foldLeft(Option[Any](tree)) {
        case (Some(m: Map[String @unchecked, Any @unchecked]), k) => m.get(k)
        case _ => None
      }.collect { case s: String => s }
    def pass(tree: Map[String, Any], whole: Map[String, Any]): (Map[String, Any], Boolean) = {
      var changed = false
      def value(v: Any): Any = v match {
        case m: Map[String @unchecked, Any @unchecked] =>
          val (nv, c) = pass(m, whole); if (c) changed = true; nv
        case s: String if s.contains("${") =>
          val ns = SubRef.replaceAllIn(s, m =>
            scala.util.matching.Regex.quoteReplacement(
              lookup(whole, m.group(1)).getOrElse(m.matched)))
          if (ns != s) changed = true
          ns
        case xs: Seq[Any @unchecked] => xs.map(value)
        case other => other
      }
      (tree.map { case (k, v) => k -> value(v) }, changed)
    }
    var cur = root
    var rounds = 0
    var changed = true
    while (changed && rounds < 10) {
      val (next, c) = pass(cur, cur)
      cur = next; changed = c; rounds += 1
    }
    def unresolvedIn(v: Any): Boolean = v match {
      case s: String => s.contains("${")
      case xs: Seq[Any @unchecked] => xs.exists(unresolvedIn)
      case _ => false
    }
    def unresolved(tree: Map[String, Any]): Seq[String] = tree.toSeq.flatMap {
      case (_, m: Map[String @unchecked, Any @unchecked]) => unresolved(m)
      case (k, v) if unresolvedIn(v) => Seq(s"$k = $v")
      case _ => Nil
    }
    val bad = unresolved(cur)
    require(bad.isEmpty, s"unresolved substitutions: ${bad.mkString("; ")}")
    cur
  }
}
