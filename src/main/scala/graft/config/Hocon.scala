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
    val lines = text.split("\n", -1)
    var i = 0
    def stripComment(l: String): String = {
      var inQ = false; var j = 0
      while (j < l.length) {
        val c = l.charAt(j)
        if (c == '"') inQ = !inQ
        else if (!inQ && (c == '#' ||
          (c == '/' && j + 1 < l.length && l.charAt(j + 1) == '/')))
          return l.substring(0, j)
        j += 1
      }
      l
    }
    def unquote(s: String): String =
      if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\""))
        s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
      else s
    def parseScalarList(s: String): Any =
      if (s.startsWith("[") && s.endsWith("]")) {
        val body = s.substring(1, s.length - 1).trim
        if (body.isEmpty) Seq.empty[String]
        else body.split(",").toSeq.map(e => unquote(e.trim))
      } else unquote(s)
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
        if (c == '"') inQ = !inQ
        else if (!inQ && (c == '=' || c == ':')) sep = j
        j += 1
      }
      require(sep > 0, s"unparseable config line: $kv")
      val path = kv.substring(0, sep).trim.split('.').toSeq.map(unquote)
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
        if (c == '"') inQ = !inQ
        else if (!inQ && (c == '=' || c == ':')) return -1
        else if (!inQ && c == '{' && (j == 0 || line.charAt(j - 1) != '$'))
          return j
        j += 1
      }
      -1
    }
    def parseObject(into: MMap): Unit = {
      while (i < lines.length) {
        val line = stripComment(lines(i)).trim
        i += 1
        if (line.nonEmpty) {
          if (line == "}") return
          else {
            val obr = objectBrace(line)
            if (obr >= 0) {
              val path = line.substring(0, obr).trim.split('.').toSeq.map(unquote)
              val child = descend(into, path)
              val rest = line.substring(obr + 1).trim
              if (rest.isEmpty) parseObject(child) // multi-line block
              else {
                // inline object: `key { a: b, c: d }` on one line
                require(rest.endsWith("}"),
                  s"inline object must close on the same line: $line")
                rest.dropRight(1).split(",").map(_.trim)
                  .filter(_.nonEmpty).foreach(putKeyValue(child, _))
              }
            } else putKeyValue(into, line)
          }
        }
      }
    }
    val root = newMap()
    parseObject(root)
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
      val out = tree.map {
        case (k, v: Map[String @unchecked, Any @unchecked]) =>
          val (nv, c) = pass(v, whole); if (c) changed = true; k -> nv
        case (k, v: String) if v.contains("${") =>
          val nv = SubRef.replaceAllIn(v, m =>
            scala.util.matching.Regex.quoteReplacement(
              lookup(whole, m.group(1)).getOrElse(m.matched)))
          if (nv != v) changed = true
          k -> nv
        case (k, xs: Seq[String @unchecked]) if xs.exists(_.contains("${")) =>
          val nxs = xs.map(x => SubRef.replaceAllIn(x, m =>
            scala.util.matching.Regex.quoteReplacement(
              lookup(whole, m.group(1)).getOrElse(m.matched))))
          if (nxs != xs) changed = true
          k -> nxs
        case kv => kv
      }
      (out, changed)
    }
    var cur = root
    var rounds = 0
    var changed = true
    while (changed && rounds < 10) {
      val (next, c) = pass(cur, cur)
      cur = next; changed = c; rounds += 1
    }
    def unresolved(tree: Map[String, Any]): Seq[String] = tree.toSeq.flatMap {
      case (_, m: Map[String @unchecked, Any @unchecked]) => unresolved(m)
      case (k, s: String) if s.contains("${") => Seq(s"$k = $s")
      case (k, xs: Seq[String @unchecked]) if xs.exists(_.contains("${")) =>
        Seq(s"$k = ${xs.mkString("[", ",", "]")}")
      case _ => Nil
    }
    val bad = unresolved(cur)
    require(bad.isEmpty, s"unresolved substitutions: ${bad.mkString("; ")}")
    cur
  }
}
