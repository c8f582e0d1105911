package graft.store

import scala.collection.mutable

/** Feature metadata (reference: diamond/models/Feature.scala:17-46). */
sealed trait AttributeType
object AttributeType {
  case object Base extends AttributeType
  case object Transformed extends AttributeType
  case object Derived extends AttributeType
  def parse(s: String): AttributeType = s.toLowerCase match {
    case "base" => Base
    case "transformed" => Transformed
    case "derived" => Derived
    case other => throw new IllegalArgumentException(s"bad attributeType $other")
  }
}

case class Feature(
    attribute: String,
    attributeType: AttributeType,
    namespace: String,
    encoding: String,
    description: String = "",
    active: Boolean = true)

/** In-memory feature registry (reference: diamond/store/FeatureStore.scala:
  * 10-18): ordered registration, lookup by namespace, and the registered
  * feature list that drives snapshot/chord pivots
  * (graft.events.EventFunctions.snapshot's explicit feature list). */
class FeatureRegistry {
  private val features = mutable.LinkedHashMap.empty[String, Feature]
  def register(f: Feature): Unit = features(s"${f.namespace}.${f.attribute}") = f
  def all: Seq[Feature] = features.values.toSeq
  def active: Seq[Feature] = all.filter(_.active)
  def inNamespace(ns: String): Seq[Feature] = all.filter(_.namespace == ns)
  def attributes(ns: String): Seq[String] = inNamespace(ns).map(_.attribute)
}

/** S19: CSV-backed repository (reference:
  * diamond/store/FeatureStoreRepository.scala:25-55) — driver-side
  * java.nio, no Hadoop dependency. */
object FeatureRepository {
  private def esc(s: String) =
    if (s.contains(",") || s.contains("\"")) "\"" + s.replace("\"", "\"\"") + "\"" else s

  def save(path: String, reg: FeatureRegistry): Unit = {
    val lines = "attribute,attributeType,namespace,encoding,description,active" +:
      reg.all.map(f => Seq(f.attribute, f.attributeType.toString, f.namespace,
        f.encoding, esc(f.description), f.active.toString).mkString(","))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  /** Quote-aware split of one CSV line ("" inside quotes = literal quote). */
  private[store] def splitLine(l: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < l.length && l.charAt(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQuotes = false
        else cur += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => out += cur.result(); cur.clear()
        case ch => cur += ch
      }
      i += 1
    }
    out += cur.result()
    out.toSeq
  }

  def load(path: String): FeatureRegistry = {
    val reg = new FeatureRegistry
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").split("\n").toSeq
    lines.drop(1).filter(_.nonEmpty).foreach { l =>
      val c = splitLine(l)
      reg.register(Feature(c(0), AttributeType.parse(c(1)), c(2), c(3),
        c.lift(4).getOrElse(""), c.lift(5).forall(_.toBoolean)))
    }
    reg
  }
}
