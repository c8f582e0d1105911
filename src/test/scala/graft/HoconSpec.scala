package graft

import graft.config.Hocon
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Parser-level edge cases for the HOCON subset (no Spark needed). */
class HoconSpec extends AnyFlatSpec with Matchers {

  it should "parse nested blocks, dotted keys and both separators" in {
    val c = Hocon.parse(
      """a { b { x = 1 } }
        |a.b.y: 2
        |a.c = three
        |""".stripMargin)
    c.getString("a.b.x") shouldBe "1"
    c.getString("a.b.y") shouldBe "2"
    c.getString("a.c") shouldBe "three"
  }

  it should "strip comments outside quotes only" in {
    val c = Hocon.parse(
      """u = "hdfs://host:9000" // trailing comment
        |v = plain # hash comment
        |""".stripMargin)
    c.getString("u") shouldBe "hdfs://host:9000"
    c.getString("v") shouldBe "plain"
  }

  it should "keep unquoted strings with spaces and quoted keys with dots" in {
    val c = Hocon.parse(
      """t = Customer Number
        |files { "a.b.csv" = [k1] }
        |""".stripMargin)
    c.getString("t") shouldBe "Customer Number"
    c.getObj("files").root.keySet shouldBe Set("a.b.csv")
  }

  it should "resolve chained substitutions to a fixed point" in {
    val c = Hocon.parse(
      """base = /data
        |raw = ${base}/raw
        |t.path = ${raw}/t.parquet
        |""".stripMargin)
    c.getString("t.path") shouldBe "/data/raw/t.parquet"
  }

  it should "fail loudly on unresolvable substitutions" in {
    an[IllegalArgumentException] should be thrownBy
      Hocon.parse("x = ${nope.missing}\n")
  }

  it should "parse single-line, multi-line and nested lists" in {
    val c = Hocon.parse(
      """flat = [a, b, "c d"]
        |multi = [
        |  one
        |  two, three
        |]
        |nested = [
        |  [[k1, k2], []]
        |  [[k3], [a1]]
        |]
        |""".stripMargin)
    c.getSeq("flat") shouldBe Seq("a", "b", "c d")
    c.getSeq("multi") shouldBe Seq("one", "two", "three")
    c.getList("nested") shouldBe Seq(
      Seq(Seq("k1", "k2"), Seq()),
      Seq(Seq("k3"), Seq("a1")))
  }

  it should "parse inline objects and merge re-opened blocks" in {
    val c = Hocon.parse(
      """m { a: 1, b: 2 }
        |m { c = 3 }
        |""".stripMargin)
    c.getString("m.a") shouldBe "1"
    c.getString("m.b") shouldBe "2"
    c.getString("m.c") shouldBe "3"
  }

  it should "preserve declaration order for children" in {
    val c = Hocon.parse(
      """tables { zeta { x = 1 } alpha { x = 2 } }
        |""".stripMargin.replace("{ zeta", "{\n zeta").replace("} alpha", "}\n alpha").replace("} }", "}\n}"))
    c.children("tables").map(_._1) shouldBe Seq("zeta", "alpha")
  }

  it should "reject a path used as both value and object" in {
    an[IllegalArgumentException] should be thrownBy
      Hocon.parse("a = 1\na { b = 2 }\n")
  }

  it should "reject unbalanced braces instead of silently dropping content" in {
    an[IllegalArgumentException] should be thrownBy
      Hocon.parse("a { x = 1 }\n}\nb = 2\n") // stray close
    an[IllegalArgumentException] should be thrownBy
      Hocon.parse("a {\n x = 1\n")            // unclosed block
  }

  it should "keep comment markers after an escaped quote inside a quoted value" in {
    val c = Hocon.parse("""x = "a\" // b"""" + "\n")
    c.getString("x") shouldBe """a" // b"""
  }
}
