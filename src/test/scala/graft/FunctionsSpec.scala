package graft

import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "hashInput encoding"

  it should "distinguish shifted field boundaries" in {
    val df = Seq(("ab", "c", "a", "bc")).toDF("a1", "a2", "b1", "b2")
    val r = df.select(
      graft.functions.changeHashMd5(Seq(col("a1"), col("a2"))).as("h1"),
      graft.functions.changeHashMd5(Seq(col("b1"), col("b2"))).as("h2"))
      .head()
    r.getString(0) should not be r.getString(1)
  }

  it should "distinguish null, empty string, and missing-side values" in {
    val df = Seq(
      (Option("x"), Option.empty[String]),
      (Option("x"), Option("")),
      (Option.empty[String], Option("x"))).toDF("c1", "c2")
    val hs = df.select(
      graft.functions.changeHashMd5(Seq(col("c1"), col("c2"))).as("h"))
      .collect().map(_.getString(0))
    hs.distinct should have length 3
  }

  behavior of "entityIdHash"

  it should "be deterministic and key-order-sensitive" in {
    val df = Seq((1, 2)).toDF("k1", "k2")
    val r = df.select(
      graft.functions.entityIdHash("t", Seq(col("k1"), col("k2"))).as("a"),
      graft.functions.entityIdHash("t", Seq(col("k1"), col("k2"))).as("b"),
      graft.functions.entityIdHash("t", Seq(col("k2"), col("k1"))).as("c"))
      .head()
    r.getString(0) shouldBe r.getString(1)
    r.getString(0) should not be r.getString(2)
  }

  behavior of "template"

  it should "substitute $name and ${name}, keep unknowns, honour $$ escapes" in {
    val out = graft.functions.template(
      "select $a, ${b_x} from $missing where q = '$$lit'",
      Map("a" -> "1", "b_x" -> "2"))
    out shouldBe "select 1, 2 from $missing where q = '$lit'"
  }

  behavior of "string utilities"

  it should "camelize and underscore round-trip" in {
    graft.functions.camelize("foo_bar_baz") shouldBe "fooBarBaz"
    graft.functions.underscore("fooBarBaz") shouldBe "foo_bar_baz"
  }

  it should "detect numeric literals" in {
    graft.functions.isNumber("42") shouldBe true
    graft.functions.isNumber("-4.5e3") shouldBe true
    graft.functions.isNumber("4x") shouldBe false
    graft.functions.isNumber("") shouldBe false
  }

  behavior of "TreeScoring"

  it should "route splits (nulls right) and mirror its own SQL exactly" in {
    import graft.ml.{Leaf, Split, TreeScoring}
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val trees = Seq(
      Split("x", 10.0, Leaf(1.0), Split("y", 0.5, Leaf(2.0), Leaf(3.0))),
      Split("y", 0.2, Leaf(0.1), Leaf(0.2)))
    val df = Seq(
      (1L, Some(5.0), Some(0.1)),   // x<=10 -> 1.0; y<=0.2 -> 0.1
      (2L, Some(20.0), Some(0.4)),  // x>10,y<=0.5 -> 2.0; y>0.2 -> 0.2
      (3L, None, Some(0.9)))        // null x routes RIGHT; y>0.5 -> 3.0
      .toDF("id", "x", "y")
    val scored = TreeScoring.scoreEnsemble(df, trees, bias = 0.5)
      .select("id", "score").as[(Long, Double)].collect().toMap
    scored(1L) shouldBe 1.6
    scored(2L) shouldBe 2.7
    scored(3L) shouldBe 3.7
    // the emitted SQL, evaluated by Spark's OWN parser, matches exactly
    // (cast: the SQL parser types bare literals as DECIMAL)
    val viaSql = df.select(col("id"),
      expr(TreeScoring.scoreEnsembleSql(trees, bias = 0.5))
        .cast("double").as("s"))
      .as[(Long, Double)].collect().toMap
    viaSql shouldBe scored
  }
}
