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

  behavior of "ModelIngest"

  it should "parse an XGBoost-style dump into strict splits with missing routing" in {
    import graft.ml.{Leaf, ModelIngest, Split}
    val dump =
      """[{"nodeid": 0, "split": "f0", "split_condition": 10.0,
        |  "yes": 1, "no": 2, "missing": 1, "children": [
        |    {"nodeid": 1, "leaf": 1.5},
        |    {"nodeid": 2, "split": "f1", "split_condition": 0.5,
        |     "yes": 3, "no": 4, "missing": 4, "children": [
        |       {"nodeid": 3, "leaf": 2.5}, {"nodeid": 4, "leaf": 3.5}]}]}]""".stripMargin
    val m = ModelIngest.parseEnsemble(dump, featureNames = Map("f0" -> "x", "f1" -> "y"))
    m.bias shouldBe 0.0
    m.trees shouldBe Seq(
      Split("x", 10.0, Leaf(1.5),
        Split("y", 0.5, Leaf(2.5), Leaf(3.5), missingLeft = false, strict = true),
        missingLeft = true, strict = true))
  }

  it should "score an ingested model with < comparisons and the missing branch, matching its SQL" in {
    import graft.ml.ModelIngest
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val dump =
      """{"bias": 100.0, "trees": [
        |  {"nodeid": 0, "split": "x", "split_condition": 10.0,
        |   "yes": 1, "no": 2, "missing": 1, "children": [
        |     {"nodeid": 1, "leaf": 1.0}, {"nodeid": 2, "leaf": 2.0}]}]}""".stripMargin
    val m = ModelIngest.parseEnsemble(dump)
    val df = Seq(
      (1L, Some(9.9)),   // x < 10  -> yes -> 1.0
      (2L, Some(10.0)),  // x == 10 -> STRICT comparison: no -> 2.0
      (3L, None))        // missing -> yes branch -> 1.0
      .toDF("id", "x")
    val scored = m.score(df).select("id", "score")
      .as[(Long, Double)].collect().toMap
    scored shouldBe Map(1L -> 101.0, 2L -> 102.0, 3L -> 101.0)
    val viaSql = df.select(col("id"),
      expr(m.scoreSql).cast("double").as("s"))
      .as[(Long, Double)].collect().toMap
    viaSql shouldBe scored
  }

  it should "reject dumps with dangling child ids or a foreign missing id" in {
    import graft.ml.ModelIngest
    val dangling =
      """[{"nodeid": 0, "split": "x", "split_condition": 1.0,
        |  "yes": 1, "no": 9, "missing": 1,
        |  "children": [{"nodeid": 1, "leaf": 0.5}]}]""".stripMargin
    an[IllegalArgumentException] should be thrownBy
      ModelIngest.parseEnsemble(dangling)
    val badMissing =
      """[{"nodeid": 0, "split": "x", "split_condition": 1.0,
        |  "yes": 1, "no": 2, "missing": 7, "children": [
        |    {"nodeid": 1, "leaf": 0.5}, {"nodeid": 2, "leaf": 1.5}]}]""".stripMargin
    an[IllegalArgumentException] should be thrownBy
      ModelIngest.parseEnsemble(badMissing)
  }
}
