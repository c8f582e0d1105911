package graft

import graft.graph.EntityResolution

class GraphSpec extends SparkSpec {
  import spark.implicits._

  it should "find connected components across chains" in {
    // two components: {a,b,c,d} chained, {x,y}
    val edges = Seq(("b", "a"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("src", "dst")
    val cc = EntityResolution.connectedComponents(edges, "src", "dst")
      .as[(String, String)].collect().toMap
    cc shouldBe Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x")
  }

  it should "resolve ids through the component honouring confidence" in {
    val mapping = Seq(
      ("e:1", "p:9", 1.0),
      ("e:2", "p:8", 0.2), // below threshold -> unresolved
      ("e:3", "c:3", 1.0), ("c:3", "p:7", 0.9)) // two hops
      .toDF("src", "dst", "confidence")
    val r = EntityResolution.resolve(mapping, "src", "dst", "confidence",
      minConfidence = 0.5, fromType = "e", toType = "p")
      .as[(String, Option[String])].collect().toMap
    r("e:1") shouldBe Some("p:9")
    r("e:3") shouldBe Some("p:7")
    r.get("e:2").flatten shouldBe None
  }
}
