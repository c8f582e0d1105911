package graft

import graft.sketch.{HeavyHitters, MisraGries}
import org.apache.spark.sql.functions._

/** Misra–Gries guarantee + determinism checks: the summary must never
  * lose an item above n/k (superset property, exercised directly on the
  * Aggregator and end-to-end), and the exact re-count must make the
  * final answer independent of partitioning. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed stream: token t_i appears ~N/i times. */
  private def skewed(n: Int): Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(n / i)(s"t$i"))

  behavior of "MisraGries"

  it should "keep every item above n/k through reduce and merge" in {
    val mg = new MisraGries(8)
    val stream = scala.util.Random.shuffle(skewed(4000))
    val n = stream.size
    // split into 5 chunks, reduce each, merge pairwise in tree order —
    // the shape Spark's partial aggregation produces
    val parts = stream.grouped(n / 5 + 1)
      .map(_.foldLeft(mg.zero)(mg.reduce)).toSeq
    val merged = parts.reduce(mg.merge)
    merged.size should be <= 8
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val mustKeep = exact.collect { case (t, c) if c.toLong * 8 > n => t }
    mustKeep should not be empty
    mustKeep.foreach(t => merged.keySet should contain(t))
  }

  it should "free slots via the decrement step instead of growing" in {
    val mg = new MisraGries(2)
    val s = Seq("a", "b", "c", "a", "a", "d").foldLeft(mg.zero)(mg.reduce)
    s.size should be <= 2
    s.keySet should contain("a") // freq 3 of 6 > 6/2? no — but survives
  }

  behavior of "HeavyHitters.heavyHitters"

  it should "equal the exact computation regardless of partitioning" in {
    val rows = (scala.util.Random.shuffle(skewed(3000)).map(("en", _)) ++
      scala.util.Random.shuffle(skewed(900)).map(("de", _)))
      .toDF("lang", "tok")
    val exact = rows.groupBy("lang", "tok").count()
      .join(rows.groupBy("lang").count().withColumnRenamed("count", "n"),
        "lang")
      .filter(col("count") * 10 > col("n"))
      .select(col("lang"), col("tok"), col("count").as("tok_count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    exact should not be empty
    for (nPart <- Seq(1, 3, 13)) {
      val got = HeavyHitters
        .heavyHitters(rows.repartition(nPart), "lang", "tok", k = 10)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      got shouldBe exact
    }
  }

  it should "report exact counts and shares for small groups (< k tokens)" in {
    val rows = Seq(("fr", "x"), ("fr", "x"), ("fr", "y")).toDF("lang", "tok")
    val out = HeavyHitters.heavyHitters(rows, "lang", "tok", k = 5)
      .orderBy("tok").collect()
    // threshold n/k = 0.6: x (2) and y (1) both exceed it
    out.map(_.getString(1)).toSeq shouldBe Seq("x", "y")
    out.map(_.getLong(2)).toSeq shouldBe Seq(2L, 1L)
    out(0).getDouble(4) shouldBe 0.666667 +- 1e-9
  }
}
