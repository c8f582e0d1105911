package graft

import graft.relational.Intervals
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  it should "count overlapping pairs exactly like the naive self-join on seeded random intervals" in {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      val k = rnd.nextInt(7).toLong
      val s = rnd.nextInt(100).toLong
      // mix of empty (len 0), touching and genuinely overlapping spans
      val len = rnd.nextInt(12).toLong
      (k, i.toLong, s, s + len)
    }
    val df = rows.toDF("k", "id", "s", "e")
    val sweep = Intervals.overlapPairCount(df, Seq("k"), col("s"), col("e"))
      .as[(Long, Long)].collect().toMap
    val naive = Intervals.overlapPairCountNaive(df, Seq("k"), Seq("id"),
      col("s"), col("e")).as[(Long, Long)].collect().toMap
    // naive omits zero-pair keys; sweep reports them as 0
    sweep.keySet should contain allElementsOf naive.keySet
    naive.foreach { case (k, n) => sweep(k) shouldBe n }
    sweep.filterNot { case (k, _) => naive.contains(k) }
      .values.foreach(_ shouldBe 0L)
  }

  it should "treat touching endpoints as non-overlapping and drop empty/NULL intervals" in {
    val df = Seq(
      (1L, 1L, Some(0L), Some(10L)),
      (1L, 2L, Some(10L), Some(20L)), // touches id 1: NOT an overlap
      (1L, 3L, Some(5L), Some(5L)),   // empty: dropped
      (1L, 4L, Some(19L), Some(25L)), // overlaps id 2 only
      (2L, 5L, None, Some(9L)),       // NULL start: dropped
      (2L, 6L, Some(1L), Some(2L)))
      .toDF("k", "id", "s", "e")
    val r = Intervals.overlapPairCount(df, Seq("k"), col("s"), col("e"))
      .as[(Long, Long)].collect().toMap
    r(1L) shouldBe 1L
    r(2L) shouldBe 0L // the surviving singleton still reports its key
  }

  "stabbingCount (J15)" should "read live coverage at each probe with half-open boundary semantics" in {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 10L, 20L),
      (2L, 0L, 1L))
      .toDF("k", "s", "e")
    val probes = Seq(
      (1L, 0L),  // start of first: covered by it (s <= p)
      (1L, 7L),  // inside first two
      (1L, 10L), // first ENDS here (p < e fails), third starts: 2 cover
      (1L, 25L), // beyond everything
      (1L, 7L),  // duplicate probe: deduplicated
      (3L, 5L))  // key with no intervals
      .toDF("k", "p")
    val r = Intervals.stabbingCount(iv.toDF("k", "s", "e"), Seq("k"),
        col("s"), col("e"), probes, col("p"))
      .as[(Long, Long, Long)].collect()
    r.length shouldBe 5 // (1,7) once only
    val m = r.map(t => (t._1, t._2) -> t._3).toMap
    m((1L, 0L)) shouldBe 1L
    m((1L, 7L)) shouldBe 2L
    m((1L, 10L)) shouldBe 2L // {5,15} and {10,20}; {0,10} retired
    m((1L, 25L)) shouldBe 0L
    m((3L, 5L)) shouldBe 0L
    graft.util.Caches.releaseAll(spark)
  }

  it should "plan the sweep with a single exchange (window partitioning reused by the aggregate)" in {
    val df = Seq((1L, 0L, 5L), (1L, 3L, 9L)).toDF("k", "s", "e")
    val plan = Intervals.overlapPairCount(df, Seq("k"), col("s"), col("e"))
      .queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }
}
