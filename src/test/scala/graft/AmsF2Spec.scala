package graft

import org.apache.spark.sql.functions._

class AmsF2Spec extends SparkSpec {
  import spark.implicits._

  behavior of "Sketches.amsF2Cells / amsF2Report (X169)"

  it should "compute the exact second moment and a square-of-counter median" in {
    // tokens a,a,b in one group: F2 = 2^2 + 1^2 = 5; each counter is
    // 2*s(a)+s(b) in {+-3, +-1} so every estimate is 1 or 9
    val toks = Seq(("g", "a"), ("g", "a"), ("g", "b"))
      .toDF("grp", "tok")
    val r = graft.sketch.Sketches.amsF2Report(toks, "grp", "tok",
        counters = 9)
      .as[(String, Long, Long, Long, Double)].collect()
    r.length shouldBe 1
    val (_, n, f2, med, rel) = r.head
    n shouldBe 3L
    f2 shouldBe 5L
    Set(1L, 9L) should contain(med)
    rel shouldBe math.floor(
      math.abs(med.toDouble - 5.0) / 5.0 * 1e6 + 0.5) / 1e6
  }

  it should "merge split-built cells to the one-pass cells (mergeability)" in {
    val toks = (1L to 400L).map(i => (s"g${i % 3}", s"t${i % 37}"))
      .toDF("grp", "tok").withColumn("half", expr("hash(tok) % 2"))
    val full = graft.sketch.Sketches.amsF2Cells(toks, "grp", "tok")
      .orderBy(col("grp"), col("j"))
      .as[(String, Int, Long)].collect().toSeq
    val merged = graft.sketch.Sketches
      .amsF2Cells(toks.filter(col("half") === 0), "grp", "tok")
      .unionByName(graft.sketch.Sketches
        .amsF2Cells(toks.filter(col("half") =!= 0), "grp", "tok"))
      .groupBy(col("grp"), col("j"))
      .agg(sum(col("counter")).as("counter"))
      .orderBy(col("grp"), col("j"))
      .as[(String, Int, Long)].collect().toSeq
    merged shouldBe full
  }

  it should "be partition-invariant and require an odd counter count" in {
    val toks = (1L to 300L).map(i => (s"g${i % 2}", s"t${i % 23}"))
      .toDF("grp", "tok")
    def run(parts: Int) = graft.sketch.Sketches
      .amsF2Report(toks.repartition(parts), "grp", "tok")
      .orderBy(col("grp"))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    run(2) shouldBe run(9)
    an[IllegalArgumentException] should be thrownBy
      graft.sketch.Sketches.amsF2Report(toks, "grp", "tok",
        counters = 8)
  }
}
