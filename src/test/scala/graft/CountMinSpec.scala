package graft

import graft.sketch.Sketches
import org.apache.spark.sql.functions._

/** Count–Min sketch properties: split-merge consistency (the property
  * that makes persisted per-batch sketch tables sound), collision-free
  * exactness at generous width, the overestimate-only theorem under
  * forced collisions, and partitioning invariance. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def toks(rows: (String, String)*) =
    rows.toDF("grp", "tok")

  private val corpus = toks(
    Seq.fill(5)(("a", "x")) ++ Seq.fill(3)(("a", "y")) ++
      Seq.fill(2)(("a", "z")) ++ Seq.fill(7)(("b", "x")) ++
      Seq.fill(1)(("b", "w")): _*)

  behavior of "Sketches.countMinCells"

  it should "merge split batches into the one-pass sketch cell-for-cell" in {
    val onePass = Sketches.countMinCells(corpus, "grp", "tok", 3, 64)
    val parts = Seq(
      corpus.filter(xxhash64(col("tok")) % 2 === 0),
      corpus.filter(xxhash64(col("tok")) % 2 =!= 0))
    val merged = parts.map(Sketches.countMinCells(_, "grp", "tok", 3, 64))
      .reduce(_ unionByName _)
      .groupBy(col("grp"), col("r"), col("c"))
      .agg(sum(col("n")).as("n"))
    val a = onePass.orderBy("grp", "r", "c").collect().toSeq
    val b = merged.orderBy("grp", "r", "c").collect().toSeq
    a shouldBe b
  }

  it should "be invariant to the input partitioning" in {
    val a = Sketches.countMinCells(corpus, "grp", "tok", 3, 64)
      .orderBy("grp", "r", "c").collect().toSeq
    val b = Sketches.countMinCells(corpus.repartition(7), "grp", "tok", 3, 64)
      .orderBy("grp", "r", "c").collect().toSeq
    a shouldBe b
  }

  behavior of "Sketches.countMinEstimate"

  it should "return exact counts when the width avoids collisions" in {
    val cells = Sketches.countMinCells(corpus, "grp", "tok", 4, 4096)
    val probes = corpus.select(col("grp"), col("tok")).distinct()
    val est = Sketches.countMinEstimate(cells, probes, "grp", "tok", 4, 4096)
      .orderBy("grp", "key")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    est.toSeq shouldBe Seq(
      ("a", "x", 5L), ("a", "y", 3L), ("a", "z", 2L),
      ("b", "w", 1L), ("b", "x", 7L))
  }

  it should "only ever OVERestimate, even with forced collisions" in {
    // width 2, depth 1: collisions are certain; est >= exact must hold
    // for every key regardless.
    val cells = Sketches.countMinCells(corpus, "grp", "tok", 1, 2)
    val exact = corpus.groupBy(col("grp").as("egrp"), col("tok"))
      .agg(count(lit(1)).as("exact_n"))
    val est = Sketches.countMinEstimate(
      cells, corpus.select(col("grp"), col("tok")), "grp", "tok", 1, 2)
    val joined = est.join(exact,
      col("grp") === col("egrp") && col("key") === col("tok"))
      .select(col("est_n"), col("exact_n")).collect()
    joined.length shouldBe 5
    joined.foreach(r => r.getLong(0) should be >= r.getLong(1))
    // and the total mass is conserved per hash row
    cells.groupBy("grp", "r").agg(sum("n").as("m"))
      .orderBy("grp").collect().map(_.getLong(2)).toSeq shouldBe Seq(10L, 8L)
  }

  it should "report absent keys as zero when no cell collides" in {
    val cells = Sketches.countMinCells(corpus, "grp", "tok", 4, 4096)
    val probes = Seq(("a", "never-seen-token")).toDF("grp", "tok")
    val est = Sketches.countMinEstimate(cells, probes, "grp", "tok", 4, 4096)
      .collect()
    est.length shouldBe 1
    est.head.getLong(2) shouldBe 0L
  }

  behavior of "Sketches.countMinReport"

  it should "pin ge_ok and bound_ok true on a collision-free corpus" in {
    val rep = Sketches.countMinReport(corpus, "grp", "tok",
      depth = 4, width = 4096, minExact = 2L)
      .orderBy("grp", "key").collect()
    rep.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toSeq shouldBe Seq(
      ("a", "x", 5L, 5L, true, true),
      ("a", "y", 3L, 3L, true, true),
      ("a", "z", 2L, 2L, true, true),
      ("b", "x", 7L, 7L, true, true))
  }
}
