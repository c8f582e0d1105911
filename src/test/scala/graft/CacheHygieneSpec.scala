package graft

import graft.text.Dedup
import graft.ann.Similarity
import org.apache.spark.sql.functions._

/** Operator-internal caches must be releasable: a composed production run
  * (the X18 shape — exact dedup + LSH clustering + connected components,
  * i.e. persists AND localCheckpoint blocks) materializes its result, the
  * caller calls `Caches.releaseAll`, and NO cached block introduced by the
  * run survives. Without this contract a long-running service accumulates
  * cached corpus projections until eviction pressure. */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def cachedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  it should "leave zero cached blocks after a released dedup pipeline run" in {
    val docs = Seq(
      (1L, "the cat sat on the mat and then slept all day"),
      (2L, "the cat sat on the mat and then slept all day"),
      (3L, "the cat sat on the mat and then slept all night"),
      (4L, "completely different words about embedded systems and rust"))
      .toDF("doc_id", "text")
    val before = cachedIds
    Dedup.dedupPipeline(docs, "doc_id", "text").collect()
    // the run pinned something (persists + CC checkpoints)...
    (cachedIds -- before) should not be empty
    graft.util.Caches.releaseAll(spark)
    // ...and releasing drops every block the run introduced
    (cachedIds -- before) shouldBe empty
  }

  it should "leave zero cached blocks after released jaccard, incremental and IVF runs" in {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six"))
      .toDF("doc_id", "text")
    val vecs = (1L to 20L)
      .map(i => (i, Array.tabulate(8)(j => (i % 5 + j).toDouble)))
      .toDF("vec_id", "embedding")
    graft.functions.DotProductExpr.register(spark)
    val before = cachedIds
    Dedup.jaccardSimilarityJoin(docs, "doc_id", "text").collect()
    Dedup.jaccardSimilarityJoinBetween(docs.filter(col("doc_id") < 3),
      docs.filter(col("doc_id") >= 3), "doc_id", "text").collect()
    Dedup.incrementalDedup(docs.filter(col("doc_id") < 3),
      docs.filter(col("doc_id") >= 3), "doc_id", "text").collect()
    Similarity.ivfTopK(vecs, "vec_id", "embedding",
      vecs.filter(col("vec_id") % 7 === 0), k = 2, dim = 8).collect()
    Similarity.ivfTopKMultiProbe(vecs, "vec_id", "embedding",
      vecs.filter(col("vec_id") % 7 === 0), k = 2, dim = 8,
      probes = 2).collect()
    (cachedIds -- before) should not be empty
    graft.util.Caches.releaseAll(spark)
    (cachedIds -- before) shouldBe empty
  }

  it should "pin only O(1) label copies during connected components" in {
    // a path graph forces several propagation rounds; superseded label
    // checkpoints must be dropped inside the loop, not at session end
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val before = cachedIds
    graft.graph.EntityResolution
      .connectedComponents(edges, "src", "dst").collect()
    // surviving blocks: the symmetric edge set + the final labels only
    (cachedIds -- before).size should be <= 2
    graft.util.Caches.releaseAll(spark)
    (cachedIds -- before) shouldBe empty
  }

  it should "leave zero cached blocks after released round-10 rank/eval/refine runs" in {
    // the two-phase Ranks machinery + X116/X122/F22/E12/D5 all persist
    // internally; a monitor calling them in a loop must be able to
    // release everything
    val rnd = new scala.util.Random(3)
    val vals = (1 to 300).map(i => (i.toLong, rnd.nextGaussian()))
      .toDF("id", "v")
    val ev = (1 to 300).map { _ =>
      (rnd.nextInt(30).toLong,
        java.sql.Timestamp.valueOf(
          f"2024-01-${1 + rnd.nextInt(28)}%02d 09:00:00"),
        rnd.nextInt(1000) / 100.0)
    }.toDF("user_id", "ts", "value")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six"))
      .toDF("doc_id", "text")
    val before = cachedIds
    graft.dq.Dq.psiDrift(vals, vals, "v", "id", bins = 5).collect()
    graft.dq.Dq.ksDrift(vals, vals, "v").collect()
    graft.ml.Eval.rocAuc(vals, col("v"),
      (col("id") % 2).cast("int")).collect()
    graft.dq.Stats.giniConcentration(
      vals.select((col("id") % 17).as("w")), col("w")).collect()
    graft.events.EventFeatures.rfmScores(ev, "2024-02-01").collect()
    graft.events.EventFeatures.ltvCurves(ev).collect()
    graft.text.Dedup.refineClusters(docs, "doc_id", "text",
      Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id"))
      .collect()
    graft.text.Dedup.dedupYieldReport(docs, "doc_id", "text").collect()
    (cachedIds -- before) should not be empty
    graft.util.Caches.releaseAll(spark)
    (cachedIds -- before) shouldBe empty
  }
}
