package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline: a broadcast
  * nested-loop join against the candidate set, one pass, no shuffle of the
  * big side. The scale path is IVF: assign every vector to its nearest
  * centroid (tiny centroid set, broadcast), then search only within the
  * centroid bucket — the pair space shrinks from O(n²) to
  * O(n · bucket size) and the only shuffle is on the centroid id.
  *
  * All arithmetic is double-precision left-to-right folds over the vector —
  * bit-reproducible by the DuckDB oracle's `list_dot_product`, which uses
  * the same sequential accumulation.
  */
object Similarity {

  /** Left-to-right double fold of the element products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  private def withNorm(df: DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Brute-force exact cosine top-k per query vector (self excluded).
    * Candidates are broadcast: at 100 TB the query side streams through
    * executors while the (smaller, or sampled) candidate index rides along —
    * no shuffle of the query side at all. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val n = withNorm(df, idCol, vecCol)
    val a = n.select(col("vec_id"), col("v"), col("nrm"))
    val b = broadcast(n.select(col("vec_id").as("neighbor_id"),
      col("v").as("w"), col("nrm").as("nrm_b")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    a.join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("v"), col("w"), col("nrm"), col("nrm_b")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("rk"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** IVF bucket assignment: nearest centroid by cosine (ties to the lower
    * centroid id). `centroids` must be small enough to broadcast — in a
    * production index it is k-means output; here any deterministic subset
    * works. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val n = withNorm(df, idCol, vecCol)
    val c = broadcast(withNorm(centroids, idCol, vecCol)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"),
        col("nrm").as("cnrm")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("centroid_id"))
    n.crossJoin(c)
      .withColumn("ccos", cosine(col("v"), col("cv"), col("nrm"), col("cnrm")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("centroid_id"))
  }

  /** IVF approximate top-k: search only the query's own centroid bucket.
    * The bucket join shuffles both sides by `centroid_id` once; within a
    * bucket the pair count is bounded by bucket size. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, k: Int): DataFrame = {
    val assigned = ivfAssign(df, idCol, vecCol, centroids)
    val cands = assigned.select(col("centroid_id"),
      col("vec_id").as("neighbor_id"), col("v").as("w"), col("nrm").as("nrm_b"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    assigned.join(cands, "centroid_id")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("v"), col("w"), col("nrm"), col("nrm_b")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("centroid_id"), col("rk"),
        col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold (brute-force
    * pair generation with the candidate side broadcast; for the banded
    * scale path see the LSH design in [[graft.text.Dedup]]). */
  def cosineNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val n = withNorm(df, idCol, vecCol)
    val b = broadcast(n.select(col("vec_id").as("vec_b"),
      col("v").as("w"), col("nrm").as("nrm_b")))
    n.join(b, col("vec_id") < col("vec_b"))
      .withColumn("cos", cosine(col("v"), col("w"), col("nrm"), col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select(col("vec_id").as("vec_a"), col("vec_b"),
        round(col("cos"), 6).as("cosine"))
  }
}
