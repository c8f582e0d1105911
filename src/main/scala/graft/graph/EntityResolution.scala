package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution over an id-mapping table (SURVEY.md §2.12 G1/G2).
  *
  * The reference walked the mapping graph with GraphX Pregel plus a
  * driver-side `collect` fallback and flagged its own approach as wrong
  * (reference: diamond/load/CustomerResolver.scala:11,59-65,77). Here the
  * semantics are connected components via iterative min-label propagation
  * expressed in DataFrames: every iteration is one shuffle join keyed by
  * vertex id, the iteration count is bounded by the component diameter
  * (id-mapping graphs are shallow — an entity's ids form a star around it),
  * and `localCheckpoint` truncates the plan lineage so the loop does not
  * accumulate a growing DAG. Nothing is ever collected to the driver.
  */
object EntityResolution {

  /** G1: connected components of the undirected (src, dst) edge set.
    * Returns (vertex, component) where component = the lexicographic
    * minimum vertex id in the component. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("component", col("v"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // Carry the old label through the checkpoint so the convergence
      // probe is a local filter over materialized data — one Spark job per
      // iteration (propagate+checkpoint), not two.
      val neighborMin = sym
        .join(labels.select(col("v").as("b"), col("component").as("nc")), "b")
        .groupBy(col("a")).agg(min(col("nc")).as("nmin"))
      val next = labels
        .join(neighborMin.select(col("a").as("v"), col("nmin")), Seq("v"), "left")
        .select(col("v"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"),
          col("component").as("__old"))
        .localCheckpoint(true)
      val changed = next.filter(col("component") =!= col("__old")).count()
      labels = next.drop("__old")
      converged = changed == 0
      i += 1
    }
    // Silently returning unconverged labels would split true components
    // into several — fail loudly instead.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations; " +
          "the graph has a component with a longer diameter — raise maxIter")
    labels
  }

  /** G2 `mapEntities`: resolve every id of `fromType` to an id of `toType`
    * in the same component, honouring a confidence threshold on the edges.
    * Vertices are `<idType>:<id>` strings; when a component holds several
    * target ids the lexicographic minimum wins (deterministic). */
  def resolve(mapping: DataFrame, srcCol: String, dstCol: String,
      confidenceCol: String, minConfidence: Double,
      fromType: String, toType: String): DataFrame = {
    val cc = connectedComponents(
      mapping.filter(col(confidenceCol) >= minConfidence), srcCol, dstCol)
    val from = cc.filter(col("v").startsWith(s"$fromType:"))
      .select(col("v").as("from_id"), col("component"))
    val to = cc.filter(col("v").startsWith(s"$toType:"))
      .groupBy(col("component")).agg(min(col("v")).as("to_id"))
    from.join(to, Seq("component"), "left")
      .select(col("from_id"), col("to_id"))
  }
}
