package graft.queries

import graft.Tables.t
import graft.graph.EntityResolution
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-resolution coverage (SURVEY.md §2.12). The id-mapping graph is
  * derived deterministically from `customer`: each customer key k has a
  * customer id `c:k` and an email id `e:k`, and customers 2m/2m+1 share
  * phone id `p:m` — components of five vertices whose canonical label is
  * the minimum id string. The DuckDB oracle computes the same components
  * with a recursive transitive-closure CTE. */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  private def edges(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"))
    c.select(
        concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("e:"), col("c_custkey")).as("dst"),
        lit(1.0).as("confidence"))
      .unionByName(c.select(
        concat(lit("e:"), col("c_custkey")).as("src"),
        concat(lit("p:"), (col("c_custkey") / 2).cast("long")).as("dst"),
        lit(0.9).as("confidence")))
  }

  val queries: Map[String, Q] = Map(
    // G1: connected components by iterative min-label propagation.
    "q_g1_connected_components" -> { (s, dir) =>
      EntityResolution.connectedComponents(edges(s, dir), "src", "dst")
        .orderBy(col("v"))
    },

    // G2: resolve email ids to the phone id of the same component.
    "q_g2_resolve_ids" -> { (s, dir) =>
      EntityResolution.resolve(edges(s, dir), "src", "dst",
        "confidence", minConfidence = 0.5, fromType = "e", toType = "p")
        .orderBy(col("from_id"))
    })

  private val edgeCte =
    """base AS (
      |  SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS src,
      |    'e:' || CAST(c_custkey AS VARCHAR) AS dst
      |  FROM customer
      |  UNION ALL
      |  SELECT 'e:' || CAST(c_custkey AS VARCHAR),
      |    'p:' || CAST(c_custkey // 2 AS VARCHAR)
      |  FROM customer),
      |edges AS (
      |  SELECT src AS a, dst AS b FROM base
      |  UNION SELECT dst, src FROM base)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_g1_connected_components" ->
      s"""WITH RECURSIVE $edgeCte,
         |reach(v, m) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
         |  UNION
         |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.v)
         |SELECT v, min(m) AS component FROM reach
         |GROUP BY v ORDER BY v""".stripMargin,
    "q_g2_resolve_ids" ->
      """SELECT 'e:' || CAST(c_custkey AS VARCHAR) AS from_id,
        |  'p:' || CAST(c_custkey // 2 AS VARCHAR) AS to_id
        |FROM customer ORDER BY from_id""".stripMargin)
}
