package graft.queries

import graft.Tables.t
import graft.star.{DimSpec, Star}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema generation coverage (SURVEY.md §2.10 T1-T4) over the
  * TPC-H-ish tables. Surrogate ids are dense row_numbers over the key hash,
  * so the DuckDB oracle recomputes the exact id assignment.
  */
object StarQueries {
  type Q = (SparkSession, String) => DataFrame

  private val PT  = "2024-02-01 00:00:00"
  private val PT2 = "2024-03-01 00:00:00"

  private val custDim = DimSpec("dim_customer", Seq("c_custkey"), Seq("c_mktsegment"))

  val queries: Map[String, Q] = Map(
    // T5: date dimension generator — one row per day over an
    // ISO-week-boundary-crossing range; pure range arithmetic, no
    // data scan.
    "q_t5_date_dimension" -> { (s, dir) =>
      Star.dateDimension(s, "2023-12-25", "2024-03-31")
        .orderBy(col("date"))
    },

    // T2: dimension build from a denormalized source — first-wins attr
    // tuples per key, unknown member, dense surrogate ids.
    "q_t2_dim_load" -> { (s, dir) =>
      val src = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      val spec = DimSpec("dim_customer", Seq("c_custkey"),
        Seq("c_mktsegment", "o_orderpriority"))
      Star.mergeDim(None, Star.loadDim(src, spec, PT), spec, PT)
        .select(col("id"), col("hashed_key"), col("c_custkey"),
          col("c_mktsegment"), col("o_orderpriority"),
          col("rectype"), col("version"))
        .orderBy(col("id"))
    },

    // T3: dimension merge — changed keys get version+1 under the same id,
    // superseded versions are closed at the new start_time.
    "q_t3_dim_merge" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val dim1 = Star.mergeDim(None, Star.loadDim(cust, custDim, PT), custDim, PT)
      val batch2 = cust.withColumn("c_mktsegment",
        when(col("c_custkey") % 7 === 0, lit("CHANGED"))
          .otherwise(col("c_mktsegment")))
      val merged = Star.mergeDim(Some(dim1),
        Star.loadDim(batch2, custDim, PT2), custDim, PT2)
      merged.select(col("id"), col("c_custkey"), col("c_mktsegment"),
        col("rectype"), col("version"),
        (col("end_time") === lit("9999-12-31 00:00:00").cast("timestamp"))
          .as("open"))
        .orderBy(col("id"), col("version"))
    },

    // T4: fact build — FK columns resolved by broadcast hash-key join.
    "q_t4_fact_fks" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val prioDim = DimSpec("dim_priority", Seq("o_orderpriority"), Seq())
      val dims = Seq(
        Star.FactDim(custDim,
          Star.mergeDim(None, Star.loadDim(cust, custDim, PT), custDim, PT),
          factKeyFields = Seq("o_custkey")),
        Star.FactDim(prioDim,
          Star.mergeDim(None, Star.loadDim(orders, prioDim, PT), prioDim, PT)))
      Star.loadFacts(orders, dims, Seq("o_orderkey", "o_totalprice"))
        .orderBy(col("o_orderkey"))
    })

  private def hk(name: String, key: String) =
    s"md5('$name' || chr(31) || $key)"

  val oracles: Map[String, String] = Map(
    // Same calendar arithmetic; DuckDB dayofweek is Sunday=0 vs
    // Spark's Sunday=1, shifted; both weekofyear are ISO.
    "q_t5_date_dimension" ->
      """SELECT CAST(d AS VARCHAR) AS date,
        |  CAST(year(d) * 10000 + month(d) * 100 + day(d) AS BIGINT)
        |    AS date_key,
        |  CAST(year(d) AS BIGINT) AS year,
        |  CAST(quarter(d) AS BIGINT) AS quarter,
        |  CAST(month(d) AS BIGINT) AS month,
        |  CAST(weekofyear(d) AS BIGINT) AS week_iso,
        |  CAST(dayofweek(d) + 1 AS BIGINT) AS day_of_week,
        |  CAST(dayofweek(d) IN (0, 6) AS INTEGER) AS is_weekend,
        |  strftime(d, '%Y-%m') AS year_month
        |FROM (SELECT CAST(unnest(generate_series(DATE '2023-12-25',
        |  DATE '2024-03-31', INTERVAL 1 DAY)) AS DATE) AS d)
        |ORDER BY date""".stripMargin,
    "q_t2_dim_load" ->
      s"""WITH src AS (
         |  SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_mktsegment,
         |    o_orderpriority
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |fw AS (
         |  SELECT c_custkey, c_mktsegment, min(o_orderpriority) AS o_orderpriority
         |  FROM src GROUP BY c_custkey, c_mktsegment),
         |ids AS (
         |  SELECT *, ${hk("dim_customer", "c_custkey")} AS hashed_key,
         |    CAST(row_number() OVER (
         |      ORDER BY ${hk("dim_customer", "c_custkey")}) AS BIGINT) AS id
         |  FROM fw)
         |SELECT id, hashed_key, c_custkey, c_mktsegment, o_orderpriority,
         |  'I' AS rectype, 1 AS version
         |FROM ids
         |UNION ALL
         |SELECT -1 AS id, ${hk("dim_customer", "'unknown'")} AS hashed_key,
         |  'unknown', 'unknown', 'unknown', 'I', 1
         |ORDER BY id""".stripMargin,
    "q_t3_dim_merge" ->
      s"""WITH ids AS (
         |  SELECT CAST(c_custkey AS VARCHAR) AS ck, c_mktsegment,
         |    CAST(row_number() OVER (ORDER BY
         |      ${hk("dim_customer", "CAST(c_custkey AS VARCHAR)")}) AS BIGINT) AS id,
         |    c_custkey % 7 = 0 AS mutated
         |  FROM customer)
         |SELECT * FROM (
         |  SELECT -1 AS id, 'unknown' AS c_custkey, 'unknown' AS c_mktsegment,
         |    'I' AS rectype, 1 AS version, true AS open
         |  UNION ALL
         |  SELECT id, ck, c_mktsegment, 'I', 1, NOT mutated FROM ids
         |  UNION ALL
         |  SELECT id, ck, 'CHANGED', 'U', 2, true FROM ids WHERE mutated)
         |ORDER BY id, version""".stripMargin,
    "q_t4_fact_fks" ->
      s"""WITH cids AS (
         |  SELECT CAST(c_custkey AS VARCHAR) AS ck,
         |    CAST(row_number() OVER (ORDER BY
         |      ${hk("dim_customer", "CAST(c_custkey AS VARCHAR)")}) AS BIGINT) AS cid
         |  FROM customer),
         |pids AS (
         |  SELECT o_orderpriority AS pk,
         |    CAST(row_number() OVER (ORDER BY
         |      ${hk("dim_priority", "o_orderpriority")}) AS BIGINT) AS pid
         |  FROM (SELECT DISTINCT o_orderpriority FROM orders))
         |SELECT o_orderkey, o_totalprice,
         |  cids.cid AS fk_dim_customer, pids.pid AS fk_dim_priority
         |FROM orders
         |JOIN cids ON CAST(o_custkey AS VARCHAR) = cids.ck
         |JOIN pids ON o_orderpriority = pids.pk
         |ORDER BY o_orderkey""".stripMargin)
}
