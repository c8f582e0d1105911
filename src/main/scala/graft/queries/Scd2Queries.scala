package graft.queries

import graft.Tables.t
import graft.load.{Loaders, MergeConfig, Scd2Merge}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCD2 / Data Vault merge coverage (SURVEY.md §2.9 C1–C8) as pure,
  * oracle-checked queries: the merge kernel runs entirely in Spark and the
  * DuckDB oracle recomputes the same I/U/D decisions with anti-join /
  * value-comparison SQL over the same base table.
  *
  * The change-detection decision inside the kernel uses `xxhash64` (not
  * reproducible in DuckDB); the oracle instead compares the attribute values
  * directly — the decision boundary is identical, which is exactly the
  * property worth checking.
  */
object Scd2Queries {
  type Q = (SparkSession, String) => DataFrame

  private val PT = "2024-02-01 00:00:00"

  private def cfg(idType: String, ids: Seq[String], delta: Boolean) =
    MergeConfig(
      idFields = ids, idType = idType, entityType = idType,
      source = "testdata", processType = if (delta) "delta" else "full",
      processId = "p1", userId = "tester", processTime = PT,
      isDelta = delta)

  /** Bitemporal assertion log derived from orders: entity = customer,
    * valid_from = order month, value = total price, tx = order date,
    * tie = order key (unique — makes the correction order total). */
  private def bitemporalFixture(s: SparkSession, dir: String): DataFrame =
    graft.load.Bitemporal.fromAssertions(
      t(s, dir, "orders").select(col("o_custkey"),
        col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice").as("value")),
      col("o_custkey"), date_trunc("month", col("o_orderdate")),
      col("o_orderdate"), col("o_orderkey"), Seq("value"))

  /** The derived "incoming" batch used by the merge queries: drops every
    * custkey ≡ 3 (mod 5) (→ deletes on a full load), rewrites the segment of
    * custkey ≡ 0 (mod 7) (→ updates), and appends 5 brand-new entities
    * (→ inserts). */
  private def incomingBatch(cur: DataFrame): DataFrame = {
    val modified = cur
      .filter(col("c_custkey") % 5 =!= 3)
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 7 === 0, lit("CHANGED"))
          .otherwise(col("c_mktsegment")))
    val brandNew = cur.filter(col("c_custkey") < 5)
      .withColumn("c_custkey", col("c_custkey") + 1000000)
      .withColumn("c_mktsegment", lit("BUILDING"))
    modified.unionByName(brandNew)
  }

  val queries: Map[String, Q] = Map(
    // C1: hub first load — keys-only registration with stamped metadata.
    "q_c1_hub_first_load" -> { (s, dir) =>
      val r = Loaders.loadHub(t(s, dir, "customer"), None,
        cfg("customer", Seq("c_custkey"), delta = true))
      // Time columns as strings: the 9999-12-31 open-end sentinel overflows
      // nanosecond timestamp ranges in downstream compare tooling.
      r.history.select(
        col("entity_id"), col("c_custkey"),
        col("start_time").cast("string").as("start_time"),
        col("end_time").cast("string").as("end_time"),
        col("source"),
        col("process_date").cast("string").as("process_date"),
        col("rectype"), col("version"))
        .orderBy(col("c_custkey"))
    },

    // C2 + C7 + J1/J2/J3: full-load satellite merge — the I/U/D state
    // machine + resulting current snapshot, checked branch by branch.
    "q_c2_satellite_merge_iud" -> { (s, dir) =>
      val base = t(s, dir, "customer")
      val c0 = cfg("customer", Seq("c_custkey"), delta = true)
      // materialized: chaining an unpersisted first merge re-runs its
      // shuffles in every branch of the second (see MergeResult scaladoc)
      val first = Loaders.loadSatellite(base, None, c0).materialized
      val r = Loaders.loadSatellite(incomingBatch(base),
        Some(first.history), c0.copy(isDelta = false, processType = "full"))
      val delta = r.inserted.select(col("c_custkey"), col("rectype"), col("version"))
        .unionByName(r.changed.select(col("c_custkey"), col("rectype"), col("version")))
        .unionByName(r.removed.select(col("c_custkey"), col("rectype"), col("version")))
      delta.orderBy(col("c_custkey"), col("rectype"))
    },

    // C2 snapshot invariant: current after the merge = arg-max(version),
    // deletes carried with rectype='D'.
    "q_c7_current_snapshot" -> { (s, dir) =>
      val base = t(s, dir, "customer")
      val c0 = cfg("customer", Seq("c_custkey"), delta = true)
      val first = Loaders.loadSatellite(base, None, c0).materialized
      val r = Loaders.loadSatellite(incomingBatch(base),
        Some(first.history), c0.copy(isDelta = false, processType = "full"))
        .materialized // r.current re-reads one checkpointed history, not the branch plans
      r.current.select(col("c_custkey"), col("c_mktsegment"),
        col("rectype"), col("version"))
        .orderBy(col("c_custkey"))
    },

    // C4: mapping first load — a link carrying a confidence weight
    // (reference: ParquetDataLoader.scala:766-975). The confidence is an
    // ordinary payload attribute: it feeds the change hash, so a weight
    // change versions the mapping.
    "q_c4_mapping_load" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_orderkey") % 100 / lit(100.0)).as("conf"))
      val r = Loaders.loadMapping(orders, None,
        srcFields = Seq("o_custkey"), srcIdType = "customer",
        dstFields = Seq("o_orderkey"), dstIdType = "order",
        confidenceCol = "conf",
        cfg("cust_order_map", Seq("src_entity_id", "dst_entity_id"),
          delta = true))
      r.history.select(col("entity_id"), col("src_entity_id"),
        col("dst_entity_id"), col("o_orderkey"), col("o_custkey"),
        col("confidence"), col("rectype"), col("version"))
        .orderBy(col("o_orderkey"))
    },

    // C10: bitemporal point read — each order asserts the customer's
    // plan price for its month (valid time) at its order date (tx
    // time); "what did we believe on 1998-06-30 about the price in
    // force on 1997-03-31".
    "q_c10_bitemporal_asof" -> { (s, dir) =>
      graft.load.Bitemporal.asOf(bitemporalFixture(s, dir),
        "1998-06-30 00:00:00", "1997-03-31 00:00:00")
        .select(col("entity"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          col("value"),
          date_format(col("tx_from"), "yyyy-MM-dd").as("tx_from"))
        .orderBy(col("entity"))
    },

    // C11: retroactive-correction audit — how the believed
    // 1997-03-31 state moved between the 1996-12-31 and 1998-06-30
    // knowledge instants (late arrivals => added/revised rows).
    "q_c11_retro_diff" -> { (s, dir) =>
      graft.load.Bitemporal.retroDiff(bitemporalFixture(s, dir),
        "1996-12-31 00:00:00", "1998-06-30 00:00:00",
        "1997-03-31 00:00:00")
        .select(col("entity"), col("change"),
          date_format(col("valid_from_a"), "yyyy-MM-dd")
            .as("valid_from_a"),
          col("value_a"),
          date_format(col("valid_from_b"), "yyyy-MM-dd")
            .as("valid_from_b"),
          col("value_b"))
        .orderBy(col("entity"))
    },

    // C7 time travel: snapshot as-of an instant BETWEEN two loads — must
    // reproduce the first load's state exactly, invisible to the later
    // merge's updates/deletes/inserts.
    "q_c9_snapshot_asof" -> { (s, dir) =>
      val base = t(s, dir, "customer")
      val c0 = cfg("customer", Seq("c_custkey"), delta = true)
      val first = Loaders.loadSatellite(base, None, c0).materialized
      val r = Loaders.loadSatellite(incomingBatch(base),
        Some(first.history),
        c0.copy(isDelta = false, processType = "full",
          processTime = "2024-03-01 00:00:00"))
      Scd2Merge.snapshotAsOf(r.history, "2024-02-15 00:00:00")
        .select(col("c_custkey"), col("c_mktsegment"),
          col("rectype"), col("version"))
        .orderBy(col("c_custkey"))
    },

    // C3: link first load — hashed (src, dst) pair keys.
    "q_c3_link_first_load" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val r = Loaders.loadLink(orders, None,
        srcFields = Seq("o_custkey"), srcIdType = "customer",
        dstFields = Seq("o_orderkey"), dstIdType = "order",
        cfg("cust_order", Seq("o_custkey", "o_orderkey"), delta = true)
          .copy(idFields = Seq("src_entity_id", "dst_entity_id")))
      r.history.select(col("entity_id"), col("src_entity_id"),
        col("dst_entity_id"), col("o_orderkey"), col("o_custkey"),
        col("rectype"), col("version"))
        .orderBy(col("o_orderkey"))
    })

  val oracles: Map[String, String] = Map(
    "q_c1_hub_first_load" ->
      s"""SELECT md5('customer' || chr(31) || CAST(c_custkey AS VARCHAR)) AS entity_id,
         |  c_custkey,
         |  '$PT' AS start_time,
         |  '9999-12-31 00:00:00' AS end_time,
         |  'testdata' AS source,
         |  '2024-02-01' AS process_date,
         |  'I' AS rectype, 1 AS version
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_c2_satellite_merge_iud" ->
      """WITH cur AS (SELECT * FROM customer),
        |inc AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer WHERE c_custkey % 5 <> 3
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'BUILDING' FROM customer WHERE c_custkey < 5)
        |SELECT * FROM (
        |  SELECT i.c_custkey, 'I' AS rectype, 1 AS version FROM inc i
        |  WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.c_custkey = i.c_custkey)
        |  UNION ALL
        |  SELECT i.c_custkey, 'U' AS rectype, 2 AS version
        |  FROM inc i JOIN cur c USING (c_custkey)
        |  WHERE i.c_mktsegment <> c.c_mktsegment
        |  UNION ALL
        |  SELECT c.c_custkey, 'D' AS rectype, 2 AS version FROM cur c
        |  WHERE NOT EXISTS (SELECT 1 FROM inc i WHERE i.c_custkey = c.c_custkey))
        |ORDER BY c_custkey, rectype""".stripMargin,
    "q_c7_current_snapshot" ->
      """WITH inc AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer WHERE c_custkey % 5 <> 3
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'BUILDING' FROM customer WHERE c_custkey < 5)
        |SELECT * FROM (
        |  -- unchanged entities keep their v1 insert row
        |  SELECT c.c_custkey, c.c_mktsegment, 'I' AS rectype, 1 AS version
        |  FROM customer c JOIN inc i USING (c_custkey)
        |  WHERE i.c_mktsegment = c.c_mktsegment
        |  UNION ALL
        |  -- brand-new entities from the second batch
        |  SELECT i.c_custkey, i.c_mktsegment, 'I' AS rectype, 1 AS version
        |  FROM inc i
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = i.c_custkey)
        |  UNION ALL
        |  SELECT i.c_custkey, i.c_mktsegment, 'U' AS rectype, 2 AS version
        |  FROM inc i JOIN customer c USING (c_custkey)
        |  WHERE i.c_mktsegment <> c.c_mktsegment
        |  UNION ALL
        |  SELECT c.c_custkey, c.c_mktsegment, 'D' AS rectype, 2 AS version
        |  FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM inc i WHERE i.c_custkey = c.c_custkey))
        |ORDER BY c_custkey""".stripMargin,
    "q_c9_snapshot_asof" ->
      """SELECT c_custkey, c_mktsegment, 'I' AS rectype, 1 AS version
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // Same assertion log, lead()-closed tx intervals, live filter at
    // (tx, valid) instants, greatest-valid_from row per entity.
    "q_c10_bitemporal_asof" ->
      """WITH a AS (
        |  SELECT o_custkey AS entity,
        |    date_trunc('month', o_orderdate) AS valid_from,
        |    o_totalprice AS value, o_orderdate AS tx_from,
        |    o_orderkey AS tie
        |  FROM orders),
        |w AS (SELECT *, lead(tx_from) OVER (
        |    PARTITION BY entity, valid_from ORDER BY tx_from, tie)
        |    AS tx_to FROM a),
        |live AS (SELECT * FROM w
        |  WHERE tx_from <= TIMESTAMP '1998-06-30 00:00:00'
        |    AND (tx_to IS NULL OR tx_to > TIMESTAMP '1998-06-30 00:00:00')
        |    AND valid_from <= TIMESTAMP '1997-03-31 00:00:00'),
        |r AS (SELECT *, row_number() OVER (PARTITION BY entity
        |    ORDER BY valid_from DESC, tx_from DESC) AS rn FROM live)
        |SELECT entity, strftime(valid_from, '%Y-%m-%d') AS valid_from,
        |  value, strftime(tx_from, '%Y-%m-%d') AS tx_from
        |FROM r WHERE rn = 1 ORDER BY entity""".stripMargin,
    // Two live snapshots full-outer-joined; IS DISTINCT FROM mirrors
    // Spark's null-safe <=> negation.
    "q_c11_retro_diff" ->
      """WITH a AS (
        |  SELECT o_custkey AS entity,
        |    date_trunc('month', o_orderdate) AS valid_from,
        |    o_totalprice AS value, o_orderdate AS tx_from,
        |    o_orderkey AS tie
        |  FROM orders),
        |w AS (SELECT *, lead(tx_from) OVER (
        |    PARTITION BY entity, valid_from ORDER BY tx_from, tie)
        |    AS tx_to FROM a),
        |sa AS (SELECT entity, valid_from, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY entity
        |      ORDER BY valid_from DESC, tx_from DESC) AS rn
        |  FROM w
        |  WHERE tx_from <= TIMESTAMP '1996-12-31 00:00:00'
        |    AND (tx_to IS NULL OR tx_to > TIMESTAMP '1996-12-31 00:00:00')
        |    AND valid_from <= TIMESTAMP '1997-03-31 00:00:00')
        |  WHERE rn = 1),
        |sb AS (SELECT entity, valid_from, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY entity
        |      ORDER BY valid_from DESC, tx_from DESC) AS rn
        |  FROM w
        |  WHERE tx_from <= TIMESTAMP '1998-06-30 00:00:00'
        |    AND (tx_to IS NULL OR tx_to > TIMESTAMP '1998-06-30 00:00:00')
        |    AND valid_from <= TIMESTAMP '1997-03-31 00:00:00')
        |  WHERE rn = 1)
        |SELECT coalesce(sa.entity, sb.entity) AS entity,
        |  CASE WHEN sa.entity IS NULL THEN 'added'
        |       WHEN sb.entity IS NULL THEN 'removed'
        |       ELSE 'revised' END AS change,
        |  strftime(sa.valid_from, '%Y-%m-%d') AS valid_from_a,
        |  sa.value AS value_a,
        |  strftime(sb.valid_from, '%Y-%m-%d') AS valid_from_b,
        |  sb.value AS value_b
        |FROM sa FULL OUTER JOIN sb ON sa.entity = sb.entity
        |WHERE sa.entity IS NULL OR sb.entity IS NULL
        |   OR sa.value IS DISTINCT FROM sb.value
        |   OR sa.valid_from IS DISTINCT FROM sb.valid_from
        |ORDER BY entity""".stripMargin,
    "q_c4_mapping_load" ->
      """SELECT
        |  md5('cust_order_map'
        |    || chr(31) || md5('customer' || chr(31) || CAST(o_custkey AS VARCHAR))
        |    || chr(31) || md5('order' || chr(31) || CAST(o_orderkey AS VARCHAR))) AS entity_id,
        |  md5('customer' || chr(31) || CAST(o_custkey AS VARCHAR)) AS src_entity_id,
        |  md5('order' || chr(31) || CAST(o_orderkey AS VARCHAR)) AS dst_entity_id,
        |  o_orderkey, o_custkey,
        |  CAST(o_orderkey % 100 AS DOUBLE) / 100.0 AS confidence,
        |  'I' AS rectype, 1 AS version
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_c3_link_first_load" ->
      """SELECT
        |  md5('cust_order'
        |    || chr(31) || md5('customer' || chr(31) || CAST(o_custkey AS VARCHAR))
        |    || chr(31) || md5('order' || chr(31) || CAST(o_orderkey AS VARCHAR))) AS entity_id,
        |  md5('customer' || chr(31) || CAST(o_custkey AS VARCHAR)) AS src_entity_id,
        |  md5('order' || chr(31) || CAST(o_orderkey AS VARCHAR)) AS dst_entity_id,
        |  o_orderkey, o_custkey,
        |  'I' AS rectype, 1 AS version
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}
