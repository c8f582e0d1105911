package graft.queries

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.2–§2.4, §2.6–§2.8) expressed
  * as oracle-checked queries over the driver's TPC-H-ish tables.
  *
  * Conventions shared by every query in this project:
  *  - every computed column is aliased identically in the Spark plan and the
  *    DuckDB oracle (the driver sorts columns by name and hashes values);
  *  - every result carries a total ORDER BY on a unique key so row order is
  *    deterministic in both engines;
  *  - double aggregates are `round(_, 2)` on both sides (sum order is
  *    engine-dependent; rounding absorbs the last-ulp difference);
  *  - cross-engine hash demos only hash string/integer columns (double →
  *    string formatting differs between engines).
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // J14: per-supplier overlapping-shipment pair counts via the
    // sweep-line form (one key shuffle, zero joins) — the oracle is the
    // O(n²) self-join it replaces. Intervals: [shipdate, shipdate +
    // quantity days) as epoch seconds.
    "q_j14_interval_overlap" -> { (s, dir) =>
      val iv = t(s, dir, "lineitem").select(
        col("l_suppkey"),
        unix_timestamp(col("l_shipdate")).as("s"),
        (unix_timestamp(col("l_shipdate")) +
          col("l_quantity").cast("long") * 86400L).as("e"))
      graft.relational.Intervals
        .overlapPairCount(iv, Seq("l_suppkey"), col("s"), col("e"))
        .orderBy(col("l_suppkey"))
    },

    // X105: item-item cosine kNN from order baskets — the symmetric
    // one-mode bipartite projection behind "also bought" recommenders;
    // exact counts, IEEE sqrt, deterministic per-item ranking.
    "q_x105_item_cf" -> { (s, dir) =>
      graft.relational.Associations.itemCosineTopK(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minCount = 3, k = 5)
        .orderBy(col("item"), col("rank"))
    },

    // J15: stabbing count — per-supplier in-flight shipment coverage at
    // probe instants (shipdate + 3 days), sweep form; the oracle is
    // the O(n*m) point-in-interval range join it replaces.
    "q_j15_stabbing_count" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val iv = li.select(col("l_suppkey"),
        unix_timestamp(col("l_shipdate")).as("s"),
        (unix_timestamp(col("l_shipdate")) +
          col("l_quantity").cast("long") * 86400L).as("e"))
      val probes = li.select(col("l_suppkey"),
        (unix_timestamp(col("l_shipdate")) + 3L * 86400L).as("p"))
      graft.relational.Intervals.stabbingCount(iv, Seq("l_suppkey"),
        col("s"), col("e"), probes, col("p"))
        .orderBy(col("l_suppkey"), col("t"))
    },

    // X92: pair-level market-basket rules over order baskets — parts
    // co-purchased in >= 3 orders, both directed rules with exact
    // support/confidence/lift (pinned IEEE expression trees, no
    // rounding needed).
    "q_x92_basket_rules" -> { (s, dir) =>
      graft.relational.Associations.basketRules(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minCount = 3)
        .orderBy(col("antecedent"), col("consequent"))
    },

    // A12: ROLLUP hierarchy totals — subtotal and grand-total rows with
    // GROUPING ids, the reporting shape single-level groupBy can't
    // express (Catalyst expands once; no per-level re-scan).
    "q_a12_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("revenue"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("revenue"), col("g_rf"), col("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"),
          col("l_linestatus"))
    },

    // A13: TPC-H Q3-shaped shipping-priority top-10 — 3-way join with
    // segment/date filters pushed to the scans, grouped revenue,
    // TakeOrdered on the rounded ranking key with an id tiebreak.
    "q_a13_shipping_priority" -> { (s, dir) =>
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
    },

    // A14: TPC-H Q5-shaped local-supplier volume — 6-way star join
    // with the c_nationkey = s_nationkey locality constraint; small
    // dims broadcast.
    "q_a14_local_supplier_volume" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // A15: TPC-H Q7-shaped volume shipping — revenue between two
    // trading nations per ship year, both directions. Small nation
    // dims broadcast twice (supplier side, customer side); per-row
    // volumes floor-scaled to 1e6 LONGs and DECIMAL-summed so the
    // revenue is order-free exact (the q_a1 round(sum(double))
    // pattern is boundary-lucky; new money queries use the scaled
    // discipline), published quantize-2.
    "q_a15_volume_shipping" -> { (s, dir) =>
      import graft.functions.quantize
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("__snk"),
          col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("__cnk"),
          col("n_name").as("cust_nation")))
      t(s, dir, "supplier")
        .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("__snk"))
        .join(n2, col("c_nationkey") === col("__cnk"))
        .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .withColumn("__v", floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * lit(1e6) + lit(0.5))
          .cast("long"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(col("__v").cast("decimal(38,0)")).as("__sv"),
          count(lit(1)).as("n_items"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          quantize(col("__sv").cast("double") / lit(1e6), 2)
            .as("revenue"),
          col("n_items"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // A16: TPC-H Q8-shaped market share — one nation's share of
    // ECONOMY-part revenue sold into one region, per order year.
    // Scaled-LONG volumes make numerator and denominator exact, so
    // the share is ONE deterministic division.
    "q_a16_market_share" -> { (s, dir) =>
      import graft.functions.{q6, quantize}
      val nc = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("__cnk"),
          col("n_regionkey").as("__crk")))
      val reg = broadcast(t(s, dir, "region")
        .filter(col("r_name") === "EUROPE")
        .select(col("r_regionkey").as("__rk")))
      val ns = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("__snk"),
          col("n_name").as("supp_nation")))
      val parts = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      t(s, dir, "lineitem")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(nc, col("c_nationkey") === col("__cnk"))
        .join(reg, col("__crk") === col("__rk"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(ns, col("s_nationkey") === col("__snk"))
        .withColumn("__v", floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * lit(1e6) + lit(0.5))
          .cast("long"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("__v"))
            .otherwise(0L).cast("decimal(38,0)")).as("__num"),
          sum(col("__v").cast("decimal(38,0)")).as("__den"),
          count(lit(1)).as("n_items"))
        .select(col("o_year"),
          quantize(col("__num").cast("double") / lit(1e6), 2)
            .as("nation_revenue"),
          quantize(col("__den").cast("double") / lit(1e6), 2)
            .as("total_revenue"),
          q6(when(col("__den") > 0,
            col("__num").cast("double") / col("__den").cast("double")))
            .as("mkt_share"),
          col("n_items"))
        .orderBy(col("o_year"))
    },

    // A17: TPC-H Q19-shaped discounted revenue — disjunctive
    // brand × quantity-band predicates over the part join; the OR
    // tree pushes to the scan per branch. One exact-scaled-sum row.
    "q_a17_disjunctive_revenue" -> { (s, dir) =>
      import graft.functions.quantize
      val parts = broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand")))
      t(s, dir, "lineitem")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#17" &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#4" &&
            col("l_quantity").between(20, 30)))
        .withColumn("__v", floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * lit(1e6) + lit(0.5))
          .cast("long"))
        .agg(sum(col("__v").cast("decimal(38,0)")).as("__sv"),
          count(lit(1)).as("n_items"))
        .select(
          quantize(col("__sv").cast("double") / lit(1e6), 2)
            .as("revenue"),
          col("n_items"))
    },

    // A18: TPC-H Q2-shaped min-cost supplier — the classic CORRELATED
    // SCALAR subquery (`cost = (SELECT min(cost) … WHERE inner.part =
    // outer.part)`) DECORRELATED: the textbook rewrite is a per-part
    // min aggregate joined back on (partkey, cost); here the aggregate
    // and the join-back FUSE into one partkey-partitioned window-min +
    // filter, so the offer relation is scanned ONCE and shuffled ONCE
    // (the naive aggregate+join-back diamond re-computes the 5-table
    // offer join on both sides — 2× the corpus scan at 100 TB; the
    // oracle keeps the correlated form, so hash parity proves the
    // rewrite; q_a19 demonstrates the aggregate+join-back shape).
    // Unit costs floor-scale to 1e6 LONGs: the min and the equality
    // select on EXACT integer keys (the libm-free top-k rule). Offers
    // deduplicate within the same partkey partitioning (a supplier
    // quoting the same part at the same cost twice is one offer — the
    // partsupp grain this schema lacks).
    "q_a18_min_cost_supplier" -> { (s, dir) =>
      val eur = broadcast(t(s, dir, "nation")
        .join(t(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("n_nationkey"), col("n_name")))
      val offers = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(eur, col("s_nationkey") === col("n_nationkey"))
        .select(col("l_partkey"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name"),
          floor(col("l_extendedprice") / col("l_quantity") * lit(1e6)
            + lit(0.5)).cast("long").as("unit_cost_micro"))
        // one explicit partkey exchange; the full-key distinct and the
        // window-min both run inside it (hashpartitioning(l_partkey)
        // satisfies both clusterings — no further shuffle)
        .repartition(col("l_partkey"))
        .distinct()
      offers
        .withColumn("__min_cost", min(col("unit_cost_micro"))
          .over(Window.partitionBy(col("l_partkey"))))
        .filter(col("unit_cost_micro") === col("__min_cost"))
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_type") === "MEDIUM" && col("p_size") <= 10)
          .select(col("p_partkey"), col("p_name"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("s_acctbal"),
          col("unit_cost_micro"))
        .orderBy(col("p_partkey"), col("s_suppkey"))
    },

    // A19: TPC-H Q17-shaped small-quantity revenue — the correlated
    // AVG subquery (`qty < 0.2 * (SELECT avg(qty) … same part)`)
    // decorrelated to ONE per-part (Σqty, n) aggregate joined back on
    // the partkey. The threshold compare runs on exact integers:
    // qty < 0.2·(Σ/n) ⇔ 5·qty_s·n < Σ_s with quantities floor-scaled
    // to 1e6 LONGs — no float avg can flip the cut cross-engine.
    "q_a19_small_quantity_revenue" -> { (s, dir) =>
      import graft.functions.quantize
      val D = "decimal(38,0)"
      val li = t(s, dir, "lineitem")
      val qtyS = floor(col("l_quantity") * lit(1e6) + lit(0.5))
        .cast("long")
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(qtyS.cast(D)).as("__sq"), count(lit(1)).as("__nq"))
      li.join(broadcast(t(s, dir, "part")
          .filter(col("p_brand") === "Brand#12")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, Seq("l_partkey"))
        .filter(qtyS.cast(D) * lit(5) * col("__nq") < col("__sq"))
        .agg(sum(floor(col("l_extendedprice") * lit(1e6) + lit(0.5))
          .cast("long").cast(D)).as("__sv"),
          count(lit(1)).as("n_items"))
        .select(quantize(col("__sv").cast("double") / lit(1e6) / lit(7.0), 2)
          .as("avg_yearly"), col("n_items"))
    },

    // A20: TPC-H Q21-shaped waiting orders — the EXISTS / NOT-EXISTS
    // chain decorrelated to a LEFT SEMI (another supplier shipped in
    // the same order) plus a LEFT ANTI (nobody else shipped LATER)
    // join, both keyed on l_orderkey so the three lineitem sides share
    // one shuffle; the per-supplier count then ranks on the exact
    // integer (numwait, name) key. The oracle carries the textbook
    // correlated EXISTS form.
    "q_a20_waiting_orders" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val l1 = li.join(t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      val l2 = li.select(col("l_orderkey").as("__ok2"),
        col("l_suppkey").as("__sk2"))
      val l3 = li.select(col("l_orderkey").as("__ok3"),
        col("l_suppkey").as("__sk3"), col("l_shipdate").as("__sd3"))
      l1.join(l2, col("l_orderkey") === col("__ok2") &&
          col("l_suppkey") =!= col("__sk2"), "left_semi")
        .join(l3, col("l_orderkey") === col("__ok3") &&
          col("l_suppkey") =!= col("__sk3") &&
          col("__sd3") > col("l_shipdate"), "left_anti")
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    },

    // A21: TPC-H Q22-shaped global sales opportunity — the UNCORRELATED
    // scalar subquery (global positive-balance average) broadcast as a
    // 1-row relation plus the NOT-EXISTS anti join against recent
    // orders. The average compare is exact: bal_s·n > Σ_s on
    // floor-scaled LONG balances — the one plan family where a scalar
    // must become a broadcast, not a join-back.
    "q_a21_global_sales_opportunity" -> { (s, dir) =>
      import graft.functions.quantize
      val D = "decimal(38,0)"
      val cust = t(s, dir, "customer")
        .filter(col("c_nationkey").isin(1, 5, 12, 18, 22))
        .select(col("c_custkey"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          floor(col("c_acctbal") * lit(1e6) + lit(0.5)).cast("long")
            .as("__bal"))
      val avgPos = cust.filter(col("__bal") > 0)
        .agg(sum(col("__bal").cast(D)).as("__s"),
          count(lit(1)).as("__n"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.join(recent, col("c_custkey") === col("o_custkey"),
          "left_anti")
        .crossJoin(broadcast(avgPos))
        .filter(col("__bal").cast(D) * col("__n") > col("__s"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          quantize(sum(col("__bal").cast(D)).cast("double") / lit(1e6), 2)
            .as("totacctbal"))
        .orderBy(col("c_nationkey"))
    },

    // A22: TPC-H Q20-shaped dominant-share suppliers — the NESTED
    // IN-chain + correlated scalar: suppliers (in one nation) IN the
    // set of suppliers who, for some SMALL-type part, shipped more
    // than 10% of that part's total shipped quantity. Decorrelated:
    // one (supp, part) aggregate over the part-filtered lineitem, one
    // per-part aggregate over ALL lineitem (the inner subquery is
    // unfiltered — a classic decorrelation subtlety: filtering it by
    // p_type would change the denominator), an equi join-back on the
    // partkey, and the IN as a LEFT SEMI into the supplier dim. The
    // share cut compares exact scaled integers (10·q_sp > q_p).
    "q_a22_dominant_share_supplier" -> { (s, dir) =>
      val D = "decimal(38,0)"
      val li = t(s, dir, "lineitem")
      val qtyS = floor(col("l_quantity") * lit(1e6) + lit(0.5))
        .cast("long")
      val perSuppPart = li
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_type") === "SMALL").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(qtyS.cast(D)).as("__qsp"))
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(qtyS.cast(D)).as("__qp"))
      val dominant = perSuppPart.join(perPart, Seq("l_partkey"))
        .filter(col("__qsp") * lit(10) > col("__qp"))
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_2")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(dominant, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("s_suppkey"))
    },

    // A23: TPC-H Q4-shaped order-priority checking — the correlated
    // EXISTS (some lineitem of the order shipped > 60 days after the
    // order date; the commit/receipt-lag pair this schema lacks)
    // decorrelated to ONE LEFT SEMI on the order key, the non-equi
    // lag conjunct riding the same equi shuffle — lineitem is scanned
    // once, never per outer row. All-integer counts.
    "q_a23_priority_check" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // A24: TPC-H Q6-shaped forecast revenue change — the pure
    // scan-aggregate: every predicate (date band, discount band,
    // quantity cut) pushes to the parquet scan, zero joins, zero
    // wide shuffles (one partial+final agg). Exact scaled sum.
    "q_a24_forecast_revenue" -> { (s, dir) =>
      import graft.functions.quantize
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
        .agg(sum(floor(col("l_extendedprice") * col("l_discount") *
            lit(1e6) + lit(0.5)).cast("long").cast("decimal(38,0)"))
          .as("__sv"), count(lit(1)).as("n_items"))
        .select(quantize(col("__sv").cast("double") / lit(1e6), 2)
          .as("revenue"), col("n_items"))
    },

    // A25: TPC-H Q9-shaped product-type profit — the join diamond
    // grouped by (nation, year). Supply cost is proxied as 10% of
    // retail (this schema has no partsupp); the per-row amount is one
    // pinned IEEE tree floor-scaled to a LONG, so the possibly-
    // NEGATIVE profit sums stay exact. Part/supplier/nation broadcast.
    "q_a25_product_profit" -> { (s, dir) =>
      import graft.functions.quantize
      val amt = floor((col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity") * lit(0.1)) * lit(1e6) +
        lit(0.5)).cast("long")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_type") === "LARGE")
          .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(sum(amt.cast("decimal(38,0)")).as("__s"),
          count(lit(1)).as("n_items"))
        .select(col("n_name"), col("o_year"),
          quantize(col("__s").cast("double") / lit(1e6), 2).as("sum_profit"),
          col("n_items"))
        .orderBy(col("n_name"), col("o_year").desc)
    },

    // A26: TPC-H Q10-shaped returned-item reporting — revenue lost to
    // returns per customer over a quarter, top 20. The rank runs on
    // the EXACT micro-LONG revenue (custkey tiebreak) BEFORE the
    // limit; the quantized double is published after — no float rank
    // can flip the cut cross-engine.
    "q_a26_returned_items" -> { (s, dir) =>
      import graft.functions.quantize
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            lit(1e6) + lit(0.5)).cast("long").cast("decimal(38,0)"))
          .as("__rv"))
        .orderBy(col("__rv").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          quantize(col("__rv").cast("double") / lit(1e6), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
    },

    // A27: TPC-H Q11-shaped important stock — per-part supply value
    // (one nation's suppliers) HAVING value > 1/1000 of the GLOBAL
    // total: the uncorrelated scalar-on-aggregate broadcast as a
    // 1-row relation (like A21), compared on exact integers
    // (v_p·1000 > Σv). At scale the part-sized aggregate should be
    // cached before the two consumers; here Catalyst recomputes it —
    // the input is one nation's slice, so the double scan is bounded.
    "q_a27_important_stock" -> { (s, dir) =>
      import graft.functions.quantize
      val vals = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")
          .filter(col("s_nationkey") === 3).select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * lit(1e6) + lit(0.5))
          .cast("long").cast("decimal(38,0)")).as("__vp"))
      val tot = vals.agg(sum(col("__vp")).as("__vt"))
      vals.crossJoin(broadcast(tot))
        .filter(col("__vp") * lit(1000) > col("__vt"))
        .select(col("l_partkey").as("p_partkey"),
          quantize(col("__vp").cast("double") / lit(1e6), 2).as("part_value"))
        .orderBy(col("p_partkey"))
    },

    // A28: TPC-H Q12-shaped shipping-priority split — the conditional
    // CASE-sum pair per mode (l_returnflag stands in for the shipmode
    // column this schema lacks); one equi join on the order key, all
    // integer counts.
    "q_a28_shipmode_priority" -> { (s, dir) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },

    // A29: TPC-H Q13-shaped customer order-count distribution — the
    // LEFT OUTER join with the filter INSIDE the join condition (a
    // WHERE would silently drop the zero-order customers Q13 exists
    // to count), then the aggregate-of-an-aggregate histogram.
    "q_a29_customer_distribution" -> { (s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // A30: TPC-H Q14-shaped promotion effect — the conditional-
    // aggregate RATIO: promo share of one month's revenue as one
    // division of two exact scaled-integer totals (numerator a
    // CASE-sum), published quantized-6; part broadcast.
    "q_a30_promo_effect" -> { (s, dir) =>
      import graft.functions.quantize
      val D = "decimal(38,0)"
      val v = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
        lit(1e6) + lit(0.5)).cast("long")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", v).otherwise(0L).cast(D))
          .as("__num"),
          sum(v.cast(D)).as("__den"), count(lit(1)).as("n_items"))
        .select(
          quantize(col("__num").cast("double") * lit(100.0) /
            col("__den").cast("double"), 6).as("promo_revenue_pct"),
          quantize(col("__den").cast("double") / lit(1e6), 2)
            .as("total_revenue"),
          col("n_items"))
    },

    // A31: TPC-H Q15-shaped top supplier — the scalar MAX over an
    // aggregated view: per-supplier quarter revenue (exact micro
    // LONGs), the max broadcast as a 1-row relation (a global window
    // would funnel every supplier into one partition at scale), and
    // the winners selected by exact integer equality.
    "q_a31_top_supplier" -> { (s, dir) =>
      import graft.functions.quantize
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            lit(1e6) + lit(0.5)).cast("long").cast("decimal(38,0)"))
          .as("__r"))
      val mx = rev.agg(max(col("__r")).as("__mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("__r") === col("__mx"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          quantize(col("__r").cast("double") / lit(1e6), 2)
            .as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // A32: TPC-H Q16-shaped parts/supplier relationship — distinct
    // supplier counts per (brand, type, size) with the NOT IN
    // complaint set (negative-balance suppliers stand in for the
    // comment pattern) as a broadcast LEFT ANTI; countDistinct
    // expands to one extra keyed exchange, never a driver set.
    "q_a32_supplier_relationship" -> { (s, dir) =>
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"),
          col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // A33: TPC-H Q18-shaped large-volume customers — the IN-subquery
    // on a grouped HAVING decorrelated to ONE lineitem aggregate
    // reused as both the filter and the published sum (the textbook
    // form re-aggregates lineitem inside the IN and joins it again
    // outside — 2× the corpus scan at 100 TB). Rank on exact micro
    // totalprice before the limit, publish quantized after.
    "q_a33_large_orders" -> { (s, dir) =>
      import graft.functions.quantize
      val qtyS = floor(col("l_quantity") * lit(1e6) + lit(0.5)).cast("long")
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(qtyS.cast("decimal(38,0)")).as("__sq"))
        .filter(col("__sq") > lit(150L * 1000000L))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          floor(col("o_totalprice") * lit(1e6) + lit(0.5)).cast("long")
            .as("__tp"),
          col("__sq"))
        .orderBy(col("__tp").desc, col("o_orderkey"))
        .limit(100)
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"),
          quantize(col("__tp").cast("double") / lit(1e6), 2)
            .as("o_totalprice"),
          quantize(col("__sq").cast("double") / lit(1e6), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    },

    // A1/A3/A5/F8 + P3: TPC-H Q1-style pricing summary.
    "q_a1_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // P1/P3/P7: projection + predicate, pushed to the parquet scan.
    "q_p1_filter_project" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
          && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // X63: z-order layout audit — Morton codes over (custkey, order
    // day), 32 equal-size z-range buckets, per-bucket (x, y) bounding
    // boxes; the integer/bit arithmetic is recomputed bit-for-bit by
    // the oracle.
    "q_x63_zorder_layout" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("o_day"))
      graft.relational.Layout
        .zOrderReport(o, "o_custkey", "o_day", "o_orderkey", buckets = 32)
        .orderBy(col("bucket"))
    },

    // X64: pre-join cardinality/skew audit — exact per-key fan-out of
    // the events self-join on user_id (the worst-case quadratic shape),
    // top contributors by Σ f_A·f_B; the audit a pipeline runs before
    // paying for an unpredictable join.
    "q_x64_join_audit" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      graft.relational.Joins
        .joinCardinalityAudit(ev, ev, "user_id", "user_id", topK = 15)
    },

    // J1: left-anti "new records" — customers with no orders.
    "q_j1_anti_join" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // J2 + F1-style hash: changed-record detection between a current snapshot
    // and a derived incoming batch, via md5 change hash over string/int cols.
    "q_j2_changed_detection" -> { (s, dir) =>
      val cur = t(s, dir, "customer")
      val inc = cur.select(
        col("c_custkey"),
        col("c_name"),
        when(col("c_custkey") % 7 === 0, lit("CHANGED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      def h(df: DataFrame) =
        graft.functions.changeHashMd5(Seq(df("c_name"), df("c_mktsegment")))
      inc.as("i").join(cur.as("e"), Seq("c_custkey"))
        .filter(graft.functions.changeHashMd5(
          Seq(col("i.c_name"), col("i.c_mktsegment"))) =!=
          graft.functions.changeHashMd5(
            Seq(col("e.c_name"), col("e.c_mktsegment"))))
        .select(col("c_custkey"), col("i.c_mktsegment").as("new_segment"))
        .orderBy(col("c_custkey"))
    },

    // J3: delete detection — current rows absent from the incoming batch.
    "q_j3_delete_detection" -> { (s, dir) =>
      val cur = t(s, dir, "customer")
      val incoming = cur.filter(col("c_custkey") % 5 =!= 3)
        .select(col("c_custkey"))
      cur.join(incoming, Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // J4/A2/W7: latest version per entity via window arg-max.
    "q_j4_latest_per_key" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },

    // J5/J6: multi-hop star join with explicitly broadcast small dims.
    "q_j6_broadcast_star_join" -> { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // F1: md5 entity-id hash (SQL-visible, cross-engine identical).
    "q_f1_entity_hash" -> { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          graft.functions.entityIdHash("customer", Seq(col("c_custkey")))
            .as("entity_id"))
        .orderBy(col("c_custkey"))
    },

    // A6: full-row distinct.
    "q_a6_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // J11: deterministic first-wins dedup per key.
    "q_j11_dedup_first_wins" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderkey")).as("first_orderkey"))
        .orderBy(col("o_custkey"))
    },

    // O4/W2: bounded top-k per key via window row_number.
    "q_o4_topk_per_key" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("l_suppkey"), col("rk"), col("l_orderkey"),
          col("l_extendedprice"))
        .orderBy(col("l_suppkey"), col("rk"))
    },

    // O1/O2: global sort + limit.
    "q_o1_sort_limit" -> { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(20)
    },

    // U1: union of branch results (the SCD2 I/U/D merge shape).
    "q_u1_union_branches" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 300000)
        .select(lit("high").as("tier"), col("o_orderkey"))
      val lo = o.filter(col("o_totalprice") <= 50000)
        .select(lit("low").as("tier"), col("o_orderkey"))
      hi.unionByName(lo).orderBy(col("tier"), col("o_orderkey"))
    },

    // F6/R5/S3: templated parameterized SQL over a temp view.
    "q_f6_templated_sql" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      val sql = graft.functions.template(
        """SELECT o_orderpriority, count(1) AS n, round(sum(o_totalprice), 2) AS total
          |FROM $table WHERE o_orderstatus = '$status'
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
        Map("table" -> "orders_v", "status" -> "F"))
      s.sql(sql)
    },

    // J12: skew-salted join — must be result-identical to the plain join
    // (the oracle IS the plain join).
    "q_j12_salted_join" -> { (s, dir) =>
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.relational.Joins
        .saltedJoin(t(s, dir, "orders"), dim, Seq("o_custkey"), salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },

    // F4: date parse/format roundtrip + calendar field extraction
    // (the reference's convertStringToTimestamp/formatDateString UDFs,
    // all built-ins here).
    "q_f4_date_functions" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_str"),
          year(col("l_shipdate")).cast("long").as("ship_year"),
          month(col("l_shipdate")).cast("long").as("ship_month"),
          date_format(
            to_timestamp(date_format(col("l_shipdate"), "yyyy-MM-dd"),
              "yyyy-MM-dd"),
            "dd/MM/yyyy").as("roundtrip"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // A8/F9: surrogate-key assignment — dense, deterministic row_number
    // (the scalable replacement for the reference's zipWithUniqueId).
    "q_f9_surrogate_ids" -> { (s, dir) =>
      val w = Window.orderBy(col("p_brand"))
      t(s, dir, "part")
        .select(col("p_brand")).distinct()
        .withColumn("sk", row_number().over(w).cast("long"))
        .orderBy(col("sk"))
    })

  val oracles: Map[String, String] = Map(
    // Basket rules: same distinct-items / pair-count / both-directions
    // chain; measure expressions mirror the Scala trees op-for-op.
    "q_x92_basket_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n FROM items),
        |cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS c
        |        FROM items GROUP BY i),
        |co AS (
        |  SELECT a.i AS x, z.i AS y, CAST(count(*) AS BIGINT) AS n_both
        |  FROM items a JOIN items z ON a.b = z.b AND a.i < z.i
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 3),
        |dir AS (
        |  SELECT x AS antecedent, y AS consequent, n_both FROM co
        |  UNION ALL
        |  SELECT y, x, n_both FROM co)
        |SELECT d.antecedent, d.consequent, d.n_both,
        |  ca.c AS n_ante, cc.c AS n_cons,
        |  CAST(d.n_both AS DOUBLE) / (SELECT n FROM nb) AS support,
        |  CAST(d.n_both AS DOUBLE) / CAST(ca.c AS DOUBLE) AS confidence,
        |  (CAST(d.n_both AS DOUBLE) / CAST(ca.c AS DOUBLE)) *
        |    ((SELECT n FROM nb) / CAST(cc.c AS DOUBLE)) AS lift
        |FROM dir d
        |JOIN cnt ca ON ca.i = d.antecedent
        |JOIN cnt cc ON cc.i = d.consequent
        |ORDER BY antecedent, consequent""".stripMargin,
    "q_a13_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_a14_local_supplier_volume" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(1) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    // Scaled-LONG volume sums (floor(v*1e6+0.5) per row, BIGINT total)
    // mirrored exactly; revenue = quantize-2 of total/1e6.
    "q_a15_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |      * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue,
        |  CAST(count(1) AS BIGINT) AS n_items
        |FROM supplier
        |JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // Same scaled sums; the share is one division of the two exact
    // totals, quantized-6.
    "q_a16_market_share" ->
      """WITH base AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    ns.n_name AS supp_nation,
        |    CAST(floor(l_extendedprice * (1 - l_discount)
        |      * 1000000.0 + 0.5) AS BIGINT) AS v
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region ON nc.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'),
        |agg AS (
        |  SELECT o_year,
        |    CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN v
        |      ELSE 0 END) AS BIGINT) AS num,
        |    CAST(sum(v) AS BIGINT) AS den,
        |    CAST(count(1) AS BIGINT) AS n_items
        |  FROM base GROUP BY 1)
        |SELECT o_year,
        |  floor(CAST(num AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0
        |    AS nation_revenue,
        |  floor(CAST(den AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0
        |    AS total_revenue,
        |  CASE WHEN den > 0 THEN
        |    floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS mkt_share,
        |  n_items
        |FROM agg ORDER BY o_year""".stripMargin,
    // Disjunctive brand x quantity bands; one exact-scaled-sum row.
    "q_a17_disjunctive_revenue" ->
      """SELECT
        |  floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |      * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue,
        |  CAST(count(1) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#17' AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#4' AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // Q2 shape: the oracle keeps the CORRELATED scalar-min subquery —
    // DuckDB decorrelates it internally, so hash parity proves the
    // hand-decorrelated Spark plan. Unit costs are exact 1e6-scaled
    // BIGINTs on both sides.
    "q_a18_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT DISTINCT l_partkey, s_suppkey, s_name, s_acctbal,
        |    n_name,
        |    CAST(floor(l_extendedprice / l_quantity * 1000000.0 + 0.5)
        |      AS BIGINT) AS unit_cost_micro
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal,
        |  unit_cost_micro
        |FROM part JOIN offers o ON p_partkey = o.l_partkey
        |WHERE p_type = 'MEDIUM' AND p_size <= 10
        |  AND unit_cost_micro = (
        |    SELECT min(unit_cost_micro) FROM offers o2
        |    WHERE o2.l_partkey = o.l_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    // Q17 shape: correlated per-part avg-quantity subqueries; the cut
    // is the exact-integer 5*qty_s*n < sum_s form on both sides.
    "q_a19_small_quantity_revenue" ->
      """SELECT
        |  floor(CAST(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5)
        |      AS BIGINT)) AS DOUBLE)
        |    / 1000000.0 / 7.0 * 100.0 + 0.5) / 100.0 AS avg_yearly,
        |  CAST(count(1) AS BIGINT) AS n_items
        |FROM lineitem l JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#12'
        |  AND CAST(floor(l_quantity * 1000000.0 + 0.5) AS HUGEINT) * 5
        |      * (SELECT count(*) FROM lineitem l2
        |         WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT sum(CAST(floor(l_quantity * 1000000.0 + 0.5)
        |         AS HUGEINT)) FROM lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)""".stripMargin,
    // Q21 shape: the textbook EXISTS / NOT-EXISTS chain, decorrelated
    // in the Spark plan to semi + anti joins on the shared order key.
    "q_a20_waiting_orders" ->
      """SELECT s_name, CAST(count(1) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    // Q20 shape: nested IN + correlated scalar in the HAVING — kept
    // correlated here; the Spark plan decorrelates to two aggregates,
    // a join-back and a semi join. Exact scaled-integer share cut.
    "q_a22_dominant_share_supplier" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2' AND s_suppkey IN (
        |  SELECT l1.l_suppkey
        |  FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        |  WHERE p_type = 'SMALL'
        |  GROUP BY l1.l_suppkey, l1.l_partkey
        |  HAVING sum(CAST(floor(l_quantity * 1000000.0 + 0.5)
        |      AS HUGEINT)) * 10
        |    > (SELECT sum(CAST(floor(l2.l_quantity * 1000000.0 + 0.5)
        |         AS HUGEINT)) FROM lineitem l2
        |       WHERE l2.l_partkey = l1.l_partkey))
        |ORDER BY s_suppkey""".stripMargin,
    // Q22 shape: uncorrelated scalar (global positive-balance average,
    // exact bal_s*n > sum_s compare) + NOT EXISTS on recent orders.
    "q_a21_global_sales_opportunity" ->
      """WITH cust AS (
        |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |    CAST(floor(c_acctbal * 1000000.0 + 0.5) AS BIGINT) AS bal
        |  FROM customer WHERE c_nationkey IN (1, 5, 12, 18, 22))
        |SELECT c_nationkey, CAST(count(1) AS BIGINT) AS numcust,
        |  floor(CAST(sum(bal) AS DOUBLE) / 1000000.0 * 100.0 + 0.5)
        |    / 100.0 AS totacctbal
        |FROM cust c
        |WHERE CAST(bal AS HUGEINT) *
        |    (SELECT count(*) FROM cust WHERE bal > 0)
        |  > (SELECT sum(CAST(bal AS HUGEINT)) FROM cust WHERE bal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // Q4 shape: the oracle keeps the correlated EXISTS — DuckDB
    // decorrelates it internally; hash parity proves the semi join.
    "q_a23_priority_check" ->
      """SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // Q6 shape: pure filtered scan-aggregate, exact scaled sum.
    "q_a24_forecast_revenue" ->
      """SELECT
        |  floor(CAST(sum(CAST(floor(l_extendedprice * l_discount
        |      * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue,
        |  CAST(count(1) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin,
    // Q9 shape: identical pinned IEEE amount tree per row (profit can
    // be negative; the floor-scaled LONG keeps the sums exact).
    "q_a25_product_profit" ->
      """SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        |  floor(CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
        |      - p_retailprice * l_quantity * 0.1) * 1000000.0 + 0.5)
        |      AS HUGEINT)) AS DOUBLE)
        |    / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_profit,
        |  CAST(count(1) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_type = 'LARGE'
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,
    // Q10 shape: rank + limit on the exact micro revenue, publish
    // quantized; final order mirrors the Spark output sort.
    "q_a26_returned_items" ->
      """WITH agg AS (
        |  SELECT c_custkey, c_name, n_name,
        |    sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |      * 1000000.0 + 0.5) AS HUGEINT)) AS rv
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1, 2, 3),
        |sel AS (SELECT * FROM agg ORDER BY rv DESC, c_custkey LIMIT 20)
        |SELECT c_custkey, c_name, n_name,
        |  floor(CAST(rv AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0
        |    AS revenue
        |FROM sel ORDER BY revenue DESC, c_custkey""".stripMargin,
    // Q11 shape: the scalar subquery over the same aggregated view —
    // exact integer v_p*1000 > total compare on both sides.
    "q_a27_important_stock" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5)
        |      AS HUGEINT)) AS vp
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey = 3 GROUP BY 1)
        |SELECT l_partkey AS p_partkey,
        |  floor(CAST(vp AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0
        |    AS part_value
        |FROM v WHERE vp * 1000 > (SELECT sum(vp) FROM v)
        |ORDER BY p_partkey""".stripMargin,
    // Q12 shape: conditional CASE-sum pair, all integers.
    "q_a28_shipmode_priority" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Q13 shape: filter inside the LEFT JOIN condition (zero-order
    // customers must survive), then the histogram of counts.
    "q_a29_customer_distribution" ->
      """WITH co AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY 1)
        |SELECT c_count, CAST(count(1) AS BIGINT) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q14 shape: one division of two exact scaled-integer totals,
    // (num*100)/den in the same association order as the Spark tree.
    "q_a30_promo_effect" ->
      """SELECT
        |  floor(CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(floor(l_extendedprice * (1 - l_discount)
        |        * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
        |    * 100.0
        |    / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |        * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue_pct,
        |  floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |      * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 1000000.0 * 100.0 + 0.5) / 100.0 AS total_revenue,
        |  CAST(count(1) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    // Q15 shape: the scalar max over the aggregated revenue view,
    // winners by exact integer equality.
    "q_a31_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |      * 1000000.0 + 0.5) AS HUGEINT)) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  floor(CAST(r AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0
        |    AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE r = (SELECT max(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // Q16 shape: NOT IN complaint set + distinct supplier counts.
    "q_a32_supplier_relationship" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // Q18 shape: the textbook IN on a grouped HAVING (DuckDB
    // re-aggregates inside the IN; the Spark plan reuses ONE
    // aggregate); rank on exact micro totalprice, publish quantized.
    "q_a33_large_orders" ->
      """WITH sel AS (
        |  SELECT c_name, c_custkey, o_orderkey,
        |    strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |    CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT) AS tp,
        |    sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS HUGEINT))
        |      AS sq
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey
        |    HAVING sum(CAST(floor(l_quantity * 1000000.0 + 0.5)
        |      AS HUGEINT)) > 150000000)
        |  GROUP BY 1, 2, 3, 4, 5
        |  ORDER BY tp DESC, o_orderkey LIMIT 100)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  floor(CAST(tp AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0
        |    AS o_totalprice,
        |  floor(CAST(sq AS DOUBLE) / 1000000.0 * 100.0 + 0.5) / 100.0
        |    AS sum_qty
        |FROM sel ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q_a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  count(1) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_p1_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |  AND TIMESTAMP '1996-12-31 00:00:00' AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_j1_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    // Join audit: exact Σ f_A·f_B per key over the two count tables —
    // all-integer arithmetic, ties ranked by key.
    "q_x64_join_audit" ->
      """WITH f AS (
        |  SELECT user_id AS key, count(*) AS n FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1),
        |per AS (SELECT key, n AS n_left, n AS n_right,
        |               n * n AS join_rows FROM f),
        |tot AS (SELECT sum(join_rows) AS t FROM per)
        |SELECT key, n_left, n_right, join_rows,
        |  floor(CAST(join_rows AS DOUBLE) / t * 1000000.0 + 0.5)
        |    / 1000000.0 AS share
        |FROM per, tot
        |ORDER BY join_rows DESC, key LIMIT 15""".stripMargin,
    // Z-order audit: the same Morton magic-mask cascade in SQL bit
    // arithmetic; quantization stays IEEE-exact (products < 2^53), so
    // both engines derive identical codes, buckets and boxes.
    "q_x63_zorder_layout" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS o_day
        |  FROM orders),
        |mm AS (SELECT min(o_custkey) AS xmin, max(o_custkey) AS xmax,
        |              min(o_day) AS ymin, max(o_day) AS ymax FROM o),
        |q AS (SELECT o_orderkey, o_custkey, o_day,
        |    CASE WHEN xmax > xmin THEN CAST(floor(
        |      CAST(o_custkey - xmin AS DOUBLE) * 65535.0 /
        |      CAST(xmax - xmin AS DOUBLE)) AS BIGINT) ELSE 0 END AS qx,
        |    CASE WHEN ymax > ymin THEN CAST(floor(
        |      CAST(o_day - ymin AS DOUBLE) * 65535.0 /
        |      CAST(ymax - ymin AS DOUBLE)) AS BIGINT) ELSE 0 END AS qy
        |  FROM o, mm),
        |s1 AS (SELECT *, qx & 65535 AS ax, qy & 65535 AS ay FROM q),
        |s2 AS (SELECT *, (ax | (ax << 8)) & 16711935 AS bx,
        |                 (ay | (ay << 8)) & 16711935 AS by FROM s1),
        |s3 AS (SELECT *, (bx | (bx << 4)) & 252645135 AS dx,
        |                 (by | (by << 4)) & 252645135 AS dy FROM s2),
        |s4 AS (SELECT *, (dx | (dx << 2)) & 858993459 AS ex,
        |                 (dy | (dy << 2)) & 858993459 AS ey FROM s3),
        |s5 AS (SELECT *, (ex | (ex << 1)) & 1431655765 AS fx,
        |                 (ey | (ey << 1)) & 1431655765 AS fy FROM s4),
        |z AS (SELECT o_orderkey, o_custkey, o_day,
        |        fx | (fy << 1) AS zv FROM s5),
        |nt AS (SELECT o_custkey, o_day,
        |         CAST(ntile(32) OVER (ORDER BY zv, o_orderkey) AS BIGINT)
        |           AS bucket
        |       FROM z)
        |SELECT bucket, count(1) AS n_rows,
        |  min(o_custkey) AS x_min, max(o_custkey) AS x_max,
        |  min(o_day) AS y_min, max(o_day) AS y_max
        |FROM nt GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_j2_changed_detection" ->
      """WITH inc AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer)
        |SELECT i.c_custkey, i.c_mktsegment AS new_segment
        |FROM inc i JOIN customer e USING (c_custkey)
        |WHERE md5(i.c_name || chr(31) || i.c_mktsegment)
        |  <> md5(e.c_name || chr(31) || e.c_mktsegment)
        |ORDER BY i.c_custkey""".stripMargin,
    "q_j3_delete_detection" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey % 5 = 3
        |ORDER BY c_custkey""".stripMargin,
    "q_j4_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q_j6_broadcast_star_join" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(1) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_f1_entity_hash" ->
      """SELECT c_custkey,
        |  md5('customer' || chr(31) || CAST(c_custkey AS VARCHAR)) AS entity_id
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_a6_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_j11_dedup_first_wins" ->
      """SELECT o_custkey, min(o_orderkey) AS first_orderkey
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_o4_topk_per_key" ->
      """SELECT l_suppkey, rk, l_orderkey, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_extendedprice,
        |    CAST(row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rk
        |  FROM lineitem) WHERE rk <= 3
        |ORDER BY l_suppkey, rk""".stripMargin,
    "q_o1_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_u1_union_branches" ->
      """SELECT * FROM (
        |  SELECT 'high' AS tier, o_orderkey FROM orders WHERE o_totalprice > 300000
        |  UNION ALL
        |  SELECT 'low' AS tier, o_orderkey FROM orders WHERE o_totalprice <= 50000)
        |ORDER BY tier, o_orderkey""".stripMargin,
    "q_f6_templated_sql" ->
      """SELECT o_orderpriority, count(1) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_f9_surrogate_ids" ->
      """SELECT p_brand, CAST(row_number() OVER (ORDER BY p_brand) AS BIGINT) AS sk
        |FROM (SELECT DISTINCT p_brand FROM part) ORDER BY sk""".stripMargin,
    // The oracle IS the range join: distinct probes counted against
    // s <= p < e intervals of the same key.
    "q_j15_stabbing_count" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS k,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT) AS s,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT)
        |      + CAST(l_quantity AS BIGINT) * 86400 AS e
        |  FROM lineitem),
        |pts AS (
        |  SELECT DISTINCT l_suppkey AS k,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT) + 3 * 86400 AS p
        |  FROM lineitem)
        |SELECT pts.k AS l_suppkey, pts.p AS t,
        |  CAST(coalesce(sum(CASE WHEN iv.s <= pts.p AND pts.p < iv.e
        |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS coverage
        |FROM pts LEFT JOIN iv ON iv.k = pts.k AND iv.s < iv.e
        |GROUP BY pts.k, pts.p
        |ORDER BY l_suppkey, t""".stripMargin,
    // Same basket-pair counts + IEEE sqrt cosine + (cosine DESC, id)
    // ranking.
    "q_x105_item_cf" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM bi
        |        GROUP BY i),
        |co AS (
        |  SELECT a.i AS x, z.i AS y, CAST(count(*) AS BIGINT) AS n_both
        |  FROM bi a JOIN bi z ON a.b = z.b AND a.i < z.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |directed AS (
        |  SELECT x AS item, y AS neighbor, n_both FROM co
        |  UNION ALL SELECT y, x, n_both FROM co),
        |scored AS (
        |  SELECT d.item, d.neighbor, d.n_both,
        |    CAST(d.n_both AS DOUBLE) /
        |      sqrt(CAST(ci.c AS DOUBLE) * CAST(cn.c AS DOUBLE)) AS cosine
        |  FROM directed d
        |  JOIN cnt ci ON ci.i = d.item
        |  JOIN cnt cn ON cn.i = d.neighbor),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY item
        |    ORDER BY cosine DESC, neighbor) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT item, neighbor, n_both, cosine, rank
        |FROM ranked WHERE rank <= 5
        |ORDER BY item, rank""".stripMargin,
    // Same ROLLUP + GROUPING() semantics; NULL group keys coalesced to
    // 'ALL' on both sides (a NULL subtotal key is indistinguishable
    // from a NULL data value otherwise).
    "q_a12_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(1) AS n, round(sum(l_extendedprice), 2) AS revenue,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,
    // The oracle IS the quadratic self-join the sweep replaces; pair
    // identity is a synthetic row_number ((orderkey, linenumber) is NOT
    // unique in the driver data), overlap half-open on epoch seconds.
    "q_j14_interval_overlap" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS k,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT) AS s,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT)
        |      + CAST(l_quantity AS BIGINT) * 86400 AS e,
        |    row_number() OVER () AS rid
        |  FROM lineitem),
        |pairs AS (
        |  SELECT a.k, count(*) AS p
        |  FROM iv a JOIN iv b ON a.k = b.k
        |    AND a.rid < b.rid
        |    AND a.s < b.e AND b.s < a.e
        |  GROUP BY a.k)
        |SELECT ks.k AS l_suppkey, coalesce(pairs.p, 0) AS overlap_pairs
        |FROM (SELECT DISTINCT k FROM iv WHERE s < e) ks
        |LEFT JOIN pairs ON pairs.k = ks.k
        |ORDER BY l_suppkey""".stripMargin,
    "q_j12_salted_join" ->
      """SELECT c_mktsegment, count(1) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_f4_date_functions" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_str,
        |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(month(l_shipdate) AS BIGINT) AS ship_month,
        |  strftime(strptime(strftime(l_shipdate, '%Y-%m-%d'), '%Y-%m-%d'),
        |    '%d/%m/%Y') AS roundtrip
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
