package graft.queries

import graft.Tables.t
import graft.ml.{LinearModel, Scoring}
import graft.pipeline.{Pipeline, RowPipeline, Transformation, TransformationContext}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Pipeline-framework coverage (SURVEY.md §2.11 R1-R6, §2.1 S1/S4, F10):
  * dependency-ordered table pipelines, row-level append pipelines, CSV
  * source/sink roundtrip, and column-expression model scoring. */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // R4+O7: table pipeline, registered out of order, run in tsort order.
    "q_r4_table_pipeline" -> { (s, dir) =>
      val ctx = new TransformationContext
      val ts = Seq(
        Transformation("agg", deps = Seq("derive")) { (df, _) =>
          df.groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n"), round(sum(col("net")), 2).as("net_total"))
        },
        Transformation("filter_f") { (df, _) =>
          df.filter(col("o_orderstatus") === "F")
        },
        Transformation("derive", deps = Seq("filter_f")) { (df, _) =>
          df.withColumn("net", col("o_totalprice") * 0.9)
        })
      Pipeline.run(t(s, dir, "orders"), ts, ctx)
        .orderBy(col("o_orderpriority"))
    },

    // R1-R3: row-level append pipeline (imperative per-row logic path).
    "q_r3_row_pipeline" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val (out, _) = RowPipeline.appendColumns(cust,
        Seq(StructField("name_len", LongType)),
        (r: Row) => Seq(r.getAs[String]("c_name").length.toLong))
      out.select(col("c_custkey"), col("name_len")).orderBy(col("c_custkey"))
    },

    // S20: fixed-width format -> parse round trip over customer —
    // positional substring projections (no UDF, no regex), trim+cast;
    // proves the copybook-layout ingest path end to end in SQL.
    "q_s20_fixed_width" -> { (s, dir) =>
      import graft.sources.{FixedWidth, FixedWidthField}
      val layout = Seq(
        FixedWidthField("c_custkey", 1, 10, "long"),
        FixedWidthField("c_name", 11, 25),
        FixedWidthField("c_mktsegment", 36, 12))
      val lines = FixedWidth.format(
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        layout)
      FixedWidth.parse(lines, "line", layout)
        .orderBy(col("c_custkey"))
    },

    // S1+S4: CSV sink then source roundtrip preserves the data.
    "q_s1_csv_roundtrip" -> { (s, dir) =>
      val ctx = new TransformationContext
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_csv_roundtrip_" +
        s.sparkContext.applicationId
      ctx.update("out_path", path)
      ctx.update("in_path", path)
      val orig = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      graft.sources.CsvSink.write(orig, ctx)
      ctx.update("schema", orig.schema)
      graft.sources.CsvSource(s, ctx)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), min(col("c_custkey")).as("min_key"))
        .orderBy(col("c_mktsegment"))
    },

    // JSONL round trip: documents (incl. full text) written as
    // newline-delimited JSON and read back under the explicit schema;
    // the per-lang digest of sorted text md5s proves every text byte
    // survives JSON escaping.
    "q_s2_jsonl_roundtrip" -> { (s, dir) =>
      val ctx = new TransformationContext
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_roundtrip_" +
        s.sparkContext.applicationId
      ctx.update("out_path", path)
      ctx.update("in_path", path)
      val orig = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      graft.sources.JsonlSink.write(orig, ctx)
      ctx.update("schema", orig.schema)
      graft.sources.JsonlSource(s, ctx)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_key"),
          md5(concat_ws("", array_sort(collect_list(md5(col("text"))))))
            .as("texts_md5"))
        .orderBy(col("lang"))
    },

    // ORC round trip: lineitem numerics through the native ORC
    // writer/reader (typed columns survive, unlike JSON), partitioned
    // by returnflag to exercise the partition_by path.
    "q_s3_orc_roundtrip" -> { (s, dir) =>
      val ctx = new TransformationContext
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_orc_roundtrip_" +
        s.sparkContext.applicationId
      ctx.update("out_path", path)
      ctx.update("in_path", path)
      ctx.update("partition_by", Seq("l_returnflag"))
      val orig = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      graft.sources.OrcSink.write(orig, ctx)
      graft.sources.OrcSource(s, ctx)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          min(col("l_orderkey")).as("min_key"))
        .orderBy(col("l_returnflag"))
    },

    // X58: quantile-sketch report — exact interpolated median plus
    // GK percentile_approx audited against its rank guarantee.
    "q_x58_quantile_sketch" -> { (s, dir) =>
      graft.sketch.Sketches.quantileReport(t(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag"))
    },

    // F10: linear model scoring with enum re-coding.
    "q_f10_scoring" -> { (s, dir) =>
      val scored = Scoring.score(
        t(s, dir, "lineitem"),
        Seq("l_quantity", "l_discount", "l_returnflag"),
        LinearModel(Seq(0.5, 2.0, 3.0), bias = 1.0),
        recode = Map("l_returnflag" ->
          Map("R" -> 1.0, "A" -> 0.5, "N" -> 0.0)))
      scored.select(col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        graft.functions.quantize(col("score"), 4).as("score"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // F13: min-max feature scaling — exact global min/max (deterministic
    // under any aggregation order, unlike float sums), one stats row
    // broadcast back.
    "q_f13_minmax_scale" -> { (s, dir) =>
      graft.ml.FeaturePrep.minMaxScale(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice"))
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity_scaled"), col("l_extendedprice_scaled"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // F12: tree-ensemble scoring INGESTED from an XGBoost-style JSON dump
    // (graft.ml.ModelIngest), then compiled to native expressions — the
    // oracle SQL below is emitted by the SAME compiler over the SAME
    // parsed trees, so DuckDB re-evaluates the identical CASE tree
    // independently of the ingestion path.
    "q_f12_tree_ensemble" -> { (s, dir) =>
      PipelineQueries.EnsembleModel.score(t(s, dir, "lineitem"))
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("score"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })

  /** The demo GBM ensemble as a trained artifact would dump it — XGBoost
    * `get_dump(dump_format="json")` node shape, with a base-score wrapper.
    * q_f12 scores the PARSED model, so ingestion sits on the oracle-checked
    * path, not only in the spec. */
  val EnsembleDumpJson: String =
    """{"bias": 0.1, "trees": [
      |  {"nodeid": 0, "split": "f0", "split_condition": 25.0,
      |   "yes": 1, "no": 2, "missing": 2, "children": [
      |     {"nodeid": 1, "split": "f1", "split_condition": 0.05,
      |      "yes": 3, "no": 4, "missing": 4, "children": [
      |        {"nodeid": 3, "leaf": 0.2}, {"nodeid": 4, "leaf": 0.7}]},
      |     {"nodeid": 2, "split": "f2", "split_condition": 30000.0,
      |      "yes": 5, "no": 6, "missing": 6, "children": [
      |        {"nodeid": 5, "leaf": 1.1}, {"nodeid": 6, "leaf": 1.9}]}]},
      |  {"nodeid": 0, "split": "f1", "split_condition": 0.08,
      |   "yes": 1, "no": 2, "missing": 2, "children": [
      |     {"nodeid": 1, "leaf": -0.3},
      |     {"nodeid": 2, "split": "f0", "split_condition": 40.0,
      |      "yes": 3, "no": 4, "missing": 4, "children": [
      |        {"nodeid": 3, "leaf": 0.4}, {"nodeid": 4, "leaf": 0.9}]}]}
      |]}""".stripMargin

  /** Parsed once; shared by q_f12's Spark side and its oracle SQL. */
  val EnsembleModel: graft.ml.ModelIngest.Ensemble =
    graft.ml.ModelIngest.parseEnsemble(EnsembleDumpJson, featureNames = Map(
      "f0" -> "l_quantity", "f1" -> "l_discount", "f2" -> "l_extendedprice"))

  val oracles: Map[String, String] = Map(
    "q_r4_table_pipeline" ->
      """SELECT o_orderpriority, count(1) AS n,
        |  round(sum(o_totalprice * 0.9), 2) AS net_total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_r3_row_pipeline" ->
      """SELECT c_custkey, CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // Same rpad-concat then substr/trim/cast arithmetic.
    "q_s20_fixed_width" ->
      """WITH lines AS (
        |  SELECT rpad(CAST(c_custkey AS VARCHAR), 10, ' ')
        |    || rpad(c_name, 25, ' ')
        |    || rpad(c_mktsegment, 12, ' ') AS line
        |  FROM customer)
        |SELECT CAST(trim(substr(line, 1, 10)) AS BIGINT) AS c_custkey,
        |  trim(substr(line, 11, 25)) AS c_name,
        |  trim(substr(line, 36, 12)) AS c_mktsegment
        |FROM lines ORDER BY c_custkey""".stripMargin,
    "q_s1_csv_roundtrip" ->
      """SELECT c_mktsegment, count(1) AS n, min(c_custkey) AS min_key
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_s2_jsonl_roundtrip" ->
      """SELECT lang, count(1) AS n, min(doc_id) AS min_key,
        |  md5(string_agg(md5(text), '' ORDER BY md5(text))) AS texts_md5
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_s3_orc_roundtrip" ->
      """SELECT l_returnflag, count(1) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  min(l_orderkey) AS min_key
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Quantile sketch: the oracle pins the exact type-7 median and the
    // rank-guarantee audit booleans (GK summaries aren't cross-engine
    // comparable value-for-value).
    "q_x58_quantile_sketch" ->
      """SELECT l_returnflag, count(1) AS n,
        |  floor(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)
        |    * 10000.0 + 0.5) / 10000.0 AS exact_p50,
        |  true AS ok_p25, true AS ok_p50, true AS ok_p90
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_f10_scoring" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  floor((0.5 * l_quantity + 2.0 * l_discount +
        |    3.0 * (CASE l_returnflag WHEN 'R' THEN 1.0 WHEN 'A' THEN 0.5
        |      WHEN 'N' THEN 0.0 END) + 1.0) * 10000.0 + 0.5) / 10000.0
        |    AS score
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_f13_minmax_scale" ->
      """WITH s AS (
        |  SELECT min(CAST(l_quantity AS DOUBLE)) AS qlo,
        |    max(CAST(l_quantity AS DOUBLE)) AS qhi,
        |    min(CAST(l_extendedprice AS DOUBLE)) AS elo,
        |    max(CAST(l_extendedprice AS DOUBLE)) AS ehi
        |  FROM lineitem)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  floor((CAST(l_quantity AS DOUBLE) - qlo) / (qhi - qlo)
        |    * 1000000.0 + 0.5) / 1000000.0 AS l_quantity_scaled,
        |  floor((CAST(l_extendedprice AS DOUBLE) - elo) / (ehi - elo)
        |    * 1000000.0 + 0.5) / 1000000.0 AS l_extendedprice_scaled
        |FROM lineitem, s
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_f12_tree_ensemble" ->
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |  ${EnsembleModel.scoreSql} AS score
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
