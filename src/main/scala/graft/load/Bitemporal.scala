package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C10/C11: BITEMPORAL history — VALID time (when a fact is true in the
  * business world) crossed with TRANSACTION time (when the system
  * learned it). The plain SCD2 tier ([[Scd2Merge]]) tracks transaction
  * time only; bitemporality is what answers "what did we believe on
  * tx-date T about the value in force on business date V" — the
  * late-arriving-correction / audit / reproducible-training-snapshot
  * question (Snodgrass 1999, *Developing Time-Oriented Database
  * Applications in SQL*; SQL:2011 system+application time periods).
  *
  * Model: an append-only ASSERTION LOG. Each row asserts "from business
  * instant `valid_from` onward, the entity's attributes are X", recorded
  * at transaction instant `tx_from`. A later assertion with the SAME
  * (entity, valid_from) is a correction and closes its predecessor's
  * transaction interval; a later `valid_from` supersedes it in business
  * time without erasing what was previously believed.
  *
  * Scale (100 TB): [[fromAssertions]]'s only window is keyed by
  * (entity, valid_from) and ordered by (tx, tie) — bounded by the
  * correction chain of ONE fact, never a global or entity-global sort.
  * [[asOf]] is filter + one `max_by` hash aggregate (one shuffle on
  * entity). [[retroDiff]] joins two such snapshots on entity.
  */
object Bitemporal {

  /** Close transaction intervals over the assertion log: `tx_to` =
    * the next assertion's `tx_from` for the same (entity, valid_from)
    * under the total order (tx, tie) — NULL while still believed.
    * `tieCol` MUST make the order total (a unique batch/row id);
    * equal (tx, tie) pairs would make the chain nondeterministic, so
    * duplicates fail loud. Output: entity, valid_from, attrs…,
    * tx_from, tx_to. */
  def fromAssertions(df: DataFrame, entityCol: Column, validFromCol: Column,
      txCol: Column, tieCol: Column, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "need at least one attribute column")
    val base = df.select(Seq(entityCol.as("entity"),
      validFromCol.cast("timestamp").as("valid_from"),
      txCol.cast("timestamp").as("tx_from"),
      tieCol.as("__tie")) ++ attrs.map(col): _*)
    val w = Window.partitionBy(col("entity"), col("valid_from"))
      .orderBy(col("tx_from"), col("__tie"))
    // duplicate (entity, valid_from, tx, tie) assertions have no
    // defined order — fail loud via the SAME window (one Window exec):
    // an equal successor sort key means the tie column isn't total
    val nxtKey = lead(struct(col("tx_from"), col("__tie")), 1).over(w)
    base
      .withColumn("tx_to",
        when(nxtKey === struct(col("tx_from"), col("__tie")),
          raise_error(lit("Bitemporal.fromAssertions: duplicate " +
            "(entity, valid_from, tx, tie) assertion — tie column is " +
            "not a total order")).cast("timestamp"))
          .otherwise(lead(col("tx_from"), 1).over(w)))
      .select(Seq(col("entity"), col("valid_from")) ++ attrs.map(col) ++
        Seq(col("tx_from"), col("tx_to")): _*)
  }

  /** The bitemporal point read: the row per entity that was (a) the
    * live assertion at transaction instant `txAsOf` (tx_from ≤ tx <
    * tx_to) and (b) in force at business instant `validAsOf` (the
    * greatest valid_from ≤ validAsOf). After the tx filter at most one
    * assertion per (entity, valid_from) survives, so the `max_by` over
    * (valid_from, tx_from) struct is deterministic. Entities with no
    * qualifying row don't appear. */
  def asOf(bt: DataFrame, txAsOf: String, validAsOf: String): DataFrame = {
    val attrs = bt.columns.filterNot(
      Set("entity", "valid_from", "tx_from", "tx_to"))
    val tx = lit(txAsOf).cast("timestamp")
    val live = bt
      .filter(col("tx_from") <= tx &&
        (col("tx_to").isNull || col("tx_to") > tx) &&
        col("valid_from") <= lit(validAsOf).cast("timestamp"))
    live.groupBy(col("entity"))
      .agg(max_by(
        struct(Seq(col("valid_from"), col("tx_from")) ++
          attrs.map(col): _*),
        struct(col("valid_from"), col("tx_from"))).as("__r"))
      .select(col("entity") +: (Seq("valid_from", "tx_from") ++ attrs)
        .map(c => col(s"__r.$c").as(c)): _*)
      .select(Seq(col("entity"), col("valid_from")) ++ attrs.map(col) ++
        Seq(col("tx_from")): _*)
  }

  /** C11: RETROACTIVE-CORRECTION AUDIT — how the believed state at
    * business instant `validAsOf` changed between two transaction
    * instants: full-outer join of the two [[asOf]] snapshots, keeping
    * entities whose value changed, appeared, or disappeared.
    * `change`: 'added' | 'removed' | 'revised'. The "which training
    * labels moved under us between the Jan and Feb snapshot" report. */
  def retroDiff(bt: DataFrame, txA: String, txB: String,
      validAsOf: String): DataFrame = {
    val attrs = bt.columns.filterNot(
      Set("entity", "valid_from", "tx_from", "tx_to")).toSeq
    def side(tx: String, suffix: String) =
      asOf(bt, tx, validAsOf).select(col("entity") +:
        (Seq("valid_from") ++ attrs).map(c => col(c).as(s"${c}_$suffix")): _*)
    val joined = side(txA, "a").join(side(txB, "b"), Seq("entity"),
      "full_outer")
    val differs = attrs.map(c =>
      !(col(s"${c}_a") <=> col(s"${c}_b"))).reduce(_ || _) ||
      !(col("valid_from_a") <=> col("valid_from_b"))
    joined
      .withColumn("change",
        when(col("valid_from_a").isNull, lit("added"))
          .when(col("valid_from_b").isNull, lit("removed"))
          .otherwise(lit("revised")))
      .filter(col("valid_from_a").isNull || col("valid_from_b").isNull ||
        differs)
  }
}
