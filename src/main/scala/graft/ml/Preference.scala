package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference strength estimation — the RLHF-data view of
  * comparisons: given "annotator preferred response A over response B"
  * rows, recover a per-item latent strength (which model/prompt/source
  * actually wins) instead of eyeballing raw win rates, which confound
  * opponent difficulty (an item that only ever faced the champion has a
  * terrible win rate and may still be second-best).
  */
object Preference {

  /** X166: BRADLEY–TERRY STRENGTHS via the MM algorithm (Bradley &
    * Terry 1952; Hunter 2004 MM form — public knowledge):
    * `π'_i = W_i / Σ_{j≠i} n_ij/(π_i+π_j)` iterated to the preference
    * model `P(i beats j) = π_i/(π_i+π_j)` — the estimator preference
    * leaderboards (and RLHF reward-data audits) run over pairwise
    * human votes.
    *
    * ENGINE-STABLE EXACT-INTEGER iteration (the X160 TextRank
    * discipline): strengths are 1e9-scaled LONGs; each MM step is
    * `D_i = Σ_j ⌊n_ij·10¹⁸/(P_i+P_j)⌋` (an integer floor per pair, then
    * an order-free integer sum) and `P'_i = ⌊W_i·10¹⁸/D_i⌋`, renormal-
    * ized to `ΣP = k·10⁹` by one more floor division — a float fix
    * point would reorder an oracle-checked leaderboard at the last
    * ulp. A pair with n_ij > 0 always has P_i+P_j > 0 (one of the two
    * won those comparisons), so the division is total; W_i = 0 pins
    * P_i = 0 (an item that never won has ML strength 0 under BT).
    *
    * Scale shape: the corpus-priced work — aggregating raw comparison
    * rows to the (i, j, n, wins_i) pair table — is ONE distributed
    * hash aggregate; the MM solve is a k²-BOUNDED driver kernel over
    * collected pair counts (k = #items, the [[graft.ann]] k-means
    * centroid convention), exact in BigInt. Fails loud past
    * `maxItems` — at leaderboard-scale k the pair table no longer
    * belongs on the driver and the caller should shard by league.
    * Output: one row per item — (item, wins, n_comparisons,
    * strength_scaled, strength), strength = scaled/1e9 (one exact
    * integer→double conversion and one correctly-rounded division). */
  def bradleyTerry(comparisons: DataFrame, winnerCol: Column,
      loserCol: Column, iterations: Int = 10, maxItems: Int = 256)
      : DataFrame = {
    val base = comparisons.select(
      winnerCol.cast("string").as("w"), loserCol.cast("string").as("l"))
    val guarded = base.select(
      when(col("w").isNull || col("l").isNull || col("w") === col("l"),
        raise_error(lit("bradleyTerry: NULL or self-paired comparison")))
        .otherwise(col("w")).as("w"), col("l"))
    bradleyTerryFromPairWins(
      guarded.groupBy(col("w"), col("l")).agg(count(lit(1)).as("n")),
      iterations, maxItems)
  }

  /** [[bradleyTerry]] over an already-aggregated directed pair-win
    * table `(w, l, n)` — the MERGEABLE form: win counts are plain
    * integer sums, so per-batch persisted cell tables merge by
    * `groupBy(w, l).sum(n)` and the streaming leaderboard view equals
    * the batch solve over the union by construction (the exact-integer
    * MM is a pure function of the cell multiset). */
  def bradleyTerryFromPairWins(directedWins: DataFrame,
      iterations: Int = 10, maxItems: Int = 256): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(maxItems >= 2, s"maxItems must be >= 2, got $maxItems")
    val S: BigInt = BigInt(1000000000L)
    val S2: BigInt = S * S
    val spark = directedWins.sparkSession
    val cells = directedWins.select(col("w").cast("string").as("w"),
      col("l").cast("string").as("l"), col("n").cast("long").as("n"))
    // bound k BEFORE any driver collect: the pair table is k²-sized
    // only once k is known small
    val nItems = cells.select(col("w").as("i"))
      .unionByName(cells.select(col("l").as("i")))
      .distinct().count()
    require(nItems >= 2, s"bradleyTerry: need >= 2 items, got $nItems")
    require(nItems <= maxItems,
      s"bradleyTerry: $nItems items > maxItems=$maxItems — " +
        "shard the leaderboard or raise the bound explicitly")
    // ≤ k² rows by the bound just proven (merged cells may repeat a
    // directed pair across batches; the fold below just adds them)
    val pairWins = cells.groupBy(col("w"), col("l"))
      .agg(sum(col("n")).as("n"))
      .collect()
    val items = pairWins.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val winsOf = Array.fill(k)(0L)
    val nPair = scala.collection.mutable.Map.empty[(Int, Int), Long]
    pairWins.foreach { r =>
      val (wi, li, n) = (idx(r.getString(0)), idx(r.getString(1)),
        r.getLong(2))
      winsOf(wi) += n
      val key = if (wi < li) (wi, li) else (li, wi)
      nPair(key) = nPair.getOrElse(key, 0L) + n
    }
    val compsOf = Array.fill(k)(0L)
    nPair.foreach { case ((a, b), n) => compsOf(a) += n; compsOf(b) += n }
    // per-item neighbor lists: the MM loop below walks each item's own
    // pairs, O(k²·iter) total, not a full nPair scan per item per
    // iteration (O(k³·iter))
    val neighborsOf: Array[Array[(Int, Long)]] = {
      val bufs = Array.fill(k)(
        scala.collection.mutable.ArrayBuffer.empty[(Int, Long)])
      nPair.foreach { case ((a, b), n) =>
        bufs(a) += ((b, n)); bufs(b) += ((a, n))
      }
      bufs.map(_.toArray)
    }
    var p = Array.fill(k)(S)
    for (_ <- 1 to iterations) {
      val next = Array.tabulate(k) { i =>
        if (winsOf(i) == 0L) BigInt(0)
        else {
          var d = BigInt(0)
          neighborsOf(i).foreach { case (j, n) =>
            val denom = p(i) + p(j)
            // the floor renormalization below CAN zero a winning
            // item's strength (another item's raw update dominating
            // tot); a pair of two such items would divide by zero —
            // skip that pair this iteration, its mass re-enters once
            // either side recovers nonzero strength
            if (denom > 0) d += (BigInt(n) * S2) / denom
          }
          if (d == 0) BigInt(0) else (BigInt(winsOf(i)) * S2) / d
        }
      }
      val tot = next.foldLeft(BigInt(0))(_ + _)
      p =
        if (tot == 0) next
        else next.map(v => (v * k * S) / tot)
    }
    import spark.implicits._
    items.indices.map { i =>
      (items(i), winsOf(i), compsOf(i), p(i).toLong,
        p(i).toLong.toDouble / 1e9)
    }.toDF("item", "wins", "n_comparisons", "strength_scaled", "strength")
  }
}
