package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage transforms: L2 normalization and symmetric int8
  * quantization — the compression step a 100 TB embedding store runs
  * before indexing (4× smaller than float32, dot products stay rank-
  * faithful after per-vector rescale).
  *
  * Everything is deterministic element arithmetic (one projection, no
  * shuffle): the scale is `max|x| / 127`, quantized values are
  * `round(x / scale)` with round-half-away-from-zero on both engines, so
  * the DuckDB oracle reproduces every cell exactly. */
object Embeddings {

  /** Per-vector L2 norm of an `array<double>` column. */
  def l2(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0), (acc, x) => acc + x * x))

  /** Unit-normalized copy of the vector (null-safe: zero vectors pass
    * through unchanged rather than dividing by zero). */
  def normalized(vec: Column): Column = {
    val n = l2(vec)
    when(n > 0.0, transform(vec, x => x / n)).otherwise(vec)
  }

  /** Symmetric int8 quantization: per-vector `scale = max|x| / 127`,
    * `q_i = round(x_i / scale)` ∈ [-127, 127]. Zero vectors quantize to
    * zeros with scale 0. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val maxAbs = array_max(transform(v, x => abs(x)))
    df.withColumn("scale", maxAbs / 127.0)
      .withColumn("q",
        when(col("scale") > 0.0,
          transform(v, x => round(x / col("scale"), 0).cast("int")))
          .otherwise(transform(v, x => lit(0))))
      .withColumn("max_abs_err",
        when(col("scale") > 0.0,
          array_max(zip_with(v, col("q"),
            (x, q) => abs(x - q.cast("double") * col("scale")))))
          .otherwise(lit(0.0)))
      .select(col(idCol), col("scale"), col("q"), col("max_abs_err"))
  }

  /** Seeded sign-matrix random projection (Achlioptas 2003, public
    * knowledge — the database-friendly Johnson–Lindenstrauss family):
    * `out_j = (1/√dOut) · Σ_i v_i · s(i, j)` with `s ∈ {±1}` derived
    * from the parity of an md5 hex digit over `"rp|j|i"` — no RNG
    * state, any engine regenerates the identical matrix from the
    * dimensions alone. The shrink step a 100 TB embedding store runs
    * before ANN indexing (1536→256 cuts index bytes and distance FLOPs
    * ~6× while JL preserves pairwise geometry).
    *
    * Relational matmul, built for scale: the (dIn × dOut) sign matrix
    * is generated ON the cluster (`spark.range` projection, never
    * collected) and broadcast into the exploded-vector join — one
    * corpus-linear explode, one broadcast join, one map-side-combined
    * (id, dim) aggregate; no shuffle proportional to dIn × dOut.
    *
    * Returns LONG form `(<idCol>, dim, value)` (value rounded to 4
    * decimals — double sums are order-sensitive at ~1e-15), the shape
    * downstream group-to-array assembly or direct per-dim analytics
    * consume. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      dIn: Int, dOut: Int): DataFrame = {
    require(dIn >= 1 && dOut >= 1, s"bad dims ($dIn, $dOut)")
    val spark = df.sparkSession
    val mat = spark.range(dIn.toLong * dOut).select(
      (col("id") % dIn).as("i"),
      expr(s"id div $dIn").as("dim"),
      when(conv(substring(md5(concat(lit("rp|"),
          expr(s"id div $dIn"), lit("|"), col("id") % dIn)), 1, 1),
          16, 10).cast("long") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
        .as("s"))
    df.select(col(idCol), posexplode(col(vecCol).cast("array<double>")))
      .withColumnRenamed("pos", "i")
      .join(broadcast(mat), "i")
      .groupBy(col(idCol), col("dim"))
      .agg(round(sum(col("col") * col("s")) * lit(1.0 / math.sqrt(dOut)), 4)
        .as("value"))
  }

  /** X79: MEAN-POOL a group of vectors into one (chunk embeddings →
    * document embedding — the standard RAG roll-up once X75 chunks are
    * embedded; also label/domain centroids for analysis). Distributed
    * shape: posexplode → ONE map-side-combined (group, pos) aggregate →
    * per-group array re-assembly (array_sort on the bounded dim
    * struct) — the [[Similarity.trainCentroids]] mean-update pattern,
    * shuffle rows O(groups × dim), never O(vectors × dim). Per-dim
    * means and the norm are rounded to 6 so the result is
    * engine-reproducible (the norm is computed FROM the rounded means
    * on both engines). Output: (group_id, n_vecs, mean_embedding,
    * l2_norm). Null/ragged vectors: positions contribute only where
    * present (mean per position over vectors that HAVE it). */
  def meanPool(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val pooled = df
      .select(col(groupCol).as("group_id"),
        posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("group_id"), col("pos"))
      .agg(sum(col("col")).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col("group_id"))
      .agg(max(col("__c")).cast("long").as("n_vecs"),
        transform(array_sort(collect_list(struct(col("pos"),
            round(col("__s") / col("__c"), 6).as("m")))),
          x => x.getField("m")).as("mean_embedding"))
    pooled.withColumn("l2_norm",
      round(sqrt(aggregate(col("mean_embedding"), lit(0.0),
        (acc, x) => acc + x * x)), 6))
  }
  /** X95: EMBEDDING DIMENSION ABLATION — the "how many dimensions do I
    * actually need" report (popularized as matryoshka-representation
    * evaluation, Kusupati et al. 2022, public knowledge): over a
    * deterministic stride-paired sample of the corpus, the cosine at
    * each truncated prefix length vs the full-dimension cosine —
    * mean cosine and mean |Δ| per dimension budget. Run before
    * choosing an index dimension: if mad_vs_full at 16 dims is already
    * ~0, the IVF/PQ index can store a quarter of the floats.
    *
    * Engine parity: per-pair cosines are sequential left-fold sums
    * (zip-multiply fold == DuckDB's list_dot_product accumulation
    * order) over identical slices, so every per-pair value is
    * bit-identical; only the per-dim averages carry a distributed sum
    * and are rounded to 6. NaN cosines (zero-norm prefix or full
    * vector) drop pairwise — both engines filter identically.
    *
    * Scale shape: ONE self-equi-join on the strided id (no similarity
    * search), a projection of |dims| fold expressions, and a dims-sized
    * aggregate. */
  /** X104: EMBEDDING-SPACE HEALTH HISTOGRAM — the distribution of
    * pairwise cosines over a strided pair sample, binned on fixed
    * [−1, 1] edges. The isotropy check run before trusting cosine
    * retrieval at all: anisotropic embedding spaces (all cosines
    * piled near +1 — the well-known representation-degeneration
    * pathology) make cosine top-k meaningless, and a histogram shows
    * it where a single mean hides it.
    *
    * Same strided self-equi-join as [[dimAblation]] (deterministic
    * O(n) pair sample, one equi-join, never all-pairs); cosines are
    * identical sequential folds in both engines, and the bucket
    * arithmetic is the exactly-rounded subtract/divide/floor
    * discipline (no ln/exp — bucket placement engine-identical).
    * Empty buckets surface as explicit zero rows (a hole in a
    * histogram is data, not absence). Output: (bucket, lo, hi, n). */
  def cosineHistogram(df: DataFrame, idCol: String, vecCol: String,
      stride: Long, bins: Int = 20): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val a = df.select(col(idCol).cast("long").as("id_a"),
      col(vecCol).cast("array<double>").as("va"))
    val b = df.select((col(idCol).cast("long") - stride).as("id_a"),
      col(vecCol).cast("array<double>").as("vb"))
    val dot = aggregate(zip_with(col("va"), col("vb"), (p, q) => p * q),
      lit(0.0), (acc, t) => acc + t)
    val nx = sqrt(aggregate(col("va"), lit(0.0), (acc, p) => acc + p * p))
    val ny = sqrt(aggregate(col("vb"), lit(0.0), (acc, q) => acc + q * q))
    val cos = when(nx * ny > 0.0, dot / (nx * ny))
    val width = 2.0 / bins
    val counts = a.join(b, "id_a")
      .select(cos.as("__cos"))
      .filter(col("__cos").isNotNull)
      .select(least(floor((col("__cos") + 1.0) / width),
        lit(bins - 1.0)).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val grid = df.sparkSession.range(0, bins)
      .select(col("id").as("bucket"))
    grid.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        round(lit(-1.0) + col("bucket") * width, 6).as("lo"),
        round(lit(-1.0) + (col("bucket") + 1) * width, 6).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  def dimAblation(df: DataFrame, idCol: String, vecCol: String,
      dims: Seq[Int], stride: Long): DataFrame = {
    require(dims.nonEmpty, "dimAblation needs at least one dim")
    require(dims.forall(_ >= 1), s"dims must be >= 1: $dims")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val fullDim = dims.max
    val a = df.select(col(idCol).cast("long").as("id_a"),
      col(vecCol).cast("array<double>").as("va"))
    val b = df.select((col(idCol).cast("long") - stride).as("id_a"),
      col(vecCol).cast("array<double>").as("vb"))
    def cosAt(d: Int): Column = {
      val x = slice(col("va"), 1, d)
      val y = slice(col("vb"), 1, d)
      val dot = aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0),
        (acc, t) => acc + t)
      val nx = sqrt(aggregate(x, lit(0.0), (acc, p) => acc + p * p))
      val ny = sqrt(aggregate(y, lit(0.0), (acc, q) => acc + q * q))
      // explicit zero-norm guard (NULL, filtered below): ANSI Spark
      // throws on 0/0 where DuckDB yields NaN — a guarded NULL is the
      // one form both engines express identically
      when(nx * ny > 0.0, dot / (nx * ny))
    }
    a.join(b, "id_a")
      .select(
        explode(array(dims.map(d => struct(lit(d).as("dim"),
          cosAt(d).as("cos"))): _*)).as("c"),
        cosAt(fullDim).as("__cfull"))
      .select(col("c.dim").as("dim"), col("c.cos").as("cos"),
        col("__cfull"))
      .filter(col("cos").isNotNull && col("__cfull").isNotNull)
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("cos")), 6).as("mean_cosine"),
        round(avg(abs(col("cos") - col("__cfull"))), 6)
          .as("mad_vs_full"))
  }

}
