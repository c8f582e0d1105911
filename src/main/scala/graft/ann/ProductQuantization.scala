package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compression path a 100 TB embedding
  * store runs when even int8 is too large: the vector is split into `m`
  * contiguous subspaces, each subspace is vector-quantized against its own
  * small codebook (k centroids), and a vector is stored as `m` small codes
  * (m bytes at k ≤ 256 — a 256× reduction for 64-dim float64). Search
  * decompresses nothing: asymmetric distance computation (ADC) scores a
  * query against codes through an m × k lookup table of exact
  * query-to-centroid subdistances. Public knowledge (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * Scale shape: codebooks are tiny (m × k × dim/m doubles) and broadcast;
  * encoding and ADC scoring are row-local `mapPartitions` loops — zero
  * shuffle. Training reuses [[Similarity.trainCentroids]] per subspace.
  * Encoding with a GIVEN codebook is deterministic integer output, so the
  * DuckDB oracle reproduces every code; training, like all float k-means,
  * is spec-checked (accumulation-order sensitivity).
  */
object ProductQuantization {

  /** Codebook row layout: (subspace, centroid_id, centroid). Ids need NOT
    * be dense — [[adcTopK]] remaps codes to positions in this id-sorted
    * array. */
  private def collectCodebooks(codebooks: DataFrame, m: Int)
      : Array[Array[(Long, Array[Double])]] = {
    val spark = codebooks.sparkSession
    import spark.implicits._
    val rows = codebooks
      .select(col("subspace").cast("int"), col("centroid_id").cast("long"),
        col("centroid").cast("array<double>"))
      .as[(Int, Long, Array[Double])]
      .collect()
    require(rows.nonEmpty, "codebooks must be non-empty")
    val bySub = rows.groupBy(_._1)
    require(bySub.keySet == (0 until m).toSet,
      s"codebooks must cover subspaces 0..${m - 1}, got ${bySub.keySet}")
    (0 until m).map(s => bySub(s).sortBy(_._2)
      .map(r => (r._2, r._3)).toArray).toArray
  }

  private def requireNumericId(df: DataFrame, idCol: String,
      op: String): Unit = {
    val t = df.schema(idCol).dataType
    require(t.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$op requires a numeric $idCol (castable to long), got $t")
  }

  /** Exact squared L2 between a subvector of `v` starting at `off` and a
    * centroid — bounded by the vector's real length, so ragged or short
    * embeddings degrade (missing dims contribute nothing) instead of
    * throwing mid-stage, the same contract as
    * [[Similarity.bruteForceTopK]]'s min-length dot. */
  private def subDist(v: Array[Double], off: Int,
      cv: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(cv.length, math.max(0, v.length - off))
    while (i < n) {
      val diff = v(off + i) - cv(i)
      d += diff * diff
      i += 1
    }
    d
  }

  /** Train per-subspace codebooks with the deterministic seeded k-means of
    * [[Similarity.trainCentroids]] over each subvector slice. Returns
    * (subspace, centroid_id, centroid) — persist this table; it IS the
    * index artifact (float means are accumulation-order sensitive, so
    * train once and store, never retrain-and-compare). */
  def trainCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"m ($m) must divide dim ($dim)")
    val sub = dim / m
    (0 until m).map { s =>
      val sliced = df.select(col(idCol),
        slice(col(vecCol).cast("array<double>"), s * sub + 1, sub)
          .as(vecCol))
      Similarity.trainCentroids(sliced, idCol, vecCol, k, iters, sub)
        .select(lit(s).as("subspace"), col(idCol).as("centroid_id"),
          col(vecCol).as("centroid"))
    }.reduce(_ unionByName _)
  }

  /** Encode every vector as `m` codes: per subspace, the centroid id
    * minimizing the exact squared L2 subdistance (ties to the lower id).
    * Row-local against the broadcast codebooks — zero shuffle; output
    * codes ride as an `array<bigint>` plus a reconstruction-error column
    * (the total squared distance to the selected centroids — the
    * quantization loss PQ evaluations report). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int): DataFrame = {
    requireNumericId(df, idCol, "encode")
    val spark = df.sparkSession
    import spark.implicits._
    val cb = collectCodebooks(codebooks, m)
    val bc = spark.sparkContext.broadcast(cb)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val books = bc.value
        val m0 = books.length
        rows.map { case (id, v) =>
          if (v == null) throw new IllegalArgumentException(
            s"encode: vector id=$id has a NULL embedding — filter or " +
              "impute null vectors before quantization")
          val codes = new Array[Long](m0)
          var err = 0.0
          var s = 0
          while (s < m0) {
            val book = books(s)
            val sub = book(0)._2.length
            val off = s * sub
            var best = Double.PositiveInfinity
            var bestId = book(0)._1
            var c = 0
            while (c < book.length) {
              val (cid, cv) = book(c)
              val d = subDist(v, off, cv)
              if (d < best) { best = d; bestId = cid }
              c += 1
            }
            codes(s) = bestId
            err += best
            s += 1
          }
          (id, codes.toSeq, err)
        }
      }
      .toDF("vec_id", "codes", "sq_err")
  }

  /** ADC top-k: score a query set against PQ codes without decoding. Per
    * query, an m × k table of exact query-to-centroid subdistances is
    * precomputed once; a candidate's approximate squared distance is the
    * sum of m table lookups — O(m) per pair instead of O(dim). The
    * encoded corpus streams through `mapPartitions` against the broadcast
    * (queries × LUT) set: zero shuffle, top-k kept per query by insertion
    * (dist asc, id asc). Query count must fit one broadcast — the same
    * batch-of-queries contract as [[Similarity.bruteForceTopK]]. */
  def adcTopK(queries: DataFrame, encoded: DataFrame, idCol: String,
      vecCol: String, codebooks: DataFrame, m: Int, k: Int): DataFrame = {
    requireNumericId(queries, idCol, "adcTopK")
    val spark = queries.sparkSession
    import spark.implicits._
    val cb = collectCodebooks(codebooks, m)
    // codes are raw CENTROID IDS (not positions): build per-subspace
    // id → LUT-slot maps so non-dense id spaces (e.g. codebooks keyed by
    // source vector ids) look up the right centroid instead of indexing
    // out of bounds or, worse, silently reading a wrong slot
    val codeSlot: Array[Map[Long, Int]] =
      cb.map(_.iterator.map(_._1).zipWithIndex.toMap)
    val qluts: Array[(Long, Array[Array[Double]])] = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .collect()
      .sortBy(_._1)
      .map { case (qid, qv) =>
        require(qv != null, s"adcTopK: query id=$qid has a NULL embedding")
        val lut = cb.zipWithIndex.map { case (book, s) =>
          val sub = book(0)._2.length
          book.map { case (_, cv) => subDist(qv, s * sub, cv) }
        }
        (qid, lut)
      }
    val bc = spark.sparkContext.broadcast((qluts, codeSlot))
    // Per-PARTITION insertion top-k per query (never materializing the
    // corpus × queries pair space), then one small window over the q × k
    // partials per partition.
    val partials = encoded.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Long])]
      .mapPartitions { rows =>
        val (qs, slots) = bc.value
        val nq = qs.length
        val topId = Array.fill(nq)(new Array[Long](k))
        val topD = Array.fill(nq)(new Array[Double](k))
        val topN = new Array[Int](nq)
        rows.foreach { case (cid, codes) =>
          var q = 0
          while (q < nq) {
            val (qid, lut) = qs(q)
            if (qid != cid) {
              var d = 0.0
              var s = 0
              while (s < lut.length) {
                d += lut(s)(slots(s)(codes(s)))
                s += 1
              }
              val ids = topId(q); val ds = topD(q); val n = topN(q)
              var pos = n
              while (pos > 0 && (ds(pos - 1) > d ||
                  (ds(pos - 1) == d && ids(pos - 1) > cid))) pos -= 1
              if (pos < k) {
                var mIdx = math.min(n, k - 1)
                while (mIdx > pos) {
                  ds(mIdx) = ds(mIdx - 1); ids(mIdx) = ids(mIdx - 1)
                  mIdx -= 1
                }
                ds(pos) = d; ids(pos) = cid
                if (n < k) topN(q) = n + 1
              }
            }
            q += 1
          }
        }
        (0 until nq).iterator.flatMap { q =>
          val (qid, _) = qs(q)
          (0 until topN(q)).map(r => (qid, topId(q)(r), topD(q)(r)))
        }
      }
      .toDF("vec_id", "neighbor_id", "sq_dist")
    partials
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("sq_dist"), col("neighbor_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("rk"), col("neighbor_id"),
        round(col("sq_dist"), 6).as("sq_dist"))
  }
}
