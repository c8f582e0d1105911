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
}
