package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector primitives over `array<float>` columns, built on Spark's
 * codegen'd higher-order functions (zip_with/aggregate) — no UDFs, so the
 * whole similarity pipeline stays inside WholeStageCodegen.
 *
 * All arithmetic is promoted to double *before* accumulating (float
 * accumulation would diverge across engines and lose ~1e-5 precision), and
 * accumulation is sequential in array order — deterministic for the oracle.
 */
object VectorOps {

  /** Sequential-order dot product of two float/double array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to `scale` decimals so last-ulp accumulation
    * differences can never reorder a top-k ranking across engines/partitions. */
  def cosine(a: Column, b: Column, scale: Int = 4): Column =
    round(dot(a, b) / (norm(a) * norm(b)), scale)
}
