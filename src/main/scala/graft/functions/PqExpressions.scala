package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Product-quantization reconstruction as ONE map-side codegen kernel:
 * per contiguous subspace, L2-argmin the input against the baked-in
 * codebooks and emit the winning codeword's subvector — i.e.
 * recon(v) = concat_m cents(m)(argmin_k round(Σ(v_sub − c)², 6)).
 *
 * This replaces the explode(m) → broadcast-join(codebook) →
 * min(struct) HASH AGGREGATE formulation the PQ catalog rows used —
 * which shuffled n×M rows per encode — with a zero-shuffle projection
 * fused into the scan: at 100 TB the encode stage stops being an
 * exchange entirely. The codebooks are M·K·subDim doubles (16 KB at the
 * catalog dials, ≤1 MB at production M=64/K=256) baked into the plan as
 * a reference object, the same weight class as a broadcast literal.
 *
 * Parity contract (spec-pinned bitwise in PqReconSpec, and oracle-pinned
 * by ann_cosine_topk_pq / ann_pq_seeded / ann_ivf_pq): the subspace
 * distance is the IDENTICAL left-to-right fold Σ(x−y)² seeded at 0.0,
 * rounded via scala BigDecimal(d).setScale(6, HALF_UP) — exactly Spark's
 * `round(_, 6)` on DoubleType — and ties take the LOWEST code (strict <
 * while scanning codes ascending), matching the min(struct(d, code))
 * lexicographic rule and the DuckDB twin's ORDER BY d, code.
 *
 * Input contract (enforced): a non-null array<double> of exactly
 * M·subDim elements with no null slots — same fail-fast discipline as
 * [[SignRp]] (the output type advertises containsNull=false, so a wrong
 * projection is worse than a loud error). NULL rows propagate NULL.
 */
object PqKernels {

  def recon(emb: ArrayData, cents: Array[Array[Array[Double]]]): ArrayData = {
    if (emb == null) return null
    val m = cents.length
    val k = cents(0).length
    val subDim = cents(0)(0).length
    val dim = m * subDim
    val n = emb.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"pq_recon: embedding has $n elements, expected $dim")
    var i = 0
    while (i < n) {
      if (emb.isNullAt(i)) throw new IllegalArgumentException(
        s"pq_recon: null element at index $i")
      i += 1
    }
    val out = new Array[Double](dim)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val c = cents(mi)(ki)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = emb.getDouble(mi * subDim + j) - c(j)
          d += diff * diff
          j += 1
        }
        // Spark round(_, 6) on DoubleType: decimal-string BigDecimal,
        // HALF_UP — reproduced exactly so ties land where the oracle's do
        val dr = BigDecimal(d)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (dr < bestD) { bestD = dr; best = ki } // strict <: lowest code wins ties
        ki += 1
      }
      System.arraycopy(cents(mi)(best), 0, out, mi * subDim, subDim)
      mi += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `pq_recon(emb_d)`: [[PqKernels.recon]] against plan-baked codebooks. */
case class PqRecon(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(cents.nonEmpty && cents(0).nonEmpty && cents(0)(0).nonEmpty,
    "pq_recon needs non-empty codebooks")

  // The synthesized case-class equals/hashCode compare the `cents` array
  // by REFERENCE, so two semantically identical pq_recon expressions never
  // canonicalize equal and Catalyst's common-subexpression elimination
  // misses the dedup. Compare the codebooks structurally (deep hash cached
  // once — the array is plan-baked and never mutated).
  private lazy val centsHash: Int =
    java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])
  override def equals(other: Any): Boolean = other match {
    case PqRecon(c, cs) =>
      child == c && java.util.Arrays.deepEquals(
        cents.asInstanceOf[Array[AnyRef]], cs.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + centsHash

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> column, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_recon"

  override def nullSafeEval(input: Any): Any =
    PqKernels.recon(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", cents, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.recon($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqRecon =
    copy(child = newChild)
}
