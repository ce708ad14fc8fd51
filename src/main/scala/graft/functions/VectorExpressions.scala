package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** JVM kernel for the vector expressions (see [[TextHashing]] for why:
  * zip_with/aggregate higher-order lambdas run interpreted per element). */
object VectorKernels {

  /** Sequential-order dot product, promoting each element to double BEFORE
    * multiply/accumulate — bit-identical to
    * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)`
    * and to DuckDB's `list_dot_product` over DOUBLE[]. */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)
}

/**
 * `vector_dot(a, b)`: sequential double dot product of two float/double
 * array columns. Null if either side is null. Semantics note: like the
 * zip_with formulation it replaces, length mismatch truncates to the
 * shorter side (zip_with pads with null -> null products are skipped by
 * the sum only when absent; the lake's embeddings are fixed-width so this
 * is unreachable there).
 */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private lazy val kernel: String = (elemType(left), elemType(right)) match {
    case (FloatType, FloatType) => "dotFF"
    case (DoubleType, DoubleType) => "dotDD"
    case (FloatType, DoubleType) => "dotFD"
    case _ => "dotDF"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dotFF" => VectorKernels.dotFF(x, y)
      case "dotDD" => VectorKernels.dotDD(x, y)
      case "dotFD" => VectorKernels.dotFD(x, y)
      case _ => VectorKernels.dotDF(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.$kernel($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
