package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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
 * Random-hyperplane (SimHash-for-vectors) LSH family for cosine near-dup
 * bucketing: `Planes = Bands * BitsPerBand` fixed ±1 (Rademacher)
 * hyperplanes drawn once from a seeded PRNG. Bit h of a vector's sketch is
 * `dot(emb, plane_h) >= 0`; bits pack `BitsPerBand` at a time into int64
 * band signatures, and vectors colliding on any (band, sig) are candidate
 * pairs — two similar vectors agree on a bit with probability 1 - theta/pi.
 *
 * Portability contract (must match the DuckDB oracle CTEs in
 * [[graft.ops.VectorOps.duckLshCtes]] bit-for-bit): the oracle embeds THE
 * SAME sign matrix as literal DOUBLE[] lists, and both engines compute the
 * dot sequentially in index order with a double accumulator (exactly like
 * [[VectorKernels.dotFF]] vs `list_dot_product`), so every signature is
 * bit-identical.
 */
object HyperplaneLsh {

  val Dim = 64
  /** Catalog defaults; callers scale `bitsPerBand` up with corpus size (the
    * random-pair collision rate per band is 2^-bits, so bits ~ log2(n)
    * keeps total candidate volume near-linear in n — see the SCALE.md sweep
    * of `dedup_embedding_cosine` for the fixed-parameter growth curve). */
  val Bands = 12
  val BitsPerBand = 8

  /** ±1.0 hyperplane components, row-major from a fixed java.util.Random
    * seed (the LCG is spec-pinned, so regeneration is deterministic on any
    * JVM — and the oracle SQL embeds these very values as literals). The
    * stream is a fixed infinite family: the first `n` planes are identical
    * for every parameterization, so widening bands/bits only APPENDS
    * planes, never re-keys existing buckets. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  def signsFor(planes: Int): Array[Array[Double]] =
    signCache.computeIfAbsent(planes, { n =>
      val rnd = new java.util.Random(20240801L)
      Array.fill(n)(Array.fill(Dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
    })

  /** The default family (catalog + oracle embedding). */
  def signs: Array[Array[Double]] = signsFor(Bands * BitsPerBand)

  /** Packed band signatures of one embedding; truncates to `Dim` components
    * like the oracle's fixed-width planes. Called from generated code. */
  def bandsF(emb: ArrayData, bands: Int, bitsPerBand: Int): ArrayData = {
    if (emb == null) return null
    val planes = bands * bitsPerBand
    val ss = signsFor(planes)
    val n = math.min(emb.numElements(), Dim)
    val sigs = new Array[Long](bands)
    var h = 0
    while (h < planes) {
      val s = ss(h)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += emb.getFloat(i).toDouble * s(i); i += 1 }
      if (acc >= 0) sigs(h / bitsPerBand) |= 1L << (h % bitsPerBand)
      h += 1
    }
    ArrayData.toArrayData(sigs)
  }

  def bandsD(emb: ArrayData, bands: Int, bitsPerBand: Int): ArrayData = {
    if (emb == null) return null
    val planes = bands * bitsPerBand
    val ss = signsFor(planes)
    val n = math.min(emb.numElements(), Dim)
    val sigs = new Array[Long](bands)
    var h = 0
    while (h < planes) {
      val s = ss(h)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += emb.getDouble(i) * s(i); i += 1 }
      if (acc >= 0) sigs(h / bitsPerBand) |= 1L << (h % bitsPerBand)
      h += 1
    }
    ArrayData.toArrayData(sigs)
  }
}

/**
 * `hyperplane_bands(emb, bands, bitsPerBand)`: array of `bands` packed
 * int64 random-hyperplane band signatures of a float/double embedding
 * column; NULL in, NULL out. `bitsPerBand` is the scale dial: each band's
 * random-pair collision rate is 2^-bitsPerBand, so scale it ~log2(corpus)
 * to keep candidate volume near-linear; raise `bands` to buy back recall.
 */
case class HyperplaneBands(child: Expression,
                           bands: Int = HyperplaneLsh.Bands,
                           bitsPerBand: Int = HyperplaneLsh.BitsPerBand)
    extends UnaryExpression {
  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 63,
    "band signatures pack bitsPerBand bits into an int64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> column, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  private lazy val kernel: String = child.dataType match {
    case ArrayType(FloatType, _) => "bandsF"
    case _ => "bandsD"
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (kernel == "bandsF") HyperplaneLsh.bandsF(a, bands, bitsPerBand)
    else HyperplaneLsh.bandsD(a, bands, bitsPerBand)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneLsh.$kernel($c, $bands, $bitsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
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

/**
 * Sign-random-projection (Charikar 2002 / Johnson-Lindenstrauss) matrix +
 * kernel: project a `srcDims`-dim embedding to `rpDims` coordinates through
 * a frozen ±1 matrix. The matrix is a PUBLIC deterministic rule —
 * s(j,i) = +1 iff the low bit of MD5("rp_<j>_<i>")[0] is 0 — so any engine
 * (and the DuckDB oracle, which embeds the same values as literals) can
 * regenerate it.
 *
 * Portability contract: each projected coordinate is the fixed
 * LEFT-TO-RIGHT chain (((e₀·s₀) + e₁·s₁) + …) with every element promoted
 * to double BEFORE the multiply — bit-identical to the column-expression
 * formulation `element_at(emb, i+1).cast(double) * lit(s)` reduced with
 * `+`, and to the oracle's literal `emb[1]*s1 + emb[2]*s2 + …` chain. The
 * kernel exists because that column formulation is a rpDims×srcDims-term
 * Catalyst tree (1024 nodes at the catalog dial) whose codegen dominated
 * the query's wall time; this compiles to one tight loop instead.
 */
object SignRp {

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** ±1.0 matrix rows for (rpDims, srcDims), memoized. */
  def signsFor(rpDims: Int, srcDims: Int): Array[Array[Double]] =
    signCache.computeIfAbsent((rpDims, srcDims), { case (rd, sd) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(rd, sd) { (j, i) =>
        val d = md.digest(s"rp_${j}_$i".getBytes("UTF-8"))
        if ((d(0) & 1) == 0) 1.0 else -1.0
      }
    })

  // Input contract (enforced, not assumed): exactly srcDims elements, none
  // null. The chained element_at formulation this kernel replaced would
  // quietly propagate NULL through a short/holey embedding; silently
  // truncating (or reading an undefined null slot) would instead produce a
  // WRONG projection, and the output type advertises containsNull=false —
  // so malformed input fails fast with a row-locatable message. One O(n)
  // pre-pass per row, negligible against the rpDims×srcDims multiply loop.
  private def validate(emb: ArrayData, srcDims: Int): Unit = {
    val n = emb.numElements()
    if (n != srcDims) throw new IllegalArgumentException(
      s"sign_rp_project: embedding has $n elements, expected $srcDims")
    var i = 0
    while (i < n) {
      if (emb.isNullAt(i)) throw new IllegalArgumentException(
        s"sign_rp_project: null element at index $i (embedding must be " +
          "a non-null fixed-width array)")
      i += 1
    }
  }

  /** Called from generated code: float-array input. */
  def projectF(emb: ArrayData, rpDims: Int, srcDims: Int): ArrayData = {
    if (emb == null) return null
    validate(emb, srcDims)
    val ss = signsFor(rpDims, srcDims)
    val out = new Array[Double](rpDims)
    var j = 0
    while (j < rpDims) {
      val s = ss(j)
      // left-to-right: seed with the FIRST product, += the rest — exactly
      // reduceLeft(+) over the per-element products (0.0-seeded folds can
      // differ on signed zeros)
      var acc = emb.getFloat(0).toDouble * s(0)
      var i = 1
      while (i < srcDims) { acc += emb.getFloat(i).toDouble * s(i); i += 1 }
      out(j) = acc
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Called from generated code: double-array input. */
  def projectD(emb: ArrayData, rpDims: Int, srcDims: Int): ArrayData = {
    if (emb == null) return null
    validate(emb, srcDims)
    val ss = signsFor(rpDims, srcDims)
    val out = new Array[Double](rpDims)
    var j = 0
    while (j < rpDims) {
      val s = ss(j)
      var acc = emb.getDouble(0) * s(0)
      var i = 1
      while (i < srcDims) { acc += emb.getDouble(i) * s(i); i += 1 }
      out(j) = acc
      j += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `sign_rp_project(emb)`: the [[SignRp]] projection as one codegen call. */
case class SignRpProject(child: Expression, rpDims: Int, srcDims: Int)
    extends UnaryExpression {
  require(rpDims > 0 && srcDims > 0,
    s"sign_rp_project dims must be positive, got rpDims=$rpDims srcDims=$srcDims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> column, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sign_rp_project"

  private lazy val kernel: String = child.dataType match {
    case ArrayType(FloatType, _) => "projectF"
    case _ => "projectD"
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (kernel == "projectF") SignRp.projectF(a, rpDims, srcDims)
    else SignRp.projectD(a, rpDims, srcDims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignRp.$kernel($c, $rpDims, $srcDims)")

  override protected def withNewChildInternal(newChild: Expression): SignRpProject =
    copy(child = newChild)
}
