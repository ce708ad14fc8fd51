package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * JVM kernels for the text-dedup expressions.
 *
 * Rationale: the pure-SQL formulation (transform/aggregate higher-order
 * functions over the shingle array) is semantically right but its lambdas are
 * interpreted per element (~10µs/el) and CollapseProject re-inlines the array
 * into every downstream reference, multiplying the work. A custom Catalyst
 * expression computes the whole per-document signature in ONE call — a tight
 * JVM loop — and stays inside WholeStageCodegen via doGenCode static calls.
 *
 * Portability contract (must match the DuckDB oracle CTEs in
 * [[graft.ops.TextOps.duckPairsCtes]] bit-for-bit):
 *   - tokens: split on single space, trailing empties kept (= Spark
 *     `split(text, ' ')` = DuckDB `string_split(text, ' ')`);
 *   - shingle: 3 consecutive tokens joined with single spaces;
 *   - base hash h32: first 8 hex nibbles of md5(shingle) as unsigned int
 *     (= first 4 digest bytes big-endian);
 *   - permutation i: (h32 * A(i) + B(i)) mod P, exact int64 arithmetic;
 *   - band j signature: mh(2j)*P + mh(2j+1)  (< 1.1e18, fits int64).
 */
object TextHashing {

  val P = 1000000007L
  val A: Array[Long] = Array(131L, 137L, 139L, 149L, 151L, 157L, 163L, 167L)
  val B: Array[Long] = Array(17L, 1000033L, 2000083L, 3000017L,
    4000037L, 5000011L, 6000011L, 7000003L)

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def h32(s: String): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }

  /** Packed LSH band signatures for one document, or null if it has no
    * trigram shingles. Called from generated code — keep signature stable. */
  def minhashBands(text: UTF8String, numHashes: Int, rowsPerBand: Int): ArrayData = {
    if (text == null) return null
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return null
    val k = numHashes
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i + 2 < toks.length) {
      val h = h32(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      var j = 0
      while (j < k) {
        val v = (h * A(j) + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val nBands = k / rowsPerBand
    val sigs = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      sigs(b) = mins(2 * b) * P + mins(2 * b + 1)
      b += 1
    }
    ArrayData.toArrayData(sigs)
  }

  /** h32 of every trigram shingle of the document, in order (empty when the
    * document is shorter than one shingle). Called from generated code. */
  def trigramHashes(text: UTF8String): ArrayData = {
    if (text == null) return null
    val toks = text.toString.split(" ", -1)
    val n = math.max(toks.length - 2, 0)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = h32(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /**
   * Single-pass twin of the normalize regex chain
   * `trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' +', ' '))`:
   * lowercase via UTF8String.toLowerCase (the SAME routine Spark's `lower()`
   * uses, so case mapping is bit-identical), keep [a-z0-9], and emit a
   * single separating space between kept runs (dropping non-alnum chars
   * first and THEN collapsing spaces is exactly what the two regexes do).
   */
  def normalizeText(text: UTF8String): UTF8String = {
    if (text == null) return null
    val s = text.toLowerCase.toString
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      } else if (c == ' ') {
        pendingSpace = true
      }
      // any other char is dropped, joining its neighbors (no space)
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** 31-ary rolling hash over per-token 16-bit md5 prefixes mod P — the
    * kernel twin of text_fingerprint_rolling's HOF/oracle formulation:
    * fold (acc*31 + h16(tok)) % P from acc=0 over the whitespace tokens. */
  def rollingFingerprint(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val d = md5.get()
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      d.reset()
      val dig = d.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h16 = ((dig(0) & 0xffL) << 8) | (dig(1) & 0xffL)
      acc = (acc * 31 + h16) % P
      i += 1
    }
    acc
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex32(dig: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((dig(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(dig(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** DISTINCT md5-hex hashes of every 8-token span of the document, in
    * first-occurrence order — the one-pass JVM twin of
    * `array_distinct(transform(sequence(1, size(t)-7), i ->
    *    md5(concat_ws(' ', slice(t, i, 8)))))` over `t = split(text, ' ')`.
    * The HOF formulation is interpreted per span (~µs/span: md5 + concat +
    * slice allocation each through the lambda interpreter); this kernel runs
    * the whole document in one tight loop and stays codegen-friendly.
    * Empty array when the document has fewer than 8 tokens (explode then
    * yields no rows — exactly what the `size(t) >= 8` pre-filter produced).
    * Called from generated code — keep signature stable. */
  def spanHashes8(text: UTF8String): ArrayData = {
    if (text == null) return null
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 8) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    val d = md5.get()
    var i = 0
    while (i + 7 < n) {
      sb.setLength(0)
      var j = i
      while (j < i + 8) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      d.reset()
      seen.add(hex32(d.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      i += 1
    }
    val out = new Array[Any](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** 1-based token positions where `toks(pos) == first` and
    * `toks(pos+1) == second` (positions into `split(text, ' ')`) — the
    * one-pass twin of `filter(sequence(1, size(tk)-1), i ->
    *    element_at(tk,i) = first AND element_at(tk,i+1) = second)`.
    * That HOF re-evaluates `split(text)` INSIDE the lambda for every
    * sequence element (Catalyst does not CSE under LambdaFunction), an
    * O(tokens²) scan per document; this kernel splits once and scans once.
    * Empty array for documents with fewer than 2 tokens. */
  def phrasePositions(text: UTF8String, first: String, second: String): ArrayData = {
    if (text == null) return null
    val toks = text.toString.split(" ", -1)
    var cnt = 0
    var i = 0
    while (i < toks.length - 1) {
      if (toks(i) == first && toks(i + 1) == second) cnt += 1
      i += 1
    }
    val out = new Array[Int](cnt)
    var k = 0
    i = 0
    while (i < toks.length - 1) {
      if (toks(i) == first && toks(i + 1) == second) { out(k) = i + 1; k += 1 }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Space-joined adjacent token bigrams ("tok_i tok_{i+1}") in document
    * order, duplicates kept — the one-pass JVM twin of
    * `transform(sequence(1, size(tk)-1), i ->
    *    concat_ws(' ', element_at(tk,i), element_at(tk,i+1)))` over
    * `tk = split(text, ' ')`. The HOF formulation is interpreted per
    * element with element_at re-walking the array; this splits once and
    * builds every bigram in one loop. Empty array below 2 tokens (the
    * `size(tk) >= 2` guard's empty-array branch, for free).
    * Called from generated code — keep signature stable. */
  def adjacentBigrams(text: UTF8String): ArrayData = {
    if (text == null) return null
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      val sb = new java.lang.StringBuilder(toks(i).length + 1 + toks(i + 1).length)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Count of the most-repeated adjacent token bigram in the document
    * (0 when fewer than 2 tokens) — the numerator of the repetition
    * quality rule (Rae et al., "Scaling Language Models" §A1.1 style:
    * heavily repeated n-grams flag boilerplate/spam): one JVM hash-count
    * pass per document, no explode, no shuffle. */
  def topBigramCount(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 2) return 0L
    val m = new java.util.HashMap[String, Integer]()
    var best = 0
    var i = 0
    while (i < toks.length - 1) {
      val c = m.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum(_, _))
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  /** 60-bit SimHash: per distinct token, md5; per bit b in 0..59, vote
    * +1/-1 on hex-nibble bit (nibble b/4, bit 3-b%4); set b iff votes > 0.
    * Matches the nested-HOF/oracle formulation exactly. */
  def simhash60(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](60)
    val d = md5.get()
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        d.reset()
        val dig = d.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < 60) {
          val nib = b / 4
          val byte = dig(nib / 2)
          val nibVal = if (nib % 2 == 0) (byte >> 4) & 0xf else byte & 0xf
          val bitVal = (nibVal >> (3 - b % 4)) & 1
          votes(b) += 2 * bitVal - 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

/**
 * `minhash_bands(text)`: array of `numHashes/rowsPerBand` packed int64 LSH
 * band signatures of the document's trigram-shingle MinHash sketch; NULL for
 * documents with no shingles (so band equi-joins skip them).
 */
case class MinHashBands(child: Expression, numHashes: Int = 8, rowsPerBand: Int = 2)
    extends UnaryExpression {
  require(numHashes % rowsPerBand == 0 && rowsPerBand == 2,
    "band packing assumes pairs of minhashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    TextHashing.minhashBands(input.asInstanceOf[UTF8String], numHashes, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextHashing.minhashBands($c, $numHashes, $rowsPerBand);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** `trigram_hashes(text)`: h32 of each trigram shingle, in document order. */
case class TrigramHashes(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_hashes"

  override def nullSafeEval(input: Any): Any =
    TextHashing.trigramHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.trigramHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): TrigramHashes =
    copy(child = newChild)
}

/** `normalize_text(text)`: single-pass lowercase + [a-z0-9] filter +
  * space-collapse + trim (see TextHashing.normalizeText for the regex-chain
  * equivalence argument). */
case class NormalizeText(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = child.dataType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    TextHashing.normalizeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.normalizeText($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** `rolling_fingerprint(text)`: 31-ary rolling hash of md5-16bit token
  * prefixes mod 1e9+7 (document fingerprint). */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(input: Any): Any =
    TextHashing.rollingFingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.rollingFingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** `top_bigram_count(text)`: occurrences of the document's most-repeated
  * adjacent token bigram (repetition-quality numerator). */
case class TopBigramCount(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "top_bigram_count"

  override def nullSafeEval(input: Any): Any =
    TextHashing.topBigramCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.topBigramCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TopBigramCount =
    copy(child = newChild)
}

/** `span_hashes8(text)`: distinct md5-hex hashes of every 8-token span, in
  * first-occurrence order; empty array below 8 tokens (see
  * TextHashing.spanHashes8 for the HOF-formulation equivalence). */
case class SpanHashes8(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "span_hashes8"

  override def nullSafeEval(input: Any): Any =
    TextHashing.spanHashes8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.spanHashes8($c)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes8 =
    copy(child = newChild)
}

/** `phrase_positions(text, first, second)`: 1-based positions of exact
  * adjacent-token phrase matches (see TextHashing.phrasePositions). */
case class PhrasePositions(child: Expression, first: String, second: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "phrase_positions"

  override def nullSafeEval(input: Any): Any =
    TextHashing.phrasePositions(input.asInstanceOf[UTF8String], first, second)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("first", first, "java.lang.String")
    val s = ctx.addReferenceObj("second", second, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.phrasePositions($c, $f, $s)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhrasePositions =
    copy(child = newChild)
}

/** `adjacent_bigrams(text)`: space-joined adjacent token bigrams in
  * document order, duplicates kept (see TextHashing.adjacentBigrams). */
case class AdjacentBigrams(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "adjacent_bigrams"

  override def nullSafeEval(input: Any): Any =
    TextHashing.adjacentBigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.adjacentBigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): AdjacentBigrams =
    copy(child = newChild)
}

/** `simhash60(text)`: 60-bit majority-vote SimHash over distinct tokens. */
case class SimHash60(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    TextHashing.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
