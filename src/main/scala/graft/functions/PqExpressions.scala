package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (SURVEY.md §2.F F23). A PQ codebook is
  * `m` subspace codebooks of `ksub` codewords each, flattened row-major
  * into one `float[]` of `m·ksub·dsub` entries (`dsub = dim / m`); it is
  * driver-held model state (KBs — e.g. 8·256·8 floats = 64 KB at dim 64)
  * passed to these expressions as a foldable array literal, carried into
  * generated code as a reference object — never inlined in Java source,
  * never shuffled.
  *
  * The shared static helpers are called from BOTH `nullSafeEval` and the
  * generated code, so interpreted and codegen paths cannot drift.
  */
object PqOps {

  private def dsubOf(cb: Array[Float], m: Int, ksub: Int): Int = {
    val d = cb.length / (m * ksub)
    require(d * m * ksub == cb.length,
      s"codebook length ${cb.length} is not divisible by m*ksub = ${m * ksub}")
    d
  }

  /** Nearest-codeword encoding: for each subspace j, the index (0-based,
    * < ksub ≤ 256) of the codeword minimizing squared L2 distance to the
    * vector's j-th slice; ties break to the LOWEST index (strict `<`
    * keeps the first minimum). One byte per subspace — the 4·dim → m
    * compression that makes a 100 TB corpus scan m/(4·dim) of the bytes.
    */
  def encode(arr: ArrayData, cb: Array[Float], m: Int, ksub: Int): Array[Byte] = {
    val dsub = dsubOf(cb, m, ksub)
    require(arr.numElements() == m * dsub,
      s"pq_encode: vector dim ${arr.numElements()} != m*dsub = ${m * dsub}")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * ksub * dsub
      val xOff = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = base + c * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = arr.getFloat(xOff + i).toDouble - cb(off + i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** Asymmetric distance: Σ_j ⟨q_subj, codeword(j, codes[j])⟩ — the inner
    * product of the raw query against the candidate's RECONSTRUCTION,
    * computed from the m-byte codes without ever materializing it. When
    * the codes encode L2-normalized vectors and `q` is normalized too,
    * this approximates cosine directly. Accumulates in double,
    * sequentially by dimension, like fvec_dot.
    *
    * Scale note: per-pair cost is m·dsub = dim multiply-adds — the same
    * FLOPs as an exact dot. [[lut]]/[[adcLut]] are the serving-path pair
    * (m lookups per candidate, the classic amortization, carried into
    * the join as a per-query LUT column joined by q_id); this direct
    * form remains for one-off scoring where building a LUT per query
    * row would not amortize.
    */
  def adc(q: ArrayData, codes: Array[Byte], cb: Array[Float], m: Int, ksub: Int): Double = {
    require(codes.length == m, s"pq_adc: codes length ${codes.length} != m = $m")
    val dsub = dsubOf(cb, m, ksub)
    require(q.numElements() == m * dsub,
      s"pq_adc: query dim ${q.numElements()} != m*dsub = ${m * dsub}")
    var acc = 0.0
    var j = 0
    while (j < m) {
      val off = (j * ksub + (codes(j) & 0xff)) * dsub
      val xOff = j * dsub
      var i = 0
      while (i < dsub) {
        acc += q.getFloat(xOff + i).toDouble * cb(off + i).toDouble
        i += 1
      }
      j += 1
    }
    acc
  }

  /** Per-query ADC lookup table: lut[j·ksub + c] = ⟨q_subj, codeword(j,c)⟩,
    * each entry accumulated in double sequentially by dimension. Built
    * ONCE per query row (ksub·dim multiply-adds — trivial against the
    * candidate scan it amortizes), it turns every candidate's asymmetric
    * distance into m table lookups ([[adcLut]]) instead of dim
    * multiply-adds — the classic PQ serving trick (Jégou et al. 2011
    * §IV-A), carried into the join DECLARATIVELY: the LUT is a column on
    * a per-query frame the candidate join picks up by q_id, so the
    * streaming side still reads only the m-byte codes.
    */
  def lut(q: ArrayData, cb: Array[Float], m: Int, ksub: Int): ArrayData = {
    val dsub = dsubOf(cb, m, ksub)
    require(q.numElements() == m * dsub,
      s"pq_lut: query dim ${q.numElements()} != m*dsub = ${m * dsub}")
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val xOff = j * dsub
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          acc += q.getFloat(xOff + i).toDouble * cb(off + i).toDouble
          i += 1
        }
        out(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** LUT-amortized asymmetric distance: Σ_j lut[j·ksub + codes[j]] — m
    * array loads + adds per candidate. Equal to [[adc]] up to double
    * reassociation (per-subspace partials are each exact-order; the
    * outer sum associates by subspace instead of by dimension).
    */
  def adcLut(lut: ArrayData, codes: Array[Byte], ksub: Int): Double = {
    val m = codes.length
    require(lut.numElements() == m * ksub,
      s"pq_adc_lut: lut length ${lut.numElements()} != m*ksub = ${m * ksub}")
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += lut.getDouble(j * ksub + (codes(j) & 0xff))
      j += 1
    }
    acc
  }

  /** Reconstruct the codeword concatenation — test/debug helper. */
  def decode(codes: Array[Byte], cb: Array[Float], m: Int, ksub: Int): Array[Float] = {
    val dsub = dsubOf(cb, m, ksub)
    val out = new Array[Float](m * dsub)
    var j = 0
    while (j < m) {
      System.arraycopy(cb, (j * ksub + (codes(j) & 0xff)) * dsub, out, j * dsub, dsub)
      j += 1
    }
    out
  }
}

/** `pq_encode(nemb, codebook, m, ksub)` → binary: m-byte nearest-codeword
  * code of a float vector. The codebook/m/ksub arrive as FOLDABLE
  * literals (evaluated once at registration-call time, like minhash_sig's
  * k/seed) and live in the expression instance, referenced from generated
  * code via `addReferenceObj`.
  */
case class PqEncode(child: Expression, codebook: Array[Float], m: Int, ksub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got ${t.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqOps.encode(input.asInstanceOf[ArrayData], codebook, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqOps.encode($c, $cbRef, $m, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc(q_emb, codes, codebook, m, ksub)` → double: asymmetric
  * distance (inner product vs the coded reconstruction). See [[PqOps.adc]].
  */
/** `pq_lut(nemb, codebook, m, ksub)` → array<double>: the per-query ADC
  * lookup table of m·ksub codeword partial dots. See [[PqOps.lut]].
  */
case class PqLut(child: Expression, codebook: Array[Float], m: Int, ksub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_lut requires array<float>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any =
    PqOps.lut(input.asInstanceOf[ArrayData], codebook, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqOps.lut($c, $cbRef, $m, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc_lut(lut, codes, ksub)` → double: LUT-amortized asymmetric
  * distance — m lookups + adds per candidate. See [[PqOps.adcLut]].
  */
case class PqAdcLut(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_lut requires (array<double>, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_lut"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqOps.adcLut(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) => s"graft.functions.PqOps.adcLut($l, $c, $ksub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class PqAdc(left: Expression, right: Expression,
    codebook: Array[Float], m: Int, ksub: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<float>, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqOps.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]], codebook, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    defineCodeGen(ctx, ev, (q, c) => s"graft.functions.PqOps.adc($q, $c, $cbRef, $m, $ksub)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
