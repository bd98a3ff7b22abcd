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
    * Honest scale note: per-pair cost is m·dsub = dim multiply-adds —
    * the same FLOPs as an exact dot; PQ's win in this join shape is the
    * MEMORY/SCAN side (m bytes read per candidate instead of 4·dim).
    * The classic per-query LUT amortization (m table lookups per pair)
    * needs candidates batched per query, which a streaming hash join
    * does not provide — candidates arrive grouped by corpus row.
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
