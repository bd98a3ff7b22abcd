package graft.functions

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `kinesis_shard(partitionKey, numShards)` → int: Kinesis shard routing as
  * a native codegen'd expression — MD5(partitionKey) read as an unsigned
  * 128-bit integer, mapped to `numShards` equal hash-key ranges (the
  * public Kinesis shard model, SURVEY.md §2.B B4).
  *
  * This replaces the per-row Scala UDF the sink used in round 2: an
  * Expression stays inside whole-stage codegen, shows up in `.explain`
  * output (the routing is plan-auditable, not hidden in a closure), and
  * carries no closure-serialization cost per task. Exactly equal to
  * `KinesisSink.shardFor` for every key — the KinesisSinkSpec law asserts
  * the expression against the reference implementation.
  */
case class KinesisShard(child: Expression, numShards: Int) extends UnaryExpression {
  require(numShards > 0, s"numShards must be positive, got $numShards")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kinesis_shard requires string, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "kinesis_shard"

  override def nullSafeEval(input: Any): Any =
    KinesisShard.route(input.asInstanceOf[UTF8String], numShards)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KinesisShard.route($c, $numShards)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KinesisShard {
  private val HashSpace = BigInteger.ONE.shiftLeft(128)
  // MessageDigest is not thread-safe and costs an allocation per
  // getInstance — one instance per executor thread, reset per row
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Called from generated code: shard = floor(md5(pk) · n / 2^128). */
  def route(pk: UTF8String, numShards: Int): Int = {
    val d = md5.get()
    d.reset()
    val h = new BigInteger(1, d.digest(pk.getBytes))
    h.multiply(BigInteger.valueOf(numShards)).divide(HashSpace).intValueExact()
  }
}
