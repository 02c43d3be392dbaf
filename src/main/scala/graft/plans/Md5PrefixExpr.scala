package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of the MD5 digest of a string, as LONG — bit-identical
  * to the builtin composition `conv(substring(md5(s), 1, 15), 16, 10)`
  * (15 lowercase hex chars parsed base-16), which is the engine's
  * portable token/shingle hash (mirrored in DuckDB as
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`).
  *
  * Why a custom Expression (same rationale as [[DotProductExpr]]): the
  * builtin chain materializes a 32-char hex UTF8String, substrings it,
  * and parses it back per evaluation — three allocations per shingle,
  * and signature computation evaluates it once per shingle per row
  * (dozens per document), mostly inside interpreted higher-order
  * lambdas where per-eval overhead multiplies. This expression goes
  * digest-bytes → long directly. A property test pins bit-equality to
  * the conv-based reference so the DuckDB mirror stays valid.
  */
case class Md5PrefixLongExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_prefix64 requires a string argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_md5_prefix64"

  override protected def nullSafeEval(s: Any): Any =
    Md5PrefixLongExpr.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Md5PrefixLongExpr.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixLongExpr = copy(child = newChild)
}

object Md5PrefixLongExpr {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** 60-bit big-endian prefix: bytes 0..6 in full plus the high nibble
    * of byte 7 — exactly the value of the first 15 hex characters.
    */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (bytes(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((bytes(7) & 0xf0L) >>> 4)
  }
}
