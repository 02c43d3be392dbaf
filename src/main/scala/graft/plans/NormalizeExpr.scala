package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, `java.text.Normalizer.Form.NFC`) as a codegen'd
  * expression — `graft_nfc(s)`.
  *
  * Why it exists: dedup and fingerprinting hash BYTES, and the same
  * visible text has multiple byte encodings (`é` as U+00E9 vs
  * `e`+U+0301). A crawl mixes both, so near-identical documents hash
  * apart and every downstream exact/MinHash/SimHash signature silently
  * under-deduplicates. Normalizing to NFC at ingest makes all later
  * content hashing canonical. Spark has no builtin for this; a Scala
  * UDF would force serialization in the hot ingest path, so this is a
  * native `Expression` with `doGenCode` like [[Md5PrefixLongExpr]].
  *
  * The fast path: `Normalizer.isNormalized` is O(n) with no
  * allocation, and real-world corpora are overwhelmingly already-NFC —
  * those rows return the input UTF8String untouched.
  *
  * Oracle mirror: DuckDB's `nfc_normalize(s)` — same Unicode canonical
  * composition, hash-checked end-to-end by q154.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalizeExpr.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}

object NfcNormalizeExpr {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
