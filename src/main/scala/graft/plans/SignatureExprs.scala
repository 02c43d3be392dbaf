package graft.plans

import graft.ops.DedupOps

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd signature kernels for the dedup chain.
  *
  * The builtin forms ([[DedupOps.minhashAllFold]] / [[DedupOps
  * .simhashFold]]) are `aggregate` higher-order functions whose lambdas
  * evaluate INTERPRETED and allocate a fresh accumulator array per
  * element — the same cost profile that motivated [[DotProductExpr]].
  * The signature chain feeds every dedup/curation query (q27-q31,
  * q75-q77, q79, q82), so these two kernels emit tight fused loops via
  * `doGenCode`: one pass over the hash array, K unrolled running minima
  * (MinHash) or a reused 32-slot bit-count buffer (SimHash).
  *
  * Both are property-pinned bit-identical to the builtin reference
  * forms (PropertySpec), which in turn mirror the DuckDB oracle SQL —
  * the chain of custody for hash-exactness.
  *
  * Null contract — matches the HOF forms on ALL inputs, not just the
  * engine's non-null domain: null array → null for both; a null
  * ELEMENT is skipped by MinHash (the HOF `least(acc, null)` leaves
  * the accumulator unchanged) but zeroes the whole SimHash signature
  * (the HOF accumulator turns null at the first null element and the
  * finish lambda's `when` then emits all-zero bits) — both pinned by
  * PropertySpec including null-element cases.
  */
object SignatureExprs {
  /** Arithmetic note: inputs are `pmod`-reduced to [0, P), coefficients
    * are ≤ ~1e6, so `h*a + b < 2^52` — no Long overflow anywhere, and
    * `x % P` is already non-negative (matching `pmod`).
    */
  val P: Long = DedupOps.P
}

/** `graft_minhash_all(array<long>) -> array<long>`: all K MinHash
  * permutation minima in one traversal. Empty array → K sentinels P.
  */
case class MinHashAllExpr(child: Expression) extends UnaryExpression {

  private val K = DedupOps.as.size

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_all requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_all"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = Array.fill(K)(SignatureExprs.P)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < K) {
          val v = (h * DedupOps.as(k) + DedupOps.bs(k)) % SignatureExprs.P
          val vp = if (v < 0) v + SignatureExprs.P else v
          if (vp < acc(k)) acc(k) = vp
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = SignatureExprs.P
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      // K unrolled mul-mod-min steps with the coefficients baked in as
      // literals — no per-row allocation except the output array
      val accDecls = (0 until K)
        .map(k => s"long $acc$k = ${p}L;").mkString("\n")
      val steps = (0 until K).map { k =>
        s"""$v = ($h * ${DedupOps.as(k)}L + ${DedupOps.bs(k)}L) % ${p}L;
           if ($v < 0) $v += ${p}L;
           if ($v < $acc$k) $acc$k = $v;"""
      }.mkString("\n")
      val out = (0 until K).map(k => s"$acc$k").mkString(", ")
      s"""
        int $n = $a.numElements();
        $accDecls
        long $v;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            long $h = $a.getLong($i);
            $steps
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          new long[]{$out});
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashAllExpr = copy(child = newChild)
}

/** `graft_simhash(array<long>) -> long`: 32-bit SimHash — bit j set iff
  * more than half the (non-null) hashes have bit j set. Empty → 0.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L // fold contract: null poisons → 0
      val h = arr.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += ((h >> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (2L * counts(j) > n) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the 32-slot count buffer is per-operator mutable state (codegen
      // objects are single-threaded per task) — zeroed per row, never
      // re-allocated
      val counts = ctx.addMutableState("int[]", "graftSimhashCounts",
        v => s"$v = new int[32];")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val sawNull = ctx.freshName("sawNull")
      s"""
        int $n = $a.numElements();
        java.util.Arrays.fill($counts, 0);
        boolean $sawNull = false;
        for (int $i = 0; $i < $n && !$sawNull; $i++) {
          if ($a.isNullAt($i)) {
            $sawNull = true; // fold contract: null poisons -> 0
          } else {
            long $h = $a.getLong($i);
            for (int $j = 0; $j < 32; $j++) {
              $counts[$j] += (int) (($h >> $j) & 1L);
            }
          }
        }
        long $sig = 0L;
        if (!$sawNull) {
          for (int $j = 0; $j < 32; $j++) {
            if (2L * $counts[$j] > $n) $sig |= 1L << $j;
          }
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpr = copy(child = newChild)
}
