package graft

import graft.core.GraftSession
import graft.ops.{IndexStore, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine's ONE count-scaled key-space rule
  * ([[graft.ops.IndexStore.scaledBitsRow]]) and its 16-bit ceiling —
  * the retirement of the fixed-resolution hazard class (shingle
  * universes, pHash spaces, band keys, the q34 bucket, the q30
  * simhash bands — each caught saturating on a 10× scale step before
  * it was migrated to this rule):
  *   1. resolution GROWS with the corpus, past the old 8-bit cap, up
  *      to 16 bits (≈2M rows per 32-expected-occupancy key space —
  *      two decades beyond the shipped corpora, where 8 bits bought
  *      one);
  *   2. the 16-bit stacked sign keys are BACKWARD-COMPATIBLE: masked
  *      to ≤ 8 bits they reproduce the historical 8-bit keys
  *      bit-for-bit (so every shipped-SF gate result is unchanged by
  *      the ceiling raise);
  *   3. actual bucket occupancy under the rule stays bounded across a
  *      4× corpus step (the KnnGraphSpec flatness claim, applied to
  *      the q34-shape bucket).
  */
class KeySpaceScalingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def rOf(n: Long, divisor: Int, lo: Int): Int =
    IndexStore.scaledBitsRow(spark.range(n).toDF("id"), divisor, lo, "r")
      .head().getInt(0)

  test("scaledBitsRow: floor at small n, grows past 8, ceils at 16") {
    // shipped SFs (the values every gate mirror derives identically)
    assert(rOf(500, 32, 8) === 8)    // q34/q30 floor at sf0.001/0.01
    assert(rOf(2000, 32, 8) === 8)   // q34 at sf0.1 — still the floor
    assert(rOf(2000, 32, 4) === 6)   // semantic bands at sf0.1
    assert(rOf(5000, 32, 8) === 8)   // q30 at sf0.1 (bitlen(156) = 8)
    // the synthetic-sf1 regime the full-pack sweep probes
    assert(rOf(20000, 32, 4) === 10) // semantic bands at sf1
    assert(rOf(50000, 32, 8) === 11) // q30 at sf1
    // 100×-scale counts: past the OLD 8-bit cap, bounded by the new 16
    assert(rOf(200000, 32, 8) === 13)
    assert(rOf(2000000, 32, 8) === 16)
    assert(rOf(100000000L, 32, 8) === 16) // hard ceiling
    // the kNN cell rule (divisor 64, floor 3) through the same helper
    assert(IndexStore.scaledKRow(spark.range(2000).toDF("id"))
      .head().getInt(0) === 5)
    assert(IndexStore.scaledKRow(spark.range(20000).toDF("id"))
      .head().getInt(0) === 9) // past the old cap at sf1
  }

  /** Deterministic pseudo-random unit-ish vectors (no RNG — xxhash64
    * is seed-stable): enough entropy that sign buckets spread.
    */
  private def synthVecs(n: Long, dim: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (pmod(xxhash64(col("id"), j), lit(97L)) - 48L).cast("double") / 48.0)
        .as("v"))

  test("sqrt-cell rule: cells track sqrt(n); probe rule tracks log; " +
      "PQ budget tracks the count bands") {
    def bitsOf(n: Long): Int =
      IndexStore.bitLenRow(spark.range(n).toDF("id"), "b")
        .head().getInt(0)
    // bitLenRow = ceil(log2 n) for n >= 2
    assert(bitsOf(500) === 9 && bitsOf(2000) === 11 &&
      bitsOf(20000) === 15)
    // k1 = exact integer 4th root of 2^bits → cells = k1² ∈ [√n, ~2.9√n)
    for ((n, k1) <- Seq(500L -> 5, 2000L -> 7, 20000L -> 14,
        10000000L -> 64, 10000000000L -> 363)) {
      val bits = (BigInt(n) - 1).bitLength
      val got = IndexStore.sqrtCellK1(bits, 4)
      assert(got === k1, s"n=$n k1=$got != $k1")
      val cells = got.toLong * got
      assert(cells * cells >= n, s"n=$n cells=$cells below sqrt(n)")
      assert(cells <= 3 * math.sqrt(n.toDouble).ceil.toLong + 4,
        s"n=$n cells=$cells far above sqrt(n)")
    }
    // the probe rule (round 12): a SCAN BUDGET of max(64, 4·⌊√n⌋) —
    // isqrt exact at perfect squares and off-by-one edges, budget
    // exactly √10 per decade once past the floor
    assert(IndexStore.isqrt(0) === 0 && IndexStore.isqrt(1) === 1)
    assert(IndexStore.isqrt(15) === 3 && IndexStore.isqrt(16) === 4)
    assert(IndexStore.isqrt(2000) === 44)
    assert(IndexStore.isqrt(20000) === 141)
    assert(IndexStore.isqrt(999999999999L) === 999999)
    assert(IndexStore.isqrt(1000000000000L) === 1000000)
    assert(IndexStore.scanBudget(100, 4, 64) === 64) // floor regime
    assert(IndexStore.scanBudget(500, 4, 64) === 88)
    assert(IndexStore.scanBudget(2000, 4, 64) === 176)
    assert(IndexStore.scanBudget(20000, 4, 64) === 564)
    assert(IndexStore.scanBudget(200000, 4, 64) === 1788)
    // per-decade scan growth is pinned to ~√10 at ANY corpus size
    // (the round-11 fixed-nprobe rule inherited the ±2.9× jitter of
    // the integer-4th-root cell count into the scan trend)
    assert(IndexStore.scanBudget(10000000000L, 4, 64) === 400000L)
    assert(IndexStore.scanBudget(100000000000L, 4, 64) === 1264908L)
    // the PQ code-budget rule (divisor 512, 4..8 bits/sub): 16
    // centroids at the shipped SFs (zero output churn), 64 at the
    // synthetic sf1 point, 256 (the faiss 8-bit default) past ~131k
    def pqBits(n: Long): Int =
      IndexStore.scaledBitsRow(spark.range(n).toDF("id"), 512, 4, "b",
        hi = 8).head().getInt(0)
    assert(pqBits(500) === 4 && pqBits(2000) === 4)
    assert(pqBits(20000) === 6)
    assert(pqBits(200000) === 8 && pqBits(100000000L) === 8)
  }

  test("training-sample rule: full corpus below the 100k floor, " +
      "256 points per centroid above it") {
    // the round-13 build-side rule (IndexStore.trainN, the faiss
    // max_points_per_centroid recipe): every committed oracle-swept
    // corpus (≤ 20k at sf1) trains FULL — zero artifact churn — while
    // the sf10 decade (200k) and beyond train on a bounded sample
    assert(IndexStore.trainN(16) === 100000L) // q241/q251's fixed k
    assert(IndexStore.trainN(23) === 100000L) // sf10's sqrt-family k1
    assert(IndexStore.trainN(256) === 100000L) // kpq ceiling: 65536<floor
    assert(IndexStore.trainN(1024) === 262144L) // k1 clamp: 256·k wins
    // at the 10¹²-vector horizon the √n-family coarse k1 caps at 1024
    // → Lloyd frame ≤ 262144 rows FOREVER (the full-corpus path was
    // O(n·k) per round with k ≈ √n — the measured >65-min sf10 stage)
    assert(IndexStore.trainN(1024) < 1000000L)
    // the SQL twin derives the identical value from a mirrored k
    assert(IndexStore.trainNSql("16") ===
      s"GREATEST(100000, 256 * (16))")
  }

  test("16-bit band keys masked to 8 bits equal the historical keys") {
    val v = synthVecs(64, 16)
    val mismatches = v.select(
        explode(arrays_zip(
          VectorOps.lshBandKeys16(col("v"), 16, 4),
          VectorOps.lshBandKeys(col("v"), 16, 4, 8))).as("z"))
      .filter(col("z.0.band") =!= col("z.1.band") ||
        col("z.0.bkey") % 256 =!= col("z.1.bkey"))
      .count()
    assert(mismatches === 0L)
  }

  test("q34-shape bucket occupancy stays bounded across a 4x step") {
    def occupancy(n: Long): (Double, Long, Int) = {
      val v = synthVecs(n, 16)
      val r = IndexStore.scaledBitsRow(v, 32, 8, "r").head().getInt(0)
      val occ = v.select(
          (VectorOps.lshBucket(col("v"), 16, 16) %
            lit(1L << r)).as("bkt"))
        .groupBy(col("bkt")).count()
        .agg(avg(col("count")).as("a"), max(col("count")).as("m"))
        .head()
      (occ.getDouble(0), occ.getLong(1), r)
    }
    val (avg1, _, r1) = occupancy(4096)
    val (avg4, max4, r4) = occupancy(16384)
    // 4x the rows mint ~2 more key bits: expected occupancy must not
    // track the corpus (that is the saturation bug this rule retires)
    assert(r4 > r1, s"resolution did not grow: r=$r1 -> r=$r4")
    assert(r4 > 8, s"resolution never passed the old 8-bit cap: $r4")
    assert(avg4 <= 2.5 * avg1,
      s"avg occupancy grew with the corpus: $avg1 -> $avg4")
    // sign-bit buckets of hash vectors aren't uniform, but a bucket
    // holding >12.5% of a 16k corpus means the key space collapsed
    assert(max4 <= 2048L, s"hot bucket at 16k rows: $max4")
  }
}
