package graft

import graft.core.GraftSession
import graft.ops.IndexStore
import graft.queries.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine's count-scaled PROBE rule
  * ([[graft.ops.IndexStore.scaledProbes]]) — the dual of
  * KeySpaceScalingSpec's key rule, and the retirement of the
  * probe-side half of the fixed-resolution hazard: round 9 scaled
  * every key space with the corpus but froze every probe count, so
  * the scanned share of each key space — and with it recall — fell
  * toward zero exactly as the corpus grew (RECALL_r09: q256
  * 0.34 → 0.06 across one decade).
  *
  *   1. the rule's VALUES: nprobe = max(lo, cells/divisor), floored
  *      at the shipped-SF regime (so historical outputs are
  *      unchanged) and growing with the cell count past it;
  *   2. across a 4× corpus step of a fixed synthetic distribution,
  *      the rule's nprobe buys recall the FROZEN probe count provably
  *      loses (candidate sets are supersets under exact ranking, so
  *      the comparison is deterministic, not statistical);
  *   3. the scan budget under the rule stays a bounded SHARE of the
  *      corpus (never re-approaches the full scan the index exists
  *      to avoid).
  */
class RecallFloorSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  test("scaledProbes: floor at small cell counts, share-pinned past it") {
    // the shipped-SF regime: 16 composite cells → the floor keeps the
    // historical nprobe=2 (zero output churn at sf0.001/0.01/0.1)
    assert(IndexStore.scaledProbes(16, 16, 2) === 2)
    // synthetic sf1: 256 cells → 16 probes (the measured knee that
    // restores the sf0.1 recall baseline, RECALL_CURVE_r10)
    assert(IndexStore.scaledProbes(256, 16, 2) === 16)
    // mid regime and two decades out: the probed share pins at 1/16
    assert(IndexStore.scaledProbes(64, 16, 2) === 4)
    assert(IndexStore.scaledProbes(4096, 16, 2) === 256)
    // the DuckDB twin (scaledProbesSql, `//` floor-div dialect) is
    // exercised end-to-end by the oracle gate's imiCtes `np` CTE
  }

  /** Deterministic pseudo-random float vectors (no RNG — xxhash64 is
    * seed-stable), written once as a corpus dir the Similarity
    * helpers can read like any testdata SF.
    */
  private def synthCorpus(n: Long): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft-recallfloor-$n"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), j =>
          ((pmod(xxhash64(col("id"), j), lit(2001L)) - lit(1000L))
            .cast("double") / 1000.0).cast("float")).as("embedding"),
        (col("id") % 10).cast("int").as("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    dir
  }

  private def recallAt(dir: String, k1: Int, nprobe: Int)
      : (Double, Double) = {
    val r = Similarity.imiIvfReportAt(spark, dir, k1, nprobe)
      .agg((avg(col("n_hits")) / 5.0).as("r"),
        avg(col("n_scanned")).as("s"))
      .head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("the probe rule holds recall across a 4x corpus step where a " +
      "frozen probe count loses it") {
    val small = synthCorpus(1024)
    val big = synthCorpus(4096)
    val k1s = Similarity.imiK1(spark, small)
    val k1b = Similarity.imiK1(spark, big)
    // 4x the rows mint a finer quantizer (16 → 64 composite cells)
    assert(k1s === 4 && k1b === 8,
      s"unexpected quantizer geometry: k1=$k1s -> k1=$k1b")
    val npSmall = IndexStore.scaledProbes(k1s * k1s,
      Similarity.IMI_PROBE_DIVISOR, 2)
    val npBig = IndexStore.scaledProbes(k1b * k1b,
      Similarity.IMI_PROBE_DIVISOR, 2)
    assert(npBig > npSmall, "the rule did not scale the probe count")
    val (rSmall, sSmall) = recallAt(small, k1s, npSmall)
    val (rBigRule, sBigRule) = recallAt(big, k1b, npBig)
    val (rBigFrozen, _) = recallAt(big, k1b, npSmall)
    // superset candidates under exact ranking: the rule can only beat
    // the frozen count, and must actually find neighbors
    assert(rBigRule >= rBigFrozen,
      s"rule nprobe=$npBig recall $rBigRule < frozen nprobe=$npSmall " +
        s"recall $rBigFrozen")
    assert(rBigRule > 0.0, "recall collapsed to zero under the rule")
    // the band: a 4x step may cross one floor boundary (probed share
    // 1/8 → 1/16) but must not fall off the small-corpus value
    assert(rBigRule >= rSmall - 0.25,
      s"recall fell across the step: $rSmall -> $rBigRule")
    // scan budget stays a bounded share — not a re-grown full scan
    assert(sBigRule <= 4.0 * math.max(sSmall, 1.0),
      s"scan budget grew superlinearly: $sSmall -> $sBigRule")
    assert(sBigRule < 4096 / 2.0,
      s"probe re-approached the full scan: $sBigRule of 4096")
  }

  /** A small planted-cluster corpus (SynthData's `clustered` recipe:
    * m = ⌈√n⌉ hashed-Gaussian unit centers + σ·noise, deterministic —
    * no RNG), written once as a dir the query pack can read.
    */
  private def clusteredCorpus(n: Long): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft-clustered-$n"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val m = math.max(4L, math.ceil(math.sqrt(n.toDouble)).toLong)
      def gauss(tag: String, key: org.apache.spark.sql.Column) =
        transform(sequence(lit(0), lit(63)), j => {
          val u1 = (pmod(xxhash64(lit(42L), lit(tag + "1"), key, j),
            lit(999999989L)).cast("double") + 1) / 1e9
          val u2 = pmod(xxhash64(lit(42L), lit(tag + "2"), key, j),
            lit(1000000000L)).cast("double") / 1e9
          sqrt(lit(-2.0) * log(u1)) * cos(lit(2 * math.Pi) * u2)
        })
      val cid = pmod(xxhash64(lit(42L), lit("eclu"), col("id")), lit(m))
      val cg = gauss("ecg", cid)
      val cn = sqrt(aggregate(cg, lit(0.0d), (a, x) => a + x * x))
      val raw = zip_with(cg, gauss("eg", col("id")),
        (c, x) => c / cn + lit(0.1) * x)
      spark.range(n).select(col("id").as("vec_id"), raw.as("g"),
          (col("id") % 10).cast("int").as("label"))
        .withColumn("nrm", sqrt(aggregate(col("g"), lit(0.0d),
          (acc, x) => acc + x * x)))
        .select(col("vec_id"),
          transform(col("g"), x => (x / col("nrm")).cast("float"))
            .as("embedding"), col("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    dir
  }

  test("structure is exploited: on a planted-cluster corpus the " +
      "trained sqrt-cell router beats the random-partition control") {
    val dir = clusteredCorpus(2048)
    def recallOf(name: String): (Double, Double) = {
      val r = SparkEntry.queries(name)(spark, dir)
        .agg((avg(col("n_hits")) / 5.0).as("r"),
          avg(col("n_scanned")).as("s")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (rTrained, sTrained) = recallOf("q258_imi_sqrt")
    val (rControl, sControl) = recallOf("q259_random_route")
    // identical geometry (cells, nprobe, expected occupancy) — the
    // scan budgets must be in the same band, or the comparison is
    // not at-equal-cost
    assert(sTrained <= 3.0 * math.max(sControl, 1.0) &&
      sControl <= 3.0 * math.max(sTrained, 1.0),
      s"scan budgets diverged: trained $sTrained vs control $sControl")
    // the actual structure pin: training must buy recall that a
    // data-blind partition of the same cost cannot
    assert(rTrained >= 2.0 * rControl,
      s"trained $rTrained < 2x control $rControl — the quantizer is " +
        "not exploiting the planted structure")
    assert(rTrained >= 0.5,
      s"trained recall $rTrained too low on a strongly clustered corpus")
  }
}
