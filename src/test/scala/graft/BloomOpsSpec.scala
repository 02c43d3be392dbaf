package graft

import graft.core.GraftSession
import graft.ops.BloomOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the bloom membership prefilter: zero false negatives
  * (the property the q115 oracle equivalence rests on), a bounded
  * false-positive rate, and exact agreement between the bloom-
  * accelerated novelty split and the plain anti-join.
  */
class BloomOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private val M = 1 << 14
  private val K = 3

  test("mightContain never misses an inserted key") {
    val sq = spark
    import sq.implicits._
    val keys = (1 to 500).map(i => s"key-$i").toDF("k")
    val bitmap = BloomOps.build(keys, "k", M, K)
    val missed = keys
      .filter(!BloomOps.mightContain(bitmap, col("k"), M, K))
      .count()
    assert(missed === 0L, "a bloom filter must have no false negatives")
  }

  test("false-positive rate stays near the analytic bound") {
    val sq = spark
    import sq.implicits._
    val keys = (1 to 500).map(i => s"key-$i").toDF("k")
    val bitmap = BloomOps.build(keys, "k", M, K)
    val probes = (1 to 2000).map(i => s"absent-$i").toDF("k")
    val fp = probes
      .filter(BloomOps.mightContain(bitmap, col("k"), M, K))
      .count()
    // analytic FPR for n=500, m=2^14, k=3 is ~7e-4; 2000 probes give
    // an expectation of ~1.5 — allow generous slack before failing
    assert(fp <= 20L, s"false-positive rate implausibly high: $fp/2000")
  }

  test("noveltySplit is bit-identical to the plain exact anti-join") {
    val sq = spark
    import sq.implicits._
    val corpus = (1 to 300).map(i => s"text-$i").toDF("h")
    // batch: 50 seen keys, 150 novel ones
    val batch = ((1 to 50).map(i => (i.toLong, s"text-${i * 6}")) ++
      (51 to 200).map(i => (i.toLong, s"novel-$i"))).toDF("id", "h")
    val out = BloomOps.noveltySplit(corpus, batch, "h")
      .select(col("id"), col("is_new")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = batch
      .join(corpus, Seq("h"), "left_anti")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(out.size === 200)
    out.foreach { case (id, isNew) =>
      assert(isNew === (if (expected(id)) 1L else 0L),
        s"disagreement with exact anti-join on id=$id")
    }
  }

  test("sizeFor keeps fill under 0.5 across 4 decades of key counts") {
    val sq = spark
    import sq.implicits._
    // The saturation trap sizeFor exists to prevent: a constant m that
    // is healthy at n=1k fills up at n=100k. sizeFor must keep the
    // built bitmap's measured fill below the 0.5 optimum at every n.
    Seq(100L, 1000L, 10000L, 100000L).foreach { n =>
      val (m, k) = BloomOps.sizeFor(n)
      assert(m % 64 === 0 && (m & (m - 1)) === 0,
        s"m=$m must be a power of two multiple of 64")
      assert(m >= 10 * n * 0.99, s"m=$m too small for n=$n")
      val keys = sq.range(n).select(
        concat(lit("k-"), col("id")).as("k"))
      val fill = BloomOps.fill(BloomOps.build(keys, "k", m, k))
      assert(fill < 0.5,
        f"n=$n m=$m k=$k fill=$fill%.3f — bloom saturating")
    }
  }

  test("sizeFor caps m at the 16 MiB broadcast ceiling") {
    val (m, k) = BloomOps.sizeFor(100000000L)
    assert(m === (1 << 27))
    assert(k >= 1)
  }

  test("build rejects a bitmap size that is not a multiple of 64") {
    val sq = spark
    import sq.implicits._
    val keys = Seq("a").toDF("k")
    intercept[IllegalArgumentException] {
      BloomOps.build(keys, "k", 100, 2)
    }
  }
}
