package graft

import graft.core.GraftSession
import graft.queries.Analytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeability contract of the Datasketches HLL path behind
  * q177_incremental_distinct: unioning per-day partial sketches must
  * answer exactly like sketching the raw data directly (HLL merge is
  * a register-wise max — lossless), and the estimate must sit within
  * HLL error of the exact count. This is what makes "store daily
  * partials, never recount raw events" a safe 100 TB design.
  */
class SketchMergeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private lazy val events = {
    val sq = spark
    import sq.implicits._
    // 3 "days" × overlapping user sets; 400 distinct users overall
    (0 until 3).flatMap(day =>
      (0 until 300).map(i => (day.toLong, (day * 50 + i).toLong)))
      .toDF("day", "user_id")
  }

  test("union of daily partials tracks the direct sketch estimate") {
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head.getLong(0)
    val merged = events
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0)
    // the merge is register-wise max, but a union promotes sparse
    // (coupon-list) sketches to dense HLL whose estimator can differ
    // by ±1 at tiny cardinalities — lossless up to estimator mode,
    // not bit-equal. Bound the drift at 1%.
    assert(math.abs(merged - direct) <= math.max(1L, direct / 100),
      s"merged $merged vs direct $direct")
  }

  test("merged estimate is within HLL error of the exact distinct count") {
    val exact = events.select(countDistinct(col("user_id")))
      .head.getLong(0)
    val merged = events
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0)
    // default lgK=12 → relative error ~1.6%; allow 5%
    assert(math.abs(merged - exact) <= math.max(1L, exact / 20),
      s"estimate $merged vs exact $exact")
  }

  test("q186 histogram quantiles: merged == direct, error within one bin") {
    val sf = "/root/testdata/sf0.001"
    val est = Analytics.all("q186_quantile_partials")(spark, sf).collect()
    // exact k-th smallest in cents (type-1 quantile), small-data sort
    val cents = spark.read.parquet(s"$sf/orders.parquet")
      .select(graft.core.Exact.fixed(col("o_totalprice"), 2).as("c"))
      .orderBy(col("c")).collect().map(_.getLong(0))
    est.foreach { r =>
      val k = r.getAs[Long]("k")
      val exact = cents(k.toInt - 1)
      val e = r.getAs[Long]("est_cents")
      val err = r.getAs[Long]("err_cents")
      // the estimate is the hit bin's inclusive upper edge: exact lies
      // in that bin, so est >= exact and est - exact < bin width
      assert(e >= exact && e - exact < err,
        s"p=${r.getAs[Long]("p")}: est $e exact $exact err $err")
    }
    assert(est.map(_.getAs[Long]("n_total")).distinct.sameElements(
      Array(cents.length.toLong)))
  }
}
