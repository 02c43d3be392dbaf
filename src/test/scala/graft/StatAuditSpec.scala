package graft

import graft.core.GraftSession
import graft.queries.{Corpus, Events, Profiling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the statistical audit queries (q192 chi-square,
  * q194 MAD, q195 magnitude profile, q196 ANOVA, q197 nDCG, q198
  * seasonality, q199 forward-fill) that the value-equality oracle can't
  * express: the one-sided bias of the pinned floor-division chains
  * (integer result never EXCEEDS the real-valued statistic), metric
  * ranges, and the copied-not-recomputed contract of LOCF.
  */
class StatAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.01"

  test("q192: integer chi-square is nonnegative and floor-bounded by the real statistic") {
    val rows = Profiling.all("q192_chi_square")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("c"), r.getAs[Long]("d"))
      val chi2e3 = r.getAs[Long]("chi2_e3")
      assert(chi2e3 >= 0L)
      val margins = Seq(a + b, c + d, a + c, b + d)
      if (margins.forall(_ > 0)) {
        val n = (a + b + c + d).toDouble
        val real = n * math.pow(a * d - b * c, 2).toDouble /
          margins.map(_.toDouble).product
        // every step floors, and later steps only multiply by positive
        // integers — the integer chain can undershoot but never exceed.
        assert(chi2e3 <= math.ceil(real * 1000).toLong + 1,
          s"${r.getAs[String]("source")}: chi2_e3=$chi2e3 real=$real")
      } else assert(chi2e3 === 0L)
    }
  }

  test("q196: ANOVA identity — SSW is nonnegative and F only reported when defined") {
    val r = Profiling.all("q196_anova_quality")(spark, sf).head()
    assert(r.getAs[Long]("n_docs") === 500L)
    assert(r.getAs[Long]("k_sources") === 20L)
    // ssb_part floors DOWN, so ssw = S - ssb_part >= true SSW >= 0.
    assert(r.getAs[Long]("ssw") >= 0L)
    if (r.getAs[Long]("ssw") == 0L) assert(r.getAs[Long]("f_e3") === 0L)
  }

  test("q194: every flagged event clears the 3.5-MAD bar and is ordered by score") {
    val rows = Events.all("q194_mad_anomalies")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("mad2") > 0L)
      // score_e3 = floor(1000*ad/mad); the filter is ad*1000 > 3500*mad,
      // so every survivor's floored score is >= 3500.
      assert(r.getAs[Long]("score_e3") >= 3500L)
    }
    val scores = rows.map(_.getAs[Long]("score_e3"))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("q195: magnitude mass shares sum to ~1e6 (floor-rounding short only)") {
    val rows = Profiling.all("q195_freq_magnitude")(spark, sf).collect()
    val shares = rows.map(_.getAs[Long]("mass_share_e6"))
    assert(shares.sum <= 1000000L)
    assert(shares.sum >= 1000000L - rows.length)
  }

  test("q197: nDCG is in [0, 1e6] and DCG never exceeds ideal DCG") {
    val r = Corpus.all("q197_ndcg")(spark, sf).head()
    val (dcg, idcg, ndcg) = (r.getAs[Long]("dcg_e6"),
      r.getAs[Long]("idcg_e6"), r.getAs[Long]("ndcg_e6"))
    assert(dcg >= 0L && dcg <= idcg)
    assert(ndcg >= 0L && ndcg <= 1000000L)
  }

  test("q198: weekday indexes average back to flat (count-weighted)") {
    val rows = Events.all("q198_dow_seasonality")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("dow")).toSet.subsetOf((0L to 6L).toSet))
      val n = rs.map(_.getAs[Long]("n")).sum
      val wavg = rs.map(r =>
        r.getAs[Long]("n") * r.getAs[Long]("count_idx_e3")).sum / n
      // Σ n_d * (7000*n_d/n_all) / n_all = 7000 * Σn_d²/n_all² ≥ 1000
      // with equality iff perfectly flat; floors pull a few e3 under.
      assert(math.abs(wavg - 1000L) <= 100L,
        s"count-weighted mean index $wavg strays from flat")
    }
  }

  test("q199: purchase rows carry their own value; pre-first rows carry the sentinel") {
    val filled = Events.all("q199_forward_fill")(spark, sf)
    val raw = graft.core.Tables(spark, sf, "events")
      .select(col("event_id"), col("value"), col("ts"))
    val joined = filled.join(raw, "event_id").cache()
    // LOCF copies bits — a purchase row's filled value IS its value.
    assert(joined.filter(col("event_type") === "purchase" &&
      col("filled_value") =!= col("value")).count() === 0L)
    // a row before the user's first purchase must hold the sentinel.
    val firstPurchase = joined.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    assert(joined.join(firstPurchase, Seq("user_id"))
      .filter(col("ts") < col("first_ts") &&
        col("filled_value") =!= lit(-1.0)).count() === 0L)
    joined.unpersist()
  }
}
