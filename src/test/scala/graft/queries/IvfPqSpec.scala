package graft.queries

import graft.core.{GraftSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Pins q253's composed IndexIVFPQ contract independently of the
  * DuckDB gate: the trained router actually prunes (every query
  * ADC-scans a strict fraction of the corpus), the ADC hits are
  * structurally bounded, and the composition of both approximations
  * (routing miss × PQ distortion) still finds real neighbors across
  * the query set.
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = graft.SparkEntry
    .queries("q253_ivfpq_serving")(spark, dir)
    .collect()

  test("routing prunes: every query ADC-scans a strict corpus fraction") {
    val n = Tables(spark, dir, "embeddings").count()
    assert(out.nonEmpty)
    out.foreach { r =>
      val scanned = r.getAs[Long]("n_scanned")
      assert(scanned > 0L && scanned < n / 2,
        s"qid ${r.getAs[Long]("qid")} scanned $scanned of $n")
    }
  }

  test("hits are bounded by the top-5 size and the scan") {
    out.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0L && hits <= 5L &&
        hits <= r.getAs[Long]("n_scanned"))
    }
  }

  test("the composed approximations still find real neighbors") {
    assert(out.map(_.getAs[Long]("n_hits")).sum > 0L)
  }

  private lazy val res = graft.SparkEntry
    .queries("q255_ivfpq_residual")(spark, dir)
    .collect()

  test("residual encoding shares the exact routing cost of q253") {
    // same trained route, same cells ⇒ n_scanned must be IDENTICAL;
    // only the ADC ranking (and hence n_hits) may differ
    val raw = out.map(r =>
      r.getAs[Long]("qid") -> r.getAs[Long]("n_scanned")).toMap
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getAs[Long]("n_scanned") === raw(r.getAs[Long]("qid")))
    }
  }

  test("residual ADC hits are bounded and nonzero across the set") {
    res.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0L && hits <= 5L &&
        hits <= r.getAs[Long]("n_scanned"))
    }
    assert(res.map(_.getAs[Long]("n_hits")).sum > 0L)
  }
}
