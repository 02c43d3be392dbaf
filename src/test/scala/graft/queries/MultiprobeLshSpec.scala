package graft.queries

import graft.core.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins q248's dominance invariants independently of the DuckDB gate:
  * the multi-probe candidate set is a superset of the single-probe
  * set, so per query the scan can only grow and the hit bit can only
  * improve — and on the test corpus the extra probes actually buy
  * recall (the reason the operator exists).
  */
class MultiprobeLshSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private lazy val out = graft.SparkEntry
    .queries("q248_multiprobe_lsh")(spark, "/root/testdata/sf0.001")
    .collect()

  test("multi-probe dominates single-probe per query") {
    out.foreach { r =>
      assert(r.getAs[Long]("n_multi") >= r.getAs[Long]("n_single"))
      assert(r.getAs[Long]("multi_hit") >= r.getAs[Long]("single_hit"))
    }
  }

  test("the extra probes buy recall on the test corpus") {
    val single = out.map(_.getAs[Long]("single_hit")).sum
    val multi = out.map(_.getAs[Long]("multi_hit")).sum
    assert(multi > single,
      s"multi-probe must find neighbors single-probe misses " +
        s"($single -> $multi)")
  }
}
