package graft.queries

import graft.core.{GraftSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Pins q251's serving contract independently of the DuckDB gate: the
  * trained router actually routes (every query scans a strict
  * fraction of the corpus, not all of it) and the index still finds
  * neighbors (nonzero recall across the query set — nprobe=2 of 16
  * trained cells cannot be a no-op partition).
  */
class TrainedIvfSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = graft.SparkEntry
    .queries("q251_trained_ivf")(spark, dir)
    .collect()

  test("routing scans a strict fraction of the corpus per query") {
    val n = Tables(spark, dir, "embeddings").count()
    assert(out.nonEmpty)
    out.foreach { r =>
      val scanned = r.getAs[Long]("n_scanned")
      assert(scanned > 0L && scanned < n / 2,
        s"qid ${r.getAs[Long]("qid")} scanned $scanned of $n")
    }
  }

  test("the trained index finds real neighbors") {
    assert(out.map(_.getAs[Long]("n_hits")).sum > 0L)
    assert(out.forall(r => r.getAs[Long]("n_hits") <= 5L &&
      r.getAs[Long]("n_hits") <= r.getAs[Long]("n_scanned")))
  }
}
