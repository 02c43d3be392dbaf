package graft.queries

import graft.core.{GraftSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Pins q247's scale contract independently of the DuckDB gate: the
  * count-scaled quantizer keeps the per-node candidate cost FLAT as
  * the corpus grows (the linearity claim), and the graph covers every
  * node on the test corpora.
  */
class KnnGraphSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def run(dir: String) =
    graft.SparkEntry.queries("q247_knn_graph")(spark, dir).collect()

  test("every node gets neighbors and candidate cost is cell-bounded") {
    val out = run("/root/testdata/sf0.001")
    val n = Tables(spark, "/root/testdata/sf0.001", "embeddings").count()
    assert(out.map(_.getAs[Long]("qid")).distinct.length === n.toInt)
    // expected cell size is ~64; allow generous headroom for LSH skew
    assert(out.forall(_.getAs[Long]("n_cands") <= 8 * 64))
  }

  test("per-node candidate cost stays flat when the corpus grows 4x") {
    def avgCands(dir: String): Double = {
      val out = run(dir)
      val perNode = out.groupBy(_.getAs[Long]("qid"))
        .map { case (_, rows) => rows.head.getAs[Long]("n_cands") }
      perNode.sum.toDouble / perNode.size
    }
    val small = avgCands("/root/testdata/sf0.001") // n=500,  k=3
    val large = avgCands("/root/testdata/sf0.1")   // n=2000, k=5
    // 4x the nodes but 4x the cells: the per-node scan must not grow
    // with the corpus (that is the whole point of the scaled k)
    assert(large <= 2.0 * small,
      s"avg candidates grew: $small -> $large")
  }
}
