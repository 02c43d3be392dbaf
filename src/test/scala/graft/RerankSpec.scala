package graft

import graft.core.GraftSession
import graft.queries.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the greedy MMR rerank the oracle can't express
  * (iterative selection): the first pick is the relevance argmax, the
  * output is k distinct candidates per query, and diversification
  * actually changes / never worsens the selected set's self-similarity
  * vs plain top-k.
  */
class RerankSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  lazy val mmr = Similarity.all("q129_mmr_rerank")(spark, sf).cache()
  lazy val top = Similarity.all("q32_cosine_topk")(spark, sf)
    .filter(col("qid") < 8).cache()

  test("rank 1 is the plain relevance argmax") {
    val m1 = mmr.filter(col("rank") === 1)
      .select(col("qid"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t1 = top.filter(col("rnk") === 1)
      .select(col("qid"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 === t1)
  }

  test("each query gets exactly 5 distinct candidates with ranks 1..5") {
    val g = mmr.groupBy(col("qid"))
      .agg(countDistinct(col("cid")).as("nc"),
        countDistinct(col("rank")).as("nr"), count(lit(1)).as("n"))
      .collect()
    assert(g.length === 8)
    g.foreach { r =>
      assert(r.getLong(1) === 5L && r.getLong(2) === 5L && r.getLong(3) === 5L)
    }
  }

  test("diversification: avg pairwise sim of MMR picks <= plain top-5, and differs") {
    def pairAvg(sel: org.apache.spark.sql.DataFrame): Double = {
      val v = spark.read.parquet(s"$sf/embeddings.parquet")
        .selectExpr("vec_id AS cid",
          "transform(embedding, x -> cast(x as double)) AS v")
        .withColumn("nrm", expr(
          "sqrt(aggregate(v, cast(0.0 as double), (a, x) -> a + x * x))"))
      val cv = sel.join(v, Seq("cid"))
      cv.as("a").join(cv.as("b"),
        col("a.qid") === col("b.qid") && col("a.cid") < col("b.cid"))
        .select((expr(
          "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), " +
            "cast(0.0 as double), (acc, x) -> acc + x)") /
          (col("a.nrm") * col("b.nrm"))).as("sim"))
        .agg(avg(col("sim"))).head().getDouble(0)
    }
    val mmrAvg = pairAvg(mmr.select(col("qid"), col("cid")))
    val topAvg = pairAvg(top.filter(col("rnk") <= 5)
      .select(col("qid"), col("cid")))
    assert(mmrAvg <= topAvg + 1e-9,
      s"MMR self-similarity $mmrAvg worse than plain top-5 $topAvg")
    val differs = mmr.select(col("qid"), col("cid"))
      .exceptAll(top.filter(col("rnk") <= 5).select(col("qid"), col("cid")))
      .count()
    assert(differs > 0, "MMR never diverged from plain top-5: vacuous")
  }
}
