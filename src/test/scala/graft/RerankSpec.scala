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

  // Round-13 rewrite pin: mmrExact now computes the greedy trajectory
  // over per-query collected arrays (one job) instead of a k-round
  // dataframe loop. Same math, so it must match a brute-force driver
  // reference row for row — including score ties (argmax by score desc,
  // cid asc), missing pair rows (max_sim -> 0), and k > |candidates|
  // (ranks simply stop).
  test("mmrExact equals brute-force greedy reference on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val k = 4; val ln = 1L; val ld = 2L
    val qids = 0L until 5L
    val cands = qids.flatMap { q =>
      val n = 1 + rnd.nextInt(7)
      (0 until n).map(i => (q, i.toLong * 7 % 13,
        rnd.nextInt(5).toLong * 100)) // coarse rels force score ties
    }.distinct
    val sims = for {
      q <- qids; (q1, c1, _) <- cands if q1 == q
      (q2, c2, _) <- cands if q2 == q && c1 != c2
      if rnd.nextBoolean() // drop some pairs: exercises max_sim -> 0
    } yield (q, c1, c2, rnd.nextInt(300).toLong)
    val candDf = cands.toDF("qid", "cid", "rel")
    val simDf = (sims ++ sims.map(s => (s._1, s._3, s._2, s._4)))
      .distinct.toDF("qid", "cid1", "cid2", "sim")
    val got = graft.ops.RerankOps.mmrExact(candDf, simDf, k, ln, ld)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // driver-side reference
    val simMap = (sims ++ sims.map(s => (s._1, s._3, s._2, s._4)))
      .map(s => (s._1, s._2, s._3) -> s._4).toMap
    val want = qids.flatMap { q =>
      val cs = cands.filter(_._1 == q).map(c => (c._2, c._3)).sortBy(_._1)
      var sel = Vector.empty[(Long, Long, Long, Long)] // rank,cid,rel,mmr
      for (rank <- 1 to k if sel.size == rank - 1) {
        val rem = cs.filterNot(c => sel.exists(_._2 == c._1))
        if (rem.nonEmpty) {
          val scored = rem.map { case (cid, rel) =>
            val matches = sel.flatMap(s => simMap.get((q, cid, s._2)))
            val ms = if (matches.isEmpty) 0L else matches.max
            (cid, rel, ln * rel - (ld - ln) * ms)
          }
          val best = scored.minBy { case (cid, _, sc) => (-sc, cid) }
          sel :+= ((rank.toLong, best._1, best._2, best._3))
        }
      }
      sel.map(s => (q, s._1, s._2, s._3, s._4))
    }
    assert(got.sorted === want.sorted)
  }
}
