package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal-Marginal-Relevance reranking (Carbonell & Goldstein 1998):
  * greedy diversified top-k selection, `argmax λ·rel − (1−λ)·max_{s∈S}
  * sim(c, s)` — the standard answer to "my retrieved training/eval
  * examples are 20 near-copies of the same document".
  *
  * Distributed shape: the greedy loop is inherently sequential in k but
  * embarrassingly parallel across queries — each iteration is one
  * anti-join (drop selected), one equi-join + grouped max (similarity to
  * the selected set), and one per-query window top-1, all keyed by
  * query id. k is small (5–20); candidate sets are bounded (top-N from a
  * retriever), so every intermediate is |queries|×N — the per-iteration
  * cost at 100 TB is governed by the retriever, not this rerank.
  * `localCheckpoint` per iteration truncates the growing union lineage
  * exactly as [[GraphOps]] does for its iterative contraction.
  */
object RerankOps {

  /** @param candidates (qid, cid, rel) — bounded per-query candidate
    *                    set with relevance scores (higher = better).
    * @param pairSims   (qid, cid1, cid2, sim) — pairwise candidate
    *                    similarities, BOTH orientations present.
    * @param k          number of results per query.
    * @param lambda     relevance weight; 1.0 degenerates to plain top-k.
    * @return (qid, rank, cid, rel, mmr) — rank 1..k per query; `mmr` is
    *         the score at selection time (rank 1 keeps its raw rel).
    *         Ties resolve by cid ascending — deterministic across runs.
    */
  def mmr(candidates: DataFrame, pairSims: DataFrame, k: Int,
      lambda: Double = 0.5): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val byScore = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid").asc)
    def top1(scored: DataFrame, rank: Int): DataFrame =
      scored.withColumn("rn", row_number().over(byScore))
        .filter(col("rn") === 1)
        .select(col("qid"), lit(rank.toLong).as("rank"), col("cid"),
          col("rel"), round(col("score"), 6).as("mmr"))

    var selected = top1(
      candidates.withColumn("score", col("rel")), 1).localCheckpoint()
    for (step <- 2 to k) {
      val remaining = candidates.join(
        selected.select(col("qid"), col("cid")), Seq("qid", "cid"),
        "left_anti")
      val maxSim = remaining
        .join(pairSims.withColumnRenamed("cid1", "cid"),
          Seq("qid", "cid"))
        .join(selected.select(col("qid"), col("cid").as("cid2")),
          Seq("qid", "cid2"))
        .groupBy(col("qid"), col("cid"))
        .agg(max(col("sim")).as("max_sim"))
      val scored = remaining.join(maxSim, Seq("qid", "cid"), "left")
        .withColumn("score",
          round(lit(lambda) * col("rel") -
            lit(1.0 - lambda) * coalesce(col("max_sim"), lit(0.0)), 6))
      selected = selected.unionByName(top1(scored, step)).localCheckpoint()
    }
    selected.orderBy(col("qid"), col("rank"))
  }

  /** Integer fixed-point MMR — same greedy trajectory as [[mmr]] but
    * every score is an exact LONG, so the selection order (and hence
    * the output) is bit-identical across engines, run topologies, and
    * partition counts. λ is a rational `lambdaNum/lambdaDen`; scores
    * are reported in e-units·lambdaDen:
    * `mmr = lambdaNum·rel − (lambdaDen−lambdaNum)·max_sim`
    * (rank 1 has an empty selected set → `lambdaNum·rel`). Integer
    * subtraction replaces the double `round(λ·rel − (1−λ)·sim, 6)`,
    * whose halfway cases are at the mercy of binary representation —
    * the one cross-engine hazard the double form can't close.
    *
    * @param candidates (qid, cid, rel) with `rel` LONG fixed-point.
    * @param pairSims   (qid, cid1, cid2, sim) with `sim` LONG in the
    *                   SAME fixed-point scale, both orientations.
    * @return (qid, rank, cid, rel, mmr) — all LONG score columns.
    */
  def mmrExact(candidates: DataFrame, pairSims: DataFrame, k: Int,
      lambdaNum: Long, lambdaDen: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"lambda must be in [0,1]: $lambdaNum/$lambdaDen")
    val byScore = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid").asc)
    def top1(scored: DataFrame, rank: Int): DataFrame =
      scored.withColumn("rn", row_number().over(byScore))
        .filter(col("rn") === 1)
        .select(col("qid"), lit(rank.toLong).as("rank"), col("cid"),
          col("rel"), col("score").as("mmr"))

    var selected = top1(
      candidates.withColumn("score", lit(lambdaNum) * col("rel")), 1)
      .localCheckpoint()
    for (step <- 2 to k) {
      val remaining = candidates.join(
        selected.select(col("qid"), col("cid")), Seq("qid", "cid"),
        "left_anti")
      val maxSim = remaining
        .join(pairSims.withColumnRenamed("cid1", "cid"),
          Seq("qid", "cid"))
        .join(selected.select(col("qid"), col("cid").as("cid2")),
          Seq("qid", "cid2"))
        .groupBy(col("qid"), col("cid"))
        .agg(max(col("sim")).as("max_sim"))
      val scored = remaining.join(maxSim, Seq("qid", "cid"), "left")
        .withColumn("score",
          lit(lambdaNum) * col("rel") -
            lit(lambdaDen - lambdaNum) * coalesce(col("max_sim"), lit(0L)))
      selected = selected.unionByName(top1(scored, step)).localCheckpoint()
    }
    selected.orderBy(col("qid"), col("rank"))
  }
}
