package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus-curation pipeline as a PUBLIC library API — the same
  * operators the gate queries (Dedup pack q27-q31, q75-q79, q86)
  * exercise, callable on any `(doc_id LONG, text STRING, …)` frame so
  * an embedding application doesn't have to reach into the query pack.
  * (Reference analogue: hw3/hw3.py's MinHash-LSH ends at candidate
  * pairs, hw3/hw3.py:165-169; this carries the pipeline through
  * verification, cluster formation, canonical selection, and the
  * quality cut — what "dedup a 100 TB corpus" actually requires.)
  *
  * Scale contract (same invariants ENGINE.md documents):
  *   - signatures are per-row expressions — shuffle-free, scan-fused;
  *   - every pairwise step is candidate-driven through a uniform
  *     (band, key) equi-join — no all-pairs join anywhere;
  *   - narrow relations that feed both sides of a self-join are
  *     cached AND materialized first (two concurrent stage scans race
  *     an unmaterialized cache and both recompute);
  *   - cluster formation is the iterative star-contraction
  *     ([[GraphOps.connectedComponents]]), not a driver union-find.
  *
  * Caching side effect: [[lshCandidatePairs]] / [[verifiedPairs]] (and
  * everything built on them) `cache()` + materialize two narrow
  * relations per distinct input frame and do not unpersist — correct
  * for a session working one corpus, but a long-lived application
  * cycling many corpora should `spark.catalog.clearCache()` between
  * them (Spark's cache manager dedups only plan-identical frames).
  */
object CurationOps {

  /** doc_id + shingles + 31-bit shingle-hash array, as chained
    * projections (each array column materialized once per row;
    * CollapseProject keeps the md5 work single-evaluation because the
    * arrays are non-cheap and multiply referenced downstream).
    */
  def shingleHashed(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), DedupOps.shingles(col("toks")).as("sh"))
      .select(col("doc_id"), col("sh"),
        DedupOps.shingleHashes(col("sh")).as("hs"))

  /** doc_id + the 8 MinHash signature components (native one-pass
    * kernel; the extra projection is deliberate — `sig` is non-cheap
    * and referenced 8×, so CollapseProject keeps it
    * single-evaluation).
    */
  def minhashSignatures(docs: DataFrame,
      textCol: String = "text"): DataFrame =
    shingleHashed(docs, textCol)
      .select(col("doc_id"), DedupOps.minhashAll(col("hs")).as("sig"))
      .select(col("doc_id") +:
        (0 until 8).map(i => element_at(col("sig"), i + 1).as(s"s$i")): _*)

  /** Banded signature keys: 4 bands × 2 signature rows, one pass over
    * the signatures with an `explode` of band structs — a union of 4
    * selects would recompute the whole tokenize→shingle→md5→minhash
    * pipeline once per band (measured 4× the scan cost).
    */
  def bandKeys(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val bandStructs = array((0 until DedupOps.bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", col(s"s${2 * b}"), col(s"s${2 * b + 1}")).as("key"))
    }: _*)
    minhashSignatures(docs, textCol)
      .select(col("doc_id"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
  }

  /** LSH candidate pairs (d1 < d2, n_shared_bands): docs agreeing on
    * ≥1 full band. The join key (band, key) is a uniform hash →
    * balanced shuffle; quadratic work only inside a bucket
    * (LSH-bounded).
    */
  def lshCandidatePairs(docs: DataFrame,
      textCol: String = "text"): DataFrame =
    bandPairs(docs, textCol, newSide = None)

  /** Shared band self-join: `newSide` (a predicate over `doc_id`)
    * restricts the d2 side BEFORE pairing — the incremental path —
    * while None pairs the whole corpus.
    */
  private def bandPairs(docs: DataFrame, textCol: String,
      newSide: Option[org.apache.spark.sql.Column]): DataFrame = {
    // the band relation is narrow (doc_id, band, key) — cache and
    // materialize it so the self-join's two concurrent scans don't
    // each recompute (or race) the tokenize→shingle→md5→minhash chain
    val bd = bandKeys(docs, textCol).cache()
    bd.count()
    val a = bd.select(col("doc_id").as("d1"), col("band"), col("key"))
    val bBase = newSide.map(bd.filter).getOrElse(bd)
    val b = bBase.select(col("doc_id").as("d2"), col("band").as("band2"),
      col("key").as("key2"))
    a.join(b, col("band") === col("band2") && col("key") === col("key2") &&
        col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Verified near-dup pairs: exact n-gram Jaccard ≥ `threshold`,
    * computed ONLY for LSH candidates. Candidates (small) equi-join
    * the shingle-set table twice to fetch both arrays, then a per-row
    * `array_intersect` — no shingle explode, no wide shuffle. Shingle
    * sets are distinct by construction so |intersect| is exact.
    */
  def verifiedPairs(docs: DataFrame, threshold: Double = 0.8,
      textCol: String = "text"): DataFrame =
    exactVerify(docs, lshCandidatePairs(docs, textCol), threshold, textCol)

  /** Incremental form — the daily-ingest fast path: candidate pairs
    * are restricted to `isNew` docs on the d2 side BEFORE exact
    * verification, so corpus-internal (old-old) pairs never form and
    * cost is batch-proportional, not corpus-quadratic. Output rows are
    * exactly the [[verifiedPairs]] rows whose d2 satisfies `isNew`.
    */
  def verifiedPairsIncremental(
      docs: DataFrame,
      isNew: org.apache.spark.sql.Column,
      threshold: Double = 0.8,
      textCol: String = "text"): DataFrame =
    exactVerify(docs, bandPairs(docs, textCol, Some(isNew)), threshold,
      textCol)

  private def exactVerify(docs: DataFrame, cands0: DataFrame,
      threshold: Double, textCol: String): DataFrame = {
    val sets = shingleHashed(docs, textCol)
      .select(col("doc_id"), col("sh")).cache()
    sets.count() // fetched twice (both pair sides) — compute once
    val cands = cands0.select(col("d1"), col("d2"))
    cands
      .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1")),
        Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")),
        Seq("d2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("long")
          .as("n_shared"),
        size(col("sh1")).cast("long").as("n1"),
        size(col("sh2")).cast("long").as("n2"))
      // two sub-n-token docs have EMPTY shingle sets yet identical
      // sentinel signatures, so they DO become candidates — the 0/0
      // division must yield null (pair dropped, matching the SQL
      // mirror's NULL), not an ANSI DIVIDE_BY_ZERO crash
      .select(col("d1"), col("d2"), col("n_shared"),
        when(col("n1") + col("n2") - col("n_shared") > 0,
          col("n_shared") / (col("n1") + col("n2") - col("n_shared")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT all-pairs Jaccard ≥ `threshold` — the ground truth a recall
    * audit compares the LSH candidates against. O(|docs|²): call ONLY
    * on a bounded audit subset (in engine sessions the cartesian lint
    * rejects unbounded inputs). Same Jaccard definition and threshold
    * default as [[verifiedPairs]], so the audit measures the deployed
    * configuration.
    */
  def exactJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
      textCol: String = "text"): DataFrame = {
    // cache the full shingleHashed base (not a projection of it): the
    // cache manager matches canonicalized SUBTREES, so a subsequent
    // lshCandidatePairs over the same frame reuses this scan instead
    // of re-running tokenize→shingle→md5
    val base = shingleHashed(docs, textCol).cache()
    base.count()
    val sets = base.select(col("doc_id"), col("sh"))
    val a = sets.select(col("doc_id").as("d1"), col("sh").as("sh1"))
    val b = sets.select(col("doc_id").as("d2"), col("sh").as("sh2"))
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("long")
    val denom = size(col("sh1")).cast("long") +
      size(col("sh2")).cast("long") - inter
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        when(denom > 0, inter.cast("double") / denom).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Total cluster assignment (doc_id, comp): connected components
    * over the verified pairs, singletons labeled with their own id.
    */
  def clusterLabels(docs: DataFrame, threshold: Double = 0.8,
      textCol: String = "text"): DataFrame = {
    val verified = verifiedPairs(docs, threshold, textCol)
      .select(col("d1"), col("d2"))
    val labels = GraphOps.connectedComponents(verified, "d1", "d2")
    docs.select(col("doc_id"))
      .join(labels, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("comp"))
  }

  /** One survivor per cluster (the minimum doc_id — the component
    * label by construction) with the cluster size it absorbed.
    */
  def survivors(docs: DataFrame, threshold: Double = 0.8,
      textCol: String = "text"): DataFrame =
    clusterLabels(docs, threshold, textCol)
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"))
      .select(col("comp").as("doc_id"), col("cluster_size"))

  /** End-to-end curation: keep each cluster's canonical doc, then cut
    * on the shared quality score ([[TextOps.qualityScore]]). Returns
    * the input columns minus `textCol`, plus `quality` — the rows ARE
    * the purged training corpus.
    */
  def curate(
      docs: DataFrame,
      threshold: Double = 0.8,
      minQuality: Double = 0.40,
      textCol: String = "text"): DataFrame = {
    val canon = clusterLabels(docs, threshold, textCol)
      .filter(col("doc_id") === col("comp"))
      .select(col("doc_id"))
    val kept = docs.columns.filterNot(_ == textCol).map(col).toSeq
    docs
      .select(kept :+
        TextOps.qualityScore(TextOps.tokens(col(textCol))).as("quality"): _*)
      .join(canon, Seq("doc_id"))
      .filter(col("quality") >= minQuality)
  }
}
