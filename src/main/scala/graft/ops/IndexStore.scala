package graft.ops

import graft.core.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-once ANN-index artifacts — the persistence layer that turns
  * the vector-serving family from "computes an index per run" into
  * "trains once, serves many" (the fit-once / transform-many shape of
  * the reference's scaler/ALS pattern, hw4/hw4.py:97-99,173-177, and
  * of every deployed vector store: faiss trains a quantizer ONCE and
  * every query after that is a probe).
  *
  * Each builder routes through [[ArtifactStore.materializedOnce]],
  * content-addressed on the canonicalized input plan PLUS the input's
  * file snapshot (path, size, mtime) — the same keying the curation
  * pair/label tables use — so:
  *   - the first caller per (corpus, params) trains and writes parquet;
  *   - every later caller (any query, same session or a later one with
  *     `spark.graft.artifactDir` pinned) plans a bare file scan;
  *   - overwriting the corpus in place mints a new key and retrains —
  *     a stale index can never serve.
  *
  * The artifact tables are exactly the states a vector store persists:
  * the trained coarse-quantizer / PQ codebook (k·m·subDim rows), the
  * per-vector codes (|corpus| rows of ints), the SQ8 code+midpoint
  * table, per-label cell centroids, the LSH bucket table, and the kNN
  * graph. All values are integer-exact or fixed-point doubles, so the
  * parquet round-trip is bit-identical and every consumer's DuckDB
  * oracle is unchanged.
  */
object IndexStore {

  /** Trained codebook over a PQ subspace frame (vec_id, sub, j, x):
    * k centroids per subspace, `rounds` integer-exact Lloyd rounds
    * ([[VectorOps.pqCodebook]]). One full-space subspace = a trained
    * IVF coarse quantizer; m subspaces = the PQ codebook. Output
    * (sub, c, j, v), persisted once per (corpus, k, rounds, subspace
    * projection).
    */
  def codebook(xs: DataFrame, k: Int, rounds: Int): DataFrame =
    ArtifactStore.materializedOnce(xs,
      ArtifactStore.key(xs, "codebook", s"k$k-r$rounds")) {
      VectorOps.pqCodebook(xs, k, rounds)
    }

  /** Per-vector code assignment under the trained [[codebook]] —
    * (vec_id, sub, c). For the full-space quantizer this is the IVF
    * cell membership table; for m subspaces it is the PQ code table
    * (the compressed database a store actually keeps hot).
    */
  def codes(xs: DataFrame, k: Int, rounds: Int): DataFrame =
    ArtifactStore.materializedOnce(xs,
      ArtifactStore.key(xs, "codes", s"k$k-r$rounds")) {
      VectorOps.pqAssign(xs, codebook(xs, k, rounds))
    }

  /** SQ8 scalar-quantization table over a lifted (vec_id, dim, x)
    * frame ([[VectorOps.sq8]]): per-dimension stats, uint8 code and
    * midpoint reconstruction. Persisted once per corpus — the 4×
    * compressed representation serving scans instead of the floats.
    */
  def sq8Table(x: DataFrame): DataFrame =
    ArtifactStore.materializedOnce(x, ArtifactStore.key(x, "sq8", "")) {
      VectorOps.sq8(x)
    }

  /** 64 exact fixed-point centroid means of `v` — THE label-cell
    * centroid definition of the IVF family (one definition so the
    * fixed-point scale can never drift between builds, compactions
    * and audits).
    */
  private def centroidArr(dim: Int): Column =
    array((0 until dim).map(i =>
      Exact.avgFixed(element_at(col("v"), i + 1), 7)): _*)

  /** Per-label cell centroids over a (label, v) frame —
    * (clabel, cv, cn). The label-cell coarse quantizer the routed
    * serving queries, the health dashboard and the compaction step
    * all read; persisted once per corpus (or corpus subset — a BASE
    * snapshot keys separately from the full table by construction).
    */
  def labelCentroids(lv: DataFrame, dim: Int): DataFrame =
    ArtifactStore.materializedOnce(lv,
      ArtifactStore.key(lv, "labcent", s"d$dim")) {
      lv.groupBy(col("label"))
        .agg(centroidArr(dim).as("cv"))
        .select(col("label").as("clabel"), col("cv"),
          VectorOps.norm(col("cv")).as("cn"))
    }

  /** Hyperplane-LSH bucket table over a (vec_id, v, nrm) frame —
    * (vec_id, v, nrm, bkt). The standing index a multi-probe query
    * hits; persisted once per (corpus, planes).
    */
  def lshBuckets(v: DataFrame, dim: Int, planes: Int): DataFrame =
    ArtifactStore.materializedOnce(v,
      ArtifactStore.key(v, "lshbkt", s"d$dim-p$planes")) {
      v.select(col("vec_id"), col("v"), col("nrm"),
        VectorOps.lshBucket(col("v"), dim, planes).as("bkt"))
    }

  /** Cell-keyed IVF serving table over a lifted (vec_id, dim, x)
    * frame: (vec_id, c, v double-array, n2) — each vector stored
    * under its trained cell with its reassembled array and squared
    * norm, i.e. the table a point query's probe actually reads (route
    * to cells, scan ONLY those cells' rows). Persisted once per
    * (corpus, k, rounds, dim); at scale this is the table a store
    * would additionally partition BY `c` so a probe is a
    * partition-pruned scan.
    */
  def ivfMembers(x: DataFrame, k: Int, rounds: Int,
      dim: Int): DataFrame =
    ArtifactStore.materializedOnce(x,
      ArtifactStore.key(x, "ivfmembers", s"k$k-r$rounds-d$dim")) {
      val xs = VectorOps.pqSubspaces(x, dim)
      val arrs = x.groupBy(col("vec_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("x")))),
          t => t.getField("x").cast("double")).as("v"))
        .withColumn("n2", VectorOps.dot(col("v"), col("v")).cast("long"))
      codes(xs, k, rounds).select(col("vec_id"), col("c"))
        .join(arrs, Seq("vec_id"))
    }

  /** Count-scaled cell resolution shared by the kNN-graph build and
    * its incremental maintenance (whose rebuild-equivalence proof
    * DEPENDS on using exactly the same rule): the smallest k in [3,8]
    * with 2^k ≥ n/64, via exact integer bit-length. One row, column
    * `k`.
    */
  def scaledKRow(basis: DataFrame): DataFrame =
    basis.agg(count(lit(1)).as("n"))
      .select(greatest(lit(3), least(lit(8),
        when(expr("(n - 1) div 64") === 0, lit(0))
          .otherwise(length(bin(expr("(n - 1) div 64")))))).as("k"))

  /** The un-persisted kNN-graph derivation — exposed separately so
    * the plan audit (PlanDump/PlanSpec) can inspect the BUILD's join
    * shape (cell equi-join, never a cartesian) independently of the
    * artifact readback that serving plans as.
    */
  def knnGraphBuild(v: DataFrame, dim: Int, planes: Int): DataFrame = {
    val bucketed = v
      .select(col("vec_id"), col("v"), col("nrm"),
        VectorOps.lshBucket(col("v"), dim, planes).as("b8"))
      .crossJoin(broadcast(scaledKRow(v)))
      .select(col("vec_id"), col("v"), col("nrm"),
        (col("b8") % expr("shiftleft(CAST(1 AS BIGINT), k)")).as("cell"))
    val a = bucketed.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"), col("cell"))
    val b = bucketed.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("nrm").as("cn"), col("cell").as("cell2"))
    // n_cands rides the SAME window partition the rank uses — one
    // pass over the self-join
    val scored = a
      .join(b, col("cell") === col("cell2") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(VectorOps.dot(col("qv"), col("cv")) /
          (col("qn") * col("cn")), 6).as("cos"))
      .withColumn("n_cands", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))))
    TopKOps.topKPerGroup(scored, Seq(col("qid")),
        Seq(col("cos").desc, col("cid").asc), 3)
      .select(col("qid"), col("rnk").cast("long").as("rnk"),
        col("cid"), col("cos"), col("n_cands"))
  }

  /** All-node top-3 kNN graph over a (vec_id, v, nrm) frame, built
    * with the count-scaled LSH quantizer (cells ∝ n ⇒ per-node cost
    * flat) — (qid, rnk, cid, cos, n_cands). THE graph artifact: built
    * once per corpus snapshot, read by serving/health queries, updated
    * incrementally by the maintenance path, rewritten by compaction.
    */
  def knnGraph(v: DataFrame, dim: Int, planes: Int): DataFrame =
    ArtifactStore.materializedOnce(v,
      ArtifactStore.key(v, "knngraph", s"d$dim-p$planes")) {
      knnGraphBuild(v, dim, planes)
    }
}
