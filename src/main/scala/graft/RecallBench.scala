package graft

import graft.core.Tables
import graft.ops.{IndexStore, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall-regression artifact: one row per (SF, serving family)
  * with the family's recall against its exact ground truth and its
  * measured candidate cost (n_scanned) — so a future routing,
  * banding-resolution or compression change can never silently trade
  * recall for speed: the round artifact (RECALL_r{N}.json) makes the
  * trade a diffable number.
  *
  * Families and their metrics (each family's queries already carry
  * the hit/score columns, gate-verified against DuckDB — this main
  * only AGGREGATES them):
  *   - q34 (count-scaled LSH bucket ANN, via q38's audit): top-1
  *     served vs exact top-5 → `top1_in_exact5`; n_scanned is the
  *     exact mean same-bucket candidate count (Σ sz·(sz−1) / n over
  *     the count-scaled buckets).
  *   - q85 (label-cell IVF, nprobe=2): top-1 (rnk=1) vs q32's exact
  *     top-5 → `top1_in_exact5`.
  *   - q248 (multi-probe LSH): multi_hit (and single_hit for the
  *     single-probe reference) → `top1_in_exact5`; n_scanned =
  *     mean n_multi.
  *   - q238 (SQ8 ADC serving), q251 (trained IVF), q256
  *     (count-scaled trained IVF — the flat-cost point whose recall
  *     trade this artifact exists to track), q253 (IVFPQ), q255
  *     (residual IVFPQ): n_hits of the served top-5 inside the exact
  *     top-5 → `overlap_at_5` (recall@5); n_scanned as emitted.
  */
object RecallBench {

  /** Per-family recall FLOORS — the artifact is a GATE, not a log: a
    * family measuring below its floor at ANY swept SF (including the
    * synthetic sf1 point) fails the run with exit 2, so an index or
    * probe-rule change can never silently trade recall away again
    * (round 9 shipped exactly that: count-scaled key spaces at frozen
    * probe counts took q256 from 0.34 to 0.06 across one decade and
    * only the artifact's JSON knew). Floors are set from the round-10
    * measurements under the count-scaled probe rule: the min across
    * the four SFs less a ~0.05 margin for 20-query sample noise.
    * Families structurally noisy at 20 queries (single-probe LSH — a
    * deliberately unboosted reference arm) carry floor 0.
    */
  private val FLOORS: Map[String, Double] = Map(
    // measured mins across sf0.001..synthetic sf1 (RECALL_r10):
    // q34 .30, q85 .65, q248m .10, q238 .20, q251 .30, q256 .24,
    // q253 .07, q255 .08, q257 .20 — floors = min − noise margin
    "q34_lsh_ann" -> 0.20,
    "q85_ivf_nprobe" -> 0.50,
    "q248_multiprobe_lsh" -> 0.05,
    "q248_single_probe" -> 0.0,
    "q238_ivf_sq8_serving" -> 0.15,
    "q251_trained_ivf" -> 0.25,
    "q256_scaled_ivf" -> 0.19,
    "q253_ivfpq_serving" -> 0.04,
    "q255_ivfpq_residual" -> 0.04,
    "q257_ivfpq_refine" -> 0.15)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("RECALL_LOCAL.json")
    val sfDirs = sys.env.getOrElse("SPARK_GRAFT_RECALL_SFS",
      "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.failOnCartesian", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def f(d: Double) = f"$d%.4f"
    val violations = scala.collection.mutable.ArrayBuffer[String]()

    val perSf = sfDirs.map { dir =>
      def run(name: String): DataFrame =
        SparkEntry.queries(name)(spark, dir)

      def fam(name: String, kind: String, recall: Double,
          nQueries: Long, nScanned: Option[Double]): String = {
        FLOORS.get(name).filter(recall < _).foreach { floor =>
          violations += s"$name at $dir: recall ${f(recall)} < " +
            s"floor ${f(floor)}"
        }
        s""""$name":{"metric_kind":"$kind","recall":${f(recall)},""" +
          s""""n_queries":$nQueries,"n_scanned_avg":${
            nScanned.map(f).getOrElse("null")}}"""
      }

      // q34 family: q38's per-query hit bit + the exact mean
      // multi-probed candidate count under the count-scaled mask
      // (own bucket + all r Hamming-1 flips, q34's probe set)
      val q38 = run("q38_ann_recall").agg(
        avg(col("hit")).as("r"), count(lit(1)).as("n")).head()
      val v = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      val bucketed = v
        .select(col("vec_id"), VectorOps.lshBucket(col("v"), 64, 16)
          .as("b16"))
        .crossJoin(broadcast(IndexStore.scaledBitsRow(v, 16, 8, "r")))
        .select(col("vec_id"),
          (col("b16") % expr("shiftleft(CAST(1 AS BIGINT), r)"))
            .as("bkt"), col("r"))
      val sizes = bucketed.groupBy(col("bkt")).count()
      val scan34 = bucketed
        .select(col("vec_id"), col("bkt"),
          explode(sequence(lit(-1), col("r") - 1)).as("fj"))
        .select(col("vec_id"),
          expr("""CASE WHEN fj = -1 THEN bkt
                  ELSE bkt ^ shiftleft(CAST(1 AS BIGINT), fj) END""")
            .as("probe"))
        .join(sizes, col("probe") === col("bkt"), "left")
        .groupBy(col("vec_id"))
        .agg((sum(coalesce(col("count"), lit(0L))) - 1L).as("cands"))
        .agg(avg(col("cands"))).head().getDouble(0)
      val f34 = fam("q34_lsh_ann", "top1_in_exact5",
        q38.getAs[Double]("r"), q38.getAs[Long]("n"), Some(scan34))

      // q85 family: rnk=1 serving row vs q32's exact top-5
      val exact5 = run("q32_cosine_topk").select(col("qid"), col("cid"))
      val best85 = run("q85_ivf_nprobe").filter(col("rnk") === 1)
        .select(col("qid"), col("cid").as("acid"))
      val r85 = exact5.join(best85, Seq("qid"), "left")
        .groupBy(col("qid"))
        .agg(max(when(col("cid") === col("acid"), 1.0).otherwise(0.0))
          .as("hit"))
        .agg(avg(col("hit")).as("r"), count(lit(1)).as("n")).head()
      val f85 = fam("q85_ivf_nprobe", "top1_in_exact5",
        r85.getAs[Double]("r"), r85.getAs[Long]("n"), None)

      // q248: multi-probe hit + candidate cost straight off the gate
      // columns (single-probe reference folded in as its own family)
      val r248 = run("q248_multiprobe_lsh").agg(
        avg(col("multi_hit")).as("rm"), avg(col("single_hit")).as("rs"),
        avg(col("n_multi")).as("sm"), avg(col("n_single")).as("ss"),
        count(lit(1)).as("n")).head()
      val f248 = fam("q248_multiprobe_lsh", "top1_in_exact5",
        r248.getAs[Double]("rm"), r248.getAs[Long]("n"),
        Some(r248.getAs[Double]("sm")))
      val f248s = fam("q248_single_probe", "top1_in_exact5",
        r248.getAs[Double]("rs"), r248.getAs[Long]("n"),
        Some(r248.getAs[Double]("ss")))

      // the (qid, n_scanned, n_hits) families: recall@5 = n_hits/5
      val overlap = Seq("q238_ivf_sq8_serving", "q251_trained_ivf",
        "q256_scaled_ivf", "q253_ivfpq_serving",
        "q255_ivfpq_residual", "q257_ivfpq_refine").map { name =>
        val r = run(name).agg(
          (avg(col("n_hits")) / 5.0).as("r"),
          avg(col("n_scanned")).as("s"), count(lit(1)).as("n")).head()
        fam(name, "overlap_at_5", r.getAs[Double]("r"),
          r.getAs[Long]("n"), Some(r.getAs[Double]("s")))
      }

      val fams = (Seq(f34, f85, f248, f248s) ++ overlap).mkString(",")
      System.err.println(s"[recall] $dir done")
      s""""$dir":{$fams}"""
    }
    val vjson = violations.map(v => s""""$v"""").mkString(",")
    val json =
      s"""{"metric":"ann_recall","floors_enforced":true,""" +
        s""""violations":[$vjson],""" +
        s""""per_sf":{${perSf.mkString(",")}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(json)
    spark.stop()
    if (violations.nonEmpty) {
      violations.foreach(v => System.err.println(s"[recall-floor] $v"))
      sys.exit(2)
    }
  }
}
