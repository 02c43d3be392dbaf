package graft.ops

import org.apache.spark.sql.DataFrame

/** Write-once parquet artifact registry shared by the curation APIs
  * ([[CurationOps.pairsTable]]/`labelsTable`, [[SemanticOps]] twins):
  * a derivation keyed on the canonicalized input plan (plus the row
  * bytes for in-memory relations, which canonicalize to their schema
  * alone) is built and written exactly once per session and read back
  * as a plain file scan afterwards — the shape a 100 TB run persists
  * anyway (derive the pair/label tables once, point every audit at
  * them).
  */
private[ops] object ArtifactStore {

  private val artifacts =
    scala.collection.mutable.Map.empty[String, String]

  /** Session-unique base dir (override: spark.graft.artifactDir). */
  private lazy val artifactRunId =
    java.util.UUID.randomUUID().toString.take(8)

  def key(df: DataFrame, kind: String, params: String): String = {
    val canon = df.queryExecution.analyzed.canonicalized
    // A canonicalized LocalRelation prints its SCHEMA but not its rows
    // — two different in-memory corpora with the same shape would
    // collide on the plan string alone. Fold the row bytes in for
    // local leaves (file sources are distinguished by their location).
    val localData = canon.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        scala.util.hashing.MurmurHash3.orderedHash(l.data)
    }.mkString(",")
    val plan = canon.toString + "|" + localData
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(plan.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$kind-$h-$params"
  }

  def materializedOnce(df: DataFrame, key: String)
      (build: => DataFrame): DataFrame = {
    val spark = df.sparkSession
    val path = synchronized {
      artifacts.getOrElseUpdate(key, {
        val base = spark.conf.getOption("spark.graft.artifactDir")
          .getOrElse(sys.props("java.io.tmpdir") +
            s"/graft-artifacts-$artifactRunId")
        val p = s"$base/$key"
        build.write.mode("overwrite").parquet(p)
        p
      })
    }
    spark.read.parquet(path)
  }

  /** Drop the registry (next call re-derives and re-writes). Needed
    * only if an input table was overwritten IN PLACE.
    */
  def clear(): Unit = synchronized { artifacts.clear() }
}
