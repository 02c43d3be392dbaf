package graft.ops

import org.apache.spark.sql.DataFrame

/** Write-once parquet artifact registry shared by the curation APIs
  * ([[CurationOps.pairsTable]]/`labelsTable`, [[SemanticOps]] twins):
  * a derivation keyed on the canonicalized input plan PLUS the input's
  * file snapshot is built and written exactly once and read back as a
  * plain file scan afterwards — the shape a 100 TB run persists anyway
  * (derive the pair/label tables once, point every audit at them).
  *
  * Staleness safety: the key folds in every input file's
  * (path, size, mtime), taken from the plan's own FileIndex listing
  * (driver-side metadata the scan already performed — no extra
  * namenode round-trips). Overwriting an input table IN PLACE changes
  * the snapshot, so the next consumer call re-derives automatically;
  * no manual `clear()` is required for correctness.
  *
  * Cross-session durability: with `spark.graft.artifactDir` set, the
  * directory is treated as a durable cache — an artifact whose
  * `_SUCCESS`-marked output already exists under the pinned dir (same
  * plan, same file snapshot, same params) is read back with ZERO
  * derivation work even in a fresh session. Unset, artifacts land in
  * a session-UUID'd tmpdir and every new session re-derives (the
  * in-memory registry alone gates rebuilds within a session).
  */
private[graft] object ArtifactStore {

  private val artifacts =
    scala.collection.mutable.Map.empty[String, String]

  /** Session-unique base dir (override: spark.graft.artifactDir). */
  private lazy val artifactRunId =
    java.util.UUID.randomUUID().toString.take(8)

  /** Fold (path, size, mtime) of every file the plan's scans will read
    * into `md` — pulled from the FileIndex the relation already holds
    * (statuses are cached there; this is a pure driver-side metadata
    * walk). Each status is digested individually (sorted for
    * determinism), never concatenated into one listing string: at
    * 100 TB a table is millions of files and an O(files) string
    * allocation per consumer call is real driver pressure, while the
    * digest's running state is constant-size. Sources without a
    * FileIndex (in-memory relations) contribute nothing here and are
    * covered by the row-bytes fold in [[key]].
    */
  private def digestFileSnapshot(df: DataFrame,
      md: java.security.MessageDigest): Unit = {
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRelation => lr.relation match {
        case r: HadoopFsRelation =>
          r.location.listFiles(Nil, Nil).iterator.flatMap(_.files)
            .map(f =>
              s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
            .toArray.sorted
            .foreach { s =>
              md.update(s.getBytes("UTF-8")); md.update(';'.toByte)
            }
          md.update('|'.toByte)
        case _ => ()
      }
      case _ => ()
    }
  }

  /** Derivation-format epoch folded into every key: keys are
    * content-addressed on INPUTS (plan + file snapshot + params),
    * which cannot observe a CODE change to the derivation itself —
    * without this, a durable `spark.graft.artifactDir` cache would
    * keep serving results computed by the OLD derivation after an
    * engine upgrade changes what the same key is supposed to contain
    * (round 8's count-scaled semantic banding changed the sempairs
    * derivation under unchanged inputs+params; round 9 raised every
    * key space's resolution ceiling to 16 bits, changing knngraph /
    * sempairs / semlabels above ~8k rows). Bump on any semantic
    * change to an artifact-producing derivation; stranded old-epoch
    * entries are reclaimed by [[vacuum]].
    */
  private val FORMAT_EPOCH = "e9"

  def key(df: DataFrame, kind: String, params: String): String = {
    val canon = df.queryExecution.analyzed.canonicalized
    // A canonicalized LocalRelation prints its SCHEMA but not its rows
    // — two different in-memory corpora with the same shape would
    // collide on the plan string alone. Fold the row bytes in for
    // local leaves; file sources are distinguished by their location
    // AND pinned to a point-in-time content identity by the
    // (path,size,mtime) snapshot, so an in-place overwrite can never
    // serve a stale artifact.
    val localData = canon.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        scala.util.hashing.MurmurHash3.orderedHash(l.data)
    }.mkString(",")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(FORMAT_EPOCH.getBytes("UTF-8"))
    md.update('|'.toByte)
    md.update(canon.toString.getBytes("UTF-8"))
    md.update('|'.toByte)
    md.update(localData.getBytes("UTF-8"))
    md.update('|'.toByte)
    digestFileSnapshot(df, md)
    val h = md.digest().map("%02x".format(_)).mkString
    s"$kind-$h-$params"
  }

  /** `partitionBy`: hive-style partition columns for the artifact's
    * layout — the store-side lever that turns a key-restricted probe
    * into a partition-PRUNED scan (read nprobe directories, not the
    * table). Readback note: a partition column comes back type-
    * INFERRED (small integral values read as INT) and ordered last;
    * callers that join on it rely on Spark's UnwrapCastInBinary-
    * Comparison keeping pruning intact under the int/long coercion,
    * and callers that filter should compare against int literals.
    */
  def materializedOnce(df: DataFrame, key: String,
      partitionBy: Seq[String] = Nil)
      (build: => DataFrame): DataFrame = {
    val spark = df.sparkSession
    val durableBase = spark.conf.getOption("spark.graft.artifactDir")
    val path = synchronized {
      artifacts.getOrElseUpdate(key, {
        val base = durableBase.getOrElse(sys.props("java.io.tmpdir") +
          s"/graft-artifacts-$artifactRunId")
        val p = s"$base/$key"
        // a pinned artifactDir is a durable cross-session cache: a
        // committed (_SUCCESS) artifact under the same content-
        // addressed key is the same derivation — read it back, skip
        // the build entirely
        val committed = durableBase.isDefined && {
          val marker = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
          marker.getFileSystem(spark.sessionState.newHadoopConf())
            .exists(marker)
        }
        if (!committed)
          build.write.mode("overwrite").partitionBy(partitionBy: _*)
            .parquet(p)
        p
      })
    }
    spark.read.parquet(path)
  }

  /** [[materializedOnce]] for PATH-shaped artifacts whose layout the
    * caller owns (e.g. the streaming gates' stamped replay tree,
    * where strictly-increasing part-file mtimes are part of the
    * artifact): runs `build(path)` exactly once per key and returns
    * the path. The durable-cache reuse check keys on pathOnce's OWN
    * completion marker, written only after `build(p)` fully returns —
    * NOT on Spark's `_SUCCESS`, which a builder's parquet write drops
    * before any post-write fixups (e.g. replay-order mtime stamping),
    * so a crash mid-build can never leave a committed-looking tree a
    * later session would reuse with a half-applied layout.
    */
  def pathOnce(df: DataFrame, key: String)
      (build: String => Unit): String = {
    val spark = df.sparkSession
    val durableBase = spark.conf.getOption("spark.graft.artifactDir")
    synchronized {
      artifacts.getOrElseUpdate(key, {
        val base = durableBase.getOrElse(sys.props("java.io.tmpdir") +
          s"/graft-artifacts-$artifactRunId")
        val p = s"$base/$key"
        val marker = new org.apache.hadoop.fs.Path(p, "_GRAFT_COMMITTED")
        val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
        val committed = durableBase.isDefined && fs.exists(marker)
        if (!committed) {
          build(p)
          fs.create(marker, true).close()
        }
        p
      })
    }
  }

  /** Drop the in-memory registry. No longer needed for staleness
    * (the key's file snapshot handles in-place overwrites); kept as
    * the explicit "fresh registry" hook for tests and for forcing a
    * re-derive into a NEW tmp path. A durable `spark.graft.
    * artifactDir` cache survives this by design — delete the
    * directory itself to invalidate it.
    */
  def clear(): Unit = synchronized { artifacts.clear() }

  /** Reclaim dead derivations from a durable `spark.graft.artifactDir`
    * cache. Content-addressed keys ACCUMULATE by design — every
    * in-place overwrite of an input changes its file snapshot, mints a
    * new key, and strands the previous key's directory, which nothing
    * will ever read again. This is the retention GC a long-lived cache
    * needs: delete cache entries that are (a) not referenced by this
    * session's live registry and (b) older than `retainMs` (mtime of
    * the entry's `_SUCCESS` commit marker — uncommitted/partial trees
    * from a crashed build are reclaimed on age too). Returns the
    * deleted entry names. A no-op (Nil) when no durable dir is
    * configured: session-UUID'd tmpdir caches die with the JVM's
    * tmpdir and never accumulate across runs.
    */
  def vacuum(spark: org.apache.spark.sql.SparkSession,
      retainMs: Long = 7L * 24 * 3600 * 1000): Seq[String] =
    spark.conf.getOption("spark.graft.artifactDir") match {
      case None => Nil
      case Some(base) => synchronized {
        val basePath = new org.apache.hadoop.fs.Path(base)
        val fs = basePath.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(basePath)) Nil
        else {
          val live = artifacts.values.toSet
          val cutoff = System.currentTimeMillis() - retainMs
          fs.listStatus(basePath).toSeq
            .filter(_.isDirectory)
            // registry values are "$base/$key" strings while listStatus
            // returns qualified URIs — match on the content-addressed
            // entry name, which is unique by construction
            .filterNot(st =>
              live.exists(_.endsWith("/" + st.getPath.getName)))
            .filter { st =>
              val marker = new org.apache.hadoop.fs.Path(st.getPath,
                "_SUCCESS")
              val mtime = if (fs.exists(marker))
                fs.getFileStatus(marker).getModificationTime
              else st.getModificationTime
              mtime < cutoff
            }
            .map { st => fs.delete(st.getPath, true); st.getPath.getName }
        }
      }
    }
}
