package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event row as seen by the streaming pipeline (event-time as a proper
  * timestamp so watermarks apply).
  */
case class StreamEvent(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Closed session emitted by [[StreamingOps.sessionize]]. */
case class SessionSummary(
    user_id: Long,
    start_us: Long,
    end_us: Long,
    n_events: Long)

/** Open-session state carried between micro-batches. */
case class SessionState(start_us: Long, last_us: Long, n_events: Long)

/** Decayed per-type engagement total emitted by
  * [[StreamingOps.decayedCounts]] each micro-batch.
  */
case class DecayedTotal(
    event_type: String,
    ref_week: Long,
    total_q20: Long,
    n_events: Long)

/** Decayed-counter state: reference week + Q20 fixed-point total. */
case class DecayState(ref_week: Long, total_q20: Long, n_events: Long)

/** Transition edge emitted by [[StreamingOps.transitionsStream]]. */
case class TransitionEdge(user_id: Long, prev_type: String, next_type: String)

/** Last-seen-event state for [[StreamingOps.transitionsStream]]. */
case class LastEventState(last_us: Long, last_type: String)

/** Incoming document as seen by [[StreamingOps.quotaAdmissionStream]]. */
case class DocIngest(doc_id: Long, source: String, n_tokens: Long)

/** Per-source budget state: tokens SEEN (in processing order) so far. */
case class QuotaState(seen: Long)

/** Admitted document emitted by [[StreamingOps.quotaAdmissionStream]]. */
case class AdmittedDoc(
    source: String, doc_id: Long, n_tokens: Long, cum_tokens: Long)

/** Structured Streaming operators (SURVEY §2.11 — absent from the
  * reference, included as the engine's streaming seam; the batch twins
  * live in graft.queries.Events with identical semantics).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 min is dropped, state for closed windows is
  * evicted); sessionization state is one small case class per active
  * user, evicted by event-time timeout — both scale horizontally with
  * the shuffle partitioning on the group key.
  */
object StreamingOps {

  /** Schema of events.parquet with nanosecond timestamps surfaced as
    * LONG (matches `spark.sql.legacy.parquet.nanosAsLong=true`) — the
    * startup fallback when the stream directory has no files yet to
    * sniff an actual physical schema from.
    */
  val eventsNanosSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events-shaped parquet path, with
    * event-time lifted to TimestampType for watermarking. Streaming
    * readers cannot infer schemas, so the physical schema is sniffed
    * with ONE driver-side batch footer read of the same path; the
    * `ts` lift then adapts to whichever encoding the files carry
    * (nanos-as-LONG vs TIMESTAMP/NTZ — same contract as
    * [[graft.core.Tables]], which normalizes the batch side). An
    * empty directory — the canonical start-stream-then-drop-files
    * pattern — has no footers to sniff; it falls back to
    * [[eventsNanosSchema]] instead of failing startup.
    *
    * The file-stream source requires its base path to be a DIRECTORY
    * (it derives `basePath` for partition discovery from it), so a
    * path that is a single parquet file is streamed as its parent
    * directory + a `pathGlobFilter` on the file name — same file set,
    * valid base path. The file-vs-directory probe goes through the
    * path's own Hadoop FileSystem, so non-local stores resolve
    * correctly (java.io.File would silently treat every remote path
    * as a directory).
    */
  def readEventsStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val physical =
      try spark.read.parquet(path).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("infer schema") =>
          eventsNanosSchema
      }
    val reader0 = spark.readStream.schema(physical)
    // bound each micro-batch (replay/backfill knob); 0 = all new files
    val reader =
      if (maxFilesPerTrigger > 0)
        reader0.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader0
    val raw =
      if (fs.exists(hPath) && fs.getFileStatus(hPath).isFile)
        reader.option("pathGlobFilter", hPath.getName)
          .parquet(hPath.getParent.toString)
      else reader.parquet(path)
    physical.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Streaming JSONL ingest with the same PERMISSIVE corrupt-line
    * quarantine contract as the batch
    * [[graft.sources.Sources.readJsonl]] — the continuous half of
    * corpus ingestion: producers drop `.jsonl` files into a directory,
    * each micro-batch parses only the new files (the file source
    * tracks seen files in the checkpoint), clean rows flow onward and
    * corrupt lines carry their raw text in `_corrupt_record` for
    * quarantine instead of failing the stream. Schema is explicit —
    * streaming readers cannot infer.
    */
  def readJsonlStream(
      spark: SparkSession,
      schema: StructType,
      dir: String): DataFrame =
    spark.readStream
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)

  /** Tumbling-window counts + sums with a watermark. Works unchanged on
    * a batch DataFrame (watermark is a no-op there) — the streaming twin
    * of q40_hourly_windows.
    */
  def windowedCounts(
      events: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming HyperLogLog register accumulation — continuous
    * distinct-counting as MERGEABLE STATE instead of a key set. The
    * state per group is exactly `buckets` small integers (max-rho
    * registers), so memory is O(groups·buckets) FOREVER — unlike
    * dedup-key state it never grows with cardinality and needs no
    * watermark eviction; this is how a 100 TB/day pipeline keeps
    * "distinct users per type, since launch" running continuously.
    * Registers are engine-portable by construction: the bucket is the
    * low log2(buckets) bits and rho the leading-zero run of the high
    * bits of the shared 60-bit md5-prefix hash
    * ([[graft.ops.TextOps.tokenHash]]), so an independent engine
    * computes bit-identical registers from the same rows — the
    * estimate is merely a projection of them. max() is commutative and
    * idempotent, so replay order, micro-batch boundaries and
    * at-least-once re-delivery all leave the registers unchanged.
    * Works unchanged on a batch DataFrame (the q246 parity gate's
    * oracle is exactly that).
    */
  def hllRegistersStream(
      events: DataFrame,
      groupCol: String,
      keyCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 1 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val lg = java.lang.Integer.numberOfTrailingZeros(buckets)
    val restBits = 60 - lg // tokenHash is a 60-bit md5 prefix
    events
      .select(col(groupCol),
        graft.ops.TextOps
          .tokenHash(concat(lit("hll:"), col(keyCol).cast("string")))
          .as("h"))
      .select(col(groupCol), (col("h") % buckets).as("bucket"),
        expr(s"h div $buckets").as("rest"))
      .select(col(groupCol), col("bucket"),
        when(col("rest") === 0, lit(restBits + 1))
          .otherwise(lit(restBits + 1) - length(bin(col("rest"))))
          .cast("long").as("rho0"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho0")).as("rho"))
  }

  /** Streaming exact-dedup — the streaming twin of q26: drop events
    * whose dedup key was already seen, KEY-ONLY (a re-delivery with a
    * different event-time is still a duplicate — the at-least-once
    * source case), with state bounded by the watermark: a key's state
    * is evicted once the watermark passes it, so memory is
    * O(keys-per-watermark-window), not O(stream). At 100 TB/day this
    * is the standard ingest-dedup front of a training pipeline; key by
    * a content hash for payload dedup.
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming NEAR-dup ingest filter: drop an incoming document if a
    * document with the same SimHash fingerprint was already admitted
    * inside the watermark horizon. The fingerprint is the SAME
    * per-row expression chain the batch dedup pack uses
    * ([[graft.ops.DedupOps.simhash]] over trigram shingle hashes —
    * pure Catalyst columns, so they run unchanged under the
    * micro-batch planner), and the state is the watermark-bounded
    * key set `dropDuplicatesWithinWatermark` maintains: a fingerprint
    * is remembered only as long as the watermark can still admit a
    * colliding late arrival. Exact-dup streaming filtering is
    * [[dedupStream]]; this catches whitespace/reorder-level near-dups
    * at signature granularity — the banded candidate-PAIR pipeline
    * stays a batch job (it needs a self-join; see Dedup q28-q31).
    */
  def neardupDedupStream(
      docs: DataFrame,
      textCol: String = "text",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.ops.{DedupOps, TextOps}
    docs
      // tokens materialized as a column first: the shingle lambda
      // indexes its input per n-gram slot, and a raw tokens(text)
      // expression would re-tokenize per element_at (see
      // SelectionOps.greedyCoverage — O(shingles·n) blowup per row)
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("__simhash",
        DedupOps.simhash(DedupOps.shingleHashes(
          DedupOps.shingles(col("__toks")))))
      .drop("__toks")
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("__simhash")
      .drop("__simhash")
  }

  /** Streaming admission against a HISTORICAL corpus — the streaming
    * twin of q115: a bloom bitmap built offline over the corpus's
    * content hashes ([[graft.ops.BloomOps.build]]) embeds in the
    * per-row filter, so rows the bloom clears are admitted as
    * definitely-new with NO join and no state; only the "maybe seen"
    * rows (true dups + collisions) take the stream-static left-outer
    * confirm against the exact corpus key set, and of those only
    * genuinely-new rows survive. No false negatives ⇒ the admitted
    * set equals the plain exact anti-join per micro-batch
    * (StreamingSpec pins this). Compose [[dedupStream]] in front for
    * in-stream re-deliveries; rebuild/re-broadcast the bitmap on the
    * corpus-compaction cadence.
    */
  def bloomAdmissionStream(
      stream: DataFrame,
      corpusKeys: DataFrame,
      bitmap: Array[Long],
      keyCol: String,
      m: Int = 1 << 16,
      k: Int = 3): DataFrame = {
    import graft.ops.BloomOps
    val pk = corpusKeys.select(col(keyCol)).distinct()
      .withColumn("__seen", lit(1L))
    val flagged = stream
      .withColumn("__maybe", BloomOps.mightContain(bitmap, col(keyCol), m, k))
    val clear = flagged.filter(!col("__maybe"))
    val confirmedNew = flagged.filter(col("__maybe"))
      .join(pk, Seq(keyCol), "left")
      .filter(col("__seen").isNull)
      .drop("__seen")
    // unionByName, not positional union: the equi-join above moves the
    // key column to the front of confirmedNew's schema, so a
    // positional union would misalign every multi-column stream
    // (caught by the q234 gate; the single-column spec never saw it)
    clear.unionByName(confirmedNew).drop("__maybe")
  }

  /** Stamp strictly increasing modification times onto `files` in the
    * given order so the file-stream source (oldest-mtime-first pick)
    * replays them deterministically — a simultaneous bulk write leaves
    * equal mtimes and the tie-break to listing order. Replay gates
    * that depend on file ORDER (append-mode parity over stateful ops)
    * call this on their staged files before starting the stream. ONE
    * copy of the ordering contract, shared by the events replay
    * scaffold and the SCD2 snapshot replay.
    */
  def stampReplayOrder(fs: org.apache.hadoop.fs.FileSystem,
      files: Seq[org.apache.hadoop.fs.Path]): Unit =
    if (files.nonEmpty) {
      val base = files.map(p => fs.getFileStatus(p).getModificationTime).max
      files.zipWithIndex.foreach { case (p, i) =>
        fs.setTimes(p, base + (i + 1) * 1000L, -1L)
      }
    }

  /** Run `body` with `spark.sql.shuffle.partitions` scoped DOWN to at
    * most `n` (never raised above the session's configured value),
    * restoring the conf afterwards. Streaming replay gates fix their
    * state-store partition count at stream START from this conf, and
    * gate-sized state gains nothing from more partitions while paying
    * per-partition state commits per store per micro-batch. ONE copy
    * of the save/set/restore semantics for every replay scaffold.
    */
  def withShufflePartitions[T](spark: org.apache.spark.sql.SparkSession,
      n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, math.min(n, prev.toInt).toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Run `body` with the streaming state store backed by a different
    * provider (conf saved/restored like [[withShufflePartitions]]).
    * The interesting value is RocksDB
    * (`org.apache.spark.sql.execution.streaming.state
    * .RocksDBStateStoreProvider`): the default HDFS-backed provider
    * holds every partition's state map ON HEAP, so a 100 TB deployment
    * whose keyed state (sessions over billions of users, dedup keys
    * over a day's documents) exceeds executor memory OOMs; RocksDB
    * keeps state off-heap in native storage with incremental
    * changelog checkpointing, making state size a disk problem
    * instead of a heap problem. The provider is chosen when a query
    * STARTS, so scoping the conf around start() is sufficient and
    * queries running outside `body` are untouched.
    */
  def withStateStoreProvider[T](spark: org.apache.spark.sql.SparkSession,
      providerClass: String)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, providerClass)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Stream-static enrichment join: each micro-batch joins against a
    * static dimension with the planner's normal join selection (a dim
    * under the broadcast threshold broadcasts automatically; a huge
    * one falls back to a shuffle join instead of forcing an 8 GB+
    * broadcast every batch). No state is kept: the static side is
    * re-resolved per batch, so a dim refresh is picked up without
    * restarting.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    events.join(dim, keys)

  /** Idempotent per-batch parquet write: each micro-batch lands in its
    * own `batch_id=N` directory with overwrite semantics, so a RETRIED
    * batch (at-least-once delivery after a failure) replaces its own
    * prior output instead of appending duplicates. Readers see the
    * inferred `batch_id` partition column (useful provenance).
    *
    * Caveats a deployment must respect: the per-batch overwrite is not
    * atomic for a reader scanning the tree DURING a (re)write of that
    * batch — batch-level atomicity needs the built-in file sink's
    * `_spark_metadata` manifest or a table format with commit
    * protocol; this recipe trades that for replay-idempotence on
    * object stores without atomic rename, where readers consume
    * completed batches (e.g. downstream batch jobs), not in-flight
    * ones.
    */
  def writeBatchIdempotent(batch: DataFrame, path: String,
      batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** Exactly-once file sink via foreachBatch + [[writeBatchIdempotent]]
    * (checkpointed batch ids + idempotent per-batch dirs is the
    * standard Structured Streaming exactly-once recipe for object
    * stores without atomic rename).
    */
  def exactlyOnceParquetSink(
      events: DataFrame,
      path: String,
      checkpoint: String,
      outputMode: String = "append")
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        writeBatchIdempotent(batch.toDF(), path, batchId)
      }
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Latest committed batch dir under an [[exactlyOnceParquetSink]]
    * path, if any — the read side of the idempotent
    * `batch_id=<n>` convention (for complete-mode sinks the highest
    * batch IS the current full result; same resolution rule as
    * [[readScd2History]]).
    */
  def readLatestBatch(
      spark: SparkSession, path: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else {
      val batches = fs.listStatus(root).toSeq
        .filter(st =>
          st.isDirectory && st.getPath.getName.startsWith("batch_id="))
        .flatMap(st => scala.util.Try(
          st.getPath.getName.stripPrefix("batch_id=").toLong)
          .toOption.map(_ -> st.getPath))
      if (batches.isEmpty) None
      else Some(spark.read.parquet(batches.maxBy(_._1)._2.toString))
    }
  }

  /** Streaming SCD Type-2 maintenance — the continuous twin of
    * [[graft.ops.ScdOps.scd2Apply]] (q162): each micro-batch is a full
    * dimension snapshot (CDC-compacted upstream), applied to the
    * effective-dated history with the batch's max `effectiveCol` as
    * the as-of instant. The history lives in versioned parquet dirs
    * keyed by batch id (`writeBatchIdempotent` recipe), so a REPLAYED
    * batch after a crash rewrites its own version dir instead of
    * double-applying — the read side ([[readScd2History]]) always
    * resolves the highest completed version. Per batch the cost is
    * one full-outer PK join of current-vs-snapshot; closed history
    * passes through (ScdOps contract), so state growth is the change
    * rate, not the batch rate.
    */
  def scd2Sink(
      snapshots: DataFrame,
      historyDir: String,
      checkpoint: String,
      keys: Seq[String],
      tracked: Seq[String],
      effectiveCol: String): org.apache.spark.sql.streaming.StreamingQuery =
    snapshots.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // one-row driver edge: the batch's effective instant
          val asOf = batch.agg(max(col(effectiveCol))).head.get(0)
          val snap = batch.drop(effectiveCol)
          // resolve strictly BELOW this batch id: a replayed batch must
          // apply against its predecessor's history, never read the
          // partial output it wrote before the crash
          val hist = readScd2History(spark, historyDir,
              maxExclusive = Some(batchId)).getOrElse {
            // bootstrap: an empty history with the right shape — every
            // first-batch key inserts at version 1
            snap.limit(0)
              .withColumn("valid_from",
                lit(null).cast("timestamp"))
              .withColumn("valid_to", lit(null).cast("timestamp"))
              .withColumn("version", lit(1L))
          }
          graft.ops.ScdOps
            .scd2Apply(hist, snap, keys, tracked, lit(asOf))
            .write.mode("overwrite")
            .parquet(s"$historyDir/v=$batchId")
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Point-in-time stream enrichment — the streaming twin of the
    * q164 temporal join: each event joins the dimension version that
    * was CURRENT at its event time (`valid_from <= ts < valid_to`,
    * open rows match onward). A stream-static LEFT join on the
    * dimension key with the validity range as a residual: the static
    * side re-plans per micro-batch (so a refreshed history is picked
    * up), the probe stays hash-keyed — O(versions) residual rows per
    * key, never a range scan. Events with no dimension row (or
    * before its first version) pass through with NULL attributes
    * rather than silently dropping.
    */
  def enrichPointInTime(
      events: DataFrame,
      history: DataFrame,
      eventKey: String,
      dimKey: String,
      eventTime: String = "ts"): DataFrame =
    events.join(history,
      events(eventKey) === history(dimKey) &&
        history("valid_from") <= events(eventTime) &&
        (history("valid_to").isNull ||
          events(eventTime) < history("valid_to")),
      "left")

  /** Latest completed SCD2 history under `historyDir`, if any —
    * resolves the highest `v=<batchId>` version dir (the idempotent-
    * replay convention of [[scd2Sink]]).
    */
  def readScd2History(
      spark: SparkSession, historyDir: String,
      maxExclusive: Option[Long] = None): Option[DataFrame] = {
    // Hadoop FS, not java.io — the history dir may be HDFS/S3/…
    val root = new org.apache.hadoop.fs.Path(historyDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else {
      val versions = fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
        .flatMap(st => scala.util.Try(
          st.getPath.getName.stripPrefix("v=").toLong)
          .toOption.map(_ -> st.getPath))
        .filter { case (v, _) => maxExclusive.forall(v < _) }
      if (versions.isEmpty) None
      else Some(spark.read.parquet(versions.maxBy(_._1)._2.toString))
    }
  }

  /** Stream-stream interval join — the streaming twin of
    * q64_interval_join: for each purchase, the views by the same user
    * in the preceding `lookback` window, matched as the two streams
    * flow. Both sides carry watermarks and the join condition bounds
    * event-time in BOTH directions (equi key + time range), which is
    * exactly what Structured Streaming needs to know when a buffered
    * row can never match again: state per side is bounded by
    * watermark + lookback, evicted continuously — not an unbounded
    * buffer. (Batch twin: the binned equi-join in
    * [[graft.ops.RangeOps.intervalJoin]]; here the micro-batch
    * planner does the range-state bookkeeping instead of binning.)
    */
  def intervalJoinStream(
      purchases: DataFrame,
      views: DataFrame,
      watermarkDelay: String = "10 minutes",
      lookback: String = "30 minutes"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    val v = views
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermarkDelay)
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(s"interval $lookback") &&
        col("v_ts") <= col("p_ts"))
      .select(col("p_id"), col("v_id"), col("p_user").as("user_id"),
        col("p_ts"), col("v_ts"))
  }

  /** Streaming exponentially-decayed engagement counter — the
    * incremental half of q135: per event type, maintain
    * `Σ value·2^(−age_weeks)` as Q20 fixed point (20 fractional bits),
    * advancing the reference week by right-shifting the stored total —
    * the halving that power-of-two decay IS. Per-event contributions are
    * `cents << (20 − age)`; while every live term is within the 20-week
    * horizon the shift-advance is bit-exact (the shifted-out bits are
    * zero by construction), and terms older than the horizon truncate
    * monotonically below one cent. State is one 3-long case class per
    * key — O(|event types|), watermark-free, and the update is
    * associative across micro-batches, so the counter never recomputes
    * history (the property the batch q135 pays a full scan for).
    * Update-mode output: each batch emits the refreshed totals for the
    * keys it touched.
    */
  def decayedCounts(
      events: Dataset[StreamEvent],
      weekUs: Long = 7L * 24 * 3600 * 1000000L): Dataset[DecayedTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[DecayState, DecayedTotal](
        GroupStateTimeout.NoTimeout) { (key, batch, state) =>
        var st = state.getOption.getOrElse(DecayState(Long.MinValue, 0L, 0L))
        // order within the batch is irrelevant to the result (the
        // update is commutative given the final ref week), but advance
        // the reference first so every add uses one shift path
        val evs = batch.toSeq
        val maxWeek = evs.map(e => us(e.ts) / weekUs).max
        if (maxWeek > st.ref_week) {
          val d = math.min(maxWeek - st.ref_week, 63L).toInt
          val carried = if (st.ref_week == Long.MinValue) 0L
            else st.total_q20 >> d
          st = DecayState(maxWeek, carried, st.n_events)
        }
        evs.foreach { e =>
          val age = st.ref_week - us(e.ts) / weekUs
          val cents = math.round(e.value * 100)
          val add =
            if (age > 20) 0L else cents << (20 - age.toInt)
          st = st.copy(total_q20 = st.total_q20 + add,
            n_events = st.n_events + 1)
        }
        state.update(st)
        DecayedTotal(key, st.ref_week, st.total_q20, st.n_events)
      }
  }

  /** Gap-based sessionization with typed per-user state
    * (flatMapGroupsWithState + event-time timeout): emits a
    * SessionSummary whenever a 30-min (default) inactivity gap closes a
    * session, or when the watermark times the user out. Streaming twin
    * of q41_sessionization.
    */
  def sessionize(
      events: Dataset[StreamEvent],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    // µs-exact event time from the Timestamp's nanos field — getTime
    // truncates to ms, which would diverge from the µs-exact batch twin
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, batch, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(userId, s.start_us, s.last_us, s.n_events))
          } else {
            val sorted = batch.toSeq.sortBy(e => (us(e.ts), e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionSummary]
            sorted.foreach { e =>
              val t = us(e.ts)
              open match {
                case Some(s) if t - s.last_us > gapUs =>
                  closed += SessionSummary(userId, s.start_us, s.last_us, s.n_events)
                  open = Some(SessionState(t, t, 1L))
                case Some(s) =>
                  // late-but-within-watermark events from a later
                  // micro-batch must never rewind the session end (or
                  // start): fold them in monotonically
                  open = Some(SessionState(math.min(s.start_us, t),
                    math.max(s.last_us, t), s.n_events + 1L))
                case None =>
                  open = Some(SessionState(t, t, 1L))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                // time the session out once the watermark passes its
                // gap — clamped to just above the CURRENT watermark:
                // on a replay/backfill feed a batch can consist
                // entirely of late-but-within-watermark events folded
                // into a session whose natural timeout already passed,
                // and Spark rejects a timeout below the watermark
                // (stream crash). The clamp re-arms at the watermark
                // edge so the stale session closes on the next
                // watermark advance instead.
                state.setTimeoutTimestamp(math.max(
                  s.last_us / 1000L + gapMinutes * 60000L,
                  state.getCurrentWatermarkMs() + 1L))
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming token-quota admission — the continuous twin of the
    * batch quota-filled draw (q179): each source owns a fixed token
    * budget; arriving documents are admitted while the source's
    * cumulative token count stays within it. State is ONE counter per
    * source (tokens seen), so the operator scales with |sources|, not
    * |docs|, and distributes on the source grouping key.
    *
    * Semantics mirror the batch draw's strict PREFIX fill: the counter
    * advances for every document processed, admitted or not, so one
    * oversized document at the boundary closes the budget exactly as
    * the batch cumulative-sum cut does. Within a micro-batch documents
    * are processed in the batch twin's (stable draw-hash, doc_id)
    * order; across batches, arrival order stands in for hash order —
    * on a feed that arrives in draw order the admitted set equals the
    * batch q179 draw exactly (spec-pinned).
    */
  def quotaAdmissionStream(
      docs: Dataset[DocIngest], quota: Long): Dataset[AdmittedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def drawHash(docId: Long): Long =
      graft.plans.Md5PrefixLongExpr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"draw:$docId"))

    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[QuotaState, AdmittedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source, batch, state) =>
          var seen = state.getOption.map(_.seen).getOrElse(0L)
          val out = Seq.newBuilder[AdmittedDoc]
          batch.toSeq.sortBy(d => (drawHash(d.doc_id), d.doc_id)).foreach {
            d =>
              seen += d.n_tokens
              if (seen <= quota)
                out += AdmittedDoc(source, d.doc_id, d.n_tokens, seen)
          }
          state.update(QuotaState(seen))
          out.result().iterator
      }
  }

  /** Streaming first-order transition edges — the stateful twin of the
    * batch Markov matrix (q148): one small "last event" state per
    * user, each arriving event emits its (prev_type → next_type) edge.
    * Downstream, a plain streaming `groupBy(prev,next).count()` (or
    * the batch q148 aggregation over the sink) turns edges into the
    * matrix, so the heavy object — the per-user ordered pass — runs
    * incrementally with O(users) state.
    *
    * Ordering contract: within a micro-batch events are processed in
    * (event-time, event_id) order, exactly like the batch window. A
    * cross-batch late event (still inside the watermark) is folded in
    * ARRIVAL position — the standard streaming approximation; beyond
    * the watermark it is dropped. On an in-order feed the emitted edge
    * multiset equals the batch twin's exactly (spec-pinned).
    */
  def transitionsStream(
      events: Dataset[StreamEvent],
      watermarkDelay: String = "10 minutes"): Dataset[TransitionEdge] = {
    val spark = events.sparkSession
    import spark.implicits._

    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEventState, TransitionEdge](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, batch, state) =>
          val sorted = batch.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var prev = state.getOption
          val out = Seq.newBuilder[TransitionEdge]
          sorted.foreach { e =>
            prev.foreach(p =>
              out += TransitionEdge(userId, p.last_type, e.event_type))
            prev = Some(LastEventState(us(e.ts), e.event_type))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }
}
