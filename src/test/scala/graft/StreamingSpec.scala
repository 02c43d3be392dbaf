package graft

import java.sql.Timestamp

import graft.core.GraftSession
import graft.streaming.{StreamEvent, StreamingOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def ev(id: Long, user: Long, minute: Long, tpe: String = "view") =
    StreamEvent(id, new Timestamp(minute * 60000L), user, tpe, 1.0)

  test("windowed counts aggregate by tumbling hour windows") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      input.addData(ev(1, 1, 5), ev(2, 1, 10), ev(3, 2, 65))
      query.processAllAvailable()
      val rows = spark.table("wc").collect()
      assert(rows.map(_.getAs[Long]("n_events")).sum === 3L)
      assert(rows.length === 2, "two distinct hour windows expected")
    } finally query.stop()
  }

  test("file-source stream over events parquet matches the batch window counts") {
    val dir = "/root/testdata/sf0.001"
    val stream = graft.streaming.StreamingOps
      .readEventsStream(spark, s"$dir/events.parquet")
    val query = graft.streaming.StreamingOps.windowedCounts(stream)
      .writeStream.format("memory").queryName("filewc")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("filewc")
        .agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
      val batch = spark.read.parquet(s"$dir/events.parquet").count()
      assert(streamed === batch,
        "every event must land in exactly one tumbling window")
    } finally query.stop()
  }

  test("file-source stream starts on an EMPTY directory (schema fallback)") {
    // canonical start-stream-then-drop-files pattern: no footers to
    // sniff yet, so readEventsStream must fall back to the fixed
    // events schema instead of failing startup; rows that arrive
    // later flow with the ts lift applied
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-empty")
    val stream = graft.streaming.StreamingOps
      .readEventsStream(spark, dir.toString)
    assert(stream.schema.fieldNames.contains("ts"))
    val query = graft.streaming.StreamingOps.windowedCounts(stream)
      .writeStream.format("memory").queryName("emptywc")
      .outputMode("complete").start()
    try {
      query.processAllAvailable() // zero batches, but startup succeeded
      // arriving files must carry the fallback's LONG-nanos layout —
      // write through the Tables normalizer
      val src = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
      src.write.mode("append").parquet(dir.toString)
      query.processAllAvailable()
      val streamed = spark.table("emptywc")
        .agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
      assert(streamed === src.count())
    } finally query.stop()
  }

  test("wide-column bucket average (A6) is a single projection") {
    val sq = spark
    import sq.implicits._
    val df = Seq((1L, 1.0, 2.0, 3.0, 9.0), (2L, 4.0, 4.0, 4.0, 0.0))
      .toDF("id", "t1", "t2", "t3", "t4")
    val out = graft.ops.BucketOps.bucketAverage(
      df, Seq(org.apache.spark.sql.functions.col("id")),
      Seq("t1", "t2", "t3", "t4"), 2, "b")
    val rows = out.orderBy("id").collect()
    assert(rows(0).getDouble(1) === 1.5 && rows(0).getDouble(2) === 6.0)
    assert(rows(1).getDouble(1) === 4.0 && rows(1).getDouble(2) === 2.0)
    assert(!out.queryExecution.executedPlan.toString.contains("Join"),
      "bucket averaging must not join")
  }

  test("sessionize closes a session when the 30-min gap is exceeded") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // NOTE: event-time 0 would be == the initial watermark and get
      // dropped by the late filter — start away from epoch 0.
      input.addData(ev(1, 7, 100), ev(2, 7, 110))
      query.processAllAvailable()
      assert(spark.table("sess").count() === 0, "session still open")
      // 2h later: closes the first session (gap) in the same batch
      input.addData(ev(3, 7, 230))
      query.processAllAvailable()
      val closed = spark.table("sess").collect()
      assert(closed.length === 1)
      assert(closed.head.getAs[Long]("n_events") === 2L)
      assert(closed.head.getAs[Long]("start_us") === 100L * 60000000L)
      assert(closed.head.getAs[Long]("end_us") === 110L * 60000000L)
    } finally query.stop()
  }

  test("sessionize survives replayed events older than the watermark") {
    // Spark's late-event filter runs on the PREVIOUS batch's watermark
    // while timeout validation runs on the CURRENT one — so a file
    // feed (one file per micro-batch, no catch-up batches in between)
    // can deliver an event that passes the filter yet folds into a
    // session whose natural timeout is far below the validation
    // watermark. Unclamped, setTimeoutTimestamp crashes the stream
    // right there; the clamp re-arms at the watermark edge instead.
    // (A MemoryStream can't reproduce this: processAllAvailable runs
    // catch-up batches that close the one-batch watermark lag.)
    val sq = spark
    import sq.implicits._
    val feed = java.nio.file.Files.createTempDirectory("sess-replay")
    def feedFile(name: String, mtime: Long, evs: StreamEvent*): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("seg").toString
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dest = new java.io.File(feed.toFile, name)
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000L
    feedFile("f0.parquet", t0, ev(1, 7, 100), ev(2, 9, 1000))
    // below the validation watermark (990) but above the lagging
    // late-filter watermark (0): folds into user 7's t=100 session
    feedFile("f1.parquet", t0 + 1000, ev(3, 7, 120))
    feedFile("f2.parquet", t0 + 2000, ev(4, 9, 2000))
    feedFile("f3.parquet", t0 + 3000, ev(5, 9, 3000))
    val src = spark.readStream
      .schema(Seq.empty[StreamEvent].toDS().schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feed.toString)
      .as[StreamEvent]
    val query = StreamingOps.sessionize(src)
      .writeStream.format("memory").queryName("sess_replay")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val u7 = spark.table("sess_replay").collect()
        .filter(_.getAs[Long]("user_id") == 7L)
      assert(u7.length === 1, "replayed session must close, not crash")
      assert(u7.head.getAs[Long]("n_events") === 2L,
        "the replayed event must fold into the session")
      assert(u7.head.getAs[Long]("end_us") === 120L * 60000000L)
    } finally query.stop()
  }

  test("streaming dedup drops repeated keys across micro-batches") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps
      .dedupStream(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1, 100), ev(1, 1, 100), ev(2, 1, 101))
      query.processAllAvailable()
      // event 2 re-delivered verbatim; event 1 re-delivered with a NEW
      // event-time (at-least-once source) — both are still duplicates
      input.addData(ev(2, 1, 101), ev(1, 1, 103), ev(3, 1, 102))
      query.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id"))
      assert(ids.sorted.toSeq === Seq(1L, 2L, 3L),
        "each key must survive exactly once across batches, key-only")
    } finally query.stop()
  }

  test("bloom admission stream equals the exact anti-join per batch") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val corpus = (1 to 200).map(i => s"seen-$i").toDF("k")
    val bitmap = graft.ops.BloomOps.build(corpus, "k", 1 << 14, 3)
    val input = MemoryStream[String]
    val query = StreamingOps
      .bloomAdmissionStream(input.toDF().withColumnRenamed("value", "k"),
        corpus, bitmap, "k", 1 << 14, 3)
      .writeStream.format("memory").queryName("bloomadm")
      .outputMode("append").start()
    try {
      input.addData("seen-5", "new-a", "seen-199", "new-b")
      query.processAllAvailable()
      input.addData("seen-1", "new-c")
      query.processAllAvailable()
      val admitted = spark.table("bloomadm").collect()
        .map(_.getString(0)).sorted.toSeq
      assert(admitted === Seq("new-a", "new-b", "new-c"),
        "admitted set must be exactly the stream keys absent from the corpus")
    } finally query.stop()
  }

  test("stream-static enrichment join broadcasts the dim per micro-batch") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val dim = Seq(("view", 1.0), ("click", 5.0)).toDF("event_type", "weight")
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps
      .enrichStream(input.toDF(), dim, Seq("event_type"))
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1, 100, "view"), ev(2, 1, 101, "click"),
        ev(3, 1, 102, "purchase")) // no dim row → dropped (inner join)
      query.processAllAvailable()
      val rows = spark.table("enrich").collect()
      assert(rows.length === 2)
      assert(rows.map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("weight")).toMap ===
        Map("view" -> 1.0, "click" -> 5.0))
    } finally query.stop()
  }

  test("exactly-once sink: a retried batch replaces rather than duplicates") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-eos").toString
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps.exactlyOnceParquetSink(
      input.toDF(), s"$dir/data", s"$dir/ckpt")
    try {
      input.addData(ev(1, 1, 100), ev(2, 1, 101))
      query.processAllAvailable()
      input.addData(ev(3, 2, 102))
      query.processAllAvailable()
      val all = spark.read.parquet(s"$dir/data")
      assert(all.count() === 3)
      // simulate an at-least-once REPLAY of batch 0 after a failure:
      // the idempotent writer must overwrite its own directory, so the
      // total is unchanged (an append sink would now show 5 rows)
      val replay = Seq(ev(1, 1, 100), ev(2, 1, 101)).toDF()
      StreamingOps.writeBatchIdempotent(replay, s"$dir/data", 0L)
      assert(spark.read.parquet(s"$dir/data").count() === 3,
        "retried batch must replace, not duplicate")
      assert(spark.read.parquet(s"$dir/data")
        .select("event_id").distinct().count() === 3)
    } finally query.stop()
  }

  test("sessionize folds late-but-within-watermark events without rewinding") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 9, 100), ev(2, 9, 110))
      query.processAllAvailable()
      // late event (t=105, within the 10-min watermark of max=110)
      // arrives in a LATER micro-batch: must not rewind last_us to 105
      input.addData(ev(3, 9, 105))
      query.processAllAvailable()
      input.addData(ev(4, 9, 230)) // gap > 30 min → closes the session
      query.processAllAvailable()
      val closed = spark.table("sess_late").collect()
      assert(closed.length === 1)
      assert(closed.head.getAs[Long]("n_events") === 3L)
      assert(closed.head.getAs[Long]("start_us") === 100L * 60000000L)
      assert(closed.head.getAs[Long]("end_us") === 110L * 60000000L,
        "a late event must never rewind the session end")
    } finally query.stop()
  }

  test("streaming near-dup filter drops same-fingerprint docs across batches") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val input = MemoryStream[StreamEvent]
    // event_type carries the document text for this test
    def doc(id: Long, minute: Long, text: String) =
      StreamEvent(id, new Timestamp(minute * 60000L), id, text, 1.0)
    val query = StreamingOps
      .neardupDedupStream(input.toDF(), textCol = "event_type")
      .writeStream.format("memory").queryName("nds")
      .outputMode("append").start()
    try {
      input.addData(
        doc(1, 10, "alpha beta gamma delta epsilon"),
        doc(2, 11, "one two three four five"))
      query.processAllAvailable()
      // identical text in a LATER batch → same simhash → dropped;
      // fresh text survives
      input.addData(
        doc(3, 12, "alpha beta gamma delta epsilon"),
        doc(4, 13, "lorem ipsum dolor sit amet"))
      query.processAllAvailable()
      val ids = spark.table("nds").collect()
        .map(_.getAs[Long]("event_id")).toSet
      assert(ids === Set(1L, 2L, 4L),
        "the re-sent document must be dropped, fresh ones admitted")
    } finally query.stop()
  }

  test("stream-stream interval join matches views in the purchase lookback") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val viewsIn = MemoryStream[StreamEvent]
    val purchIn = MemoryStream[StreamEvent]
    val joined = StreamingOps.intervalJoinStream(
      purchIn.toDF(), viewsIn.toDF())
    val query = joined.writeStream.format("memory").queryName("sij")
      .outputMode("append").start()
    try {
      // user 1: views at t=40 (outside 30-min lookback), t=80, t=95;
      // user 2: view at t=90 (other key) — purchase at t=100 by user 1
      viewsIn.addData(ev(1, 1, 40), ev(2, 1, 80), ev(3, 1, 95),
        ev(4, 2, 90))
      purchIn.addData(ev(10, 1, 100, "purchase"))
      query.processAllAvailable()
      val got = spark.table("sij").collect()
        .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("v_id"))).toSet
      assert(got === Set((10L, 2L), (10L, 3L)),
        "only same-user views inside [p_ts - 30 min, p_ts] may match")
      // a view arriving in a LATER micro-batch but inside the window
      // still joins (both sides buffer watermark-bounded state)
      viewsIn.addData(ev(5, 1, 99))
      query.processAllAvailable()
      assert(spark.table("sij").count() === 3)
    } finally query.stop()
  }

  test("streaming JSONL ingest quarantines corrupt lines per micro-batch") {
    import java.nio.file.Files
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl-stream")
    Files.writeString(dir.resolve("a.jsonl"),
      """{"doc_id": 1, "text": "alpha"}
        |{"doc_id": 2, "text": "beta"}""".stripMargin)
    Files.writeString(dir.resolve("b.jsonl"),
      """{"doc_id": 3, "text": "gamma"}
        |{broken line""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    var clean = 0L
    var dirty = 0L
    val query = StreamingOps
      .readJsonlStream(spark, schema, dir.toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // same contract as the batch source: persist before splitting
        // on _corrupt_record, then route the two halves
        val cached = batch.cache()
        clean += cached.filter(col("_corrupt_record").isNull).count()
        dirty += cached.filter(col("_corrupt_record").isNotNull).count()
        cached.unpersist()
        ()
      }
      .start()
    try query.processAllAvailable() finally query.stop()
    assert(clean === 3, "three well-formed documents must pass")
    assert(dirty === 1, "the malformed line must quarantine, not fail")
  }

  test("decayed counter halves across week boundaries and matches the closed form") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val weekMin = 7L * 24 * 60
    def evAt(id: Long, week: Long, v: Double, tpe: String = "click") =
      StreamEvent(id, new Timestamp(week * weekMin * 60000L), 1L, tpe, v)
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps.decayedCounts(input.toDS())
      .writeStream.format("memory").queryName("decay")
      .outputMode("update").start()
    try {
      // batch 1: two week-0 events
      input.addData(evAt(1, 0, 2.00), evAt(2, 0, 3.00))
      query.processAllAvailable()
      val b1 = spark.table("decay").collect().last
      assert(b1.getAs[Long]("total_q20") === 500L << 20,
        "week-0 total: 500 cents at weight 1.0")
      // batch 2: a week-2 event — the stored total must halve twice,
      // the new event lands at full weight
      input.addData(evAt(3, 2, 1.00))
      query.processAllAvailable()
      val b2 = spark.table("decay").collect().last
      val expected = ((500L << 20) >> 2) + (100L << 20)
      assert(b2.getAs[Long]("ref_week") === 2L)
      assert(b2.getAs[Long]("total_q20") === expected,
        "advance-by-shift must equal the closed-form decayed sum")
      assert(b2.getAs[Long]("n_events") === 3L)
      // closed form from scratch: 200*2^-2 + 300*2^-2 + 100*2^0 cents
      assert(expected === math.round((2.0 / 4 + 3.0 / 4 + 1.0) * 100) << 20)
    } finally query.stop()
  }

  test("streaming SCD2 sink applies snapshot batches and survives replay") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("scd2sink").toString
    val input = MemoryStream[(Long, String, Double, Timestamp)]
    val snaps = input.toDF().toDF("id", "seg", "bal", "eff_ts")
    val query = StreamingOps.scd2Sink(snaps, s"$dir/hist", s"$dir/ckpt",
      keys = Seq("id"), tracked = Seq("seg", "bal"), effectiveCol = "eff_ts")
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    try {
      // batch 0: bootstrap — both keys open at version 1
      input.addData((1L, "A", 10.0, t(1)), (2L, "B", 20.0, t(1)))
      query.processAllAvailable()
      // batch 1: key 1 changes segment, key 2 vanishes, key 3 appears
      input.addData((1L, "A2", 10.0, t(9)), (3L, "C", 30.0, t(9)))
      query.processAllAvailable()
      val hist = StreamingOps.readScd2History(spark, s"$dir/hist").get
      val got = hist
        .select(col("id"), col("seg"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("vf"),
          date_format(col("valid_to"), "yyyy-MM-dd").as("vt"),
          col("version"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          Option(r.getString(3)), r.getLong(4)))
        .toSet
      assert(got === Set(
        (1L, "A", "2024-01-01", Some("2024-01-09"), 1L),
        (1L, "A2", "2024-01-09", None, 2L),
        (2L, "B", "2024-01-01", Some("2024-01-09"), 1L),
        (3L, "C", "2024-01-09", None, 1L)))
      val histCount = hist.count()
      // replay: re-running batch 1's apply reads the history BELOW its
      // own id (never its pre-crash partial output) and overwrites its
      // version dir — idempotent
      val v0 = StreamingOps
        .readScd2History(spark, s"$dir/hist", maxExclusive = Some(1L)).get
      graft.ops.ScdOps.scd2Apply(v0,
          Seq((1L, "A2", 10.0), (3L, "C", 30.0)).toDF("id", "seg", "bal"),
          Seq("id"), Seq("seg", "bal"), lit(t(9)))
        .write.mode("overwrite").parquet(s"$dir/hist/v=1")
      val replayed = StreamingOps.readScd2History(spark, s"$dir/hist").get
      assert(replayed.count() === histCount)
    } finally query.stop()
  }

  test("point-in-time enrichment joins the version current at event time") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    import org.apache.spark.sql.functions._
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // two-version history for key 1; key 2 opens at day 9; key 3 absent
    val history = Seq(
      (1L, "A", t(1), Some(t(9)), 1L),
      (1L, "A2", t(9), None, 2L),
      (2L, "B", t(9), None, 1L))
      .toDF("id", "seg", "valid_from", "valid_to", "version")
    val input = MemoryStream[(Long, Long, Timestamp)]
    val events = input.toDF().toDF("event_id", "uid", "ts")
    val out = StreamingOps.enrichPointInTime(
      events, history, eventKey = "uid", dimKey = "id")
    val query = out.writeStream.format("memory").queryName("pit")
      .outputMode("append").start()
    try {
      input.addData(
        (10L, 1L, t(5)),  // key 1 during v1 -> A
        (11L, 1L, t(20)), // key 1 after the change -> A2
        (12L, 2L, t(5)),  // key 2 before its first version -> NULL
        (13L, 2L, t(10)), // key 2 during v1 -> B
        (14L, 3L, t(5)))  // unknown key -> NULL
      query.processAllAvailable()
      val got = spark.table("pit")
        .select(col("event_id"), col("seg"))
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(got === Set(
        (10L, Some("A")), (11L, Some("A2")), (12L, None),
        (13L, Some("B")), (14L, None)))
    } finally query.stop()
  }

  test("streaming transitions equal the batch Markov edges across batches") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps.transitionsStream(input.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      // user 7: view→click within batch 1; user 8: single event (no edge)
      input.addData(ev(1, 7, 100, "view"), ev(2, 7, 110, "click"),
        ev(3, 8, 105, "view"))
      query.processAllAvailable()
      // batch 2 continues BOTH users across the batch boundary — the
      // carried state must supply the prev side of the first new edge
      input.addData(ev(4, 7, 120, "purchase"), ev(5, 8, 130, "error"))
      query.processAllAvailable()
      val got = spark.table("trans").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("prev_type"),
          r.getAs[String]("next_type"))).toSet
      val want = Set(
        (7L, "view", "click"), (7L, "click", "purchase"),
        (8L, "view", "error"))
      assert(got === want, s"edge multiset must match batch twin: $got")
    } finally query.stop()
  }

  test("quota admission stream equals the batch prefix draw on an ordered feed") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext

    def drawHash(id: Long): Long = graft.plans.Md5PrefixLongExpr.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"draw:$id"))

    val quota = 100L
    val docs = (1L to 10L).map(i =>
      graft.streaming.DocIngest(i, if (i % 2 == 0) "a" else "b", 10L + i * 3L))

    // batch twin: per-source (hash, id) order, cumulative sum, keep <= quota
    val want = docs.groupBy(_.source).flatMap { case (src, ds) =>
      val ordered = ds.sortBy(d => (drawHash(d.doc_id), d.doc_id))
      val cums = ordered.scanLeft(0L)(_ + _.n_tokens).tail
      ordered.zip(cums).takeWhile(_._2 <= quota)
        .map { case (d, c) => (src, d.doc_id, d.n_tokens, c) }
    }.toSet
    assert(want.nonEmpty && want.size < docs.size,
      "fixture must exercise the quota boundary")

    val input = MemoryStream[graft.streaming.DocIngest]
    val query = graft.streaming.StreamingOps
      .quotaAdmissionStream(input.toDS(), quota)
      .writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    try {
      // feed in draw order, split across two micro-batches per source
      val bySrc = docs.groupBy(_.source).view.mapValues(
        _.sortBy(d => (drawHash(d.doc_id), d.doc_id))).toMap
      input.addData(bySrc.values.flatMap(_.take(2)).toSeq: _*)
      query.processAllAvailable()
      input.addData(bySrc.values.flatMap(_.drop(2)).toSeq: _*)
      query.processAllAvailable()
      val got = spark.table("quota").as[graft.streaming.AdmittedDoc]
        .collect().map(a => (a.source, a.doc_id, a.n_tokens, a.cum_tokens))
        .toSet
      assert(got === want, s"admitted set must match the batch draw: $got")
      assert(got.forall(_._4 <= quota), "running totals must respect quota")
    } finally query.stop()
  }

  test("withStateStoreProvider scopes the provider conf and restores " +
    "it on both success and failure") {
    import graft.streaming.StreamingOps
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    val seen = StreamingOps.withStateStoreProvider(
      spark, StreamingOps.RocksDbProvider) { spark.conf.get(key) }
    assert(seen === StreamingOps.RocksDbProvider)
    assert(spark.conf.getOption(key) === before, "restore after success")
    intercept[RuntimeException] {
      StreamingOps.withStateStoreProvider(spark,
        StreamingOps.RocksDbProvider) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.getOption(key) === before, "restore after failure")
  }

  test("HLL registers accumulate across micro-batches and equal the " +
    "batch registers; estimate lands near the exact count") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps
      .hllRegistersStream(input.toDF(), "event_type", "user_id", 64)
      .writeStream.format("memory").queryName("hllreg")
      .outputMode("complete").start()
    val events = (1L to 300L).map(u =>
      ev(u, u, u % 60, if (u % 2 == 0) "view" else "click"))
    try {
      input.addData(events.take(100): _*)
      query.processAllAvailable()
      input.addData(events.drop(100): _*) // state must MERGE, not reset
      query.processAllAvailable()
      val got = spark.table("hllreg").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket"),
          r.getAs[Long]("rho"))).toSet
      val want = StreamingOps
        .hllRegistersStream(events.toDF(), "event_type", "user_id", 64)
        .collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket"),
          r.getAs[Long]("rho"))).toSet
      assert(got === want, "streamed registers must equal batch registers")
      assert(got.forall(t => t._2 >= 0 && t._2 < 64), "bucket range")
      assert(got.forall(t => t._3 >= 1 && t._3 <= 55), "rho range")
      // raw HLL estimate (alpha_64 * m^2 / sum 2^-rho) over present
      // registers (absent = 0): coarse, but must land within 25% on
      // 150 distinct keys per type — a wrong bucket/rho formula lands
      // orders of magnitude off
      Seq("view", "click").foreach { tpe =>
        val rhos = got.filter(_._1 == tpe).map(t => t._2 -> t._3).toMap
        val z = (0 until 64)
          .map(b => math.pow(2.0, -rhos.getOrElse(b.toLong, 0L).toDouble))
          .sum
        val est = 0.709 * 64 * 64 / z
        assert(math.abs(est - 150.0) <= 37.5,
          s"$tpe estimate $est too far from 150")
      }
    } finally query.stop()
  }
}
