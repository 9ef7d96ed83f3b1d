package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.{SparkSpec, TestSpark}
import graft.queries.Tables

/** Streaming semantics through a real MemoryStream → memory-sink query:
  * watermark advance, incremental windowed aggregation, custom stateful
  * session closing — plus batch/stream plan equivalence on the testdata.
  */
class EventStreamsSpec extends SparkSpec {

  import EventStreams._

  private def ts(minute: Int): Timestamp = new Timestamp(3600000L * 10 + minute * 60000L)

  test("hourlyCounts over a MemoryStream: incremental update with watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = hourlyCounts(mem.toDF()).writeStream
      .format("memory").queryName("hourly_test").outputMode(OutputMode.Update).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(70), 2, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .select("hour_ts", "event_type", "cnt", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (ts(0), "click", 2L, 3.0),
        (new Timestamp(ts(60).getTime), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("hourlyCounts over a real FILE stream source matches the batch plan") {
    import spark.implicits._
    // file streaming sources need a DIRECTORY: stage the real sf0.001 events
    // (µs-converted) as a parquet dir, then readStream over it — the actual
    // production shape (files dropped into a watched directory)
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    val batchDf = Tables.events(spark, TestSpark.sf0001)
    batchDf.write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream.schema(batchDf.schema).parquet(dir)
    val q = hourlyCounts(streamed).writeStream
      .format("memory").queryName("hourly_file_test")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val streamRows = spark.table("hourly_file_test")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batchRows = hourlyCounts(batchDf)
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamRows == batchRows)
      assert(streamRows.nonEmpty)
    } finally q.stop()
  }

  test("sessionizeStateful: closes a session only after the gap passes the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = sessionizeStateful(mem.toDS(), gapMs = 30 * 60000L).writeStream
      .format("memory").queryName("sess_test").outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart (one session), then silence
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      // push watermark far past user 1's session timeout (2h wm delay + 30m gap)
      mem.addData(Event(3, ts(400), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(800), 2, "view", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_test")
        .as[Session].collect().filter(_.user_id == 1)
      assert(sessions.toSeq == Seq(Session(1, ts(0), ts(10), 2)))
    } finally q.stop()
  }

  test("clickToPurchase stream-stream interval join attributes within the hour only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = clickToPurchase(mem.toDF().withColumnRenamed("event_type", "event_type"))
      .writeStream.format("memory").queryName("attr_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(0), 7, "click", 0.0),
        Event(2, ts(30), 7, "purchase", 9.99),   // within 1h of click 1 → joins
        Event(3, ts(90), 7, "purchase", 5.0),    // 90min after click 1 → no join
        Event(4, ts(30), 8, "purchase", 3.0))    // other user, no click → no join
      q.processAllAvailable()
      val rows = spark.table("attr_test")
        .select("user_id", "purchase_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((7L, 2L, 1L)))
    } finally q.stop()
  }

  test("dedupStream drops duplicate event_ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = dedupStream(mem.toDF()).writeStream
      .format("memory").queryName("dedup_test").outputMode(OutputMode.Append).start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(5), 1, "click", 1.0), Event(2, ts(6), 1, "view", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").as[Event].collect().map(_.event_id).sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sessionizeStateful survives a straggler whose timeout lands below the eviction watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = sessionizeStateful(mem.toDS(), gapMs = 30 * 60000L).writeStream
      .format("memory").queryName("clamp_test").outputMode(OutputMode.Append).start()
    try {
      mem.addData(Event(1, ts(0), 5, "click", 1.0))
      q.processAllAvailable()
      // same batch: a far-future event (jumps the eviction watermark to
      // ts(480)) + a straggler for user 5 at ts(30) — admitted against the
      // PREVIOUS watermark, but its session timeout ts(60) is below the
      // updated eviction watermark: unclamped setTimeoutTimestamp throws
      // and kills the query
      mem.addData(Event(2, ts(600), 6, "view", 1.0), Event(3, ts(30), 5, "click", 1.0))
      q.processAllAvailable()
      // next trigger fires the clamped timeout and closes user 5's session
      mem.addData(Event(4, ts(1200), 6, "view", 1.0))
      q.processAllAvailable()
      val u5 = spark.table("clamp_test").as[Session].collect().filter(_.user_id == 5)
      assert(u5.toSeq == Seq(Session(5, ts(0), ts(30), 2)))
    } finally q.stop()
  }

  test("dedupStream on a batch frame falls back to plain dropDuplicates") {
    import spark.implicits._
    val batch = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "view", 2.0)).toDF()
    assert(dedupStream(batch).count() == 2)
  }

  test("docDedupStream drops re-posted CONTENT across micro-batches (normalized fingerprint)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = docDedupStream(docs).writeStream
      .format("memory").queryName("docdedup_test").outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts(0), "Hello  World"), (2L, ts(1), "unique one"))
      q.processAllAvailable()
      // doc 3 re-posts doc 1's CONTENT (same normalized text, different
      // whitespace/case) inside the watermark horizon → dropped at ingest;
      // doc 4 is fresh content → kept
      mem.addData((3L, ts(2), "hello   world"), (4L, ts(3), "another text"))
      q.processAllAvailable()
      val kept = spark.table("docdedup_test").select("doc_id").as[Long]
        .collect().toSet
      assert(kept == Set(1L, 2L, 4L))
      // batch fallback: first-per-fingerprint dropDuplicates
      val batch = Seq((1L, ts(0), "Hello  World"), (3L, ts(2), "hello world"),
        (2L, ts(1), "unique one")).toDF("doc_id", "ts", "text")
      assert(docDedupStream(batch).count() == 2)
    } finally q.stop()
  }

  test("batch/stream equivalence: hourlyCounts on batch events == e_hourly_window query") {
    val batch = hourlyCounts(Tables.events(spark, TestSpark.sf0001))
      .orderBy("hour_ts", "event_type")
    val oracle = graft.queries.Events.queries("e_hourly_window")(spark, TestSpark.sf0001)
    assert(batch.collect().toSeq == oracle.collect().toSeq)
  }

  test("sessionWindows (built-in session_window) matches stateful session count on batch") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event]
    val builtin = sessionWindows(ev.toDF(), "30 minutes")
      .groupBy("user_id").count().orderBy("user_id")
      .as[(Long, Long)].collect().toSeq
    val oracle = graft.queries.Events.queries("e_sessionize")(spark, TestSpark.sf0001)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toSeq
    assert(builtin == oracle)
  }

  test("rateAlerts: burst crossing the threshold alerts at the crossing event") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    // 10-minute window, threshold 3
    val q = rateAlerts(mem.toDS(), 600000L, 3).writeStream
      .format("memory").queryName("rate_test").outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(2), 1, "click", 1.0),
        Event(3, ts(4), 1, "click", 1.0),   // 3rd in 10 min → alert here
        Event(4, ts(6), 1, "click", 1.0),   // still 4 in window → alert again
        Event(5, ts(0), 2, "view", 1.0),
        Event(6, ts(30), 2, "view", 1.0))   // user 2 never bursts
      q.processAllAvailable()
      val rows = spark.table("rate_test")
        .as[(Long, Timestamp, Int)].collect().toSet
      assert(rows == Set((1L, ts(4), 3), (1L, ts(6), 4)))
    } finally q.stop()
  }

  test("rateAlerts: state prunes to the window — a burst split across batches still fires") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = rateAlerts(mem.toDS(), 600000L, 3).writeStream
      .format("memory").queryName("rate_split_test").outputMode(OutputMode.Append).start()
    try {
      // batch 1: one event long ago (will be pruned) + one in-window
      mem.addData(
        Event(1, ts(-60), 7, "click", 1.0),
        Event(2, ts(1), 7, "click", 1.0))
      q.processAllAvailable()
      // batch 2: two more inside the window → exactly 3 in window (the
      // ts(-60) event must NOT count toward the burst)
      mem.addData(
        Event(3, ts(3), 7, "click", 1.0),
        Event(4, ts(5), 7, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("rate_split_test")
        .as[(Long, Timestamp, Int)].collect().toSet
      assert(rows == Set((7L, ts(5), 3)))
    } finally q.stop()
  }

  test("enrichScd: events pick the dim version valid at their event time; misses survive as NULL") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // click weight 1.0 before ts(30), 2.0 after; view never covered
    val dim = Seq(
      ("click", ts(-600), ts(30), 1.0),
      ("click", ts(30), ts(600), 2.0))
      .toDF("event_type", "valid_from", "valid_to", "weight")
    val mem = MemoryStream[Event]
    val q = enrichScd(mem.toDF(), dim).writeStream
      .format("memory").queryName("scd_test").outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(10), 1, "click", 5.0),  // v1 → weight 1.0
        Event(2, ts(40), 1, "click", 5.0),  // v2 → weight 2.0
        Event(3, ts(40), 2, "view", 7.0))   // no dim row → NULL
      q.processAllAvailable()
      val rows = spark.table("scd_test")
        .select("event_id", "weight", "weighted_value")
        .as[(Long, Option[Double], Option[Double])].collect().toSet
      assert(rows == Set(
        (1L, Some(1.0), Some(5.0)),
        (2L, Some(2.0), Some(10.0)),
        (3L, None, None)))
      // batch form produces the identical enrichment (plan parity)
      val batch = enrichScd(
        Seq(Event(1, ts(10), 1, "click", 5.0),
          Event(2, ts(40), 1, "click", 5.0),
          Event(3, ts(40), 2, "view", 7.0)).toDS().toDF(), dim)
        .select("event_id", "weight", "weighted_value")
        .as[(Long, Option[Double], Option[Double])].collect().toSet
      assert(batch == rows)
    } finally q.stop()
  }

  test("rateAlerts: a cross-batch late event neither counts future events nor evicts them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = rateAlerts(mem.toDS(), 600000L, 3).writeStream
      .format("memory").queryName("rate_late_test").outputMode(OutputMode.Append).start()
    try {
      // batch 1: two in-window events for user 9
      mem.addData(
        Event(1, ts(0), 9, "click", 1.0),
        Event(2, ts(8), 9, "click", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE event at ts(4) (watermark is 2h, so it's admitted).
      // State becomes {0, 8, 4}; its own trailing window holds {0, 4} = 2 —
      // the ts(8) event is in the FUTURE and must not count → no alert yet.
      mem.addData(Event(3, ts(4), 9, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("rate_late_test").count() == 0)
      // batch 3: one more at ts(9). The late event must not have evicted or
      // shrunk state: window (ts(-1), ts(9)] holds all four → alert n=4.
      mem.addData(Event(4, ts(9), 9, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("rate_late_test")
        .as[(Long, Timestamp, Int)].collect().toSet
      assert(rows == Set((9L, ts(9), 4)))
    } finally q.stop()
  }

  test("sessionizeStateful == batch session_window on the same cross-batch disordered input") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[Event]
    val q = sessionizeStateful(mem.toDS(), gapMs = 30 * 60000L).writeStream
      .format("memory").queryName("sess_parity").outputMode(OutputMode.Append).start()
    // one logical history delivered DISORDERED across micro-batches: user 1's
    // first session arrives middle-first, then extends BACKWARDS twice from a
    // later batch; user 2's second session also extends backwards cross-batch
    val batch1 = Seq(
      Event(1, ts(20), 1, "click", 1.0),
      Event(2, ts(0), 2, "view", 1.0))
    val batch2 = Seq(
      Event(3, ts(10), 1, "view", 1.0),
      Event(4, ts(0), 1, "click", 1.0),
      Event(5, ts(120), 2, "view", 1.0))
    val batch3 = Seq(
      Event(6, ts(140), 1, "click", 1.0),
      Event(7, ts(130), 2, "view", 1.0))
    // sentinel pushes the watermark (2 h delay) past every session's timeout
    val sentinel = Event(99, ts(3000), 9, "view", 1.0)
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      mem.addData(batch3: _*); q.processAllAvailable()
      mem.addData(sentinel); q.processAllAvailable()
      val streamed = spark.table("sess_parity").as[Session].collect().toSet
      // the batch mirror is the SAME aggregation e_sessionize's DuckDB
      // oracle validates (gap-30min sessions); session_window's end is
      // last_event + gap, the stateful form reports last_event — align them
      val all = (batch1 ++ batch2 ++ batch3) :+ sentinel
      val batchSessions = sessionWindows(all.toDF(), "30 minutes")
        .select(col("user_id"), col("session_start"),
          expr("session_end - INTERVAL 30 minutes").as("session_end"),
          col("n_events").cast("int").as("n_events"))
        .as[Session].collect().toSet
      // the sentinel's own trailing session is still open in the stream
      assert(streamed == batchSessions.filter(_.user_id != 9L))
      assert(streamed.size == 4, s"expected 4 closed sessions, got $streamed")
    } finally q.stop()
  }

  test("compactCdc: emits only advancing changes, swallows stale replays, tombstones") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[CdcChange]
    val q = compactCdc(mem.toDS()).writeStream
      .format("memory").queryName("cdc_test").outputMode(OutputMode.Append).start()
    try {
      // batch 1: key 1 upserts twice (seq 5 wins in-batch), key 2 inserts
      mem.addData(
        CdcChange(1, 3, "U", 10.0, "O"),
        CdcChange(1, 5, "U", 12.0, "O"),
        CdcChange(2, 1, "U", 99.0, "F"))
      q.processAllAvailable()
      val b1 = spark.table("cdc_test").as[CdcChange].collect().toSet
      assert(b1 == Set(CdcChange(1, 5, "U", 12.0, "O"),
        CdcChange(2, 1, "U", 99.0, "F")))
      // batch 2: stale replay for key 1 (seq 4 < 5: swallowed, no emission),
      // delete for key 2 (advances: tombstone flows through)
      mem.addData(
        CdcChange(1, 4, "U", 11.0, "O"),
        CdcChange(2, 7, "D", 99.0, "F"))
      q.processAllAvailable()
      val all = spark.table("cdc_test").as[CdcChange].collect().toSeq
      assert(all.size == 3, s"stale seq-4 must not emit: $all")
      assert(all.count(_ == CdcChange(2, 7, "D", 99.0, "F")) == 1)
    } finally q.stop()
    // batch fallback compacts to the same final snapshot as replaying the
    // full log through the streaming path
    val log = Seq(
      CdcChange(1, 3, "U", 10.0, "O"), CdcChange(1, 5, "U", 12.0, "O"),
      CdcChange(1, 4, "U", 11.0, "O"), CdcChange(2, 1, "U", 99.0, "F"),
      CdcChange(2, 7, "D", 99.0, "F")).toDS()
    val snap = compactCdc(log).collect().toSet
    assert(snap == Set(CdcChange(1, 5, "U", 12.0, "O"),
      CdcChange(2, 7, "D", 99.0, "F")))
  }

  test("st_sessionize corpus entry: live checkpointed ledger equals the batch gap rewrite") {
    import org.apache.spark.sql.functions._
    val stream = EventStreams.queries("st_sessionize")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // batch mirror in milliseconds (Timestamp.getTime semantics), the
    // same lag/cumsum rewrite the DuckDB oracle runs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ms", "event_id")
    val sess = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000").as("ms"))
      .withColumn("prev", lag("ms", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("ms") - col("prev") > 12L * 3600 * 1000, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"), (max("ms") - min("ms")).as("dur_ms"))
    val batch = sess
      .groupBy(least(col("n_events"), lit(50)).cast("bigint").as("len_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum("dur_ms").cast("bigint").as("total_dur_ms"),
        min("user_id").as("min_user"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(stream.nonEmpty)
    assert(stream.toSeq == batch.toSeq,
      "stateful stream diverged from the batch sessionization")
    // multi-event sessions exist, i.e. cross-batch state actually carried
    assert(stream.exists(_._1 > 1))
  }

  test("sessionize stream: stop mid-stream, resume from checkpoint — same sessions") {
    // The NearDupStreamSpec kill/restart discipline on the SESSIONIZER:
    // recovery must restore per-user open-session state (start, last, n)
    // and the registered event-time timeouts, so sessions straddling the
    // kill boundary still merge and flush correctly after the restart.
    // Staging is the SAME stageEventSlices body the corpus entry uses.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val gapMs = 12L * 3600 * 1000
    val root = java.nio.file.Files.createTempDirectory("sess-e2e").toFile
    val srcDir = new java.io.File(root, "in"); srcDir.mkdirs()
    val outDir = s"${root.getAbsolutePath}/out"
    val ckDir = s"${root.getAbsolutePath}/ck"
    EventStreams.stageEventSlices(spark, root, srcDir, TestSpark.sf0001, gapMs)
    val schema = spark.read.parquet(srcDir.getAbsolutePath).schema
    import spark.implicits._
    def start(availableNow: Boolean) = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.getAbsolutePath)
      val w = EventStreams.sessionizeStateful(src.as[EventStreams.Event], gapMs)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode(OutputMode.Append)
      // phase 1 throttles to one file per trigger AND a processing-time
      // interval, so stop() lands after 1-2 committed batches — slices
      // must genuinely remain for the restart to prove recovery on
      (if (availableNow) w.trigger(Trigger.AvailableNow())
       else w.trigger(Trigger.ProcessingTime("5 seconds"))).start()
    }
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      // phase 1: kill at the first committed micro-batch — most slices
      // unread, every open session pending in the state store
      val q1 = start(availableNow = false)
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (!q1.recentProgress.exists(_.numInputRows > 0) &&
            System.nanoTime() < deadline) Thread.sleep(50)
        assert(q1.recentProgress.exists(_.numInputRows > 0),
          "stream made no progress within the deadline")
      } finally q1.stop()
      q1.awaitTermination()
      // GROUND-TRUTH kill accounting (ADVICE r14): recentProgress is
      // posted async by the listener bus, so it can under-report what
      // phase 1 committed — the old rows-based conditional could demand
      // phase-2 progress when nothing was actually left, a flake. The
      // checkpoint's commits log is the truth: one committed batch ==
      // one staged file (maxFilesPerTrigger = 1).
      val stagedFiles = Option(srcDir.listFiles())
        .getOrElse(Array.empty[java.io.File])
        .count(_.getName.endsWith(".parquet"))
      def committedBatches() = Option(
        new java.io.File(ckDir, "commits").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .count(_.getName.forall(_.isDigit))
      val committed1 = committedBatches()
      // phase 2: restart from the SAME checkpoint, drain everything
      val q2 = start(availableNow = true)
      q2.awaitTermination()
      if (committed1 < stagedFiles)
        assert(committedBatches() > committed1,
          "the restart must process the slices the kill left unread")
      // post-restart sessions == the batch gap rewrite, exactly
      val stream = spark.read.parquet(outDir)
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events").cast("long")).as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ms", "event_id")
      val batch = Tables.events(spark, TestSpark.sf0001)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts) div 1000").as("ms"))
        .withColumn("prev", lag("ms", 1).over(w2))
        .withColumn("new_s",
          when(col("prev").isNull || col("ms") - col("prev") > gapMs, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_s").as("n_sessions"), count(lit(1)).as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      assert(stream.toSeq == batch.toSeq,
        "post-restart sessions must equal the batch gap rule")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      graft.util.Dirs.deleteRecursively(root)
    }
  }
}
