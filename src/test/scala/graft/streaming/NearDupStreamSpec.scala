package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** The streaming LSH near-dup pipeline (st_neardup_ingest): the live
  * checkpointed stream's ledger must equal the batch mirror computed from
  * the oracled pair listing, and the planted exact-dup twins must always
  * be caught (identical text → identical signatures → same buckets →
  * 16/16 equal members).
  */
class NearDupStreamSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  /** The order-independent batch rule the stream must reproduce:
    * dropped = distinct greater-side ids of the est ≥ 0.7 pair listing
    * (nearDupDropStream's own batch branch), ledgered per language.
    */
  private lazy val batchLedger: Seq[(String, Long, Long, Long)] = {
    val corpus = graft.queries.Dedup.corpusWithDups(spark, sf)
    val drops = EventStreams.nearDupDropStream(
        corpus.withColumn("ts", timestamp_seconds(lit(1700000000L))))
      .withColumnRenamed("doc_id", "did")
    corpus.select(col("doc_id"), col("lang"))
      .join(drops, col("doc_id") === col("did"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("did").isNotNull, 1L).otherwise(0L)).cast("bigint").as("n_dropped"),
        sum(when(col("did").isNull, 1L).otherwise(0L)).cast("bigint").as("n_kept"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
  }

  test("st_neardup_ingest: live stream ledger equals the batch pair-listing rule") {
    // snapshot/diff for the cleanup check (tolerances in TestDirs)
    def nonceDirs = graft.TestDirs.nonceDirs("graft_neardup_")
    val before = nonceDirs
    val streamed = EventStreams.queries("st_neardup_ingest")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(streamed.nonEmpty)
    val expected = batchLedger
    assert(streamed == expected,
      s"stream ledger must match the order-independent batch rule:\n$streamed\nvs\n$expected")
    // the planted twins guarantee drops exist: every 5th doc's (2k, 2k+1)
    // pair is byte-identical, so 2k+1 is always droppable
    assert(streamed.map(_._3).sum > 0, "planted twins must produce drops")
    // arithmetic closes per language
    streamed.foreach { case (_, n, d, k) => assert(d + k == n) }
    // no leftover nonce work dirs from THIS run (success-path cleanup)
    val leftover = nonceDirs -- before
    assert(leftover.isEmpty,
      s"work dirs left behind by this run: ${leftover.mkString(",")}")
  }

  test("st_neardup_ingest: identical ledger under the RocksDB state store") {
    // At crawl scale the band-bucket state cannot live on the JVM heap —
    // a real deployment runs the off-heap RocksDB provider. The provider
    // is a per-query choice latched from the session conf at stream
    // start (the nonce-fresh checkpoint means no provider-mixing within
    // one checkpoint lineage), and it must be a pure storage swap: the
    // SAME ledger, byte for byte, as the default HDFS-backed provider
    // and the batch rule.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val streamed =
      try EventStreams.queries("st_neardup_ingest")(spark, sf)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    assert(streamed == batchLedger,
      "the state-store provider must be a pure storage swap")
    assert(streamed.map(_._3).sum > 0, "planted twins must produce drops")
  }

  test("nearDupDropStream: stop mid-stream, resume from checkpoint — same ledger") {
    // The IngestPipelineSpec discipline applied to the STATEFUL-TIMEOUT
    // pipeline: recovery must restore not just source offsets and sink
    // manifest but the flatMapGroupsWithState band-bucket state — member
    // lists, the lifetime maxTs carried in state, and the REGISTERED
    // event-time timeouts — so buckets accumulated before the kill still
    // close and vote correctly after the restart.
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val root = java.nio.file.Files.createTempDirectory("neardup-e2e").toString
    val srcDir = s"$root/in"
    val dropDir = s"$root/drops"
    val ckDir = s"$root/ck"
    val t0 = 1700000000L
    val staged = graft.queries.Dedup.corpusWithDups(spark, sf)
      .select(col("doc_id"), timestamp_seconds(lit(t0)).as("ts"),
        col("text"), col("lang"))
    // 8 corpus files × maxFilesPerTrigger=1 → 8 micro-batches to
    // interrupt between, before the late sentinels arrive
    staged.repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").parquet(srcDir)
    // the SAME sentinel scheme as the production corpus entry — one
    // body (EventStreams.stageWatermarkSentinels), so the spec can
    // never drift from the path it certifies
    EventStreams.stageWatermarkSentinels(spark, new java.io.File(root), srcDir, t0)
    val schema = spark.read.parquet(srcDir).schema
    def start(availableNow: Boolean) = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val w = EventStreams.nearDupDropStream(src.withWatermark("ts", "2 hours"))
        .writeStream.format("parquet")
        .option("path", dropDir)
        .option("checkpointLocation", ckDir)
        .outputMode(OutputMode.Append)
      (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
    }
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      // phase 1: stop at the first committed micro-batch — the in-process
      // equivalent of killing the job with most of the corpus unread and
      // every bucket's timeout still pending in the state store
      val q1 = start(availableNow = false)
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (!q1.recentProgress.exists(_.numInputRows > 0) &&
            System.nanoTime() < deadline) Thread.sleep(50)
        assert(q1.recentProgress.exists(_.numInputRows > 0),
          "stream made no progress within the deadline")
      } finally q1.stop()
      q1.awaitTermination()

      // phase 2: restart from the SAME checkpoint and drain everything
      val q2 = start(availableNow = true)
      q2.awaitTermination()
      assert(q2.recentProgress.exists(_.numInputRows > 0),
        "the restart must process the files the kill left unread")

      // committed drops → per-lang ledger, against the batch rule
      val drops = spark.read.schema("doc_id BIGINT").parquet(dropDir)
        .select(col("doc_id")).distinct().withColumnRenamed("doc_id", "did")
      val ledger = graft.queries.Dedup.corpusWithDups(spark, sf)
        .select(col("doc_id"), col("lang"))
        .join(drops, col("doc_id") === col("did"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("did").isNotNull, 1L).otherwise(0L)).cast("bigint").as("n_dropped"),
          sum(when(col("did").isNull, 1L).otherwise(0L)).cast("bigint").as("n_kept"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
      assert(ledger == batchLedger,
        s"post-restart ledger must equal the batch rule:\n$ledger\nvs\n$batchLedger")
      assert(ledger.map(_._3).sum > 0, "planted twins must produce drops")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      graft.util.Dirs.deleteRecursively(new java.io.File(root))
    }
  }
}
