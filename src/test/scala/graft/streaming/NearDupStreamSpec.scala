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
  private def batchLedger: Seq[(String, Long, Long, Long)] = {
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
    // snapshot/diff for the cleanup check: a concurrent driver round's
    // in-flight nonce dir (a supported scenario) must not fail this suite
    def nonceDirs: Set[String] =
      Option(new java.io.File(sys.props("java.io.tmpdir")).listFiles())
        .getOrElse(Array.empty)
        .collect { case f if f.getName.startsWith("graft_neardup_") => f.getName }
        .toSet
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
}
