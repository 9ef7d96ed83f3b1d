package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Semantic assertions for the training-data curation suite (beyond the
  * DuckDB-oracle hash checks): redaction completeness, strip idempotence,
  * sampling determinism, packing invariants.
  */
class CurationSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("redactPii removes every email/phone/IPv4 occurrence") {
    import spark.implicits._
    val dirty = Seq(
      "mail a.b+c@sub.example.org now",
      "dial 555-0199 or 123-4567 twice",
      "host 192.168.0.1 and 10.0.255.100 up",
      "mixed x@y.io 1.2.3.4 999-0000 end",
      "clean text with no pii at all").toDF("t")
    val clean = dirty.select(Curation.redactPii(col("t")).as("c"))
    val leftovers = clean.filter(
      col("c").rlike(Curation.EmailRe) ||
        col("c").rlike(Curation.PhoneRe) ||
        col("c").rlike(Curation.Ipv4Re)).count()
    assert(leftovers == 0)
    val row = clean.collect().map(_.getString(0))
    assert(row(0) == "mail [EMAIL] now")
    assert(row(1) == "dial [PHONE] or [PHONE] twice")
    assert(row(2) == "host [IP] and [IP] up")
    assert(row(3) == "mixed [EMAIL] [IP] [PHONE] end")
    assert(row(4) == "clean text with no pii at all")
  }

  test("stripHtml removes all tags and is idempotent") {
    import spark.implicits._
    val html = Seq(
      "<html><body><p>a  b</p><br/><a href=\"u\">c</a></body></html>",
      "no markup here").toDF("t")
    val once = html.select(Curation.stripHtml(col("t")).as("c"))
    assert(once.filter(col("c").rlike("<[^>]+>")).count() == 0)
    val twice = once.select(Curation.stripHtml(col("c")).as("c"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
    assert(once.collect()(0).getString(0) == "a b c")
  }

  test("wordNgrams: correct n-grams, empty (not error) on short arrays") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "only").toDF("t")
      .select(Curation.wordNgrams(Curation.tokens(col("t")), 3).as("g"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq.empty)
    assert(rows(2) == Seq.empty)
  }

  test("c_pii_redact: zero phone patterns survive redaction at sf0.001") {
    val r = Curation.queries("c_pii_redact")(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("n_phone_left") == 0L))
    // one synthetic email + one IP per doc
    assert(r.forall(row => row.getAs[Long]("n_email") == row.getAs[Long]("n_docs")))
    assert(r.forall(row => row.getAs[Long]("n_ip") == row.getAs[Long]("n_docs")))
  }

  test("c_hash_sample is deterministic and near the 26/256 target rate") {
    val a = Curation.queries("c_hash_sample")(spark, sf).collect()
    val b = Curation.queries("c_hash_sample")(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    val kept = a.map(_.getAs[Long]("kept")).sum.toDouble
    val total = a.map(_.getAs[Long]("total")).sum.toDouble
    assert(math.abs(kept / total - 26.0 / 256) < 0.08)
  }

  test("c_hashed_ngram_lr: scores bounded, keep counts consistent, deterministic") {
    val a = Curation.queries("c_hashed_ngram_lr")(spark, sf).collect()
    val b = Curation.queries("c_hashed_ngram_lr")(spark, sf).collect()
    // the whole chain is md5 draws + exact integer sums: rerunning the
    // plan must reproduce every row bit-for-bit
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    a.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val k = r.getAs[Long]("n_keep")
      assert(n > 0 && k >= 0 && k <= n)
      val avg = r.getAs[Double]("avg_score")
      assert(avg > 0.0 && avg < 1.0, s"sigmoid scores must stay in (0,1): $avg")
      assert(math.abs(r.getAs[Double]("keep_share") - k.toDouble / n) < 1e-3)
    }
    // md5-derived weights are symmetric around 0, so the corpus must not
    // collapse to one side of the 0.5 gate (a degenerate all-keep /
    // all-drop output would mean the feature sum or gain broke)
    val keep = a.map(_.getAs[Long]("n_keep")).sum.toDouble
    val tot = a.map(_.getAs[Long]("n_docs")).sum.toDouble
    assert(keep / tot > 0.05 && keep / tot < 0.95, s"degenerate keep rate ${keep / tot}")
  }

  test("c_stratified_sample: en rate below non-en rate") {
    val r = Curation.queries("c_stratified_sample")(spark, sf).collect()
    val en = r.find(_.getAs[String]("lang") == "en").get.getAs[Double]("rate")
    val others = r.filter(_.getAs[String]("lang") != "en").map(_.getAs[Double]("rate"))
    assert(others.nonEmpty && en < others.max)
  }

  test("c_pack_sequences: every doc lands in exactly one bin; fills are sane") {
    val docs = Tables.t(spark, sf, "documents").count()
    val r = Curation.queries("c_pack_sequences")(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum == docs)
    // a bin overfills by at most one document's tokens (greedy chunking):
    // max observed fill stays under ctx + max doc tokens
    val maxTokensPerDoc = Tables.t(spark, sf, "documents")
      .select(max(size(Curation.tokens(col("text"))))).collect()(0).getInt(0)
    assert(r.forall(_.getAs[Long]("max_bin_tokens") <= 512L + maxTokensPerDoc))
  }

  test("c_contamination: benchmark slice itself is excluded from candidates") {
    val r = Curation.queries("c_contamination")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("contaminated") <= row.getAs[Long]("total_docs"))
    }
  }

  test("c_encoding_qa: planted mojibake/control/NBSP docs are each caught once") {
    import spark.implicits._
    // stage a tiny documents.parquet with one doc per defect class
    val dir = java.nio.file.Files.createTempDirectory("encqa").toString
    Seq(
      (1L, "en", "clean ascii text"),
      (2L, "en", "replacement \ufffd here"),
      (3L, "en", "control \u0007 bell"),
      (4L, "en", "mojibake caf\u00c3\u00a9 marker"), // e-acute double-decoded
      (5L, "en", "hard\u00a0space"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Curation.queries("c_encoding_qa")(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_docs") == 5)
    assert(row.getAs[Long]("n_replacement") == 1)
    assert(row.getAs[Long]("n_ctrl") == 1)
    assert(row.getAs[Long]("n_mojibake") == 1)
    assert(row.getAs[Long]("n_nbsp") == 1)
    assert(row.getAs[Long]("n_clean") == 1)
    assert(row.getAs[Double]("clean_share") == 0.2)
  }

  test("c_tokenizer_fertility: bytes dominate chars, BPE-ish dominates whitespace tokens") {
    val r = Curation.queries("c_tokenizer_fertility")(spark, TestSpark.sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_bytes") >= row.getAs[Long]("n_chars"))
      // every whitespace token contains at least one BPE-ish match
      assert(row.getAs[Long]("n_bpeish") >= row.getAs[Long]("n_ws_tokens"))
      val expected = BigDecimal(row.getAs[Long]("n_chars").toDouble /
        row.getAs[Long]("n_bpeish"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getAs[Double]("chars_per_token") == expected)
    }
  }

  test("canonicalizeUrl: case-by-case rules + idempotence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // (raw, expected canonical)
      ("HTTP://WWW.Site.Example.COM:80/a/1", "http://site.example.com/a/1"),
      ("https://site.example.com:80/a/1", "https://site.example.com:80/a/1"), // NOT default for https
      ("https://Site.example.com:443/a/1", "https://site.example.com/a/1"),
      ("http://host.example.com/a/1/", "http://host.example.com/a/1"),
      ("http://host.example.com/a/1/?id=2", "http://host.example.com/a/1?id=2"),
      ("http://host.example.com/a?utm_source=x&id=2#frag", "http://host.example.com/a?id=2"),
      ("http://host.example.com/a?id=2&utm_campaign=y", "http://host.example.com/a?id=2"),
      ("http://host.example.com/a?utm_medium=z", "http://host.example.com/a"))
    val df = cases.toDF("raw", "expected")
      .withColumn("canon", Curation.canonicalizeUrl(col("raw")))
      .withColumn("canon2", Curation.canonicalizeUrl(col("canon")))
    df.collect().foreach { r =>
      assert(r.getAs[String]("canon") == r.getAs[String]("expected"),
        s"${r.getAs[String]("raw")} → ${r.getAs[String]("canon")}")
      assert(r.getAs[String]("canon2") == r.getAs[String]("canon"),
        s"not idempotent: ${r.getAs[String]("canon")} → ${r.getAs[String]("canon2")}")
    }
  }
}
