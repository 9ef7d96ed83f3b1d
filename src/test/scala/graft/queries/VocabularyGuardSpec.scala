package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Failure-path specs for the bounded-scalar-extract vocabulary guards.
  *
  * e_pagerank and e_markov_attribution collect their TYPE-VOCABULARY-bounded
  * transition aggregates to the driver (|types|² cells at any data volume)
  * and iterate there. That license is enforced by `require()` guards
  * (queries/Events.scala) — these specs synthesize an event stream whose
  * vocabulary EXCEEDS the 64-type bound and assert both sites fail fast
  * with the documented error instead of silently materializing a large
  * graph on the driver.
  */
class VocabularyGuardSpec extends SparkSpec {

  /** 70-type event stream from a single user walking every ordered type
    * pair (the walk [a, b] for each (a, b) makes every ordered pair a
    * consecutive transition), so the (src, dst) lattice holds ≥ 70² = 4900
    * distinct cells — past both guards' 64-type bounds (4160 / 4422). No
    * 'purchase' type exists, so the Markov journey keeps every event.
    */
  private lazy val bigVocabDir: String = {
    import spark.implicits._
    val types = (0 until 70).map(i => f"t$i%02d")
    val walk = for { a <- types; b <- types; t <- Seq(a, b) } yield t
    val rows = walk.zipWithIndex.map { case (tp, i) =>
      (1L, i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), tp)
    }
    val dir = Files.createTempDirectory("guard-events").toString
    rows.toDF("user_id", "event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("e_pagerank fails fast when the event_type vocabulary exceeds the 64-type bound") {
    val e = intercept[IllegalArgumentException] {
      Events.queries("e_pagerank")(spark, bigVocabDir).collect()
    }
    assert(e.getMessage.contains("e_pagerank"))
    assert(e.getMessage.contains("bounded-scalar-extract"))
    assert(e.getMessage.contains("distributed power method"))
  }

  test("e_markov_attribution fails fast when the channel vocabulary exceeds the 64-type bound") {
    val e = intercept[IllegalArgumentException] {
      Events.queries("e_markov_attribution")(spark, bigVocabDir).collect()
    }
    assert(e.getMessage.contains("e_markov_attribution"))
    assert(e.getMessage.contains("bounded-scalar-extract"))
    assert(e.getMessage.contains("distributed chain solve"))
  }
}
