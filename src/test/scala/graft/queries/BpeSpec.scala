package graft.queries

import graft.{SparkSpec, TestSpark}

/** t_bpe_merges — full local referee (the e_time_decay_attrib standard):
  * classic greedy Sennrich BPE implemented in plain Scala over the same
  * word-count table must produce the identical 5 merges, and the merge
  * sequence must satisfy the algorithm's invariants (non-increasing
  * counts, concatenated new symbols).
  */
class BpeSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  test("t_bpe_merges: plain-Scala greedy referee reproduces the distributed merges") {
    val result = Text.queries("t_bpe_merges")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(result.length == 5)

    // referee: word counts the same way (whitespace split of trimmed text)
    val wordCounts = Tables.t(spark, sf, "documents")
      .select("text").collect().iterator
      .flatMap(_.getString(0).trim.split("[ \t\n\f\r]+"))
      .filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1) }
    var vocab: Map[Vector[String], Long] =
      wordCounts.map { case (w, n) => w.map(_.toString).toVector -> n }
    val merges = (1 to 5).map { it =>
      val pairCounts = vocab.iterator
        .flatMap { case (syms, n) =>
          syms.sliding(2).collect { case Vector(a, b) => ((a, b), n) }
        }
        .foldLeft(Map.empty[(String, String), Long]) { (m, kv) =>
          m.updated(kv._1, m.getOrElse(kv._1, 0L) + kv._2)
        }
      // argmax: count desc, then lexicographically smallest "a b" string
      val ((a, b), cnt) = pairCounts.toSeq
        .minBy { case ((x, y), c) => (-c, s"$x $y") }
      // classic greedy left-to-right merge
      def merge(syms: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
      vocab = vocab.foldLeft(Map.empty[Vector[String], Long]) { case (m, (syms, n)) =>
        val k = merge(syms); m.updated(k, m.getOrElse(k, 0L) + n)
      }
      (it, s"$a $b", a + b, cnt)
    }
    assert(result == merges,
      s"distributed merges must equal the classic greedy referee:\n$result\nvs\n$merges")
    // algorithm invariants: counts never increase (a post-merge pair's
    // frequency is bounded by the pair it replaced), symbols concatenate
    result.sliding(2).foreach {
      case Seq((_, _, _, c1), (_, _, _, c2)) => assert(c2 <= c1)
      case _ => ()
    }
    result.foreach { case (_, pair, sym, cnt) =>
      assert(sym == pair.replace(" ", ""))
      assert(cnt > 0)
    }
  }
}
