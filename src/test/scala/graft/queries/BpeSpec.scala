package graft.queries

import graft.{SparkSpec, TestSpark}

/** t_bpe_merges — full local referee (the e_time_decay_attrib standard):
  * the engines' shared merge rule (literal non-overlapping replace of
  * " a b " with " ab ", applied twice, on the shared-separator symbol
  * string — Text.scala's t_bpe_merges comment) implemented byte-exactly
  * in plain Scala must reproduce the distributed merges; the rule's
  * equivalence class vs textbook greedy is PINNED (exhaustively equal
  * for a ≠ b, divergent exactly on same-symbol runs ≥ 5); and a planted
  * corpus whose first merge is a self-pair over an 8-run proves the
  * divergent branch end-to-end against the live engine.
  */
class BpeSpec extends SparkSpec {

  private val sf = TestSpark.sf0001

  /** The engines' merge application, byte-exact: Java's String.replace
    * is literal, non-overlapping and left-to-right — the same semantics
    * as Spark's replace() expression and DuckDB's replace().
    */
  private def replTwice(sym: String, pr: String): String = {
    val from = " " + pr + " "
    val to = " " + pr.replace(" ", "") + " "
    sym.replace(from, to).replace(from, to)
  }

  /** Textbook greedy left-to-right Sennrich merge over the token list —
    * the comparison baseline the equivalence-class pins run against.
    */
  private def classicGreedy(sym: String, pr: String): String = {
    val Array(a, b) = pr.split(" ")
    val syms = sym.trim.split(" ").toVector
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result().mkString(" ", " ", " ")
  }

  /** Initial symbols per Unicode CODE POINT — Text.codePointTokens, the
    * same segmentation both engines' substring/substr compute (r16 fix;
    * `w.map(_.toString)` would split a supplementary-plane character
    * into two lone surrogates and diverge the referee).
    */
  private def toSym(w: String): String =
    Text.codePointTokens(w).mkString(" ", " ", " ")

  /** The full training referee: word counts → shared-separator strings →
    * k (pair-count, argmax, replace-twice) rounds. Returns the merge
    * rows and the final (word → symbol-string) vocabulary.
    */
  private def trainReferee(wordCounts: Map[String, Long], k: Int)
      : (Seq[(Int, String, String, Long)], Map[String, String]) = {
    var vocab: Map[String, String] = wordCounts.keysIterator
      .map(w => w -> toSym(w)).toMap
    val merges = (1 to k).map { it =>
      val pairCounts = vocab.iterator
        .flatMap { case (w, sym) =>
          sym.trim.split(" ").toSeq.sliding(2).collect {
            case Seq(a, b) => (a + " " + b, wordCounts(w))
          }
        }
        .foldLeft(Map.empty[String, Long]) { (m, kv) =>
          m.updated(kv._1, m.getOrElse(kv._1, 0L) + kv._2)
        }
      // argmax: count desc, then smallest "a b" string in UTF-8 BYTE
      // order (Text.utf8Less — what Spark's UTF8String comparator and
      // DuckDB both use; Scala String order is UTF-16 code units, which
      // inverts for supplementary-plane symbols)
      val (pr, cnt) = pairCounts.toSeq.reduceLeft { (a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && Text.utf8Less(b._1, a._1))) b else a
      }
      vocab = vocab.map { case (w, sym) => w -> replTwice(sym, pr) }
      (it, pr, pr.replace(" ", ""), cnt)
    }
    (merges, vocab)
  }

  test("t_bpe_merges: byte-exact plain-Scala referee reproduces the distributed merges") {
    val result = Text.queries("t_bpe_merges")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(result.length == 5)

    // referee: word counts the same way (whitespace split of trimmed text)
    val wordCounts = Tables.t(spark, sf, "documents")
      .select("text").collect().iterator
      .flatMap(_.getString(0).trim.split(Text.wsRe))
      .filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1) }
    val (merges, _) = trainReferee(wordCounts, 5)
    assert(result == merges,
      s"distributed merges must equal the byte-exact referee:\n$result\nvs\n$merges")
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

  test("merge rule equivalence class: classic greedy for a≠b (exhaustive), divergent exactly on same-symbol runs ≥ 5") {
    // the documented divergence example, pinned byte-for-byte
    assert(replTwice(" z z z z z z ", "z z") == " zz z zz z ")
    assert(classicGreedy(" z z z z z z ", "z z") == " zz zz zz ")
    // a≠b: replace-twice IS textbook greedy — exhaustive over every
    // token string in {a,b}^1..10 for the pair "a b" (2046 cases; the
    // back-to-back-chain argument in the scaladoc, verified mechanically)
    for (len <- 1 to 10; bits <- 0 until (1 << len)) {
      val sym = (0 until len)
        .map(i => if (((bits >> i) & 1) == 0) "a" else "b")
        .mkString(" ", " ", " ")
      assert(replTwice(sym, "a b") == classicGreedy(sym, "a b"),
        s"a≠b divergence at $sym")
    }
    // a==b: divergence happens exactly when some 'a'-run is ≥ 5 tokens
    for (len <- 1 to 10; bits <- 0 until (1 << len)) {
      val toks = (0 until len).map(i => if (((bits >> i) & 1) == 0) "a" else "b")
      val sym = toks.mkString(" ", " ", " ")
      val maxRun = toks.foldLeft((0, 0)) { case ((best, cur), t) =>
        val c = if (t == "a") cur + 1 else 0
        (math.max(best, c), c)
      }._1
      val agree = replTwice(sym, "a a") == classicGreedy(sym, "a a")
      assert(agree == (maxRun <= 4),
        s"self-pair rule class violated at $sym (maxRun=$maxRun, agree=$agree)")
    }
  }

  test("planted self-pair corpus: engine equals the referee through a live divergent merge") {
    // 12× an 8-run word forces iteration 1's argmax to the self-pair
    // "z z" (84 weighted pairs) over a run where replace-twice and
    // textbook greedy disagree; 5× "abcdefgh" keeps all 5 unrolled
    // iterations non-empty (iterations 2–4 consume the z-word down to
    // one symbol, iteration 5 falls to "a b")
    graft.util.Dirs.withNonceDir("graft_bpespec_") { root =>
      import spark.implicits._
      val docs = Seq(
        (1L, "en", Seq.fill(12)("zzzzzzzz").mkString(" ")),
        (2L, "en", Seq.fill(5)("abcdefgh").mkString(" ")))
        .toDF("doc_id", "lang", "text")
      docs.write.parquet(s"${root.getAbsolutePath}/documents.parquet")
      val dir = root.getAbsolutePath

      val engine = Text.queries("t_bpe_merges")(spark, dir).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val wordCounts = Map("zzzzzzzz" -> 12L, "abcdefgh" -> 5L)
      val (merges, vocab) = trainReferee(wordCounts, 5)
      assert(engine == merges,
        s"engine must equal the byte-exact referee on the planted corpus:\n$engine\nvs\n$merges")
      // the planted divergence is LIVE: iteration 1 learned the
      // self-pair, and its application disagrees with textbook greedy
      assert(merges.head._2 == "z z")
      assert(replTwice(toSym("zzzzzzzz"), "z z")
        != classicGreedy(toSym("zzzzzzzz"), "z z"))

      // encode side: per-lang fertility follows the referee vocabulary
      val enc = Text.queries("t_bpe_encode")(spark, dir).collect()
      assert(enc.length == 1)
      val nSym = vocab.map { case (w, sym) => w -> sym.trim.split(" ").length.toLong }
      val expWords = 12L + 5L
      val expBpe = 12L * nSym("zzzzzzzz") + 5L * nSym("abcdefgh")
      val row = enc.head
      assert(row.getAs[Long]("n_words") == expWords)
      assert(row.getAs[Long]("n_bpe_tokens") == expBpe)
      assert(row.getAs[Double]("fertility") ==
        BigDecimal(expBpe.toDouble / expWords)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("codePointTokens: one token per code point, never a lone surrogate") {
    // U+1D4B3 (\uD835\uDCB3) is supplementary-plane: two UTF-16 chars, ONE token
    assert(Text.codePointTokens("a\uD835\uDCB3b").toSeq ==
      Seq("a", "\uD835\uDCB3", "b"))
    assert(Text.codePointTokens("").toSeq == Seq.empty)
    assert(Text.codePointTokens("xyz").toSeq == Seq("x", "y", "z"))
    // every token is a well-formed UTF-8 sequence (a lone surrogate
    // would encode as the 3-byte replacement '?')
    Text.codePointTokens("\uD835\uDD4F\uFFFDq").foreach { t =>
      assert(new String(t.getBytes("UTF-8"), "UTF-8") == t,
        s"token $t does not round-trip UTF-8")
    }
  }

  test("utf8Less orders by UTF-8 bytes exactly where UTF-16 inverts") {
    // U+FFFD (EF BF BD) < U+1D54F (F0 9D 95 8F) in UTF-8 bytes…
    assert(Text.utf8Less("\uFFFD", "\uD835\uDD4F"))
    assert(!Text.utf8Less("\uD835\uDD4F", "\uFFFD"))
    // …but UTF-16 code-unit order says the OPPOSITE (surrogate 0xD835
    // sorts below 0xFFFD) — the divergence the driver loop must avoid
    assert("\uD835\uDD4F" < "\uFFFD")
    // prefix rule
    assert(Text.utf8Less("ab", "abc") && !Text.utf8Less("abc", "ab"))
  }

  test("supplementary-plane units: trainLocal == bpeChainFrom, tie broken by UTF-8 bytes") {
    // Two units with EQUAL pair counts force round 1 through the
    // tie-break: "\uFFFD z" vs "\uD835\uDD4F z" ("\uD835\uDD4F z"). UTF-8 byte
    // order (both engines) picks \uFFFD first; UTF-16 order — the r15
    // referee bug class — would pick \uD835\uDD4F first. And codePointTokens must
    // keep \uD835\uDD4F ONE symbol: char-split units would instead learn
    // surrogate-half pairs and diverge from Spark's code-point
    // substring chain entirely. (The DuckDB leg of the same contract is
    // oracle-gated: substr/length count code points and its pair argmax
    // compares bytes, the identical hierarchy.)
    val units = Seq(("\uFFFDz", 2L), ("\uD835\uDD4Fz", 2L))
    val (localMerges, localVocab) = Text.trainLocal(units, 2)
    assert(localMerges == Seq(
      (1, "\uFFFD z", "\uFFFDz", 2L),
      (2, "\uD835\uDD4F z", "\uD835\uDD4Fz", 2L)),
      s"driver-loop merges wrong: $localMerges")
    assert(localVocab.toMap == Map(
      "\uFFFDz" -> " \uFFFDz ", "\uD835\uDD4Fz" -> " \uD835\uDD4Fz "))

    import spark.implicits._
    val unitsDf = units.toDF("w", "n")
    val (distributed, distVocab) = Text.bpeChainFrom(unitsDf, 2)
    val dist = distributed.reduce(_.unionAll(_)).orderBy("it").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(dist == localMerges,
      s"distributed chain diverged on supplementary-plane units: $dist")
    val dv = distVocab.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dv == localVocab.toMap)
  }
}
