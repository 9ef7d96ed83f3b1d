package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact hygiene rules (VERDICT r17 "What's wrong"
  * #1/#3): the round-17 load-ramped run — canary ratios
  * 0.84/1.07/1.10/1.08/2.74 with token entries inflated 10-170x — MUST
  * read as drifted, must not clobber BENCH_FULL.json, and must not
  * append itself to the canary history.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("r17 load-ramped canary set (split ratios) flags drift") {
    // the actual BENCH_r17.json ratios the old AND-of-five rule passed
    assert(BenchGuard.drifted(Seq(0.84, 1.07, 1.10, 1.08, 2.74)))
  }

  test("quiet run (all ratios near 1) does not flag") {
    assert(!BenchGuard.drifted(Seq(0.95, 1.05, 1.08, 0.88, 1.12)))
  }

  test("uniform slowdown above the median band flags") {
    assert(BenchGuard.drifted(Seq(1.25, 1.3, 1.28, 1.31, 1.22)))
  }

  test("uniform speedup does NOT flag — a fast run refreshes stale references") {
    // after a hot stretch the history medians sit above the machine's
    // quiet level; the first return-to-quiet run reads ~0.6-0.8 and must
    // become the new reference, not be quarantined as drift
    assert(!BenchGuard.drifted(Seq(0.5, 0.6, 0.55, 0.7, 0.65)))
  }

  test("single canary above 1.5x flags even with a quiet median") {
    assert(BenchGuard.drifted(Seq(1.0, 0.98, 1.02, 1.01, 1.6)))
  }

  test("one mildly-hot canary inside 1.5x with quiet median does not flag") {
    assert(!BenchGuard.drifted(Seq(1.0, 0.98, 1.02, 1.01, 1.4)))
  }

  test("empty ratio set (no history) cannot flag") {
    assert(!BenchGuard.drifted(Nil))
  }

  test("drifted run writes the .drifted artifact, never BENCH_FULL.json") {
    assert(BenchGuard.fullArtifact(hostDrift = true) === "BENCH_FULL.drifted.json")
    assert(BenchGuard.fullArtifact(hostDrift = false) === "BENCH_FULL.json")
  }

  test("append gate: clean full-corpus default-SF run appends") {
    assert(BenchGuard.shouldAppend(fullCorpus = true, defaultSf = true,
      hostDrift = false, canariesComplete = true, historyNonEmpty = true,
      totalRatioVsPrev = Some(1.05)))
  }

  test("append gate: drifted run is excluded") {
    assert(!BenchGuard.shouldAppend(fullCorpus = true, defaultSf = true,
      hostDrift = true, canariesComplete = true, historyNonEmpty = true,
      totalRatioVsPrev = Some(1.05)))
  }

  test("append gate: total >1.5x previous committed total is excluded") {
    // r17's 472 s vs the 130.8 s clean number = 3.6x — must not seed refs
    assert(!BenchGuard.shouldAppend(fullCorpus = true, defaultSf = true,
      hostDrift = false, canariesComplete = true, historyNonEmpty = true,
      totalRatioVsPrev = Some(3.6)))
  }

  test("append gate: no previous committed total means no total veto") {
    assert(BenchGuard.shouldAppend(fullCorpus = true, defaultSf = true,
      hostDrift = false, canariesComplete = true, historyNonEmpty = true,
      totalRatioVsPrev = None))
  }

  test("append gate: subset / non-default-SF / incomplete runs excluded") {
    assert(!BenchGuard.shouldAppend(fullCorpus = false, defaultSf = true,
      hostDrift = false, canariesComplete = true, historyNonEmpty = true, None))
    assert(!BenchGuard.shouldAppend(fullCorpus = true, defaultSf = false,
      hostDrift = false, canariesComplete = true, historyNonEmpty = true, None))
    assert(!BenchGuard.shouldAppend(fullCorpus = true, defaultSf = true,
      hostDrift = false, canariesComplete = false, historyNonEmpty = true, None))
    assert(!BenchGuard.shouldAppend(fullCorpus = true, defaultSf = true,
      hostDrift = false, canariesComplete = true, historyNonEmpty = false, None))
  }

  test("median: odd and even counts") {
    assert(BenchGuard.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(BenchGuard.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
  }
}
