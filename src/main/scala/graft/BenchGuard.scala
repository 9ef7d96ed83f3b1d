package graft

/** Pure decision logic for [[Bench]]'s host-drift detection and artifact
  * hygiene, factored out so it is unit-testable without running a sweep
  * (VERDICT r17 "What's wrong" #1/#3 and "Next round" #1/#7).
  *
  * Round-17 postmortem that fixed the rules: the committed BENCH_r17.json
  * read 472 s — 3.9x the round-16 total — yet its own drift flag said
  * `false`, because the old detector required ALL FIVE canaries to move
  * >1.2x and the run was load-RAMPED mid-sweep (early-alphabet canaries
  * q_topk 0.84 / d_minhash_lsh 1.07 sat quiet while late-alphabet
  * d_span_clusters hit 2.74 and token-family entries inflated 10-170x).
  * The loaded run then (a) clobbered the clean committed BENCH_FULL.json
  * and (b) appended its 7.33 s d_span_clusters to the canary history,
  * poisoning future references. Three rules close all three holes:
  *
  *   1. [[drifted]]: flag when the canary MEDIAN exceeds 1.2 OR
  *      when ANY single canary exceeds 1.5x — a split canary set is
  *      exactly the mid-sweep-ramp signature the AND-of-five missed.
  *      Bench evaluates it over THREE passes (start / in-sweep / end),
  *      so a ramp that arrives after the early canaries ran still trips
  *      the end pass.
  *   2. [[fullArtifact]]: a drifted run writes `BENCH_FULL.drifted.json`
  *      and leaves the committed clean `BENCH_FULL.json` untouched — a
  *      loaded run can never clobber the quiet artifact again.
  *   3. [[shouldAppend]]: the canary-history append additionally refuses
  *      runs whose total exceeds 1.5x the previously committed total —
  *      belt-and-braces for a uniform slowdown that keeps every ratio
  *      individually under 1.5.
  */
object BenchGuard {
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of empty seq")
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Host-drift verdict for ONE canary pass, `ratios` = measured / ref.
    * SLOW-SIDE ONLY: a run slower than the references may be
    * load-contaminated and must not become the committed artifact or a
    * history row — but a run FASTER than the references is by
    * definition less loaded than they were, so it is exactly the run
    * that should refresh both (the references are medians of recent
    * runs, which after a hot stretch sit ABOVE the machine's quiet
    * level; a symmetric band would quarantine the first
    * return-to-quiet run as "drift" and the references could never
    * recover). Empty (no history yet, or a subset run that skipped the
    * canaries) means "cannot tell" → false, same as the old detector.
    */
  def drifted(ratios: Seq[Double]): Boolean =
    ratios.nonEmpty && {
      val m = median(ratios)
      m > 1.2 || ratios.exists(_ > 1.5)
    }

  /** Where the full-precision artifact goes: drifted runs must not
    * overwrite the committed clean number.
    */
  def fullArtifact(hostDrift: Boolean): String =
    if (hostDrift) "BENCH_FULL.drifted.json" else "BENCH_FULL.json"

  /** Canary-history append gate: only a full-corpus run at the default
    * bench SF, with every canary measured, an existing history to extend,
    * no drift verdict on any pass, and a total within 1.5x of the
    * previously committed total (when one exists) may serve as a future
    * reference.
    */
  def shouldAppend(fullCorpus: Boolean, defaultSf: Boolean,
      hostDrift: Boolean, canariesComplete: Boolean,
      historyNonEmpty: Boolean, totalRatioVsPrev: Option[Double]): Boolean =
    fullCorpus && defaultSf && !hostDrift && canariesComplete &&
      historyNonEmpty && totalRatioVsPrev.forall(_ <= 1.5)
}
