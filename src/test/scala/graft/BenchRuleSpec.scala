package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench distortion rule is a GRADED gate (the driver's total is the
  * perf number, and two consecutive rounds shipped contention-distorted
  * samples the old rule certified quiet) — so its logic is pinned here as
  * a pure function, not just prose in README.
  */
class BenchRuleSpec extends AnyFunSuite {
  private def verdict(calib0: Double = 0.15, calib1: Double = 0.15,
      spin0: Double = 70, mtspin0: Double = 90,
      spin1: Double = 70, mtspin1: Double = 90,
      loadAtMax: Double = 5, cores: Int = 32,
      calibMedSweep: Double = 0.15,
      bandMedRatio: Double = 1.0, bandN: Int = 323,
      nOverBand2x: Int = 0) =
    Bench.distortionVerdict(calib0, calib1, spin0, mtspin0, spin1, mtspin1,
      loadAtMax, cores, calibMedSweep, bandMedRatio, bandN, nOverBand2x)

  test("a genuinely quiet run is not flagged") {
    // round-11 measured quiet-host shape: calib ~0.06-0.20, mtspin/spin
    // ~1.1-2.3, load_at_max ~5-7 of 32 cores (the bench's own threads)
    assert(!verdict()._1)
    assert(!verdict(calib0 = 0.198, calib1 = 0.065, mtspin0 = 161.1,
      spin0 = 71.8, mtspin1 = 80.0, spin1 = 69.4, loadAtMax = 7.28)._1)
  }

  test("the r10 driver fingerprint is caught by the calib clause alone") {
    // the distorted r10 driver sample read mtspin/spin ~1.4 and
    // load_at_max 11.79 on 32 cores — BOTH legacy clauses passed — while
    // a fixed-work step ran 17x its quiet band. The known-work anchor is
    // the clause that catches it even when every spin looks quiet.
    val (d, clauses) = verdict(calib0 = 0.15 * 17, mtspin0 = 98, spin0 = 70,
      loadAtMax = 11.79)
    assert(d && clauses.contains("calib=true"), clauses)
    // either end's sample suffices
    assert(verdict(calib1 = 3.1 * Bench.CalibQuietS)._1)
  }

  test("parallel-spin and load clauses still fire independently") {
    // without band coverage (bandN = 0) the proxies are the only
    // evidence and stand un-overridden; with a quiet band they defer to
    // the direct measurement (see the override test below)
    val (d1, c1) = verdict(mtspin0 = 300, spin0 = 70, bandN = 0)
    assert(d1 && c1.contains("spin=true"), c1)
    val (d2, c2) = verdict(mtspin1 = 300, spin1 = 70, bandN = 0)
    assert(d2 && c2.contains("spin=true"), c2)
    val (d3, c3) = verdict(loadAtMax = 60, cores = 32, bandN = 0)
    assert(d3 && c3.contains("load=true"), c3)
    // an elevated-but-sub-1.5 band (no hard band trip) also lets the
    // proxies stand — only a demonstrably QUIET sweep overrides
    assert(verdict(mtspin0 = 300, spin0 = 70, bandMedRatio = 1.2)._1)
  }

  test("sustained mid-sweep contention trips the in-sweep median clause") {
    // round-11 field finding: a co-tenant window degraded a whole sweep
    // ~1.6x while BOTH endpoint anchors and the guest load average read
    // quiet (calib_s_start 0.254, calib_s_end 0.127) — only the spread
    // in-sweep samples can see it. Median > 2x band => distorted; the
    // softer 1.3x band reads as calib_elevated, an advisory that an
    // inflated total is host noise.
    val (d, c) = verdict(calib0 = 0.254, calib1 = 0.127,
      calibMedSweep = 2 * Bench.CalibQuietS + 0.01)
    assert(d && c.contains("calib=true"), c)
    assert(!verdict(calibMedSweep = 1.9 * Bench.CalibQuietS)._1,
      "sub-2x in-sweep median must not hard-flag")
    assert(Bench.calibElevated(1.4 * Bench.CalibQuietS))
    assert(!Bench.calibElevated(1.2 * Bench.CalibQuietS))
  }

  test("write-roundtrip rows are tail-exempt: counted in median, not in over-2x") {
    // round-14 verdict #5: a judge quiet sweep (median 1.01) read
    // scan_csv_roundtrip at 2.20x the builder band — write round trips
    // measure filesystem state, the one row class whose band can't
    // transfer across hosts. They must not feed the over-2x tail count
    // (tail clause / override withholding) but must stay in the median.
    val band = Map("a" -> 1.0, "b" -> 1.0, "scan_csv_roundtrip" -> 0.2)
    val (med, over, n) = Bench.bandStats(
      Seq("a" -> 1.0, "b" -> 1.0, "scan_csv_roundtrip" -> 0.45), band)
    assert(n == 3 && over == 0, s"FS-jitter row must not count over-2x ($over)")
    assert(med == 1.0)
    // a genuine compute row at the same ratio still counts
    assert(Bench.bandStats(Seq("a" -> 2.25, "b" -> 1.0), band)._2 == 1)
    assert(Bench.tailExempt == Set("scan_csv_roundtrip",
      "scan_json_roundtrip", "scan_orc_roundtrip"))
  }

  test("per-query band stats: median ratio is robust, over-2x counts") {
    val band = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "tiny" -> 0.01)
    // uniform 1.6x host degradation reads as median 1.6; one genuine 5x
    // regression doesn't move the median; sub-50ms bands are excluded
    val (med, over, n) = Bench.bandStats(
      Seq("a" -> 1.6, "b" -> 1.6, "c" -> 5.0, "tiny" -> 9.9), band)
    assert(n == 3 && med == 1.6 && over == 1)
    assert(Bench.bandStats(Nil, band) == ((0.0, 0, 0)))
    assert(Bench.bandStats(Seq("x" -> 1.0), Map.empty) == ((0.0, 0, 0)))
    // the shipped resource names only declared queries (no stale orphans);
    // a NEW query may lack a band row until the next clean-run regen —
    // band_n in the artifact shows the coverage
    val declared = SparkEntry.specs.map(_.name).toSet
    val orphans = Bench.quietBand.keySet -- declared
    assert(orphans.isEmpty, s"bench_band.tsv rows with no declared query: $orphans")
    assert(Bench.quietBand.size >= 300, "bench_band.tsv went missing/empty")
  }

  test("the exact r11 driver fingerprint is distorted via the band clause") {
    // BENCH_r11 (driver): calib 0.273/0.118, calib_med_sweep 0.363,
    // spin 84.4/89.3, mtspin 106.6/107.9, load_at_max 17.72 on 32 cores,
    // band_median_ratio 1.75 over 323 band rows. Every pre-r12 clause
    // passed (calib_med 0.363 < 0.50 hard line) and the artifact shipped
    // `distorted: false` at 215.1 s — a provably degraded measurement
    // (judge-quiet same code: 121.9 s; 215.1/1.75 ≈ 123). The sustained
    // uniform band elevation is now a hard clause.
    val (d, c) = verdict(calib0 = 0.273, calib1 = 0.118,
      spin0 = 84.4, mtspin0 = 106.6, spin1 = 89.3, mtspin1 = 107.9,
      loadAtMax = 17.72, cores = 32, calibMedSweep = 0.363,
      bandMedRatio = 1.75, bandN = 323)
    assert(d && c.contains("band=true"), c)
    assert(!c.contains("calib=true") && !c.contains("spin=true") &&
      !c.contains("load=true"),
      s"only the band clause should fire on this fingerprint: $c")
  }

  test("band clause: quiet runs and small sweeps never trip it") {
    // r11 judge-clean fingerprint: ratio 1.05 over 323 rows — quiet
    assert(!verdict(calib0 = 0.165, calib1 = 0.061, calibMedSweep = 0.156,
      bandMedRatio = 1.05, bandN = 323)._1)
    // sub-1.5 median with a quiet anchor: advisory only, not distorted
    assert(!verdict(bandMedRatio = 1.49, bandN = 323)._1)
    // 1.4-1.5 median trips ONLY with the anchor also elevated (two
    // independent witnesses of the same sustained contention)
    assert(verdict(bandMedRatio = 1.45, bandN = 323,
      calibMedSweep = 1.4 * Bench.CalibQuietS)._1)
    assert(!verdict(bandMedRatio = 1.39, bandN = 323,
      calibMedSweep = 1.4 * Bench.CalibQuietS)._1)
    // a sweep with too few band rows (new-query churn, non-sf0.1 dir)
    // cannot use the clause — the median is not robust at small n
    assert(!verdict(bandMedRatio = 3.0, bandN = 99)._1)
    assert(verdict(bandMedRatio = 1.5, bandN = 100)._1)
  }

  test("quiet-sweep direct evidence overrides a proxy spin/load trip") {
    // round-12 field case: a start mtspin of 193.9 vs spin 75 (2.59x —
    // JVM shutdown residue from a run that ended ~30 s earlier) flagged
    // a 77 s sweep whose band median read 0.93 over 311 rows with ZERO
    // queries over 2x band. The band is the DIRECT measurement of
    // per-query distortion; when it says quiet (≤1.1 median, ≥100 rows)
    // and the calib anchor concurs, the proxy trip is a false positive.
    val (d, c) = verdict(spin0 = 75.0, mtspin0 = 193.9,
      calib0 = 0.243, calib1 = 0.064, calibMedSweep = 0.173,
      bandMedRatio = 0.93, bandN = 311)
    assert(!d && c.contains("sweepQuietOverride=true"), c)
    // no band coverage (non-sf0.1 dir) => the proxy stands
    assert(verdict(spin0 = 75.0, mtspin0 = 193.9, bandMedRatio = 0.0,
      bandN = 0)._1)
    // an elevated sweep never rescues: same spin trip at ratio 1.2
    assert(verdict(spin0 = 75.0, mtspin0 = 193.9, bandMedRatio = 1.2,
      bandN = 311)._1)
    // a calib-bad run never rescues regardless of band
    assert(verdict(calib0 = 3.1 * Bench.CalibQuietS, bandMedRatio = 0.93,
      bandN = 311)._1)
    // the round-11 live fire-drill (24 spinners, sf0.001 => bandN 0)
    // still flags via spin+load exactly as shipped
    assert(verdict(mtspin0 = 207, spin0 = 70, loadAtMax = 26.1, cores = 8,
      bandMedRatio = 0.0, bandN = 0)._1)
  }

  test("override is withheld on tail-concentrated contention evidence") {
    // round-12 ADVICE (medium): a co-tenant arriving in the LAST THIRD
    // of a sweep distorts dozens of queries while the 100+-row median
    // stays ≤1.1 — the old override would then suppress a legitimate
    // load/spin trip. Two new requirements, each sufficient to withhold:
    // (a) >1% of band rows over 2x — the driver-r12 sample read 28/318
    //     over 2x at median 1.01; with a proxy trip that must stand
    val (dA, cA) = verdict(loadAtMax = 60, cores = 32,
      bandMedRatio = 1.01, bandN = 318, nOverBand2x = 28)
    assert(dA && cA.contains("sweepQuietOverride=false"), cA)
    // (b) a hot END sentinel — contention still live when the sweep
    //     finished is not start residue; the trip stands
    val (dB, cB) = verdict(spin1 = 70, mtspin1 = 193.9,
      bandMedRatio = 0.95, bandN = 311, nOverBand2x = 0)
    assert(dB && cB.contains("sweepQuietOverride=false"), cB)
    // the motivating field case (start-residue mtspin trip, zero rows
    // over 2x, quiet end) is still overridden
    assert(!verdict(spin0 = 75.0, mtspin0 = 193.9, bandMedRatio = 0.93,
      bandN = 311, nOverBand2x = 0)._1)
    // boundary: exactly 1% of rows over 2x still overrides (<= bound);
    // one more row withholds
    assert(!verdict(spin0 = 75.0, mtspin0 = 193.9, bandMedRatio = 0.95,
      bandN = 300, nOverBand2x = 3)._1)
    assert(verdict(spin0 = 75.0, mtspin0 = 193.9, bandMedRatio = 0.95,
      bandN = 300, nOverBand2x = 4)._1)
  }

  test("the exact r13 driver fingerprint is distorted via the tail clause") {
    // BENCH_r13 (driver): calib 0.203/0.101, calib_med_sweep 0.179,
    // spin 69.9/73.5, mtspin 81.5/100.9, load_at_max 12.44 on 32 cores,
    // band_median_ratio 1.13 — every pre-r14 clause passed — yet
    // 40/321 rows sat over 2x band at up to 16.11x (the alphabetically
    // contiguous evt_* stretch: a transient co-tenant window), gc 8.7 s,
    // and the artifact shipped `distorted:false` at 125.9 s raw where
    // the clamped total read 101.9 and the judge's quiet sweep of the
    // same code read 82.25 s. Tail-concentrated contention is now a
    // hard clause: >=5% of >=100 band rows over 2x their own band.
    val (d, c) = verdict(calib0 = 0.203, calib1 = 0.101,
      spin0 = 69.9, mtspin0 = 81.5, spin1 = 73.5, mtspin1 = 100.9,
      loadAtMax = 12.44, cores = 32, calibMedSweep = 0.179,
      bandMedRatio = 1.13, bandN = 321, nOverBand2x = 40)
    assert(d && c.contains("tail=true"), c)
    assert(!c.contains("calib=true") && !c.contains("spin=true") &&
      !c.contains("load=true") && !c.contains("band=true"),
      s"only the tail clause should fire on this fingerprint: $c")
    // the r12 driver sample (28/318 over 2x at median 1.01) was the same
    // shape one round earlier — it now flags too
    assert(verdict(bandMedRatio = 1.01, bandN = 318, nOverBand2x = 28)._1)
  }

  test("tail clause boundaries: 5% of band rows, >=100 rows, quiet immunity") {
    // exactly 5% trips (>=), one row under does not
    assert(Bench.tailContention(16, 320) && verdict(bandN = 320,
      nOverBand2x = 16)._1)
    assert(!Bench.tailContention(15, 320) && !verdict(bandN = 320,
      nOverBand2x = 15)._1)
    // quiet sweeps (0-2 rows over 2x on 321 rows — every builder/judge
    // quiet sweep to date) sit far under the line
    assert(!verdict(bandN = 321, nOverBand2x = 2)._1)
    // no band coverage => no tail evidence (non-sf0.1 dirs)
    assert(!Bench.tailContention(40, 99) && !verdict(bandN = 0,
      nOverBand2x = 0)._1)
    // mutually exclusive with the quiet-sweep override by construction:
    // the override demands <=1% over 2x, the tail clause >=5%
    assert(!(Bench.tailContention(16, 320) && 16 * 100 <= 320))
  }

  test("band-clamped total bounds tail-concentrated contention") {
    // the driver-r12 shape in miniature: most rows at band, a contended
    // subset far over it. Clamp = sum(min(measured, 2*band)); un-banded
    // rows pass through raw.
    val band = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "tiny" -> 0.01)
    val clamped = Bench.bandClampedTotal(
      Seq("a" -> 1.0, "b" -> 5.0, "c" -> 1.9, "new" -> 3.0, "tiny" -> 9.9),
      band)
    // a: 1.0 (under), b: clamped to 2.0, c: 1.9 (under 2x), new: raw 3.0
    // (no band row), tiny: raw 9.9 (sub-50ms band excluded)
    assert(math.abs(clamped - (1.0 + 2.0 + 1.9 + 3.0 + 9.9)) < 1e-9)
    assert(Bench.bandClampedTotal(Nil, band) == 0.0)
    // the driver-r12 fingerprint at scale: 290 rows riding their 0.25 s
    // band + 28 rows at 4x band => raw 100.5 s, clamped 86.5 s — the
    // clamp recovers the quiet-sweep magnitude the median correction
    // (ratio 1.0 => no change) cannot
    val bigBand = (1 to 318).map(i => s"q$i" -> 0.25).toMap
    val sample = (1 to 290).map(i => s"q$i" -> 0.25) ++
      (291 to 318).map(i => s"q$i" -> 1.0)
    val raw = sample.map(_._2).sum
    val cl = Bench.bandClampedTotal(sample, bigBand)
    assert(math.abs(raw - 100.5) < 1e-9 && math.abs(cl - 86.5) < 1e-9,
      s"raw=$raw clamped=$cl")
  }

  test("boundaries: 3x band and 2.5x spin are the documented thresholds") {
    assert(!verdict(calib0 = 3 * Bench.CalibQuietS)._1,
      "exactly 3x band must not flag (threshold is strict >)")
    assert(verdict(calib0 = 3 * Bench.CalibQuietS + 1e-9)._1)
    assert(!verdict(mtspin0 = 2.5 * 70, spin0 = 70, bandN = 0)._1)
    assert(verdict(mtspin0 = 2.5 * 70 + 0.1, spin0 = 70, bandN = 0)._1)
  }
}
