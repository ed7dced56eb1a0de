package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact must discredit itself when contaminated: rounds 4
  * and 5 each shipped a ~5× polluted driver-side total that looked like
  * a regression until a judge re-ran the bench on a quiet machine. These
  * cases replay both observed contamination signatures (and the clean
  * shape) against the flagging rule. */
class BenchSpec extends AnyFunSuite {

  test("clean run: low start load, tight reps — not suspect") {
    assert(Bench.suspectReason(Some(1.7),
      Seq("q_agg_q1" -> Seq(0.61, 0.58), "q_pagerank" -> Seq(2.3, 2.2))).isEmpty)
  }

  test("competing load at JVM start flags the artifact (round-5 driver signature)") {
    val r = Bench.suspectReason(Some(3.0), Seq("q_agg_q1" -> Seq(0.61, 0.58)))
    assert(r.contains("loadavg_start 3.00"))
  }

  test("wide spread on a multi-second query flags it (round-4 signature)") {
    // q_dedup_cluster recorded 48.7 s then 4.7 s on identical code
    val r = Bench.suspectReason(Some(1.0),
      Seq("q_agg_q1" -> Seq(0.61, 0.58), "q_dedup_cluster" -> Seq(48.7, 4.7)))
    assert(r.exists(_.contains("q_dedup_cluster")))
  }

  test("sub-second jitter is not contamination — GC alone spreads tiny queries 3x") {
    assert(Bench.suspectReason(Some(1.0),
      Seq("q_filter_pred" -> Seq(0.45, 0.05))).isEmpty)
  }

  test("JIT warm-up spread on short queries is not contamination (clean round-6 shape)") {
    // observed on an idle machine (loadavg 0.61): rep 1 pays the query's
    // own codegen compile — 3.3x on a 0.5 s query means nothing
    assert(Bench.suspectReason(Some(0.61),
      Seq("q_funnel" -> Seq(1.785, 0.545), "q_ivfsq_recall" -> Seq(8.22, 3.88))).isEmpty)
  }

  test("unparseable or absent loadavg never flags by itself") {
    assert(Bench.suspectReason(None, Seq("q_agg_q1" -> Seq(0.6, 0.6))).isEmpty)
  }

  test("steady contention trips the committed-baseline median gate (round-10 driver signature)") {
    // BENCH_r10.json ran at loadavg 2.03 with BOTH reps under the same
    // load: start-load gate (< 2.5) and spread gate (tight reps) both
    // passed while every query sat ~1.2-4x above the committed clean
    // run. The median-vs-baseline comparison is the one signal steady
    // contention cannot fool.
    val keys = (1 to 30).map(i => s"q_$i")
    def json(vals: Map[String, Double], sf: String): String =
      s"""{"metric":"total","queries":${
        vals.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      },"reps":{},"sf":"$sf"}"""
    val base = keys.map(_ -> 1.0).toMap
    val committed = json(base, "/sf")
    // clean re-run: +-8% host tenancy — median ~1.0, no flag
    val clean = keys.zipWithIndex.map { case (k, i) =>
      k -> Some(1.0 + (if (i % 2 == 0) 0.08 else -0.08)) }
    val rClean = Bench.baselineMedianRatio(committed, "/sf", clean)
    assert(rClean.exists(r => r > 0.9 && r < 1.1))
    assert(Bench.suspectReason(Some(2.03), Seq("q_1" -> Seq(1.1, 1.05)), rClean).isEmpty)
    // contaminated: uniform 1.24x inflation, tight reps, loadavg 2.03
    val hot = keys.map(k => k -> Some(1.24)).toSeq
    val rHot = Bench.baselineMedianRatio(committed, "/sf", hot)
    assert(rHot.contains(1.24))
    val flagged = Bench.suspectReason(Some(2.03), Seq("q_1" -> Seq(1.25, 1.24)), rHot)
    assert(flagged.exists(_.contains("vs committed bench_full.json")), flagged)
    // guards: different sf, thin intersection, absent baseline => None
    assert(Bench.baselineMedianRatio(committed, "/other", hot).isEmpty)
    assert(Bench.baselineMedianRatio(committed, "/sf", hot.take(5)).isEmpty)
    assert(Bench.baselineMedianRatio("", "/sf", hot).isEmpty)
    // sub-0.2 s baseline rows are jitter-dominated and excluded
    val tiny = json(keys.map(_ -> 0.1).toMap, "/sf")
    assert(Bench.baselineMedianRatio(tiny, "/sf", hot).isEmpty)
  }

  test("self-healing: a spread-tripped query's median recovers the clean number") {
    // round-4 signature: q_dedup_cluster measured [48.7, 4.7] under
    // contamination — earlier rounds flagged such runs but still
    // published the polluted headline. With the trip wire shared, a
    // third rep runs and the median discards the outlier (here: a
    // 4.9 s third rep recovers the clean ~4.8 s number).
    assert(Bench.spreadTripped(Seq(48.7, 4.7)))
    assert(Bench.medianOf(Seq(48.7, 4.7, 4.9)) == 4.9)
    // clean JIT warm-up spread on short queries must NOT trigger a third
    // rep (same bounds as the suspect flag — one rule, two uses)
    assert(!Bench.spreadTripped(Seq(1.785, 0.545)))
    assert(!Bench.spreadTripped(Seq(8.22, 3.88)))
  }
}
