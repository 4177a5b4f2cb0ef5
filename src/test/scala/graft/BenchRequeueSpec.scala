package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench outlier re-queue decision logic (pure — no Spark session):
  * the self-healing pass that re-runs load-poisoned rows at suite end
  * instead of committing a fake regression to the artifact.
  */
class BenchRequeueSpec extends AnyFunSuite {

  test("parseBenchQueries: reads the flat queries object from a BENCH.json line") {
    val json = """{"metric":"total","value":9.0,"unit":"sec,"""" +
      """"queries":{"q_a":1.234,"q_b":0.100,"q_c":-1.000},""" +
      """"runs":{"q_a":[1.3,1.2]},"sf":"/x"}"""
    val got = Bench.parseBenchQueries(json)
    assert(got === Map("q_a" -> 1.234, "q_b" -> 0.1, "q_c" -> -1.0))
  }

  test("parseBenchQueries: garbage and missing sections yield empty") {
    assert(Bench.parseBenchQueries("not json") === Map.empty)
    assert(Bench.parseBenchQueries("""{"metric":"total"}""") === Map.empty)
  }

  test("needsRequeue: 3x-over-baseline triggers, only above the 0.5 s floor") {
    // the r5 incident shape: committed 2.9 s, both runs load-poisoned
    assert(Bench.needsRequeue(Seq(26.198, 34.227), Some(2.9)))
    // normal drift does not
    assert(!Bench.needsRequeue(Seq(3.1, 3.4), Some(2.9)))
    // sub-second jitter never re-queues even at 10x baseline
    assert(!Bench.needsRequeue(Seq(0.4, 0.45), Some(0.04)))
    // a failed baseline row (-1) is not a baseline
    assert(!Bench.needsRequeue(Seq(1.0, 1.1), Some(-1.0)))
  }

  test("needsRequeue: 2x run disagreement triggers without any baseline") {
    assert(Bench.needsRequeue(Seq(0.9, 2.1), None))
    assert(!Bench.needsRequeue(Seq(0.9, 1.5), None))
    assert(!Bench.needsRequeue(Seq(0.2, 0.5), None)) // floor-gated
  }

  test("needsRequeue: median-normalized 2x trigger on a healthy box") {
    // the r11 incident shape: q_triangle_count 4.82 s vs committed
    // 1.86 s (2.6x — under the 3x absolute bar) while the run median
    // tracked the artifact at 0.98x. A healthy-median run requeues >2x
    // rows...
    assert(Bench.needsRequeue(Seq(4.82, 5.0), Some(1.86), Some(0.98)))
    // ...a box-wide slow run (median 1.5x) does NOT — every row is
    // elevated, a requeue under the same load would measure the same
    assert(!Bench.needsRequeue(Seq(4.82, 5.0), Some(1.86), Some(1.5)))
    // no median signal (filtered run) → absolute rules only
    assert(!Bench.needsRequeue(Seq(4.82, 5.0), Some(1.86), None))
    // under 2x never triggers the median rule
    assert(!Bench.needsRequeue(Seq(3.5, 3.6), Some(1.86), Some(0.98)))
    // still floor-gated
    assert(!Bench.needsRequeue(Seq(0.45, 0.46), Some(0.2), Some(0.98)))
  }

  test("runMedianRatio: median over matched >=0.2 s rows, None under 10") {
    val prev = (1 to 12).map(i => s"q$i" -> 1.0).toMap
    // 12 matched rows, one spiked — median stays ~1.0
    val mins = (1 to 11).map(i => s"q$i" -> 1.0).toMap + ("q12" -> 5.0)
    val r = Bench.runMedianRatio(mins, prev)
    assert(r.exists(x => x >= 0.99 && x <= 1.01))
    // sub-floor rows are excluded from the signal
    val tiny = (1 to 12).map(i => s"q$i" -> 0.1).toMap
    assert(Bench.runMedianRatio(tiny, prev).isEmpty)
    // fewer than 10 matched rows → no signal
    val few = (1 to 5).map(i => s"q$i" -> 1.0).toMap
    assert(Bench.runMedianRatio(few, prev).isEmpty)
    // unmatched names don't count
    assert(Bench.runMedianRatio(
      (1 to 12).map(i => s"z$i" -> 1.0).toMap, prev).isEmpty)
  }
}
