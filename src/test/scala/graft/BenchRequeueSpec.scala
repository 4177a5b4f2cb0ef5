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
}
