package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.LinkedHashMap

/** [[Bench.contentionSummary]] — the compact twin's contamination
  * self-identification (VERDICT r9 missing #2): a mid-run host storm must
  * be readable from the ~4 KB archived stdout tail alone, as a
  * range-compressed list of the queries whose parallel-probe degradation
  * (calib_pq / calib_q) exceeded 2× the run median.
  */
class BenchContentionSpec extends AnyFunSuite {

  private def names(n: Int) = (1 to n).map(i => f"q$i%02d_some_query")

  test("a healthy run reports no contention") {
    val ns = names(10)
    val cq = LinkedHashMap(ns.map(_ -> 0.10): _*)
    val cpq = LinkedHashMap(ns.map(_ -> 0.12): _*)
    val (flag, mx) = Bench.contentionSummary(cq, cpq)
    assert(flag == "")
    assert(mx < 2.0)
  }

  test("a mid-run storm compresses to execution-order ranges") {
    val ns = names(10)
    val cq = LinkedHashMap(ns.map(_ -> 0.10): _*)
    val cpq = LinkedHashMap(ns.map(_ -> 0.12): _*)
    // storm over q04-q06 plus an isolated hit on q09 (the r9 shape:
    // BENCH_r09.json's q47-q71 block). Probes run BEFORE a query's reps,
    // so q04's hot probe also implicates q03 (the storm may have started
    // during q03's reps) and q09's implicates q08 (VERDICT r10 ask #8).
    cpq(ns(3)) = 1.0
    cpq(ns(4)) = 0.9
    cpq(ns(5)) = 0.8
    cpq(ns(8)) = 0.7
    val (flag, mx) = Bench.contentionSummary(cq, cpq)
    assert(flag == "q03-q06,q08-q09", s"got '$flag'")
    assert(mx > 5.0, s"max ratio should reflect the worst query, got $mx")
  }

  test("a storm first seen on the LAST query's probe flags its predecessor") {
    val ns = names(6)
    val cq = LinkedHashMap(ns.map(_ -> 0.10): _*)
    val cpq = LinkedHashMap(ns.map(_ -> 0.12): _*)
    cpq(ns(5)) = 2.0 // storm started mid-rep of q05, caught by q06's probe
    val (flag, _) = Bench.contentionSummary(cq, cpq)
    assert(flag == "q05-q06", s"got '$flag'")
  }

  test("degenerate inputs (one query, zero probes) stay quiet") {
    assert(Bench.contentionSummary(LinkedHashMap("q01_x" -> 0.1),
      LinkedHashMap("q01_x" -> 5.0)) == (("", 1.0)))
    assert(Bench.contentionSummary(LinkedHashMap.empty[String, Double],
      LinkedHashMap.empty[String, Double]) == (("", 1.0)))
  }

  // windowSummary (VERDICT r13 ask #2): the WHOLE-RUN health stamp.
  // contentionSummary compares each query against the run's own median,
  // so a storm that elevates the entire run moves the median with it and
  // flags nothing — exactly the r13 shape (median pq/q 0.77 for the whole
  // session vs the 0.5 the probes' construction predicts). The stamp
  // compares against that ABSOLUTE prediction instead.

  test("a run at the predicted parallel ratio stamps healthy") {
    val ns = names(8)
    val cq = LinkedHashMap(ns.map(_ -> 0.10): _*)
    val cpq = LinkedHashMap(ns.map(_ -> 0.05): _*) // exactly predicted 0.5
    val (ratio, stamp) = Bench.windowSummary(cq, cpq)
    assert(stamp == "healthy" && math.abs(ratio - 0.5) < 1e-9)
    // the r12 reference window (0.47) is healthy too
    val cpq2 = LinkedHashMap(ns.map(_ -> 0.047): _*)
    assert(Bench.windowSummary(cq, cpq2)._2 == "healthy")
  }

  test("a whole-run parallel-capacity loss stamps degraded even though no query flags") {
    val ns = names(8)
    val cq = LinkedHashMap(ns.map(_ -> 0.10): _*)
    val cpq = LinkedHashMap(ns.map(_ -> 0.077): _*) // the r13 window: 0.77
    val (flag, _) = Bench.contentionSummary(cq, cpq)
    assert(flag == "", "uniform elevation must not trip per-query flags")
    val (ratio, stamp) = Bench.windowSummary(cq, cpq)
    assert(stamp == "degraded" && ratio > 0.7, s"got $stamp at $ratio")
  }

  test("single-query runs have no basis to stamp and default healthy") {
    assert(Bench.windowSummary(LinkedHashMap("q01_x" -> 0.1),
      LinkedHashMap("q01_x" -> 0.09)) == ((0.5, "healthy")))
  }
}
