package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.parseIsolated — the quiet-box adjudication child's
  * stdout parse — without forking a JVM. The contract under test: a
  * query that ERRORED in the child must never publish its
  * time-to-failure as isolated_sec (it would read as a clean fast run
  * and wrongly acquit a real regression); missing queries and a
  * missing summary line degrade to explicit annotations. */
class BenchParseSpec extends AnyFunSuite {

  private val summary =
    """{"metric":"total","value":9.9,"unit":"sec","basis":"noop",""" +
      """"queries":{"q1":1.5,"q2":0.07,"pipeline_e2e":4.0},""" +
      """"errors":{"q2":"SparkException: stage failed"},""" +
      """"details":{"q1":{"metrics":{"task_time_ms":123,"task_cpu_ms":77,"os_load":0.5}},""" +
      """"pipeline_e2e":{"runs":[4.0],"min":4.0}}}"""

  private val stdout =
    s"""some stray warmup noise\n$summary\n{"metric":"summary","total_sec":9.9}\n"""

  test("clean query lands isolated sec + metrics") {
    val (oks, errs) = Bench.parseIsolated(stdout, Seq("q1"), 0)
    assert(oks === Map("q1" -> ((1.5, "123", "77", "0.5"))))
    assert(errs.isEmpty)
  }

  test("child-errored query lands in errs, never publishes its " +
      "time-to-failure (exit 3)") {
    val (oks, errs) = Bench.parseIsolated(stdout, Seq("q1", "q2"), 3)
    assert(oks.keySet === Set("q1"))
    assert(errs.keySet === Set("q2"))
    assert(errs("q2").contains("child errored (exit=3)"))
    assert(errs("q2").contains("stage failed"))
  }

  test("pipeline entry without a metrics block still lands sec " +
      "(nulls for the counters)") {
    val (oks, errs) = Bench.parseIsolated(stdout, Seq("pipeline_e2e"), 0)
    assert(oks === Map("pipeline_e2e" -> ((4.0, "null", "null", "null"))))
    assert(errs.isEmpty)
  }

  test("name absent from the child's queries is annotated, not dropped") {
    val (oks, errs) = Bench.parseIsolated(stdout, Seq("q404"), 0)
    assert(oks.isEmpty)
    assert(errs("q404").contains("missing from child output"))
  }

  test("no summary line at all (crashed/killed child) annotates " +
      "every requested name") {
    val (oks, errs) =
      Bench.parseIsolated("gibberish\nno json here\n", Seq("q1", "q2"), -1)
    assert(oks.isEmpty)
    assert(errs.keySet === Set("q1", "q2"))
    assert(errs.values.forall(_.contains("no child summary line (exit=-1)")))
  }

  test("isolation verdict: quiet box under cpus/4, contaminated above, " +
      "unknown when the gauge is missing (planted high-load case)") {
    // the r18 committed case: os_load 15.2 on a 32-cpu box must NOT
    // read as a quiet-box confirmation.
    assert(Bench.isolationVerdict("15.2", 32) === "load-contaminated")
    assert(Bench.isolationVerdict("2.7", 32) === "quiet")
    assert(Bench.isolationVerdict("8.0", 32) === "quiet") // boundary: <=
    assert(Bench.isolationVerdict("8.1", 32) === "load-contaminated")
    assert(Bench.isolationVerdict("null", 32) === "unknown")
    assert(Bench.isolationVerdict("", 32) === "unknown")
    assert(Bench.isolationVerdict("1.5", 4) === "load-contaminated")
  }
}
