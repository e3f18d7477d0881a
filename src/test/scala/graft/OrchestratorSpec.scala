package graft

import graft.io.UpsertWriter
import graft.pipelines.Orchestrator
import graft.pipelines.Orchestrator.{Failed, Skipped, Step, Succeeded}

/** The run-everything driver: N pipelines in order, each retried up to
  * 3×, a failed pipeline never blocking the rest, downloader→ETL gating,
  * and replay safety — re-running the whole sequence (the operator's
  * recovery move after a partial nightly run) leaves upsert-sink state
  * identical because the sinks are idempotent.
  */
class OrchestratorSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_orch").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("three pipelines with a transient mid-run failure: retried, all succeed") {
    val runs = scala.collection.mutable.ArrayBuffer[String]()
    var slept = 0L
    var flakyAttempts = 0
    val summary = Orchestrator.runAll(spark, Seq(
      Step("first", _ => runs += "first"),
      Step("flaky", { _ =>
        runs += "flaky"
        flakyAttempts += 1
        if (flakyAttempts < 2) sys.error("transient: table lock")
      }),
      Step("third", _ => runs += "third")),
      delayMs = 5000L, sleeper = slept += _)
    assert(summary.allOk)
    assert(summary.results.map(_.name) == Seq("first", "flaky", "third"))
    assert(summary.results.map(_.attempts) == Seq(1, 2, 1))
    assert(runs.toSeq == Seq("first", "flaky", "flaky", "third"), "in order; one retry")
    assert(slept == 5000L, "one inter-attempt delay, via the injected sleeper")
  }

  test("a pipeline that exhausts retries fails; later independent ones still run") {
    var deadAttempts = 0
    var ranLater = false
    val summary = Orchestrator.runAll(spark, Seq(
      Step("dead", _ => { deadAttempts += 1; sys.error("boom") }),
      Step("later", _ => ranLater = true)),
      sleeper = _ => ())
    assert(deadAttempts == 3, "retry_call semantics: 3 attempts")
    assert(ranLater, "continue-on-failure: one dead pipeline never blocks the run")
    val dead = summary.results.head
    assert(dead.outcome == Failed && dead.attempts == 3)
    assert(dead.error.exists(_.contains("boom")))
    assert(summary.failed.map(_.name) == Seq("dead"))
    assert(summary.report.contains("FAILED"))
  }

  test("downloader→ETL gating: the ETL is skipped when its download failed") {
    var etlRan = false
    var otherRan = false
    val summary = Orchestrator.runAll(spark, Seq(
      Step("download_zmb51", _ => sys.error("SAP GUI timeout")),
      Step("etl_zmb51", _ => etlRan = true, after = Some("download_zmb51")),
      Step("etl_other", _ => otherRan = true)),
      sleeper = _ => ())
    assert(!etlRan, "gated step must not run")
    assert(otherRan)
    assert(summary.results.map(_.outcome) == Seq(Failed, Skipped, Succeeded))
    assert(summary.results(1).attempts == 0)
    // a skip cascades: a step gated on a skipped step is skipped too
    val s2 = Orchestrator.runAll(spark, Seq(
      Step("a", _ => sys.error("x")),
      Step("b", _ => (), after = Some("a")),
      Step("c", _ => (), after = Some("b"))),
      sleeper = _ => ())
    assert(s2.results.map(_.outcome) == Seq(Failed, Skipped, Skipped))
  }

  test("misconfigured sequences are refused loudly") {
    intercept[IllegalArgumentException] {
      Orchestrator.runAll(spark, Seq(Step("a", _ => ()), Step("a", _ => ())))
    }
    intercept[IllegalArgumentException] {
      Orchestrator.runAll(spark, Seq(Step("a", _ => (), after = Some("nope"))))
    }
    intercept[IllegalArgumentException] {
      // forward gate: dependency must be EARLIER in the sequence
      Orchestrator.runAll(spark, Seq(
        Step("a", _ => (), after = Some("b")), Step("b", _ => ())))
    }
  }

  test("replaying the whole run after a partial failure is idempotent (upsert sinks)") {
    val t1 = tmpDir() + "/dim"
    val t2 = tmpDir() + "/fact"
    def steps(failSecondOnce: () => Boolean) = Seq(
      Step("load_dim", s => UpsertWriter.upsert(s,
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t1, Seq("k"))),
      Step("load_fact", { s =>
        UpsertWriter.upsert(s,
          Seq((10L, 1.0), (20L, 2.0)).toDF("k", "x"), t2, Seq("k"))
        if (failSecondOnce()) sys.error("crash AFTER the sink published")
      }))
    // run 1: the fact step publishes, then dies on every attempt — a
    // partial nightly run with real data already committed
    var firstRun = true
    val s1 = Orchestrator.runAll(spark, steps(() => firstRun), sleeper = _ => ())
    assert(s1.failed.map(_.name) == Seq("load_fact"))
    assert(spark.read.parquet(t2).count() == 2, "sink published before the crash")
    // run 2: operator replays the WHOLE sequence — the upsert sinks are
    // idempotent, so state is identical to a single clean run
    firstRun = false
    val s2 = Orchestrator.runAll(spark, steps(() => false), sleeper = _ => ())
    assert(s2.allOk)
    assert(spark.read.parquet(t1).as[(Long, String)].collect().sorted.toSeq
      == Seq((1L, "a"), (2L, "b")))
    assert(spark.read.parquet(t2).as[(Long, Double)].collect().sorted.toSeq
      == Seq((10L, 1.0), (20L, 2.0)), "no duplicate rows from the replay")
  }
}
