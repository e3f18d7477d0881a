package graft.pipelines

import org.apache.spark.sql.SparkSession

/** Sequential pipeline orchestration with per-step retry — the engine
  * equivalent of the reference's run-everything driver
  * (`run_all_template.py:23-67`): run N pipelines in order, retry each
  * up to 3 times with a delay (`pipelines/etl_utils.py:39-53`
  * `retry_call`), CONTINUE past a pipeline that exhausts its retries,
  * and report a per-step summary at the end.
  *
  * Two reference behaviors are kept deliberately:
  *
  *  - **gating**: the reference runs each ETL only if its downloader
  *    succeeded (`if retry_call(download): retry_call(etl)`). A [[Step]]
  *    may name a predecessor in `after`; if that predecessor failed or
  *    was itself skipped, the step records as skipped without running.
  *  - **continue-on-failure**: `retry_call` returns False rather than
  *    raising, so one dead pipeline never blocks the rest of the nightly
  *    run. `runAll` never throws for a step failure; the [[Summary]]
  *    carries the outcome and `Summary.failed` drives the caller's exit
  *    code.
  *
  * Retry safety is the engine's replay-idempotence contract: every sink
  * in this library (upsert MERGE, versioned commits with tags, done-log
  * ledgers) is safe to re-run after a mid-write crash, so re-invoking a
  * step that failed halfway is exactly the recovery the sinks were
  * designed for. Orchestration state is driver-side only and
  * metadata-sized (a result row per step) — nothing here scales with
  * data volume.
  */
object Orchestrator {

  /** One orchestrated unit. `after`: optional name of an earlier step in
    * the same run that must have SUCCEEDED for this one to start (the
    * downloader→ETL gate). */
  final case class Step(name: String,
                        run: SparkSession => Unit,
                        after: Option[String] = None)

  /** Sugar: `Orchestrator.step("zmb51") { s => ... }`. */
  def step(name: String, after: Option[String] = None)
          (run: SparkSession => Unit): Step = Step(name, run, after)

  sealed trait Outcome
  case object Succeeded extends Outcome
  case object Failed extends Outcome
  /** Not attempted: the `after` dependency did not succeed. */
  case object Skipped extends Outcome

  final case class StepResult(name: String,
                              outcome: Outcome,
                              attempts: Int,
                              seconds: Double,
                              error: Option[String]) {
    def ok: Boolean = outcome == Succeeded
  }

  final case class Summary(results: Seq[StepResult]) {
    def succeeded: Seq[StepResult] = results.filter(_.outcome == Succeeded)
    def failed: Seq[StepResult] = results.filter(_.outcome == Failed)
    def skipped: Seq[StepResult] = results.filter(_.outcome == Skipped)
    def allOk: Boolean = failed.isEmpty && skipped.isEmpty

    /** Human report, one line per step (the reference prints per-step
      * progress lines; the engine reports once at the end). */
    def report: String = results.map { r =>
      val state = r.outcome match {
        case Succeeded => f"ok      (${r.attempts}%d attempt(s), ${r.seconds}%.1fs)"
        case Failed    => f"FAILED  (${r.attempts}%d attempt(s), ${r.seconds}%.1fs): ${r.error.getOrElse("")}"
        case Skipped   => s"skipped (dependency not met)"
      }
      f"${r.name}%-28s $state"
    }.mkString("\n")
  }

  /** Run `steps` in order with per-step retry. Never throws for a step
    * failure — inspect the returned [[Summary]].
    *
    * @param maxRetries attempts per step before recording failure (3,
    *                   matching the reference's `retry_call`)
    * @param delayMs    pause between attempts (5000 ms in the reference)
    * @param sleeper    injectable for deterministic tests — production
    *                   default is a real sleep
    */
  def runAll(spark: SparkSession,
             steps: Seq[Step],
             maxRetries: Int = 3,
             delayMs: Long = 5000L,
             sleeper: Long => Unit = Thread.sleep): Summary = {
    require(maxRetries >= 1, s"maxRetries must be >= 1, got $maxRetries")
    val names = steps.map(_.name)
    require(names.distinct == names,
      s"duplicate step names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    steps.zipWithIndex.foreach { case (s, i) =>
      s.after.foreach { dep =>
        val j = names.indexOf(dep)
        require(j >= 0, s"step '${s.name}' gates on unknown step '$dep'")
        require(j < i, s"step '${s.name}' gates on LATER step '$dep' — " +
          "dependencies must appear earlier in the sequence")
      }
    }
    val done = scala.collection.mutable.Map[String, Outcome]()
    val results = steps.map { s =>
      val gateOpen = s.after.forall(done.get(_).contains(Succeeded))
      if (!gateOpen) {
        done(s.name) = Skipped
        StepResult(s.name, Skipped, 0, 0.0, None)
      } else {
        val t0 = System.nanoTime()
        var attempt = 0
        var lastError: Option[String] = None
        var ok = false
        while (!ok && attempt < maxRetries) {
          attempt += 1
          try { s.run(spark); ok = true; lastError = None }
          catch {
            case e: Throwable if scala.util.control.NonFatal(e) ||
              e.isInstanceOf[AssertionError] =>
              lastError = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
              if (attempt < maxRetries) sleeper(delayMs)
          }
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val outcome = if (ok) Succeeded else Failed
        done(s.name) = outcome
        StepResult(s.name, outcome, attempt, secs, lastError)
      }
    }
    Summary(results)
  }
}
