package graft.jobs

import java.time.Instant
import org.apache.spark.sql.SparkSession
import graft.meta.{Defaults, DefaultsStore, StatusTracker}

/** Job execution context: session + metadata services + injected clock.
  * The reference job got `@manager`, `@defaults`, `@connection`
  * (`lib/etl/job.rb:35-49, 99-102`); `now` replaces `NOW()` so runs are
  * reproducible (SURVEY.md §7.4.3).
  */
final case class JobContext(
    spark: SparkSession,
    defaults: Defaults,
    now: Instant,
    argument: Option[String],
    statusId: Long,
    tracker: StatusTracker) {

  /** Persist a mid-run phase — reference `Job#phase=` (`job.rb:69-76`),
    * e.g. 'mapping' / 'finalize' (`loading.rb:135,161,204`).
    */
  def setPhase(phase: String): Unit = tracker.update(statusId, phase = phase)
}

/** A runnable ETL job — the reference's `Job` subclass contract
  * (`lib/etl/job.rb:141-143`: abstract `run`; `prepare`/`finalize` hooks
  * around it, `job.rb:104,130`). Job types Extraction/Loading
  * (`extraction.rb`, `loading.rb`) are conventions over the same trait.
  */
trait EtlJob {
  def name: String
  def jobType: String = "etl" // "extraction" | "loading" | "etl" (reference bundle suffixes)
  def prepare(ctx: JobContext): Unit = ()
  def run(ctx: JobContext): Unit
  def finalizeJob(ctx: JobContext): Unit = ()
}

/** Job lifecycle runner — reference `Job#launch_with_argument`
  * (`job.rb:78-139`): status `init` → `running` → `ok`/`failed`; non-debug
  * catches exceptions into a failed status row, debug re-raises; elapsed
  * time recorded.
  */
final class JobRunner(
    spark: SparkSession,
    defaultsStore: DefaultsStore,
    tracker: StatusTracker,
    clock: () => Instant = () => Instant.now()) {

  /** Returns the status row id of the run. */
  def run(job: EtlJob, argument: Option[String] = None, debug: Boolean = false): Long = {
    val id = tracker.begin(job.name, clock())
    // defaults domain = job name unless overridden (reference job.rb:99-102)
    val ctx = JobContext(spark, defaultsStore.forDomain(job.name), clock(), argument, id, tracker)
    try {
      job.prepare(ctx)
      tracker.update(id, status = "running")
      job.run(ctx)
      tracker.update(id, status = "ok", endTime = clock())
    } catch {
      case e: Throwable =>
        tracker.update(id, status = "failed",
          message = Option(e.getMessage).getOrElse(e.getClass.getSimpleName),
          endTime = clock())
        if (debug) throw e
    } finally {
      job.finalizeJob(ctx)
    }
    id
  }
}

/** Explicit failure from inside a job — reference `Job#fail`
  * (`job.rb:145-150`).
  */
final class JobFailedException(message: String) extends RuntimeException(message)
