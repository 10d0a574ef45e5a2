package graft.jobs

import java.time.{DayOfWeek, LocalDate}
import graft.meta.Status.Schedule

/** Schedule selection + sequential run loop — reference `ETLManager`
  * (`lib/etl/etl_manager.rb:89-136`) and the richer legacy semantics of
  * `lib/etl/job_schedule.rb:33-82`.
  */
final class Scheduler(registry: JobRegistry, runner: JobRunner) {

  /** Weekday names as the reference spells them (`etl_manager.rb:93-94`). */
  private def weekdayName(d: LocalDate): String =
    d.getDayOfWeek match {
      case DayOfWeek.MONDAY    => "monday"
      case DayOfWeek.TUESDAY   => "tuesday"
      case DayOfWeek.WEDNESDAY => "wednesday"
      case DayOfWeek.THURSDAY  => "thursday"
      case DayOfWeek.FRIDAY    => "friday"
      case DayOfWeek.SATURDAY  => "saturday"
      case DayOfWeek.SUNDAY    => "sunday"
    }

  /** O1: `is_enabled AND (force_run OR schedule=<weekday> OR
    * schedule='daily')`, ordered by `run_order` — reference
    * `planned_schedules` (`etl_manager.rb:89-103`).
    */
  def plannedSchedules(all: Seq[Schedule], today: LocalDate): Seq[Schedule] = {
    val wd = weekdayName(today)
    all.filter(s => s.isEnabled && (s.forceRun || s.schedule == wd || s.schedule == "daily"))
      .sortBy(_.runOrder)
  }

  /** O2: enabled ∧ forced, ordered — reference `forced_schedules`
    * (`etl_manager.rb:105-110`).
    */
  def forcedSchedules(all: Seq[Schedule]): Seq[Schedule] =
    all.filter(s => s.isEnabled && s.forceRun).sortBy(_.runOrder)

  /** O14 legacy semantics (`job_schedule.rb:33-82`): skip a daily job
    * already run today; weekly requires ≥7 days since last run; force
    * overrides.
    */
  def isDue(s: Schedule, today: LocalDate, lastRun: Option[LocalDate]): Boolean =
    s.isEnabled && (s.forceRun || (s.schedule match {
      case "daily"  => !lastRun.contains(today)
      case "weekly" => lastRun.forall(lr => java.time.temporal.ChronoUnit.DAYS.between(lr, today) >= 7)
      case wd       => weekdayName(today) == wd && !lastRun.contains(today)
    }))

  /** O3: sequential run loop, no parallelism, no retry; a missing job is
    * logged and skipped — reference `run_schedules`
    * (`etl_manager.rb:127-136, 142-145`). Intra-job parallelism is Spark's.
    */
  def runSchedules(schedules: Seq[Schedule], debug: Boolean = false): Seq[(String, Option[Long])] =
    schedules.map { s =>
      registry.get(s.jobName) match {
        case Some(job) => s.jobName -> Some(runner.run(job, s.argument, debug))
        case None =>
          System.err.println(s"[scheduler] job not found, skipping: ${s.jobName}")
          s.jobName -> None
      }
    }

  def runScheduledJobs(all: Seq[Schedule], today: LocalDate, debug: Boolean = false): Seq[(String, Option[Long])] =
    runSchedules(plannedSchedules(all, today), debug)

  def runForcedJobs(all: Seq[Schedule], debug: Boolean = false): Seq[(String, Option[Long])] =
    runSchedules(forcedSchedules(all), debug)
}
