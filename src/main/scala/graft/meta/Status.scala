package graft.meta

import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Job status / batch audit records — the reference's `etl_job_status` and
  * `etl_batches` tables plus the `v_etl_enabled_job_status` monitoring view
  * (`install/etl_tables.mysql.sql:1-25,56-64`, models
  * `lib/etl/etl_job_status.rb`, `lib/etl/batch.rb`).
  */
object Status {

  /** Reference `etl_job_status` row — `lib/etl/etl_job_status.rb:4-11`.
    * Status transitions: init → running → ok | failed (`job.rb:91-124`).
    */
  final case class JobStatus(
      id: Long,
      jobName: String,
      status: String,
      phase: Option[String],
      message: Option[String],
      startTime: java.sql.Timestamp,
      endTime: Option[java.sql.Timestamp])

  /** Reference `etl_batches` row — `install/etl_tables.mysql.sql:1-13`,
    * created by `Loading#prepare` (`loading.rb:29-46`).
    */
  final case class Batch(
      id: Long,
      batchType: String,
      batchSource: String,
      dataSourceName: Option[String],
      dataSourceUrl: Option[String],
      batchDate: java.sql.Date,
      username: String)

  /** Schedule row — reference `etl_schedules`
    * (`lib/etl/etl_job_schedule.rb:4-10`).
    */
  final case class Schedule(
      id: Long,
      jobName: String,
      argument: Option[String],
      isEnabled: Boolean,
      schedule: String,
      forceRun: Boolean,
      runOrder: Int)

  /** The monitoring view `v_etl_enabled_job_status`
    * (`install/etl_tables.mysql.sql:56-64`): status × schedules join with
    * duration `TIMEDIFF(IFNULL(end,NOW()), start)`, newest first. `now` is
    * injected for reproducibility (SURVEY.md §7.4.3).
    */
  def monitoringView(statuses: DataFrame, schedules: DataFrame, now: java.sql.Timestamp): DataFrame =
    statuses.join(broadcast(schedules.filter(col("isEnabled"))), Seq("jobName"))
      .withColumn("duration_sec",
        round((unix_millis(coalesce(col("endTime"), lit(now))) -
               unix_millis(col("startTime"))) / lit(1000.0), 3))
      .select("jobName", "status", "phase", "startTime", "endTime", "duration_sec", "runOrder")
      .orderBy(desc("startTime"))

  def statusesDF(spark: SparkSession, rows: Seq[JobStatus]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  def schedulesDF(spark: SparkSession, rows: Seq[Schedule]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** O10 durability for schedules: the reference bootstrap creates
    * `etl_schedules` alongside the defaults/status tables
    * (`etl_manager.rb:36-41`, `install/etl_tables.mysql.sql`), so
    * `initialize` persists them too — schedules also load from `-c`
    * YAML at each run, which remains the operational source of truth;
    * this table is the bootstrapped durable copy.
    */
  def saveSchedules(spark: SparkSession, rows: Seq[Schedule], path: String): Unit = {
    import spark.implicits._
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadSchedules(spark: SparkSession, path: String): Seq[Schedule] = {
    import spark.implicits._
    spark.read.parquet(path).as[Schedule].collect().toSeq.sortBy(_.id)
  }
}

/** In-memory status tracker with the reference's lifecycle semantics; a
  * parquet append sink makes it durable (the reference INSERTed per
  * transition; we append the final row per run).
  */
final class StatusTracker {
  import Status._
  private val rows   = scala.collection.mutable.ArrayBuffer.empty[JobStatus]
  private val nextId = new java.util.concurrent.atomic.AtomicLong(1)

  def begin(jobName: String, now: Instant): Long = synchronized {
    val id = nextId.getAndIncrement()
    rows += JobStatus(id, jobName, "init", None, None,
      java.sql.Timestamp.from(now), None)
    id
  }

  def update(id: Long, status: String = null, phase: String = null,
             message: String = null, endTime: Instant = null): Unit = synchronized {
    val i = rows.indexWhere(_.id == id)
    if (i >= 0) {
      val r = rows(i)
      rows(i) = r.copy(
        status  = Option(status).getOrElse(r.status),
        phase   = Option(phase).orElse(r.phase),
        message = Option(message).orElse(r.message),
        endTime = Option(endTime).map(java.sql.Timestamp.from).orElse(r.endTime))
    }
  }

  def all: Seq[JobStatus] = synchronized(rows.toSeq)
  def forJob(name: String): Seq[JobStatus] = synchronized(rows.filter(_.jobName == name).toSeq)

  /** O10 durability: persist status rows as parquet (the reference's
    * metadata tables, minus the RDBMS).
    */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    all.toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Unit = synchronized {
    import spark.implicits._
    rows.clear()
    rows ++= spark.read.parquet(path).as[JobStatus].collect()
    nextId.set(rows.map(_.id).maxOption.getOrElse(0L) + 1)
  }
}
