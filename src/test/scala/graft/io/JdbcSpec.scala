package graft.io

import graft.SparkSpec
import graft.jobs.{EtlJob, JobContext, JobRegistry, JobRunner, Scheduler}
import graft.meta.{DefaultsStore, StatusTracker}
import graft.meta.Status.Schedule
import org.apache.spark.sql.functions._

/** S3 executed LIVE against an embedded RDBMS. The reference's defining
  * source is a real database reached through named connections
  * (`lib/etl/repository_manager.rb:32-71` — postgres/sqlite3/mysql), and
  * its tests isolate with in-memory SQLite
  * (`test/etl_manager_test.rb:16-27`, `test/job_running_test.rb:35-53`).
  * Apache Derby ships with the Spark distribution (Hive metastore
  * dependency, `/opt/spark/jars/derby-*.jar`), so `jdbc:derby:memory:` is
  * our in-memory SQLite: the `format("jdbc")` read/write branches in
  * [[Connections]] run against a live database with zero egress and zero
  * new dependencies.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def jdbcConn(name: String) = Connections.ConnectionInfo(
    name, "jdbc",
    options = Map("url" -> url, "driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))

  test("Connections.write → read round-trips a live JDBC database (S3/S6/S7)") {
    Connections.clear()
    Connections.add(jdbcConn("warehouse"))
    import spark.implicits._
    val df = Seq((1L, "alpha", 3.5), (2L, "beta", -1.0), (3L, null.asInstanceOf[String], 0.25))
      .toDF("id", "name", "score")
    // overwrite = reference CTAS (S7): DROP + CREATE + INSERT in the DB
    Connections.write(df, "warehouse", "rt_table", mode = "overwrite")
    val back = Connections.read(spark, "warehouse", "rt_table")
    assert(back.schema.fieldNames.map(_.toLowerCase).sorted.toSeq == Seq("id", "name", "score"))
    assert(back.count() == 3)
    assert(back.filter(col("id") === 2L).select(lower(col("name"))).head().getString(0) == "beta")
    assert(back.filter(col("name").isNull).count() == 1)
    // append = reference INSERT INTO … SELECT (S6) onto the existing table
    Connections.write(Seq((4L, "gamma", 9.0)).toDF("id", "name", "score"),
      "warehouse", "rt_table", mode = "append")
    assert(Connections.read(spark, "warehouse", "rt_table").count() == 4)
  }

  test("predicate pushdown reaches the live JDBC scan") {
    Connections.clear()
    Connections.add(jdbcConn("warehouse"))
    import spark.implicits._
    Connections.write((1L to 100L).map(i => (i, s"row_$i")).toDF("id", "label"),
      "warehouse", "push_table", mode = "overwrite")
    val q = Connections.read(spark, "warehouse", "push_table").filter(col("id") > 90L)
    // the filter must compile into the generated SQL (PushedFilters on the
    // JDBC row scan), not run Spark-side over a full-table fetch — at scale
    // this is the difference between reading 10 rows and 10^9
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("GreaterThan"),
      s"expected pushed JDBC filter in plan:\n$physical")
    assert(q.count() == 10)
  }

  test("scheduled job runs end-to-end against the live DB (job_running_test.rb:35-53)") {
    Connections.clear()
    Connections.add(jdbcConn("warehouse"))
    import spark.implicits._
    // mirror of the reference fixture job (`test/jobs/test.etl/test.rb:20-23`):
    // the run inserts exactly one row into test_table
    Connections.write(spark.emptyDataset[(Long, String)].toDF("id", "message"),
      "warehouse", "test_table", mode = "overwrite")
    val insertJob = new EtlJob {
      val name = "jdbc_insert"
      def run(ctx: JobContext): Unit = {
        ctx.setPhase("inserting")
        import ctx.spark.implicits._
        Connections.write(Seq((1L, "launched")).toDF("id", "message"),
          "warehouse", "test_table", mode = "append")
      }
    }
    val registry = new JobRegistry
    registry.register(insertJob)
    val tracker = new StatusTracker
    val scheduler = new Scheduler(registry, new JobRunner(spark, new DefaultsStore, tracker))
    val results = scheduler.runScheduledJobs(
      Seq(Schedule(1L, "jdbc_insert", None, isEnabled = true, "daily", forceRun = false, 1)),
      java.time.LocalDate.of(2026, 1, 5))
    assert(results == Seq("jdbc_insert" -> Some(1L)))
    assert(tracker.all.head.status == "ok")
    val rows = Connections.read(spark, "warehouse", "test_table")
    assert(rows.count() == 1)
    assert(rows.select(lower(col("message"))).head().getString(0) == "launched")
  }
}
