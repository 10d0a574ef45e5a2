package graft.io

import graft.SparkSpec
import graft.ops.Loading
import org.apache.spark.sql.functions._

class ConfigSpec extends SparkSpec {

  private def write(content: String): String = {
    val f = java.nio.file.Files.createTempFile("cfg", ".yml")
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("loadConnections parses names, formats, paths, options (S5/S3)") {
    Connections.clear()
    val p = write(
      """staging:
        |  format: parquet
        |  path: /data/staging
        |warehouse:
        |  format: jdbc
        |  options:
        |    url: jdbc:postgresql://db/x
        |""".stripMargin)
    val names = Config.loadConnections(p)
    assert(names.sorted == Seq("staging", "warehouse"))
    assert(Connections.get("staging").get.basePath.contains("/data/staging"))
    assert(Connections.get("warehouse").get.options("url") == "jdbc:postgresql://db/x")
  }

  test("search path: first definition wins (repository_manager.rb:47-66)") {
    Connections.clear()
    val p1 = write("c1: { format: parquet, path: /first }\n")
    val p2 = write("c1: { format: parquet, path: /second }\nc2: { format: csv, path: /two }\n")
    Config.loadConnectionSearchPath(Seq(p1, "/nonexistent.yml", p2))
    assert(Connections.get("c1").get.basePath.contains("/first"))
    assert(Connections.get("c2").get.format == "csv")
  }

  test("loadAppConfig: connections + schedules, relative paths, key alias (bin/etl:69)") {
    Connections.clear()
    val dir = java.nio.file.Files.createTempDirectory("appcfg")
    java.nio.file.Files.writeString(dir.resolve("conns.yml"),
      "appdb: { format: parquet, path: /app/data }\n")
    java.nio.file.Files.writeString(dir.resolve("sched.yml"),
      "- { job: daily_load, schedule: daily, run_order: 1 }\n")
    java.nio.file.Files.writeString(dir.resolve("config.yml"),
      """connection_search_path: [conns.yml]
        |schedules: sched.yml
        |""".stripMargin)
    val scheds = Config.loadAppConfig(dir.resolve("config.yml").toString)
    assert(Connections.get("appdb").get.basePath.contains("/app/data"))
    assert(scheds.map(_.jobName) == Seq("daily_load"))

    // the reference WROTE repository_search_path but READ
    // connection_search_path (its config.yml bug, SURVEY §7.4.5) — we
    // deliberately accept both spellings.
    Connections.clear()
    java.nio.file.Files.writeString(dir.resolve("config2.yml"),
      "repository_search_path: [conns.yml]\n")
    assert(Config.loadAppConfig(dir.resolve("config2.yml").toString).isEmpty)
    assert(Connections.get("appdb").isDefined)
  }

  test("Cli -c <config> wires connections before command dispatch (O11)") {
    Connections.clear()
    val dir = java.nio.file.Files.createTempDirectory("clicfg")
    java.nio.file.Files.writeString(dir.resolve("conns.yml"),
      "clidb: { format: parquet, path: /cli/data }\n")
    java.nio.file.Files.writeString(dir.resolve("config.yml"),
      "connection_search_path: [conns.yml]\n")
    graft.Cli.main(Array("-c", dir.resolve("config.yml").toString, "list-connections"))
    assert(Connections.get("clidb").get.basePath.contains("/cli/data"))
    // the value-carrying flag is stripped from the remaining args
    val (c, rest) = graft.Cli.extractConfigArg(Array("-d", "--config", "/x.yml", "run", "j"))
    assert(c.contains("/x.yml"))
    assert(rest.toSeq == Seq("-d", "run", "j"))
  }

  test("manifest connection: transactional append/overwrite through the registry (S6/S7)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("conn_mf").toString
    Connections.replace(Connections.ConnectionInfo(
      "tx", format = "manifest", basePath = Some(base)))
    Connections.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "tx", "t",
      mode = "overwrite")
    Connections.write(Seq((3L, "c")).toDF("id", "v"), "tx", "t", mode = "append")
    assert(Connections.read(spark, "tx", "t").count() == 3)
    // versioned: the overwrite-only state is still reachable
    assert(graft.ops.Manifest.read(spark, s"$base/t", version = 1).count() == 2)
    intercept[IllegalArgumentException] {
      Connections.write(Seq((9L, "x")).toDF("id", "v"), "tx", "t", mode = "ignore")
    }
    Connections.dropTable(spark, "tx", "t")
    assert(!new java.io.File(s"$base/t").exists())
  }

  test("loadSchedules parses the reference schedule shape") {
    val p = write(
      """- { job: daily_load, schedule: daily, run_order: 1 }
        |- { job: mon_sync, schedule: monday, run_order: 2, enabled: false }
        |- { job: forced, schedule: daily, force_run: true }
        |""".stripMargin)
    val s = Config.loadSchedules(p)
    assert(s.map(_.jobName) == Seq("daily_load", "mon_sync", "forced"))
    assert(s(0).isEnabled && !s(1).isEnabled)
    assert(s(2).forceRun && s(2).runOrder == 3)
  }
}

class PersistenceSpec extends SparkSpec {

  test("StatusTracker parquet roundtrip (O10)") {
    val t = new graft.meta.StatusTracker
    val id = t.begin("job_a", java.time.Instant.parse("2026-01-01T00:00:00Z"))
    t.update(id, status = "ok", phase = "done",
      endTime = java.time.Instant.parse("2026-01-01T00:01:00Z"))
    val path = java.nio.file.Files.createTempDirectory("st").toString + "/status"
    t.save(spark, path)
    val t2 = new graft.meta.StatusTracker
    t2.load(spark, path)
    assert(t2.all == t.all)
    // next id continues after the loaded max
    assert(t2.begin("job_b", java.time.Instant.now()) == id + 1)
  }

  test("schedules parquet roundtrip (O10 bootstrap parity)") {
    import graft.meta.Status
    val rows = Seq(
      Status.Schedule(2, "late", Some("arg"), isEnabled = true, "daily",
        forceRun = false, 2),
      Status.Schedule(1, "early", None, isEnabled = false, "monday",
        forceRun = true, 1))
    val path = java.nio.file.Files.createTempDirectory("sch").toString + "/sched"
    Status.saveSchedules(spark, rows, path)
    assert(Status.loadSchedules(spark, path) == rows.sortBy(_.id))
    // the empty bootstrap (initialize with no -c config) roundtrips too
    val empty = java.nio.file.Files.createTempDirectory("sch0").toString + "/sched"
    Status.saveSchedules(spark, Nil, empty)
    assert(Status.loadSchedules(spark, empty).isEmpty)
  }

  test("clusterByKey produces key-partitioned sorted layout (S9)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong % 7, i.toLong)).toDF("k", "v")
    val out = Loading.clusterByKey(df, Seq("k"), 4)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.count() == 100)
  }

  test("insertRow appends one literal row (S10)") {
    import spark.implicits._
    val df  = Seq(("a", 1L)).toDF("s", "n")
    val out = Loading.insertRow(df, Seq("b", 2L))
    assert(out.count() == 2)
    assert(out.filter(col("s") === "b" && col("n") === 2L).count() == 1)
  }
}
