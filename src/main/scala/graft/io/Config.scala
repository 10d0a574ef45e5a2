package graft.io

import scala.jdk.CollectionConverters._
import graft.meta.Status.Schedule

/** YAML configuration source — the reference's config surface
  * (`bin/etl:69` config.yml, `repository_manager.rb:19-22,47-50`
  * connections files, `job_bundle.rb:88-94` info.yml). Parsed with
  * snakeyaml (ships with Spark). Framework metadata only — never data
  * plane.
  *
  * Connection file shape (mirrors `test/repositories/connections1.yml`,
  * adapters → Spark formats):
  * {{{
  * staging:
  *   format: parquet
  *   path: /data/staging
  * warehouse:
  *   format: jdbc
  *   options: { url: "jdbc:postgresql://...", dbtable_prefix: ds }
  * }}}
  */
object Config {

  private def loadYaml(path: String): Map[String, Any] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val in   = new java.io.FileInputStream(path)
    try {
      val m = yaml.load[java.util.Map[String, Any]](in)
      if (m == null) Map.empty else m.asScala.toMap
    } finally in.close()
  }

  private def asStrMap(v: Any): Map[String, String] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> String.valueOf(x) }.toMap
    case _ => Map.empty
  }

  /** Load named connections from a YAML file into [[Connections]]
    * (first-registration-wins across a search path, like the reference).
    * Returns the connection names loaded.
    */
  def loadConnections(path: String): Seq[String] = {
    val root = loadYaml(path)
    root.toSeq.sortBy(_._1).map { case (name, spec) =>
      val m = asStrMap(spec)
      val options = spec match {
        case jm: java.util.Map[_, _] =>
          jm.asScala.collectFirst { case (k, v) if k.toString == "options" => asStrMap(v) }
            .getOrElse(Map.empty[String, String])
        case _ => Map.empty[String, String]
      }
      Connections.add(Connections.ConnectionInfo(
        name, m.getOrElse("format", "parquet"), options, m.get("path")))
      name
    }
  }

  /** Search-path variant — first file to define a name wins
    * (`repository_manager.rb:47-66`).
    */
  def loadConnectionSearchPath(paths: Seq[String]): Seq[String] =
    paths.filter(p => new java.io.File(p).exists()).flatMap(loadConnections)

  /** Load a top-level app config — the reference's `config.yml`
    * (`bin/etl:34-58,69`): connection file search path + schedules file.
    * Relative paths resolve against the config file's directory. Returns
    * the parsed schedules (empty when the key is absent); connections are
    * registered into [[Connections]] as a side effect.
    *
    * The reference WROTE `repository_search_path` in its sample config but
    * READ `connection_search_path` (`bin/etl:44` vs
    * `repository_manager.rb:19-22` — a real key-mismatch bug, SURVEY.md
    * §7.4.5). Resolved deliberately here: BOTH keys are accepted,
    * `connection_search_path` first.
    */
  def loadAppConfig(path: String): Seq[Schedule] = {
    val root = loadYaml(path)
    val dir  = new java.io.File(path).getAbsoluteFile.getParent
    def resolve(p: String): String =
      if (new java.io.File(p).isAbsolute) p else s"$dir/$p"
    val searchPath = Seq("connection_search_path", "repository_search_path")
      .flatMap(root.get)
      .flatMap {
        case l: java.util.List[_] => l.asScala.toSeq.map(String.valueOf(_))
        case v                    => Seq(String.valueOf(v))
      }
    loadConnectionSearchPath(searchPath.map(resolve))
    root.get("schedules")
      .map(v => loadSchedules(resolve(String.valueOf(v))))
      .getOrElse(Nil)
  }

  /** Load schedules from YAML:
    * {{{
    * - { job: daily_load, schedule: daily, run_order: 1 }
    * - { job: weekly_sync, schedule: monday, enabled: false }
    * }}}
    */
  def loadSchedules(path: String): Seq[Schedule] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val in   = new java.io.FileInputStream(path)
    try {
      val list = yaml.load[java.util.List[java.util.Map[String, Any]]](in)
      if (list == null) Nil
      else list.asScala.toSeq.zipWithIndex.map { case (m0, i) =>
        val m = m0.asScala
        Schedule(
          id        = i + 1L,
          jobName   = String.valueOf(m.getOrElse("job", "")),
          argument  = m.get("argument").map(String.valueOf(_)),
          isEnabled = m.get("enabled").forall(v => v == true || v == "true"),
          schedule  = String.valueOf(m.getOrElse("schedule", "daily")),
          forceRun  = m.get("force_run").exists(v => v == true || v == "true"),
          runOrder  = m.get("run_order").map(String.valueOf(_).toInt).getOrElse(i + 1))
      }
    } finally in.close()
  }
}
