package graft.io

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Named connection registry — the reference's YAML connection search path
  * → `Sequel.connect` (`lib/etl/repository_manager.rb:32-71`,
  * `test/repositories/connections*.yml`), re-expressed as name →
  * `DataFrameReader` configuration. Adapters the reference saw (postgres,
  * sqlite3, mysql) map to Spark's `jdbc` format; file-backed tables map to
  * parquet/csv/json directories.
  */
object Connections {

  /** A named connection: Spark data source format + options + base path. */
  final case class ConnectionInfo(
      name: String,
      format: String,                  // "parquet" | "csv" | "json" | "jdbc" | ...
      options: Map[String, String] = Map.empty,
      basePath: Option[String] = None)

  private val registry = TrieMap.empty[String, ConnectionInfo]

  /** First-registration-wins across search path order, like the reference's
    * first-match-on-search-path (`repository_manager.rb:47-66`).
    */
  def add(info: ConnectionInfo): Unit = registry.putIfAbsent(info.name, info)

  def replace(info: ConnectionInfo): Unit = registry.put(info.name, info)
  def get(name: String): Option[ConnectionInfo] = registry.get(name)
  def names: Seq[String] = registry.keys.toSeq.sorted
  def clear(): Unit = registry.clear()

  /** S1: read `table` through a named connection. */
  def read(spark: SparkSession, connection: String, table: String): DataFrame = {
    val c = registry.getOrElse(connection,
      throw new IllegalArgumentException(s"unknown connection: $connection"))
    c.format match {
      case "jdbc" =>
        spark.read.format("jdbc").options(c.options).option("dbtable", table).load()
      case "manifest" =>
        // the FileIndex-backed form: filters on the returned frame prune
        // files through the manifest's bounds/partition dirs
        graft.ops.Manifest.table(spark, manifestPath(c, table))
      case fmt =>
        val path = c.basePath.map(b => s"$b/$table.$fmt").getOrElse(table)
        spark.read.format(fmt).options(c.options).load(path)
    }
  }

  private def manifestPath(c: ConnectionInfo, table: String): String =
    c.basePath.map(b => s"$b/$table").getOrElse(table)

  /** S6/S7 sinks: append (reference `INSERT INTO … SELECT`) or overwrite
    * (reference CTAS). Partitioning columns let 100 TB sinks prune on read.
    */
  def write(df: DataFrame, connection: String, table: String,
            mode: String = "append", partitionBy: Seq[String] = Nil): Unit = {
    val c = Connections.registry.getOrElse(connection,
      throw new IllegalArgumentException(s"unknown connection: $connection"))
    c.format match {
      case "manifest" =>
        // transactional publish: a failed write leaves only invisible
        // staged files and the previous version intact — the gate-then-
        // publish contract QueryJob wants, with no half-written target
        val path = manifestPath(c, table)
        mode match {
          case "append" => graft.ops.Manifest.append(df, path): Unit
          case "overwrite" => graft.ops.Manifest.overwrite(df, path): Unit
          case other => throw new IllegalArgumentException(
            s"manifest connections support append/overwrite, not $other")
        }
      case fmt =>
        val w0: DataFrameWriter[Row] = df.write.mode(mode).options(c.options)
        val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
        fmt match {
          case "jdbc" => w.format("jdbc").option("dbtable", table).save()
          case _ =>
            val path = c.basePath.map(b => s"$b/$table.$fmt").getOrElse(table)
            w.format(fmt).save(path)
        }
    }
  }

  /** S8: drop table — reference `drop_staging_table` (`loading.rb:272-274`).
    * For file connections, deletes the directory.
    */
  def dropTable(spark: SparkSession, connection: String, table: String): Unit =
    registry.get(connection).foreach { c =>
      c.basePath.foreach { b =>
        val target =
          if (c.format == "manifest") s"$b/$table" else s"$b/$table.${c.format}"
        val p = new org.apache.hadoop.fs.Path(target)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
      }
    }
}
