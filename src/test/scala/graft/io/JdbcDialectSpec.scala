package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** Dialect coverage for the reference's three adapters
  * (`lib/etl/repository_manager.rb:32-71`: postgres / mysql / sqlite3).
  * No MySQL/Postgres driver jar exists in this zero-egress container, so
  * live round-trips for those two cannot run here; what CAN be pinned is
  * everything our layer controls: the URL in a [[Connections]] entry
  * selects Spark's per-engine dialect, which owns identifier quoting and
  * type mapping — asserted below for the exact URLs a user would
  * register. The live round-trip (reserved-word table, quoted mixed-case
  * columns, wide type mapping) runs against embedded Derby, the one real
  * dialect available.
  */
class JdbcDialectSpec extends SparkSpec {

  test("connection URLs select engine dialects: quoting differs per engine") {
    val my = JdbcDialects.get("jdbc:mysql://host:3306/warehouse")
    val pg = JdbcDialects.get("jdbc:postgresql://host:5432/warehouse")
    // MySQL backticks, Postgres double-quotes — a reserved-word table like
    // `order` survives CTAS on either engine only through its own dialect
    assert(my.quoteIdentifier("order") == "`order`")
    assert(pg.quoteIdentifier("order") == "\"order\"")
    assert(my.quoteIdentifier("Mixed") == "`Mixed`")
    assert(pg.quoteIdentifier("Mixed") == "\"Mixed\"")
  }

  test("connection URLs select engine dialects: type DDL differs per engine") {
    val my = JdbcDialects.get("jdbc:mysql://host:3306/warehouse")
    val pg = JdbcDialects.get("jdbc:postgresql://host:5432/warehouse")
    def ddl(d: org.apache.spark.sql.jdbc.JdbcDialect, t: DataType): Option[String] =
      d.getJDBCType(t).map(_.databaseTypeDefinition)
    // the engines genuinely disagree — writing a DataFrame through the
    // wrong dialect would emit DDL the other engine rejects
    assert(ddl(my, StringType).contains("LONGTEXT"))
    assert(ddl(pg, StringType).contains("TEXT"))
    assert(ddl(my, BooleanType).contains("BIT(1)"))
    assert(ddl(pg, BooleanType).contains("BOOLEAN"))
    assert(ddl(pg, DoubleType).contains("FLOAT8"))
    assert(ddl(my, TimestampType).contains("TIMESTAMP"))
  }

  test("live Derby: reserved-word table + mixed-case columns round-trip quoted") {
    Connections.clear()
    Connections.add(Connections.ConnectionInfo("dialects", "jdbc",
      options = Map("url" -> "jdbc:derby:memory:dialectdb;create=true",
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")))
    import spark.implicits._
    // "year" is reserved in Derby (and MySQL): the write path must quote
    // the table name through the dialect for CREATE/INSERT to parse
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "GroupName")
    Connections.write(df, "dialects", "\"year\"", mode = "overwrite")
    val back = Connections.read(spark, "dialects", "\"year\"")
    assert(back.count() == 2)
    assert(back.schema.fieldNames.contains("GroupName"))
    assert(back.orderBy("id").select(col("GroupName")).head().getString(0) == "a")
  }

  test("live Derby: wide type mapping round-trips exact values") {
    Connections.clear()
    Connections.add(Connections.ConnectionInfo("dialects", "jdbc",
      options = Map("url" -> "jdbc:derby:memory:dialectdb;create=true",
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")))
    import spark.implicits._
    val df = Seq(
      (1L, 42, 7.toShort, 2.5d, 1.25f, BigDecimal("12345.6789"),
        java.sql.Date.valueOf("2026-01-05"),
        java.sql.Timestamp.valueOf("2026-01-05 12:34:56.789"),
        true, "text")
    ).toDF("c_long", "c_int", "c_short", "c_double", "c_float", "c_dec",
      "c_date", "c_ts", "c_bool", "c_str")
      .withColumn("c_dec", col("c_dec").cast("decimal(18,4)"))
    Connections.write(df, "dialects", "typemap", mode = "overwrite")
    val r = Connections.read(spark, "dialects", "typemap").head()
    // exact VALUES must survive; physical widths may widen per dialect
    // (Derby reads SMALLINT back as INTEGER) — assert through Number
    assert(r.getAs[Number]("c_long").longValue == 1L)
    assert(r.getAs[Number]("c_int").intValue == 42)
    assert(r.getAs[Number]("c_short").intValue == 7)
    assert(r.getAs[Number]("c_double").doubleValue == 2.5d)
    assert(r.getAs[Number]("c_float").floatValue == 1.25f)
    assert(r.getAs[java.math.BigDecimal]("c_dec")
      .compareTo(new java.math.BigDecimal("12345.6789")) == 0)
    assert(r.getAs[java.sql.Date]("c_date").toString == "2026-01-05")
    assert(r.getAs[java.sql.Timestamp]("c_ts").toString == "2026-01-05 12:34:56.789")
    assert(r.getAs[Boolean]("c_bool"))
    assert(r.getAs[String]("c_str") == "text")
  }
}
