package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The declarative manifest scan ([[Manifest.table]]): a plain `.filter`
  * must prune files through the custom FileIndex — stats-based skipping
  * and partition pruning with no explicit readRange/readPartitions call —
  * while returning exactly the rows a full read + filter would. Pruning
  * is observed through the scan's own `numFiles` metric, so these tests
  * pin the END-TO-END path (Catalyst pushdown → FileIndex.listFiles →
  * scheduled scan), not the pruning helper in isolation.
  */
class ManifestTableSpec extends SparkSpec {
  import spark.implicits._

  /** Total files the executed plan's parquet scans actually read. Pass a
    * FRESH Dataset: metrics reset on each new execution, but the scan's
    * file listing is cached per plan instance, so a re-collected Dataset
    * reports numFiles=0.
    */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case p if p.nodeName.startsWith("Scan") && p.metrics.contains("numFiles") => p
    }
    assert(scans.nonEmpty, "no file scan in plan:\n" + df.queryExecution.executedPlan)
    scans.map(_.metrics("numFiles").value).sum
  }

  private def hasScan(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case _ => false
    }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/ds"

  test("table() returns the same rows as read()") {
    val dir = tmp("mft_parity")
    Manifest.appendWithStats(spark.range(0, 100).toDF("id")
      .withColumn("v", col("id") * 2).coalesce(1), dir, Seq("id"))
    Manifest.appendWithStats(spark.range(100, 200).toDF("id")
      .withColumn("v", col("id") * 2).coalesce(1), dir, Seq("id"))
    val viaRead = Manifest.read(spark, dir).orderBy("id").collect().toSeq
    val viaTable = Manifest.table(spark, dir).orderBy("id").collect().toSeq
    assert(viaTable == viaRead && viaTable.size == 200)
  }

  test("a plain filter prunes files via recorded bounds") {
    val dir = tmp("mft_stats")
    for (lo <- Seq(0L, 100L, 200L)) {
      Manifest.appendWithStats(
        spark.range(lo, lo + 100).toDF("id").coalesce(1), dir, Seq("id"))
    }
    def t = Manifest.table(spark, dir)
    assert(scannedFiles(t) == 3, "unfiltered scan must read every file")
    assert(t.filter(col("id") >= 250).collect().map(_.getLong(0)).sorted.toSeq
      == (250L until 300L))
    assert(scannedFiles(t.filter(col("id") >= 250)) == 1,
      "range predicate must skip 2 of 3 files")
    // disjunctions prune per-branch, conservatively unioned
    val twoSided = t.filter(col("id") < 50 || col("id") >= 250)
    assert(twoSided.count() == 100)
    assert(scannedFiles(t.filter(col("id") < 50 || col("id") >= 250)) == 2)
    // a contradiction prunes everything — zero tasks, zero files
    assert(t.filter(col("id") > 1000).collect().isEmpty)
    assert(scannedFiles(t.filter(col("id") > 1000)) == 0)
  }

  test("equality on a partition column prunes to its partition's files") {
    val dir = tmp("mft_part")
    val df = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30),
      (4L, "a", 40), (5L, "b", 50)).toDF("id", "p", "x")
    Manifest.upsert(df, dir, keys = Seq("id"), orderCol = "x",
      partitionCols = Seq("p"))
    def t = Manifest.table(spark, dir)
    val total = scannedFiles(t)
    assert(t.filter(col("p") === "b").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(2L, 5L))
    assert(scannedFiles(t.filter(col("p") === "b")) < total,
      "partition equality must prune files")
    // IN-lists prune to the union of named partitions
    assert(t.filter(col("p").isin("a", "c")).count() == 3)
    assert(scannedFiles(t.filter(col("p").isin("a", "c"))) < total)
  }

  test("schema evolution: table() serves the merged schema") {
    val dir = tmp("mft_evolve")
    Manifest.append(Seq((1L, "x")).toDF("id", "v"), dir)
    Manifest.append(Seq((2L, "y", 9.5)).toDF("id", "v", "score"), dir)
    val t = Manifest.table(spark, dir)
    assert(t.schema.fieldNames.toSet == Set("id", "v", "score"))
    val rows = t.orderBy("id").collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 9.5)
  }

  test("graft-manifest is a registered data source format with time travel") {
    val dir = tmp("mft_fmt")
    Manifest.overwrite(spark.range(0, 10).toDF("id"), dir)   // v1
    Manifest.append(spark.range(10, 30).toDF("id"), dir)     // v2
    // reader API, latest version
    assert(spark.read.format("graft-manifest").load(dir).count() == 30)
    // time travel through an option
    assert(spark.read.format("graft-manifest")
      .option("version", 1).load(dir).count() == 10)
  }

  test("SQL over a USING graft-manifest view prunes via the manifest") {
    val dir = tmp("mft_sql")
    for (lo <- Seq(0L, 100L, 200L))
      Manifest.appendWithStats(
        spark.range(lo, lo + 100).toDF("id").coalesce(1), dir, Seq("id"))
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW mft_sql USING `graft-manifest` OPTIONS (path '$dir')")
    val q = spark.sql("SELECT count(*) AS n FROM mft_sql WHERE id >= 250")
    assert(q.collect().head.getLong(0) == 50)
    assert(scannedFiles(
      spark.sql("SELECT id FROM mft_sql WHERE id >= 250")) == 1,
      "SQL WHERE must reach the manifest's file skipping")
  }

  test("writer API: save modes map onto manifest commits") {
    val dir = tmp("mft_write")
    spark.range(0, 10).toDF("id").write.format("graft-manifest")
      .option("stats.cols", "id").save(dir)                    // v1 (append)
    spark.range(10, 20).toDF("id").write.format("graft-manifest")
      .mode("append").option("stats.cols", "id").save(dir)     // v2
    assert(Manifest.read(spark, dir).count() == 20)
    intercept[IllegalStateException] {
      spark.range(0, 5).toDF("id").write.format("graft-manifest")
        .mode("errorifexists").save(dir)
    }
    spark.range(0, 5).toDF("id").write.format("graft-manifest")
      .mode("ignore").save(dir)                                // no-op
    assert(Manifest.read(spark, dir).count() == 20)
    spark.range(0, 7).toDF("id").write.format("graft-manifest")
      .mode("overwrite").option("stats.cols", "id").save(dir)  // v3
    assert(Manifest.read(spark, dir).count() == 7)
    assert(Manifest.read(spark, dir, version = 2).count() == 20) // time travel intact
    // stats survived the overwrite: a filter prunes on them
    assert(Manifest.committedProps(spark, dir).get("stats.cols").contains("id"))
  }

  test("delete rewrites only the files that contain matching rows") {
    val dir = tmp("mft_delete")
    for (lo <- Seq(0L, 100L, 200L))
      Manifest.appendWithStats(
        spark.range(lo, lo + 100).toDF("id").coalesce(1), dir, Seq("id"))
    val before = Manifest.tableInfo(spark, dir).entries.map(_._1).toSet
    val v = Manifest.delete(spark, dir, col("id") >= 250 && col("id") < 260)
    assert(v == 4)
    val after = Manifest.tableInfo(spark, dir).entries.map(_._1).toSet
    // the two files whose ranges can't match carry over path-identical
    assert((before & after).size == 2,
      s"untouched files must carry over: before=$before after=$after")
    val ids = Manifest.read(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ids.size == 290 && !ids.exists(i => i >= 250 && i < 260))
    // time travel: the pre-delete version still has every row
    assert(Manifest.read(spark, dir, version = 3).count() == 300)
    // rewritten file got fresh bounds: a filter on the surviving tail of
    // the touched range still prunes to one file
    assert(scannedFiles(Manifest.table(spark, dir).filter(col("id") >= 280)) == 1)
    // deleting nothing is a no-op, not an empty commit
    assert(Manifest.delete(spark, dir, col("id") < 0) == 4)
  }

  test("date-clustered appends prune on date and timestamp predicates") {
    val dir = tmp("mft_dates")
    // three monthly batches — the classic time-series append layout
    for (m <- 1 to 3) {
      val df = spark.range(0, 50).toDF("i")
        .withColumn("d", expr(s"date_add(date'2024-0$m-01', cast(i as int) % 28)"))
        .withColumn("ts", col("d").cast("timestamp"))
        .coalesce(1)
      Manifest.appendWithStats(df, dir, Seq("d", "ts"))
    }
    def t = Manifest.table(spark, dir)
    assert(scannedFiles(t) == 3)
    val feb = t.filter(col("d") >= lit(java.sql.Date.valueOf("2024-02-01")) &&
      col("d") < lit(java.sql.Date.valueOf("2024-03-01")))
    assert(feb.count() == 50)
    assert(scannedFiles(t.filter(
      col("d") >= lit(java.sql.Date.valueOf("2024-02-01")) &&
        col("d") < lit(java.sql.Date.valueOf("2024-03-01")))) == 1,
      "a date range must prune to the matching month's file")
    // timestamp predicates prune through the fractional-seconds encoding
    assert(scannedFiles(t.filter(
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))) == 1)
    // readRange accepts the same encodings (epoch days for dates)
    val march = Manifest.readRange(spark, dir, "d",
      java.time.LocalDate.parse("2024-03-01").toEpochDay.toDouble,
      java.time.LocalDate.parse("2024-12-31").toEpochDay.toDouble)
    assert(march.count() == 50)
  }

  test("changes() reads only churned files and emits n/c/d rows") {
    val dir = tmp("mft_changes")
    for (lo <- Seq(0L, 100L, 200L))
      Manifest.appendWithStats(spark.range(lo, lo + 100).toDF("id")
        .withColumn("v", col("id") * 10).coalesce(1), dir, Seq("id"))   // v1..v3
    // delete a slice (rewrites only file 3) …
    Manifest.delete(spark, dir, col("id") >= 250 && col("id") < 260)    // v4
    val del = Manifest.changes(spark, dir, 3, 4, Seq("id"), Seq("v"))
    assert(del.filter(col("diff") === "d").collect().map(_.getLong(0)).sorted.toSeq
      == (250L until 260L))
    assert(del.filter(col("diff") =!= "d").isEmpty)
    // … then append fresh keys
    Manifest.append(spark.range(300, 310).toDF("id")
      .withColumn("v", col("id") * 10), dir)                            // v5
    val add = Manifest.changes(spark, dir, 4, 5, Seq("id"), Seq("v"))
    assert(add.filter(col("diff") === "n").count() == 10
      && add.filter(col("diff") =!= "n").isEmpty)
    // across the whole lineage: deletes and adds both visible
    val span = Manifest.changes(spark, dir, 3, 5, Seq("id"), Seq("v"))
    assert(span.filter(col("diff") === "d").count() == 10
      && span.filter(col("diff") === "n").count() == 10)
    // identical versions → empty feed
    assert(Manifest.changes(spark, dir, 5, 5, Seq("id"), Seq("v")).isEmpty)
  }

  test("analyze backfills facts without rewriting data; incremental re-run") {
    graft.plans.MetadataOnlyCount.install(spark)
    val dir = tmp("mft_analyze")
    // plain appends: no facts beyond #rows/#size
    for (lo <- Seq(0L, 100L, 200L))
      Manifest.append(spark.range(lo, lo + 100).toDF("id")
        .withColumn("s", concat(lit("k"), lpad(col("id").cast("string"), 4, "0")))
        .coalesce(1), dir)
    def t = Manifest.table(spark, dir)
    assert(scannedFiles(t.filter(col("id") >= 250)) == 3, "no facts yet → no pruning")
    val before = Manifest.tableInfo(spark, dir).entries.map(_._1)
    val av = Manifest.analyze(spark, dir, Seq("id", "s"))
    assert(av == 4)
    // same data files, new facts
    assert(Manifest.tableInfo(spark, dir).entries.map(_._1) == before)
    assert(scannedFiles(t.filter(col("id") >= 250)) == 1)
    assert(scannedFiles(t.filter(col("s") >= "k0250")) == 1)
    // metadata-only aggregates now answerable
    val agg = t.agg(count(col("s")).as("n"), min(col("s")).as("lo"),
      max(col("id")).as("hi"))
    assert(!hasScan(agg))
    val r = agg.head
    assert(r.getLong(0) == 300L && r.getString(1) == "k0000" && r.getLong(2) == 299L)
    // nothing missing → no-op; a new append is analyzed incrementally
    assert(Manifest.analyze(spark, dir, Seq("id", "s")) == 4)
    Manifest.append(spark.range(300, 400).toDF("id")
      .withColumn("s", concat(lit("k"), lpad(col("id").cast("string"), 4, "0")))
      .coalesce(1), dir)
    assert(Manifest.analyze(spark, dir, Seq("id", "s")) == 6)
    assert(scannedFiles(Manifest.table(spark, dir).filter(col("id") >= 350)) == 1)
  }

  test("commits record per-file sizes; planning needs no filesystem listing") {
    val dir = tmp("mft_sizes")
    Manifest.append(spark.range(0, 10).toDF("id").coalesce(1), dir)
    Manifest.append(spark.range(10, 20).toDF("id").coalesce(1), dir)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest.v2")), "UTF-8")
    val sizeLines = text.linesIterator.filter(_.startsWith("#size ")).toSeq
    assert(sizeLines.size == 2, s"expected a #size line per file:\n$text")
    // recorded sizes match the real files (so FileStatus synthesis is
    // faithful and split planning sees true lengths)
    sizeLines.foreach { l =>
      val Array(rel, len) = l.stripPrefix("#size ").split(' ')
      val real = new java.io.File(dir,
        java.net.URLDecoder.decode(rel, "UTF-8")).length()
      assert(len.toLong == real)
    }
  }
}
