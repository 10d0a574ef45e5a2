package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** String bounds (`#filestr`) and null counts (`#nulls`) as manifest
  * facts: a plain filter on a STRING column must prune files through the
  * declarative FileIndex (equality, ranges, IN, startsWith), IS [NOT]
  * NULL must prune on the recorded null counts, truncated bounds must
  * stay sound, and the metadata-only rule must answer `count(col)` and
  * exact string `min`/`max` without a scan. Comparisons are CODE POINT
  * order (what Spark's own min/max produce), pinned against Java's
  * UTF-16 order where the two disagree.
  */
class ManifestStringStatsSpec extends SparkSpec {
  import spark.implicits._

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

  /** Three single-file appends clustered by a string prefix. */
  private def prefixFixture(): String = {
    val dir = tmp("mstr")
    for (p <- Seq("apple", "mango", "zebra")) {
      val df = (0 until 50).map(i => (f"$p%s_$i%03d", i.toLong)).toDF("s", "n")
      Manifest.appendWithStats(df.coalesce(1), dir, Seq("s"))
    }
    dir
  }

  test("string equality, ranges, IN, and startsWith prune on #filestr bounds") {
    val dir = prefixFixture()
    def t = Manifest.table(spark, dir)
    assert(scannedFiles(t) == 3)
    // equality
    assert(t.filter(col("s") === "mango_007").count() == 1)
    assert(scannedFiles(t.filter(col("s") === "mango_007")) == 1)
    // range: everything ≥ "z" is the zebra file
    assert(t.filter(col("s") >= "z").count() == 50)
    assert(scannedFiles(t.filter(col("s") >= "z")) == 1)
    // range: strictly below "b" is the apple file
    assert(scannedFiles(t.filter(col("s") < "b")) == 1)
    // IN-list across two files
    assert(t.filter(col("s").isin("apple_001", "zebra_049")).count() == 2)
    assert(scannedFiles(t.filter(col("s").isin("apple_001", "zebra_049"))) == 2)
    // startsWith occupies [p, successor(p))
    assert(t.filter(col("s").startsWith("man")).count() == 50)
    assert(scannedFiles(t.filter(col("s").startsWith("man"))) == 1)
    // contradiction → zero files
    assert(t.filter(col("s") > "zz").isEmpty)
    assert(scannedFiles(t.filter(col("s") > "zz")) == 0)
  }

  test("SQL WHERE on a string column prunes through the format") {
    val dir = prefixFixture()
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mstr_sql " +
      s"USING `graft-manifest` OPTIONS (path '$dir')")
    val q = spark.sql("SELECT s FROM mstr_sql WHERE s LIKE 'zebra%'")
    assert(q.count() == 50)
    assert(scannedFiles(spark.sql(
      "SELECT s FROM mstr_sql WHERE s LIKE 'zebra%'")) == 1,
      "LIKE 'prefix%' must reach startsWith pruning")
  }

  test("bounds of long strings truncate soundly; metadata min/max declines them") {
    graft.plans.MetadataOnlyCount.install(spark)
    val dir = tmp("mstr_trunc")
    val long = "a" * 100 // beyond StrBoundCap
    Manifest.appendWithStats(Seq(long + "_x", long + "_y").toDF("s").coalesce(1),
      dir, Seq("s"))
    Manifest.appendWithStats(Seq("zz_1", "zz_2").toDF("s").coalesce(1),
      dir, Seq("s"))
    // the manifest records a truncated (inexact) bound for file 1
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest.v2")), "UTF-8")
    val strLines = text.linesIterator.filter(_.startsWith("#filestr ")).toSeq
    assert(strLines.size == 2)
    assert(strLines.exists(_.endsWith(" t")) && strLines.exists(_.endsWith(" e")))
    def t = Manifest.table(spark, dir)
    // pruning with truncated bounds is still sound AND still effective:
    // an equality on the long string reads only its file…
    assert(t.filter(col("s") === long + "_x").count() == 1)
    assert(scannedFiles(t.filter(col("s") === long + "_x")) == 1)
    // …and the other file's exact bounds prune the long-string file
    assert(scannedFiles(t.filter(col("s") >= "zz")) == 1)
    // min over an inexact bound must NOT answer from metadata
    val mm = t.agg(min(col("s")).as("lo"))
    assert(hasScan(mm) && mm.head.getString(0) == long + "_x")
  }

  test("IS NULL / IS NOT NULL prune on #nulls facts") {
    val dir = tmp("mstr_nulls")
    Manifest.appendWithStats(
      Seq(("p_1", 1L), ("p_2", 2L)).toDF("s", "n").coalesce(1), dir, Seq("s"))
    Manifest.appendWithStats(
      Seq((null: String, 3L), (null: String, 4L)).toDF("s", "n").coalesce(1),
      dir, Seq("s"))
    def t = Manifest.table(spark, dir)
    assert(scannedFiles(t) == 2)
    // the all-null file is the only IS NULL candidate
    assert(t.filter(col("s").isNull).count() == 2)
    assert(scannedFiles(t.filter(col("s").isNull)) == 1)
    // the zero-null file is the only IS NOT NULL candidate
    assert(t.filter(col("s").isNotNull).count() == 2)
    assert(scannedFiles(t.filter(col("s").isNotNull)) == 1)
  }

  test("metadata-only count(col) and exact string min/max skip the scan") {
    graft.plans.MetadataOnlyCount.install(spark)
    val dir = tmp("mstr_meta")
    Manifest.appendWithStats(
      Seq(("alpha", 1L), (null, 2L), ("beta", 3L)).toDF("s", "n").coalesce(1),
      dir, Seq("s"))
    Manifest.appendWithStats(
      Seq(("omega", 4L), (null, 5L)).toDF("s", "n").coalesce(1), dir, Seq("s"))
    val t = Manifest.table(spark, dir)
    val agg = t.agg(count(col("s")).as("n_s"), min(col("s")).as("lo"),
      max(col("s")).as("hi"), count(lit(1)).as("n"))
    assert(!hasScan(agg), "count(col)+string min/max should be metadata-only:\n"
      + agg.queryExecution.optimizedPlan)
    val r = agg.head
    assert(r.getLong(0) == 3L && r.getString(1) == "alpha"
      && r.getString(2) == "omega" && r.getLong(3) == 5L)
    // a column without recorded facts keeps its scan
    val noFacts = t.agg(count(col("n")).as("c"))
    assert(hasScan(noFacts) && noFacts.head.getLong(0) == 5L)
  }

  test("string facts survive delete carry-over and compaction rewrite") {
    val dir = prefixFixture()
    // delete from the mango file only: apple/zebra facts carry over
    Manifest.delete(spark, dir, col("s") === "mango_000")
    def t = Manifest.table(spark, dir)
    assert(scannedFiles(t.filter(col("s") >= "z")) == 1,
      "carried files keep their string bounds")
    assert(scannedFiles(t.filter(col("s").startsWith("mango"))) == 1,
      "the rewritten file gets fresh string bounds")
    // compaction re-clusters (range on the stats col) and recomputes
    // string facts; the small target keeps several output files
    Manifest.compact(spark, dir, targetFileBytes = 1024L)
    val after = Manifest.table(spark, dir)
    assert(after.count() == 149)
    val pruned = scannedFiles(Manifest.table(spark, dir).filter(col("s") < "b"))
    val total = Manifest.tableInfo(spark, dir).entries.size
    assert(pruned < total, s"post-compaction bounds must prune ($pruned/$total)")
  }

  test("code-point order pins pruning where UTF-16 order disagrees") {
    // U+E000 sorts BELOW U+10000 in code-point (and UTF-8 byte) order,
    // but Java's String.compareTo says the opposite
    val lowCp = "\uE000"
    val highCp = new String(Character.toChars(0x10000))
    assert(lowCp.compareTo(highCp) > 0, "precondition: UTF-16 disagrees")
    assert(Manifest.cpCompare(lowCp, highCp) < 0)
    assert(Manifest.cpCompare("abc", "abd") < 0)
    assert(Manifest.cpCompare("ab", "abc") < 0 && Manifest.cpCompare("ab", "ab") == 0)
    // successor: increments the last code point; skips the surrogate hole
    assert(Manifest.cpSuccessor("abc").contains("abd"))
    assert(Manifest.cpSuccessor("a\uD7FF").contains("a\uE000"))
    // end-to-end: files split across the disagreement point must prune
    // correctly under code-point comparisons
    val dir = tmp("mstr_cp")
    Manifest.appendWithStats(Seq(lowCp + "1", lowCp + "2").toDF("s").coalesce(1),
      dir, Seq("s"))
    Manifest.appendWithStats(Seq(highCp + "1", highCp + "2").toDF("s").coalesce(1),
      dir, Seq("s"))
    def t = Manifest.table(spark, dir)
    val q = t.filter(col("s") >= highCp)
    assert(q.count() == 2, "supplementary-prefix rows are ≥ the literal")
    assert(scannedFiles(t.filter(col("s") >= highCp)) == 1,
      "the U+E000 file must prune under code-point order")
  }
}
