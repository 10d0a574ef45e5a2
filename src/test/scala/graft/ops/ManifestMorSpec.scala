package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-on-read deletes (deletion vectors): a delete that rewrites NO
  * data file, applied at read time by an anti-join on (file, row index).
  * Pins: reads through every API exclude deleted rows; data files are
  * byte-identical across the delete; counts stay exact from metadata;
  * rewrite paths (upsert, COW delete, purge, bin-packing) fold vectors
  * in rather than resurrect rows; CDC and incremental aggregates see
  * dv-only commits; surfaces that cannot apply vectors fail loudly.
  */
class ManifestMorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/ds"

  /** Three range-clustered single-file appends with stats on id. */
  private def fixture(): String = {
    val dir = tmp("mor")
    for (lo <- Seq(0L, 100L, 200L))
      Manifest.appendWithStats(spark.range(lo, lo + 100).toDF("id")
        .withColumn("v", col("id") * 10).coalesce(1), dir, Seq("id"))
    dir
  }

  test("deleteMergeOnRead rewrites no file; reads and counts exclude the rows") {
    val dir = fixture()
    val filesBefore = Manifest.tableInfo(spark, dir).entries.map(_._1)
    val dv = Manifest.deleteMergeOnRead(spark, dir,
      col("id") >= 150 && col("id") < 250)
    assert(dv == 4)
    // the data file set is IDENTICAL — nothing was rewritten
    assert(Manifest.tableInfo(spark, dir).entries.map(_._1) == filesBefore)
    val ids = Manifest.read(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ids.size == 200 && !ids.exists(i => i >= 150 && i < 250))
    // declarative scan and range read agree
    assert(Manifest.table(spark, dir).count() == 200)
    assert(Manifest.readRange(spark, dir, "id", 140, 260)
      .collect().map(_.getLong(0)).sorted.toSeq
      == ((140L to 149L) ++ (250L to 260L)))
    // metadata count subtracts the recorded per-file deleted counts
    assert(Manifest.countRows(spark, dir) == 200L)
    // time travel: the pre-delete version still has every row
    assert(Manifest.read(spark, dir, version = 3).count() == 300)
    assert(Manifest.countRows(spark, dir, version = 3) == 300L)
    // a second delete accumulates (supersedes the files' vectors)
    assert(Manifest.deleteMergeOnRead(spark, dir, col("id") < 10) == 5)
    assert(Manifest.read(spark, dir).count() == 190)
    assert(Manifest.countRows(spark, dir) == 190L)
    // deleting nothing (or already-deleted rows) is a version no-op
    assert(Manifest.deleteMergeOnRead(spark, dir, col("id") === 160) == 5)
  }

  test("purgeDeletes folds vectors file-scoped; clean files carry over") {
    val dir = fixture()
    Manifest.deleteMergeOnRead(spark, dir, col("id") >= 200 && col("id") < 220)
    val before = Manifest.tableInfo(spark, dir).entries.map(_._1)
    val pv = Manifest.purgeDeletes(spark, dir)
    assert(pv == 5)
    val after = Manifest.tableInfo(spark, dir).entries.map(_._1)
    // only the vectored third file was rewritten
    assert((before.toSet & after.toSet) == before.take(2).toSet)
    assert(!Manifest.hasDeletionVectors(spark, dir))
    assert(Manifest.read(spark, dir).count() == 280)
    // purged bounds are fresh: the rewritten tail still prunes
    assert(Manifest.readRange(spark, dir, "id", 250, 400).count() == 50)
    // purging a clean dataset is a no-op
    assert(Manifest.purgeDeletes(spark, dir) == pv)
  }

  test("rewrite paths fold vectors in instead of resurrecting rows") {
    val dir = fixture()
    Manifest.deleteMergeOnRead(spark, dir, col("id") % 10 === 0) // 30 rows
    assert(Manifest.read(spark, dir).count() == 270)
    // COW delete of a range: reads its rewrite set dv-aware
    Manifest.delete(spark, dir, col("id") >= 280)
    val ids = Manifest.read(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ids.size == 252 && !ids.contains(100L) && !ids.contains(285L))
    // bin-packing small files keeps dv semantics
    Manifest.compactSmallFiles(spark, dir, minFileBytes = 1L << 20)
    assert(Manifest.read(spark, dir).count() == 252)
    assert(!Manifest.hasDeletionVectors(spark, dir),
      "packing every vectored file folds its vector in")
    // full compaction on a fresh vectored dataset also purges
    val dir2 = fixture()
    Manifest.deleteMergeOnRead(spark, dir2, col("id") < 50)
    Manifest.compact(spark, dir2)
    assert(Manifest.read(spark, dir2).count() == 250)
    assert(!Manifest.hasDeletionVectors(spark, dir2))
  }

  test("upsert and merge over a vectored dataset stay dv-aware") {
    val dir = tmp("mor_up")
    val rows = (1L to 20L).map(i => (i, i * 10, if (i % 2 == 0) "x" else "y"))
    Manifest.upsert(rows.toDF("k", "v", "p"), dir, Seq("k"), "v",
      partitionCols = Seq("p"))
    Manifest.deleteMergeOnRead(spark, dir, col("k") <= 4)
    assert(Manifest.read(spark, dir).count() == 16)
    // partition-scoped upsert touching partition x must not resurrect k=2,4
    Manifest.upsert(Seq((6L, 999L, "x")).toDF("k", "v", "p"), dir,
      Seq("k"), "v", partitionCols = Seq("p"))
    val ks = Manifest.read(spark, dir).collect().map(_.getLong(0)).toSet
    assert(!ks.contains(2L) && !ks.contains(4L) && ks.contains(6L))
    assert(Manifest.read(spark, dir)
      .filter(col("k") === 6L).head.getLong(1) == 999L)
    // merge: update via a source that also matches a deleted key — the
    // deleted row must stay dead, not resurrect as an update
    Manifest.merge(spark, dir,
      Seq((3L, 111L), (7L, 777L)).toDF("k", "nv"), Seq("k"),
      Manifest.MergeSpec(matchedUpdate = Map("v" -> "s.nv"),
        notMatchedInsert = false))
    val after = Manifest.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!after.contains(3L) && after(7L) == 777L)
  }

  test("CDC sees dv-only commits; restore resurrects") {
    val dir = fixture() // v1..v3
    Manifest.deleteMergeOnRead(spark, dir, col("id") >= 50 && col("id") < 60) // v4
    val diff = Manifest.changes(spark, dir, 3, 4, Seq("id"), Seq("v"))
    assert(diff.filter(col("diff") === "d").collect().map(_.getLong(0)).sorted.toSeq
      == (50L until 60L))
    assert(diff.filter(col("diff") =!= "d").isEmpty)
    // restore resurrects: the reverse feed tags them as new
    Manifest.restore(spark, dir, 3) // v5
    val back = Manifest.changes(spark, dir, 4, 5, Seq("id"), Seq("v"))
    assert(back.filter(col("diff") === "n").collect().map(_.getLong(0)).sorted.toSeq
      == (50L until 60L))
    assert(back.filter(col("diff") =!= "n").isEmpty)
  }

  test("incremental aggregate folds dv deltas to the full-recompute state") {
    val dir = tmp("mor_src")
    val df = spark.range(0, 300).toDF("id")
      .withColumn("bucket", col("id") % 3)
      .withColumn("v", col("id") * 10)
    Manifest.append(df.coalesce(2), dir)                       // v1
    val aggPath = tmp("mor_agg")
    Manifest.maintainAggregate(spark, dir, aggPath,
      groupCols = Seq("bucket"), sumCols = Seq("v"))
    Manifest.deleteMergeOnRead(spark, dir, col("id") >= 200)   // v2: dv only
    Manifest.maintainAggregate(spark, dir, aggPath,
      groupCols = Seq("bucket"), sumCols = Seq("v"))
    val got = Manifest.read(spark, aggPath)
      .select(col("bucket"), col("n_rows"), col("sum_v").cast("double"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = spark.range(0, 200).toDF("id")
      .withColumn("bucket", col("id") % 3)
      .withColumn("v", col("id") * 10)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
  }

  test("SQL relation and streaming source refuse vectored datasets") {
    val dir = fixture()
    Manifest.deleteMergeOnRead(spark, dir, col("id") < 5)
    val e = intercept[IllegalStateException] {
      spark.read.format("graft-manifest").load(dir).count()
    }
    assert(e.getMessage.contains("deletion vectors"))
    // after purging, the SQL surface works again
    Manifest.purgeDeletes(spark, dir)
    assert(spark.read.format("graft-manifest").load(dir).count() == 295)
  }

  test("upsertMergeOnRead rewrites no file: matches vector out, batch appends") {
    // like fixture(), plus the ord column the MOR upsert's batch carries
    // (the batch stages as data files, so orderCol is a real table column)
    val dir = tmp("morup")
    for (lo <- Seq(0L, 100L, 200L))
      Manifest.appendWithStats(spark.range(lo, lo + 100).toDF("id")
        .withColumn("v", col("id") * 10).withColumn("ord", lit(0L))
        .coalesce(1), dir, Seq("id"))
    val filesBefore = Manifest.tableInfo(spark, dir).entries.map(_._1)
    // batch replaces 5 keys scattered across all 3 files, inserts 2 new,
    // and carries an in-batch duplicate (k=150 twice — larger ord wins)
    val batch = Seq(
      (10L, 1L, 1L), (150L, 2L, 1L), (150L, 3L, 2L), (250L, 4L, 1L),
      (0L, 5L, 1L), (299L, 6L, 1L), (1000L, 7L, 1L), (2000L, 8L, 1L))
      .toDF("id", "v", "ord")
    val v2 = Manifest.upsertMergeOnRead(batch, dir, Seq("id"), "ord")
    assert(v2 == 4)
    // every pre-existing data file carried over path-identical
    val filesAfter = Manifest.tableInfo(spark, dir).entries.map(_._1)
    assert(filesBefore.forall(filesAfter.contains))
    assert(filesAfter.size > filesBefore.size) // batch appended as new files
    val got = Manifest.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 302) // 300 - 6 replaced + 6 re-inserted + 2 new
    assert(got(10L) == 1L && got(150L) == 3L && got(250L) == 4L)
    assert(got(0L) == 5L && got(299L) == 6L)
    assert(got(1000L) == 7L && got(2000L) == 8L)
    assert(got(20L) == 200L) // untouched key unchanged
    // metadata count stays exact (dv counts subtract, new file rows add)
    assert(Manifest.countRows(spark, dir) == 302L)
    // a second MOR upsert over already-vectored keys stays exact
    Manifest.upsertMergeOnRead(Seq((10L, 99L, 9L)).toDF("id", "v", "ord"),
      dir, Seq("id"), "ord")
    val again = Manifest.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again(10L) == 99L && again.size == 302)
    assert(Manifest.countRows(spark, dir) == 302L)
    // time travel: pre-upsert version unchanged
    assert(Manifest.read(spark, dir, version = 3).count() == 300)
  }

  test("vacuum collects superseded dv sets, keeps live ones") {
    val dir = fixture()
    Manifest.deleteMergeOnRead(spark, dir, col("id") < 10)  // set A (v4)
    Manifest.deleteMergeOnRead(spark, dir, col("id") < 20)  // set B supersedes A on file 1 (v5)
    val root = new java.io.File(dir, "dv")
    assert(root.listFiles().length == 2)
    Manifest.vacuum(spark, dir, keepVersions = 1, graceMs = 0)
    // set A is unreferenced by the retained (latest) version
    assert(root.listFiles().length == 1)
    assert(Manifest.read(spark, dir).count() == 280)
  }
}
