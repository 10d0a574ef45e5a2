package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.ValueSpec._

class ValuesSpec extends SparkSpec {
  import spark.implicits._

  test("ValueSpec kinds lower to the reference's sql_value semantics") {
    val df = Seq((1, "x")).toDF("a", "b").select(
      ValueSpec.toColumn(col_("a")).as("c_col"),
      ValueSpec.toColumn(Str("lit")).as("c_str"),
      ValueSpec.toColumn(Num(7)).as("c_num"),
      ValueSpec.toColumn(Sql("a + 1")).as("c_sql"),
      ValueSpec.toColumn(DateLit("15.3.2026")).as("c_date"),
      ValueSpec.toColumn(Null()).as("c_null"))
    val r = df.head()
    assert(r.getInt(0) == 1)
    assert(r.getString(1) == "lit")
    assert(r.getLong(2) == 7L)
    assert(r.getInt(3) == 2)
    assert(r.getDate(4).toString == "2026-03-15")
    assert(r.isNullAt(5))
  }

  test("date format translates MySQL %d.%m.%Y dialect") {
    val d = Seq(1).toDF("x").select(ValueSpec.toColumn(DateLit("1.12.2025")).as("d")).head().getDate(0)
    assert(d.toString == "2025-12-01")
  }
}

class LoadingSpec extends SparkSpec {
  import spark.implicits._

  private def staging = Seq(
    (1L, "a", 10.0, "sys1"),
    (2L, "b", 20.0, "sys2"),
    (3L, "c", 30.0, "sys3")
  ).toDF("id", "name", "amount", "etl_loaded_date")

  test("identityMapping excludes staging system columns (job_manager.rb:46)") {
    val m = Loading.identityMapping(staging)
    assert(m.map(_._1) == Seq("name", "amount"))
  }

  test("appendProjection maps, filters, stamps record_status (loading.rb:75-99)") {
    val out = Loading.appendProjection(
      staging,
      Seq("label" -> ColRef("name"), "double_amount" -> Sql("amount * 2")),
      condition = Some("amount >= 20.0"))
    assert(out.columns.toSeq == Seq("label", "double_amount", "record_status"))
    val rows = out.orderBy("label").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("b", "c"))
    assert(rows.forall(_.getString(2) == "loaded"))
  }

  test("updateWithMap merges matched rows only, stamps record_status (loading.rb:160-196)") {
    val ds = Seq((1L, 100.0, "new"), (2L, 200.0, "new"), (9L, 900.0, "new"))
      .toDF("k", "price", "record_status")
    val sta = Seq((1L, 11.0, 5), (2L, 22.0, 0)).toDF("k", "new_price", "qty")
    val out = Loading.updateWithMap(ds, sta,
      mapping = Seq("price" -> qcol("sta", "new_price")),
      keys = Seq("k"),
      condition = Some("sta.qty > 1")).orderBy("k").collect()
    // k=1 matched+condition → updated; k=2 matched but condition false; k=9 unmatched
    assert(out.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ==
      Seq((1L, 11.0, "loaded"), (2L, 200.0, "new"), (9L, 900.0, "new")))
  }

  test("dedupByKey pins deterministic survivor") {
    val df  = Seq((1L, "b"), (1L, "a"), (2L, "z")).toDF("k", "v")
    val out = Loading.dedupByKey(df, Seq("k"), Seq(col("v"))).orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "z")))
  }

  test("finalizeDataset transitions loaded→new with audit stamps (loading.rb:203-221)") {
    val ds  = Seq((1L, "loaded"), (2L, "pending")).toDF("k", "record_status")
    val now = expr("timestamp'2026-01-15 12:00:00'")
    val out = Loading.finalizeDataset(ds, batchId = 7L, now = now).orderBy("k").collect()
    val r1  = out(0)
    assert(r1.getAs[String]("record_status") == "new")
    assert(r1.getAs[String]("created_by") == "system_loading")
    assert(r1.getAs[String]("quality_status") == "ok")
    assert(r1.getAs[Long]("batch_id") == 7L)
    assert(r1.getAs[Boolean]("is_hidden"))
    val r2 = out(1)
    assert(r2.getAs[String]("record_status") == "pending")
    assert(r2.isNullAt(r2.fieldIndex("created_by")))
  }

  test("F2 incremental filter becomes partition pruning on partitioned staging") {
    // docs/SCALE.md claims the watermark condition prunes at the directory
    // level on date-partitioned storage — assert it executable: the filter
    // must land in PartitionFilters (directories skipped), not Filter
    // (rows read then discarded). At 100 TB that is the whole ballgame.
    val dir = java.nio.file.Files.createTempDirectory("staging_part").toString + "/staging"
    Seq((1L, "2026-01-01"), (2L, "2026-01-15"), (3L, "2026-02-01"))
      .toDF("id", "date_created")
      .write.partitionBy("date_created").parquet(dir)
    val inc = Loading.incrementalFilter(
      spark.read.parquet(dir), "date_created", lit("2026-01-10"))
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("date_created"),
      s"watermark filter not pushed to partition pruning:\n$plan")
    assert(inc.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("setLoadedFlag stamps etl_loaded_date (loading.rb:198-201)") {
    val out = Loading.setLoadedFlag(staging, expr("timestamp'2026-01-01 00:00:00'"))
    assert(out.select("etl_loaded_date").head().getTimestamp(0) == sqlTs("2026-01-01 00:00:00"))
  }
}

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def t(rows: (Long, String, String)*) =
    rows.toSeq.toDF("k", "f1", "f2")

  test("tableDiff of identical tables is empty") {
    val a = t((1L, "x", "y"), (2L, "p", "q"))
    assert(Diff.tableDiff(a, a, Seq("k"), Seq("f1", "f2")).count() == 0)
  }

  test("tableDiff of disjoint keysets is all 'n'") {
    val a = t((1L, "x", "y")); val b = t((2L, "x", "y"))
    val d = Diff.tableDiff(a, b, Seq("k"), Seq("f1", "f2")).collect()
    assert(d.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "n")))
  }

  test("tableDiff tags changed rows 'c' (loading.rb:243-250)") {
    val a = t((1L, "x", "y"), (2L, "p", "q"))
    val b = t((1L, "x", "y"), (2L, "p", "CHANGED"))
    val d = Diff.tableDiff(a, b, Seq("k"), Seq("f1", "f2")).collect()
    assert(d.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "c")))
  }

  test("fingerprint keeps reference concat ambiguity (SURVEY.md §7.4.2)") {
    val a = Seq((1L, "ab", ""), (2L, "a", "b")).toDF("k", "f1", "f2")
    val fps = Diff.recordFingerprint(a, Seq("k"), Seq("f1", "f2"))
      .select("md5_sum").collect().map(_.getString(0))
    assert(fps(0) == fps(1)) // documented wart, kept for reference parity
  }

  test("null fields coalesce to empty string (loading.rb:258)") {
    val withNull = Seq((1L, null.asInstanceOf[String], "y")).toDF("k", "f1", "f2")
    val noNull   = Seq((1L, "", "y")).toDF("k", "f1", "f2")
    val f1 = Diff.recordFingerprint(withNull, Seq("k"), Seq("f1", "f2")).head().getString(1)
    val f2 = Diff.recordFingerprint(noNull, Seq("k"), Seq("f1", "f2")).head().getString(1)
    assert(f1 == f2)
  }

  test("tableDiffRows carries payload for upsert") {
    val a = t((1L, "x", "y"), (2L, "p", "q"))
    val b = t((2L, "p", "DIFFERENT"))
    val d = Diff.tableDiffRows(a, b, Seq("k"), Seq("f1", "f2")).orderBy("k").collect()
    assert(d.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((1L, "x", "y", "n"), (2L, "p", "q", "c")))
  }
}
