package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Change-data-capture by MD5 row fingerprint — the reference's flagship
  * dataflow (`create_record_md5_table` + `create_table_diff`,
  * `lib/etl/loading.rb:223-270`), parameterized by key (the reference
  * hardcoded the `ico` column — a known bug we do not copy, SURVEY.md §2.7).
  *
  * The reference materialized two fingerprint temp tables and ran two joins
  * (anti for new rows, inner+residual for changed). Here both arise from a
  * SINGLE left join on the key — one shuffle instead of two, and Catalyst
  * broadcasts the smaller fingerprint side automatically under AQE. At 100 TB
  * the fingerprint projection (key + 1 hash column) is what shuffles, not the
  * full rows — the same trick the reference's temp tables bought, without the
  * materialization.
  */
object Diff {

  /** Per-row MD5 fingerprint over `fields`, keyed by `keys` — reference
    * `create_record_md5_table` (`loading.rb:254-270`):
    * `MD5(CONCAT(COALESCE(f1,''), COALESCE(f2,''), …))`.
    *
    * Faithful wart kept for parity (SURVEY.md §7.4.2): adjacent-field
    * ambiguity (`("ab","")` and `("a","b")` collide). Fields are cast to
    * string; keep fields string/integer-typed if fingerprints must be
    * portable across engines (float formatting differs).
    */
  def recordFingerprint(df: DataFrame, keys: Seq[String], fields: Seq[String]): DataFrame = {
    val fp = md5(concat(fields.map(f => coalesce(col(f).cast(StringType), lit(""))): _*))
    df.select(keys.map(col) :+ fp.as("md5_sum"): _*)
  }

  /** Diff `t1` against `t2` by key: rows of `t1` absent from `t2` tagged
    * `'n'` (new), rows present in both with differing fingerprints tagged
    * `'c'` (changed) — reference `create_table_diff` (`loading.rb:223-252`),
    * J1 anti-join + J2 residual-join + UNION collapsed into one left join.
    *
    * Output: key columns + `diff: string('n'|'c')`.
    */
  def tableDiff(t1: DataFrame, t2: DataFrame, keys: Seq[String], fields: Seq[String]): DataFrame = {
    val a = recordFingerprint(t1, keys, fields)
    val b = recordFingerprint(t2, keys, fields).withColumnRenamed("md5_sum", "md5_sum_2")
    val tag = when(col("md5_sum_2").isNull, lit("n"))
      .when(col("md5_sum") =!= col("md5_sum_2"), lit("c"))
    a.join(b, keys, "left")
      .withColumn("diff", tag)
      .filter(col("diff").isNotNull)
      .select(keys.map(col) :+ col("diff"): _*)
  }

  /** Full CDC with payload: like [[tableDiff]] but carries `t1`'s row for
    * downstream upsert — the composition the reference ran as
    * fingerprint→diff→(caller reloads rows by key). Single pass here.
    */
  def tableDiffRows(t1: DataFrame, t2: DataFrame, keys: Seq[String], fields: Seq[String]): DataFrame = {
    val fp1 = md5(concat(fields.map(f => coalesce(col(f).cast(StringType), lit(""))): _*))
    val b   = recordFingerprint(t2, keys, fields).withColumnRenamed("md5_sum", "md5_sum_2")
    val tag = when(col("md5_sum_2").isNull, lit("n"))
      .when(col("md5_sum") =!= col("md5_sum_2"), lit("c"))
    t1.withColumn("md5_sum", fp1)
      .join(b, keys, "left")
      .withColumn("diff", tag)
      .filter(col("diff").isNotNull)
      .drop("md5_sum", "md5_sum_2")
  }
}
