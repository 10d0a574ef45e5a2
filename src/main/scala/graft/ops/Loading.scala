package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference `Loading` job's relational core (`lib/etl/loading.rb`),
  * re-expressed as pure DataFrame → DataFrame transformations. Where the
  * reference generated MySQL statements (`INSERT INTO … SELECT`,
  * `UPDATE … JOIN`) and let the RDBMS execute them, these build a Catalyst
  * plan and let Spark execute it — filters/projections push down to the
  * parquet scan, the update-join becomes a single shuffled (or broadcast)
  * left join.
  *
  * Mutation semantics on immutable data: every "UPDATE" returns the full
  * updated relation; callers overwrite the sink (see [[graft.io.Connections]]).
  */
object Loading {

  /** Staging system columns excluded from identity mappings — reference
    * `lib/etl/job_manager.rb:46` (`@@staging_system_columns`).
    */
  val StagingSystemColumns: Set[String] = Set("id", "date_created", "etl_loaded_date")

  /** Dataset audit columns the framework maintains — reference
    * `lib/etl/loading.rb:208-219`.
    */
  val AuditColumns: Seq[(String, DataType)] = Seq(
    "record_status"  -> StringType,
    "created_at"     -> TimestampType,
    "created_by"     -> StringType,
    "quality_status" -> StringType,
    "batch_id"       -> LongType,
    "validity_date"  -> DateType,
    "is_hidden"      -> BooleanType
  )

  /** Column→column mapping from introspection, minus system columns —
    * reference `create_identity_mapping`, `loading.rb:52-62`. The reference
    * introspected `information_schema`; here the DataFrame schema is
    * self-describing.
    */
  def identityMapping(df: DataFrame): Seq[(String, ValueSpec)] =
    df.columns.toIndexedSeq
      .filterNot(StagingSystemColumns.contains)
      .map(c => c -> ValueSpec.ColRef(c))

  /** Mapped projection + constant `record_status='loaded'` + optional WHERE —
    * the SELECT half of the reference's `append_table_with_map`
    * (`loading.rb:134-158`, SQL built at `loading.rb:75-99`). Appending is the
    * caller's write-mode choice; the dataflow is this projection.
    */
  def appendProjection(
      src: DataFrame,
      mapping: Seq[(String, ValueSpec)],
      condition: Option[String] = None,
      withRecordStatus: Boolean = true
  ): DataFrame = {
    val filtered = condition.fold(src)(c => src.filter(expr(c)))
    val cols = mapping.map { case (f, v) => ValueSpec.toColumn(v).as(f) } ++
      (if (withRecordStatus) Seq(lit("loaded").as("record_status")) else Nil)
    filtered.select(cols: _*)
  }

  /** Deterministic key-dedup for staging inputs: MySQL's multi-match
    * `UPDATE … JOIN` picks an arbitrary staging row per key; we pin
    * last-writer-by-ordering instead (SURVEY.md §7.4.1). `orderBy` columns
    * break ties; rows ranked 1 per key survive.
    */
  def dedupByKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val tie = if (orderBy.nonEmpty) orderBy else df.columns.filterNot(keys.contains).toIndexedSeq.map(col)
    val w   = Window.partitionBy(keys.map(col): _*).orderBy(tie: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** The reference's keyed `UPDATE dataset, staging SET ds.f = expr(sta.…)
    * WHERE ds.key = sta.key [AND cond]` (`update_table_with_map`,
    * `loading.rb:160-196`) as a single left join + per-column conditional
    * merge. The `@TABLE` placeholder of the reference becomes the fixed
    * alias `sta`; mapping values and `condition` may reference `sta.<col>`
    * and `ds.<col>`.
    *
    * Rows with a staging match (and condition true) get mapped columns
    * replaced and `record_status='loaded'` (reference `loading.rb:171`);
    * others pass through. Staging must be unique per key (use
    * [[dedupByKey]]) — enforced semantics, not assumed.
    *
    * Scale: one shuffle on `keys` (broadcast if `sta` is small — AQE
    * decides); no driver-side iteration.
    */
  def updateWithMap(
      ds: DataFrame,
      sta: DataFrame,
      mapping: Seq[(String, ValueSpec)],
      keys: Seq[String],
      condition: Option[String] = None
  ): DataFrame = {
    val d = ds.alias("ds")
    // Join on equality of same-named key columns; keep only sta columns
    // needed by the mapping + keys (column pruning by construction, like the
    // reference's explicit column list).
    val s       = sta.alias("sta")
    val joinOn  = keys.map(k => col(s"ds.$k") === col(s"sta.$k")).reduce(_ && _)
    val joined  = d.join(s, joinOn, "left")
    val hasMatch = keys.map(k => col(s"sta.$k").isNotNull).reduce(_ && _)
    val matched  = condition.fold(hasMatch)(c => hasMatch && expr(c))

    val mapped = mapping.toMap
    val outCols = ds.columns.toIndexedSeq.map { c =>
      mapped.get(c) match {
        case Some(v) => when(matched, ValueSpec.toColumn(v)).otherwise(col(s"ds.$c")).as(c)
        case None if c == "record_status" =>
          when(matched, lit("loaded")).otherwise(col(s"ds.$c")).as(c)
        case None => col(s"ds.$c").as(c)
      }
    }
    // New mapped columns that don't exist on ds yet are appended (NULL when unmatched).
    val newCols = mapping.collect {
      case (f, v) if !ds.columns.contains(f) =>
        when(matched, ValueSpec.toColumn(v)).as(f)
    }
    joined.select(outCols ++ newCols: _*)
  }

  /** Add any missing audit columns as typed NULLs (is_hidden defaults false)
    * so [[finalizeDataset]] can run on a bare relation — the reference's
    * dataset DDL carried these columns from creation.
    */
  def ensureAuditColumns(df: DataFrame): DataFrame =
    AuditColumns.foldLeft(df) { case (d, (name, dt)) =>
      if (d.columns.contains(name)) d
      else if (name == "is_hidden") d.withColumn(name, lit(false))
      else if (name == "record_status") d.withColumn(name, lit(null).cast(dt))
      else d.withColumn(name, lit(null).cast(dt))
    }

  /** Publish-status transition — reference `finalize_dataset_loading`
    * (`loading.rb:203-221`): rows with `record_status='loaded'` get audit
    * fields stamped and move to `record_status='new'`. `now` is injected
    * (not `current_timestamp()`) so runs are reproducible (SURVEY.md §7.4.3).
    */
  def finalizeDataset(
      df: DataFrame,
      batchId: Long,
      now: Column,
      createdBy: String = "system_loading"
  ): DataFrame = {
    val d = ensureAuditColumns(df)
    val m = col("record_status") === "loaded"
    d.withColumn("created_at", when(m, now).otherwise(col("created_at")))
      .withColumn("created_by", when(m, lit(createdBy)).otherwise(col("created_by")))
      .withColumn("quality_status", when(m, lit("ok")).otherwise(col("quality_status")))
      .withColumn("batch_id", when(m, lit(batchId)).otherwise(col("batch_id")))
      .withColumn("validity_date", when(m, lit(null).cast(DateType)).otherwise(col("validity_date")))
      .withColumn("is_hidden", when(m, lit(true)).otherwise(col("is_hidden")))
      .withColumn("record_status", when(m, lit("new")).otherwise(col("record_status")))
  }

  /** `UPDATE staging SET etl_loaded_date = NOW()` — reference
    * `set_loaded_flag` (`loading.rb:198-201`). Injected `now` for
    * reproducibility; prefer an external watermark (F2) at scale — rewriting
    * 100 TB of staging to stamp a flag is the anti-pattern this replaces.
    */
  def setLoadedFlag(df: DataFrame, now: Column): DataFrame =
    df.withColumn("etl_loaded_date", now)

  /** Incremental watermark filter — the reference's intended
    * `date_created > STR_TO_DATE(last_run,…)` condition (`loading.rb:142-145`).
    * On date-partitioned storage this becomes partition pruning.
    */
  def incrementalFilter(df: DataFrame, watermarkCol: String, lastRun: Column): DataFrame =
    df.filter(col(watermarkCol) > lastRun)

  /** S9: the index-equivalent physical layout. Spark has no secondary
    * indexes (reference `create_staging_table_index`, `loading.rb:276-278`);
    * the join-acceleration analog is clustering: repartition on the key so
    * subsequent key-joins co-locate without reshuffling, sort within
    * partitions so parquet min/max stats prune key lookups.
    */
  def clusterByKey(df: DataFrame, keys: Seq[String], numPartitions: Int): DataFrame =
    df.repartition(numPartitions, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)

  /** S10: single literal-row insert (reference `test/jobs/test.etl/
    * test.rb:20-23`) — a union with a one-row frame; columnar stores have
    * no row-level INSERT.
    */
  def insertRow(df: DataFrame, values: Seq[Any]): DataFrame = {
    val row = org.apache.spark.sql.Row(values: _*)
    df.union(df.sparkSession.createDataFrame(
      java.util.Collections.singletonList(row), df.schema))
  }
}
