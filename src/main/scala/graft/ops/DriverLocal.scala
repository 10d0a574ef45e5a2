package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Shared scaffolding for the size-gated driver fast paths
  * ([[Dedup.connectedComponents]], [[Graph.pagerank]],
  * [[Graph.bfsLevels]]): a bounded probe-then-collect, and the
  * rows→DataFrame conversion for their two-column results. One home for
  * the Int-clamping, so a threshold above Int.MaxValue widens the gate
  * to the collectable maximum instead of overflowing `limit()` negative.
  */
private[ops] object DriverLocal {

  /** `Some(rows)` when `df` has at most `max` rows (checked with a
    * bounded `limit(n+1).count()` probe — never a full count), else
    * `None`. `max <= 0` disables the fast path for non-empty inputs
    * (only a genuinely empty frame collects).
    */
  def boundedCollect(df: DataFrame, max: Long): Option[Array[Row]] = {
    val lim = math.min(math.max(max, 0L), Int.MaxValue - 2L).toInt
    val n = df.limit(lim + 1).count()
    if (n <= lim) Some(df.collect()) else None
  }

  /** A two-column DataFrame from driver-side rows. */
  def twoColDF(spark: SparkSession, rows: Seq[Row],
               name1: String, t1: DataType,
               name2: String, t2: DataType): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField(name1, t1), StructField(name2, t2))))
}
