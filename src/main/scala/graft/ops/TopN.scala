package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped top-n as an aggregation, not a window: the native heap
  * aggregate ([[graft.functions.TopKByScore]]) keeps n (score, id) pairs
  * per group through MAP-SIDE partial aggregation, so the exchange
  * carries groups×n tiny rows where `row_number() OVER (PARTITION BY
  * group ORDER BY score)` shuffles and sorts the whole table. The go-to
  * "top sellers per region / top docs per query" shape at 100 TB.
  *
  * Ranking: score descending, ties by lowest id — identical to
  * `ORDER BY score DESC, id`.
  */
object TopN {

  def topNPerGroup(df: DataFrame, groupCols: Seq[String], score: Column,
                   id: Column, n: Int): DataFrame = {
    import graft.functions.GraftFunctions.graft_topk
    df.groupBy(groupCols.map(col): _*)
      .agg(graft_topk(score.cast("double"), id.cast("long"), n).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("__pos") + 1).cast("int").as("rank"),
        col("__e.id").as("id"),
        col("__e.score").as("score")): _*)
  }
}
