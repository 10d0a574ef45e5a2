package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at 100 TB: salted two-phase
  * aggregation and a salted broadcast-replicated join. AQE's skew-join
  * splitting handles most cases at runtime; these are the explicit forms
  * for planned hot keys (a single `user_id` with 10⁹ events, a stopword
  * token in the dedup join).
  *
  * Results are exactly those of the unsalted operation — the salt only
  * changes the partitioning, which is why the salted queries can be
  * verified against the plain SQL oracle.
  */
object Skew {

  /** Deterministic salt in [0, n): hash of the salt-by columns. Using data
    * columns (not rand()) keeps the plan deterministic and retry-safe.
    */
  def saltCol(n: Int, by: Seq[Column]): Column =
    pmod(hash(by: _*), lit(n))

  /** Two-phase salted sum/count: phase 1 aggregates on (keys, salt) —
    * spreading a hot key over `saltN` reducers — phase 2 combines the
    * partials. Equivalent to `df.groupBy(keys).agg(sum, count)`.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltN: Int, saltBy: Seq[String]): DataFrame = {
    val phase1 = df
      .withColumn("__salt", saltCol(saltN, saltBy.map(col)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n_rows"))
  }

  /** Derive a salt count from the observed key distribution instead of
    * guessing: sample the keys cheaply, measure how many times heavier the
    * hottest key is than the average key (`skewFactor`), and return
    *
    *   saltN = 1                       when skewFactor ≤ skewThreshold
    *   saltN = min(cap, ⌈skewFactor⌉)  otherwise
    *
    * Spreading the hot key over ⌈skewFactor⌉ reducers brings its
    * per-reducer share down to roughly the average key's, which is the
    * point of salting; `cap` bounds the small-side replication cost of
    * [[saltedJoin]] (right side is duplicated saltN×). The sample's
    * per-key counts are aggregated map-side and only one (max, avg) row
    * reaches the driver, so the probe costs a fraction of one scan at any
    * scale. A uniform key space returns 1 — salting uniform data only
    * adds a shuffle column.
    */
  def suggestSaltN(df: DataFrame, keys: Seq[String],
                   sampleFraction: Double = 0.01,
                   skewThreshold: Double = 4.0, cap: Int = 64): Int = {
    val sampled =
      if (sampleFraction >= 1.0) df.select(keys.map(col): _*)
      else df.select(keys.map(col): _*).sample(withReplacement = false, sampleFraction, seed = 7L)
    val row = sampled
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(max(col("__c")).cast("double").as("mx"),
        avg(col("__c")).as("av"))
      .head()
    if (row.isNullAt(0) || row.isNullAt(1) || row.getDouble(1) <= 0.0) 1
    else {
      val skewFactor = row.getDouble(0) / row.getDouble(1)
      if (skewFactor <= skewThreshold) 1
      else math.min(cap, math.ceil(skewFactor).toInt)
    }
  }

  /** Salted equi-join for a skewed left side: left rows get a deterministic
    * salt, the (small) right side is replicated `saltN`× so every salted
    * partition finds its match. Output equals the plain inner join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltN: Int, saltBy: Seq[String]): DataFrame = {
    val l = left.withColumn("__salt", saltCol(saltN, saltBy.map(col)))
    val r = right.withColumn("__salt",
      explode(array((0 until saltN).map(lit): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
