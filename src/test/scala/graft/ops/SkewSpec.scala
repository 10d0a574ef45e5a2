package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1 to 1000).map { i =>
    // hot key: 80% of rows share key 1
    (if (i % 5 == 0) (i % 7) + 2L else 1L, i.toLong, i * 1.5)
  }.toDF("k", "id", "v")

  private lazy val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
    (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "label")

  test("saltedSumCount equals plain groupBy on skewed data") {
    val salted = Skew.saltedSumCount(fact, Seq("k"), "v", saltN = 8, saltBy = Seq("id"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val plain = fact.groupBy("k").agg(sum("v"), count(lit(1)))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin equals plain inner join") {
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), saltN = 8, saltBy = Seq("id"))
      .orderBy("id").select("id", "label").collect().map(r => (r.getLong(0), r.getString(1)))
    val plain = fact.join(dim, Seq("k"))
      .orderBy("id").select("id", "label").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 1000) // every fact row found its dim match
  }

  test("salt spreads a hot key across partitions") {
    val salts = fact.filter(col("k") === 1L)
      .select(Skew.saltCol(8, Seq(col("id"))).as("s"))
      .distinct().count()
    assert(salts == 8) // hot key occupies all 8 salt buckets
  }

  test("suggestSaltN measures skew: >1 on the hot-key fixture, 1 on uniform keys") {
    // full-sample probe on the fixture: key 1 holds 80% of 1000 rows over
    // 8 keys → skewFactor = 800 / 125 = 6.4 → saltN = 7
    val n = Skew.suggestSaltN(fact, Seq("k"), sampleFraction = 1.0)
    assert(n > 1, s"expected salting suggested for the hot key, got $n")
    // the suggestion composes with the salted agg and stays correct
    val salted = Skew.saltedSumCount(fact, Seq("k"), "v", saltN = n, saltBy = Seq("id"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val plain = fact.groupBy("k").agg(sum("v"), count(lit(1)))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
    // and the suggested salt actually spreads the hot key across reducers
    val spread = fact.filter(col("k") === 1L)
      .select(Skew.saltCol(n, Seq(col("id"))).as("s")).distinct().count()
    assert(spread == n, s"hot key occupies $spread of $n salt buckets")
    // uniform keys: no skew → no salting suggested
    val uniform = (1 to 1000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "id")
    assert(Skew.suggestSaltN(uniform, Seq("k"), sampleFraction = 1.0) == 1)
    // cap bounds the right-side replication cost of saltedJoin: one key
    // with 1000 rows over a 100-key long tail → skewFactor ≈ 92 → capped
    val extreme = ((1 to 1000).map(i => (1L, i.toLong)) ++
      (2 to 101).map(i => (i.toLong, 0L))).toDF("k", "id")
    assert(Skew.suggestSaltN(extreme, Seq("k"), sampleFraction = 1.0, cap = 16) == 16)
  }

  test("AQE does not rebalance single-stage agg skew; salting is still needed") {
    // AQE's skew mitigation (OptimizeSkewedJoin / OptimizeSkewInRebalance)
    // applies to sort-merge joins and explicit rebalance hints — NOT to the
    // shuffle feeding a hash aggregate. With AQE fully enabled, every row
    // of a hot key still lands on one reducer; this pins the executable
    // reason saltedSumCount exists rather than leaving it to prose.
    val conf = spark.conf
    val prev = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    try {
      val plain = fact.groupBy("k").agg(sum(col("v")).as("s"))
      plain.collect() // materialize so the adaptive plan is final
      val plan = plain.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("skew"),
        s"expected NO AQE skew handling on an aggregation shuffle:\n$plan")
      // the agg shuffle hashes on k alone → one partition owns the hot key
      val hotParts = fact.filter(col("k") === 1L)
        .select(pmod(hash(col("k")), lit(8)).as("p")).distinct().count()
      assert(hotParts == 1)
      // whereas the salted phase-1 shuffle spreads it over all 8 reducers
      // (asserted in the test above) while producing identical results
      // (asserted in the first test) — with AQE on throughout this suite
    } finally conf.set("spark.sql.adaptive.enabled", prev)
  }
}
