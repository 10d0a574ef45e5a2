package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The [[Similarity.VecScore]] metric family flowing through the IVF
  * surface BY CONSTRUCTION (NOTES r12 staging: "pass a scorer, not a
  * flag"): the same scorer drives build-time list assignment, probe
  * assignment + ranking, and calibration — and the built metric is
  * persisted with the generation (`_ivf_scorer.json`) so probes of a
  * standing index recover it instead of guessing.
  */
class IvfScorerSpec extends SparkSpec {
  import spark.implicits._

  // deliberately NOT L2-vs-cosine-agreeing: distinct norms so the two
  // metrics rank differently and a scorer mixup shows up as wrong rows
  private def corpus(n: Int): DataFrame = (0 until n)
    .map(i => (i.toLong, Array.tabulate(6)(d => ((i * 5 + d * 7) % 11 - 5).toFloat)))
    .toDF("vec_id", "embedding")

  /** Exact top-k under `scorer` via a plain all-pairs sort — the ground
    * truth the IVF paths must reproduce when they probe every list. */
  private def exactTopK(df: DataFrame, k: Int,
                        scorer: Similarity.VecScore): Seq[(Long, Long, Int)] = {
    val q = df.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = df.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("s"), col("neighbor_id"))
    q.crossJoin(c).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("s", scorer(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sorted
  }

  test("L2 ivfTopKWith with one list reproduces exact L2 ranking") {
    val df = corpus(40)
    val oneList = df.filter(col("vec_id") === 0)
      .select(col("vec_id").cast("int").as("cent_id"),
        transform(col("embedding"), x => x.cast("double")).as("cent_v"))
    val got = Similarity.ivfTopKWith(df, df, "vec_id", "embedding", 3,
        oneList, Similarity.L2Score)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got == exactTopK(df, 3, Similarity.L2Score))
  }

  test("L2 and cosine genuinely disagree on this corpus (fixture sanity)") {
    val df = corpus(40)
    assert(exactTopK(df, 3, Similarity.L2Score)
      != exactTopK(df, 3, Similarity.CosineScore))
  }

  test("dot ivfTopKWith with one list reproduces exact inner-product ranking") {
    val df = corpus(40)
    val oneList = df.filter(col("vec_id") === 0)
      .select(col("vec_id").cast("int").as("cent_id"),
        transform(col("embedding"), x => x.cast("double")).as("cent_v"))
    val got = Similarity.ivfTopKWith(df, df, "vec_id", "embedding", 3,
        oneList, Similarity.DotScore)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got == exactTopK(df, 3, Similarity.DotScore))
    // unnormalized vectors: the third ordering really is distinct
    assert(exactTopK(df, 3, Similarity.DotScore)
      != exactTopK(df, 3, Similarity.CosineScore))
    assert(exactTopK(df, 3, Similarity.DotScore)
      != exactTopK(df, 3, Similarity.L2Score))
  }

  test("rebuild persists the scorer; recorded-scorer probe at full width is exact") {
    val df = corpus(60)
    val root = java.nio.file.Files.createTempDirectory("ivf_l2").toString
    Similarity.rebuildIvfIndexAuto(df, "vec_id", "embedding", root,
      scorer = Similarity.L2Score): Unit
    val (genPath, cents) = Similarity.loadIvfIndexCurrent(spark, root)
    val scorer = Similarity.recordedScorer(spark, genPath)
    assert(scorer == Similarity.L2Score)
    val lists = cents.count().toInt
    val got = Similarity.probeIvfIndexBatch(spark, genPath, df,
        "vec_id", "embedding", cents, k = 3, nProbe = lists, scorer = scorer)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got == exactTopK(df, 3, Similarity.L2Score))
    graft.ops.CacheControl.release(cents)
  }

  test("scorer-less index defaults to cosine (pre-scorer back-compat)") {
    val df = corpus(30)
    val idx = java.nio.file.Files.createTempDirectory("ivf_cos").toString + "/idx"
    // raw build path writes no _ivf_scorer.json — exactly an r12 index
    Similarity.buildIvfIndexAuto(df, "vec_id", "embedding", idx): Unit
    assert(Similarity.recordedScorer(spark, idx) == Similarity.CosineScore)
  }

  test("L2 calibration width reaches full recall against L2 ground truth") {
    val df = corpus(50)
    val root = java.nio.file.Files.createTempDirectory("ivf_cal").toString
    Similarity.rebuildIvfIndexAuto(df, "vec_id", "embedding", root,
      sampleQueries = Some(df.filter(col("vec_id") < 10)), k = 2,
      recallTarget = 1.0, scorer = Similarity.L2Score): Unit
    val (genPath, cents) = Similarity.loadIvfIndexCurrent(spark, root)
    val np = Similarity.recordedNProbe(spark, genPath).get
    assert(np >= 1 && np <= cents.count().toInt)
    val truth = exactTopK(df, 2, Similarity.L2Score)
      .filter(_._1 < 10).map(t => (t._1, t._2)).toSet
    val got = Similarity.probeIvfIndexBatch(spark, genPath,
        df.filter(col("vec_id") < 10), "vec_id", "embedding", cents,
        k = 2, nProbe = np, scorer = Similarity.L2Score)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(got), s"missing: ${truth -- got}")
    graft.ops.CacheControl.release(cents)
  }

  test("probing a recorded index under the wrong metric fails loudly") {
    val df = corpus(30)
    val root = java.nio.file.Files.createTempDirectory("ivf_guard").toString
    Similarity.rebuildIvfIndexAuto(df, "vec_id", "embedding", root,
      scorer = Similarity.L2Score): Unit
    val (genPath, cents) = Similarity.loadIvfIndexCurrent(spark, root)
    val e = intercept[IllegalArgumentException] {
      Similarity.probeIvfIndexBatch(spark, genPath, df.limit(2),
        "vec_id", "embedding", cents, k = 2) // default cosine ≠ built l2
    }
    assert(e.getMessage.contains("built under 'l2'"))
    // matching metric passes; a scorer-less (raw-build) index accepts any
    assert(Similarity.probeIvfIndexBatch(spark, genPath, df.limit(2),
      "vec_id", "embedding", cents, k = 2,
      scorer = Similarity.recordedScorer(spark, genPath)).count() > 0)
    graft.ops.CacheControl.release(cents)
  }

  test("VecScore.byName round-trips every member and rejects unknowns") {
    Similarity.VecScore.all.foreach(s =>
      assert(Similarity.VecScore.byName(s.name) == s))
    intercept[IllegalArgumentException](Similarity.VecScore.byName("ip"))
  }
}
