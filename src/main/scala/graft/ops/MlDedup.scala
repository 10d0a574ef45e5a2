package graft.ops

import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH, RegexTokenizer}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup detection via Spark MLlib's built-in `MinHashLSH` — the
  * library-first option (SURVEY.md §7.3 originally planned this path; the
  * md5-based [[Dedup]] pipeline exists for cross-engine oracle parity,
  * which MLlib's internal hash family can't provide).
  *
  * Deterministic under a fixed seed. `approxSimilarityJoin` prunes by the
  * LSH banding internally — same bucket-join scaling as [[Dedup]]'s
  * hand-rolled variant, with OR-amplification across `numHashTables`.
  */
object MlDedup {

  /** Jaccard-distance near-dup pairs: (id1, id2, jaccard_dist ≤ maxDist). */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Double, numHashTables: Int = 8,
                      seed: Long = 42L): DataFrame = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__toks")
      .setPattern("\\s+").setToLowercase(true)
    val toks = tokenizer.transform(df.select(col(idCol), col(textCol)))
    val cv = new CountVectorizer()
      .setInputCol("__toks").setOutputCol("__vec").setBinary(true)
      .fit(toks)
    val vecs = cv.transform(toks)
      // MinHashLSH requires at least one non-zero entry
      .filter(udfNonEmpty(col("__vec")))
    val lsh = new MinHashLSH()
      .setInputCol("__vec").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model  = lsh.fit(vecs)
    val joined = model.approxSimilarityJoin(vecs, vecs, maxDist, "jaccard_dist")
    joined
      .select(
        col(s"datasetA.$idCol").as("id1"),
        col(s"datasetB.$idCol").as("id2"),
        round(col("jaccard_dist"), 4).as("jaccard_dist"))
      .filter(col("id1") < col("id2"))
      .distinct()
  }

  private val udfNonEmpty =
    udf((v: org.apache.spark.ml.linalg.Vector) => v match {
      case s: SparseVector => s.indices.nonEmpty
      case d               => d.numNonzeros > 0
    })
}
