package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane LSH-bucketed
  * variant as the scale path (candidates come from one bucket join instead
  * of a full cross product).
  *
  * Numeric portability: elements are cast float→double (exact) and reduced
  * left-to-right with `aggregate`, matching DuckDB's `list_sum` order, so
  * cosines are bit-identical across engines. All arithmetic stays in
  * codegen'd higher-order Column functions — no UDFs, no driver collect.
  */
object Similarity {

  /** Left-to-right double dot product of two array columns — the native
    * codegen'd [[graft.functions.DotProduct]] expression (bit-identical to
    * the HOF formulation `aggregate(zip_with(...))`, see [[dotHof]], but
    * compiled into a tight loop).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.graft_dot(a, b)

  /** The built-ins-only formulation, kept as the reference semantics the
    * native expression must match.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * candidates by cosine (desc), ties broken by candidate id. The
    * candidate side is the big one — queries broadcast; the per-query
    * window ranks locally after the broadcast join, so the only wide op is
    * the final rank (partitioned by query id, never by corpus size).
    *
    * Norms are computed ONCE per side before the join (N+Q sqrt-dots
    * instead of 3·N·Q per-pair) — bit-identical to the per-pair formula
    * since the fold order is unchanged.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Deterministic ±1 hyperplane weights: dimension i of plane p follows the
    * high bit of hex digit (i mod 32)+1 of md5("plane<p>_<i/32>"). Computed
    * once at plan-build time; both the Spark plan and the generated oracle
    * SQL inline the same constants.
    */
  def planeWeights(plane: Int, dims: Int): Seq[Double] = {
    val hex = (0 to (dims - 1) / 32).map { blk =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"plane${plane}_$blk".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.mkString
    (0 until dims).map(i => if (Character.digit(hex.charAt(i), 16) >= 8) 1.0 else -1.0)
  }

  /** Random-hyperplane LSH bucket signature: one bit per plane, bit p = 1
    * iff dot(v, plane_p) >= 0. Narrow per-row transform.
    */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column = {
    val bitCols = (0 until planes).map { p =>
      val w = array(planeWeights(p, dims).map(lit): _*)
      when(dot(vec, w) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitCols: _*)
  }

  /** LSH-bucketed approximate top-k: candidates restricted to the query's
    * bucket. Recall < 1 by construction; the join is on bucket equality, so
    * cost scales with bucket occupancy (corpus/2^planes on balanced data)
    * instead of the full corpus.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int, dims: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"), lshBucket(col(vecCol), planes, dims).as("bucket"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), lshBucket(col(vecCol), planes, dims).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** [[bruteForceTopK]] with the heap aggregate
    * ([[graft.functions.TopKByScore]]) instead of a rank window: map-side
    * partial top-k buffers collapse each partition to k rows per query
    * BEFORE the shuffle, and no partition ever sorts. Identical output.
    */
  def bruteForceTopKAgg(queries: DataFrame, candidates: DataFrame,
                        idCol: String, vecCol: String, k: Int): DataFrame = {
    import graft.functions.GraftFunctions.graft_topk
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .groupBy("query_id")
      .agg(graft_topk(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"), col("t.score").as("cos"))
  }

  /** IVF-style approximate top-k: a deterministic coarse quantizer (the
    * first `nCentroids` vectors by id — a real system trains k-means; the
    * index structure, not the centroid quality, is what scales) assigns
    * every vector to its nearest centroid, and each query probes ONLY its
    * own centroid's inverted list. Cost per query drops from N to
    * N/nCentroids on balanced lists — the classic IVF trade of recall for
    * a bucket-join instead of a cross product.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
              vecCol: String, k: Int, nCentroids: Int): DataFrame = {
    val cents = candidates.filter(col(idCol) < nCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
    def assign(df: DataFrame, id: String, vec: String): DataFrame = {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("__cs", round(dot(col(vec), col("cent_v")) /
          (norm(col(vec)) * norm(col("cent_v"))), 6))
      val w = Window.partitionBy(id).orderBy(desc("__cs"), col("cent_id"))
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .drop("__cs", "__rn", "cent_v")
    }
    val c = assign(candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn")), "neighbor_id", "cv")
    val q = assign(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")), "query_id", "qv")
    val scored = c.join(broadcast(q), Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Embedding-cosine near-duplicate pairs (id1 < id2, cosine ≥ threshold).
    * Exact and quadratic — sample or LSH-prefilter at scale.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id1"), col(vecCol).as("v1"), norm(col(vecCol)).as("n1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("v2"), norm(col(vecCol)).as("n2"))
    a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("cos", round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6))
      .filter(col("cos") >= threshold)
      .select("id1", "id2", "cos")
  }
}
