package graft

import org.apache.spark.sql.functions._

/** Fixture-integrity spec for the bench's sf1 lane generator: the lane's
  * numbers are only comparable round-to-round if the derived corpus
  * keeps its invariants — per-copy key disjointness, FK consistency
  * WITHIN a copy, disjoint copy vocabularies (no cross-copy near-dup
  * blowup), normalized event timestamps (the raw-read hazard the
  * round-11 self-review caught), and cache idempotence. Runs against
  * sf0.001 so the 10-copy build stays a seconds-scale test.
  */
class Sf1CorpusSpec extends SparkSpec {

  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_sf1spec").toString
    Sf1Corpus.ensure(spark, "/root/testdata/sf0.001", d)
    d
  }
  private def t(name: String) = spark.read.parquet(s"$outDir/$name.parquet")

  test("replicated tables are exactly Copies x base; fixed dims are 1x") {
    val base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert(t("lineitem").count() == base.count() * Sf1Corpus.Copies)
    val baseOrders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert(t("orders").count() == baseOrders.count() * Sf1Corpus.Copies)
    val baseRegion = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    assert(t("region").count() == baseRegion.count())
  }

  test("FK consistency holds within every copy (no cross-copy collisions)") {
    // every lineitem order key resolves to exactly one order, and every
    // order's customer exists — if copy offsets collided or drifted
    // between tables, these joins would drop or multiply rows
    val li = t("lineitem").select(col("l_orderkey"))
    val o = t("orders").select(col("o_orderkey"), col("o_custkey"))
    assert(li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() == 0, "lineitem rows with no matching order")
    val c = t("customer").select(col("c_custkey"))
    assert(o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
      .count() == 0, "orders with no matching customer")
    // key spaces disjoint across copies: total distinct keys = 10x base
    val baseO = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert(o.select("o_orderkey").distinct().count() ==
      baseO.count() * Sf1Corpus.Copies)
  }

  test("copy vocabularies are disjoint (cross-copy near-dup pairs impossible)") {
    val docs = t("documents")
    def vocab(f: org.apache.spark.sql.Column) = docs.filter(f)
      .select(explode(split(col("text"), " ")).as("tok")).distinct()
    val v0 = vocab(col("doc_id") < 10000000L)
    val v1 = vocab(col("doc_id") >= 10000000L && col("doc_id") < 20000000L)
    assert(v0.count() > 0 && v1.count() > 0)
    assert(v0.join(v1, "tok").count() == 0,
      "copy 0 and copy 1 share vocabulary — cross-copy near-dups possible")
  }

  test("events.ts is written normalized (plain TIMESTAMP, not NTZ/nanos)") {
    // the fixture must be readable by a RAW parquet read on any session:
    // Tables.events normalizes at generation time (self-review catch —
    // a raw source read crashed on nanos drops and leaked NTZ otherwise)
    assert(t("events").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(t("events").count() ==
      Tables.events(spark, "/root/testdata/sf0.001").count() * Sf1Corpus.Copies)
  }

  test("embeddings stay distinct across copies; probe set stays base-sized") {
    val e = t("embeddings")
    val base = e.filter(col("vec_id") === 0).select(col("embedding")).head.getSeq[Float](0)
    val c1 = e.filter(col("vec_id") === 10000000L).select(col("embedding")).head.getSeq[Float](0)
    assert(base != c1, "copy-1 vector identical to base — degenerate ties")
    assert(e.filter(col("vec_id") < 8).count() ==
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(col("vec_id") < 8).count(),
      "thresholded probe set must land only in copy 0")
  }

  test("ensure is idempotent: a matching cache is not rebuilt") {
    val marker = java.nio.file.Paths.get(outDir, "_GRAFT_SF1_OK")
    val before = java.nio.file.Files.getLastModifiedTime(marker)
    Sf1Corpus.ensure(spark, "/root/testdata/sf0.001", outDir)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == before,
      "second ensure() rewrote a valid cache")
  }
}
