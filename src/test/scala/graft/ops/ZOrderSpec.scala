package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The claim z-ordering makes over 1-D range clustering: with per-file
  * bounds recorded, a narrow range on EITHER z-column prunes most files —
  * a lexicographic layout only ever prunes the leading column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves: neighbors in either dimension stay close, corners far") {
    val df = Seq((0.0, 0.0), (100.0, 100.0), (0.0, 100.0), (100.0, 0.0))
      .toDF("a", "b")
    val z = df.select(ZOrder.zValue(Seq(col("a"), col("b")),
      Seq(0.0, 0.0), Seq(100.0, 100.0), bits = 8).as("z"))
      .collect().map(_.getLong(0))
    assert(z(0) == 0L)                  // (min,min) → rank (0,0)
    assert(z(1) == (1L << 16) - 1)      // (max,max) → all 16 interleaved bits set
    assert(z(2) != z(3))                // the two mixed corners differ
    // bit interleave: (0,max) sets exactly the odd positions, (max,0) the even
    assert((z(2) & z(3)) == 0L && (z(2) | z(3)) == (1L << 16) - 1)
  }

  test("z-ordered manifest compaction prunes files on BOTH columns; 1-D sort only on the first") {
    // independent 64×64 grid — no correlation between a and b
    val grid = for { a <- 0 until 64; b <- 0 until 64 } yield (a.toLong, b.toLong)
    def seed(dir: String): Unit =
      Manifest.appendWithStats(grid.toDF("a", "b").repartition(4), dir, Seq("a", "b"))

    // 1-D clustered compaction: lexicographic (a, b)
    val lex = java.nio.file.Files.createTempDirectory("zlex").toString + "/ds"
    seed(lex)
    Manifest.compact(spark, lex, targetFileBytes = 512L)
    // z-ordered compaction on the same data
    val zed = java.nio.file.Files.createTempDirectory("zzed").toString + "/ds"
    seed(zed)
    Manifest.compactZOrder(spark, zed, Seq("a", "b"), targetFileBytes = 512L)

    def frac(dir: String, c: String): Double = {
      val total = Manifest.read(spark, dir).inputFiles.length
      Manifest.readRange(spark, dir, c, 0, 7).inputFiles.length.toDouble / total
    }
    assert(Manifest.read(spark, zed).count() == 64 * 64)
    // correctness: the pruned read returns exactly the matching rows
    assert(Manifest.readRange(spark, zed, "b", 0, 7).count() == 8 * 64)
    // both layouts prune the leading column hard
    assert(frac(lex, "a") <= 0.5, s"lex a-frac ${frac(lex, "a")}")
    assert(frac(zed, "a") <= 0.5, s"z a-frac ${frac(zed, "a")}")
    // the second column: lexicographic files span b's full range (no
    // pruning); the z-order tiles it
    assert(frac(lex, "b") >= 0.99, s"lex b-frac ${frac(lex, "b")} (expected ~1)")
    assert(frac(zed, "b") <= 0.6, s"z b-frac ${frac(zed, "b")} — tiling lost")
  }
}
