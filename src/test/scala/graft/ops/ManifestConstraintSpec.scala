package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CHECK constraints on manifest datasets (Delta's ADD CONSTRAINT): a
  * writer-enforced invariant that makes a violating batch impossible to
  * publish. Pins: add validates existing data; every writer path refuses
  * a violating batch BEFORE claiming a version (dataset state unchanged,
  * staged files invisible); NULL predicate results pass (SQL CHECK);
  * constraints carry through unrelated commits and compactions; drop
  * re-opens the gate.
  */
class ManifestConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/ds"

  test("violating batches cannot publish through any writer path") {
    val dir = tmp("ck")
    Manifest.append(Seq((1L, 10L, 0L), (2L, 20L, 0L)).toDF("k", "v", "ord"), dir)
    Manifest.addConstraint(spark, dir, "v_nonneg", "v >= 0")
    assert(Manifest.constraints(spark, dir) == Map("v_nonneg" -> "v >= 0"))
    val vBefore = Manifest.latestVersion(spark, dir)

    // append of a bad batch: refused, version and rows unchanged
    val e = intercept[IllegalArgumentException] {
      Manifest.append(Seq((3L, -1L, 0L)).toDF("k", "v", "ord"), dir)
    }
    assert(e.getMessage.contains("v_nonneg"))
    assert(Manifest.latestVersion(spark, dir) == vBefore)
    assert(Manifest.read(spark, dir).count() == 2)

    // a good append still lands, and carries the constraint forward
    Manifest.append(Seq((3L, 30L, 0L)).toDF("k", "v", "ord"), dir)
    assert(Manifest.constraints(spark, dir) == Map("v_nonneg" -> "v >= 0"))

    // upsert and merge with violating values: refused
    intercept[IllegalArgumentException] {
      Manifest.upsert(Seq((1L, -5L, 0L)).toDF("k", "v", "ord"),
        dir, Seq("k"), "ord")
    }
    intercept[IllegalArgumentException] {
      Manifest.merge(spark, dir, Seq((1L, -7L)).toDF("k", "nv"), Seq("k"),
        Manifest.MergeSpec(matchedUpdate = Map("v" -> "s.nv"),
          notMatchedInsert = false))
    }
    intercept[IllegalArgumentException] {
      Manifest.upsertMergeOnRead(Seq((2L, -9L, 1L)).toDF("k", "v", "ord"),
        dir, Seq("k"), "ord")
    }
    intercept[IllegalArgumentException] {
      Manifest.overwrite(Seq((9L, -1L, 0L)).toDF("k", "v", "ord"), dir)
    }
    val rows = Manifest.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
  }

  test("add validates existing data; NULL passes; drop re-opens") {
    val dir = tmp("ck2")
    Manifest.append(Seq((1L, Some(5L)), (2L, None)).toDF("k", "v"), dir)
    // existing violation → constraint refused, no version published
    val v0 = Manifest.latestVersion(spark, dir)
    intercept[IllegalArgumentException] {
      Manifest.addConstraint(spark, dir, "v_big", "v >= 100")
    }
    assert(Manifest.latestVersion(spark, dir) == v0)
    // NULL predicate result passes (SQL CHECK semantics): v IS NULL row ok
    Manifest.addConstraint(spark, dir, "v_pos", "v > 0")
    Manifest.append(Seq((3L, Option.empty[Long])).toDF("k", "v"), dir)
    assert(Manifest.read(spark, dir).count() == 3)
    // constraints survive a compaction commit
    Manifest.compact(spark, dir)
    assert(Manifest.constraints(spark, dir).contains("v_pos"))
    intercept[IllegalArgumentException] {
      Manifest.append(Seq((4L, Some(0L))).toDF("k", "v"), dir)
    }
    // drop re-opens the gate
    Manifest.dropConstraint(spark, dir, "v_pos")
    assert(Manifest.constraints(spark, dir).isEmpty)
    Manifest.append(Seq((4L, Some(0L))).toDF("k", "v"), dir)
    assert(Manifest.read(spark, dir).count() == 4)
  }
}
