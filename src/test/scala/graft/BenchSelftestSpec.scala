package graft

/** End-to-end wiring test for [[Bench]]'s bidirectional contention
  * sentinel (VERDICT r10 #7): the unit rules live in [[BenchCoreSpec]],
  * but nothing there proves the SWEEP → recheck → verdict → artifact →
  * exit-intent chain is actually connected. This spec injects a fixed
  * delay into every sweep pass's timed window (the self-test hook the
  * harness carries precisely for this) while the post-sweep rechecks run
  * clean — reproducing deterministically the round-9 failure shape
  * (recorded samples contended, recheck fast) — and asserts on the REAL
  * emitted artifact and the REAL return code, in-process. The shell
  * variant (tools/contention_selftest.sh) exercises the same path
  * through a forked JVM for the packaged-classpath case.
  */
class BenchSelftestSpec extends SparkSpec {

  test("injected sweep delay trips the sentinel: contended=true artifact, exit intent 3") {
    val out = java.nio.file.Files.createTempFile("graft_selftest_bench", ".json")
    val env = Map(
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      // three cheap queries keep the spec ~20 s; the injected 2 s delay
      // dominates each sweep sample so recorded/recheck ratio > 3
      "SPARK_GRAFT_BENCH_ONLY" -> "q1_pricing_summary,q3_topk_revenue,f1_filter",
      "SPARK_GRAFT_BENCH_SELFTEST_SWEEP_DELAY_MS" -> "2000",
      "SPARK_GRAFT_BENCH_STRICT" -> "1",
      "SPARK_GRAFT_BENCH_OUT" -> out.toString)
    // respected: Bench.run only sets WARN on sessions it OWNS
    spark.sparkContext.setLogLevel("ERROR")
    val rc = Bench.run(env.get)
    assert(rc == 3, s"strict mode must return exit intent 3 on a contended run, got $rc")
    assert(!spark.sparkContext.isStopped,
      "Bench.run must not stop a borrowed session")
    val art = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    assert(art.contains("\"contended\":true"),
      s"artifact must self-label contended=true: $art")
    assert(art.contains("\"timing\":\"interleaved_sweeps_min\""))
  }

  test("clean run returns 0 and leaves the borrowed session alive") {
    val out = java.nio.file.Files.createTempFile("graft_selftest_clean", ".json")
    val env = Map(
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_BENCH_ONLY" -> "q1_pricing_summary",
      "SPARK_GRAFT_BENCH_OUT" -> out.toString)
    spark.sparkContext.setLogLevel("ERROR")
    val rc = Bench.run(env.get)
    assert(rc == 0)
    assert(!spark.sparkContext.isStopped)
    val art = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    assert(art.contains("\"n_err\":0"))
  }
}
