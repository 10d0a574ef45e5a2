package graft.ops

import graft.SparkSpec

/** The quality gate's failure modes, not its happy path (OrchestrationSpec
  * covers gating a real job): an EMPTY load must not pass silently, and
  * two checks of the same type on the same column must each get their own
  * verdict.
  */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(df: org.apache.spark.sql.DataFrame,
                       checks: Seq[Checks.Check]): Seq[(String, String, Double, Boolean)] =
    Checks.run(df, checks).collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))

  test("empty input: no NULL verdicts; NotNull fails, count-based checks pass vacuously") {
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    val out = verdicts(empty, Seq(
      Checks.NotNull("id"),
      Checks.Bounds("id", 0, 10),
      Checks.AcceptedValues("v", Seq("a", "b")),
      Checks.Unique(Seq("id"))))
    // every verdict is a concrete boolean — the gate's filter can't drop a
    // NULL row and publish an empty load through a NotNull expectation
    assert(out.map(_._4) == Seq(false, true, true, true), s"got $out")
    assert(out.head._3 == 1.0) // empty ≡ all-null for the fraction measure
  }

  test("two checks of the same type on one column evaluate independently") {
    val df = Seq(5L, 15L, 25L).toDF("x")
    val out = verdicts(df, Seq(
      Checks.Bounds("x", 0, 30),   // all inside → pass
      Checks.Bounds("x", 0, 10)))  // 2 outside → fail
    assert(out.map(v => (v._3, v._4)) == Seq((0.0, true), (2.0, false)), s"got $out")
  }

  test("non-empty data still gates correctly end to end") {
    val df = Seq((1L, "a"), (2L, "b"), (2L, null)).toDF("id", "v")
    val out = verdicts(df, Seq(
      Checks.NotNull("v", maxNullFrac = 0.5), // 1/3 null → pass
      Checks.NotNull("v"),                    // 1/3 null → fail
      Checks.Unique(Seq("id"))))              // dup id=2 → fail
    assert(out.map(_._4) == Seq(true, false, false), s"got $out")
  }
}
