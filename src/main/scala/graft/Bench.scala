package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Streaming queries pay a fixed micro-batch startup cost (readStream →
    * AvailableNow → sink) that is invariant in data size; reporting them
    * inside one opaque total would hide batch-plan regressions behind
    * ~20 s of constant overhead. The bench reports both splits.
    */
  private def isStreaming(name: String): Boolean = name.contains("stream")

  private def jsonSafe(s: String): String =
    s.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warm-up: run EVERY query once untimed first — JIT, codegen caches,
    // parquet footers, broadcast threads, streaming micro-batch machinery.
    // Without this the first pass measures JVM warm-up (73→112 s swings on
    // identical code between rounds 1 and 2), not the plans.
    spark.range(1000000).selectExpr("sum(id)").collect()
    ordered.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
    }
    val results: Seq[(String, Either[String, Double])] = ordered.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val r = try {
          fn(spark, sfDir).count()
          Right((System.nanoTime() - t0) / 1e9)
        } catch {
          // a crashed query must fail LOUDLY (err field + nonzero exit),
          // never silently shrink the total the driver grades
          case e: Throwable => Left(jsonSafe(s"${e.getClass.getName}: ${e.getMessage}"))
        }
        name -> r
    }
    val ok = results.collect { case (n, Right(s)) => n -> s }
    val errs = results.collect { case (n, Left(e)) => n -> e }
    val total = ok.map(_._2).sum
    val streamingTotal = ok.collect { case (n, s) if isStreaming(n) => s }.sum
    val batchTotal = total - streamingTotal
    // The driver records the TAIL of the log (round-4 lesson: a summary
    // printed first was clipped away and the long line lost its head). So
    // the LAST line is the one that must parse: print the full JSON last,
    // rounded to ms so the whole line fits inside a ~3.5 kB tail window,
    // with a human-readable summary line above it as backup.
    def sec(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + sec(v) }.mkString("{", ",", "}")
    val es = errs.map { case (k, e) => "\"" + k + "\":\"" + e + "\"" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","batch_total":${sec(batchTotal)},"streaming_total":${sec(streamingTotal)},"n_queries":${ok.size},"n_err":${errs.size},"sf":"$sfDir"}""")
    spark.stop() // stop FIRST so no Spark shutdown logging prints after the JSON
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","batch_total":${sec(batchTotal)},"streaming_total":${sec(streamingTotal)},"sf":"$sfDir","errors":$es,"queries":$qs}""")
    if (errs.nonEmpty) sys.exit(1)
  }
}
