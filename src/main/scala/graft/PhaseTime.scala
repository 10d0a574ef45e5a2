package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the composite pipelines (guide §1: measure
  * first): runs `Prep.corpusPipeline` / `Prep.prepPipeline` on the bench
  * fixtures with a timing phase callback and prints seconds attributed to
  * each stage. Attribution is exact for stages that materialize eagerly
  * (every stage of corpusPipeline checkpoints); lazy tails land in the
  * final stage. Usage: `runMain graft.PhaseTime [sfdir]`.
  */
object PhaseTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = Tables.documents(spark, sfDir)

    def timeStages(label: String)(run: (String => Unit) => Unit): Unit = {
      val marks = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      def mark(s: String): Unit = marks += s -> System.nanoTime()
      mark("start")
      run(mark)
      mark("end")
      println(s"== $label")
      marks.toSeq.sliding(2).foreach {
        case Seq((a: String, t0: Long), (_, t1: Long)) =>
          println(f"  ${(t1 - t0) / 1e9}%7.3f  $a")
        case _ => ()
      }
      val total = (marks.last._2 - marks.head._2) / 1e9
      println(f"  $total%7.3f  TOTAL")
    }

    // warm-up pass (JIT, parquet footers) — same discipline as Bench
    graft.ops.Prep.corpusPipeline(
      all.filter(col("doc_id") % 10 === 0),
      all.filter(col("doc_id") % 97 === 0), "doc_id", "text").count()

    timeStages("corpusPipeline (pipeline_end_to_end fixture)") { mark =>
      graft.ops.Prep.corpusPipeline(
        all.filter(col("doc_id") % 10 === 0),
        all.filter(col("doc_id") % 97 === 0), "doc_id", "text",
        phase = s => mark(s)).count()
    }

    graft.ops.Prep.prepPipeline(
      all.filter(col("doc_id") % 97 =!= 0), all.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", 30, 0.08, 3.8, 5.2, 0.02, 8, 3, 2L, 8).count()
    timeStages("prepPipeline (prep_pipeline fixture, no stage hooks — total only)") { _ =>
      graft.ops.Prep.prepPipeline(
        all.filter(col("doc_id") % 97 =!= 0), all.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", 30, 0.08, 3.8, 5.2, 0.02, 8, 3, 2L, 8).count()
    }
    spark.stop()
  }
}
