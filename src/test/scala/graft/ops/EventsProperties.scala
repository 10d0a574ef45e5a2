package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Events.sessionize vs a naive per-user fold over random timelines. */
object EventsProperties extends Properties("Events") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val GapMin = 30

  private val rowGen = for {
    user <- Gen.choose(1L, 3L)
    // minutes offsets spanning several gap windows
    tMin <- Gen.choose(0L, 300L)
  } yield (user, tMin)

  private val timelineGen: Gen[Seq[(Long, Long, Long)]] =
    Gen.listOfN(20, rowGen).map(_.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) })

  property("matchesNaiveGapFold") = Prop.forAll(timelineGen) { rows =>
    import spark.implicits._
    val df = rows.toDF("event_id", "user_id", "t_min")
      .withColumn("ts", timestamp_seconds(col("t_min") * 60))
      .withColumn("value", lit(1.0))
    val got = Events.sessionize(df, "user_id", "ts", GapMin, "event_id")
      .select("event_id", "session_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: per user, sort by (t, event_id), new session when gap > 30min
    rows.groupBy(_._2).forall { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._1))
      var sid   = 0L
      var last  = Long.MinValue
      sorted.forall { case (id, _, t) =>
        if (last == Long.MinValue || (t - last) > GapMin) sid += 1
        last = t
        got(id) == sid
      }
    }
  }
}
