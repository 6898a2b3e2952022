package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Breadth11
import graft.streaming.Streams

/** Streaming twin of the q382 changepoint's input profile (the
  * q375/q380 twin playbook): the same events fed ONE CALENDAR DAY PER
  * MICRO-BATCH through `mapGroupsWithState` must hold per-(type, day)
  * running counts BIT-EXACTLY equal to the batch daily-count profile
  * after every batch, and the gain argmax read off the FINAL state
  * must reproduce the registered q382 rows (split day, means, gain) —
  * proving the batch changepoint is incrementally maintainable: the
  * corpus fold is the state; the argmax is a profile-sized recompute. */
class StreamingChangepointSpec extends SparkTestBase {

  test("mapGroupsWithState daily-count state equals the batch profile " +
      "per batch and the final-state argmax reproduces q382") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"),
        to_date(col("ts")).cast("string").as("day"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byDay = rows.groupBy(_._2).toSeq.sortBy(_._1)

    val input = MemoryStream[(String, String)]
    val q = Streams.runningDailyCounts(
        input.toDF().toDF("event_type", "day"))
      .toDF("event_type", "day", "n")
      .writeStream.format("memory").queryName("cpt_t")
      .outputMode("update").start()
    try {
      val state = scala.collection.mutable.Map.empty[(String, String), Long]
      byDay.foreach { case (day, dayRows) =>
        input.addData(dayRows.toIndexedSeq)
        q.processAllAvailable()
        sess.table("cpt_t").collect().foreach { r =>
          val k = (r.getString(0), r.getString(1))
          state(k) = math.max(state.getOrElse(k, 0L), r.getLong(2))
        }
        // prefix parity: state == the batch profile over days <= day
        val expect = rows.filter(_._2 <= day)
          .groupBy(identity).view.mapValues(_.length.toLong).toMap
        assert(state.toMap == expect, s"state parity after $day")
      }
      // final-state argmax == the registered q382 rows
      val got = Breadth11.q382Changepoint(spark, sf).collect()
      val byType = state.toSeq.groupBy(_._1._1).view
        .mapValues(_.sortBy(_._1._2).map(_._2)).toMap
      assert(got.length == byType.size)
      got.foreach { r =>
        val tpe = r.getString(0)
        val xs = byType(tpe)
        val n = xs.length
        val s = xs.sum
        // relative-gain argmax (gain/SSE_total) — mirrors the
        // registered q382 (round 14, ADVICE r13 bounded argmax)
        val sse = xs.map(x => BigInt(x) * x).sum.toDouble -
          s.toDouble * s / n
        val gains = (1 until n).map { k =>
          val sl = xs.take(k).sum
          val g = sl.toDouble * sl / k +
            (s - sl).toDouble * (s - sl) / (n - k) - s.toDouble * s / n
          (k, if (sse > 0) math.round(g / sse * 1e6) else 0L, g)
        }
        val (bestK, _, bestG) =
          gains.minBy { case (k, gu, _) => (-gu, k) }
        val days = state.keys.filter(_._1 == tpe).map(_._2).toSeq.sorted
        assert(r.getLong(1) == n, s"$tpe n_days")
        assert(r.getDate(2).toString == days(bestK - 1), s"$tpe split")
        assert(math.abs(r.getDouble(5) - bestG) < 1e-6, s"$tpe gain")
      }
    } finally q.stop()
  }
}
