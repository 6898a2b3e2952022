package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TimeSeries2
import graft.streaming.Streams

/** Streaming twin of the q252 CUSUM monitor (VERDICT r10 stretch #8):
  * the SAME daily series, fed through `mapGroupsWithState` in three
  * day-ordered micro-batches under the frozen per-type baseline, must
  * end in per-type (last day, S, alarm count) state EQUAL to the batch
  * q252 fold — bit-for-bit, because μ0/k/h and every term are exact
  * micro-unit integers and the recursion max(0, S + x − μ0 − k) is
  * provably the closed form P_t − min(0, min_{j≤t} P_j) the batch
  * query computes. The q244/q302 equivalence discipline applied to
  * the monitoring operator. */
class StreamingCusumSpec extends SparkTestBase {

  case class DRow(event_type: String, day: Long, n: Long)

  test("mapGroupsWithState running CUSUM equals the batch q252 fold " +
      "after the last micro-batch") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val batch = TimeSeries2.q252Cusum(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // frozen tuning snapshot: per-type μ0 re-derived exactly as the
    // batch query derives it (first-half mean, micro-rounded once)
    val daily = batch.map(t => DRow(t._1, t._2, t._3))
      .sortBy(d => (d.day, d.event_type))
    val mid = {
      val days = daily.map(_.day)
      (days.min + days.max) / 2
    }
    val mu = daily.filter(_.day <= mid).groupBy(_.event_type)
      .map { case (t, rows) =>
        val s = rows.map(_.n).sum
        // mirror Spark's round(): BigDecimal.valueOf (shortest repr)
        // then HALF_UP, never new BigDecimal(double)
        t -> BigDecimal(java.math.BigDecimal.valueOf(
            s.toDouble * 1e6 / rows.size))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    val input = MemoryStream[DRow]
    val q = Streams.runningCusum(input.toDF(), mu)
      .toDF("event_type", "last_day", "s_micro", "alarms")
      .writeStream.format("memory").queryName("cusum_t")
      .outputMode("update").start()
    try {
      // three day-ordered micro-batches (a daily-rollup replay)
      val third = daily.length / 3
      input.addData(daily.take(third).toIndexedSeq)
      q.processAllAvailable()
      input.addData(daily.slice(third, 2 * third).toIndexedSeq)
      q.processAllAvailable()
      input.addData(daily.drop(2 * third).toIndexedSeq)
      q.processAllAvailable()
      val streamed = sess.table("cusum_t")
        .groupBy("event_type")
        .agg(max(struct(col("last_day"), col("s_micro"), col("alarms")))
          .as("m"))
        .select(col("event_type"), col("m.last_day"), col("m.s_micro"),
          col("m.alarms"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // expected: the batch q252 rows per type — final S at the last
      // day, alarms = count of alarm=true days
      val expected = batch.groupBy(_._1).map { case (t, rows) =>
        val last = rows.maxBy(_._2)
        t -> (last._2, last._4, rows.count(_._5).toLong)
      }
      expected.foreach { case (t, exp) =>
        assert(streamed(t) == exp, s"type $t diverged")
      }
      assert(streamed.keySet == expected.keySet)
    } finally q.stop()
  }
}
