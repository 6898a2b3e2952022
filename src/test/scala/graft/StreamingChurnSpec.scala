package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streams
import graft.sources.Tables

/** Streaming twin of q302's churn-label construction: the SAME events
  * fed through `mapGroupsWithState` in three time-ordered
  * micro-batches, counting per-user activity on each side of the
  * frozen midpoint, must end in state EQUAL to the batch per-user
  * (n1, n2) profile — and therefore to the batch churn labels. The
  * q166/StreamingSurprisal equivalence discipline applied to the
  * label builder. */
class StreamingChurnSpec extends SparkTestBase {

  case class CEv(user_id: Long, us: Long)

  test("mapGroupsWithState churn counters equal the batch profile " +
      "after the last micro-batch") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => CEv(r.getLong(0), r.getLong(1)))
      .sortBy(_.us)
    val cut = (evs.map(_.us).min + evs.map(_.us).max) / 2
    val input = MemoryStream[CEv]
    val q = Streams.runningChurn(input.toDF(), cut)
      .toDF("user_id", "n1", "n2")
      .writeStream.format("memory").queryName("churn_t")
      .outputMode("update").start()
    try {
      val third = evs.length / 3
      input.addData(evs.take(third).toIndexedSeq)
      q.processAllAvailable()
      input.addData(evs.slice(third, 2 * third).toIndexedSeq)
      q.processAllAvailable()
      input.addData(evs.drop(2 * third).toIndexedSeq)
      q.processAllAvailable()
      // last emitted row per user = final state (counters are monotone)
      val streamed = sess.table("churn_t")
        .groupBy("user_id")
        .agg(max(struct(col("n1") + col("n2"), col("n1"), col("n2")))
          .as("m"))
        .select(col("user_id"), col("m.n1"), col("m.n2"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = evs.groupBy(_.user_id).map { case (u, xs) =>
        u -> (xs.count(_.us < cut).toLong, xs.count(_.us >= cut).toLong)
      }
      assert(streamed == batch, "streamed state != batch profile")
      // the derived labels agree too: churned = active h1, silent h2
      val churnedStream = streamed.filter { case (_, (n1, n2)) =>
        n1 > 0 && n2 == 0 }.keySet
      val churnedBatch = batch.filter { case (_, (n1, n2)) =>
        n1 > 0 && n2 == 0 }.keySet
      assert(churnedStream == churnedBatch)
    } finally q.stop()
  }
}
