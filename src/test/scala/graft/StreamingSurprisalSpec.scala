package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.InfoTheory
import graft.streaming.Streams
import graft.sources.Tables

/** Streaming twin of the q241/q244 surprisal scorer: the SAME events,
  * fed through `mapGroupsWithState` in three time-ordered
  * micro-batches under the frozen trained model, must end in per-user
  * (count, exact micro-bit sum) state EQUAL to the batch q244 fold —
  * bit-for-bit, because the model constants are integers. This is the
  * q166/SessionRestart equivalence discipline applied to the scoring
  * operator. */
class StreamingSurprisalSpec extends SparkTestBase {

  case class SEv(user_id: Long, us: Long, event_id: Long,
      event_type: String)

  test("mapGroupsWithState running surprisal equals the batch fold " +
      "after the last micro-batch") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => SEv(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .sortBy(e => (e.us, e.event_id))
    // frozen model: the full-stream trained snapshot, as exact
    // micro-bit constants
    val model = InfoTheory.surprisalModel(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val input = MemoryStream[SEv]
    val q = Streams.runningSurprisal(input.toDF(), model)
      .toDF("user_id", "n_trans", "s_sum")
      .writeStream.format("memory").queryName("surp_t")
      .outputMode("update").start()
    try {
      // three time-ordered micro-batches (a nightly-refresh replay)
      val third = evs.length / 3
      input.addData(evs.take(third).toIndexedSeq)
      q.processAllAvailable()
      input.addData(evs.slice(third, 2 * third).toIndexedSeq)
      q.processAllAvailable()
      input.addData(evs.drop(2 * third).toIndexedSeq)
      q.processAllAvailable()
      // last emitted row per user = final state (n is monotone)
      val streamed = sess.table("surp_t")
        .groupBy("user_id")
        .agg(max(struct(col("n_trans"), col("s_sum"))).as("m"))
        .select(col("user_id"), col("m.n_trans"), col("m.s_sum"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // batch fold: the q241/q244 shape over the same model
      val expected = evs.groupBy(_.user_id).map { case (u, rows) =>
        val ordered = rows.sortBy(e => (e.us, e.event_id))
          .map(_.event_type)
        val trans = ordered.zip(ordered.drop(1))
        u -> (trans.length.toLong, trans.map(model).sum)
      }
      expected.foreach { case (u, exp) =>
        assert(streamed(u) == exp, s"user $u diverged")
      }
      assert(streamed.keySet == expected.keySet)
    } finally q.stop()
  }
}
