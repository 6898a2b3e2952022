package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Streams

case class ArrEv(ts: Timestamp, event_type: String)

/** q212's streaming twin (VERDICT r09 #8): the batch lateness audit
  * measures each event's delay behind the running event-time maximum in
  * arrival order — exactly the quantity a Structured Streaming
  * watermark bounds. This spec replays the events table through a
  * watermarked hourly aggregation in MemoryStream micro-batches and
  * proves the correspondence both ways:
  *
  *  - with delay > the batch profile's max lateness, the stream drops
  *    NOTHING (the batch max IS the lossless watermark delay);
  *  - with a tight delay, the surviving counts equal an independent
  *    replay of the published watermark rule (watermark = global max
  *    event time so far minus delay, advanced between micro-batches;
  *    a row is dropped iff its hour window closed at or before the
  *    current watermark), every dropped row has batch-profile lateness
  *    exceeding the delay, and at least one row is genuinely dropped.
  *
  * The driver's events fixture arrives exactly in event-time order
  * (q212 measures all-zero lateness on it), so the replay uses a
  * deterministic local shuffle of the arrival sequence to manufacture
  * late rows — the batch profile is recomputed for that same order, so
  * the parity claim is unchanged. */
class StreamingLatenessSpec extends SparkTestBase {

  private val HourUs = 3600L * 1000000L

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** Deterministically perturbed arrival order of the sf events. */
  private def arrivals(): Seq[(String, Timestamp)] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .sortBy { case (id, _, _) => (id + (id % 7) * 40, id) }
      .map { case (_, typ, ts) => (typ, ts) }
      .toSeq

  /** Batch lateness per arrival position: running event-time max (in
    * arrival order) minus the event's own time — q212's formula at the
    * single-shard grain. */
  private def batchLatenessUs(arr: Seq[(String, Timestamp)]): Seq[Long] = {
    var maxUs = Long.MinValue
    arr.map { case (_, ts) =>
      val us = micros(ts)
      maxUs = math.max(maxUs, us)
      maxUs - us
    }
  }

  /** Replay of the engine's watermark rule over explicit micro-batches:
    * returns (survivor counts per (window-start-us, type), dropped row
    * arrival indices). */
  private def simulate(batches: Seq[Seq[(String, Timestamp)]],
      delaySeconds: Long): (Map[(Long, String), Long], Seq[Int]) = {
    val delayMs = delaySeconds * 1000L
    var wmMs = 0L
    val counts = mutable.Map.empty[(Long, String), Long]
    val dropped = mutable.ArrayBuffer.empty[Int]
    var idx = 0
    for (b <- batches) {
      var batchMaxUs = Long.MinValue
      for ((typ, ts) <- b) {
        val us = micros(ts)
        batchMaxUs = math.max(batchMaxUs, us)
        val winStart = Math.floorDiv(us, HourUs) * HourUs
        if (winStart + HourUs <= wmMs * 1000L) dropped += idx
        else {
          val k = (winStart, typ)
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
        idx += 1
      }
      if (batchMaxUs != Long.MinValue)
        wmMs = math.max(wmMs, batchMaxUs / 1000L - delayMs)
    }
    (counts.toMap, dropped.toSeq)
  }

  /** Run the streaming twin over the batches; returns final counts per
    * (window-start-us, type). Update mode: counts per key only grow, so
    * the final value is the max over emitted updates. */
  private def runStream(batches: Seq[Seq[(String, Timestamp)]],
      delaySeconds: Long, name: String): Map[(Long, String), Long] = {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val input = MemoryStream[ArrEv]
    val q = Streams.latenessWindowCounts(input.toDF(), delaySeconds)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b =>
        input.addData(b.map { case (typ, ts) => ArrEv(ts, typ) })
        q.processAllAvailable()
      }
      sess.table(name).collect()
        .map(r => (micros(r.getTimestamp(0)), r.getString(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    } finally q.stop()
  }

  test("lossless at the batch profile's max lateness; exact " +
      "dropped-row parity with the watermark replay at a tight delay") {
    val arr = arrivals()
    assert(arr.size >= 500)
    val batches = arr.grouped(100).toSeq
    val lateUs = batchLatenessUs(arr)
    val maxLateS = lateUs.max / 1000000L
    assert(lateUs.count(_ > 0) > 50,
      s"perturbed order should manufacture late rows (got ${lateUs.count(_ > 0)})")

    // direction 1: delay = batch max lateness + slack -> nothing drops
    val lossless = runStream(batches, maxLateS + 2, "lat_lossless")
    assert(lossless.values.sum == arr.size.toLong,
      s"expected lossless at delay ${maxLateS + 2}s, " +
        s"kept ${lossless.values.sum} of ${arr.size}")

    // direction 2: tight delay -> drops happen and match the replay
    val tightS = math.max(1L, maxLateS / 8)
    val (simCounts, simDropped) = simulate(batches, tightS)
    assert(simDropped.nonEmpty, "tight delay should drop rows")
    val streamed = runStream(batches, tightS, "lat_tight")
    assert(streamed == simCounts,
      s"streamed counts diverge from the watermark replay " +
        s"(streamed ${streamed.values.sum}, replay ${simCounts.values.sum})")
    // every dropped row was measurably late in the BATCH profile, by
    // more than the configured delay (the audit predicts the drops)
    simDropped.foreach { i =>
      assert(lateUs(i) > tightS * 1000000L,
        s"dropped row $i had batch lateness ${lateUs(i)}us <= ${tightS}s")
    }
  }
}
