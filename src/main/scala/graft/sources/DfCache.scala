package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache for persisted intermediate DataFrames (the
  * materialized aggregate facts of Relational, the shared shingle table
  * of Dedup, the LSH plane dimension of Similarity).
  *
  * Keyed by `spark.sessionUUID` — stable and collision-free, unlike an
  * identityHashCode which can be reused after GC and would pin plans of
  * stopped sessions forever (ADVICE.md r01). Eviction: automatic when
  * the application (SparkContext) ends; Spark exposes no session-close
  * hook, so a long-lived context hosting many short-lived sessions
  * should call [[clear]] when done with a session — entries of a
  * stopped session are inert but stay registered until then.
  */
private[graft] object DfCache {

  private val dfs = TrieMap.empty[(String, String), DataFrame]
  private val vals = TrieMap.empty[(String, String), Any]
  private val hooked = TrieMap.empty[String, Boolean]

  // builds run under a lock: TrieMap.getOrElseUpdate is atomic for the
  // INSERT but not the builder, so two concurrent callers could both
  // build+persist and one persisted frame would leak unreferenced
  private val buildLock = new Object

  /** Build-once-per-(session, key) persisted DataFrame (thread-safe:
    * concurrent queries sharing an intermediate get one build). */
  def df(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val sid = org.apache.spark.sql.graft.SessionIds.uuid(spark)
    hookEviction(spark, sid)
    dfs.get((sid, key)) match {
      case Some(cached) => cached
      case None => buildLock.synchronized {
        dfs.getOrElseUpdate((sid, key),
          build.persist(StorageLevel.MEMORY_AND_DISK))
      }
    }
  }

  /** Build-once-per-(session, key) plain value (e.g. a probed dimension). */
  def value[T](spark: SparkSession, key: String)(build: => T): T = {
    val sid = org.apache.spark.sql.graft.SessionIds.uuid(spark)
    hookEviction(spark, sid)
    vals.get((sid, key)) match {
      case Some(cached) => cached.asInstanceOf[T]
      case None => buildLock.synchronized {
        vals.getOrElseUpdate((sid, key), build).asInstanceOf[T]
      }
    }
  }

  /** Unpersist and drop every entry for this session (used by Bench to
    * make repeated timed runs pay the full build cost each time). */
  def clear(spark: SparkSession): Unit = {
    val sid = org.apache.spark.sql.graft.SessionIds.uuid(spark)
    dfs.keys.filter(_._1 == sid).foreach { k =>
      dfs.remove(k).foreach(_.unpersist(blocking = false))
    }
    vals.keys.filter(_._1 == sid).foreach(vals.remove)
  }

  private def hookEviction(spark: SparkSession, sid: String): Unit =
    if (hooked.putIfAbsent(sid, true).isEmpty) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit = {
          dfs.keys.filter(_._1 == sid).foreach(dfs.remove)
          vals.keys.filter(_._1 == sid).foreach(vals.remove)
          hooked.remove(sid)
        }
      })
    }
}
