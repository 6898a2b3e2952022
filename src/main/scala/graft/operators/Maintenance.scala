package graft.operators

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] table-maintenance operators a 100 TB lake runs nightly:
  * small-file compaction and retention-policy partition expiry. Neither
  * is a query — both rewrite/remove STORAGE while provably preserving
  * (a subset of) the data — so they are contract-tested in
  * MaintenanceSpec rather than oracle-hashed.
  *
  * Design notes for the cluster deployment:
  *   - Compaction sizes output by BYTES, not file count: the streaming
  *     upsert sink (Streams.upsertBatch), incremental ingest (q102,
  *     q127) and every foreachBatch writer accrete files per batch;
  *     scan cost at 100 TB is dominated by file-open overhead and
  *     row-group fragmentation once file count explodes. Target-size
  *     bin packing (repartition to ceil(bytes/target)) restores scan
  *     efficiency; correctness = exact multiset equality, checked by
  *     a sort-free content fingerprint.
  *   - Expiry deletes whole partition DIRECTORIES selected by the
  *     partition VALUE in the path — a metadata operation that never
  *     opens a data file. TTL-deleting via `DELETE WHERE day < cutoff`
  *     on an unpartitioned table would scan and rewrite 100 TB; on a
  *     day-partitioned layout it is O(#expired-dirs) filesystem calls.
  */
object Maintenance {

  /** Audit row produced by the maintenance ops. */
  final case class MaintenanceReport(
      filesBefore: Long, filesAfter: Long,
      bytesBefore: Long, bytesAfter: Long,
      rowsBefore: Long, rowsAfter: Long)

  private def dataFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  /** Compact a parquet table directory to ~`targetBytes` files: read,
    * repartition to ceil(totalBytes/target) (round-robin — balanced
    * output regardless of input skew), rewrite atomically into
    * `outPath`. Returns the before/after audit. The rewrite goes to a
    * NEW directory + atomic move of the default-FS pointer semantics a
    * real lake gets from its table format; compacting in place would
    * lose the table on a mid-rewrite crash. */
  def compact(spark: SparkSession, tablePath: String, outPath: String,
      targetBytes: Long): MaintenanceReport = {
    require(targetBytes > 0, "targetBytes must be positive")
    val src = Paths.get(tablePath)
    val before = dataFiles(src)
    val bytesBefore = before.map(Files.size).sum
    val nOut = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(tablePath)
    val rowsBefore = df.count()
    df.repartition(nOut).write.mode("overwrite").parquet(outPath)
    val after = dataFiles(Paths.get(outPath))
    MaintenanceReport(
      before.size.toLong, after.size.toLong,
      bytesBefore, after.map(Files.size).sum,
      rowsBefore, spark.read.parquet(outPath).count())
  }

  /** Order-free content fingerprint of a frame: per-row md5 over the
    * canonical string form, XOR-folded 60 bits at a time. Equal
    * multisets => equal fingerprints regardless of row order or file
    * layout — the compaction invariant checker. (XOR is a weak
    * accumulator for adversarial inputs but exact for this audit: a
    * compaction bug loses/duplicates rows, it does not forge pairs.) */
  def contentFingerprint(df: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    val cols = df.columns.sorted.map(col)
    df.select(conv(substring(md5(concat_ws("",
        cols.map(_.cast("string")): _*)), 1, 15), 16, 10).cast("long").as("h"))
      .agg(expr("bit_xor(h)").as("f"))
      .collect().head.getLong(0)
  }

  /** Expire partitions of a `partitionBy(partCol)` parquet layout whose
    * integer partition value is < `cutoff`: directory deletes selected
    * by PATH, no data file opened. Returns (expired dirs, kept dirs). */
  def expirePartitions(tablePath: String, partCol: String,
      cutoff: Long): (Seq[Long], Seq[Long]) = {
    val root = Paths.get(tablePath)
    val partDirs = Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(s"$partCol="))
      .toSeq
    val parsed = partDirs.map { p =>
      val v = p.getFileName.toString.stripPrefix(s"$partCol=").toLong
      (v, p)
    }
    val (expired, kept) = parsed.partition(_._1 < cutoff)
    expired.foreach { case (_, p) =>
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    (expired.map(_._1).sorted, kept.map(_._1).sorted)
  }
}
