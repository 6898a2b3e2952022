package graft

/** Dev tool: measure IVF / IVF+PQ recall as a function of probe width,
  * at every local SF plus the pseudo-sf1 10x copy (`ScaleSmoke build`).
  * This is the evidence behind the capped logarithmic nprobe policy
  * (`AnnIndex.ivfNprobe`) — the recall-vs-probe-fraction curve is
  * recorded in docs/SCALE.md, and the operating points are chosen to
  * clear the q52/q114 contract floors with margin at every tested
  * scale.
  *
  * Usage: runMain graft.ProbeSweep [sfDir ...]
  */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val spark = DevSession.make()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{AnnIndex, AnnRetrieval, Similarity}
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/tmp/graft_sfx1")
    for (dir <- dirs if new java.io.File(dir).isDirectory) {
      val truth = Similarity.q36AnnBruteTopK(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val byQ = truth.groupBy(_._1)
      def avgRecall(rows: Array[org.apache.spark.sql.Row]): Double = {
        val approx = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
        val rs = byQ.map { case (_, t) =>
          t.count(approx.contains).toDouble / t.length }
        rs.sum / rs.size
      }
      val nCells = AnnIndex.ivfCellCount(spark, dir)
      val widths = (Seq(4, 6, 8, 10, 12, 14, 17, 21, 25, 30)
        .filter(_ <= nCells) :+ nCells.toInt).distinct.sorted
      println(s"[sweep] $dir cells=$nCells")
      for (np <- widths) {
        val rIvf = avgRecall(
          AnnIndex.ivfTopK(spark, dir, Some(np)).collect())
        val rPq = avgRecall(
          AnnIndex.ivfPqTopK(spark, dir, Some(np)).collect())
        println(f"[sweep] $dir nprobe=$np%3d frac=${np.toDouble / nCells}%.2f " +
          f"ivf_avg=$rIvf%.3f ivfpq_avg=$rPq%.3f")
      }
    }
    spark.stop()
  }
}
