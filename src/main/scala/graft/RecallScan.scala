package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: per-qid ANN recall@10 for LSH and IVF at each SF dir. */
object RecallScan {
  def main(args: Array[String]): Unit = {
    val spark = DevSession.make()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{AnnIndex, AnnRetrieval, Similarity}
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val truth = Similarity.q36AnnBruteTopK(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      for ((label, rows) <- Seq(
          "lsh" -> Similarity.lshTopK(spark, dir).collect(),
          "ivf" -> AnnIndex.ivfTopK(spark, dir).collect(),
          "pq" -> AnnIndex.pqTopK(spark, dir).collect(),
          "ivfpq" -> AnnIndex.ivfPqTopK(spark, dir).collect(),
          "trunc" -> AnnRetrieval.truncatedTopK(spark, dir).collect())) {
        val approx = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
        val recalls = truth.groupBy(_._1).map { case (qid, t) =>
          qid -> t.count(approx.contains).toDouble / t.length
        }
        val rs = recalls.values
        println(f"[recall] $sf $label nq=${recalls.size} " +
          f"min=${rs.min}%.2f avg=${rs.sum / rs.size}%.2f")
      }
    }
    spark.stop()
  }
}
