package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnnIncremental, AnnIndex, AnnRetrieval, Breadth, Breadth2, Breadth3, Breadth4, Breadth5, Breadth6, Breadth7, Breadth8, Breadth9, Breadth10, Breadth11, Curation, Curation2, CurationHardening, Dedup, DedupClusters, DedupEmbedding, Drift, Expectations, Multimodal, Graph, Graph2, Materialize, Relational, Similarity, SketchAlgebra, Skew, StorageLayout, TextEncode, TextOps, TimeSeries, TimeSeries2, TrainingPipeline, XmlShred}
import graft.operators.{Affinity, Audit, Calibration, Contribution, Coreset, CrossCorr, Cuped, Evaluation, Evaluation2, ExactSubstr, Experiment, FeaturePrep, Governance, Graph3, Hierarchy, InfoTheory, InvertedIndex, Keyphrase, Lifecycle, Linkage, MaxCover, Mmr, Pca, SessionState, TextProfile, Vocabulary}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Central registry: each operator module contributes a `queries` map
  * (name -> (SparkSession, sfDir) => DataFrame) and an `oracles` map
  * (name -> equivalent DuckDB SQL over the same parquet tables). Every
  * query orders its output totally and rounds money to cents so the
  * driver's hash compare is deterministic (SURVEY.md §5.2).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q07Top5Reps(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Breadth.queries ++ Breadth2.queries ++
      Breadth3.queries ++ Breadth4.queries ++ Breadth5.queries ++ Breadth6.queries ++ Breadth7.queries ++ Breadth8.queries ++ Breadth9.queries ++ Breadth10.queries ++ Breadth11.queries ++
      Dedup.queries ++ DedupEmbedding.queries ++ DedupClusters.queries ++
      TextOps.queries ++ TextEncode.queries ++ Similarity.queries ++ AnnIndex.queries ++
      AnnRetrieval.queries ++ AnnIncremental.queries ++
      Multimodal.queries ++ Streams.queries ++ XmlShred.queries ++
      TrainingPipeline.queries ++ Materialize.queries ++ Curation.queries ++ Curation2.queries ++ CurationHardening.queries ++ SketchAlgebra.queries ++ Skew.queries ++
      StorageLayout.queries ++ Graph.queries ++ Graph2.queries ++ Drift.queries ++ TimeSeries.queries ++ TimeSeries2.queries ++ InvertedIndex.queries ++ Governance.queries ++ Hierarchy.queries ++ Pca.queries ++ MaxCover.queries ++ Experiment.queries ++ SessionState.queries ++ Cuped.queries ++ Calibration.queries ++ Expectations.queries ++ Audit.queries ++ Affinity.queries ++ Lifecycle.queries ++ Contribution.queries ++ FeaturePrep.queries ++ Linkage.queries ++ ExactSubstr.queries ++ Evaluation.queries ++ Evaluation2.queries ++ CrossCorr.queries ++ Mmr.queries ++ Vocabulary.queries ++ InfoTheory.queries ++ Coreset.queries ++ Graph3.queries ++ Keyphrase.queries ++ TextProfile.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Breadth.oracles ++ Breadth2.oracles ++
      Breadth3.oracles ++ Breadth4.oracles ++ Breadth5.oracles ++ Breadth6.oracles ++ Breadth7.oracles ++ Breadth8.oracles ++ Breadth9.oracles ++ Breadth10.oracles ++ Breadth11.oracles ++
      Dedup.oracles ++ DedupEmbedding.oracles ++ DedupClusters.oracles ++
      TextOps.oracles ++ TextEncode.oracles ++ Similarity.oracles ++ AnnIndex.oracles ++
      AnnRetrieval.oracles ++ AnnIncremental.oracles ++
      Multimodal.oracles ++ Streams.oracles ++ XmlShred.oracles ++
      TrainingPipeline.oracles ++ Materialize.oracles ++ Curation.oracles ++ Curation2.oracles ++ CurationHardening.oracles ++ SketchAlgebra.oracles ++ Skew.oracles ++
      StorageLayout.oracles ++ Graph.oracles ++ Graph2.oracles ++ Drift.oracles ++ TimeSeries.oracles ++ TimeSeries2.oracles ++ InvertedIndex.oracles ++ Governance.oracles ++ Hierarchy.oracles ++ Pca.oracles ++ MaxCover.oracles ++ Experiment.oracles ++ SessionState.oracles ++ Cuped.oracles ++ Calibration.oracles ++ Expectations.oracles ++ Audit.oracles ++ Affinity.oracles ++ Lifecycle.oracles ++ Contribution.oracles ++ FeaturePrep.oracles ++ Linkage.oracles ++ ExactSubstr.oracles ++ Evaluation.oracles ++ Evaluation2.oracles ++ CrossCorr.oracles ++ Mmr.oracles ++ Vocabulary.oracles ++ InfoTheory.oracles ++ Coreset.oracles ++ Graph3.oracles ++ Keyphrase.oracles ++ TextProfile.oracles
}
