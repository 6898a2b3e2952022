package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The q10 DISTRIBUTED GLOBAL-ORDINAL recipe (range-partition +
  * in-partition sort + `zipWithIndex`) packaged for reuse — the 100 TB
  * replacement for any single-task global rank/ntile window (VERDICT
  * r10 #6/#7): every partition sorts ITS key range in parallel,
  * `zipWithIndex` adds per-partition offsets with one extra count job,
  * and no row ever funnels through one task at any data size. The
  * ordinal is deterministic whenever the order columns form a TOTAL
  * order (range boundaries can only split the order, never permute
  * equal rows — there are none). */
object DistributedRank {

  /** Appends a 1-based global rank column under `order` (which must be
    * a total order over `df`). */
  private[operators] def withGlobalRank(df: DataFrame, rankCol: String,
      order: Column*): DataFrame = {
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(indexed, schema)
  }

  /** Appends an INCLUSIVE running total of `valueCol` (LongType) under
    * `order` — the distributed PREFIX-SUM twin of [[withGlobalRank]]:
    * range-partition + in-partition sort, one small job collecting the
    * per-partition sums (#partitions values on the driver — bounded by
    * the cluster, not the data), then one pass adding each partition's
    * offset. No row ever crosses a single-task window; both jobs read
    * the same eagerly-checkpointed sorted frame. */
  private[graft] def withRunningTotal(df: DataFrame, valueCol: String,
      outCol: String, order: Column*): DataFrame =
    withRunningTotals(df, Seq(valueCol -> outCol), order: _*)

  /** Multi-column [[withRunningTotal]]: all prefix sums ride ONE
    * range-partition + sort + two jobs (the per-partition offset
    * vector is #partitions × #columns scalars on the driver). */
  private[graft] def withRunningTotals(df: DataFrame,
      valueOutCols: Seq[(String, String)], order: Column*): DataFrame = {
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    val valIdxs = valueOutCols.map(c => sorted.schema.fieldIndex(c._1))
    val k = valIdxs.length
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      val s = Array.fill(k)(0L)
      it.foreach { r =>
        var j = 0
        while (j < k) { s(j) += r.getLong(valIdxs(j)); j += 1 }
      }
      Iterator((i, s.toSeq))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(Seq.fill(k)(0L)) { (acc, s) =>
      acc.zip(s).map { case (a, b) => a + b }
    }
    val schema = StructType(sorted.schema.fields ++
      valueOutCols.map(c => StructField(c._2, LongType, nullable = false)))
    val indexed = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = offsets(i).toArray
      it.map { row =>
        var j = 0
        while (j < k) { acc(j) += row.getLong(valIdxs(j)); j += 1 }
        Row.fromSeq(row.toSeq ++ acc.toSeq)
      }
    }
    sorted.sparkSession.createDataFrame(indexed, schema)
  }

  /** Appends an EXCLUSIVE running max of `valueCol` (LongType) under
    * `order` — the value a `max(...) over (ORDER BY ... RANGE BETWEEN
    * UNBOUNDED PRECEDING AND -1)` frame yields on a table whose order
    * keys are UNIQUE (each row sees the max of all strictly-earlier
    * rows; the first row gets NULL). Same two-job shape as
    * [[withRunningTotal]]: per-partition maxes are #partitions scalars
    * on the driver, never data-sized. */
  private[graft] def withRunningMaxExclusive(df: DataFrame,
      valueCol: String, outCol: String, order: Column*): DataFrame = {
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    val valIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val partMaxes = rdd.mapPartitionsWithIndex { (i, it) =>
      var m = Option.empty[Long]
      it.foreach(r => m = Some(m.fold(r.getLong(valIdx))(
        math.max(_, r.getLong(valIdx)))))
      Iterator((i, m))
    }.collect().sortBy(_._1).map(_._2)
    // offsets(i) = max over partitions 0..i-1 (None when empty)
    val offsets = partMaxes.scanLeft(Option.empty[Long]) { (acc, m) =>
      (acc, m) match {
        case (Some(a), Some(b)) => Some(math.max(a, b))
        case (a, b) => a.orElse(b)
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = true))
    val indexed = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { row =>
        val out = acc.map(Long.box).orNull
        acc = Some(acc.fold(row.getLong(valIdx))(
          math.max(_, row.getLong(valIdx))))
        Row.fromSeq(row.toSeq :+ out)
      }
    }
    sorted.sparkSession.createDataFrame(indexed, schema)
  }

  /** EXACT `ntile(k)` (SQL size rule: with n rows the first n % k
    * tiles hold n/k + 1 rows) derived from [[withGlobalRank]] plus one
    * broadcast scalar count — bit-identical to the window `ntile` it
    * replaces, INT-typed like it, with no global window in the plan. */
  private[operators] def withNtile(df: DataFrame, k: Int, tileCol: String,
      order: Column*): DataFrame = {
    // localCheckpoint so the scalar count below reads the materialized
    // ranked frame instead of re-executing the repartitionByRange +
    // zipWithIndex lineage a second time (ADVICE r12) — the same
    // discipline withRunningTotals already applies
    val ranked = withGlobalRank(df, "__rank", order: _*).localCheckpoint()
    ranked
      .crossJoin(broadcast(ranked.agg(count(lit(1)).as("__n"))))
      .withColumn("__q", expr(s"__n div $k"))
      .withColumn("__cut", (col("__n") % k) * (col("__q") + 1L))
      .withColumn(tileCol,
        when(col("__rank") <= col("__cut"),
          expr("(__rank - 1) div (__q + 1) + 1"))
          .otherwise(expr(
            "__n % " + k + " + (__rank - __cut - 1) div " +
              "greatest(__q, 1L) + 1"))
          .cast("int"))
      .drop("__rank", "__n", "__q", "__cut")
  }
}
