package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit}

/** Incremental maintenance of a materialized aggregate table —
  * rollup-on-ingest. Each arriving batch is folded into a persisted
  * per-key aggregate with ONE partial aggregation over the batch and
  * a key-scoped merge against only the partitions the batch touches;
  * the raw history is never rescanned.
  *
  * The 100 TB shape: a per-(day, dimension) rollup over an append-
  * mostly event stream. Refreshing it by re-running `GROUP BY` over
  * the raw table is an O(history) scan per refresh; maintaining it
  * incrementally is O(batch) — the batch collapses to its partial
  * aggregate (map-side combine, |keys-in-batch| rows), and the merge
  * re-aggregates that partial against the CURRENT rows of only the
  * touched partitions (a few days' worth of key rows, not the
  * table). This is exactly the mergeable-summaries discipline the
  * sketch family (q35/q112/q117/q119/q121) uses, specialized to the
  * algebraic aggregates: partials combine associatively, so any
  * merge tree — per-batch, per-partition, per-epoch — yields the
  * same table as one global aggregation over the union of all
  * batches ever ingested. `IncrementalAggSpec` pins that identity;
  * q141 replays it against the DuckDB oracle.
  *
  * Measure algebra: COUNT and SUM merge by addition, MIN/MAX by
  * comparison. AVG is intentionally absent as a stored measure — it
  * is not mergeable; derive it on read from (sum, count) (one exact
  * division, [[withDerived]]). COUNT DISTINCT is not algebraically
  * mergeable from scalars, but IS mergeable as a sketch: the
  * [[thetaDistinct]] measure stores a serialized theta sketch per
  * key ([[graft.functions.ThetaSketchAgg]] over the batch,
  * [[graft.functions.ThetaUnionAgg]] at every merge), exact below k
  * retained entries and set-algebra-capable beyond (the q121
  * family) — so "distinct users per day" maintains incrementally in
  * the same table as the counts.
  *
  * Sums accumulate in exact integer domains: callers scale doubles
  * to micro/milli longs at the mouth (the q125 convention) so
  * partial-aggregation order can never change a stored value and
  * the DuckDB oracle replays bit-for-bit.
  *
  * Streaming twin: [[graft.streaming.RollupStream]] folds each
  * micro-batch through [[updateTable]] with batch-id replay markers
  * (the fold is additive, so redelivery idempotence must be imposed,
  * not assumed).
  */
object IncrementalAgg {

  /** A mergeable measure: `agg` ∈ count | sum | min | max. `src` is
    * ignored for count. `out` names the stored column.
    */
  final case class Measure(agg: String, src: String, out: String) {
    require(Set("count", "sum", "min", "max", "theta")(agg),
      s"measure '$agg' is not algebraically mergeable" +
        " (avg: derive from sum+count on read; count distinct: use the" +
        " thetaDistinct sketch measure)")
  }

  def count(out: String): Measure = Measure("count", "", out)
  def sum(src: String, out: String): Measure = Measure("sum", src, out)
  def min(src: String, out: String): Measure = Measure("min", src, out)
  def max(src: String, out: String): Measure = Measure("max", src, out)

  /** Distinct-count as a mergeable theta-sketch column (`src` is a
    * long key, e.g. a user id or fingerprint): exact below k retained
    * entries, standard sketch error beyond, and the stored sketches
    * answer cross-key set algebra (union/intersect/difference) for
    * free. Read the estimate with [[graft.functions.Theta.estimate]].
    */
  def thetaDistinct(src: String, out: String): Measure =
    Measure("theta", src, out)

  /** The batch's partial aggregate: one map-side-combining
    * aggregation, |keys-in-batch| output rows.
    */
  def aggregateBatch(batch: DataFrame, keys: Seq[String],
                     measures: Seq[Measure]): DataFrame = {
    require(measures.nonEmpty && keys.nonEmpty)
    val aggs = measures.map {
      case Measure("count", _, out) => F.count(lit(1)).as(out)
      case Measure("sum", src, out) => F.sum(col(src)).as(out)
      case Measure("min", src, out) => F.min(col(src)).as(out)
      case Measure("max", src, out) => F.max(col(src)).as(out)
      case Measure("theta", src, out) =>
        graft.functions.Theta.sketchAgg(col(src)).as(out)
    }
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Re-aggregation of already-aggregated rows: count partials SUM
    * (each partial row carries the count of many source rows);
    * sum/min/max fold with their own operator. Associative, so any
    * merge tree equals one global aggregation.
    */
  private def mergeAggs(measures: Seq[Measure]): Seq[Column] =
    measures.map {
      case Measure("count", _, out) => F.sum(col(out)).as(out)
      case Measure("sum", _, out) => F.sum(col(out)).as(out)
      case Measure("min", _, out) => F.min(col(out)).as(out)
      case Measure("max", _, out) => F.max(col(out)).as(out)
      case Measure("theta", _, out) =>
        graft.functions.Theta.unionAgg(col(out)).as(out)
    }

  /** Merge two partial-aggregate frames (same schema) into one. */
  def mergePartials(a: DataFrame, b: DataFrame, keys: Seq[String],
                    measures: Seq[Measure]): DataFrame = {
    val m = mergeAggs(measures)
    a.unionByName(b).groupBy(keys.map(col): _*).agg(m.head, m.tail: _*)
  }

  /** Fold `batch` (raw rows) into the aggregate table at `path`,
    * hive-partitioned by `partitionCol` (must be one of `keys` —
    * typically the day). Cost: one partial aggregation of the batch
    * + a re-aggregation of (touched-partition current rows ∪ batch
    * partial) + a dynamic-partition overwrite of ONLY the touched
    * partitions ([[graft.sources.Merge.upsertPartitioned]]'s rewrite
    * discipline).
    * Returns the number of partitions rewritten.
    */
  def updateTable(spark: SparkSession, path: String, batch: DataFrame,
                  keys: Seq[String], measures: Seq[Measure],
                  partitionCol: String): Int = {
    require(keys.contains(partitionCol),
      s"partition column $partitionCol must be an aggregation key")
    // persisted: touched-partition discovery AND the merge both read
    // the partial (|keys-in-batch| rows) — without the persist each
    // would rescan the raw batch (BenchScale's rollup_incremental_
    // mrows_read measured the fold at 2x batch before this)
    val partial = aggregateBatch(batch, keys, measures).persist()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // "table exists" = has at least one data entry; metadata-only dirs
    // (_applied markers, _SUCCESS) don't count — a stream whose first
    // micro-batch was empty leaves exactly that shape behind. The
    // canonical probe (one listing contract across every store).
    val hasData = Generations.hasData(spark, path)
    try if (!hasData) {
      // append, not create: the dir may already hold metadata-only
      // entries (stream batch markers) that an overwrite would destroy
      partial.write.mode("append").partitionBy(partitionCol).parquet(path)
      partial.select(partitionCol).distinct().count().toInt
    } else {
      val touched = partial.select(partitionCol).distinct().collect()
        .map(_.get(0))
      // touchedPredicate, not bare isin: a null partition key in the
      // batch must pull the __HIVE_DEFAULT_PARTITION__ rows into the
      // merge (isin never matches NULL — the dynamic overwrite would
      // replace that partition with batch-only partials)
      val current = spark.read.parquet(path)
        .where(graft.sources.Merge.touchedPredicate(partitionCol,
          touched.toIndexedSeq))
      // align to the partial's schema: hive partition-type inference
      // reads a string day partition back as DATE, which unionByName
      // would reject — cast key columns back to their ingest types
      val aligned = current.select(partial.schema.fields.toIndexedSeq
        .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
      // localCheckpoint cuts lineage: the overwrite would otherwise
      // read the very files it replaces
      val merged = mergePartials(aligned, partial, keys, measures)
        .localCheckpoint()
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol)
        .parquet(path)
      // fold committed: free the merge checkpoint now — RollupStream
      // runs this once per micro-batch (graft.ops.Blocks hygiene)
      graft.ops.Blocks.release(merged)
      touched.length
    } finally { partial.unpersist(); () }
  }

  /** The maintained table, with non-mergeable derivations computed on
    * read: each (sumCol, countCol, avgOut) triple becomes one exact
    * double division — single IEEE op, deterministic, replayable.
    */
  def withDerived(table: DataFrame,
                  avgs: Seq[(String, String, String)]): DataFrame =
    avgs.foldLeft(table) { case (df, (s, n, out)) =>
      df.withColumn(out,
        col(s).cast("double") / col(n).cast("double"))
    }
}
