package graft.streaming

import org.apache.spark.sql.SparkSession

/** The transactional-sink replay guard shared by the non-idempotent
  * streaming folds ([[RollupStream]], [[Scd2Stream]],
  * [[SegmentDedupStream]]): each applied micro-batch id is recorded as
  * a marker object under `<path>/_applied/` AFTER the fold commits, and
  * a batch whose id is already marked is skipped. foreachBatch
  * re-executes the last batch after a crash between sink commit and
  * checkpoint commit; without the marker a COUNT/SUM fold
  * double-counts and an SCD2 fold misfolds its own already-written
  * state. (Marker write and fold are not one atomic commit: a crash
  * BETWEEN them re-applies the batch — a rename-sized window, closed
  * fully only by a transactional table format; documented trade.)
  *
  * Marking discipline: EVERY delivered batch id is marked, including
  * empty batches — attach points put their `isEmpty` check INSIDE the
  * `fold` argument, never around the [[applyOnce]] call. An unmarked
  * empty batch would let a later out-of-band replay of that id run the
  * fold as if it were new.
  *
  * Concurrency: exists-then-create is not atomic, so the guard assumes
  * ONE writer per sink path — the normal shape, since a Structured
  * Streaming sink path belongs to a single query (Spark itself rejects
  * two queries sharing a checkpoint). Two concurrent writers on one
  * path need a transactional table format, not this guard.
  */
object BatchMarkers {

  private def marker(path: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"$path/_applied", s"batch-$batchId")

  /** Runs `fold` unless `batchId` is already marked at `path`;
    * marks it after the fold returns. Returns true iff applied.
    */
  def applyOnce(spark: SparkSession, path: String, batchId: Long)
               (fold: => Unit): Boolean = {
    val m = marker(path, batchId)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(m)) false
    else {
      fold
      fs.mkdirs(m.getParent)
      fs.create(m, true).close()
      true
    }
  }

  /** True iff `path` holds at least one non-hidden entry — i.e. a
    * parquet store that can actually be read. A bare `fs.exists` is
    * the wrong probe for a streaming store: the marker dir above, a
    * `_SUCCESS` flag, or `_temporary` debris from a crashed first
    * append all make the dir EXIST while `spark.read.parquet` on it
    * throws — which would wedge every subsequent micro-batch of a
    * stream that recovers from "store not yet written" by probing.
    * (Same listing contract as `IncrementalAgg.updateTable`'s inline
    * hasData; the canonical implementation lives in
    * [[graft.ops.Generations.hasData]] so ops-layer stores share it.)
    */
  def hasData(spark: SparkSession, path: String): Boolean =
    graft.ops.Generations.hasData(spark, path)
}
