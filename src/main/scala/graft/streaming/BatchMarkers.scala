package graft.streaming

import org.apache.spark.sql.SparkSession

/** The transactional-sink replay guard shared by the non-idempotent
  * streaming folds ([[RollupStream]], [[Scd2Stream]]): each applied
  * micro-batch id is recorded as a marker object under
  * `<path>/_applied/` AFTER the fold commits, and a batch whose id is
  * already marked is skipped. foreachBatch re-executes the last batch
  * after a crash between sink commit and checkpoint commit; without
  * the marker a COUNT/SUM fold double-counts and an SCD2 fold wedges
  * on its own late-data guard. (Marker write and fold are not one
  * atomic commit: a crash BETWEEN them re-applies the batch — a
  * rename-sized window, closed fully only by a transactional table
  * format; documented trade.)
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
}
