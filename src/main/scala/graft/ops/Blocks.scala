package graft.ops

import org.apache.spark.sql.DataFrame

/** Deterministic release of `localCheckpoint` storage (r15).
  *
  * An eager `localCheckpoint(true)` caches the frame's blocks in the
  * block manager and truncates lineage; the blocks are reclaimed only
  * when the checkpointed RDD object is garbage-collected on the
  * driver. A batch query leaks nothing that matters — the session
  * ends — but a LONG-LIVED streaming driver checkpointing several
  * frames per micro-batch ([[graft.streaming.MaxSimStream]],
  * [[graft.streaming.Scd2Stream]]) grows storage memory with batch
  * cadence until a driver GC happens to run. [[release]] frees the
  * blocks the moment the fold is done with them.
  *
  * SAFETY: a released frame (and any lazy frame derived from it) is
  * no longer computable — its lineage was truncated by the
  * checkpoint, so there is nothing to recompute from. Call it only
  * after every consumer of the frame has materialized (the streaming
  * folds call it as the last statement of their batch step, after
  * all writes committed).
  */
object Blocks {

  /** Unpersist the cached RDDs behind every checkpointed leaf of the
    * given frames' plans. Walking the ANALYZED plan catches both a
    * checkpointed frame itself and a lazy frame built over
    * checkpointed inputs (whose leaves are the inputs' RDD scans).
    * Non-checkpointed leaves are untouched; blocking = false.
    */
  def release(dfs: DataFrame*): Unit =
    dfs.foreach { df =>
      df.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(false)
          ()
        case _ => ()
      }
    }
}
