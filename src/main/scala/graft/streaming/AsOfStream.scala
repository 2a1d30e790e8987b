package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the native as-of join
  * ([[graft.plans.AsOfJoinPlan]]): for each left event, the right row
  * of the same key with the greatest rightTs <= leftTs (inclusive),
  * optionally within a staleness tolerance — maintained over ONE
  * watermarked stream carrying both sides (the tagged-union shape the
  * composed batch as-of uses), with per-key state in the state store.
  *
  * == Equivalence contract ==
  * A left event at ts T may only be emitted once no right row with
  * rightTs <= T can still arrive — i.e. once the event-time watermark
  * passes T. So each micro-batch buffers arrivals, emits exactly the
  * buffered left rows strictly below the current watermark (matching
  * them against every right row seen so far), and holds the rest.
  * Under the watermark's delivery contract (no row at-or-older than
  * the watermark arrives; Spark drops violators before the state
  * function — and the STRICT `< watermark` finalize here stays
  * correct even if a boundary-tied row is delivered) the emitted
  * match equals the batch join over the complete input — micro-batch boundaries cannot change it, which
  * `AsOfStreamSpec` pins against [[graft.ops.AsOf.joinAsOfNative]]
  * across arbitrary batch splits.
  *
  * == State size ==
  * Per key: the pending left rows still inside the watermark horizon,
  * the right rows at-or-above the watermark, and ONE dominant right
  * row below it — the latest; any older right row is dominated for
  * every future left (as-of takes the max rightTs <= T, and with
  * tolerance the newer row is also the less stale one). Under
  * `toleranceUs` the dominant row is dropped too once it can no
  * longer satisfy the staleness bound for any future left. So state
  * is O(in-flight window), not O(stream history) — the
  * latest-right-row-per-key state a 100 TB stream can actually hold.
  *
  * == Re-invocation ==
  * A pending left with no further traffic on its key would otherwise
  * wait forever: an event-time timeout is armed at the earliest
  * pending left's timestamp, so the key re-fires as soon as the
  * watermark passes it (the [[StatefulSessions]] discipline, plus
  * timeouts).
  *
  * Right rows must be unique per (key, ts) for deterministic output —
  * the native operator's contract, unchanged. Null-ts rows cannot
  * exist here (the event-time column is what the watermark tracks).
  */
object AsOfStream {

  /** Tagged-union input row: exactly one of `left`/`right` set.
    * `eventTime` is the watermarked column; comparisons run on exact
    * integer microseconds derived from it.
    */
  final case class Tagged[L, R](key: Long, eventTime: Timestamp,
                                left: Option[L], right: Option[R])

  final case class Out[L, R](key: Long, tsUs: Long, left: L,
                             rightTsUs: Option[Long], right: Option[R])

  final case class KeyState[L, R](lefts: List[(Long, L)],
                                  rights: List[(Long, R)])

  private def us(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** One key's fold: buffer arrivals, emit lefts behind the
    * watermark, prune dominated/expired rights, arm the timeout.
    * Public so the spec can also drive it directly.
    */
  def updateState[L, R](toleranceUs: Option[Long])(
      key: Long, rows: Iterator[Tagged[L, R]],
      state: GroupState[KeyState[L, R]]): Iterator[Out[L, R]] = {
    val st = state.getOption.getOrElse(KeyState[L, R](Nil, Nil))
    val arrivals = rows.toList
    val lefts = st.lefts ++ arrivals.collect {
      case t if t.left.isDefined => (us(t.eventTime), t.left.get) }
    val rights = (st.rights ++ arrivals.collect {
      case t if t.right.isDefined => (us(t.eventTime), t.right.get) })
      .sortBy(_._1)
    val wUs =
      if (state.getCurrentWatermarkMs() <= 0) Long.MinValue
      else state.getCurrentWatermarkMs() * 1000L

    // emit every left strictly below the watermark: nothing that
    // could still arrive (ts >= watermark) can match it
    val (ready, pending) = lefts.partition(_._1 < wUs)
    val out = ready.sortBy(_._1).map { case (lt, lv) =>
      val m = rights.takeWhile(_._1 <= lt)
        .filter(r => toleranceUs.forall(tol => lt - r._1 <= tol))
        .lastOption
      Out(key, lt, lv, m.map(_._1), m.map(_._2))
    }

    // prune rights: every future left has ts >= watermark (pending
    // ones by the partition above, new arrivals by the watermark
    // contract), so among rights at-or-below the watermark only the
    // LATEST can ever win again; tolerance expires even that one
    val (below, above) = rights.partition(_._1 <= wUs)
    val dominant = below.lastOption.toList ++ above
    val kept =
      if (wUs == Long.MinValue) dominant // no watermark yet: keep all
      else dominant.filter(r => toleranceUs.forall(tol => r._1 >= wUs - tol))

    if (pending.isEmpty && kept.isEmpty) {
      state.remove()
    } else {
      state.update(KeyState(pending, kept))
      // re-fire as soon as the watermark passes the earliest pending
      // left (must be strictly above the current watermark — pending
      // lefts are >= it by construction)
      pending.map(_._1).minOption.foreach { m =>
        state.setTimeoutTimestamp(m / 1000L + 1L)
      }
    }
    out.iterator
  }

  /** Wire the as-of fold over a tagged-union stream. `tagged` must
    * already carry a watermark on `eventTime` (the caller picks the
    * lateness bound); output appears once the watermark passes each
    * left row.
    */
  def joinAsOf[L, R](tagged: Dataset[Tagged[L, R]],
                     toleranceUs: Option[Long] = None)(
      implicit eo: Encoder[Out[L, R]],
      es: Encoder[KeyState[L, R]]): Dataset[Out[L, R]] =
    tagged
      .groupByKey(_.key)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateState[L, R](toleranceUs))
}
