package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

case class UserEvent(user_id: Long, event_id: Long)
case class UserCount(user_id: Long, events: Long)

case class FunnelEvent(user_id: Long, event_type: String, us: Long)

case class TouchEvent(user_id: Long, event_id: Long, event_type: String,
    us: Long, value: Double)
case class Attributed(user_id: Long, purchase_id: Long, touch_type: String,
    touch_us: Long, us: Long, value: Double)
case class FunnelState(user_id: Long, signup_us: Option[Long],
    view_us: Option[Long], purchase_us: Option[Long], stage: Long)

/** SURVEY.md §2.11 arbitrary-state capability: running per-user event
  * counters via flatMapGroupsWithState. State lives in the per-partition
  * StateStore on executors (checkpointed); the driver never sees it —
  * the shape that scales to unbounded streams.
  */
object Stateful {

  def runningCounts(events: Dataset[UserEvent]): Dataset[UserCount] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val ucEnc = Encoders.product[UserCount]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[UserEvent], state: GroupState[Long]) => {
          val cur = state.getOption.getOrElse(0L) + it.size
          state.update(cur)
          Iterator(UserCount(uid, cur))
        })
  }

  /** The Spark 4 successor API: same running counter as a
    * [[StatefulProcessor]] under `transformWithState` (typed per-key
    * `ValueState`, RocksDB-backed state store, timer support available).
    */
  class RunningCountProcessor extends StatefulProcessor[Long, UserEvent, UserCount] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserCount] = {
      val cur = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(cur)
      Iterator(UserCount(key, cur))
    }
  }

  def runningCountsTws(events: Dataset[UserEvent]): Dataset[UserCount] = {
    implicit val ucEnc = Encoders.product[UserCount]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Streaming complement of the batch `events_funnel` query: a per-user
    * funnel state machine (signup → view within the window → purchase
    * within the window) advanced incrementally across micro-batches —
    * window functions don't run on streams, so the batch query's three
    * conditional window minima become one keyed fMGWS fold whose state is
    * just the three stage timestamps (24 bytes/user, StateStore-resident,
    * checkpointed). Emits the updated funnel row per touched user per
    * batch. On in-order event delivery the greedy fold picks the same
    * minima the batch windows do (StreamingSpec pins batch ≡ streaming on
    * the corpus); out-of-order delivery within a batch is handled by the
    * per-batch sort, across batches by the usual watermark discipline of
    * the caller.
    */
  def funnel(events: Dataset[FunnelEvent],
      windowUs: Long = 86400000000L): Dataset[FunnelState] = {
    implicit val stEnc = Encoders.product[(Option[Long], Option[Long], Option[Long])]
    implicit val outEnc = Encoders.product[FunnelState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[FunnelEvent],
            state: GroupState[(Option[Long], Option[Long], Option[Long])]) => {
          var (s1, s2, s3) = state.getOption.getOrElse(
            (Option.empty[Long], Option.empty[Long], Option.empty[Long]))
          // group iterators arrive in shuffle order — restore event-time
          // order inside the batch so the greedy fold takes minima
          it.toSeq.sortBy(_.us).foreach { e =>
            if (e.event_type == "signup" && s1.isEmpty) s1 = Some(e.us)
            else if (e.event_type == "view" && s2.isEmpty && s1.exists(t =>
              e.us > t && e.us <= t + windowUs)) s2 = Some(e.us)
            else if (e.event_type == "purchase" && s3.isEmpty && s2.exists(t =>
              e.us > t && e.us <= t + windowUs)) s3 = Some(e.us)
          }
          state.update((s1, s2, s3))
          Iterator(FunnelState(uid, s1, s2, s3,
            Seq(s1, s2, s3).count(_.isDefined).toLong))
        })
  }

  /** Streaming complement of the batch `events_attribution` query: each
    * purchase credited to the user's most recent preceding view/click
    * within the lookback, as the events arrive. The batch query's
    * ignore-nulls window becomes 16 bytes of keyed state — the LAST touch
    * (type, µs) per user — so an unbounded stream attributes in O(1)
    * state per user where a naive purchases⋈touches stream join would
    * buffer the whole lookback window of touches. Emitted rows are
    * append-only facts (a purchase's attribution never changes once its
    * event time passes — touches are strictly earlier), which is what
    * makes the sink exactly-once under replay. In-order delivery per
    * user across batches is the caller's watermark contract, as with
    * [[funnel]]; within a batch the fold re-sorts by (us, event_id).
    */
  def attribution(events: Dataset[TouchEvent],
      lookbackUs: Long = 7L * 86400000000L): Dataset[Attributed] = {
    implicit val stEnc = Encoders.product[(String, Long)]
    implicit val outEnc = Encoders.product[Attributed]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[TouchEvent],
            state: GroupState[(String, Long)]) => {
          var last = state.getOption
          val out = Seq.newBuilder[Attributed]
          it.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
            if (e.event_type == "purchase") last.foreach { case (tt, tus) =>
              if (e.us - tus <= lookbackUs)
                out += Attributed(uid, e.event_id, tt, tus, e.us, e.value)
            }
            if (e.event_type == "view" || e.event_type == "click")
              last = Some((e.event_type, e.us))
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }
}
