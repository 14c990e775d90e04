package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

case class UserEvent(user_id: Long, event_id: Long)
case class UserCount(user_id: Long, events: Long)

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
}
