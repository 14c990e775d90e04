package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
