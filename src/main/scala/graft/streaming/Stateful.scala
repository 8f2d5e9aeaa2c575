package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** [EXT] Custom streaming state (SURVEY.md §2 streaming surface):
  * KeyValueGroupedDataset.flatMapGroupsWithState for logic that windows and
  * watermarks cannot express. The example keeps one running accumulator per
  * user (count, total value, last-seen event id) and emits an updated
  * snapshot per micro-batch — the state shape of a per-entity feature
  * stream in a training-data pipeline. State is partitioned by key across
  * executors and checkpointed by the engine; at scale the concern is state
  * size per key (constant here) and key cardinality (bounded by users). */
object Stateful {

  final case class EventIn(user_id: Long, event_id: Long, value: Double)
  final case class UserState(n: Long, total: Double, lastEventId: Long)
  final case class UserSnapshot(user_id: Long, n: Long, total: Double,
      last_event_id: Long)

  def updateUser(userId: Long, events: Iterator[EventIn],
      state: GroupState[UserState]): Iterator[UserSnapshot] = {
    var st = state.getOption.getOrElse(UserState(0L, 0.0, -1L))
    var changed = false
    events.foreach { e =>
      st = UserState(st.n + 1, st.total + e.value,
        math.max(st.lastEventId, e.event_id))
      changed = true
    }
    if (changed) {
      state.update(st)
      Iterator.single(UserSnapshot(userId, st.n, st.total, st.lastEventId))
    } else Iterator.empty
  }

  /** File-source stream → per-user stateful accumulator → memory sink. */
  def streamUserState(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery = {
    import s.implicits._
    val events: Dataset[EventIn] = s.readStream.schema(schema).parquet(dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[EventIn]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateUser)
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }
}
