package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user running aggregate emitted on every update. */
final case class UserRunningTotal(user_id: Long, n_events: Long, total_value: Double)

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §1.2
  * streaming row; mandate: KeyValueGroupedDataset custom state).
  *
  * The state store holds one (count, sum) pair per user — O(distinct keys)
  * memory, checkpointed by the engine; at cluster scale state is
  * shuffle-partitioned by key like any grouped aggregate. The same function
  * body also runs on a batch Dataset (state spans the single batch),
  * keeping the batch/streaming unification property.
  */
object Stateful {

  def runningUserTotals(events: DataFrame): Dataset[UserRunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }

  private def update(userId: Long, batch: Iterator[(Long, Double)],
      state: GroupState[(Long, Double)]): Iterator[UserRunningTotal] = {
    val (n0, t0) = state.getOption.getOrElse((0L, 0.0))
    var n = n0
    var t = t0
    batch.foreach { case (_, v) => n += 1; t += v }
    state.update((n, t))
    Iterator(UserRunningTotal(userId, n, t))
  }
}
