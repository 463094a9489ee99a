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

  /** [[graft.ops.Windows.funnel]] as a CONTINUOUS stateful stream: per-user
    * state is just (stage reached, time of the last completed step) — a
    * dozen bytes per user, however long the stream runs — advanced by a
    * step event that lands strictly after the previous step and within
    * `withinMs` of it. Emits the user's funnel state on every update.
    *
    * Each micro-batch's events are folded in timestamp order, so on
    * in-order delivery the reached stage equals the batch
    * `Windows.funnel`'s greedy earliest-chain semantics (cross-checked in
    * StreamingWindowSpec); an event arriving out of order ACROSS micro-batches
    * cannot retroactively advance an already-passed window — the standard
    * streaming-funnel caveat, bounded by the source's delivery disorder.
    */
  def streamingFunnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      withinMs: Long = 2L * 3600 * 1000): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[(Long, String, java.sql.Timestamp)],
            state: GroupState[(Int, Long)]) =>
          var (stage, lastT) = state.getOption.getOrElse((0, 0L))
          batch.toSeq.sortBy(_._3.getTime).foreach { case (_, typ, ts) =>
            val t = ts.getTime
            if (stage < steps.length && typ == steps(stage)
                && (stage == 0 || (t > lastT && t <= lastT + withinMs))) {
              stage += 1
              lastT = t
            }
          }
          state.update((stage, lastT))
          Iterator(FunnelProgress(uid, stage.toLong,
            if (stage == 0) None else Some(new java.sql.Timestamp(lastT))))
      }
  }
}

/** Streaming funnel output: stage reached and when the last step landed. */
final case class FunnelProgress(user_id: Long, stage: Long,
    t_last_step: Option[java.sql.Timestamp])
