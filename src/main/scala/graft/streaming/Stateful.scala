package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user running state (count, running Double sum, high-water timestamp)
  * carried across micro-batches. The sum is floating-point and therefore
  * order-dependent at the ulp level — fine for the monitoring semantics
  * here; use a long/decimal accumulator where exactness is required.
  */
case class UserState(count: Long, sum: Double, maxTs: Long)

/** One emitted update per user per micro-batch. */
case class UserUpdate(user_id: Long, cnt: Long, sum_value: Double,
    max_ts_ms: Long, anomalous: Boolean)

/** Custom keyed streaming state via flatMapGroupsWithState — the
  * extension point for semantics the built-in window/session operators
  * can't express (north star: KeyValueGroupedDataset custom state).
  *
  * Reference analog: the batch scheduler's per-node persistent Buffer
  * (flexcalc/batch.py::Buffer, R24) — long-lived keyed state the engine
  * checkpoints and hands back on the next increment; here the state store
  * + watermark do the lifecycle.
  *
  * Works identically on a batch DataFrame (state lives for the single
  * pass) and a readStream DataFrame (state persists across micro-batches
  * in the state store) — StatefulSpec proves both plus cross-batch carry.
  */
object Stateful {

  def runningUserStats(events: DataFrame, anomalyMean: Double = 200.0): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        // NTZ-native epoch millis: wall-clock distance from the NTZ epoch
        // literal. A cast("timestamp") here would re-interpret the naive
        // event time under the SESSION timezone and silently shift the
        // emitted millis on any non-UTC deployment.
        expr("timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
          .as("ts_ms"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double, Long)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
          val next = rows.foldLeft(prev) { case (st, (_, v, ts)) =>
            UserState(st.count + 1, st.sum + v, math.max(st.maxTs, ts))
          }
          state.update(next)
          Iterator(UserUpdate(uid, next.count, next.sum, next.maxTs,
            anomalous = next.count > 0 && next.sum / next.count > anomalyMean))
      }
  }
}
