package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running state (count, running Double sum, high-water timestamp)
  * carried across micro-batches. The sum is floating-point and therefore
  * order-dependent at the ulp level — fine for the monitoring semantics
  * here; use a long/decimal accumulator where exactness is required.
  */
case class UserState(count: Long, sum: Double, maxTs: Long)

/** One emitted update per user per micro-batch. */
case class UserUpdate(user_id: Long, cnt: Long, sum_value: Double,
    max_ts_ms: Long, anomalous: Boolean)

/** Exact-arithmetic per-user state for the GRADED stateful key
  * (`t_stateful_stats`): the value sum is carried as scale-6 unscaled
  * micros in a Long, so accumulation is integer-exact and
  * order-independent — the floating-point `UserState.sum` above cannot be
  * oracle-hashed (its last ulp depends on reduction order).
  */
case class ExactState(cnt: Long, sumMicros: Long, maxTsMs: Long)

/** Exact emitted update: callers project micros/epoch-ms back to decimal /
  * timestamp in Column space (graft.ops.EventTime `t_stateful_stats`).
  */
case class ExactUpdate(user_id: Long, cnt: Long, sum_micros: Long,
    max_ts_ms: Long)

/** Last-writer-wins CDC state per key: the winning change record under
  * the (tsMs, eventId) total sequence order, plus a running op count.
  */
/** Bounded per-key TOP-K state: the k best (valueMicros, eventId)
  * entries seen so far under the (value DESC, eventId ASC) total order.
  * Inserting a batch then trimming to k is associative and commutative
  * over that total order, so the converged state is independent of
  * micro-batch slicing — the property that makes the streaming key
  * share its batch oracle verbatim (the cdcLatest argument).
  */
case class TopKState(valuesMicros: Seq[Long], eventIds: Seq[Long])

case class TopKUpdate(user_id: Long, rank: Int, value_micros: Long,
    event_id: Long)

case class CdcState(tsMs: Long, eventId: Long, op: String,
    valueMicros: Long, nOps: Long)

/** Emitted CDC state snapshot (one per key per micro-batch). */
case class CdcUpdate(user_id: Long, last_ts_ms: Long, last_event_id: Long,
    last_op: String, value_micros: Long, n_ops: Long)

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

  /** Oracle-exact per-user running stats — the graded twin of
    * [[runningUserStats]] (`t_stateful_stats`, SURVEY §2b group T).
    *
    * Input must carry `user_id`, `value` (double) and the standard
    * ms-truncated NTZ event-time column `ts_ms` (T.evMs). The value is
    * cast to DECIMAL(38,6) (the cross-engine exactness idiom, §7.3 R2)
    * and carried as its unscaled micros in a Long; `Math.addExact` makes
    * a 100 TB-scale overflow a loud failure instead of a silently wrapped
    * sum. Emits one row per key per micro-batch; on a batch frame that is
    * exactly one row per user — a groupBy in the oracle's eyes, but
    * executed through the keyed-state extension point so the graded
    * contract covers flatMapGroupsWithState itself.
    */
  def userStatsExact(events: DataFrame): Dataset[ExactUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        // scale-6 decimal → integral micros; the *1e6 product of a
        // DECIMAL(38,6) is integer-valued, so the long cast is exact.
        (col("value").cast("decimal(38,6)") * lit(1000000)).cast("long"),
        // NTZ-native epoch millis (see runningUserStats for why a
        // cast("timestamp") would tz-shift this).
        expr("timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts_ms)"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ExactState, ExactUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[ExactState]) =>
          val prev = state.getOption.getOrElse(ExactState(0L, 0L, Long.MinValue))
          val next = rows.foldLeft(prev) { case (st, (_, vMicros, tsMs)) =>
            ExactState(st.cnt + 1, Math.addExact(st.sumMicros, vMicros),
              math.max(st.maxTsMs, tsMs))
          }
          state.update(next)
          Iterator(ExactUpdate(uid, next.cnt, next.sumMicros, next.maxTsMs))
      }
  }

  /** [[userStatsExact]] re-expressed on the `transformWithState` API —
    * Spark 4's replacement for the (deprecated) flatMapGroupsWithState:
    * named state variables on a `StatefulProcessor` handle instead of one
    * opaque GroupState, with TTL, timers, and schema evolution as
    * first-class features. Semantically identical to [[userStatsExact]]
    * (StatefulSpec asserts row-for-row parity on batch and cross-batch
    * carry under a MemoryStream); BOTH execution paths (batch included)
    * require the RocksDB state-store provider (`spark.sql.streaming
    * .stateStore.providerClass` → RocksDBStateStoreProvider) — the
    * default HDFS-backed store has no multi-column-family support and
    * rejects the operator.
    */
  def userStatsExactTws(events: DataFrame): Dataset[ExactUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    // Batch execution wart: RocksDB's snapshot-upload report needs the
    // StateStoreCoordinator RPC endpoint, which only a streaming query
    // would otherwise register — force-register it (idempotent) so the
    // batch path works in a fresh session.
    org.apache.spark.sql.GraftBridge.ensureStateStoreCoordinator(spark)
    events
      .select(col("user_id").cast("long"),
        (col("value").cast("decimal(38,6)") * lit(1000000)).cast("long"),
        expr("timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts_ms)"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** CDC APPLY as keyed streaming state — LAST-WRITER-WINS by a total
    * sequence order (graded at `t_stream_cdc`; the window-spelling twin
    * is `t_cdc_apply`): each key's state is the arg-max of its change
    * records under (ts_ms, event_id), plus a running op count. The merge
    * is an ASSOCIATIVE, COMMUTATIVE monoid (argmax by a total order +
    * count), so the final state is independent of both row order inside
    * a batch and micro-batch slicing — which is exactly what makes a
    * streaming CDC consumer oracle-gradable (and crash-replayable: the
    * same records in any grouping converge to the same state). At 100 TB
    * the state store holds one small record per live key; tombstones
    * ('D') stay IN state so a late-arriving lower-seq upsert cannot
    * resurrect a deleted key — the consumer filters them on read.
    * Deletion of the tombstones themselves is a retention decision
    * (TTL/compaction), not apply logic.
    */
  def cdcLatest(changes: DataFrame): Dataset[CdcUpdate] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .select(col("user_id").cast("long"),
        expr("timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts_ms)"),
        col("event_id").cast("long"), col("op").cast("string"),
        // scale-6 decimal → exact integral micros (the userStatsExact idiom)
        (col("value").cast("decimal(38,6)") * lit(1000000)).cast("long"))
      .as[(Long, Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CdcState, CdcUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String, Long)],
            state: GroupState[CdcState]) =>
          val prev = state.getOption.getOrElse(
            CdcState(Long.MinValue, Long.MinValue, "U", 0L, 0L))
          val next = rows.foldLeft(prev) {
            case (st, (_, tsMs, eid, op, vMicros)) =>
              val wins = tsMs > st.tsMs || (tsMs == st.tsMs && eid > st.eventId)
              if (wins) CdcState(tsMs, eid, op, vMicros, st.nOps + 1)
              else st.copy(nOps = st.nOps + 1)
          }
          state.update(next)
          Iterator(CdcUpdate(uid, next.tsMs, next.eventId, next.op,
            next.valueMicros, next.nOps))
      }
  }

  /** Streaming per-key TOP-K via `flatMapGroupsWithState`: each key
    * carries its k best (value, event) entries; a batch's rows fold in
    * and the list trims back to k. Values ride as exact scale-6 micros
    * (the cdcLatest idiom) so the order compared is the 6-dp-quantized
    * value — exactly what the oracle's `ORDER BY CAST(value AS
    * DECIMAL(38,6)) DESC, event_id` compares. State is k-bounded per
    * key at any stream length; one [[TopKUpdate]] row per (key, rank)
    * per micro-batch (consumers keep the latest). Batch-run = one
    * "micro-batch" = the final answer, which StatefulSpec proves equal
    * to any slicing (insert-then-trim is order-insensitive under the
    * total order).
    */
  def topKPerUser(events: DataFrame, k: Int = 3): Dataset[TopKUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        (col("value").cast("decimal(38,6)") * lit(1000000)).cast("long"),
        col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TopKState, TopKUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[TopKState]) =>
          val prev = state.getOption.getOrElse(TopKState(Nil, Nil))
          val merged = (prev.valuesMicros.zip(prev.eventIds) ++
            rows.map(r => (r._2, r._3)))
            .sortBy { case (v, eid) => (-v, eid) }
            .take(k)
          state.update(TopKState(merged.map(_._1), merged.map(_._2)))
          merged.iterator.zipWithIndex.map { case ((v, eid), i) =>
            TopKUpdate(uid, i + 1, v, eid)
          }
      }
  }

  /** Per-user streaming KLL sketch via `transformWithState` — see
    * [[UserSketchProcessor]]. Same RocksDB requirement and batch-path
    * coordinator wart as [[userStatsExactTws]].
    */
  def userValueSketch(events: DataFrame, k: Int = 2048): Dataset[SketchUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    org.apache.spark.sql.GraftBridge.ensureStateStoreCoordinator(spark)
    events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserSketchProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}

/** StatefulProcessor carrying the same exact-Long per-user stats as
  * `Stateful.userStatsExact` in a named ValueState — one emitted
  * [[ExactUpdate]] per key per micro-batch.
  */
class UserStatsProcessor
    extends StatefulProcessor[Long, (Long, Long, Long), ExactUpdate] {
  @transient private var state: ValueState[ExactState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ExactState]("userStats",
      Encoders.product[ExactState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[ExactUpdate] = {
    val prev = if (state.exists()) state.get() else ExactState(0L, 0L, Long.MinValue)
    val next = rows.foldLeft(prev) { case (st, (_, vMicros, tsMs)) =>
      ExactState(st.cnt + 1, Math.addExact(st.sumMicros, vMicros),
        math.max(st.maxTsMs, tsMs))
    }
    state.update(next)
    Iterator(ExactUpdate(key, next.cnt, next.sumMicros, next.maxTsMs))
  }
}

/** One emitted sketch snapshot per user per micro-batch: stream length
  * plus INCLUSIVE ranks of two fixed probe values.
  */
case class SketchUpdate(user_id: Long, n: Long, r50: Double, r150: Double)

/** STREAMING QUANTILE state (graded by `t_stream_kll`): the per-key state
  * is a serialized KLL sketch (`functions/Kll`'s building block carried
  * in a `ValueState[Array[Byte]]`), updated per micro-batch and emitted
  * as rank probes — the streaming half of the sketch lifecycle: batch
  * jobs store per-day sketches (`a_kll_merge`), streams carry per-key
  * sketches in the state store, and both answer from KB-sized state
  * without re-reading events. Rank probes (value → rank) rather than
  * quantile probes (rank → value) are emitted because INCLUSIVE rank is
  * a pure counting function — in the no-compaction regime it is EXACTLY
  * `#(items <= v)/n`, which makes the graded key oracle-checkable, while
  * StatefulSpec pins the estimation-mode envelope at a tiny k where
  * compaction does fire.
  */
class UserSketchProcessor(k: Int)
    extends StatefulProcessor[Long, (Long, Double), SketchUpdate] {
  import org.apache.datasketches.kll.KllDoublesSketch
  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

  @transient private var state: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Array[Byte]]("kllBytes",
      Encoders.BINARY, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[SketchUpdate] = {
    val sk =
      if (state.exists()) KllDoublesSketch.heapify(Memory.wrap(state.get()))
      else KllDoublesSketch.newHeapInstance(k)
    rows.foreach { case (_, v) => sk.update(v) }
    state.update(sk.toByteArray)
    Iterator(SketchUpdate(key, sk.getN,
      sk.getRank(50.0, QuantileSearchCriteria.INCLUSIVE),
      sk.getRank(150.0, QuantileSearchCriteria.INCLUSIVE)))
  }
}
