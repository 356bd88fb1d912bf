package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming operators over the `events` table. The reference engine is
  * batch-only (SURVEY.md §1.2), so this is beyond-reference surface:
  * tumbling/sliding/session aggregation shaped for Structured Streaming.
  *
  * Each transform is written against a plain DataFrame so the SAME
  * function runs in batch mode (oracle-checkable against DuckDB) and on
  * a `readStream` source (tested with MemoryStream in the spec).
  * Watermarking is applied by the caller on the streaming side —
  * `withWatermark` is a no-op in batch, so [[withEventTime]] output can
  * be piped through either path.
  */
object EventStreams {

  /** Nanosecond epoch → TIMESTAMP (µs truncation) as `event_time`.
    * Integer `div`, not `/`: long `/` goes through DOUBLE, which cannot
    * represent epoch-ns exactly (> 2^53) — `div` matches the oracle's
    * exact `epoch_ns // 1000`.
    */
  def withEventTime(events: DataFrame, tsNsCol: String = "ts"): DataFrame =
    events.withColumn("event_time",
      timestamp_micros(expr(s"CAST(`$tsNsCol` AS BIGINT) div 1000")))

  /** Tumbling-window counts/sums per event type. In streaming mode, pair
    * with `.withWatermark("event_time", "…")` for state eviction.
    * Output keys on epoch seconds of the window start — engine-portable.
    */
  def tumbling(ev: DataFrame, width: String = "1 hour"): DataFrame =
    ev.groupBy(window(col("event_time"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Top-k event types per tumbling window by count — the streaming
    * "trending leaderboard" shape. The windowed count is one partial-agg
    * shuffle; the rank filter plans as WindowGroupLimit (a per-partition
    * k-heap per window key), so no per-window full sort materializes and
    * output is k·windows-bounded. Under Structured Streaming the same
    * agg runs watermarked and the rank step moves into `foreachBatch`
    * (rank over an open streaming agg isn't incremental by definition —
    * a window's leaderboard is only final once the watermark passes it).
    */
  def topKPerWindow(ev: DataFrame, k: Int = 3,
                    width: String = "1 hour"): DataFrame = {
    val counts = tumbling(ev, width)
    val w = Window.partitionBy("window_start")
      .orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("window_start", "event_type", "n", "rnk")
  }

  /** Sliding windows (width, slide). */
  def sliding(ev: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    ev.groupBy(window(col("event_time"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"))

  /** Batch sessionization: a session breaks after `gapSec` of user
    * inactivity; classic lag + cumulative-sum-of-breaks. (The streaming
    * twin is `session_window`/`flatMapGroupsWithState`; the batch shape
    * is what the oracle can replay.)
    */
  def sessionize(ev: DataFrame, gapSec: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_time")
    val secs = unix_timestamp(col("event_time"))
    val newSession = when(
      secs - lag(secs, 1).over(byUser) > gapSec, 1).otherwise(0)
    ev.withColumn("brk", coalesce(newSession, lit(0)))
      .withColumn("session_idx", sum("brk").over(byUser))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        unix_timestamp(min("event_time")).as("session_start"))
  }

  /** Per-user session counts — the compact correctness surface for
    * [[sessionize]].
    */
  def sessionCounts(ev: DataFrame, gapSec: Long = 1800): DataFrame =
    sessionize(ev, gapSec)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))

  /** Streaming exactly-once-per-id dedup: drops re-deliveries of the
    * same `event_id` whose event times fall within the watermark delay
    * of each other — the at-least-once → effectively-once repair every
    * ingestion front-end needs. State is bounded BY the watermark
    * (Spark evicts ids older than the delay), unlike a bare
    * `dropDuplicates` whose state grows forever on a stream. Batch
    * twin: plain `dropDuplicates(idCols)` — same result when all
    * duplicates arrive within the delay.
    */
  def dedupWithinWatermark(ev: DataFrame, delay: String = "1 hour",
                           idCols: Seq[String] = Seq("event_id")): DataFrame =
    if (ev.isStreaming)
      ev.withWatermark("event_time", delay)
        .dropDuplicatesWithinWatermark(idCols)
    else ev.dropDuplicates(idCols)

  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** The streaming twin of [[sessionCounts]]: custom state per user via
    * `mapGroupsWithState` — (last event second, session count, event
    * count) carried across micro-batches; a gap > `gapSec` between the
    * stored last-second and an incoming event opens a new session.
    * Within a micro-batch events are sorted by time; pair with a
    * watermark upstream so late data is bounded. Output mode: Update.
    */
  def streamingSessionCounts(ev: DataFrame, gapSec: Long = 1800): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = ev.sparkSession
    import spark.implicits._
    ev.select(col("user_id").cast("long"),
        unix_timestamp(col("event_time")).as("sec"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), UserSessions](
        GroupStateTimeout.NoTimeout) { case (uid, rows, state) =>
        var (last, nSess, nEv) = state.getOption.getOrElse((Long.MinValue, 0L, 0L))
        rows.map(_._2).toSeq.sorted.foreach { sec =>
          if (last == Long.MinValue || sec - last > gapSec) nSess += 1
          last = sec
          nEv += 1
        }
        state.update((last, nSess, nEv))
        UserSessions(uid, nSess, nEv)
      }.toDF()
  }

  /** Funnel analysis (CEP-style ordered sequence matching): per user,
    * how many steps of `steps` (default view → click → purchase) were
    * completed IN ORDER — each step matched by the earliest qualifying
    * event strictly after the previous step's match (greedy earliest
    * matching, which is optimal for subsequence matching and totally
    * deterministic under the (time, event_id) order).
    *
    * Shape: ONE groupBy shuffle builds each user's time-sorted event
    * array; the funnel walk is a codegen'd `aggregate` over the array —
    * no joins, no per-step passes. Per-user state is that user's events
    * (bounded by per-user activity, the same bound sessionize carries).
    * The 3-pass join formulation (min-next-event per step) is what the
    * oracle replays; the scan is equivalent because greedy matching
    * takes exactly the per-step minimum.
    */
  def funnelSteps(ev: DataFrame,
                  steps: Seq[String] = Seq("view", "click", "purchase"),
                  tsUsCol: String = "ts_us"): DataFrame = {
    val sorted = ev
      .groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col(tsUsCol).as("t"), col("event_id").as("eid"),
          col("event_type").as("et")))).as("evs"))
    // the step the walk is waiting for, as a CASE over the stage counter
    def nextType(stage: Column) =
      steps.zipWithIndex.foldLeft(lit(null).cast("string")) {
        case (els, (st, i)) => when(stage === i, lit(st)).otherwise(els)
      }
    sorted.select(col("user_id"),
      aggregate(col("evs"), lit(0),
        (stage, e) => when(stage < steps.size &&
          e.getField("et") === nextType(stage), stage + 1).otherwise(stage))
        .cast("long").as("steps_completed"))
  }

  /** DuckDB oracle for [[funnelSteps]]: the per-step earliest-match
    * formulation — step k's match is the (t, event_id)-minimal event of
    * the step's type strictly after step k-1's match (generated for the
    * same step list).
    */
  def funnelSql(steps: Seq[String] = Seq("view", "click", "purchase")): String = {
    val sb = new StringBuilder
    sb ++= "WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id AS eid, " +
      "event_type FROM events), " +
      "u AS (SELECT DISTINCT user_id FROM e)"
    steps.zipWithIndex.foreach { case (st, i) =>
      val prev = if (i == 0) None else Some(s"s$i")
      val after = prev.fold("")(p =>
        s" JOIN $p ON e.user_id = $p.user_id AND " +
          s"(e.t > $p.t OR (e.t = $p.t AND e.eid > $p.eid))")
      sb ++= s", s${i + 1} AS (SELECT user_id, t, eid FROM (" +
        s"SELECT e.user_id, e.t, e.eid, row_number() OVER (" +
        s"PARTITION BY e.user_id ORDER BY e.t, e.eid) AS rn " +
        s"FROM e$after WHERE e.event_type = '$st') WHERE rn = 1)"
    }
    val reached = (steps.size to 1 by -1).map(i =>
      s"WHEN EXISTS (SELECT 1 FROM s$i WHERE s$i.user_id = u.user_id) THEN $i")
      .mkString(" ")
    sb ++= s" SELECT u.user_id, CAST(CASE $reached ELSE 0 END AS BIGINT) " +
      "AS steps_completed FROM u ORDER BY user_id"
    sb.result()
  }

  final case class FunnelState(stage: Int, t: Long, eid: Long)
  final case class FunnelOut(user_id: Long, steps_completed: Long)

  /** The streaming twin of [[funnelSteps]]: per-user custom state via
    * `flatMapGroupsWithState` — (stage, last matched (t, event_id))
    * carried across micro-batches; each batch's events continue the
    * same greedy walk in (t, eid) order. Emits the user's row only when
    * the batch advanced the stage (the CEP "pattern progressed" signal);
    * the final state equals the batch walk when events arrive
    * time-ordered across batches (spec-pinned). Output mode: Update.
    */
  def streamingFunnelSteps(ev: DataFrame,
                           steps: Seq[String] = Seq("view", "click", "purchase"),
                           tsUsCol: String = "ts_us"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = ev.sparkSession
    import spark.implicits._
    val stepArr = steps.toArray
    ev.select(col("user_id").cast("long"), col(tsUsCol).cast("long"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Long.MinValue))
          val before = st.stage
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, t, eid, et) =>
            val afterLast = t > st.t || (t == st.t && eid > st.eid)
            if (st.stage < stepArr.length && afterLast && et == stepArr(st.stage))
              st = FunnelState(st.stage + 1, t, eid)
          }
          state.update(st)
          if (st.stage != before) Iterator(FunnelOut(uid, st.stage.toLong))
          else Iterator.empty
      }.toDF()
  }

  /** The same funnel walk as a Spark 4 `StatefulProcessor` — see
    * [[streamingFunnelStepsTws]].
    */
  final class FunnelProcessor(steps: Array[String])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, String), FunnelOut] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[FunnelState] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(uid: Long,
        rows: Iterator[(Long, Long, Long, String)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[FunnelOut] = {
      var cur = if (st.exists()) st.get()
                else FunnelState(0, Long.MinValue, Long.MinValue)
      val before = cur.stage
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, t, eid, et) =>
        val afterLast = t > cur.t || (t == cur.t && eid > cur.eid)
        if (cur.stage < steps.length && afterLast && et == steps(cur.stage))
          cur = FunnelState(cur.stage + 1, t, eid)
      }
      st.update(cur)
      if (cur.stage != before) Iterator(FunnelOut(uid, cur.stage.toLong))
      else Iterator.empty
    }
  }

  /** [[streamingFunnelSteps]] on the arbitrary-state v2 API
    * (`transformWithState`, Spark 4): per-user [[FunnelState]] lives in
    * a typed `ValueState` backed by the RocksDB state store — the
    * modern replacement for `flatMapGroupsWithState` (TTL-able state
    * variables, timers, state-schema evolution). Same walk, same
    * emit-on-progress contract (spec-pinned to the batch path);
    * requires the RocksDB state store provider on the session.
    */
  def streamingFunnelStepsTws(ev: DataFrame,
                              steps: Seq[String] = Seq("view", "click", "purchase"),
                              tsUsCol: String = "ts_us"): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = ev.sparkSession
    import spark.implicits._
    ev.select(col("user_id").cast("long"), col(tsUsCol).cast("long"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new FunnelProcessor(steps.toArray),
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Click→purchase attribution: every purchase joined to each same-user
    * click in the preceding `withinSec` window. Equi-join on `user_id`
    * with a time-range residual — ONE hash shuffle on the key, never a
    * nested loop. Written against plain frames so the identical
    * function is (a) the oracle-checked batch entry and (b) a true
    * STREAM-STREAM join under Structured Streaming: with watermarks on
    * both inputs, the time-range condition bounds each side's buffered
    * state (Spark evicts rows older than watermark + range), which is
    * what makes an unbounded join feasible at all — the 100-TB
    * streaming analogue of the bounded interval join in
    * [[graft.pipeline.TimeSeries]].
    *
    * `delay_us` is an exact integer µs delta, engine-portable.
    */
  /** The MERGEABLE core of `events_top_movers` (r9): integer-cents
    * revenue per (key, period). A plain groupBy-sum of mergeable
    * counters, so the identical function is (a) the rollup inside the
    * oracle-checked batch entry and (b) a live streaming aggregation
    * (complete/update mode) whose state updates across micro-batches —
    * the momentSums pattern. The lag/rank head ([[topMovers]]) runs on
    * the AGGREGATED series (periods × keys rows), batch-side either way.
    */
  def periodCents(df: DataFrame, keyCol: String, tsUsCol: String,
                  valCol: String,
                  periodUs: Long = 604800000000L): DataFrame =
    df.groupBy(col(keyCol).as("key"),
        expr(s"$tsUsCol div ${periodUs}L").as("period"))
      .agg(sum(round(col(valCol) * 100, 0).cast("long")).as("cents"))

  /** Period-over-period movers over a [[periodCents]] rollup: lag(1)
    * delta per key, ranked by |delta|, top k. Runs on the tiny
    * aggregated series — never raw events.
    */
  def topMovers(rollup: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy("key").orderBy("period")
    rollup.withColumn("prev_cents", lag("cents", 1).over(w))
      .filter(col("prev_cents").isNotNull)
      .withColumn("delta_cents", col("cents") - col("prev_cents"))
      .withColumn("pct_change", when(col("prev_cents") === 0L, 0.0)
        .otherwise(round(col("delta_cents").cast("double") /
          col("prev_cents").cast("double"), 6)))
      .orderBy(abs(col("delta_cents")).desc, col("key"), col("period"))
      .limit(k)
  }

  /** The MERGEABLE core of `events_retention` (r9): the distinct
    * (user, hour-bucket) activity pairs. Dedup state is mergeable, so
    * this runs as a streaming `dropDuplicates` (append mode) as well
    * as a batch distinct; everything downstream ([[retentionMatrix]])
    * operates on the deduped activity table — users × active-hours
    * sized, orders of magnitude below raw events at 100 TB.
    */
  def userHourActivity(df: DataFrame, userCol: String = "user_id",
                       tsUsCol: String = "ts_us",
                       bucketUs: Long = 3600000000L): DataFrame =
    df.select(col(userCol).as("user_id"),
        expr(s"$tsUsCol div ${bucketUs}L").as("hr"))
      .dropDuplicates("user_id", "hr")

  /** Cohort retention matrix over a [[userHourActivity]] table: users
    * bucketed by first-active hour; per (cohort, periods-since) cell,
    * distinct active users. Two partial-agg shuffles + one count.
    */
  def retentionMatrix(activity: DataFrame): DataFrame = {
    // rename the cohort side's key: the self-join otherwise carries the
    // same attribute ids in both children (surfaces as "conflicting
    // references" when the input is a sink-backed view)
    val cohorts = activity.groupBy("user_id").agg(min("hr").as("cohort"))
      .select(col("user_id").as("c_user"), col("cohort"))
    activity.join(cohorts, col("user_id") === col("c_user"))
      .select(col("cohort"), (col("hr") - col("cohort")).as("period"),
        col("user_id"))
      .distinct()
      .groupBy("cohort", "period")
      .agg(count(lit(1)).as("n_users"))
  }

  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      withinSec: Long = 3600): DataFrame = {
    val l = clicks.select(col("user_id"), col("event_id").as("click_id"),
      col("event_time").as("click_time"))
    val r = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("event_time").as("purchase_time"))
    l.join(r,
        col("user_id") === col("p_user") &&
          col("purchase_time") >= col("click_time") &&
          col("purchase_time") <= col("click_time") + expr(s"INTERVAL $withinSec SECONDS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_time")) - unix_micros(col("click_time")))
          .as("delay_us"))
  }
}
