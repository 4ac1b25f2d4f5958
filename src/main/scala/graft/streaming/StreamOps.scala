package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming operators over the event stream (SURVEY.md §2
  * C2-C5). Each works on a streaming OR batch DataFrame with columns
  * (userid, eventtype, time[epoch ms], ...) — the streaming specs
  * drive them with MemoryStream, and CBlock checks the same
  * semantics in batch form against DuckDB.
  *
  * State-size posture for 100 TB/day streams: every operator bounds
  * state — windowed aggs and dedup by watermark eviction,
  * sessionization by per-key timeout — so state is O(active keys),
  * never O(history).
  */
object StreamOps {

  /** Watermarked tumbling-window counts per event type (C2). */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("time")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("eventtype"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("eventtype"), col("n"))

  /** Streaming dedup on event id with watermark-bounded state (C4):
    * exactly-once landing for an at-least-once delivery stream (the
    * reference's Firehose retries can duplicate records). */
  def dedupById(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("time")))
      .withWatermark("ts", watermark)
      .dropDuplicates("id")
      .drop("ts")

  /** Failed-login burst detector (C5): sliding windows per (realm,
    * user) counting error events; emits windows crossing `threshold`.
    */
  def burstDetect(events: DataFrame, threshold: Long = 3,
      watermark: String = "30 minutes", windowLen: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events
      // the watermark advances from error traffic only: Catalyst
      // pushes this filter below the EventTimeWatermark node, so
      // windows close when newer *errors* arrive (window emission is
      // gated on the stream being aggregated, not on total traffic)
      .filter(col("error").isNotNull)
      .withColumn("ts", timestamp_millis(col("time")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("realmid"), col("userid"))
      .agg(count(lit(1)).as("n_errors"))
      .filter(col("n_errors") >= threshold)
      .select(col("window.start").as("window_start"), col("realmid"),
        col("userid"), col("n_errors"))

  /** Stream-stream interval join (C9): each PURCHASE event joins the
    * same user's CLICK events from the preceding `windowMs`. Both
    * sides carry watermarks and the join condition bounds event time
    * on BOTH ends, so Spark can evict join state older than
    * watermark − window on each side — state stays O(active window),
    * never O(stream history). Works on a streaming or batch frame.
    */
  def clickToPurchaseJoin(events: DataFrame,
      watermark: String = "30 minutes",
      windowMs: Long = 10 * 60 * 1000L,
      joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("eventtype") === "CLICK")
      .select(col("userid").as("c_user"), col("id").as("click_id"),
        timestamp_millis(col("time")).as("c_ts"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("eventtype") === "PURCHASE")
      .select(col("userid").as("p_user"), col("id").as("purchase_id"),
        timestamp_millis(col("time")).as("p_ts"))
      .withWatermark("p_ts", watermark)
    // "left_outer": purchases with NO prior click still emit (null
    // click columns) once the watermark proves no match can arrive —
    // the attribution-report shape where unattributed conversions
    // must appear too
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMs MILLISECOND") &&
        col("c_ts") < col("p_ts"),
      joinType)
      .select(col("purchase_id"), col("click_id"), col("p_user").as("userid"),
        col("p_ts"), col("c_ts"))
  }

  /** Input row for sessionization (`ts` is the watermarked event-time
    * column — it must survive into the grouped Dataset or Spark
    * rejects the event-time timeout). */
  case class SessionEvent(userid: String, time: Long, ts: java.sql.Timestamp)
  /** Mutable per-key state. */
  case class SessionState(start: Long, end: Long, n: Int)
  /** Emitted session summary. */
  case class SessionOut(userid: String, start: Long, end: Long, n_events: Int)

  /** Gap-based sessionization (C3) via flatMapGroupsWithState:
    * a session closes when no event arrives for `gapMs` (event-time,
    * watermark-driven timeout). State per active user only.
    *
    * Boundary rule matches session_window and CBlock's oracles: an
    * event exactly `gapMs` after the session end still MERGES into
    * the session; only a strictly larger gap starts a new one
    * (session_window merges touching windows — SessionBoundarySpec
    * pins this empirically).
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import spark.implicits._

    def fn(userid: String, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(userid, s.start, s.end, s.n))
      } else {
        var out = List.empty[SessionOut]
        var cur = state.getOption
        for (e <- rows.toSeq.sortBy(_.time)) {
          cur match {
            case Some(s) if e.time - s.end <= gapMs =>
              cur = Some(s.copy(end = e.time, n = s.n + 1))
            case Some(s) =>
              out ::= SessionOut(userid, s.start, s.end, s.n)
              cur = Some(SessionState(e.time, e.time, 1))
            case None =>
              cur = Some(SessionState(e.time, e.time, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close the session once the watermark passes end + gap
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        out.reverseIterator
      }
    }

    events
      .withColumn("ts", timestamp_millis(col("time")))
      .withWatermark("ts", watermark)
      .select(col("userid"), col("time"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.userid)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Gap-based sessionization on the transformWithState API (Spark
    * 4's arbitrary-state successor to flatMapGroupsWithState): typed
    * ValueState + explicit event-time timers. Same boundary rule as
    * [[sessionize]] (exact-gap merges). Requires the RocksDB state
    * store provider — which is also the right provider at scale
    * (state spills to local disk instead of executor heap, changelog
    * checkpointing bounds commit latency).
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, SessionEvent, SessionOut] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      var cur = if (session.exists()) {
        val s = session.get()
        // this batch supersedes the persisted close timer
        getHandle.deleteTimer(s.end + gapMs)
        Some(s)
      } else None
      for (e <- rows.toSeq.sortBy(_.time)) {
        cur match {
          case Some(s) if e.time - s.end <= gapMs =>
            cur = Some(s.copy(end = e.time, n = s.n + 1))
          case Some(s) =>
            out ::= SessionOut(key, s.start, s.end, s.n)
            cur = Some(SessionState(e.time, e.time, 1))
          case None =>
            cur = Some(SessionState(e.time, e.time, 1))
        }
      }
      cur.foreach { s =>
        session.update(s)
        getHandle.registerTimer(s.end + gapMs)
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (session.exists()) {
        val s = session.get()
        session.clear()
        Iterator(SessionOut(key, s.start, s.end, s.n))
      } else Iterator.empty
    }
  }

  /** [[sessionize]] re-expressed with transformWithState — the query
    * session must run the RocksDB state store provider
    * (spark.sql.streaming.stateStore.providerClass). */
  def sessionizeTws(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withColumn("ts", timestamp_millis(col("time")))
      .withWatermark("ts", watermark)
      .select(col("userid"), col("time"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.userid)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
