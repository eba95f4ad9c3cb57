package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time streaming operators over the events shape (user_id, ts,
  * value, ...): session-window aggregation and the watermarked
  * stream-stream interval join — the two Structured Streaming primitives
  * the keyed-state pipelines (FraudStream/CorpusStream) don't cover.
  * Both are pure declarative plans: Spark's streaming state store handles
  * session merge and join-state eviction, bounded by the watermarks.
  */
object EventStream {

  /** Per-user event-time session aggregation: events closer than `gap`
    * merge into one session; a session [first, last + gap) finalizes —
    * and in Append mode EMITS — once the watermark passes its end, after
    * which its state is dropped and later stragglers cannot resurrect it.
    * This is the streaming twin of the batch gap-break sessionization
    * (q_sessionize / q_window_session): same gap semantics, but with
    * BOUNDED state (open sessions within the watermark horizon) instead
    * of a full-history window — the only formulation that survives an
    * unbounded stream.
    *
    * Input needs (user_id, ts TIMESTAMP, value DOUBLE); output one row
    * per finalized session: (user_id, session_start, session_end,
    * n_events, total_value).
    */
  def sessionAgg(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** Watermarked stream-stream interval join: pair each purchase with the
    * error events of the SAME user whose event time lies within
    * ±`toleranceSec` of the purchase — the correlation screen ("which
    * failures surround this transaction") that a point lookup cannot
    * express because BOTH sides stream. The time-bound join condition is
    * what makes state finite: with both sides watermarked, Spark evicts a
    * buffered row once the other side's watermark passes its last
    * possible match time (ts + tolerance), so state is
    * O(rate × (watermark + tolerance)), independent of stream age.
    *
    * Inputs: purchases (user_id, p_ts, amount), errors (e_user, e_ts).
    * Output: (user_id, p_ts, amount, e_ts, lag_sec) for every in-window
    * pair, Append mode.
    */
  def intervalJoin(purchases: DataFrame, errors: DataFrame,
      toleranceSec: Int, watermark: String, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner|left_outer, got $joinType")
    val p = purchases.withWatermark("p_ts", watermark)
    val e = errors.withWatermark("e_ts", watermark)
    p.join(e,
        p("user_id") === e("e_user") &&
        e("e_ts") >= p("p_ts") - expr(s"INTERVAL $toleranceSec SECONDS") &&
        e("e_ts") <= p("p_ts") + expr(s"INTERVAL $toleranceSec SECONDS"),
        joinType)
      .select(p("user_id"), col("p_ts"), col("amount"), col("e_ts"),
        (col("e_ts").cast("long") - col("p_ts").cast("long")).as("lag_sec"))
  }

  /** LEFT OUTER variant of [[intervalJoin]]: purchases with NO error in
    * their ±tolerance window STILL emit — with null error columns — but
    * only once the error-side watermark passes p_ts + tolerance, i.e.
    * once absence is PROVEN rather than merely unobserved. This
    * "cleared after the deadline" semantics (no failure surrounded the
    * transaction) is the streaming twin of an anti-join screen, and the
    * delayed-null emission is the state-machinery fact the spec pins:
    * a null twin must never race ahead of a match that is still
    * possible.
    */
  def intervalJoinCleared(purchases: DataFrame, errors: DataFrame,
      toleranceSec: Int, watermark: String): DataFrame =
    intervalJoin(purchases, errors, toleranceSec, watermark, "left_outer")
}
