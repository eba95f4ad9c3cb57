package graft.streaming

import graft.model._
import graft.streaming.FraudStream.CardState
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** The K3 classifier on Spark 4's arbitrary-stateful-processing API
  * (`transformWithState` / `StatefulProcessor`) — the successor to
  * `flatMapGroupsWithState` used by [[FraudStream.classify]]. Both paths
  * share the same pure per-card fold ([[FraudStream.processCard]]), so the
  * labels and state trajectories are identical by construction and
  * TwsSpec asserts it end-to-end on a MemoryStream.
  *
  * Why it matters at scale: transformWithState runs on the RocksDB state
  * store with fine-grained typed state (value/list/map), supports state
  * TTL and timers, and decouples state schema from the function — the API
  * Spark is standardizing on for 100 TB streaming state (the reference's
  * HBase lookup table, re-expressed: SURVEY §2.9 K3, HBaseTransLink.java:32-81).
  */
class FraudClassifierProcessor(
    zipBc: Broadcast[Map[String, (Double, Double)]],
    cfg: FraudConfig,
) extends StatefulProcessorWithInitialState[Long, Transaction, LabeledTransaction, CardState] {

  @transient private var state: ValueState[CardState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState("card_state", Encoders.product[CardState], TTLConfig.NONE)

  override def handleInitialState(key: Long, initial: CardState, timers: TimerValues): Unit =
    state.update(initial)

  override def handleInputRows(key: Long, rows: Iterator[Transaction],
      timers: TimerValues): Iterator[LabeledTransaction] = {
    val st0 = if (state.exists()) state.get() else CardState(None, None, None, None)
    val (out, st1) = FraudStream.processCard(st0, rows.toSeq, zipBc.value, cfg)
    state.update(st1)
    out.iterator
  }
}

object FraudStreamTws {

  /** Drop-in sibling of [[FraudStream.classify]] on the transformWithState
    * API (requires the RocksDB state store provider when streaming).
    */
  def classify(
      txns: Dataset[Transaction],
      lookupSnapshot: Dataset[CardLookup],
      zipBc: Broadcast[Map[String, (Double, Double)]],
      cfg: FraudConfig = FraudConfig(),
  ): Dataset[LabeledTransaction] = {
    val spark = txns.sparkSession
    import spark.implicits._
    val initial = lookupSnapshot.groupByKey(_.card_id).mapValues(FraudStream.seedState(_, cfg))
    txns.groupByKey(_.card_id)
      .transformWithState(
        new FraudClassifierProcessor(zipBc, cfg),
        TimeMode.None(),
        OutputMode.Append(),
        initial,
      )
  }
}
