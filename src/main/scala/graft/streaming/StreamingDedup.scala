package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.{Hashing, TextKernel}
import graft.model.Turn

/**
 * Structured Streaming ingestion path (SURVEY.md §2.10: the reference is
 * batch-only; this is the incremental-recompute analog of its
 * hash-validated caches, re-expressed as stateful streaming).
 *
 * Turns arrive as a stream; per-conversation state accumulates an
 * incremental signature (turn count, rolling content hash, simhash of the
 * token stream so far) via mapGroupsWithState. Event-time watermark bounds
 * state; a processing-time timeout finalizes idle conversations. Downstream,
 * finalized fingerprints feed the same LSH band join as batch.
 *
 * At scale this runs per-partition with state in the state store backend —
 * the keyBy(conv_id) shuffle is the only wide edge.
 */
object StreamingDedup {

  case class ConvState(nTurns: Int, contentHash: Long, simhashVotes: Array[Int],
                       lastTs: Long)

  case class ConvFingerprint(conv_id: String, n_turns: Int, content_hash: Long,
                             simhash: Long, last_ts: Timestamp, finalized: Boolean)

  private def fold(st: ConvState, t: Turn): ConvState = {
    val toks = TextKernel.tokens(TextKernel.normalize(t.text))
    val votes = st.simhashVotes.clone()
    toks.foreach { tok =>
      val h = Hashing.xxh64(tok, TextKernel.TokenSeed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    // order-sensitive rolling content hash keyed by turn_idx so late/out-of-
    // order arrivals of DIFFERENT turns still produce a deterministic value
    val ch = st.contentHash ^ Hashing.xxh64Long(
      Hashing.xxh64(t.text, TextKernel.TokenSeed) * 31 + t.turn_idx, 0x57AEA17L)
    ConvState(st.nTurns + 1, ch, votes,
      math.max(st.lastTs, if (t.ts == null) 0L else t.ts.getTime))
  }

  private def toFingerprint(id: String, st: ConvState, finalized: Boolean): ConvFingerprint = {
    var sim = 0L
    var b = 0
    while (b < 64) { if (st.simhashVotes(b) > 0) sim |= (1L << b); b += 1 }
    ConvFingerprint(id, st.nTurns, st.contentHash, sim,
      new Timestamp(st.lastTs), finalized)
  }

  /** Incremental per-conversation fingerprints over a (possibly streaming)
    * Dataset[Turn]. Emits an updated fingerprint per group per trigger.
    * Pass idleTimeoutMs = Some(ms) to finalize + evict idle conversations —
    * note a processing-time timeout makes Spark schedule batches
    * continuously (state expiry checks), so leave it None for
    * processAllAvailable-style tests and bounded backfills. */
  def incrementalFingerprints(turns: Dataset[Turn],
                              idleTimeoutMs: Option[Long] = None): Dataset[ConvFingerprint] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val timeoutConf = if (idleTimeoutMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    turns.groupByKey(_.conv_id)
      .mapGroupsWithState[ConvState, ConvFingerprint](timeoutConf) {
        case (id, it, state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            toFingerprint(id, st, finalized = true)
          } else {
            val st0 = state.getOption.getOrElse(
              ConvState(0, 0L, new Array[Int](64), 0L))
            // deterministic fold order within the batch: sort by turn_idx
            val st = it.toSeq.sortBy(_.turn_idx).foldLeft(st0)(fold)
            state.update(st)
            idleTimeoutMs.foreach(ms => state.setTimeoutDuration(ms))
            toFingerprint(id, st, finalized = false)
          }
      }
  }

  /** Watermarked sliding-window turn-rate aggregation (event-time windows —
    * the streaming analog of the per-stage funnel metrics). */
  def turnRates(turns: DataFrame): DataFrame =
    turns
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        approx_count_distinct(col("conv_id")).as("n_convs"))
}
