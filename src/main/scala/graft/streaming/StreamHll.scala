package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}
import graft.ops.HllKernel

/** Streaming distinct-count on the graft HLL kernel — the bounded-
  * state answer to "how many distinct users per event type, live":
  * per-key state is the FIXED m-byte register array (1 KiB at p=10)
  * no matter the stream's key cardinality, where an exact
  * distinct-count stream would grow state with every new user.
  *
  * The hash enters state already computed by the ENGINE's `xxhash64`
  * column (the same u64 the batch kernel and the DuckDB oracle
  * spell), register updates are per-item maxima — so the converged
  * stream's registers are BIT-identical to the batch kernel's
  * regardless of micro-batch slicing or restart replay, and the
  * emitted estimates are BIT-equal to the batch gate
  * (`a_hll_kernel`): [[HllKernel.estimateFromRegisterArray]] runs the
  * same integer estimator + linear counting. StreamHllSpec proves
  * stream ≡ batch over a multi-batch MemoryStream replay.
  *
  * `transformWithState` (RocksDB-backed) per the TwsOps forward-path
  * convention; emission per touched key per micro-batch carries a
  * monotone `n_seen` so consumers (and the spec) can order emissions
  * without relying on estimate monotonicity across the
  * linear-counting → raw regime switch.
  */
object StreamHll {
  import HllKernel.{M, MaxRank, P}

  /** (rows folded so far, m register bytes). */
  case class HllState(nSeen: Long, regs: Array[Byte])

  class HllProcessor
      extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long)] {
    @transient private var st: ValueState[HllState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HllState]("hll",
        Encoders.product[HllState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[(String, Long, Long, Long)] = {
      val cur = if (st.exists()) st.get() else HllState(0L, new Array[Byte](M))
      val regs = cur.regs
      var n = cur.nSeen
      rows.foreach { case (_, h) =>
        val idx = (h & (M - 1)).toInt
        val v = h >>> P
        val rank =
          if (v == 0L) MaxRank
          else MaxRank - (64 - java.lang.Long.numberOfLeadingZeros(v))
        if (rank > regs(idx)) regs(idx) = rank.toByte
        n += 1L
      }
      st.update(HllState(n, regs))
      val (zero, est) = HllKernel.estimateFromRegisterArray(regs)
      Iterator.single((key, n, zero, est))
    }
  }

  /** Streaming (or batch) form: per `grpCol` running distinct-`keyCol`
    * estimates, one row per touched key per micro-batch (Update
    * mode). Output: (grp, n_seen, zero_regs, est_e6). */
  def distinctEstimates(events: DataFrame, grpCol: String,
      keyCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col(keyCol).isNotNull)
      .select(col(grpCol).cast("string").as("grp"),
        xxhash64(col(keyCol)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new HllProcessor, TimeMode.None(),
        OutputMode.Update())
      .toDF("grp", "n_seen", "zero_regs", "est_e6")
  }

  /** Batch equivalent of the converged stream — the gate query (the
    * stream_running_stats convention): the kernel's SKETCH-ONLY
    * estimate, which matches the stream on two contracts the full
    * estimate does not — the group key is cast to string exactly like
    * the streaming path, and no exact-distinct witness is computed
    * (the stream never pays that shuffle, so its batch twin must
    * not either). */
  def distinctEstimatesBatch(events: DataFrame, grpCol: String,
      keyCol: String): DataFrame =
    HllKernel.estimateSketchOnly(events, grpCol, keyCol)

  /** DuckDB mirror of [[distinctEstimatesBatch]]. */
  def distinctEstimatesBatchSql(): String =
    s"SELECT grp, zero_regs, est_e6 FROM (\n${HllKernel.estimateSql()}\n) hllb"
}
