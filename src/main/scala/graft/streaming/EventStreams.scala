package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.kv.{KvState, Op}

/** Structured Streaming surface — the reference's replicated-log → state
  * machine pipeline (SURVEY §2.6, §3.3) re-expressed the Spark way:
  *
  *   - The Raft log's total order + durability
  *     (/root/reference/src/raft/raft.go:442-459 Start, :242-256 applyLog)
  *     is delegated to an ordered, replayable source + streaming checkpoint
  *     (the role of `Persister`, /root/reference/src/raft/persister.go:33-58).
  *   - The KV service's in-memory map becomes keyed `mapGroupsWithState`
  *     state; `maxraftstate` snapshotting maps to the state store's own
  *     checkpoint/compaction.
  *
  * At scale: state is hash-partitioned by key across executors, the same
  * sharding the reference builds by hand in shardkv; RocksDB state store +
  * changelog checkpointing is the production config knob, not a code change.
  */
object EventStreams {

  /** Per-key KV state machine fold with exactly-once client semantics
    * (K1-K3): applies ops in ts order *within each micro-batch*, deduping on
    * per-client high-water `seq` against state carried across batches (the
    * duplicate table every kvraft implementation keeps). Each client mark
    * carries its last-activity event time, and marks idle longer than
    * `dedupHorizonMs` (relative to the key's newest op) are evicted — so
    * state per key is bounded by the number of RECENTLY ACTIVE clients, not
    * all clients ever seen. The trade-off is the same watermark contract as
    * [[dedupStream]]: a retry arriving after the horizon re-applies. */
  final case class ClientMark(seq: Long, lastTs: Long)
  final case class KvSessionState(value: String, marks: Map[Long, ClientMark])

  val DefaultDedupHorizonMs: Long = 24L * 3600 * 1000

  def applyOpsToState(dedupHorizonMs: Long)(key: String, ops: Iterator[Op],
                      state: GroupState[KvSessionState]): KvState = {
    val st = state.getOption.getOrElse(KvSessionState("", Map.empty))
    var value = st.value
    var marks = st.marks
    var maxTs = Long.MinValue
    ops.toArray.sortBy(o => (o.ts, o.clientId, o.seq)).foreach { o =>
      if (o.ts > maxTs) maxTs = o.ts
      val prev = marks.get(o.clientId)
      if (prev.forall(_.seq < o.seq)) {
        marks = marks.updated(o.clientId, ClientMark(o.seq, o.ts))
        o.op match {
          case "put"    => value = o.value
          case "append" => value = value + o.value
          case _        => ()
        }
      } else {
        // a retry proves the client is alive: refresh its mark's clock so an
        // actively-retrying client is never evicted mid-conversation
        marks = marks.updated(o.clientId,
          ClientMark(prev.get.seq, math.max(prev.get.lastTs, o.ts)))
      }
    }
    if (maxTs != Long.MinValue)
      marks = marks.filter { case (_, m) => m.lastTs >= maxTs - dedupHorizonMs }
    state.update(KvSessionState(value, marks))
    KvState(key, value)
  }

  /** Streaming KV store: an op-log stream → per-key materialized state.
    * Update-mode output: one row per key touched in the micro-batch. */
  def kvStore(ops: Dataset[Op],
              dedupHorizonMs: Long = DefaultDedupHorizonMs): Dataset[KvState] = {
    val spark = ops.sparkSession
    import spark.implicits._
    ops.groupByKey(_.key)
      .mapGroupsWithState[KvSessionState, KvState](GroupStateTimeout.NoTimeout())(
        applyOpsToState(dedupHorizonMs) _)
  }

  /** Tumbling-window event aggregation with a watermark — the streaming twin
    * of [[graft.relational.RelationalQueries.evHourlyAgg]]. Late data beyond
    * 1 hour is dropped deterministically by the watermark. */
  def hourlyAgg(events: DataFrame): DataFrame = {
    val withTs = events.withColumn("ts_ts", timestamp_millis(expr("ts DIV 1000000")))
    withTs
      .withWatermark("ts_ts", "1 hour")
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(unix_millis(col("window.start")).as("hour_ms"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  // ------------------------------------------------- streaming sessionize

  final case class SessIn(user_id: Long, ms: Long, ts_ts: java.sql.Timestamp)
  /** idx = 1-based index of the open (or last closed) session; n == 0 marks
    * "no open session" (kept so later sessions of the user keep counting). */
  final case class SessState(idx: Long, start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, session_idx: Long, n_events: Long,
                           start_ms: Long, end_ms: Long)

  /** Streaming twin of
    * [[graft.relational.RelationalQueries.evSessionize]]: gap-based sessions
    * via `flatMapGroupsWithState` with an event-time timeout. A session is
    * emitted when a same-user event arrives past the gap, or when the
    * watermark passes `end + gap` (Spark's no-data micro-batch fires the
    * timeout). Same output schema and 1-based session numbering as the batch
    * query. Late events beyond the watermark are dropped by the engine —
    * the deterministic streaming trade-off. */
  def sessionize(events: Dataset[SessIn], gapMs: Long = 30L * 60 * 1000): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts_ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[SessIn], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.update(SessState(st.idx, 0, 0, 0)) // closed; keep the counter
            if (st.n > 0) Iterator.single(Session(user, st.idx, st.n, st.start, st.last))
            else Iterator.empty
          } else {
            var st = state.getOption.getOrElse(SessState(0, 0, 0, 0))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            rows.toArray.sortBy(_.ms).foreach { e =>
              if (st.n == 0) st = SessState(st.idx + 1, e.ms, e.ms, 1)
              else if (e.ms - st.last > gapMs) {
                out += Session(user, st.idx, st.n, st.start, st.last)
                st = SessState(st.idx + 1, e.ms, e.ms, 1)
              } else st = st.copy(last = math.max(st.last, e.ms), n = st.n + 1)
            }
            state.update(st)
            if (st.n > 0) state.setTimeoutTimestamp(
              math.max(st.last + gapMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  final case class TransIn(user_id: Long, event_type: String, ms: Long,
                           event_id: Long)
  final case class TransState(last_type: String)
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Streaming twin of
    * [[graft.relational.RelationalQueries.evTransitions]]: the (from → to)
    * transition pairs emitted ON ARRIVAL, with only each user's LAST event
    * type held as state — one tiny row per user forever, no timeout needed
    * (the state never grows with history, unlike sessionize's open
    * session). Within a micro-batch rows fold in (ms, event_id) order —
    * the batch query's exact window order; across batches the fold
    * assumes time-ordered arrival, the same contract every stateful op
    * here shares (an event older than the folded state would register a
    * transition out of order). Downstream aggregation of the pairs is
    * ordinary streaming groupBy — counts match the batch matrix. */
  def transitionsStream(events: Dataset[TransIn]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[TransIn], state: GroupState[TransState]) =>
          var last = state.getOption.map(_.last_type).orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          rows.toArray.sortBy(e => (e.ms, e.event_id)).foreach { e =>
            if (last != null) out += Transition(user, last, e.event_type)
            last = e.event_type
          }
          if (last != null) state.update(TransState(last))
          out.iterator
      }
  }

  final case class Scd2State(last_type: String, since_ms: Long, version: Int)
  final case class Scd2Row(user_id: Long, version: Int, event_type: String,
                           valid_from_ms: Long, valid_to_ms: Long)

  /** Streaming twin of [[graft.relational.RelationalQueries.evScd2]]: the
    * SCD2 history built ON ARRIVAL — per-user state carries the OPEN
    * interval (current type, its start, its version); an arriving CHANGE
    * closes the previous interval (emitting the finished SCD2 row — the
    * natural Append-mode contract: a closed interval is immutable) and
    * opens the next. Repeats fold into the open state and emit nothing,
    * exactly the batch collapse rule. State is one tiny row per user
    * forever — the transitionsStream economics; the open interval itself
    * never emits (batch's sentinel-closed last row), which is the honest
    * streaming semantics: you can't publish an interval that is still
    * being lived. Parity: streamed rows == batch rows minus each user's
    * sentinel row (spec-pinned, micro-batch-boundary-spanning). */
  def scd2Stream(events: Dataset[TransIn]): Dataset[Scd2Row] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[TransIn], state: GroupState[Scd2State]) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
          rows.toArray.sortBy(e => (e.ms, e.event_id)).foreach { e =>
            if (st == null) st = Scd2State(e.event_type, e.ms, 1)
            else if (st.last_type != e.event_type) {
              out += Scd2Row(user, st.version, st.last_type, st.since_ms, e.ms)
              st = Scd2State(e.event_type, e.ms, st.version + 1)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  final case class CdcIn(user_id: Long, ms: Long, event_id: Long,
                         event_type: String, value: Double)
  final case class CdcState(ms: Long, event_id: Long, op: String,
                            value: Double, n: Long)
  final case class CdcSnap(user_id: Long, op: String, last_value: Double,
                           last_ms: Long, n_changes: Long)

  /** Streaming twin of [[graft.relational.RelationalQueries.qCdcApply]]:
    * the CDC snapshot maintained ON ARRIVAL. Unlike the transition/SCD2
    * twins, last-writer-wins is a COMMUTATIVE max-fold — (ms, event_id)
    * argmax plus a count — so this state is correct under ARBITRARY
    * arrival order, in and across micro-batches, with no watermark
    * contract needed: a late upsert under the current seq folds into the
    * count and changes nothing, exactly as the batch argmax would have
    * ignored it. Update-mode output: one snapshot row per user touched in
    * the micro-batch; tombstoned users emit with op='D' (the subscriber's
    * delete signal) rather than vanishing — a retraction has to be SAID
    * downstream, while the batch snapshot can simply omit the row. */
  def cdcStream(events: Dataset[CdcIn]): Dataset[CdcSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcSnap](GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[CdcIn], state: GroupState[CdcState]) =>
          var st = state.getOption.orNull
          rows.foreach { e =>
            val newer = st == null || e.ms > st.ms ||
              (e.ms == st.ms && e.event_id > st.event_id)
            val n = (if (st == null) 0L else st.n) + 1
            st =
              if (newer)
                CdcState(e.ms, e.event_id,
                  if (e.event_type == "error") "D" else "U", e.value, n)
              else st.copy(n = n)
          }
          state.update(st)
          CdcSnap(user, st.op, st.value, st.ms, st.n)
      }
  }

  final case class AttrIn(user_id: Long, ms: Long, event_id: Long,
                          event_type: String, value: Double)
  final case class AttrState(lco: Long, fco: Long)
  final case class AttrOut(user_id: Long, purchase_id: Long, purchase_ms: Long,
                           value: Double, click_id: Option[Long],
                           click_ms: Option[Long], gap_ms: Option[Long],
                           attributed: Boolean, first_click_id: Option[Long])

  /** Streaming twin of [[graft.relational.RelationalQueries.evAttribution]]:
    * last/first-touch attribution ON ARRIVAL. State per user is two packed
    * longs — the max and min click ord (ms·10⁶ + event_id) seen so far —
    * so a purchase is attributed the moment it arrives, against exactly
    * the clicks that preceded it in the composite order (rows are
    * processed (ms, event_id)-sorted within each micro-batch, the
    * transition-twin contract: arrival slices respect event time). An
    * attribution, once emitted, is immutable — the natural Append-mode
    * row, unlike the CDC snapshot whose rows revise. */
  def attributionStream(events: Dataset[AttrIn],
                        lookbackMs: Long = 7L * 24 * 3600 * 1000): Dataset[AttrOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[AttrIn], state: GroupState[AttrState]) =>
          var st = state.getOption.getOrElse(AttrState(-1L, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[AttrOut]
          rows.toArray.sortBy(e => (e.ms, e.event_id)).foreach { e =>
            require(e.event_id < 1000000L,
              "attributionStream ord overflow: event_id >= 1e6 breaks the composite")
            val ord = e.ms * 1000000L + e.event_id
            e.event_type match {
              case "click" =>
                st = AttrState(math.max(st.lco, ord),
                  if (st.fco < 0) ord else math.min(st.fco, ord))
              case "purchase" =>
                val clicked = st.lco >= 0
                val gap = if (clicked) Some(e.ms - st.lco / 1000000L) else None
                out += AttrOut(user, e.event_id, e.ms, e.value,
                  if (clicked) Some(st.lco % 1000000L) else None,
                  if (clicked) Some(st.lco / 1000000L) else None,
                  gap, gap.exists(_ <= lookbackMs),
                  if (st.fco >= 0) Some(st.fco % 1000000L) else None)
              case _ => ()
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class FunIn(user_id: Long, event_type: String, ms: Long,
                         ts_ts: java.sql.Timestamp)
  final case class FunnelState(view: Long, click: Long, purchase: Long,
                               last: Long)
  final case class FunnelRow(user_id: Long, view_ms: Option[Long],
                             click_ms: Option[Long], purchase_ms: Option[Long],
                             stage: Int)

  /** Streaming twin of
    * [[graft.relational.RelationalQueries.evFunnel]]: per-user funnel stage
    * held in `flatMapGroupsWithState`, the final row emitted when the
    * watermark passes the user's last activity + `quietMs` (event-time
    * timeout — the same end-of-funnel mechanics as [[sessionize]]'s session
    * close). Within a micro-batch events fold in ms order, and the stage
    * updates are min-monotone (a lower view can only LOWER the qualifying
    * click, never invalidate it), so in-batch disorder is handled exactly;
    * ACROSS batches the fold assumes the watermark contract every stateful
    * op here shares — an event older than already-folded state (late beyond
    * the watermark) is dropped by the engine, and a qualifying stage event
    * that was skipped because its predecessor stage arrived in a later
    * batch is the deterministic cost of that contract. */
  def funnelStream(events: Dataset[FunIn],
                   quietMs: Long = 30L * 60 * 1000): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts_ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[FunIn], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove() // a later event starts a fresh funnel era
            def opt(v: Long) = if (v < 0) None else Some(v)
            val stage = if (st.purchase >= 0) 3 else if (st.click >= 0) 2
              else if (st.view >= 0) 1 else 0
            Iterator.single(FunnelRow(user, opt(st.view), opt(st.click),
              opt(st.purchase), stage))
          } else {
            var st = state.getOption.getOrElse(FunnelState(-1, -1, -1, -1))
            rows.toArray.sortBy(_.ms).foreach { e =>
              e.event_type match {
                case "view" if st.view < 0 || e.ms < st.view =>
                  st = st.copy(view = e.ms)
                case "click" if st.view >= 0 && e.ms > st.view &&
                    (st.click < 0 || e.ms < st.click) =>
                  st = st.copy(click = e.ms)
                case "purchase" if st.click >= 0 && e.ms > st.click &&
                    (st.purchase < 0 || e.ms < st.purchase) =>
                  st = st.copy(purchase = e.ms)
                case _ => ()
              }
              st = st.copy(last = math.max(st.last, e.ms))
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.last + quietMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming exact deduplication — the streaming twin of
    * [[graft.dedup.Dedup.exact]] for a training-data ingest pipeline where
    * the same document (or event) may be delivered more than once, across
    * micro-batches. `dropDuplicatesWithinWatermark` keys the dedup state on
    * `idCols` and — unlike plain `dropDuplicates`, whose state grows without
    * bound — evicts state once the watermark passes, so the query runs
    * forever at a bounded footprint. The guarantee is exactly the ingest
    * contract: duplicates arriving within `delay` of each other are removed;
    * a replay older than the watermark is late data, dropped wholesale. */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  delay: String = "1 hour"): DataFrame =
    events
      .withColumn("ts_ts", timestamp_millis(expr("ts DIV 1000000")))
      .withWatermark("ts_ts", delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Per-hour trending event types: the windowed-agg + finalized-window
    * top-k pattern. The stateful half is a plain watermarked tumbling-window
    * count (append mode emits each (window, type) exactly once, when the
    * watermark closes the window); the RANKING half runs sink-side in
    * `foreachBatch` over those finalized rows — rank-within-window needs all
    * of a window's groups, which append mode guarantees arrive together, so
    * no second stateful operator is required. Returns the agg stream; pair
    * with [[topKOfFinalized]] in the sink. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events.withColumn("ts_ts", timestamp_millis(expr("ts DIV 1000000")))
      .withWatermark("ts_ts", "1 hour")
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n_events"))

  /** Sink-side ranking of finalized windows: top-k event types per hour.
    * Deterministic tie-break on event_type. */
  def topKOfFinalized(finalized: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_ms")).orderBy(col("n_events").desc, col("event_type"))
    finalized.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("hour_ms"), col("event_type"), col("n_events"), col("rank").cast("int").as("rank"))
  }

  // ------------------------------------------------ streaming near-dup LSH

  final case class BandedDoc(band: Int, bh: Long, doc_id: Long, sig: Array[Long])
  final case class StreamPair(d1: Long, d2: Long, est_jaccard: Double)
  final case class BucketState(members: Seq[(Long, Array[Long])])

  /** Streaming twin of [[graft.dedup.Dedup.minhashLsh]] for an ingest
    * pipeline: as documents arrive, each is minhashed (the same fused
    * codegen `minhash_tokens` expression — Catalyst expressions run
    * unchanged on streams), exploded to its LSH band buckets, and matched
    * via `flatMapGroupsWithState` keyed by (band, bucket) against the
    * bucket's previously-seen signatures. Emits a pair the moment the
    * SECOND member of a near-dup pair arrives — across micro-batches,
    * restart-safe through the state store.
    *
    * Contract differences vs the batch pass, both inherent to streaming:
    * a pair colliding in multiple bands is emitted once per colliding band
    * (batch dropDuplicates is a second stateful op; dedup downstream or in
    * the sink), and a bucket past `maxBucket` stops ADMITTING members
    * (batch drops the whole bucket retroactively — a stream cannot). State
    * per bucket is <= maxBucket signatures. */
  def nearDupPairsStream(docs: DataFrame, threshold: Double = 0.7,
                         maxBucket: Int = 64): Dataset[StreamPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.dedup.Dedup
    val banded = docs.select(
        col("doc_id"),
        graft.functions.MinHash.minhashTokensCol(
          graft.text.TextAnalysis.tokensCol(lower(col("text")))).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(Dedup.bandHashesCol(col("sig"))).as(Seq("band", "bh")))
      .select(col("band"), col("bh"), col("doc_id"), col("sig"))
      .as[BandedDoc]
    banded.groupByKey(b => (b.band, b.bh))
      .flatMapGroupsWithState[BucketState, StreamPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          var members = state.getOption.map(_.members).getOrElse(Seq.empty)
          val out = Seq.newBuilder[StreamPair]
          // deterministic within a micro-batch regardless of arrival order
          rows.toArray.sortBy(_.doc_id).foreach { d =>
            members.foreach { case (id, sig) =>
              if (id != d.doc_id) {
                var eq = 0
                var i = 0
                while (i < sig.length) { if (sig(i) == d.sig(i)) eq += 1; i += 1 }
                val est = eq.toDouble / sig.length
                if (est >= threshold)
                  out += StreamPair(math.min(id, d.doc_id), math.max(id, d.doc_id), est)
              }
            }
            if (members.size < maxBucket) members = members :+ (d.doc_id -> d.sig)
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }

  /** STREAM-STREAM range join — the one Structured Streaming join kind the
    * surface lacked: purchases joined to the same user's views within the
    * trailing hour, BOTH sides watermarked so the join state is bounded
    * (the engine evicts view rows once the watermark passes their event
    * time + the 1 h range — at any stream length the state holds roughly
    * one watermark-window of views, never the history).
    *
    * Twin of the batch [[graft.relational.RelationalQueries.evRangeJoin]]
    * BEFORE its aggregation: emits the matched (purchase, view) pairs.
    * INNER join by design — a left-outer stream-stream join can only emit
    * its null-extended rows after the watermark closes a purchase's match
    * window, so a bounded replay would hold the tail purchases in state
    * forever; the parity spec compares against the batch join's matched
    * rows, which inner equals exactly. */
  def rangeJoinStream(events: DataFrame, windowMs: Long = 3600000L): DataFrame = {
    val base = events.select(col("user_id"), expr("ts DIV 1000000").as("ms"),
      col("event_id"), col("event_type"),
      timestamp_millis(expr("ts DIV 1000000")).as("ts_ts"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("pms"),
        col("event_id").as("purchase_id"), col("ts_ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ms").as("vms"),
        col("ts_ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    purchases.join(views,
        // MILLISECONDS, not a /1000 SECONDS truncation: any windowMs that
        // is not a whole second would silently shrink the window and break
        // parity with the batch twin's exact ms arithmetic
        expr(s"""v_user = user_id AND
                 v_ts >= p_ts - INTERVAL $windowMs MILLISECONDS AND
                 v_ts < p_ts"""))
      .select(col("user_id"), col("purchase_id"), col("pms").as("purchase_ms"),
        col("vms").as("view_ms"))
  }

  /** Run a streaming query over the fixture events *as a stream* (one file
    * source micro-batch) into an in-memory sink; returns the materialized
    * result. Used by tests to prove batch/stream parity. */
  def runOnce(spark: SparkSession, dir: String, name: String,
              build: DataFrame => DataFrame,
              outputMode: OutputMode = OutputMode.Append()): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // layout-detecting source (single-file driver fixtures vs directory
    // probe fixtures — see Tables.streamSource). Same ts normalization as
    // the batch loader (nanos BIGINT whatever the fixture's physical
    // timestamp unit) so every downstream `ts DIV` keeps its contract.
    val stream = graft.Tables.normalizeEventTs(
      graft.Tables.streamSource(spark, dir, "events"))
    val q = build(stream).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Streaming KV append-fold over the fixture events, memory-sink result.
    * Parity target: [[graft.kv.OpLog.appendFold]] restricted to final values. */
  def runKvStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    runOnce(spark, dir, "kv_stream", df =>
      kvStore(df.select(
        expr("ts DIV 1000000").as("ts"),
        col("user_id").as("clientId"),
        col("event_id").as("seq"),
        lit("append").as("op"),
        col("user_id").cast("string").as("key"),
        col("event_id").cast("string").as("value")).as[Op]).toDF(),
      OutputMode.Update())
  }
}
