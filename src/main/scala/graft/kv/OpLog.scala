package graft.kv

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One operation in a KV command log — the record the kvraft client protocol
  * implies (/root/reference/src/kvraft/common.go:12-33: key, value, op,
  * clientId-equivalent, request id). `ts` is the total-order position the
  * reference gets from its replicated Raft log
  * (/root/reference/src/raft/raft.go:67-71: commands delivered in index
  * order); in Spark the ordered durable log is the storage layer's job and we
  * consume it as data.
  */
final case class Op(ts: Long, clientId: Long, seq: Long,
                    op: String, key: String, value: String)

/** Final state of one key after folding its ops. */
final case class KvState(key: String, value: String)

/** Batch materialization of the KV store semantics (K1-K3 of SURVEY §2.5):
  *   - Put overwrites; Append concatenates (NextValue = prev + val,
  *     /root/reference/src/kvraft/test_test.go:77-79); Get reads; missing
  *     key = "" (/root/reference/src/kvraft/client.go:32).
  *   - Exactly-once under client retries: duplicate (clientId, seq) commands
  *     are applied once (the invariant checkClntAppends enforces,
  *     /root/reference/src/kvraft/test_test.go:83-100).
  *
  * Distribution: one shuffle on `key` with a SECONDARY SORT — `repartition
  * (key)` + `sortWithinPartitions(key, ts, clientId, seq)` — so each key's
  * ops arrive contiguous and pre-ordered and the fold streams them one at a
  * time. Per-key working state is O(final value + #clients-per-key), never
  * O(ops): a hot key with a billion ops folds in constant task memory (the
  * sort itself is Spark's spillable external sorter). Skewed hot keys are
  * handled by AQE skew-split on the exchange.
  */
object OpLog {

  /** Streaming per-key fold over a key-contiguous, (key, ts, clientId, seq)-
    * sorted op iterator — the state machine of the reference's kv model
    * (/root/reference/src/models/kv.go:40-54) with the kvraft duplicate
    * table: clients issue `seq` monotonically, so a client's op with
    * `seq <=` its high-water mark is a retry, applied once
    * (/root/reference/src/kvraft/test_test.go:83-100). Emits each key's
    * final state as soon as its last op is consumed — nothing upstream of
    * the current key is retained. */
  private[graft] def foldSorted(it: Iterator[Op]): Iterator[KvState] = {
    val in = it.buffered
    new Iterator[KvState] {
      override def hasNext: Boolean = in.hasNext
      override def next(): KvState = {
        val key = in.head.key
        val maxSeq = scala.collection.mutable.HashMap.empty[Long, Long]
        val sb = new StringBuilder
        while (in.hasNext && in.head.key == key) {
          val o = in.next()
          if (maxSeq.getOrElse(o.clientId, Long.MinValue) < o.seq) {
            maxSeq(o.clientId) = o.seq
            o.op match {
              case "put"    => sb.clear(); sb.append(o.value)
              case "append" => sb.append(o.value)
              case _        => () // get: no state change
            }
          }
        }
        KvState(key, sb.toString)
      }
    }
  }

  /** Apply ops to empty state, exactly-once per client retry (per-client
    * high-water `seq`, as in kvraft), in (ts, clientId, seq) order per key.
    * Returns final (key, value) states. */
  def materialize(ops: Dataset[Op]): Dataset[KvState] = {
    val spark = ops.sparkSession
    import spark.implicits._
    ops.repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts"), col("clientId"), col("seq"))
      .as[Op]
      .mapPartitions(foldSorted _)
  }

  /** Point lookup (K1): value of `key`, "" when absent. */
  def get(state: Dataset[KvState], key: String): String = {
    val hit = state.filter(_.key == key).take(1)
    if (hit.isEmpty) "" else hit(0).value
  }

  /** Derive a deterministic append-only op log from the fixture `events`
    * table: key = user_id, value = event_id, order = (epoch-ms, event_id).
    * Shared by the oracle-checked queries and the streaming twin. */
  def opsFromEvents(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir).select(
      graft.Tables.eventMs.as("ts"),
      col("user_id").as("clientId"),
      col("event_id").as("seq"),
      lit("append").as("op"),
      col("user_id").cast("string").as("key"),
      col("event_id").cast("string").as("value"))

  /** Oracle-checked DataFrame form of the append fold (A5): per key, the
    * concatenation of values in (ts, seq) order. Declarative: sort_array over
    * (ts, seq, value) structs keeps it one shuffle + codegen. */
  def appendFold(spark: SparkSession, dir: String): DataFrame =
    opsFromEvents(spark, dir)
      .groupBy(col("key"))
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("ts"), col("seq"), col("value")))),
          x => x.getField("value")),
        ",").as("final_value"),
        count(lit(1)).as("n_ops"))

  /** Exactly-once under retries (K3): the same log with every third op
    * duplicated (a deterministic "client retry"), deduped by (clientId, seq)
    * before folding — result must equal [[appendFold]]. */
  def exactlyOnceFold(spark: SparkSession, dir: String): DataFrame = {
    val ops = opsFromEvents(spark, dir)
    val retries = ops.filter(col("seq") % 3 === 0)
    ops.unionAll(retries)
      .dropDuplicates("clientId", "seq")
      .groupBy(col("key"))
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("ts"), col("seq"), col("value")))),
          x => x.getField("value")),
        ",").as("final_value"),
        count(lit(1)).as("n_ops"))
  }
}
