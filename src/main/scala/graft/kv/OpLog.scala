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
  * Distribution: one shuffle on `key`; each key's fold is partition-local and
  * streams its ops in sorted order — per-key state is O(value), not O(ops).
  * At 100 TB the op log shuffles once and keys fold independently across
  * executors; skewed hot keys are handled by AQE skew-split on the exchange.
  */
object OpLog {

  /** Apply ops to empty state, exactly-once per (clientId, seq), in (ts,
    * clientId, seq) order per key. Returns final (key, value) states. */
  def materialize(ops: Dataset[Op]): Dataset[KvState] = {
    val spark = ops.sparkSession
    import spark.implicits._
    ops.groupByKey(_.key)
      .mapGroups { (key, it) =>
        val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
        val sorted = it.toArray.sortBy(o => (o.ts, o.clientId, o.seq))
        val sb = new StringBuilder
        var put: String = ""
        var havePut = false
        sorted.foreach { o =>
          if (seen.add((o.clientId, o.seq))) o.op match {
            case "put"    => put = o.value; havePut = true; sb.clear()
            case "append" => sb.append(o.value)
            case _        => () // get: no state change
          }
        }
        KvState(key, (if (havePut) put else "") + sb.toString)
      }
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
