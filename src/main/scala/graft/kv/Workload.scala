package graft.kv

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic seeded KV workload generator — the reference's test source
  * (SURVEY §2.1 S7): per-client append payloads shaped like the kvraft
  * harness's `"x <clientId> <seq> y"` (/root/reference/src/kvraft/
  * test_test.go:207-215), with a deterministic fraction of duplicated
  * "client retries" to exercise exactly-once dedup (K3).
  *
  * Generated as a pure `spark.range` cross of clients × seqs — no driver-side
  * materialization, seeded key choice via a hash of (client, seq), so the
  * same workload reproduces on any cluster size.
  */
object Workload {

  /** `nClients` clients each issuing `nOps` appends over `nKeys` keys. When
    * `withRetries`, every op with seq % 3 == 0 appears twice (same clientId,
    * seq — a retransmission, not a new op). */
  def appendOps(spark: SparkSession, nClients: Int, nOps: Int, nKeys: Int,
                withRetries: Boolean = false): Dataset[Op] = {
    import spark.implicits._
    val base = spark.range(nClients.toLong * nOps).select(
      (col("id") % nClients).as("clientId"),
      expr(s"id DIV $nClients").as("seq"))
    val ops = base.select(
      // total order: the reference gets it from the Raft log index; here the
      // (seq-major, client-minor) rank plays that role deterministically
      (col("seq") * nClients + col("clientId")).as("ts"),
      col("clientId"),
      col("seq"),
      lit("append").as("op"),
      pmod(xxhash64(col("clientId"), col("seq")), lit(nKeys)).cast("string").as("key"),
      concat(lit("x "), col("clientId"), lit(" "), col("seq"), lit(" y")).as("value"))
    val all =
      if (withRetries) ops.unionAll(ops.filter(col("seq") % 3 === 0))
      else ops
    all.as[Op]
  }

  /** checkClntAppends invariant (/root/reference/src/kvraft/test_test.go:
    * 83-100) as a query over materialized state: for every client, its
    * payloads must appear in every key's final value exactly once and in
    * ascending seq order. Returns violations — empty means linearizable
    * append history. */
  def appendViolations(state: Dataset[KvState]): Dataset[String] = {
    val spark = state.sparkSession
    import spark.implicits._
    state.flatMap { s =>
      // parse "x <cli> <seq> y" payloads back out of the concatenated value
      val hits = "x (\\d+) (\\d+) y".r.findAllMatchIn(s.value)
        .map(m => (m.group(1).toLong, m.group(2).toLong)).toArray
      val dups = hits.groupBy(identity).collect { case (op, arr) if arr.length > 1 =>
        s"key ${s.key}: op $op appears ${arr.length} times" }
      val disorder = hits.groupBy(_._1).flatMap { case (cli, ops) =>
        val seqs = ops.map(_._2)
        if (seqs.sameElements(seqs.sorted)) None
        else Some(s"key ${s.key}: client $cli out of order")
      }
      (dups ++ disorder).iterator
    }
  }
}
