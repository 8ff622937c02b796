package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.shard.{ShardConfig, Sharding}

/** STREAMING SHARD MIGRATION (K7's streaming twin — the reference's
  * serve-during-migration Challenge: unaffected/partial shards must keep
  * serving while a config change moves data,
  * /root/reference/src/shardkv/test_test.go:817,887).
  *
  * Config changes are IN-STREAM CONTROL MESSAGES, not restart boundaries:
  * each change is exploded to one control row per (shard, subshard) group —
  * the streaming analogue of every replica group observing the shardmaster's
  * config sequence — and folds through the same `flatMapGroupsWithState`
  * operator as the data ops. On a config row a group re-tags its gid (the
  * [[Sharding.migrationPlan]] hop for moved shards; identity for unaffected
  * ones) and emits its census; data ops before, between, and after config
  * changes keep folding into the very same state — nothing pauses, which IS
  * the Challenge semantics.
  *
  * Why this is the right 100 TB shape: in the reference, a config change
  * physically ships KV maps between replica groups, because storage is bound
  * to servers. Here state lives in the engine's key-hash-partitioned state
  * store, and `gid` is a ROUTING LABEL carried in state — so a config change
  * moves zero rows; it rewrites a label and keeps serving. The operator keys
  * by (shard, subshard) rather than raw shard: NShards is the reference's
  * fixed constant (10), far below a cluster's parallelism, so each shard
  * fans out to `subShards` independent state groups (a key belongs to
  * exactly one), and the per-shard census is the sink-side sum over its
  * subshards — same pattern as salted skew aggregation. */
object ShardStream {

  /** One input row: a data op (`kind = "op"`, key + ms) or a config control
    * message (`kind = "config"`, already exploded per (shard, sub)). */
  final case class ShardIn(ms: Long, kind: String, key: String,
                           shard: Int, sub: Int, config_num: Int)
  /** gid label + per-key op counts of one (shard, subshard) state group. */
  final case class SubState(gid: Int, counts: Map[String, Long])
  /** Census emitted by one subshard group on applying one config. */
  final case class SubCensus(config_num: Long, shard: Long, from_gid: Long,
                             gid: Long, n_keys: Long, n_events: Long)

  val DefaultSubShards = 4

  /** Data ops from (ms, key) pairs; routed by the reference's key2shard. */
  def opRows(pairs: Dataset[(Long, String)], subShards: Int = DefaultSubShards): Dataset[ShardIn] = {
    import pairs.sparkSession.implicits._
    pairs.map { case (ms, key) =>
      ShardIn(ms, "op", key, Sharding.key2shard(key),
        math.floorMod(key.hashCode, subShards), 0)
    }
  }

  /** A config-change control message, exploded to every (shard, subshard)
    * group — NShards × subShards tiny rows per change. */
  def configRows(spark: SparkSession, configNum: Int, ms: Long,
                 subShards: Int = DefaultSubShards): Dataset[ShardIn] = {
    import spark.implicits._
    spark.createDataset(for {
      s <- 0 until Sharding.NShards
      b <- 0 until subShards
    } yield ShardIn(ms, "config", "", s, b, configNum))
  }

  /** The stateful operator: data ops fold into per-key counts; config rows
    * re-tag the group's gid and emit its census under the new config. Rows
    * fold in `ms` order within a micro-batch (and in arrival order across
    * batches — the state store carries the fold). `configs` is the tiny
    * driver-side config history (the shardmaster's state machine output),
    * closed over like any broadcast dimension. */
  def shardKvStream(input: Dataset[ShardIn],
                    configs: Seq[ShardConfig]): Dataset[SubCensus] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(r => (r.shard, r.sub))
      .flatMapGroupsWithState[SubState, SubCensus](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((shard, _), rows, state: GroupState[SubState]) =>
          var st = state.getOption.getOrElse(SubState(0, Map.empty))
          val out = Seq.newBuilder[SubCensus]
          rows.toArray.sortBy(r => (r.ms, r.config_num)).foreach { r =>
            if (r.kind == "op") {
              st = st.copy(counts =
                st.counts.updated(r.key, st.counts.getOrElse(r.key, 0L) + 1L))
            } else {
              // a control message naming a config outside the known history
              // is a control-plane bug — fail LOUDLY with the cause rather
              // than an IndexOutOfBoundsException killing the query three
              // stack frames away (and never silently skip: applying ops
              // under a stale routing view is the split-brain the reference
              // guards against)
              if (r.config_num < 0 || r.config_num >= configs.length)
                throw new IllegalStateException(
                  s"config control message #${r.config_num} for shard $shard, " +
                    s"but the config history has entries 0..${configs.length - 1}")
              val newGid = configs(r.config_num).shards(shard)
              out += SubCensus(r.config_num.toLong, shard.toLong, st.gid.toLong,
                newGid.toLong, st.counts.size.toLong, st.counts.values.sum)
              st = st.copy(gid = newGid)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Sink-side per-shard census: sum each shard's subshards, drop shards
    * that hold no keys (matching the batch census, which only emits shards
    * present in the data). Tiny input — NShards × subShards rows per
    * config. */
  def shardCensus(sub: DataFrame): DataFrame =
    sub.groupBy(col("config_num"), col("shard"), col("gid"))
      .agg(sum(col("n_keys")).as("n_keys"), sum(col("n_events")).as("n_events"))
      .filter(col("n_keys") > 0)
}
