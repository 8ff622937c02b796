package graft.shard

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the standing answer when one key's group
  * outweighs an executor (AQE skew-join handles joins; salting handles
  * aggregations and deliberate repartitions).
  *
  * Two-phase aggregation: group on (key, salt) first — spreading a hot key
  * over `buckets` reducers — then re-aggregate the partials on key alone.
  * Correct for any algebraic aggregate (a merge function exists); the second
  * shuffle moves only `buckets` partial rows per key, not the raw data.
  */
object Salting {

  /** Deterministic salt in [0, buckets) — a hash of the whole row's
    * `saltFrom` column, NOT random: retries/speculative tasks must salt a row
    * identically or the two-phase sums double-count. */
  def salt(saltFrom: Column, buckets: Int): Column =
    pmod(xxhash64(saltFrom), lit(buckets)).cast("int")

  /** Two-phase salted sum/count over a possibly-skewed key.
    * Output: key, total_sum, total_count. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltFrom: Column, buckets: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"), salt(saltFrom, buckets).as("s"))
      .groupBy(col("k"), col("s"))
      .agg(sum(col("v")).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total_sum"),
        sum(col("partial_n")).as("total_count"))
}
