package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * The reference materializes its shuffle as `ihash(key) % NReduce` bucket
  * files on a shared filesystem (/root/reference/src/mr/worker.go:80-111,
  * master-side assembly :143-206). Spark's durable analogue is a bucketed
  * table: the hash partitioning is baked into the FILE LAYOUT at write time,
  * so every later join/aggregation on the bucket key reads pre-partitioned
  * data and plans **zero Exchange** — the decisive layout choice for a
  * 100 TB fact table that is joined on the same key every day. Writing costs
  * one shuffle once; every subsequent query saves one (or two, for
  * fact-fact joins like lineitem ⋈ orders on orderkey).
  *
  * Both sides must agree on bucket count and key; sort columns additionally
  * let SortMergeJoin skip its sort. This is the path `q3_shipping_priority`
  * and `q5_nation_revenue` take at production scale.
  */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) table rooted at `path`.
    * One shuffle now, none later: `repartition` by the key first so each
    * task writes only its own buckets (without it, every task writes a file
    * per bucket it sees — `tasks × buckets` small files at scale). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count.
    * With bucketing enabled (default) the physical plan is a SortMergeJoin
    * with NO Exchange on either side — assert via [[hasExchange]]. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True iff the *executed* plan contains any shuffle or broadcast
    * exchange. Pass the Dataset you actually executed (AQE finalizes the
    * plan only on execution). */
  def hasExchange(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("Exchange")
  }
}
