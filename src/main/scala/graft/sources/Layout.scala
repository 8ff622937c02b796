package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Data-layout control for at-rest tables — the scan-pruning lever that
  * matters most at 100 TB: a predicate can only skip what the layout made
  * skippable.
  *
  * [[sortedWrite]] range-partitions on the sort key and sorts within each
  * output file, so every parquet row group covers a narrow, disjoint key
  * interval and its min/max footer stats become selective: a range
  * predicate then prunes row groups (and with partition-count planning,
  * whole files) instead of decoding them. On an unsorted layout every row
  * group spans the whole key domain and min/max stats can never exclude
  * anything — the same predicate decodes the full table. The delta is
  * measured directly by LayoutSpec via filesystem byte statistics.
  *
  * This is the same at-rest argument as the IVF index's `partitionBy
  * (list_id)` (prune by list) and the bucketed CC edge table (pre-placed
  * join) — here applied to the general "big fact table scanned by range
  * predicates" case, e.g. event time. At scale the sort is a one-time
  * write-amplification cost paid once per ingest batch, amortized over
  * every subsequent scan. */
object Layout {

  def sortedWrite(df: DataFrame, path: String, sortCols: Seq[String],
                  nFiles: Int, rowGroupBytes: Int = 1 << 20): Unit =
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toLong)
      .parquet(path)
}
