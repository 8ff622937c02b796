package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sim.Similarity
import graft.sim.Similarity.{IvfIndex, Vec}

/** STREAMING IVF UPSERT — the ingest-time twin of
  * [[Similarity.upsertIvfIndex]], completing the lifecycle symmetry the SQ8
  * and PQ encoders already have (encode-on-arrival): vectors arriving on a
  * stream are folded into a stored IVF index as they land, under exactly the
  * batch upsert's contract.
  *
  * Each micro-batch IS one batch upsert — the same shared code path: map-only
  * nearest-centroid assignment against the FROZEN coarse codebook (broadcast;
  * no Lloyd iterations, no retrain), an append of the assigned rows to the
  * index's `list_id`-partitioned parquet (base files are never rewritten —
  * the append-only economics the file-census specs pin), and a max-merge of
  * the per-list angular radii into the driver-side metadata. Radii only ever
  * grow, so the ball-pruning bound stays SOUND at every instant of the
  * stream: a search snapshot-reading the index mid-stream sees exact results
  * over whatever rows have landed (codebook drift costs list balance, never
  * correctness — the batch upsert's argument, unchanged).
  *
  * The merged metadata is published through an [[AtomicReference]]; searchers
  * call the returned accessor for the current [[IvfIndex]] snapshot.
  * Micro-batches run serially per query, so the read-modify-write needs no
  * CAS loop. Delivery: `foreachBatch` file appends are at-least-once across
  * failure/retry — a production sink makes the append idempotent by writing
  * batch-id-named files (the [[graft.kv.OpLog]] exactly-once recipe); radii
  * re-merge is idempotent already (max is). */
object IndexStream {

  /** Start folding the streaming `delta` into `base`. Returns the running
    * query and a snapshot accessor for the current merged index metadata. */
  def upsertIvfStream(delta: Dataset[Vec], base: IvfIndex,
                      checkpoint: String): (StreamingQuery, () => IvfIndex) = {
    val current = new AtomicReference[IvfIndex](base)
    val q = delta.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Vec], _: Long) =>
        current.set(Similarity.upsertIvfIndex(current.get(), batch))
        ()
      }.start()
    (q, () => current.get())
  }
}
