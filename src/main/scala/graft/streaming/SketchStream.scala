package graft.streaming

import org.apache.spark.sql.Dataset

import graft.functions.MisraGries

/** Streaming HEAVY-HITTER candidates — the Misra-Gries sketch as a stateful
  * streaming aggregate: the same `Aggregator` the batch `text_heavy_hitters`
  * query runs, under a constant-key `groupByKey.agg` in Complete mode.
  *
  * Why this is the right streaming shape: Spark keeps ONE sketch buffer as
  * the aggregation state (≤ 2×capacity counters — bounded forever), each
  * micro-batch partial-aggregates map-side and MERGES into the stored
  * buffer — exactly the Agarwal-et-al merge the n/(capacity+1) superset
  * guarantee is proven for (MisraGriesSpec), so at every point in the
  * stream the candidates cover every item above that frequency floor of
  * the WHOLE prefix. The exact-count second pass stays a batch job over
  * the at-rest corpus (the sketch answers "who", the rejoin answers "how
  * many" — a stream cannot retro-count earlier batches).
  *
  * The constant grouping key is deliberate: the sketch is corpus-GLOBAL
  * state bounded by `capacity`, so one reducer-side buffer is the
  * algorithm, not a bottleneck — all heavy lifting happens in the map-side
  * partials (one sketch per partition), and only ≤ 2×capacity counters per
  * partition cross the wire per batch. */
object SketchStream {
  /** (word, est) candidate rows — the sketch map is exploded INSIDE the
    * stream (its kryo-encoded buffer cannot cross a sink schema). */
  def heavyHitterCandidates(words: Dataset[String],
                            capacity: Int = 200): Dataset[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.groupByKey(_ => 0)
      .agg(new MisraGries(capacity).toColumn.name("sketch"))
      .flatMap { case (_, sketch) => sketch.toSeq }
  }
}
