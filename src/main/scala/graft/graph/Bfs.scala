package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded-depth single-source BFS — hop distances over a directed edge
  * relation: the reachability/radius primitive of the graph family
  * (PageRank ranks, Triangles counts, connected components labels; BFS
  * answers "how far"). Distances are exact small integers, so the oracle
  * compare is trivially engine-independent; the depth bound K makes both
  * the iteration and the recursive-CTE truth finite and is the honest
  * production contract anyway (a 100 TB graph query asks "within K hops",
  * not "the full diameter").
  *
  * Scale shape — frontier iteration under the CC/PageRank round
  * discipline: each round is ONE join of the (shrinking) frontier against
  * the edge relation, a distinct, and an anti-join against the settled
  * set; every round materializes once (eager localCheckpoint) and releases
  * the previous round's blocks. The edge relation is checkpointed once and
  * reused; at 100 TB it rides a bucketed-by-src layout so only the
  * frontier moves (the `Dedup.BucketedEdgeCutover` argument). Early exit
  * when the frontier drains — the round count is min(K, eccentricity).
  */
object Bfs {

  /** Hop distances from the lexicographically-smallest source node:
    * `(node, dist)` for every node within `maxHops`, dist = exact minimum
    * hop count. Edge weights are ignored (hop metric). */
  def distances(edges: DataFrame, maxHops: Int = 6): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    // bounded: one row — the deterministic source election
    val source = adj.agg(min(col("src"))).head.getString(0)
    var dist = Seq((source, 0)).toDF("node", "dist").localCheckpoint(true)
    var frontier = dist
    var d = 1
    var drained = false
    while (d <= maxHops && !drained) {
      val next = adj
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(d).as("dist"))
        .localCheckpoint(true)
      if (next.isEmpty) {
        graft.dedup.Dedup.releaseLocalCheckpoint(next)
        drained = true
      } else {
        val merged = dist.unionAll(next).localCheckpoint(true)
        graft.dedup.Dedup.releaseLocalCheckpoint(dist)
        if (frontier ne dist) graft.dedup.Dedup.releaseLocalCheckpoint(frontier)
        dist = merged
        frontier = next
        d += 1
      }
    }
    if (frontier ne dist) graft.dedup.Dedup.releaseLocalCheckpoint(frontier)
    graft.dedup.Dedup.releaseLocalCheckpoint(adj)
    // the returned frame is the last merge's checkpoint — released at the
    // harness's between-queries drain (the PageRank.ranks discipline)
    graft.Checkpoints.track(dist)
    dist
  }

  /** The registered query: BFS over the customer–supplier bipartite
    * interaction graph ([[PageRank.bipartiteEdges]] — symmetrized, so
    * distance is the undirected hop metric). */
  def graphBfs(spark: SparkSession, dir: String): DataFrame =
    distances(PageRank.bipartiteEdges(spark, dir))

  /** DuckDB re-derivation: depth-bounded recursive CTE with UNION dedup
    * (rows are (node, dist) pairs, so recursion state stays ≤ |V|·K —
    * never the path space), then MIN(dist) per node. */
  val oracleSql: String =
    s"""WITH RECURSIVE ed AS (SELECT src, dst FROM (${PageRank.bipartiteEdgesSql})),
       |s0 AS (SELECT MIN(src) AS s FROM ed),
       |walk(node, dist) AS (
       |  SELECT s, 0 FROM s0
       |  UNION
       |  SELECT ed.dst, walk.dist + 1 FROM walk JOIN ed ON ed.src = walk.node
       |  WHERE walk.dist < 6
       |)
       |SELECT node, CAST(MIN(dist) AS INT) AS dist FROM walk GROUP BY node""".stripMargin
}
