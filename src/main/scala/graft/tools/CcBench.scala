package graft.tools

import org.apache.spark.sql.functions._

/** Interleaved A/B of the plain vs bucketed connectedComponents variants on
  * the real dedup_components edge set — isolates the bucketing effect from
  * host noise (same JVM, alternating runs). Not part of the driver contract. */
object CcBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup
    val docs = graft.Tables.documents(spark, dir)
    val jac = Dedup.tokenJaccard(spark, dir).select(col("d1"), col("d2"))
    val exEdges = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("d1"), collect_set(col("doc_id")).as("ids"))
      .select(col("d1"), explode(col("ids")).as("d2"))
      .filter(col("d1") =!= col("d2"))
    val edges = jac.unionAll(exEdges).localCheckpoint(true)
    val nodes = docs.select(col("doc_id").as("node")).localCheckpoint(true)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[ccbench] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (round <- 1 to 3) {
      time(s"plain    r$round")(Dedup.connectedComponents(edges, nodes).count())
      time(s"bucketed r$round")(Dedup.connectedComponentsBucketed(edges, nodes).count())
    }
  }
}
