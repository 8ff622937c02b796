package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Measurement harness behind `sim_knn_graph_pruned`'s recall floors: runs
  * the pruned kNN join at each sweep rung and prints the raw
  * matched/truth fraction on the sampled query set — the numbers
  * BASELINE.md records and [[Similarity.knnGraphPrunedSweep]]'s
  * `PrunedRecallFloors` sit below with margin.
  *
  * Run: `runMain graft.tools.KnnProbe [sfDir]`. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val k = 3; val sampleN = 128; val trainN = 2048; val maxBlock = 256
    val vecs = Similarity.vectors(spark, dir)
    val n = vecs.count()
    val nlist = math.max(16, ((n + 255) / 256).toInt)
    val trainArr = vecs
      .orderBy(xxhash64(col("vec_id"), lit("knntrain")), col("vec_id"))
      .limit(math.min(trainN.toLong, n).toInt).as[Similarity.Vec].collect()
    val centroids = Similarity.trainCentroids(
      spark.createDataset(trainArr.toIndexedSeq), nlist)
    val sampleArr = vecs
      .orderBy(xxhash64(col("vec_id"), lit("knnsample")), col("vec_id"))
      .limit(sampleN).as[Similarity.Vec].collect()
    val truth = Similarity.exactTopKBroadcast(vecs, sampleArr, k)
      .toDF("query_id", "neighbor_id")
    val nTruth = truth.count()
    println(s"[knnprobe] dir=$dir n=$n nlist=$nlist nTruth=$nTruth")
    for (np <- Seq(math.max(1, nlist / 8), math.max(2, nlist / 4), nlist)) {
      val queries = if (np == nlist) spark.createDataset(sampleArr.toIndexedSeq) else vecs
      val edges = Similarity.prunedKnnEdges(queries, vecs, centroids, np, k, maxBlock)
        .toDF("query_id", "neighbor_id")
      val nEdges = edges.count()
      val nQ = edges.select(countDistinct(col("query_id"))).head().getLong(0)
      val matched = edges.join(truth, Seq("query_id", "neighbor_id")).count()
      println(f"[knnprobe] nprobe=$np%3d n_queries=$nQ%6d n_edges=$nEdges%7d " +
        f"matched=$matched%5d/$nTruth recall=${matched.toDouble / nTruth}%.4f")
    }
    spark.stop()
  }
}
