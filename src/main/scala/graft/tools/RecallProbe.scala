package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sim.Similarity

/** Diagnostic: per-query recall@k of the approximate IVF path vs brute force.
  * Not part of the shipped query surface — used to pick/justify the
  * `minRecall` threshold `sim_ivf_recall` pins. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 10
    val brute = Similarity.bruteForceTopK(spark, sf, 8, k).collect()
      .groupBy(_.query_id).view.mapValues(_.map(_.neighbor_id).toSet).toMap
    for (nprobe <- Seq(2, 4, 8, 12, 16)) {
      val ivf = Similarity.ivfTopK(spark, sf, 8, k, nlist = 16, nprobe = nprobe).collect()
        .groupBy(_.query_id).view.mapValues(_.map(_.neighbor_id).toSet).toMap
      brute.keys.toSeq.sorted.foreach { q =>
        val m = ivf.getOrElse(q, Set.empty[Long]).intersect(brute(q)).size
        println(s"[recall] nprobe=$nprobe q=$q matched=$m/$k")
      }
    }
    spark.stop()
  }
}
