package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: timing probes for the LSH pipeline. */
object ExplainLsh {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[TIME] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    time("warmup-scan")(graft.Tables.documents(spark, dir).count())
    def sigProbe = graft.dedup.Dedup.signaturesDF(spark, dir)
      .select(avg(element_at(col("sig"), 1)))
    time("sig-run1")(sigProbe.collect())
    time("sig-run2")(sigProbe.collect())
    def full = graft.dedup.Dedup.minhashLsh(spark, dir)
    time("full-run1")(full.count())
    time("full-run2")(full.count())
    spark.stop()
  }
}
