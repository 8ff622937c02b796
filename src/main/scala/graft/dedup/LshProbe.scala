package graft.dedup

import org.apache.spark.sql.SparkSession

/** One-off stage timing for the LSH production query (kept with the other
  * probe tools; not part of the query surface). */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    import EmbeddingLsh._
    val frame = time("prodFrame count")(prodFrame(spark, dir)).cache()
    println("[probe] n = " + frame.count())
    val sig = time("signatures materialize") {
      val s = signaturesFrame(frame, 288).localCheckpoint(true); s.count(); s
    }
    val cand = time("candidates count") {
      val c = candidates(sig, 24, 12, 288).localCheckpoint(true); c.count(); c
    }
    println("[probe] candidates = " + cand.count())
    time("full pairsProd")(pairsProd(spark, dir).count())
    spark.stop()
  }
}
