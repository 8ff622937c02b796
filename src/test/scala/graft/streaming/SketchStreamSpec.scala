package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The streaming Misra-Gries sketch: bounded state across micro-batches,
  * and the superset guarantee holds over the whole stream PREFIX at every
  * observation point (each batch boundary is a fresh merge of new partials
  * into the stored buffer — the exact merge tree the batch spec proves). */
class SketchStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("across micro-batches: candidates ⊇ prefix heavy hitters, size bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val capacity = 20
    val in = MemoryStream[String]
    val q = SketchStream.heavyHitterCandidates(in.toDS(), capacity)
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      val rnd = new scala.util.Random(7L)
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      for (batch <- 1 to 3) {
        // zipf-ish batch, different skew each time so the hitter set shifts
        val data = Seq.fill(800)("w" + math.sqrt(rnd.nextInt(400 * batch)).toInt)
        in.addData(data)
        seen ++= data
        q.processAllAvailable()
        val sketch = spark.table("mg_stream").as[(String, Long)].collect().toMap
        assert(sketch.size <= capacity, s"state exceeded capacity: ${sketch.size}")
        val exact = seen.groupBy(identity).view.mapValues(_.size.toLong)
        val floor = seen.size.toDouble / (capacity + 1)
        exact.foreach { case (w, c) =>
          if (c > floor)
            assert(sketch.contains(w),
              s"batch $batch lost prefix heavy hitter $w ($c > $floor)")
        }
        sketch.foreach { case (w, est) =>
          assert(est <= exact(w), s"overcount for $w: $est > ${exact(w)}")
        }
      }
    } finally q.stop()
  }
}
