package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

import scala.collection.mutable.ArrayBuffer

/** The reference's holistic reducer shape (A4: copy values, sort, join with a
  * separator — /root/reference/src/mrapps/crash.go:48-58, nocrash.go:40-50,
  * mtiming.go:84-94) as a typed `Aggregator`, registrable in SQL via
  * `functions.udaf` (SURVEY §2.7's UDAF surface).
  *
  * For most uses prefer the declarative equivalent
  * `concat_ws(sep, sort_array(collect_list(v)))` — it gets partial
  * aggregation for free. This Aggregator exists for (a) SQL exposure as one
  * named function, (b) the memory-bounded merge shape: buffers merge
  * pairwise across partitions instead of concatenating on one reducer.
  */
object SortedConcat extends Aggregator[String, ArrayBuffer[String], String] {
  val Sep = " "
  override def zero: ArrayBuffer[String] = ArrayBuffer.empty
  override def reduce(b: ArrayBuffer[String], v: String): ArrayBuffer[String] = { b += v; b }
  override def merge(a: ArrayBuffer[String], b: ArrayBuffer[String]): ArrayBuffer[String] = a ++= b
  override def finish(b: ArrayBuffer[String]): String = b.sorted.mkString(Sep)
  override def bufferEncoder: Encoder[ArrayBuffer[String]] =
    Encoders.kryo[ArrayBuffer[String]]
  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Register as SQL function `graft_sorted_concat(col)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("graft_sorted_concat", functions.udaf(this))
}
