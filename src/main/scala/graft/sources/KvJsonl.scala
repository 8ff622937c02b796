package graft.sources

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.mr.KV

/** JSON-lines KV interop format — the reference's intermediate/interop
  * encoding: one `{"Key":...,"Value":...}` object per line
  * (/root/reference/src/mr/worker.go:108-119 encode, :147-159 decode).
  *
  * Inside a Spark plan the shuffle replaces this materialization entirely
  * (SURVEY §2.1 S2/S3); these exist for on-disk interop with the reference's
  * files. The read side pins an explicit schema — schema inference would scan
  * the data twice, which is wrong at any scale. Field names match the
  * reference's Go struct (`Key`/`Value`) on disk while staying `key`/`value`
  * in the engine.
  */
object KvJsonl {

  /** Explicit on-disk schema: never inferred. */
  val schema: StructType = StructType(Seq(
    StructField("Key", StringType, nullable = false),
    StructField("Value", StringType, nullable = false)))

  /** S3: sink a KV dataset as JSON-lines (one object per line). */
  def write(kv: Dataset[KV], path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    kv.select(kv("key").as("Key"), kv("value").as("Value"))
      .write.mode(mode).json(path)

  /** S2: scan JSON-lines KV records with the pinned schema. */
  def read(spark: SparkSession, path: String): Dataset[KV] = {
    import spark.implicits._
    spark.read.schema(schema).json(path)
      .select($"Key".as("key"), $"Value".as("value"))
      .as[KV]
  }
}
