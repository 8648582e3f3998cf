package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata (north-star requirement). The Spark-side
  * plumbing — source format, schema, format sniffing, partitioning,
  * batched feature extraction — is real; the codec step is a
  * deterministic STUB (no image/audio libraries in this container)
  * with the exact seam a real decoder would occupy.
  *
  * Scale notes: `binaryFile` splits by file, so parallelism = file
  * count; `maxPartitionBytes`/`filesMaxPartitionBytes` govern packing;
  * feature extraction is a per-partition batched pass (the Scala
  * analogue of `mapInPandas`) so decoder state is amortized across a
  * batch, not re-created per row.
  */
object Multimodal {

  /** S2: binary file source — (path, modificationTime, length,
    * content) per file.
    */
  def readBinary(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** Real magic-byte container sniffing over the binary payload —
    * pure Column expressions, runs in the scan projection.
    */
  def sniffFormat(content: Column): Column = {
    val m4 = hex(substring(content, 1, 4))
    when(m4 === "89504E47", "png")
      .when(m4.startsWith("FFD8FF"), "jpeg")
      .when(m4 === "52494646", "riff") // wav/avi/webp share RIFF
      .when(m4 === "47494638", "gif")
      .when(m4 === "664C6143", "flac")
      .when(substring(content, 5, 4) === lit("ftyp".getBytes("UTF-8")), "mp4")
      .otherwise("unknown")
  }

  /** Typed multimodal record: payload + metadata struct. */
  def withMetadata(bin: DataFrame): DataFrame =
    bin.select(
      col("path"),
      col("content"),
      struct(
        sniffFormat(col("content")).as("format"),
        col("length").as("n_bytes"),
        xxhash64(col("content")).as("content_hash")).as("meta"))

  /** STUB decode seam — deterministic fake "decode + embed": a real
    * implementation would decode pixels/samples here (per-partition,
    * batched); the stub derives a stable pseudo-feature vector from
    * the payload hash so downstream plumbing (schema, joins,
    * similarity) is fully testable. Marked STUB by contract.
    */
  def stubDecodeFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val feats = transform(
      sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(col("meta.content_hash"), i), lit(1000L)).cast("double") / 1000.0))
    df.withColumn("features", feats)
  }

  /** Per-partition batched extraction (the mapInPandas analogue):
    * groups rows into `batchSize` chunks so a real decoder would be
    * invoked once per batch. The batch function here is the
    * identity+count STUB; the batching shape is the real thing.
    */
  def mapBatches(df: DataFrame, batchSize: Int = 64): DataFrame = {
    import df.sparkSession.implicits._
    val schema = df.schema
    val withBatch = df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // STUB: a real codec processes `batch` as one unit here.
        batch.iterator
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    withBatch
  }
}
