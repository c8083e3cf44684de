package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * treated as opaque `binary` columns plus typed metadata, flowing through
  * ordinary DataFrame plans (parquet stores binary natively; shuffles and
  * pushdown work unchanged).
  *
  * The actual media DECODE is stubbed (`decodeStub`) — codec libraries are
  * not in this container — with a deterministic fake that preserves the
  * real engineering surface: schema, batch shape, partitioning, and the
  * per-row feature contract a Pandas-UDF/mapPartitions decoder would have.
  */
object Multimodal {

  /** Attach a binary media column + metadata struct to a text row —
    * stand-in for reading (path, bytes, metadata) from an object store. */
  def withFakeMedia(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("media", encode(col(textCol), "UTF-8"))
    .withColumn("media_meta", struct(
      octet_length(col("media")).as("n_bytes"),
      lit("application/octet-stream").as("mime")))

  /** STUB decode: deterministic per-row features standing in for a real
    * image/audio decoder. A production build swaps the body for a
    * mapPartitions/Arrow batch decode; the schema and call shape stay. */
  def decodeStub(media: Column): Column = struct(
    octet_length(media).as("n_bytes"),
    md5(media.cast("string")).as("content_sig"),
    (octet_length(media) % 64).as("fake_width"),
    (octet_length(media) % 48).as("fake_height"))

  /** Frame sampling: one output row per sampled frame index — the video
    * path's explode. Frame count is derived deterministically from the
    * (fake) byte length; a real decoder would read container metadata. */
  def sampleFrames(df: DataFrame, idCol: String, every: Int): DataFrame = {
    val nFrames = floor(octet_length(col("media")) / every).cast("long")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .select(col(idCol), col("frame_idx"),
        decodeStub(col("media")).getField("content_sig").as("frame_sig"))
  }

  case class MediaFeatures(id: Long, n_bytes: Int, content_sig: String)

  /** Partition-batched decode — the Scala analogue of an Arrow/Pandas-UDF
    * batch decoder: one iterator pass per partition with decoder state
    * (here a MessageDigest standing in for a codec context) initialized
    * once per PARTITION, not per row. The row contract (schema, batch
    * shape, partition distribution) is the real engineering; swap the loop
    * body for an actual image/audio codec when one is available. Features
    * are deterministic so the expression-based `decodeStub` cross-checks it.
    */
  def decodePartitioned(df: DataFrame, idCol: String): DataFrame = {
    val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])](inEnc)
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          md.reset()
          val sig = md.digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(id, bytes.length, sig)
        }
      }(Encoders.product[MediaFeatures])
      .toDF(idCol, "n_bytes", "content_sig")
  }

  /** Resize stub: metadata-only transform (real impl: batch image op). */
  def resizeStub(featCol: Column, w: Int, h: Int): Column = struct(
    featCol.getField("n_bytes").as("n_bytes"),
    featCol.getField("content_sig").as("content_sig"),
    lit(w).as("fake_width"), lit(h).as("fake_height"))
}
