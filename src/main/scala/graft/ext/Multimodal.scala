package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Resize stub: metadata-only transform (real impl: batch image op). */
  def resizeStub(featCol: Column, w: Int, h: Int): Column = struct(
    featCol.getField("n_bytes").as("n_bytes"),
    featCol.getField("content_sig").as("content_sig"),
    lit(w).as("fake_width"), lit(h).as("fake_height"))
}
