package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent-append ("upsert") semantics of the reference's sink
  * (SURVEY.md §2.9; ref `etl.py:182-191, 331-341, 438-449`).
  *
  * The reference's `INSERT … ON DUPLICATE KEY UPDATE col=col` updates
  * nothing on conflict — it is insert-if-absent / KEEP-EXISTING. With no
  * Delta/Iceberg in the jar set, the Spark-native mapping is:
  * dedup-within-batch + left-anti join against existing + union append.
  */
object Upsert {

  /** Deterministic within-batch dedup: keep the first row per key under
    * `tieBreak` ordering (row_number, not dropDuplicates, so the surviving
    * row is stable across runs/partitionings — SURVEY.md §7.4 hazard 7). */
  def dedupOnKey(df: DataFrame, keys: Seq[String], tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Keep-existing upsert: rows of `existing` win; only `incoming` rows whose
    * key is absent from `existing` are appended.
    *
    * Scale posture: the anti-join shuffles both sides on the key (or
    * broadcasts `existing`'s keys if small); at 100 TB one would partition
    * the sink table by a key prefix/date so the anti-join prunes to the
    * touched partitions. Within-batch dedup and the anti-join share the
    * same key shuffle.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             tieBreak: Seq[String]): DataFrame = {
    val deduped = dedupOnKey(incoming, keys, tieBreak)
    val fresh = deduped.join(existing.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    existing.unionByName(fresh.select(existing.columns.toIndexedSeq.map(col): _*))
  }

  /** The batch's fresh rows against a PARTITIONED parquet sink, reading
    * only the partitions the batch touches — the 100 TB upsert path: a
    * daily batch against a years-deep sink anti-joins a handful of
    * partitions, not the whole table.
    *
    * The touched-partition list is collected to the driver: bounded by the
    * number of distinct `partCol` values IN THE BATCH (e.g. days), not by
    * data volume — same class of driver-side metadata as IVF centroids.
    * The `isin` filter lands in the scan's PartitionFilters (asserted in
    * UpsertPartitionedSpec), so unread partitions are never opened. */
  def freshAgainstPartitionedSink(spark: SparkSession, sinkPath: String,
      incoming: DataFrame, keys: Seq[String], tieBreak: Seq[String],
      partCol: String): DataFrame = {
    val deduped = dedupOnKey(incoming, keys, tieBreak)
    val touched = deduped.select(col(partCol)).distinct().collect().map(_.get(0))
    // Schema is PINNED to the batch's, never inferred: a sink that exists
    // but holds no data files yet (an empty first micro-batch commits only
    // _SUCCESS) would fail parquet schema inference and kill the caller —
    // with the schema supplied, it reads as a valid empty relation. The
    // partition column in the pinned schema is populated from the
    // directory values, as with inference.
    val existingKeys = spark.read.schema(incoming.schema).parquet(sinkPath)
      .filter(col(partCol).isin(touched.toIndexedSeq: _*))
      .select(keys.map(col): _*).distinct()
    deduped.join(existingKeys, keys, "left_anti")
  }

  /** Keep-existing upsert INTO a partitioned parquet sink: append only the
    * fresh rows, written with the sink's partitioning. Idempotent: a
    * re-run of the same batch appends nothing. */
  def upsertPartitioned(spark: SparkSession, sinkPath: String,
      incoming: DataFrame, keys: Seq[String], tieBreak: Seq[String],
      partCol: String): Unit =
    freshAgainstPartitionedSink(spark, sinkPath, incoming, keys, tieBreak, partCol)
      .write.mode("append").partitionBy(partCol).parquet(sinkPath)
}
