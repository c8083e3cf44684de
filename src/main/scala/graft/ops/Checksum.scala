package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-insensitive table checksums — the integrity primitive for
  * validating a copy/migration at 100 TB: compute on source and
  * destination independently (any engine, any partitioning, any row
  * order — the sum is commutative) and compare two tiny rows.
  *
  * Row hash: md5 over the null-sentineled, unit-separated string render
  * of the columns (md5 is the repo's cross-engine hash; the sentinel
  * keeps NULL distinct from the empty string). 48 bits of the digest per
  * row, summed exactly in DECIMAL(38,0) — no overflow below ~10^26 rows.
  * One map-side-combinable aggregate: a full-table integrity check costs
  * exactly one scan.
  */
object Checksum {

  /** Portable 48-bit row hash of the given columns. Unit separator
    * (U+0001, chr(1) in SQL) between columns and a distinct NULL
    * sentinel (U+0002) keep ("ab","c") != ("a","bc") and NULL != ''. */
  def rowHash(cols: Seq[Column]): Column = {
    val rendered = cols.map(c => coalesce(c.cast("string"), lit("\u0002")))
    conv(substring(md5(concat_ws("\u0001", rendered: _*)), 1, 12), 16, 10)
      .cast("long")
  }

  private[graft] def rejectFp(df: DataFrame, cols: Seq[String]): Unit = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val fp = cols.filter(c => df.schema(c).dataType == DoubleType ||
      df.schema(c).dataType == FloatType)
    require(fp.isEmpty,
      s"float/double render differs across engines — cast ${fp.mkString(", ")} to DECIMAL first")
  }

  /** (n_rows, checksum) in one aggregate pass.
    *
    * Float/double columns are REJECTED: their string renders are not
    * engine-portable (Java prints 1.0E7 where DuckDB prints 10000000.0,
    * plus NaN/-0.0 spellings), which would report corruption on a
    * perfect copy — cast them to an explicit DECIMAL(p, s) first, whose
    * render is canonical everywhere. */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    rejectFp(df, cols)
    // The sum rides as DECIMAL(38,0) (exact; no overflow below ~10^26 rows)
    // but is EMITTED as its canonical digit string: wide-decimal readers
    // disagree on the in-memory type (arrow Decimal vs float64) and a
    // float64 render silently drops the low bits of a 63-bit checksum.
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(rowHash(cols.map(col)).cast(DecimalType(38, 0)))
        .cast("string").as("checksum"))
  }

  /** Per-partition-key checksums — the incremental-integrity unit at
    * 100 TB: one combine-enabled groupBy instead of one global agg, so a
    * migration validates partition by partition and a re-check after an
    * incremental load touches only summaries. Same row hash, same
    * float/double rejection, same canonical digit-string emission as
    * `tableChecksum`. */
  def partitionChecksums(df: DataFrame, partCols: Seq[String],
                         cols: Seq[String]): DataFrame = {
    rejectFp(df, cols)
    df.groupBy(partCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(rowHash(cols.map(col)).cast(DecimalType(38, 0)))
          .cast("string").as("checksum"))
  }

  /** Partition-level diff of two table versions: which partition keys
    * were `added`, `removed`, or `changed` between snapshot `a` and
    * snapshot `b` — identical partitions are absent from the output.
    * Cost: one aggregate scan per side, then a full-outer join of the
    * TINY per-partition summaries (|distinct partition keys| rows) —
    * never a row-level compare, so diffing two 100 TB snapshots moves
    * two scans and kilobytes. The checksum is order-insensitive, so
    * a pure re-shard reports unchanged.
    *
    * The join is NULL-SAFE on every partition column (`<=>`): a NULL
    * partition-key value is legal in Hive-style layouts (the
    * `__HIVE_DEFAULT_PARTITION__` directory), and a plain equi-join
    * would never match it against itself — an unchanged null-keyed
    * partition would be reported twice, as both `removed` and `added`. */
  def diffPartitions(a: DataFrame, b: DataFrame, partCols: Seq[String],
                     cols: Seq[String]): DataFrame = {
    val pa = partitionChecksums(a, partCols, cols)
      .withColumnRenamed("n_rows", "n_a").withColumnRenamed("checksum", "__ca")
    val pb = partCols.foldLeft(
      partitionChecksums(b, partCols, cols)
        .withColumnRenamed("n_rows", "n_b").withColumnRenamed("checksum", "__cb")
    )((d, c) => d.withColumnRenamed(c, s"__b_$c"))
    val keysMatch = partCols.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _)
    pa.join(pb, keysMatch, "full_outer")
      .withColumn("status",
        when(col("__cb").isNull, "removed")
          .when(col("__ca").isNull, "added")
          .when(col("__ca") =!= col("__cb"), "changed"))
      .filter(col("status").isNotNull)
      .select(partCols.map(c => coalesce(col(c), col(s"__b_$c")).as(c)) ++
        Seq(col("n_a"), col("n_b"), col("status")): _*)
  }
}
