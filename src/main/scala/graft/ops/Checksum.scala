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

  /** (n_rows, checksum) in one aggregate pass. */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(rowHash(cols.map(col)).cast(DecimalType(38, 0))).as("checksum"))
}
