package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String / array / JSON scalar ops (SURVEY.md §2.5; ref `etl.py:298-308, 333`).
  * All higher-order built-ins — zero UDFs, everything stays in codegen.
  */
object Text {

  /** Lowercase string columns in place (ref `etl.py:301-302`). */
  def lowerCols(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, lower(col(c))))

  /** Lowercase every element of an array<string> column (ref `etl.py:303-304`)
    * — `transform` higher-order function, not a UDF. */
  def arrLower(c: Column): Column = transform(c, x => lower(x))

  /** Array column → JSON text at the sink boundary (ref `etl.py:333`). */
  def jsonSerialize(c: Column): Column = to_json(c)

  /** Drop rows where any of the given string columns is empty
    * (ref `etl.py:307-308`). */
  def filterNonEmpty(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(c => col(c) =!= "").reduce(_ && _))

  /** Keep rows whose `c` is in the allowlist (ref `etl.py:258-259, 277`). */
  def filterInSet(df: DataFrame, c: String, allow: Seq[String]): DataFrame =
    df.filter(col(c).isin(allow: _*))
}
