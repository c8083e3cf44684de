package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time derivations — the reference's semantic core (SURVEY.md §2.6).
  *
  * The reference derives three date representations from every source:
  * a raw timestamp, a `dd-MM-yyyy` "short date" string (ref `etl.py:25-31`),
  * and a unix-seconds BIGINT `time_stamp` (ref `etl.py:33-49`). All are
  * pure column expressions → whole-stage codegen, no UDFs.
  */
object Dates {

  /** `dd-MM-yyyy` short-date string of any date-ish column (ref `etl.py:31`). */
  def dateShort(c: Column): Column = date_format(to_date(c), "dd-MM-yyyy")

  /** Unix epoch SECONDS (not millis — ref `etl.py:42,46,49` does `// 10**9`). */
  def tsUnix(c: Column): Column = unix_timestamp(c)

  /** The reference's 3-format timestamp parse ladder (ref `etl.py:39-49`):
    * ISO-8601 'T' form (NYTimes), plain datetime, `yyyy-MM-dd HH:mm:ss`.
    * `try_to_timestamp` keeps this ANSI-safe: a non-matching format yields
    * null and `coalesce` falls through — exactly the try/except ladder,
    * but vectorized and codegen'd.
    */
  def parseMultiTs(c: Column, formats: Seq[String] = DefaultTsFormats): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))) :+ try_to_timestamp(c): _*)

  val DefaultTsFormats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd")

  /** Multi-format string → unix seconds, the composed `to_timestamp` of the
    * reference (ref `etl.py:33-49`). */
  def tsUnixMulti(c: Column, formats: Seq[String] = DefaultTsFormats): Column =
    unix_timestamp(parseMultiTs(c, formats))

  /** `dd-MM-yyyy` string → DATE (sink-side re-parse, ref `etl.py:334`). */
  def parseDmy(c: Column): Column = to_date(c, "dd-MM-yyyy")

  /** `yyyy-MM-dd` string → DATE (ref `etl.py:440`). */
  def parseYmd(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** First-of-month sequence covering [start, end], one row per month
    * (ref `getMonthsBetween`, `etl.py:241-251`). Spark-first: the reference's
    * rrule loop becomes a single `sequence` + `explode` — no driver loop.
    */
  def monthRange(start: Column, end: Column): Column =
    explode(sequence(trunc(to_date(start), "month"), trunc(to_date(end), "month"),
      expr("interval 1 month")))

  /** Every date in [start, end] inclusive (ref `etl.py:372-373`). */
  def dayRange(start: Column, end: Column): Column =
    explode(sequence(to_date(start), to_date(end), expr("interval 1 day")))
}
