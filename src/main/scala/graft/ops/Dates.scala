package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/timestamp normalization (SURVEY.md §2.9 X6-X9).
  *
  * The reference parses wire timestamps in several shapes — strict ISO
  * `%Y-%m-%dT%H:%M:%S` (/root/reference/dags/CotyData_IPN.py:103-104),
  * `format='mixed'` (:1748), `dd/MM/yyyy` (:1836) — and formats back with
  * millisecond truncation to SQL Server's 23-char datetime (:1749).
  * Centralized here so every pipeline uses one set of patterns.
  */
object Dates {

  val IsoT   = "yyyy-MM-dd'T'HH:mm:ss"
  val Dmy    = "dd/MM/yyyy"
  val DmyHms = "dd/MM/yyyy HH:mm:ss"

  /** pandas `format='mixed'` analog: first pattern that parses wins, null if
    * none do (permissive, matching non-ANSI reference semantics).
    */
  def parseTimestampMulti(c: Column, fmts: Seq[String]): Column =
    coalesce(fmts.map(f => try_to_timestamp(c, lit(f))): _*)

  /** ISO string -> date by prefix, replacing `x.split('T')[0]`
    * (/root/reference/dags/CotyData_IPN.py:1117,2031).
    */
  def isoDatePrefix(c: Column): Column = to_date(substring(c, 1, 10))

  /** 23-char millisecond-truncated timestamp string
    * (/root/reference/dags/CotyData_IPN.py:1749 strftime + slice(0,23)).
    */
  def formatMs23(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSS")
}
