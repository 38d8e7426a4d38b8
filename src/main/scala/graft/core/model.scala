package graft.core

import java.sql.Timestamp

/** Cross-cutting result/audit types.
  *
  * The reference logs one audit row per load — {table, insertedRows,
  * totalRecords, statusOk, errorMsg, timestamp, url}
  * (/root/reference/dags/CotyData_IPN.py:19-61) — and every `loadX` returns an
  * error envelope `(tabla, cant, status, errorMsg)` (:191,220,248).
  */
final case class AuditLog(
    table: String,
    insertedRows: Long,
    totalRecords: Long,
    statusOk: Boolean,
    errorMsg: String,
    loggedAt: Timestamp,
    source: String)

final case class LoadResult(table: String, rows: Long, ok: Boolean, error: Option[String])

/** Incremental extraction window. Every reference extract is parameterized
  * `(date_from, date_to)` with per-action passes for created / modified /
  * deleted / undeleted records (/root/reference/dags/CotyData_IPN.py:596-601;
  * dag window logic dags/dag_maestros.py:10-22).
  */
final case class DateWindow(from: java.time.LocalDate, to: java.time.LocalDate)

object DateWindow {
  /** Weekday-aware window: Monday widens to Fri-Sun (weekend catch-up),
    * other weekdays cover yesterday only
    * (/root/reference/dags/dag_maestros.py:10-22).
    */
  def daily(runDate: java.time.LocalDate): DateWindow = {
    val back = if (runDate.getDayOfWeek == java.time.DayOfWeek.MONDAY) 3 else 1
    DateWindow(runDate.minusDays(back), runDate.minusDays(1))
  }
}

/** Change-data action driving source predicates (SURVEY.md §2.11). */
sealed trait ChangeAction { def param: String }
object ChangeAction {
  case object Created     extends ChangeAction { val param = "creation"     }
  case object Modified    extends ChangeAction { val param = "modification" }
  case object Deleted     extends ChangeAction { val param = "deletion"     }
  case object Undeleted   extends ChangeAction { val param = "undeletion"   }
  val all: Seq[ChangeAction] = Seq(Created, Modified, Deleted, Undeleted)
}

/** Driver-side retry with incremental backoff, mirroring the reference's
  * tenacity policy `stop_after_attempt(5), wait_incrementing(start=5,
  * increment=5)` (/root/reference/dags/CotyData_IPN.py:178-183). Spark task
  * retries do not cover driver-side JDBC/API statements, so the engine keeps
  * an explicit wrapper. Sleep is injectable for tests.
  */
object Retry {
  def withBackoff[T](attempts: Int = 5, startMs: Long = 5000, incMs: Long = 5000,
                     sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return body
      catch {
        case e: Throwable =>
          last = e
          if (i < attempts - 1) sleep(startMs + incMs * i)
      }
      i += 1
    }
    throw last
  }
}
