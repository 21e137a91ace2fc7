package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar metric derivations — the reference's stage-6
  * (ref: Python-pipeline/dataprocessing3.py:28-102, dataprocessing.py:63-69,
  * 147-153) as codegen'd Column expressions (SURVEY.md §2.8 F9–F17).
  */
object Metrics {

  /** F9 — lenient date normalize: parse yyyy-MM-dd, any failure → default.
    * Mirrors normalize_date_safe (dataprocessing.py:63-69). */
  def safeDate(c: Column, default: String = "2024-01-01"): Column =
    coalesce(try_to_timestamp(trim(c), lit("yyyy-MM-dd")).cast("date"),
      lit(default).cast("date"))

  /** F10 — UTC timestamp → Asia/Karachi local date + time strings
    * (dataprocessing3.py:28-40). Karachi has no DST (fixed UTC+5 since
    * 2009) so this is deterministic year-round. */
  def toLocal(ts: Column, tz: String = "Asia/Karachi"): (Column, Column) = {
    val local = from_utc_timestamp(ts, tz)
    (date_format(local, "yyyy-MM-dd"), date_format(local, "HH:mm:ss"))
  }

  /** F11 — minutes → hours, 2dp (dataprocessing.py:149). */
  def minutesToHours(c: Column): Column = round(c / 60.0, 2)

  /** F12 — seconds → H:MM:SS with Python str(timedelta) parity: hours are
    * NOT zero-padded and roll past 24 without a day split here (the exact
    * `N days, H:MM:SS` form lives in functions.SecondsToHms).
    * (dataprocessing.py:150). */
  def secondsToHmsCol(secs: Column): Column = {
    val s = secs.cast("long")
    concat_ws(":",
      floor(s / 3600).cast("string"),
      lpad((floor(s / 60) % 60).cast("string"), 2, "0"),
      lpad((s % 60).cast("string"), 2, "0"))
  }

  /** F14 — net subscribers (dataprocessing3.py:53). */
  def net(gained: Column, lost: Column): Column = gained - lost

  /** F15 — engagement rate % : (comments+likes+shares)/views*100 when
    * views>0 else 0, 2dp (dataprocessing3.py:77-79). */
  def engagementRate(comments: Column, likes: Column, shares: Column,
      views: Column): Column =
    round(when(views > 0, (comments + likes + shares) / views * 100)
      .otherwise(lit(0.0)), 2)

  /** F16 — cost-per-view: revenue/views when views>0 else 0, 6dp
    * (dataprocessing3.py:81-83). */
  def cpv(revenue: Column, views: Column): Column =
    round(when(views > 0, revenue / views).otherwise(lit(0.0)), 6)

  /** F17 — RPM = CPV*1000, 2dp (dataprocessing3.py:85-86). */
  def rpm(cpvCol: Column): Column = round(cpvCol * 1000, 2)
}
