package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date-part key derivations — the engine's replacement for the reference's
  * per-row Python `_add_keys` RDD map (bicis/etl/feature_extraction/
  * basic_features.py:71-88), which broke Catalyst and pickled every row.
  * Here each key is a pure codegen'd column expression: the whole series
  * pipeline stays in one WholeStageCodegen span.
  *
  * Semantics pinned to the reference:
  *  - weekday key = ISO weekday 1..7 Mon..Sun (`isoweekday()`,
  *    basic_features.py:79)
  *  - weekday group = ISO (year, week); we use the Monday-truncated
  *    timestamp, which is 1:1 with (iso_year, iso_week) and portable
  *    across engines (basic_features.py:80 `isocalendar()[:2]`)
  *  - month key = 1..12, group = month-truncated ts (basic_features.py:82-83)
  *  - hour key = 0..23, group = hour-truncated ts (basic_features.py:85-86)
  */
object TimeKeys {

  /** ISO weekday: Monday=1 .. Sunday=7. Spark's `dayofweek` is Sunday=1. */
  def isoWeekday(ts: Column): Column = ((dayofweek(ts) + 5) % 7) + 1

  /** Group column that identifies one concrete ISO week (Monday-truncated). */
  def weekGroup(ts: Column): Column = date_trunc("week", ts)

  def hourKey(ts: Column): Column = hour(ts)
  def hourGroup(ts: Column): Column = date_trunc("hour", ts)

  def monthKey(ts: Column): Column = month(ts)
  def monthGroup(ts: Column): Column = date_trunc("month", ts)

  /** (key, group) pair for a named period kind: weekday | hour | month. */
  def keyAndGroup(kind: String, ts: Column): (Column, Column) = kind match {
    case "weekday" => (isoWeekday(ts), weekGroup(ts))
    case "hour"    => (hourKey(ts), hourGroup(ts))
    case "month"   => (monthKey(ts), monthGroup(ts))
    case other     => throw new IllegalArgumentException(s"unknown period kind: $other")
  }
}
