package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Humanized rendering (SURVEY §2.8 F13; ref: the reference CLI's
  * humanized sizes/durations in storage stats and job listings) as pure
  * column expressions — codegen'd, no UDF.
  *
  * Number formatting is integer arithmetic (value scaled to tenths, then
  * `d/10 "." d%10`), so the rendered string is bit-identical on any
  * engine — float `format_number` rounding differences can't creep in.
  */
object Humanize {

  private val Ki = 1024L
  private val Mi = Ki * 1024L
  private val Gi = Mi * 1024L
  private val Ti = Gi * 1024L

  /** "512 B", "1.5 KiB", "2.0 MiB", "3.1 GiB", "1.2 TiB". */
  def bytes(b: Column): Column = {
    // Column./ is DOUBLE division — cast back to long for integer parts
    def tenths(unit: Long): Column = (b * 10L / unit).cast("long")
    def render(unit: Long, suffix: String): Column =
      concat((tenths(unit) / 10L).cast("long").cast("string"), lit("."),
        (tenths(unit) % 10L).cast("string"), lit(s" $suffix"))
    when(b < Ki, concat(b.cast("string"), lit(" B")))
      .when(b < Mi, render(Ki, "KiB"))
      .when(b < Gi, render(Mi, "MiB"))
      .when(b < Ti, render(Gi, "GiB"))
      .otherwise(render(Ti, "TiB"))
  }

  /** "45s", "3m 20s", "2h 05m", "1d 02h" — largest two units, zero-padded
    * second unit (the reference's compact duration style).
    */
  def duration(totalSec: Column): Column = {
    val d = (totalSec / 86400L).cast("long")
    val h = (totalSec % 86400L / 3600L).cast("long")
    val m = (totalSec % 3600L / 60L).cast("long")
    val s = (totalSec % 60L).cast("long")
    def pad2(c: Column): Column = lpad(c.cast("string"), 2, "0")
    when(totalSec < 60L, concat(s.cast("string"), lit("s")))
      .when(totalSec < 3600L,
        concat(m.cast("string"), lit("m "), pad2(s), lit("s")))
      .when(totalSec < 86400L,
        concat(h.cast("string"), lit("h "), pad2(m), lit("m")))
      .otherwise(concat(d.cast("string"), lit("d "), pad2(h), lit("h")))
  }
}
