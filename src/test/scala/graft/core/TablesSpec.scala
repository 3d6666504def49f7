package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TablesSpec extends SparkSpec {

  test("events legacy ns-long branch: ts is exact integer µs (no double-division drift)") {
    val s = spark; import s.implicits._
    // 1704202200000016000 is a real driver-window ns epoch where
    // (long)(double(ns)/1000) lands 1 µs LOW (ns > 2^53 so double(ns)
    // rounds before dividing) — the regression the `ts div 1000` fix pins
    val adversarial = Seq(
      1704202200000016000L, 1704202200000080000L, 1704202200000144000L,
      1704202200000000000L, 1704202200000000999L) // +999 ns: truncates to µs
    val dir = tmpDir("tables_events")
    adversarial.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts, s"e$i") }
      .toDF("event_id", "ts", "kind")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables.events(s, dir)
      .select(col("event_id"), col("ts_ns"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    adversarial.zipWithIndex.foreach { case (ts, i) =>
      val (tsNs, us) = out(i.toLong)
      assert(tsNs == ts - ts % 1000L, s"ts_ns must truncate ns to µs for $ts")
      assert(us == ts / 1000L, s"ts must be EXACTLY ns div 1000 for $ts, got $us")
    }
  }
}
