package graft.symbols

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdMergeSpec extends SparkSpec {

  private def masterDf = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "A", "Alpha", "ACTIVE", "2023-01-01", Option.empty[String]),
      (2L, "B", "Beta", "ACTIVE", "2023-01-01", Option.empty[String]),
      (3L, "C", "Gamma", "ACTIVE", "2022-06-01", Option("2023-01-01")) // already closed
    ).toDF("id", "natural_key", "company_name", "status", "vf", "vt")
      .select(col("id"), col("natural_key"), col("company_name"), col("status"),
        to_date(col("vf")).as("valid_from"), to_date(col("vt")).as("valid_to"))
  }

  private def snapshotDf = {
    val s = spark; import s.implicits._
    Seq(
      ("A", "Alpha", "ACTIVE"),     // unchanged
      ("B", "Beta v2", "ACTIVE"),   // update (company_name changed)
      ("D", "Delta", "ACTIVE")      // insert
    ).toDF("natural_key", "company_name", "status")
  }

  test("classify splits insert/update/unchanged") {
    val cls = ScdMerge.classify(masterDf, snapshotDf)
      .select("natural_key", "action").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cls == Map("A" -> "unchanged", "B" -> "update", "D" -> "insert"))
  }

  test("merge closes updated keys and appends new versions with stable ids") {
    val out = ScdMerge.merge(masterDf, snapshotDf, "2024-06-01").cache()
    assert(out.count() == 5) // 3 original + 1 new B version + 1 D insert
    val bRows = out.where(col("natural_key") === "B").orderBy("valid_from").collect()
    assert(bRows.length == 2)
    assert(bRows(0).getAs[java.sql.Date]("valid_to").toString == "2024-06-01")
    assert(bRows(1).getAs[java.sql.Date]("valid_to") == null)
    assert(bRows(1).getAs[Long]("id") == 2L, "update keeps its surrogate id")
    val dRow = out.where(col("natural_key") === "D").first()
    assert(dRow.getAs[Long]("id") == 4L, "insert gets max(id)+rank")
    // already-closed C row untouched
    val cRow = out.where(col("natural_key") === "C").first()
    assert(cRow.getAs[java.sql.Date]("valid_to").toString == "2023-01-01")
  }

  test("idempotence: re-merging the same snapshot is a no-op") {
    val once = ScdMerge.merge(masterDf, snapshotDf, "2024-06-01")
    val twice = ScdMerge.merge(once, snapshotDf, "2024-07-01")
    assert(twice.count() == once.count(), "no new versions on identical snapshot")
    assert(twice.where(col("valid_to") === to_date(lit("2024-07-01"))).count() == 0)
  }

  test("latest returns one open row per key") {
    val out = ScdMerge.latest(ScdMerge.merge(masterDf, snapshotDf, "2024-06-01"))
    val rows = out.select("natural_key", "company_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("A" -> "Alpha", "B" -> "Beta v2", "D" -> "Delta"))
  }

  test("normalizer dedup keeps latest as_of with provider tie-break") {
    val s = spark; import s.implicits._
    val staged = Seq(
      ("K1", "2024-01-02", "zeta"),
      ("K1", "2024-01-02", "alpha"), // same as_of -> provider ASC wins
      ("K1", "2024-01-01", "alpha"),
      ("K2", "2024-01-01", "beta")
    ).toDF("natural_key", "as_of", "provider")
      .withColumn("as_of", to_date(col("as_of")))
    val out = Normalizer.dedup(staged).collect()
      .map(r => r.getAs[String]("natural_key") ->
        (r.getAs[java.sql.Date]("as_of").toString, r.getAs[String]("provider"))).toMap
    assert(out("K1") == ("2024-01-02", "alpha"))
    assert(out("K2") == ("2024-01-01", "beta"))
  }
}
