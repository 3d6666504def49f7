package graft.queries

import graft.core.Tables
import graft.symbols.ScdMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCD-2 dimension pipeline queries (SURVEY §2.1 S8, §2.3 J1/J3, §2.7 U2).
  *
  * Deterministic scenario built from testdata: the current master is the
  * customer dimension (one open version per customer); the incoming
  * snapshot re-reads customers (company_name flips to 'DELINQ' for
  * negative balances -> updates) and adds suppliers (new keys -> inserts).
  */
object ScdQueries {

  private val eff = "2024-06-01"

  private def master(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey").cast("long").as("id"),
      col("c_name").as("natural_key"),
      col("c_mktsegment").as("company_name"),
      lit("ACTIVE").as("status"),
      to_date(lit("2023-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_to"))

  private def snapshot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_name").as("natural_key"),
      when(col("c_acctbal") < 0, "DELINQ").otherwise(col("c_mktsegment"))
        .as("company_name"),
      lit("ACTIVE").as("status"))
      .unionByName(Tables.load(s, dir, "supplier").select(
        col("s_name").as("natural_key"),
        lit("SUPPLIER").as("company_name"),
        lit("ACTIVE").as("status")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_merge" -> ((s, dir) =>
      ScdMerge.merge(master(s, dir), snapshot(s, dir), eff)
        .orderBy("id", "valid_from")),

    "scd2_latest" -> ((s, dir) =>
      ScdMerge.latest(ScdMerge.merge(master(s, dir), snapshot(s, dir), eff))
        .select("id", "natural_key", "company_name", "valid_from")
        .orderBy("id"))
  )

  private val baseCte =
    s"""WITH master AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS natural_key,
       |         c_mktsegment AS company_name, 'ACTIVE' AS status,
       |         DATE '2023-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
       |  FROM customer),
       |snap AS (
       |  SELECT c_name AS natural_key,
       |         CASE WHEN c_acctbal < 0 THEN 'DELINQ' ELSE c_mktsegment END AS company_name,
       |         'ACTIVE' AS status
       |  FROM customer
       |  UNION ALL
       |  SELECT s_name, 'SUPPLIER', 'ACTIVE' FROM supplier),
       |cur AS (SELECT * FROM master WHERE valid_to IS NULL),
       |cls AS (
       |  SELECT s.natural_key, s.company_name, s.status, m.id AS m_id,
       |         CASE WHEN m.natural_key IS NULL THEN 'insert'
       |              WHEN s.company_name IS DISTINCT FROM m.company_name
       |                OR s.status IS DISTINCT FROM m.status THEN 'update'
       |              ELSE 'unchanged' END AS action
       |  FROM snap s LEFT JOIN cur m ON s.natural_key = m.natural_key),
       |closed AS (
       |  SELECT id, natural_key, company_name, status, valid_from,
       |         CASE WHEN valid_to IS NULL AND natural_key IN
       |                (SELECT natural_key FROM cls WHERE action = 'update')
       |              THEN DATE '$eff' ELSE valid_to END AS valid_to
       |  FROM master),
       |newv AS (
       |  SELECT id, natural_key, company_name, status,
       |         DATE '$eff' AS valid_from, CAST(NULL AS DATE) AS valid_to
       |  FROM (
       |    SELECT (SELECT coalesce(max(id), 0) FROM master)
       |             + row_number() OVER (ORDER BY natural_key) AS id,
       |           natural_key, company_name, status
       |    FROM cls WHERE action = 'insert'
       |    UNION ALL
       |    SELECT m_id, natural_key, company_name, status
       |    FROM cls WHERE action = 'update')),
       |merged AS (SELECT * FROM closed UNION ALL SELECT * FROM newv)""".stripMargin

  def oracles: Map[String, String] = Map(
    "scd2_merge" ->
      s"""$baseCte
         |SELECT * FROM merged ORDER BY id, valid_from""".stripMargin,
    "scd2_latest" ->
      s"""$baseCte
         |SELECT id, natural_key, company_name, valid_from FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY valid_from DESC) AS rn
         |  FROM merged)
         |WHERE rn = 1 AND valid_to IS NULL ORDER BY id""".stripMargin
  )
}
