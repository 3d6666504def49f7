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
  *
  * The natural key is `<name>#<key>` — NOT the bare name: the synthetic
  * generator reuses a fixed name pool (15k c_name / 1k s_name values at
  * every scale), so at sf10 each name repeats ~100×. SCD semantics
  * require a unique natural key (the reference dedupes snapshots by key
  * before merging — the W1 rank step); feeding duplicate keys into the
  * merge multiplies both classify and the close-join ~dup² — measured as
  * the one catastrophically super-linear sf10 row before this fix
  * (s8_scd_write_roundtrip: 4.9 s at sf1 → 20+ min at sf10).
  */
object ScdQueries {

  private val eff = "2024-06-01"

  private[queries] def masterFor(s: SparkSession, dir: String): DataFrame = master(s, dir)
  private[queries] def snapshotFor(s: SparkSession, dir: String): DataFrame = snapshot(s, dir)
  private[queries] def mergedCte: String = baseCte

  private def master(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey").cast("long").as("id"),
      concat(col("c_name"), lit("#"), col("c_custkey")).as("natural_key"),
      col("c_mktsegment").as("company_name"),
      lit("ACTIVE").as("status"),
      to_date(lit("2023-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_to"))

  private def snapshot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      concat(col("c_name"), lit("#"), col("c_custkey")).as("natural_key"),
      when(col("c_acctbal") < 0, "DELINQ").otherwise(col("c_mktsegment"))
        .as("company_name"),
      lit("ACTIVE").as("status"))
      .unionByName(Tables.load(s, dir, "supplier").select(
        concat(col("s_name"), lit("#"), col("s_suppkey")).as("natural_key"),
        lit("SUPPLIER").as("company_name"),
        lit("ACTIVE").as("status")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_merge" -> ((s, dir) =>
      ScdMerge.merge(master(s, dir), snapshot(s, dir), eff)
        .orderBy("id", "valid_from")),

    "scd2_latest" -> ((s, dir) =>
      ScdMerge.latest(ScdMerge.merge(master(s, dir), snapshot(s, dir), eff))
        .select("id", "natural_key", "company_name", "valid_from")
        .orderBy("id")),

    // S15 full: paged symbol-list provider feed -> identifier validation ->
    // natural keys. The fake feed constructs real FIGI check digits (every
    // 7th corrupted), so the valid count is known by construction.
    "s15_symbol_feed_ingest" -> ((s, dir) => {
      import graft.sources._
      import graft.symbols.Normalizer
      val client = new SymbolFeedClient(
        ClientConfig("http://fake"), AuthStrategy.NoAuth,
        new FakeSymbolServer(nSymbols = 500, pageSize = 97))
      val snap = client.fetchSymbols(s)
        .withColumnRenamed("mic", "exchange_mic")
        .withColumn("cusip", lit(null).cast("string"))
        .withColumn("isin", lit(null).cast("string"))
        .withColumn("cik", lit(null).cast("string"))
      val validated = Normalizer.withNaturalKey(
        Normalizer.withIdentifierValidity(snap))
      validated.agg(
        count(lit(1)).as("n"),
        sum(col("figi_valid").cast("long")).as("n_valid_figi"),
        sum(col("mic_valid").cast("long")).as("n_valid_mic"),
        countDistinct(col("natural_key")).as("n_distinct_keys"))
    }),

    // Identifier format + check-digit validation over md5-derived candidate
    // strings (mixed valid/invalid) plus known-good public identifiers; the
    // oracle reproduces the full checksum math in SQL.
    "sym_identifier_validation" -> ((s, dir) => {
      import graft.symbols.Identifiers
      val h = md5(col("c_custkey").cast("string"))
      val cand = Tables.load(s, dir, "customer").select(
        upper(substring(h, 1, 9)).as("cusip"),
        concat(lit("US"), upper(substring(h, 1, 10))).as("isin"),
        concat(lit("BBG"), upper(substring(h, 1, 8)),
          (col("c_custkey") % 10).cast("string")).as("figi"),
        when(col("c_custkey") % 5 === 0,
          concat(lit("X"), col("c_custkey").cast("string")))
          .otherwise(col("c_custkey").cast("string")).as("cik"),
        when(col("c_custkey") % 3 === 0, upper(substring(col("c_mktsegment"), 1, 5)))
          .otherwise(upper(substring(col("c_mktsegment"), 1, 4))).as("mic"))
      val sp = s; import sp.implicits._
      val known = Seq(
        ("037833100", "US0378331005", "BBG000B9XRY4", "320193", "XNAS"),
        ("594918104", "US5949181045", "BBG000BPH459", "789019", "XNYS"),
        ("38259P508", "GB0002634946", "BBG000B9XRY5", "ABC", "XN!S")
      ).toDF("cusip", "isin", "figi", "cik", "mic")
      // native codegen'd check-digit expressions (one char loop per
      // identifier inside whole-stage codegen; IdentifiersNativeSpec
      // pins them verdict-equal to the declarative twins). History:
      // the bare declarative forms re-ran the interpreted charValues
      // HOF per reference (11.6 s at sf1); pre-binding cut that to
      // 6.5 s; the native loop removes the interpreted passes entirely.
      graft.functions.GraftFunctions.register(s)
      cand.unionByName(known).agg(
        count(lit(1)).as("n"),
        sum(Identifiers.cusipValidNative(col("cusip"))
          .cast("long")).as("n_valid_cusip"),
        sum(Identifiers.isinValidNative(col("isin"))
          .cast("long")).as("n_valid_isin"),
        sum(Identifiers.figiValidNative(col("figi"))
          .cast("long")).as("n_valid_figi"),
        sum(Identifiers.cikValid(col("cik")).cast("long")).as("n_valid_cik"),
        sum(Identifiers.micValid(col("mic")).cast("long")).as("n_valid_mic"))
    })
  )

  private val baseCte =
    s"""WITH master AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS id,
       |         c_name || '#' || CAST(c_custkey AS VARCHAR) AS natural_key,
       |         c_mktsegment AS company_name, 'ACTIVE' AS status,
       |         DATE '2023-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
       |  FROM customer),
       |snap AS (
       |  SELECT c_name || '#' || CAST(c_custkey AS VARCHAR) AS natural_key,
       |         CASE WHEN c_acctbal < 0 THEN 'DELINQ' ELSE c_mktsegment END AS company_name,
       |         'ACTIVE' AS status
       |  FROM customer
       |  UNION ALL
       |  SELECT s_name || '#' || CAST(s_suppkey AS VARCHAR), 'SUPPLIER', 'ACTIVE' FROM supplier),
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

  /** Per-char numeric values of an uppercased identifier (0-9, A-Z->10-35,
    * * -> 36, @ -> 37, # -> 38, else -1) — DuckDB twin of
    * `Identifiers.charValues`.
    */
  private def cvSql(c: String): String =
    s"""list_transform(range(1, length($c) + 1), i ->
       |    CASE WHEN ascii(substr($c, i, 1)) BETWEEN 48 AND 57 THEN ascii(substr($c, i, 1)) - 48
       |         WHEN ascii(substr($c, i, 1)) BETWEEN 65 AND 90 THEN ascii(substr($c, i, 1)) - 55
       |         WHEN ascii(substr($c, i, 1)) = 42 THEN 36
       |         WHEN ascii(substr($c, i, 1)) = 64 THEN 37
       |         WHEN ascii(substr($c, i, 1)) = 35 THEN 38
       |         ELSE -1 END)""".stripMargin

  /** Double even 1-based positions, digit-sum every value, total. */
  private def luhnSumSql(arr: String): String =
    s"""list_sum(list_transform($arr, (v, i) ->
       |    CASE WHEN i % 2 = 0 THEN (v*2)//10 + (v*2)%10 ELSE v//10 + v%10 END))""".stripMargin

  def oracles: Map[String, String] = Map(
    "s15_symbol_feed_ingest" ->
      """WITH g AS (SELECT unnest(range(0, 500)) AS i)
        |SELECT count(*) AS n,
        |       CAST(sum(CASE WHEN i % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_figi,
        |       CAST(count(*) AS BIGINT) AS n_valid_mic,
        |       count(DISTINCT i) AS n_distinct_keys
        |FROM g""".stripMargin,
    "sym_identifier_validation" ->
      s"""WITH h AS (
         |  SELECT md5(CAST(c_custkey AS VARCHAR)) AS hx, c_custkey, c_mktsegment
         |  FROM customer),
         |ids AS (
         |  SELECT upper(substr(hx, 1, 9)) AS cusip,
         |         'US' || upper(substr(hx, 1, 10)) AS isin,
         |         'BBG' || upper(substr(hx, 1, 8)) || CAST(c_custkey % 10 AS VARCHAR) AS figi,
         |         CASE WHEN c_custkey % 5 = 0 THEN 'X' || CAST(c_custkey AS VARCHAR)
         |              ELSE CAST(c_custkey AS VARCHAR) END AS cik,
         |         CASE WHEN c_custkey % 3 = 0 THEN upper(substr(c_mktsegment, 1, 5))
         |              ELSE upper(substr(c_mktsegment, 1, 4)) END AS mic
         |  FROM h
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    ('037833100', 'US0378331005', 'BBG000B9XRY4', '320193', 'XNAS'),
         |    ('594918104', 'US5949181045', 'BBG000BPH459', '789019', 'XNYS'),
         |    ('38259P508', 'GB0002634946', 'BBG000B9XRY5', 'ABC', 'XN!S'))
         |    t(cusip, isin, figi, cik, mic)),
         |cv AS (
         |  SELECT *, ${cvSql("cusip")} AS cv_cusip,
         |         ${cvSql("isin")} AS cv_isin,
         |         ${cvSql("figi")} AS cv_figi
         |  FROM ids),
         |isin_digits AS (
         |  SELECT *, list_reverse(flatten(list_transform(cv_isin, v ->
         |           CASE WHEN v >= 10 THEN [v // 10, v % 10] ELSE [v] END))) AS isin_rev
         |  FROM cv),
         |flags AS (
         |  SELECT
         |    (length(cusip) = 9 AND NOT list_contains(cv_cusip, -1)
         |      AND cv_cusip[9] BETWEEN 0 AND 9
         |      AND ((10 - (${luhnSumSql("cv_cusip[1:8]")} % 10)) % 10) = cv_cusip[9]) AS v_cusip,
         |    (length(isin) = 12 AND regexp_matches(isin, '^[A-Z]{2}')
         |      AND len(list_filter(cv_isin, v -> v = -1 OR v > 35)) = 0
         |      AND cv_isin[12] BETWEEN 0 AND 9
         |      AND (list_sum(list_transform(isin_rev, (d, i) ->
         |            CASE WHEN i % 2 = 0 THEN (d*2)//10 + (d*2)%10 ELSE d END)) % 10) = 0) AS v_isin,
         |    (regexp_matches(figi, '^[B-DF-HJ-NP-TV-Z0-9]{2}G[B-DF-HJ-NP-TV-Z0-9]{8}[0-9]$$')
         |      AND ((10 - (${luhnSumSql("cv_figi[1:11]")} % 10)) % 10) = cv_figi[12]) AS v_figi,
         |    regexp_matches(trim(cik), '^[0-9]{1,10}$$') AS v_cik,
         |    regexp_matches(upper(trim(mic)), '^[A-Z0-9]{4}$$') AS v_mic
         |  FROM isin_digits)
         |SELECT count(*) AS n,
         |       CAST(sum(CASE WHEN v_cusip THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_cusip,
         |       CAST(sum(CASE WHEN v_isin THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_isin,
         |       CAST(sum(CASE WHEN v_figi THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_figi,
         |       CAST(sum(CASE WHEN v_cik THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_cik,
         |       CAST(sum(CASE WHEN v_mic THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_mic
         |FROM flags""".stripMargin,
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
