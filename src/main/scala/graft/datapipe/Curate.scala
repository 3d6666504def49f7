package graft.datapipe

import graft.core.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs, built from this package's operators:
  *
  *   1. exact dedup (keep lowest id per normalized content)
  *   2. near-dup removal (n-gram Jaccard pairs -> survivor selection)
  *   3. language filter (marker-based langid ∈ allowed set)
  *   4. quality floor (composite quality score >= minQuality)
  *   5. repetition cap (duplicated-token ratio <= maxDupTokenRatio)
  *   6. PII redaction (transform, not filter)
  *
  * Filters are ordered cheapest-effective-first at scale: exact dedup is
  * a hash groupBy; near-dup is the only pairwise stage (inverted-index
  * bounded); 3-5 are pure maps; redaction is a pure map on survivors
  * only. Returns the curated frame plus a per-stage retention count
  * frame — the numbers a pipeline report needs.
  */
object Curate {

  final case class Config(
      ngramN: Int = 3,
      jaccardThreshold: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      maxDupTokenRatio: Double = 0.6)

  /** Returns (curated documents with redacted text, stage counts). */
  def run(docs: DataFrame, cfg: Config = Config(),
          textCol: String = "text", idCol: String = "doc_id")
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._

    val input = docs
    // materialize the two frontiers that everything downstream re-reads:
    // exactKeep feeds BOTH the pair generation and the survivor join, and
    // afterNear feeds four filter stages plus the final redaction — without
    // this, each stage count() re-executes the (expensive) pairwise stage
    val afterExact = Materialize.frontier(Dedup.exactKeep(input, textCol, idCol))
    val pairs = Dedup.ngramJaccardPairs(afterExact, cfg.ngramN,
      cfg.jaccardThreshold, textCol = textCol, idCol = idCol)
    val afterNear = Materialize.frontier(Dedup.nearDupKeep(afterExact, pairs, idCol))
    val afterLang = afterNear.where(
      TextAnalysis.langId(col(textCol)).isin(cfg.allowedLangs.map(lit): _*))
    val afterQuality = TextAnalysis.withQuality(afterLang, textCol)
      .withColumn("quality", TextAnalysis.qualityScore)
      .where(col("quality") >= cfg.minQuality)
    val afterRep = TextAnalysis.withRepetition(afterQuality, textCol)
      .where(col("dup_token_ratio") <= cfg.maxDupTokenRatio)
    val curated = afterRep
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))

    // one count per stage: each is a cheap agg over an already-built frame
    val counts = Seq(
      ("0_input", input.count()),
      ("1_exact_dedup", afterExact.count()),
      ("2_near_dedup", afterNear.count()),
      ("3_lang_filter", afterLang.count()),
      ("4_quality_floor", afterQuality.count()),
      ("5_repetition_cap", afterRep.count())
    ).toDF("stage", "n_docs")
    (curated, counts)
  }
}
