package graft.datapipe

import graft.core.Materialize
import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs, built from this package's operators:
  *
  *   0. (opt-in) line normalization — within-doc line dedup
  *      (`dedupLinesWithinDoc`) and/or corpus boilerplate-line removal
  *      (`boilerplateMinDocFreq`); docs whose every line is boilerplate
  *      drop here
  *   1. exact dedup (keep lowest id per normalized content)
  *   2. near-dup removal (n-gram Jaccard pairs -> survivor selection)
  *   3. language filter (marker-based langid ∈ allowed set)
  *   4. quality stage — either the composite quality-score floor
  *      (default) or the C4/Gopher-style [[QualityRules]] ruleset
  *      (set `qualityRuleset`)
  *   5. repetition cap (duplicated-token ratio <= maxDupTokenRatio)
  *   6. (opt-in) bigram-LM floor (`lmScoreFloorMicro`): a
  *      [[LanguageModel]] trained on the pipeline's own survivors scores
  *      them; docs below the micro-nat floor (or too short to score —
  *      < 2 tokens) drop
  *   7. PII redaction (transform, not filter)
  *
  * Filters are ordered cheapest-effective-first at scale: line
  * normalization is a map plus the bounded blocklist join; exact dedup
  * is a hash groupBy; near-dup is the only pairwise stage
  * (inverted-index bounded); 3-5 are pure maps; the LM floor is two
  * count-table joins over survivors only; redaction is a pure map on
  * what remains. Returns the curated frame plus a per-stage retention
  * count frame — the numbers a pipeline report needs.
  *
  * The opt-in stages assume/preserve (idCol, textCol) only — supply a
  * two-column frame (the curation contract throughout this object).
  */
object Curate {

  final case class Config(
      ngramN: Int = 3,
      jaccardThreshold: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      maxDupTokenRatio: Double = 0.6,
      qualityRuleset: Option[QualityRules.Config] = None,
      dedupLinesWithinDoc: Boolean = false,
      boilerplateMinDocFreq: Option[Long] = None,
      lmScoreFloorMicro: Option[Long] = None,
      // opt-in near-dup auto-routing: measure the exhaustive operator's
      // pair budget FIRST (one linear shingle+count job over the
      // exact-dedup frontier) and take the two-stage LSH-propose +
      // Jaccard-verify path (d2b, Lee et al. 2022) when candidate_pairs
      // exceeds pairBudgetFactor·|docs| — the measured crossover where
      // the exhaustive Σdf² posting cost leaves its envelope (SCALE.md:
      // ×15.7 vs ×7.4 for 10× rows at sf10). Default off: the default
      // path keeps the zero-extra-job observe ride and the exhaustive
      // (recall-oracle) pair set.
      autoRouteNearDup: Boolean = false,
      pairBudgetFactor: Long = 50L)

  /** Returns (curated documents with redacted text, stage counts).
    *
    * Stage counts cost ONE extra job total: the input, boilerplate, and
    * exact-dedup counts ride Observations on the frontier
    * materializations the pipeline performs anyway, and a single
    * aggregate over the (frontiered) near-dedup survivors computes the
    * cumulative lang/quality/repetition counts — and, on the ruleset
    * path, every per-rule drop count (`rule:<name>` rows, counted among
    * language-passing docs) — as conditional sums in one pass. The map
    * stages themselves are never re-executed per count. (One exception:
    * boilerplate-without-line-dedup pays an explicit input count — that
    * plan scans the raw docs twice, where a shared observe node would
    * double-count.)
    */
  def run(docs: DataFrame, cfg: Config = Config(),
          textCol: String = "text", idCol: String = "doc_id",
          scope: Option[graft.core.FrontierScope] = None)
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    // the input count rides an Observation through the first
    // SINGLE-SCAN materialization of the chain (the exact-dedup frontier
    // by default; the line-normalization frontier on that opt-in path),
    // so "0_input" costs zero extra jobs. The one shape it cannot ride:
    // boilerplate-without-line-dedup materializes a plan that scans the
    // raw docs TWICE (blocklist build + strip join) — a shared observe
    // node there would double-count, so that path keeps the explicit
    // docs.count().
    val docsObs = new Observation(
      "curate_in_" + java.util.UUID.randomUUID().toString.take(8))
    val observeOnDocs =
      cfg.boilerplateMinDocFreq.isEmpty || cfg.dedupLinesWithinDoc
    val docs0 =
      if (observeOnDocs) docs.observe(docsObs, count(lit(1)).as("n")) else docs

    // stage 0: line normalization (both default-off). Within-doc dedup is
    // a pure map; boilerplate stripping is frontiered because its output
    // feeds both the count and the dedup chain, and docs reduced to
    // nothing (every line corpus-frequent) drop here.
    val preLines0 =
      if (cfg.dedupLinesWithinDoc)
        docs0.withColumn(textCol, Boilerplate.dedupLinesInDoc(col(textCol)))
      else docs0
    // stripBoilerplate scans its input twice (blocklist build + strip
    // join) — when the O(lines²)-per-doc dedup expression feeds it,
    // materialize first so the dedup runs once, not twice
    val preLinesH =
      if (cfg.dedupLinesWithinDoc && cfg.boilerplateMinDocFreq.isDefined)
        Some(Materialize.frontierHandle(preLines0))
      else None
    val preLines = preLinesH.map(_.df).getOrElse(preLines0)
    // the boilerplate-survivor count observes the stripping frontier's
    // own materialization — no separate count() action
    val boilerObs = cfg.boilerplateMinDocFreq.map { k =>
      val (h, m) = Materialize.frontierObserved(
        Boilerplate.stripBoilerplate(preLines, k, textCol, idCol)
          .where(col("n_removed") < col("n_lines"))
          .select(col(idCol), col(textCol)),
        count(lit(1)).as("n"))
      (h, m("n").asInstanceOf[Long])
    }
    val boilerH = boilerObs.map(_._1)
    // the line-normalized frame fed only the boilerplate pass, which is
    // now materialized — free it before the heavy stages run
    if (boilerH.isDefined) preLinesH.foreach(_.release())
    val boiler = boilerH.map(_.df)
    val input = boiler.getOrElse(preLines)
    // materialize the two frontiers that everything downstream re-reads:
    // exactKeep feeds BOTH the pair generation and the survivor join, and
    // afterNear feeds the annotation pass (counts) plus the final
    // redaction — without this, each action re-executes the (expensive)
    // pairwise stage. Its own row count is observed on the same job.
    val (afterExactH, exactMetrics) = Materialize.frontierObserved(
      Dedup.exactKeep(input, textCol, idCol), count(lit(1)).as("n"))
    val nExact = exactMetrics("n").asInstanceOf[Long]
    val afterExact = afterExactH.df
    // the pair frame lazily reads ngramJaccardPairs' internal postings /
    // pair-array frontiers; scope them and free as soon as afterNear (the
    // only consumer) is materialized. The pair-budget Observation rides
    // the postings stage of that same execution (VERDICT r14 item 6):
    // candidate_pairs is the exact pair-scoring work the near-dup stage
    // did, surfaced in the stage report so a pipeline operator sees when
    // the exhaustive d2 path leaves its envelope (candidate_pairs above
    // the 50·|docs| budget line ⇒ route to the two-stage LSH+verify d2b).
    val pairScope = new graft.core.FrontierScope
    val pairBudget = cfg.pairBudgetFactor * nExact
    // autoRouteNearDup computes the routing signal UP FRONT — one linear
    // shingle+count job over the already-materialized exact-dedup
    // frontier — because the path choice needs it before the pair stage
    // runs; the decision and both outcomes are logged and surfaced as a
    // `route:` stage row. The default path keeps the free observe ride.
    val preSignal: Option[(Long, Long)] =
      if (cfg.autoRouteNearDup)
        Some(Dedup.pairBudgetSignal(afterExact, cfg.ngramN,
          textCol = textCol, idCol = idCol))
      else None
    val overBudget = preSignal.exists(_._1 > pairBudget)
    val routeName = if (overBudget) "d2b_lsh_verify" else "d2_exhaustive"
    if (cfg.autoRouteNearDup)
      org.slf4j.LoggerFactory.getLogger("graft.datapipe.Curate").info(
        s"curate: near-dup auto-route -> $routeName (candidate_pairs=" +
          s"${preSignal.get._1}, budget=$pairBudget)")
    val pairObs =
      if (preSignal.isDefined) None
      else Some(new Observation(
        "curate_pair_budget_" + java.util.UUID.randomUUID().toString.take(8)))
    val pairs =
      if (overBudget)
        // two-stage scale path: LSH bands propose, exact Jaccard disposes
        // (same composition as the d2b query row; pair-set equality with
        // the exhaustive operator is DedupSpec-pinned at threshold 0.5)
        Dedup.jaccardVerifyCandidates(afterExact,
          Dedup.minhashLshCandidates(afterExact, n = cfg.ngramN,
            textCol = textCol, idCol = idCol),
          cfg.ngramN, cfg.jaccardThreshold, textCol, idCol)
      else
        Dedup.ngramJaccardPairsWithSignal(afterExact, cfg.ngramN,
          cfg.jaccardThreshold, textCol = textCol, idCol = idCol,
          scope = Some(pairScope), observation = pairObs)._1
    val afterNearH =
      Materialize.frontierHandle(Dedup.nearDupKeep(afterExact, pairs, idCol))
    pairScope.close()
    val afterNear = afterNearH.df
    // The materialization above executed the postings stage, so on the
    // observe path the metrics normally arrive promptly. One documented
    // blind spot: a ZERO-pair corpus — which a LARGE corpus can hit for
    // real when no pair clears the jaccard threshold (e.g. many shared
    // boilerplate shingles but no near-duplicate docs) — lets AQE's
    // empty-relation propagation prune the branch holding the
    // CollectMetricsExec mid-execution, completing the observation with
    // an EMPTY row. The read below is BOUNDED (never blocks the pipeline
    // on a listener that will not fire); on the empty/pruned outcome the
    // signal is recomputed directly from the materialized exact-dedup
    // frontier — one extra linear re-tokenize/re-shingle pass, roughly
    // the postings stage's map cost paid a second time, which the warn
    // makes visible.
    val (nCandidatePairs, nCappedShingles) = preSignal.getOrElse {
      val obs = pairObs.get
      // bounded read via the public future: a completed future (the
      // normal delivery AND the pruned-empty-row outcome) returns
      // immediately; only a listener that never fires at all waits out
      // the 5 s bound before taking the recompute fallback
      val row =
        try Some(scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(5, java.util.concurrent.TimeUnit.SECONDS)))
        catch { case _: java.util.concurrent.TimeoutException => None }
      val sig: Map[String, Any] = row match {
        case Some(r) if r.schema != null && r.schema.nonEmpty =>
          r.schema.fieldNames.zipWithIndex
            .map { case (n, i) => n -> r.get(i) }.toMap
        case _ => Map.empty
      }
      if (sig.contains("candidate_pairs"))
        (sig("candidate_pairs").asInstanceOf[Long],
          sig("capped_shingles").asInstanceOf[Long])
      else {
        // operational visibility: the fallback re-shingles the corpus —
        // a pipeline operator should know the stage report paid for it
        org.slf4j.LoggerFactory.getLogger("graft.datapipe.Curate").warn(
          "curate: pair-budget observe pruned (empty pair branch); " +
            "recomputing signal directly from the exact-dedup frontier")
        Dedup.pairBudgetSignal(afterExact, cfg.ngramN,
          textCol = textCol, idCol = idCol)
      }
    }

    // annotate every remaining stage as a boolean column (pure map over the
    // frontier) so counts and the curated filter share one plan
    val ruleset = cfg.qualityRuleset.map { qcfg0 =>
      // the ruleset's stopword rule is language-specific: if the caller
      // widened allowedLangs but left the default English stopword list,
      // widen the list to the allowed languages' markers — otherwise every
      // non-English doc that passed the lang filter fails
      // low_stopword_ratio and the multilingual corpus silently collapses
      // to English
      if (qcfg0.stopwords == TextAnalysis.markers("en") &&
          cfg.allowedLangs != Seq("en"))
        qcfg0.copy(stopwords = cfg.allowedLangs
          .flatMap(l => TextAnalysis.markers.getOrElse(l, Nil)).distinct)
      else qcfg0
    }
    val withQuality = ruleset match {
      case Some(qcfg) =>
        QualityRules.annotate(afterNear, qcfg, textCol)
          .withColumn("__quality_ok", size(col("failed_rules")) === 0)
      case None =>
        TextAnalysis.withRepetition(
            TextAnalysis.withQuality(afterNear, textCol), textCol)
          .withColumn("quality", TextAnalysis.qualityScore)
          .withColumn("__quality_ok", col("quality") >= cfg.minQuality)
    }
    // on the ruleset path the repetition cap follows the ruleset's own
    // dup-token threshold (the rule already enforces it inside
    // __quality_ok, so stage 5 never drops below stage 4 there) — using
    // cfg.maxDupTokenRatio would silently re-tighten a loosened ruleset
    val repCap = ruleset.map(_.maxDupTokenRatio).getOrElse(cfg.maxDupTokenRatio)
    val annotated = withQuality
      .withColumn("__lang_ok",
        TextAnalysis.langId(col(textCol)).isin(cfg.allowedLangs.map(lit): _*))
      .withColumn("__rep_ok", col("dup_token_ratio") <= repCap)

    val keepAll = col("__lang_ok") && col("__quality_ok") && col("__rep_ok")
    // the FILTER rides the pushdown fence (see QualityRules.kept: alias
    // substitution would multiply the quality-metrics pass per metric
    // reference); the un-fenced keepAll stays usable inside the stage
    // aggregate below (non-deterministic expressions are rejected in
    // aggregate arguments, and aggregates never push predicates anyway)
    val survivors = annotated
      .where(graft.functions.PushdownBarrier.fence(keepAll))
      .drop("__lang_ok", "__quality_ok", "__rep_ok", "failed_rules")
    // stage 6 (opt-in): bigram-LM floor, self-trained on the survivors —
    // the trusted slice IS what the heuristic stages kept. Frontiered so
    // training, scoring, and the final filter share one materialization;
    // docs with < 2 tokens cannot be scored and drop (inner join).
    val afterLmH = cfg.lmScoreFloorMicro.map { floor =>
      val baseH = Materialize.frontierHandle(survivors)
      val base = baseH.df
      val passing = LanguageModel.score(base,
          LanguageModel.unigramCounts(base, textCol),
          LanguageModel.bigramCounts(base, textCol, idCol), textCol, idCol)
        .where(col("mean_logp_micro") >= floor)
        .select(col(idCol))
      // frontier the JOINED result, not just base: the train+score
      // pipeline (two count shuffles + the bigram explode-join) feeds
      // both the 6_lm_floor count and the returned curated frame — left
      // lazy it would execute twice
      val h = Materialize.frontierHandle(base.join(passing, Seq(idCol)))
      // base fed train + score + the join, all inside the frontier just
      // materialized — free it now
      baseH.release()
      h
    }
    val afterLm = afterLmH.map(_.df)
    val curated = afterLm.getOrElse(survivors)
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))

    def cnt(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))
    val ruleNames = cfg.qualityRuleset.toSeq
      .flatMap(q => QualityRules.rules(q).map(_._1))
    // the LM-floor count rides the SAME aggregate: the materialized LM
    // survivor ids join back onto the annotated frame as an __lm_ok flag
    // (an id-only scan of the already-written frontier parquet), so no
    // separate count() action runs for stage 6. No broadcast hint: the
    // survivor-id side is corpus-sized, so AQE decides at runtime.
    val annotatedAll = afterLm match {
      case Some(f) =>
        annotated.join(
          f.select(col(idCol)).withColumn("__lm_ok", lit(true)),
          Seq(idCol), "left")
      case None => annotated
    }
    val stageAggs = Seq(
      count(lit(1)).as("__near"),
      cnt(col("__lang_ok")).as("__lang"),
      cnt(col("__lang_ok") && col("__quality_ok")).as("__quality"),
      cnt(keepAll).as("__rep")) ++
      afterLm.map(_ => cnt(col("__lm_ok")).as("__lm")).toSeq ++
      ruleNames.map(r =>
        cnt(col("__lang_ok") && array_contains(col("failed_rules"), r)).as(r))
    val row = annotatedAll.agg(stageAggs.head, stageAggs.tail: _*).first()

    // every observation below has fired by now: the exact-dedup frontier
    // (and the line-normalization frontier, when present) materialized
    // above, so .get returns immediately
    val nInput = if (observeOnDocs) docsObs.get("n").asInstanceOf[Long]
                 else docs.count()
    val counts = (Seq(("0_input", nInput)) ++
      boilerObs.map(b => ("0b_boilerplate", b._2)).toSeq ++
      Seq(
        ("1_exact_dedup", nExact),
        ("2_near_dedup", row.getAs[Long]("__near")),
        ("3_lang_filter", row.getAs[Long]("__lang")),
        ("4_quality_floor", row.getAs[Long]("__quality")),
        ("5_repetition_cap", row.getAs[Long]("__rep"))) ++
      afterLm.map(_ => ("6_lm_floor", row.getAs[Long]("__lm"))).toSeq ++
      ruleNames.map(r => (s"rule:$r", row.getAs[Long](r))) ++
      // near-dup routing signal (exact pair work + the budget line it is
      // judged against + the cap-approximation flag) — on the default
      // path it rode the materialization the pipeline performed anyway.
      // The route row names the path the stage took; it appears only
      // when autoRouteNearDup actually made a decision (the default
      // path's report shape is a fixed cross-engine contract).
      Seq(
        ("signal:candidate_pairs", nCandidatePairs),
        ("signal:capped_shingles", nCappedShingles),
        ("signal:pair_budget", pairBudget)) ++
      (if (cfg.autoRouteNearDup) Seq((s"route:$routeName", 1L)) else Nil))
      .toDF("stage", "n_docs")
    // every count action has run; free the intermediates deterministically.
    // Result-backing frontiers (afterNear on the default path, afterLm on
    // the LM path) go to the caller's scope — GC-managed when none, the
    // pre-scope behavior.
    // Block-loss caveat (Frontier contract nuance): `curated` still has
    // actions to run, and on the persist (DISK_ONLY_2) materialization
    // path its lineage reaches back through the intermediates released
    // here. Local mode (this engine's test/bench reality) and healthy
    // replicas never recompute, so the release is safe; on a cluster
    // where BOTH replicas of a persisted block die, a later `curated`
    // action would recompute through a released upstream and fail
    // instead of recomputing quietly. If that failure mode matters more
    // than prompt memory, hold these releases in the caller's scope
    // (scope.track) instead — deterministic-release-vs-self-healing is
    // a deployment choice, not a correctness one.
    boilerH.foreach(_.release())
    afterExactH.release()
    if (afterLmH.isDefined) {
      // curated rides the LM frontier only; the near-dedup frontier's
      // last consumer was the stage aggregate above
      afterNearH.release()
      afterLmH.foreach(h => scope.foreach(_.track(h)))
    } else {
      scope.foreach(_.track(afterNearH))
    }
    (curated, counts)
  }
}
