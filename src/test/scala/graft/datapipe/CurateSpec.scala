package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {

  test("curation drops dups, wrong languages, junk; redacts survivors") {
    val s = spark; import s.implicits._
    val good = "the quick brown fox and the lazy dog of a house with many different words inside"
    val docs = Seq(
      (1L, good + " contact me at jane@corp.com today"),
      (2L, good + " contact me at jane@corp.com today"), // exact dup of 1
      (3L, good + " contact me at jane@corp.com now"),   // near dup of 1
      (4L, "der hund und die katze und das haus und der garten und nicht mehr"), // german
      (5L, "spam spam spam spam spam spam spam spam spam the"), // degenerate EN
      (6L, "the cat and the dog of a house walked to a park and found many things there")
    ).toDF("doc_id", "text")
    val (curated, counts) = Curate.run(docs)
    val c = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c("0_input") == 6L)
    assert(c("1_exact_dedup") == 5L)    // doc 2 dropped
    assert(c("2_near_dedup") == 4L)     // doc 3 dropped
    assert(c("3_lang_filter") == 3L)    // doc 4 dropped
    assert(c("4_quality_floor") == 3L)  // doc 5 passes quality...
    assert(c("5_repetition_cap") == 2L) // ...but its 0.8 dup-token ratio fails here
    val kept = curated.collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 6L))
    val redacted = curated.where(col("doc_id") === 1L)
      .select("text").first().getString(0)
    assert(redacted.contains("<EMAIL>") && !redacted.contains("jane@corp.com"))
  }

  test("ruleset quality stage: config-selectable, per-rule drop counts") {
    val s = spark; import s.implicits._
    // 24 tokens, prose-shaped: passes every QualityRules default threshold
    val clean = "the quick brown fox jumps over a lazy dog and runs " +
      "of to the big field where many other animals play games all day long"
    val docs = Seq(
      (1L, clean),                                          // keeps
      (2L, clean),                                          // exact dup of 1
      (3L, "der hund und die katze und das haus und der garten und nicht mehr"), // german
      (4L, "the " + ("spam " * 30).trim),                   // en, degenerate repetition
      (5L, "the cat sat on a mat")                          // en, too few tokens
    ).toDF("doc_id", "text")
    val cfg = Curate.Config(qualityRuleset = Some(QualityRules.Config()))
    val (curated, counts) = Curate.run(docs, cfg)
    val c = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c("0_input") == 5L)
    assert(c("1_exact_dedup") == 4L)   // doc 2 dropped
    assert(c("2_near_dedup") == 4L)
    assert(c("3_lang_filter") == 3L)   // doc 3 dropped
    assert(c("4_quality_floor") == 1L) // docs 4 and 5 fail the ruleset
    assert(c("5_repetition_cap") == 1L)
    // per-rule drop counts (among language-passing docs) are in the report
    assert(c("rule:high_dup_token_ratio") == 1L) // doc 4
    assert(c("rule:too_few_tokens") == 1L)       // doc 5
    assert(c("rule:too_many_tokens") == 0L)
    assert(curated.collect().map(_.getAs[Long]("doc_id")).toSet == Set(1L))
  }

  test("pair-budget routing signal is surfaced in the stage report") {
    val s = spark; import s.implicits._
    val good = "the quick brown fox and the lazy dog of a house with many different words inside"
    val docs = Seq(
      (1L, good + " contact me at jane@corp.com today"),
      (2L, good + " contact me at jane@corp.com today"),
      (3L, good + " contact me at jane@corp.com now"),
      (4L, "der hund und die katze und das haus und der garten und nicht mehr"),
      (5L, "spam spam spam spam spam spam spam spam spam the"),
      (6L, "the cat and the dog of a house walked to a park and found many things there")
    ).toDF("doc_id", "text")
    val (_, counts) = Curate.run(docs)
    val c = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the budget line is 50·|post-exact-dedup docs| (the d2→d2b routing
    // threshold documented on ngramJaccardPairsWithSignal)
    assert(c("signal:pair_budget") == 50L * c("1_exact_dedup"))
    assert(c("signal:capped_shingles") == 0L)
    // candidate_pairs must equal the independent Σ df-choose-2 over the
    // post-exact-dedup distinct-shingle postings (df ≤ default cap 1000)
    val afterExact = Dedup.exactKeep(docs)
    val expected = Dedup.shingles(afterExact, n = 3)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2)
      .agg(coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0.0)))
      .first().getDouble(0).toLong
    assert(c("signal:candidate_pairs") == expected && expected > 0L)

    // zero-pair corpus: AQE's empty-relation propagation prunes the
    // branch carrying the observe (the Observation completes EMPTY) and
    // the direct-aggregate fallback must supply the signal instead.
    // Shared stopwords still produce shared shingles (candidate work)
    // without any pair crossing the jaccard threshold.
    val disjoint = Seq(
      (1L, "the quick brown fox and the lazy dog of a house with many different words inside"),
      (2L, "the garden path and the stone wall of a tower with seven ancient carved gates there"),
      (3L, "the river bend and the misty hill of a valley with twelve golden autumn leaves falling")
    ).toDF("doc_id", "text")
    val (_, counts2) = Curate.run(disjoint)
    val c2 = counts2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2("2_near_dedup") == 3L, "fixture must produce zero pairs")
    val expected2 = Dedup.shingles(disjoint, n = 3)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2)
      .agg(coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0.0)))
      .first().getDouble(0).toLong
    assert(c2("signal:candidate_pairs") == expected2,
      "fallback signal must equal the direct Σ df-choose-2")
    assert(c2("signal:pair_budget") == 50L * c2("1_exact_dedup"))
  }

  test("autoRouteNearDup routes on the pair budget — both directions") {
    val s = spark; import s.implicits._
    // UNDER budget: the standard fixture's candidate_pairs is far below
    // 50·|docs|, so the auto-router must keep the exhaustive path and
    // reproduce the default path's report and survivors exactly
    val good = "the quick brown fox and the lazy dog of a house with many different words inside"
    val docs = Seq(
      (1L, good + " contact me at jane@corp.com today"),
      (2L, good + " contact me at jane@corp.com today"),
      (3L, good + " contact me at jane@corp.com now"),
      (4L, "der hund und die katze und das haus und der garten und nicht mehr"),
      (5L, "spam spam spam spam spam spam spam spam spam the"),
      (6L, "the cat and the dog of a house walked to a park and found many things there")
    ).toDF("doc_id", "text")
    val (curatedD, countsD) = Curate.run(docs)
    val (curatedA, countsA) =
      Curate.run(docs, Curate.Config(autoRouteNearDup = true))
    val cd = countsD.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ca = countsA.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ca("route:d2_exhaustive") == 1L)
    assert(!ca.contains("route:d2b_lsh_verify"))
    assert(ca("signal:candidate_pairs") <= ca("signal:pair_budget"))
    // identical report apart from the route row (the default path's
    // report shape is a fixed cross-engine contract — no route row there)
    assert(!cd.keys.exists(_.startsWith("route:")))
    assert(ca.filterNot(_._1.startsWith("route:")) == cd)
    assert(curatedA.collect().map(_.getAs[Long]("doc_id")).toSet ==
      curatedD.collect().map(_.getAs[Long]("doc_id")).toSet)

    // OVER budget: three near-identical ~80-token docs share 78 shingles
    // at df=3 — 234 candidate pairs over the 150 budget line — so the
    // stage must switch to the LSH-propose + Jaccard-verify path and
    // still collapse the near-dup cluster to its lowest id
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val nd = Seq(
      (1L, base + " alpha"), (2L, base + " bravo"), (3L, base + " charlie")
    ).toDF("doc_id", "text")
    val (_, counts2) = Curate.run(nd, Curate.Config(autoRouteNearDup = true))
    val c2 = counts2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2("route:d2b_lsh_verify") == 1L)
    assert(!c2.contains("route:d2_exhaustive"))
    assert(c2("signal:candidate_pairs") > c2("signal:pair_budget"))
    assert(c2("1_exact_dedup") == 3L)
    assert(c2("2_near_dedup") == 1L)
  }

  test("opt-in line stages: boilerplate stripped before dedup, empty docs drop") {
    val s = spark; import s.implicits._
    val good = "the quick brown fox and the lazy dog of a house with many different words inside"
    val other = "the cat and the dog of a house walked to a park and found many things there"
    val footer = "all rights reserved by this site"
    val docs = Seq(
      (1L, s"$good\n$footer"),
      (2L, s"$good\n$footer"),        // exact dup of 1 AFTER stripping
      (3L, s"$other\n$footer"),
      (4L, footer),                   // all-boilerplate -> drops at stage 0b
      (5L, s"$other\n$other\n$footer") // within-doc repeat collapses first
    ).toDF("doc_id", "text")
    val cfg = Curate.Config(dedupLinesWithinDoc = true,
      boilerplateMinDocFreq = Some(3L))
    val (curated, counts) = Curate.run(docs, cfg)
    val c = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c("0_input") == 5L)
    assert(c("0b_boilerplate") == 4L) // doc 4 reduced to nothing
    // docs 2 (exact dup of 1) and 5 (== 3 after line dedup + strip) drop
    assert(c("1_exact_dedup") == 2L)
    val kept = curated.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(kept.keySet == Set(1L, 3L))
    assert(!kept.values.exists(_.contains(footer)), "footer must be stripped")
  }

  test("opt-in LM floor: self-trained bigram model drops the OOV outlier") {
    val s = spark; import s.implicits._
    // prose docs share vocabulary; the outlier passes every heuristic but
    // its bigrams are one-off under the survivors' own LM
    val base = "the cat and the dog walked to the park and back home of a sunny day " +
      "with the wind of autumn to keep them company and all was well"
    val docs = ((1 to 8).map(i => (i.toLong, base)) :+
      (9L, "a zebra quantum flux jumped over twelve purple xylophones near " +
        "the ancient obsidian monolith while seven crimson dolphins watched quietly"))
      .toDF("doc_id", "text")
    // dedup off-path: make each doc unique by appending its id token
    val uniq = docs.select(col("doc_id"),
      concat(col("text"), lit(" number"), col("doc_id")).as("text"))
    val floorCfg = Curate.Config(jaccardThreshold = 1.1, // keep all near-dups
      lmScoreFloorMicro = Some(-3100000L))
    val (curated, counts) = Curate.run(uniq, floorCfg)
    val c = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c.contains("6_lm_floor"))
    val kept = curated.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!kept.contains(9L), s"OOV outlier must fall below the LM floor: $kept")
    assert(kept.nonEmpty)
  }

  test("multilingual ruleset: widened allowedLangs widens the stopword rule") {
    val s = spark; import s.implicits._
    val en = "the quick brown fox jumps over a lazy dog and runs " +
      "of to the big field where many other animals play games all day long"
    val de = "der hund und die katze gehen nicht in das haus weil der garten " +
      "und die sonne so warm sind und alle sich dort gerne lange treffen"
    val docs = Seq((1L, en), (2L, de)).toDF("doc_id", "text")
    val cfg = Curate.Config(allowedLangs = Seq("en", "de"),
      qualityRuleset = Some(QualityRules.Config()))
    val (curated, _) = Curate.run(docs, cfg)
    // the German doc passes the lang filter AND the (auto-widened)
    // stopword rule — with the English-only default list it would fail
    // low_stopword_ratio and silently vanish
    assert(curated.collect().map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L))
    // an explicit custom stopword list is respected, not overridden
    val strict = Curate.Config(allowedLangs = Seq("en", "de"),
      qualityRuleset = Some(QualityRules.Config(stopwords = Seq("zzz"))))
    assert(Curate.run(docs, strict)._1.count() == 0L)
  }

  test("scoped run releases every frontier at close; results identical") {
    val s = spark; import s.implicits._
    val good = "the quick brown fox and the lazy dog of a house with many different words inside"
    val docs = Seq(
      (1L, good + " one"), (2L, good + " one"), (3L, good + " two"),
      (4L, "the cat and the dog of a house walked to a park and found many things there")
    ).toDF("doc_id", "text")
    // include the opt-in stages so every frontier path in run() is exercised
    val cfg = Curate.Config(dedupLinesWithinDoc = true,
      boilerplateMinDocFreq = Some(100L), lmScoreFloorMicro = Some(Long.MinValue))
    // id-set based, not count based: the async ContextCleaner may reap
    // earlier suites' GC'd blocks concurrently in the shared session
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val kept = graft.core.Materialize.withFrontiers { scope =>
      val (curated, counts) = Curate.run(docs, cfg, scope = Some(scope))
      counts.collect() // consume both returned frames inside the scope
      curated.collect().map(_.getAs[Long]("doc_id")).toSet
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty,
      s"scoped Curate.run must free all its frontiers at close, leaked: $leaked")
    // identical result via the unscoped (GC-managed) path
    val unscoped = Curate.run(docs, cfg)._1
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == unscoped)
  }
}
