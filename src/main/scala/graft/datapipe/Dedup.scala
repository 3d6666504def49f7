package graft.datapipe

import graft.core.{Materialize, Parallelism}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine near-dup.
  *
  * Scale design: every variant is keyed so the expensive comparison only
  * happens within small candidate buckets — exact dedup shuffles on a
  * 64/128-bit hash (not the text), Jaccard/MinHash shuffle on shingle or
  * band keys, never all-pairs. At 100 TB the all-pairs O(n²) path simply
  * does not exist here.
  */
object Dedup {

  /** Sequence for unique CollectMetrics names on the bucket-split
    * signal (same-named observe nodes in one plan fail analysis).
    */
  private[datapipe] val splitObsSeq =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Sequence for unique CollectMetrics names on the n-gram pair-budget
    * signal (same rationale as [[splitObsSeq]]).
    */
  private[datapipe] val pairBudgetObsSeq =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Exact dedup by normalized-content hash: one group per distinct
    * content, canonical = min(id). Shuffles hashes + ids only (columns
    * pruned before the exchange).
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    Parallelism.widenForCpu(docs)
      .select(TextAnalysis.fingerprintMd5(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Rows to keep after exact dedup (keep lowest id per content). */
  def exactKeep(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("content_hash").orderBy(col(idCol))
    Parallelism.widenForCpu(docs)
      .withColumn("content_hash", TextAnalysis.fingerprintMd5(col(textCol)))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "content_hash")
  }

  /** Duplication-aware sampling weights — the soft alternative to hard
    * exact dedup from data-constrained scaling (Muennighoff et al. 2023:
    * repeated epochs of the same data have geometrically decaying value).
    * One canonical doc per content group, weighted by the decayed worth
    * of its m copies: weight(m) = sum_{j<m} decay^j = (1 − decay^m)/(1 − decay),
    * quantized to integer micro-units so any engine reproduces it (the
    * default decay 0.5 makes every intermediate a dyadic rational — exact
    * in doubles at any multiplicity).
    *
    * Same scale shape as [[exact]]: one (content_hash) shuffle of hashes
    * and ids, the weight formula a map over the group table.
    */
  def dupWeights(docs: DataFrame, decay: Double = 0.5,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(decay > 0.0 && decay < 1.0, "decay must be in (0,1)")
    exact(docs, textCol, idCol)
      .withColumn("weight_micro",
        floor((lit(1.0) - pow(lit(decay), col("n_copies").cast("double"))) /
          lit(1.0 - decay) * lit(1e6) + lit(0.5)).cast("long"))
  }

  /** Incremental exact dedup: the production shape for a growing corpus —
    * new batches dedup against a persisted FINGERPRINT table (content_hash
    * per already-accepted doc), never against the full corpus text.
    *
    * Returns the accepted rows of `incoming`: in-batch exact dedup
    * (lowest id wins) followed by a left-anti join against the seen-hash
    * set. Cost is one shuffle of (hash, id) within the batch plus one
    * hash-keyed anti-join — the 100 TB corpus contributes only its 16-byte
    * hashes, not its text. Callers append `fingerprints(accepted)` to the
    * store afterwards to advance the frontier.
    */
  def incrementalExactKeep(
      incoming: DataFrame, seenHashes: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    exactKeep(incoming, textCol, idCol)
      .withColumn("content_hash", TextAnalysis.fingerprintMd5(col(textCol)))
      .join(seenHashes.select("content_hash"), Seq("content_hash"), "left_anti")
      .drop("content_hash")

  /** The fingerprint rows for a batch of accepted docs — what gets
    * appended to the seen-hash store after [[incrementalExactKeep]].
    */
  def fingerprints(docs: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    Parallelism.widenForCpu(docs).select(
      TextAnalysis.fingerprintMd5(col(textCol)).as("content_hash"),
      col(idCol).as("canonical_id"))

  /** Bloom-prefiltered incremental exact dedup — same result set as
    * [[incrementalExactKeep]], cheaper at scale: a Bloom sketch of the
    * seen-hash store screens the batch map-side, so only rows the sketch
    * flags as *maybe seen* (true hits + the fpp sliver of false
    * positives) enter the hash-keyed anti-join; definitely-new rows
    * never shuffle against the store at all. With a mature corpus most
    * of each new crawl batch is new content — the anti-join shrinks from
    * |batch| to roughly |dupes| + fpp·|batch|.
    *
    * Exactness: Bloom filters have NO false negatives, so every truly-seen row
    * reaches the anti-join and the output is bit-identical to the
    * unfiltered path (the oracle row proves it on the d7 fixture).
    *
    * Mechanics: the sketch is built DISTRIBUTED by Spark's own
    * `BloomFilterAggregate` (partial per-partition sketches OR-merged in
    * one exchange — the engine's runtime-join-filter machinery, exposed
    * via [[graft.functions.GraftFunctions]]); only the serialized sketch
    * (numBits/8 bytes, metadata-scale — never the hashes) returns to the
    * driver, then rides to executors as a broadcast literal probed by the
    * codegen'd `BloomFilterMightContain`. Size `numBits` ≈ 10–15 bits per
    * expected store entry for ~1% fpp; a 1e9-hash store at 12 bits/item
    * is a 1.5 GB sketch — at that scale raise fpp or shard the store by
    * hash prefix and run one sketch per shard.
    *
    * Sizing: pass `expectedItems`/`numBits` when the caller knows the
    * store size (the production path — a store's own metadata tracks its
    * count). With the -1 defaults the sketch is sized from a
    * `seenHashes.count()` at 12 bits/item (~1% fpp) — and because the
    * store may be a COMPUTED projection (not a bare parquet scan whose
    * count is footer metadata), the auto-sizing path first materializes
    * `seenHashes` so its lineage is evaluated once, not three times
    * (count, bloom aggregate, anti-join). A 300-row fixture must not pay
    * for a 2^26-bit sketch (round-7 lesson: the constant default made
    * d19 the slowest row of the whole sweep).
    */
  def incrementalExactKeepBloom(
      incoming: DataFrame, seenHashes: DataFrame,
      expectedItems: Long = -1L, numBits: Long = -1L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import graft.functions.GraftFunctions
    GraftFunctions.register(incoming.sparkSession)
    val (seen, items) =
      if (expectedItems > 0L) (seenHashes, expectedItems)
      else {
        val m = Materialize.frontier(seenHashes)
        (m, math.max(m.count(), 1L))
      }
    val bits =
      if (numBits > 0L) numBits else math.max(items * 12L, 256L)
    val bloomRow = seen
      .agg(call_function(GraftFunctions.bloomAggName, col("content_hash"),
        lit(items), lit(bits)).as("__bf"))
      .head()
    val inBatch = exactKeep(incoming, textCol, idCol)
      .withColumn("content_hash", TextAnalysis.fingerprintMd5(col(textCol)))
    val accepted =
      if (bloomRow.isNullAt(0)) inBatch // empty store: everything is new
      else {
        val might = call_function(GraftFunctions.bloomMightName,
          lit(bloomRow.getAs[Array[Byte]](0)), col("content_hash"))
        inBatch.where(!might).unionByName(
          inBatch.where(might)
            .join(seen.select("content_hash"), Seq("content_hash"), "left_anti"))
      }
    accepted.drop("content_hash")
  }

  /** Distinct word n-gram shingle *array* per document (one row per doc):
    * dedup happens inside the row via array_distinct — no shuffle.
    *
    * The shingle expression is TOTAL (the `when` guard): although the
    * `where` drops sub-n-token docs, Catalyst may evaluate the
    * expression on unfiltered rows anyway — `InferFiltersFromGenerate`
    * infers a filter containing the whole generator expression when a
    * caller explodes `shingles`, and `ConvertToLocalRelation` evaluates
    * such filters on every row of a local fixture at OPTIMIZATION time.
    * Unguarded, a 1-token doc feeds `sequence(0, -2)` (which descends)
    * into out-of-bounds `element_at` and ANSI mode throws — found by
    * MinhashMd5PropertySpec, reachable by any user exploding this
    * API's output directly.
    */
  def shingleArrays(docs: DataFrame, n: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = TextAnalysis.tokens(col(textCol))
    // shingling is a compute expander: bytes in ≠ work out (see Parallelism)
    Parallelism.widenForCpu(docs)
      .select(col(idCol), t.as("toks"))
      .where(size(col("toks")) >= n)
      .select(col(idCol), array_distinct(
        when(size(col("toks")) >= n,
          transform(sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ", (0 until n).map(k => element_at(col("toks"), i + k + 1)): _*)))
          .otherwise(lit(Array.empty[String]))
      ).as("shingles"))
  }

  /** Word n-gram shingles, distinct per document: (id, shingle).
    *
    * The shingle arrays are materialized (Materialize.frontier) before the
    * explode: Spark's Generate re-evaluates its generator expression per
    * OUTPUT row, so exploding an unmaterialized O(tokens)-cost array turns
    * O(docs·tokens) work into O(docs·tokens²) — measured 13s vs 1.2s on
    * 5k docs. Checkpoint size is the shingle set itself (shuffle-scale,
    * not a blowup).
    */
  def shingles(docs: DataFrame, n: Int = 3,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    Materialize.frontier(shingleArrays(docs, n, textCol, idCol))
      .select(col(idCol), explode(col("shingles")).as("shingle"))

  /** N-gram Jaccard near-duplicate pairs with similarity >= `threshold`.
    *
    * Inverted-index join: (id, shingle) self-joined on shingle — the
    * shuffle key is the shingle, so cost is sum over shingles of
    * (docs-per-shingle)², not |docs|². Rare shingles dominate; a stopword
    * cap (drop shingles shared by > maxDocsPerShingle docs) bounds skew.
    */
  def ngramJaccardPairs(
      docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      maxDocsPerShingle: Int = 1000,
      textCol: String = "text", idCol: String = "doc_id",
      scope: Option[graft.core.FrontierScope] = None): DataFrame =
    ngramJaccardPairsWithSignal(docs, n, threshold, maxDocsPerShingle,
      textCol, idCol, scope)._1

  /** [[ngramJaccardPairs]] plus the NAME of its pair-budget observe, so
    * a caller can read the signal without prefix-scanning metric names
    * (ADVICE r13 on the cosine split signal — names are per-call unique
    * because same-named CollectMetrics in one plan fail analysis).
    *
    * Routing signal (VERDICT r13 item 4): the exhaustive operator's
    * intrinsic cost is Σ df·(df−1)/2 over posting lists — superlinear in
    * duplicate DENSITY, not just corpus size (measured ×15.7 for 10×
    * rows at sf10, SCALE.md). Nothing in the plan tells a caller when
    * that envelope is left, so the postings stage carries a named
    * observe with {candidate_pairs, capped_shingles, n_postings}
    * readable via `Observation`/QueryExecutionListener after any action:
    *  - candidate_pairs is the exact pair-scoring work this run did.
    *    Threshold guidance: at candidate_pairs ≳ 50·|docs| the two-stage
    *    route — [[minhashLshCandidates]] → [[jaccardVerifyCandidates]]
    *    (d2b, Lee et al. 2022) — is strictly cheaper and was measured
    *    ×7.4 vs this operator's ×15.7 at sf10; treat this operator as
    *    the recall oracle, not the production path, past that line.
    *  - capped_shingles > 0 means the df > maxDocsPerShingle stopword
    *    cap dropped shingles, i.e. the result is the documented
    *    cap-approximate variant, not the exhaustive one.
    */
  def ngramJaccardPairsWithSignal(
      docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      maxDocsPerShingle: Int = 1000,
      textCol: String = "text", idCol: String = "doc_id",
      scope: Option[graft.core.FrontierScope] = None,
      observation: Option[org.apache.spark.sql.Observation] = None): (DataFrame, String) = {
    // inverted-index WITHOUT a self-join: group postings per shingle and
    // emit ordered candidate pairs in-row. One evaluation of the shingle
    // expansion, two shuffles total (by shingle, then by pair); the
    // stopword cap is simply the posting-list length. A self-join here
    // would recompute the expansion per side and lose exchange reuse.
    def mat(df: DataFrame): DataFrame = scope match {
      case Some(sc) => sc.frontier(df)
      case None => Materialize.frontier(df)
    }
    val obsName = observation.map(_.name).getOrElse(
      s"graft.ngram_pair_budget.${pairBudgetObsSeq.incrementAndGet()}")
    val df = size(col("docs"))
    // df(df−1) is even, so >>1 is the exact integer df-choose-2
    // (Column./ is double division and would widen the sum). Both
    // sums coalesce to 0: on an empty/all-short-doc corpus a bare
    // sum yields NULL and a caller reading the routing signal would
    // get null-valued metrics instead of zeros (the same coalesce
    // discipline as VerifyScale.sig).
    val sigMetrics = Seq(
      coalesce(sum(when(df.between(2, maxDocsPerShingle),
        shiftright(df.cast("long") * (df.cast("long") - 1L), 1)).otherwise(0L)),
        lit(0L)).as("candidate_pairs"),
      coalesce(sum(when(df > maxDocsPerShingle, 1L).otherwise(0L)), lit(0L))
        .as("capped_shingles"),
      count(lit(1)).as("n_postings"))
    val grouped = mat(shingleArrays(docs, n, textCol, idCol))
      // see shingles(): explode re-evaluates its input per output row
      .withColumn("set_size", size(col("shingles")))
      .select(col(idCol), col("set_size"), explode(col("shingles")).as("shingle"))
      .groupBy("shingle")
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("set_size")))).as("docs"))
    // the observe sits BETWEEN the aggregate and the cap filter so the
    // metrics see every posting, including the ones the cap drops
    // (DedupSpec pins that the filter does not push below it). When the
    // caller supplies an Observation, bind it (readable via .get after
    // any action fires the plan — what Curate's stage report uses);
    // otherwise keep the bare named observe readable from
    // queryExecution.observedMetrics.
    val postings = (observation match {
      case Some(obs) => grouped.observe(obs, sigMetrics.head, sigMetrics.tail: _*)
      case None => grouped.observe(obsName, sigMetrics.head, sigMetrics.tail: _*)
    }).where(size(col("docs")).between(2, maxDocsPerShingle))
    val pairArrays = postings.select(flatten(
      transform(col("docs"), (x, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))),
          y => struct(
            x.getField("id").as("id_a"), y.getField("id").as("id_b"),
            x.getField("set_size").as("size_a"), y.getField("set_size").as("size_b")))))
      .as("pairs"))
    // The pair arrays explode LAZILY — no frontier. The generator input
    // is a projection over the aggregated `docs` attribute, evaluated
    // once per POSTING row (O(df²) per posting, O(Σdf²) total — the
    // operator's intrinsic cost); materializing it first was pure
    // overhead, and the dominant memory term: at sf10 the checkpoint
    // held ~7 GB of pair structs in executor storage (423 s of task
    // time to write, 21 GB of downstream spill competing with the
    // pinned blocks), which is why the row OOM'd below a 48 g driver
    // (SCALE.md r7). Without it the identical result (count+hash-
    // verified at sf1 and sf10, tools/ProfD2Alt) runs on the DEFAULT
    // 8 GiB heap at sf10 — the shingle-array frontier above stays, it
    // feeds two consumers (set_size + explode).
    val pairs = pairArrays
      .select(explode(col("pairs")).as("p")).select("p.*")
    val out = pairs
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_common"),
        first(col("size_a")).as("size_a"), first(col("size_b")).as("size_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"),
        col("size_a").cast("long").as("size_a"),
        col("size_b").cast("long").as("size_b"), col("jaccard"))
    (out, obsName)
  }

  /** Direct (one extra job) computation of the pair-budget signal:
    * (candidate_pairs, capped_shingles) over the same distinct-shingle
    * postings [[ngramJaccardPairsWithSignal]]'s observe measures.
    *
    * Exists for the observe's one blind spot: when the pair pipeline's
    * RESULT is empty (no shingle-sharing pair at all, or none surviving
    * downstream joins), AQE's empty-relation propagation replaces the
    * joined branch — including the CollectMetricsExec — mid-execution,
    * the metrics never reach the listener, and the Observation completes
    * with an EMPTY row (measured in CurateSpec: every zero-pair fixture).
    * Callers fall back to this direct aggregate exactly then, i.e. only
    * when the postings stage was degenerate-cheap anyway.
    */
  def pairBudgetSignal(docs: DataFrame, n: Int = 3,
                       maxDocsPerShingle: Int = 1000,
                       textCol: String = "text", idCol: String = "doc_id"): (Long, Long) = {
    val sc = new graft.core.FrontierScope
    try {
      val df = col("df")
      val r = sc.frontier(shingleArrays(docs, n, textCol, idCol))
        .select(explode(col("shingles")).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("df"))
        .agg(
          coalesce(sum(when(df.between(2, maxDocsPerShingle),
            shiftright(df * (df - 1L), 1)).otherwise(0L)), lit(0L)),
          coalesce(sum(when(df > maxDocsPerShingle, 1L).otherwise(0L)), lit(0L)))
        .first()
      (r.getLong(0), r.getLong(1))
    } finally sc.close()
  }

  /** Exact Jaccard VERIFICATION of a candidate pair set — the second
    * half of the published two-stage near-dup pipeline (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better":
    * MinHash-LSH proposes, exact similarity disposes). Where
    * [[ngramJaccardPairs]] scores every shingle-sharing pair (Σ df²
    * posting work — the right tool when no index exists), this scores
    * ONLY the pairs in `candidates`: per-doc shingle sets are built once
    * for the docs that appear in some candidate pair (semi-join prune —
    * candidate ids are two longs per pair, orders of magnitude lighter
    * than the corpus text, and when the candidate set comes from a
    * parquet artifact its file stats let Spark pick a broadcast
    * semi-join on its own; no forced hint, so a billion-pair candidate
    * set still degrades to a shuffle instead of an OOM), then each
    * pair's intersection
    * is computed in-row with `array_intersect` — no posting explosion,
    * no pair-array materialization, work linear in |candidates|. At
    * 100 TB the LSH index bounds |candidates| to near-duplicates only,
    * so this is the scale path for thresholds the bands are tuned for
    * (>= ~0.5 at 16/4); the exhaustive operator remains the recall
    * oracle. Output schema matches [[ngramJaccardPairs]] exactly.
    */
  def jaccardVerifyCandidates(
      docs: DataFrame, candidates: DataFrame,
      n: Int = 3, threshold: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val candIds = candidates.select(col("id_a").as(idCol))
      .union(candidates.select(col("id_b").as(idCol))).distinct()
    // semi-join the RAW docs, then shingle: non-candidate docs are never
    // tokenized (Catalyst's PushDownLeftSemiAntiJoin would usually get
    // there too, but stating the order keeps the prune independent of
    // optimizer coverage). Arrays materialized once — both join legs
    // below read it (see shingles() re-evaluation note).
    val arrays = Materialize.frontier(
      shingleArrays(docs.join(candIds, Seq(idCol), "left_semi"),
        n, textCol, idCol))
    val a = arrays.select(col(idCol).as("id_a"), col("shingles").as("__sa"))
    val b = arrays.select(col(idCol).as("id_b"), col("shingles").as("__sb"))
    candidates.select("id_a", "id_b")
      .join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("n_common", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("size_a", size(col("__sa")).cast("long"))
      .withColumn("size_b", size(col("__sb")).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "size_a", "size_b", "jaccard")
  }

  /** MinHash signature (in-Spark variant): modular double hashing off
    * TWO xxhash64 evaluations per shingle — h1/h2 = low 48 bits of
    * xxhash64(shingle, seed 0/1), lane i = min((h1 + i*h2) mod 2^40).
    * Same Kirsch–Mitzenhauer family as the portable md5 twin (see
    * [[graft.functions.MinhashMd5]] for why the modular reduction is
    * what decorrelates lanes), 2 hashes instead of k per shingle; all
    * intermediates < 2^53, so ANSI arithmetic never overflows. One
    * groupBy(id) pass — signatures are k longs, not the shingle sets.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 16, n: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val mask48 = lit((1L << 48) - 1L)
    val mask40 = lit(graft.functions.MinhashMd5.LaneMod - 1L)
    // h1/h2 bound as attributes so the hash runs once per shingle row,
    // not once per lane expression
    val sh = shingles(docs, n, textCol, idCol).select(col(idCol),
      xxhash64(col("shingle"), lit(0)).bitwiseAND(mask48).as("__h1"),
      xxhash64(col("shingle"), lit(1)).bitwiseAND(mask48).as("__h2"))
    val mins = (0 until k).map(i =>
      min((col("__h1") + lit(i.toLong) * col("__h2")).bitwiseAND(mask40)).as(s"h$i"))
    sh.groupBy(idCol).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** MinHash+LSH candidate pairs: signature split into `bands` bands of
    * k/bands rows; docs sharing any band bucket are candidates. Shuffle
    * key = (band index, band hash) — tiny rows, massive fan-in reduction.
    */
  def minhashLshCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4,
                           n: Int = 3,
                           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val banded = minhashBands(docs, k, bands, n, textCol, idCol)
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** The LSH band INDEX for a corpus: (id, band, bucket) rows. Persist
    * this (partitioned/bucketed by (band, bucket)) and incremental dedup
    * of a new batch never touches the old corpus text or signatures —
    * only this index ([[incrementalLshCandidates]]).
    */
  def minhashBands(docs: DataFrame, k: Int = 16, bands: Int = 4,
                   n: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    minhashSignatures(docs, k, n, textCol, idCol).select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("signature"), b * rows + 1, lit(rows))
          .cast("array<string>").cast("string"), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** Incremental LSH near-dup candidates: a new batch's band rows joined
    * against the persisted corpus band index — shuffle key (band, bucket),
    * corpus contributes index rows only. Output one (stored_id,
    * incoming_id) per candidate pair.
    */
  def incrementalLshCandidates(incomingBands: DataFrame, storedBands: DataFrame,
                               idCol: String = "doc_id"): DataFrame =
    storedBands.select(col(idCol).as("stored_id"), col("band"), col("bucket"))
      .join(incomingBands.select(col(idCol).as("incoming_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select("stored_id", "incoming_id").distinct()

  /** Portable MinHash signature: ONE md5 per shingle + k affine lane
    * combinations — lane i's value is min over shingles of
    * `h1 + i*h2`, h1/h2 = the first/second 48 bits of md5(shingle)
    * (hex chars 1-12 / 13-24 as unsigned ints). Double hashing
    * (Kirsch–Mitzenhauer) makes this ONE digest per shingle instead of
    * the k-digests-per-shingle naive form, and every lane value is
    * < 2^53 — exact BIGINT arithmetic any SQL engine reproduces
    * bit-for-bit (cross-engine verification twin of
    * [[minhashSignatures]]; the xxhash64 variant stays the in-Spark
    * production alternative).
    */
  def minhashSignaturesPortable(docs: DataFrame, k: Int = 16, n: Int = 3,
                                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // native per-doc signature (functions.MinhashMd5): the whole k-lane
    // minimum computed map-side straight from the TOKEN array — no
    // shingle strings, no array_distinct (min over a multiset == min
    // over its set), no explode, no per-shingle aggregation. Values are
    // spec-pinned bit-identical to the declarative explode+groupBy
    // formulation over shingleArrays (and to the DuckDB oracles, which
    // state the declarative form). The final lane-wise min aggregate
    // carries ONE k-long row per doc (vs one row per shingle before)
    // and exists to keep the old GROUP BY doc_id semantics when ids
    // collide across rows: min over a shingle union == lane-wise min of
    // per-row signatures (min is distributive), which the sf10
    // fixture's id-space collisions exercise for real.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val t = TextAnalysis.tokens(col(textCol))
    val perRow = Parallelism.widenForCpu(docs)
      .select(col(idCol), t.as("toks"))
      .where(size(col("toks")) >= n)
      .select(col(idCol),
        call_function(graft.functions.GraftFunctions.minhashName,
          col("toks"), lit(n), lit(k)).as("__sig"))
    val laneMins = (0 until k).map(i =>
      min(element_at(col("__sig"), i + 1)).as(s"h$i"))
    perRow.groupBy(idCol).agg(laneMins.head, laneMins.tail: _*)
      .select(col(idCol),
        array((0 until k).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** Portable LSH banding over [[minhashSignaturesPortable]]: band bucket =
    * md5 of the comma-joined (decimal-formatted) band slice. Same
    * (band, bucket) shuffle shape as [[minhashLshCandidates]],
    * engine-independent values (long→string decimal formatting is
    * engine-exact; DuckDB's `array_to_string` produces the same join).
    */
  def minhashLshCandidatesPortable(docs: DataFrame, k: Int = 16, bands: Int = 4,
                                   n: Int = 3,
                                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val banded = minhashBandsPortable(docs, k, bands, n, textCol, idCol)
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Portable twin of [[minhashBands]] (md5-string buckets). */
  def minhashBandsPortable(docs: DataFrame, k: Int = 16, bands: Int = 4,
                           n: Int = 3,
                           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    minhashSignaturesPortable(docs, k, n, textCol, idCol).select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws(",",
          slice(col("signature"), b * rows + 1, lit(rows)).cast("array<string>"))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** SimHash (64-bit): per token bit-vote on xxhash64(token); weightless
    * variant. Near-dups = signatures within `maxHammingDistance`.
    */
  def simhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tok = Parallelism.widenForCpu(docs).select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val bitVotes: Seq[org.apache.spark.sql.Column] = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"b$b")
    }
    val votes = tok.groupBy(idCol).agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    votes.select(col(idCol), sig.as("simhash"))
  }

  /** Portable SimHash (32-bit): token hash bits come from the md5 hex
    * digits (digit d = hex char d+1; bit b of the token = bit (b%4) of
    * digit b/4), so the identical signature is computable in plain SQL on
    * any engine. Production path stays [[simhash]] (64-bit xxhash64 —
    * one hash call vs md5 + 8 digit extractions per token).
    */
  def simhashPortable(docs: DataFrame, bits: Int = 32,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(bits % 4 == 0 && bits <= 62, "bits must be a multiple of 4, <= 62")
    val tok = Parallelism.widenForCpu(docs).select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .withColumn("h", md5(col("token")))
    // hex digits projected once per token (not once per bit)
    val digits = (0 until bits / 4).map(d =>
      conv(substring(col("h"), d + 1, 1), 16, 10).cast("int").as(s"d$d"))
    val withDigits = tok.select((col(idCol) +: digits): _*)
    val bitVotes: Seq[org.apache.spark.sql.Column] = (0 until bits).map { b =>
      sum(when(shiftright(col(s"d${b / 4}"), b % 4).bitwiseAND(lit(1)) === 1, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val votes = withDigits.groupBy(idCol).agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until bits).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    votes.select(col(idCol), sig.as("simhash"))
  }

  /** Apply a near-dup pair set: keep every document not named as the
    * higher id of any pair. This collapses a cluster to its minimum iff
    * every non-minimal member pairs with SOME smaller member — true when
    * candidate generation emits cliques (each LSH bucket does), but an
    * edge set like {(B,C), (A,C)} keeps B alongside A even though
    * A~C~B transitively. For the transitive rule — one survivor per
    * CONNECTED COMPONENT, the published grouping (Lee et al. 2022 use
    * union-find over match pairs) — use [[componentKeep]].
    */
  def nearDupKeep(docs: DataFrame, pairs: DataFrame,
                  idCol: String = "doc_id"): DataFrame =
    docs.join(
      pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Connected components over a near-dup pair set: every id appearing in
    * `pairs` labeled with its component's minimum id — the transitive
    * closure grouping published dedup pipelines apply to MinHash match
    * pairs before keeping one document per duplicate cluster (Lee et al.
    * 2022; RefinedWeb). Output: (doc_id, cluster_id); singletons (docs in
    * no pair) are absent — they are their own cluster by definition.
    *
    * Algorithm: alternating large-star / small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the round bound is O(log² n) in the component size,
    * NOT the component diameter that one-hop min-label propagation pays
    * (a chain of 1000 duplicates closes in ~10 rounds instead of ~999).
    *   - large-star, per node u: connect every strictly-larger neighbor
    *     to m(u) = min(N(u) ∪ {u});
    *   - small-star, edges oriented src>dst, per node u: connect u and
    *     its (all smaller) neighbors to their minimum.
    * Per round: two (node)-keyed min-aggregates + two edge-side joins,
    * all shuffles of id-pair longs; text never enters. Both passes
    * preserve connectivity and only ever re-point edges at smaller ids,
    * so the fixpoint is one star per component rooted at its minimum id.
    * Near-dup graphs are already star-shaped (a cluster's members all
    * collide in some shared band bucket), so 1-3 rounds close real
    * corpora; the contraction bound is for adversarial chain topologies.
    * Each round's edge set passes through [[Materialize.frontier]] so
    * lineage stays flat (the [[graft.datapipe.Similarity.ivfTrain]]
    * pattern).
    *
    * Deterministic: the fixpoint (min id per component) does not depend
    * on iteration order. Throws if `maxIters` rounds don't converge
    * rather than returning a non-fixpoint labeling.
    */
  def duplicateComponents(pairs: DataFrame,
                          aCol: String = "id_a", bCol: String = "id_b",
                          maxIters: Int = 25,
                          idCol: String = "doc_id",
                          scope: Option[graft.core.FrontierScope] = None): DataFrame =
    duplicateComponentsRounds(pairs, aCol, bCol, maxIters, idCol, scope)._1

  /** [[duplicateComponents]] plus the number of contraction rounds it
    * took to converge — exposed so specs can pin the O(log n) bound.
    */
  def duplicateComponentsRounds(pairs: DataFrame,
                                aCol: String = "id_a", bCol: String = "id_b",
                                maxIters: Int = 25,
                                idCol: String = "doc_id",
                                scope: Option[graft.core.FrontierScope] = None)
      : (DataFrame, Int) = {
    require(maxIters >= 1, "star contraction needs at least one round")
    // materialize the (a, b) projection ONCE when `pairs` is an expensive
    // pipeline (an LSH candidate graph) that the node-set union and the
    // edge orientation would otherwise re-evaluate per leg — measured as
    // 2/3 of d12's post-fix wall time at sf0.1. When it is already a
    // stored table (the persisted pair-graph artifact), skip the
    // materialization job and let the legs re-scan it.
    val p0h = Materialize.frontierHandleIfExpensive(
      pairs.select(col(aCol), col(bCol)))
    val p0 = p0h.df
    // one-job set signature, observed ON the materializing action itself
    // (Materialize.frontierObserved): (count, XOR of two independent
    // 64-bit pair hashes). Equal signatures between rounds declare the
    // fixpoint outright — a false positive needs a different same-count
    // DISTINCT edge set colliding under BOTH xxhash64 streams at once
    // (~2^-128), below any operational concern, so the confirming
    // left-anti scan the previous scheme ran at the candidate fixpoint
    // is gone. XOR, not sum: order-independent AND cannot overflow under
    // ANSI arithmetic. Net per round: exactly ONE job (the round-9
    // scheme paid materialize + count + xor-agg + anti-join).
    val sigExprs = Seq(
      count(lit(1)).as("__n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("__x1"),
      coalesce(bit_xor(xxhash64(lit(0x9E3779B97F4A7C15L), col("src"),
        col("dst"))), lit(0L)).as("__x2"))
    def sigOf(m: Map[String, Any]): (Long, Long, Long) =
      (m("__n").asInstanceOf[Long], m("__x1").asInstanceOf[Long],
        m("__x2").asInstanceOf[Long])
    // every id that appears in a pair gets a label, including self-pairs.
    // Lazy: consumed exactly once, by the returned labels join — a
    // frontier here would be a whole job spent avoiding zero re-use.
    val nodes = p0.select(col(aCol).as("id"))
      .union(p0.select(col(bCol).as("id"))).distinct()
    // canonical orientation src > dst; both passes preserve it. Left
    // LAZY and NOT deduplicated: orientation is a pure map over the pair
    // source (no shuffle), so round 1 can reference it twice (symmetrize
    // + join-back) for two scans instead of two shuffles — ReuseExchange
    // does NOT fire across a self-union's legs, so a materialized-or-
    // distinct initial edge set here would either cost a whole extra job
    // or shuffle the pair set twice. Duplicate pairs (repeats, both
    // orientations) are absorbed by round 1 itself: min-aggregates are
    // duplicate-insensitive and both star outputs end in distinct(). The
    // sentinel signature below makes round 1's comparison a guaranteed
    // miss; an empty edge set is detected from round 1's observed count.
    val edges0 = p0
      .select(greatest(col(aCol), col(bCol)).as("src"),
        least(col(aCol), col(bCol)).as("dst"))
      .where(col("src") =!= col("dst"))
    // p0 backs the lazy node set in the returned labels — the caller's
    // scope owns its lifetime (no-op for the scan-shaped fast path)
    scope.foreach(_.track(p0h))
    var edgesH: Option[graft.core.Frontier] = None
    var edgeSig = (-1L, 0L, 0L) // sentinel: no real set has count -1
    var round = 0
    var converged = false
    while (!converged && round < maxIters) {
      val edges = edgesH.map(_.df).getOrElse(edges0)
      // large-star: symmetrize, m(u) = min(N(u) ∪ {u}); emit (v, m(u))
      // for neighbors v > u. Output keeps src > dst (v > u >= m).
      val und = edges.select("src", "dst")
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val mins = und.groupBy("src").agg(min(col("dst")).as("__mn"))
        .select(col("src").as("u"), least(col("__mn"), col("u")).as("m"))
      // the intermediate distinct stays (r12 audit): it collapses
      // clique-quadratic large-star output to linear BEFORE the two
      // small-star consumers, and its Exchange is the only shared root
      // that lets the plan evaluate `large` once — ReuseExchange cannot
      // be trusted across the union legs below (verified: it does not
      // fire across a self-union), so an un-shuffled `large` would
      // re-execute the whole und+mins+join subtree per consumer.
      val large = und.join(mins, und("src") === mins("u"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
      // small-star on src>dst edges: per u, m = min(N(u)); re-point u and
      // every neighbor at m. Output again keeps src > dst.
      val smins = large.groupBy("src").agg(min(col("dst")).as("m"))
      val small = large.join(smins.withColumnRenamed("src", "u"),
          large("src") === col("u"))
        .where(col("dst") =!= col("m"))
        .select(large("dst").as("src"), col("m").as("dst"))
        .union(smins.select(col("src"), col("m").as("dst")))
        .distinct()
      val (nextH, nm) = Materialize.frontierObserved(small, sigExprs: _*)
      val nextSig = sigOf(nm)
      // an empty edge set is a fixpoint of both star passes — converge
      // immediately rather than confirming with an identity round
      converged = nextSig == edgeSig || nextSig._1 == 0L
      // the previous round's frontier fed `small`, now materialized —
      // free it eagerly so peak storage is one round's edge set
      edgesH.foreach(_.release())
      edgesH = Some(nextH)
      edgeSig = nextSig
      round += 1
    }
    if (!converged) {
      edgesH.foreach(_.release()); p0h.release()
      throw new IllegalStateException(
        s"duplicateComponents did not converge in $maxIters rounds; " +
          "raise maxIters (star contraction needs O(log² n) rounds)")
    }
    // the fixpoint edges back the lazily-returned labels: register with
    // the caller's scope (GC-managed when none, the pre-scope behavior).
    // edgesH is always Some here: converged ⇒ at least one round ran.
    val finalH = edgesH.get
    scope.foreach(_.track(finalH))
    // at fixpoint edges are (member, root) stars; roots + self-paired
    // nodes label themselves
    val labels = nodes
      .join(finalH.df.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("dst"), col("id")).as("cluster_id"))
    (labels, round)
  }

  /** Transitive near-dup keep: one survivor (the minimum id) per
    * connected component of the pair graph — the [[duplicateComponents]]
    * labeling applied as a filter. Unlike [[nearDupKeep]] this is exact
    * for any edge set, not just per-bucket cliques.
    */
  def componentKeep(docs: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id", maxIters: Int = 25): DataFrame =
    docs.join(
      duplicateComponents(pairs, idCol = idCol, maxIters = maxIters)
        .where(col(idCol) =!= col("cluster_id"))
        .select(idCol),
      Seq(idCol), "left_anti")

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-duplicate pairs above `threshold`, restricted
    * to candidate buckets (caller-provided bucket column, e.g. an LSH
    * bucket or label) to avoid all-pairs.
    *
    * In-bucket work is quadratic in bucket size, and bucket sizes grow
    * with corpus density — at 100 TB a fixed label partitioning WILL
    * produce million-vector buckets. `maxBucketSize` is the
    * density-adaptive guard (the [[ngramJaccardPairs]]
    * `maxDocsPerShingle` analogue): buckets above the cap split into
    * 2^ceil(log2(size/cap)) signed-random-projection sub-buckets, masked
    * from one [[Vectors.lshSignaturePortable]] per vector (LCG ±1
    * hyperplanes — integer arithmetic any engine reproduces; the same
    * planes sim2's LSH buckets use), so expected sub-bucket size lands
    * at or below the cap and candidate work is bounded at ~cap·n/2 pairs
    * instead of Σ size². Splitting trades recall for boundedness the
    * standard LSH way (Charikar, STOC 2002): a pair at cosine c lands in
    * the same sub-bucket with probability ~(1 − arccos(c)/π)^bits — near
    * 1 for the near-duplicate range, a documented miss rate for
    * borderline pairs. Buckets at or under the cap are never split
    * (bits = 0, mask = 0): results there are exactly the uncapped
    * operator's.
    *
    * The cap DEFAULTS ON (1024) since round 12: the r11 sf10 sweep
    * measured the uncapped form at 62x cost for 10x rows (in-bucket
    * pairs grow with occupancy², and occupancy grows with corpus
    * density — at 20k vectors/bucket the default-path row took 132.7 s
    * vs 7.0 s capped). Because sub-1024 buckets never split, small-SF
    * results — including every oracle fixture — are bit-identical to
    * the uncapped operator; only the degenerate dense buckets that
    * would go quadratic get bounded. Pass `maxBucketSize =
    * Int.MaxValue` explicitly for the exhaustive form (recall oracles,
    * ground-truth builds).
    *
    * Lossy-mode signal: when the cap is finite the plan carries a named
    * observe ("graft.cosine_bucket_splits.N") with {split_buckets,
    * n_buckets} — a QueryExecutionListener reads it after any action on
    * the result, and split_buckets == 0 certifies the output equals the
    * uncapped operator's (pinned in DedupSpec). Use
    * [[embeddingCosinePairsWithSignal]] to get the generated name back
    * instead of prefix-matching.
    */
  def embeddingCosinePairs(
      vecs: DataFrame, bucketCol: String, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = 1024, srpPlanes: Int = 16): DataFrame =
    embeddingCosinePairsWithSignal(vecs, bucketCol, threshold, idCol,
      vecCol, maxBucketSize, srpPlanes)._1

  /** [[embeddingCosinePairs]] plus the NAME of its split-signal observe
    * (None when `maxBucketSize == Int.MaxValue` — the exhaustive form
    * carries no observe). Callers were previously left prefix-matching
    * "graft.cosine_bucket_splits." against metric names (ADVICE r13);
    * the per-call unique suffix itself stays, because two capped pair
    * scans in one plan with the same observe name fail analysis.
    */
  def embeddingCosinePairsWithSignal(
      vecs: DataFrame, bucketCol: String, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = 1024, srpPlanes: Int = 16): (DataFrame, Option[String]) = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    // norms computed once per vector (O(n)), not once per pair (O(n²))
    val base0 = Parallelism.widenForCpu(vecs).select(
      col(idCol), col(bucketCol).as("bucket"),
      Vectors.quantize(col(vecCol)).as("q"))
      .withColumn("nrm", sqrt(Vectors.dotQN(col("q"), col("q")).cast("double")))
    val obsName =
      if (maxBucketSize == Int.MaxValue) None
      else Some(s"graft.cosine_bucket_splits.${Dedup.splitObsSeq.incrementAndGet()}")
    val base =
      if (maxBucketSize == Int.MaxValue) base0.withColumn("sub", lit(0L))
      else {
        // integer-exact mask: since (cap·2^j < size) is monotone in j,
        // summing the satisfied powers gives 2^bits − 1 directly — no
        // floating log2 whose ulp could diverge across engines
        val mask = (0 until srpPlanes).map(j =>
          when(lit(maxBucketSize.toLong << j) < col("__cnt"), lit(1L << j))
            .otherwise(lit(0L))).reduce(_ + _)
        // runtime split signal: capping silently turns the operator
        // approximate on dense buckets (pairs spanning SRP sub-buckets
        // are dropped), so a caller must be able to tell exhaustive
        // results from capped ones WITHOUT reading the scaladoc. The
        // named CollectMetrics fires on whatever action executes the
        // returned plan; QueryExecutionListeners (and `Observation`-
        // style readers) see {split_buckets, n_buckets} under a
        // "graft.cosine_bucket_splits.*" name (unique per call — two
        // capped pair scans may share one plan). split_buckets == 0
        // certifies the result is bit-identical to the uncapped form.
        val sized = base0.groupBy("bucket")
          .agg(count(lit(1)).as("__cnt"))
          .select(col("bucket"), mask.as("__mask"))
          .observe(obsName.get,
            sum(when(col("__mask") > 0, 1L).otherwise(0L)).as("split_buckets"),
            count(lit(1)).as("n_buckets"))
        // bucket-count side is dimension-scale (one row per bucket): AQE
        // broadcast-joins it back, so the corpus never re-shuffles here
        base0.join(sized, Seq("bucket"))
          .withColumn("sub",
            Vectors.lshSignaturePortable(col("q"), srpPlanes)
              .bitwiseAND(col("__mask")))
          .drop("__mask")
      }
    val a = base.select(col(idCol).as("id_a"), col("bucket"), col("sub"),
      col("q").as("qa"), col("nrm").as("na"))
    val b = base.select(col(idCol).as("id_b"), col("bucket"), col("sub"),
      col("q").as("qb"), col("nrm").as("nb"))
    val out = a.join(b, Seq("bucket", "sub"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine",
        Vectors.dotQN(col("qa"), col("qb")).cast("double") / (col("na") * col("nb")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
    (out, obsName)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication over an embedding column with NO caller-provided
    * bucketing — the operator derives its own candidate buckets by
    * clustering the embeddings, then prunes within-cluster cosine
    * near-duplicates, keeping each duplicate group's lowest id (the
    * [[nearDupKeep]] convention: any vector appearing as a pair's id_b
    * drops). This is the missing piece between [[embeddingCosinePairs]]
    * (which needs a bucket column) and a raw corpus that has only
    * embeddings.
    *
    * Clustering: `iters` > 0 runs Lloyd refinement
    * ([[Similarity.ivfTrain]] — the production choice, tighter clusters
    * = better recall); `iters` = 0 uses the deterministic hashed-id
    * seeding directly ([[Similarity.ivfCentroids]]), which is fully
    * oracle-reproducible (`portable` = true swaps in the md5 twin).
    * `nlist` <= 0 auto-sizes to ceil(sqrt(n)).
    *
    * Scale shape (100 TB lens): assignment is one broadcast-centroids
    * map + an id-keyed partial agg carrying (id, centroid) pairs only —
    * never a shuffle of the vectors; the pair scan inherits
    * [[embeddingCosinePairs]]'s density-adaptive `maxBucketSize` guard,
    * so a degenerate mega-cluster (the k-means failure mode on skewed
    * corpora) splits into SRP sub-buckets instead of going quadratic.
    * With sqrt(n) clusters and balanced assignment, candidate work is
    * ~n*sqrt(n)/2 pairs — the same sublinear-per-row shape the trained
    * IVF rehearsal measured.
    *
    * Side effect: the (id, centroid) assignment is materialized EAGERLY
    * at call time (`Materialize.frontierHandle` runs Spark jobs and
    * persists blocks even if the returned DataFrame is never executed)
    * — this is not a fully lazy plan. Without a `scope` the blocks are
    * GC-managed, so repeated calls in a long-lived driver accumulate
    * dead blocks until the ContextCleaner collects them; pass a
    * [[graft.core.FrontierScope]] for deterministic release.
    */
  def semanticDedup(
      vecs: DataFrame, threshold: Double,
      nlist: Int = 0, iters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = 1024,
      portable: Boolean = false,
      scope: Option[graft.core.FrontierScope] = None): DataFrame = {
    val centroids =
      if (iters > 0) Similarity.ivfTrain(vecs, nlist, iters, idCol, vecCol)
      else Similarity.ivfCentroids(vecs, nlist, idCol, vecCol, portable = portable)
    // frontier the NARROW (id, centroid) assignment: downstream it feeds
    // the bucket-count leg (finite maxBucketSize), the pair scan, and
    // the final keep join — left lazy, each consumer re-runs the full
    // broadcast-centroids assignment (n·nlist·dim integer dots, the
    // dominant cost here; measured as the r12 sf10 d11 jump when the
    // default cap added the count leg). GC-managed without a scope (the
    // one-shot query shape); callers composing further should pass one.
    val assignedH = graft.core.Materialize.frontierHandle(
      Similarity.ivfAssignIds(vecs, centroids, idCol, vecCol))
    scope.foreach(_.track(assignedH))
    val assigned = assignedH.df
    val clustered = vecs.join(assigned, Seq(idCol))
    val pairs = embeddingCosinePairs(clustered, "centroid_id", threshold,
      idCol, vecCol, maxBucketSize)
    clustered
      .join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")
      .select(col(idCol), col("centroid_id"))
  }
}
