package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): hash every token k-gram, slide a window of `w` consecutive
  * gram hashes, select each window's RIGHTMOST minimum. The paper's two
  * guarantees hold by construction: any substring match of length
  * >= k + w - 1 tokens contributes at least one common selected
  * fingerprint (detection), and no match shorter than k tokens is ever
  * detected (noise floor); expected density is 2/(w+1).
  *
  * Scale shape: a pure map over documents — zero shuffles; the output
  * explodes to ~2·grams/(w+1) fingerprint rows per document, ready for a
  * (fingerprint)-keyed index join downstream (the same inverted-index
  * shape n-gram Jaccard uses, at a fraction of the posting volume).
  * The token and gram-hash arrays are bound as attributes before any
  * lambda references them (single-eval; the HOF re-eval trap), so the
  * window scan is O(grams·w) per document with w a small constant.
  */
object Winnowing {

  /** Per-position k-gram hashes, both families native and both as
    * array<long> (position = index; WinnowSelect takes the bare stream).
    * Production (portable=false) is [[graft.functions.GramHashes]] —
    * one xxhash64 per TOKEN plus a k-term polynomial combine per gram.
    * `portable` is [[graft.functions.Md5GramHashes]] — the md5
    * 24-bit-prefix VALUES the DuckDB oracle reproduces bit-for-bit,
    * computed by streaming token bytes into the digest instead of the
    * replaced transform/array_join/md5/conv string chain (within-document
    * 24-bit collisions are negligible at document gram counts; the
    * production path keeps the full 64 bits).
    */
  private def gramHashes(toks: Column, k: Int, portable: Boolean): Column =
    if (portable)
      call_function(graft.functions.GraftFunctions.md5GramHashesName,
        toks, lit(k))
    else
      call_function(graft.functions.GraftFunctions.gramHashesName,
        toks, lit(k), lit(0L))

  /** The replaced declarative portable gram hashing, kept as the spec's
    * value oracle for [[graft.functions.Md5GramHashes]].
    */
  private[graft] def gramHashesMd5Declarative(toks: Column, k: Int): Column =
    transform(sequence(lit(1), greatest(size(toks) - k + 1, lit(1))), i => {
      val gram = array_join(slice(toks, i, lit(k)), " ")
      conv(substring(md5(gram), 1, 6), 16, 10).cast("long")
    })

  /** Winnowed fingerprints: one output row per selected gram —
    * (idCol, pos, fp). Documents with fewer than `k` tokens produce no
    * rows; documents with fewer than `w` grams winnow their whole gram
    * array as a single window (the paper's boundary case).
    */
  def fingerprints(docs: DataFrame, k: Int = 4, w: Int = 4,
                   portable: Boolean = false,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = TextAnalysis.tokens(col(textCol))
    graft.core.Parallelism.widenForCpu(docs)
      .where(size(toks) >= k)
      .withColumn("__t", toks)
      .withColumn("__g", gramHashes(col("__t"), k, portable))
      // window selection + adjacent dedup in ONE native O(grams) pass
      // (graft.functions.WinnowSelect, monotonic deque): the previous
      // declarative form — per window slice+aggregate fold, then an
      // adjacent-inequality filter — was interpreted HOF evaluation with
      // a per-window allocation, measured ~300 s task-CPU per execution
      // at sf10 and executed twice under the deterministic ORDER BY
      // (range-sort sampling pass + output pass; SCALE.md r14).
      // WinnowingSpec pins native ≡ declarative selection on fixtures
      // and a randomized corpus.
      .withColumn("__sel", call_function(
        graft.functions.GraftFunctions.winnowSelectName, col("__g"), lit(w)))
      // explode_OUTER: a plain explode makes Catalyst infer a
      // `size(__sel) > 0` filter and push it below the projections,
      // INLINING the whole nested winnowing expression into an
      // interpreted per-row Filter — the gram array gets recomputed per
      // window and the token split per gram, turning the linear scan
      // quadratic (432 s -> ~3 s at sf0.1). The >= k token guard already
      // makes __sel non-empty, so outer semantics are identical here.
      .select(col(idCol), explode_outer(col("__sel")).as("__fp"))
      .select(col(idCol), col("__fp.pos").cast("long").as("pos"), col("__fp.h").as("fp"))
  }

  /** The replaced declarative selection, kept as the spec's parity
    * oracle for [[graft.functions.WinnowSelect]] (see fingerprints()):
    * per-window slice+fold rightmost-min, adjacent-inequality dedup.
    */
  private[datapipe] def fingerprintsDeclarative(
      docs: DataFrame, k: Int = 4, w: Int = 4,
      portable: Boolean = false,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = TextAnalysis.tokens(col(textCol))
    val zero = struct(lit(-1).cast("int").as("pos"),
      lit(null).cast("long").as("h"))
    // gram hashes arrive as array<long> in both families (see
    // gramHashes); the declarative fold below wants the (pos, h) struct
    // shape — wrap so the twin pins SELECTION parity on identical values
    def asStructs(g: Column): Column =
      transform(g, (h, i) => struct(i.cast("int").as("pos"), h.as("h")))
    graft.core.Parallelism.widenForCpu(docs)
      .where(size(toks) >= k)
      .withColumn("__t", toks)
      .withColumn("__g", asStructs(gramHashes(col("__t"), k, portable)))
      .withColumn("__w", transform(
        sequence(lit(1), greatest(size(col("__g")) - w + 1, lit(1))), s =>
          aggregate(slice(col("__g"), s, lit(w)), zero, (acc, g) =>
            when(acc.getField("pos") < 0 || g.getField("h") <= acc.getField("h"), g)
              .otherwise(acc))))
      .withColumn("__sel", filter(col("__w"), (x, i) =>
        i === 0 || !(x === element_at(col("__w"), i))))
      .select(col(idCol), explode_outer(col("__sel")).as("__fp"))
      .select(col(idCol), col("__fp.pos").cast("long").as("pos"), col("__fp.h").as("fp"))
  }

  /** Cross-document fingerprint matches — the plagiarism-candidate /
    * near-dup report winnowing exists for: join the fingerprint index
    * with itself on fp and count shared fingerprints per document pair.
    * Scale shape: one (fp)-keyed shuffle of (fp, id, pos) rows; the
    * per-fp posting pair expansion is the same inverted-index shape as
    * n-gram Jaccard with ~2/(w+1) of the postings, and `maxDocsPerFp`
    * drops degenerate boilerplate fingerprints (distribution head) the
    * same way `maxDocsPerShingle` does there.
    */
  def matches(docs: DataFrame, k: Int = 4, w: Int = 4, minShared: Int = 2,
              maxDocsPerFp: Int = 64, portable: Boolean = false,
              textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fps = fingerprints(docs, k, w, portable, textCol, idCol)
      .select(col(idCol).as("__id"), col("fp")).distinct()
    val postings = fps.groupBy("fp")
      .agg(collect_list(col("__id")).as("__ids"))
      .where(size(col("__ids")).between(2, maxDocsPerFp))
      .withColumn("__ids", array_sort(col("__ids")))
    postings
      .select(col("fp"), explode(transform(
        sequence(lit(1), size(col("__ids")) - 1), i =>
          struct(element_at(col("__ids"), i).as("id_a"),
            slice(col("__ids"), i + 1, size(col("__ids")) - i).as("rest"))))
        .as("__p"))
      .select(col("__p.id_a").as("id_a"), explode(col("__p.rest")).as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
