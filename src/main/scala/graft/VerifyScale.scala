package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-invariant spot-correctness gate (r13): the sf0.01 DuckDB oracle
  * is blind to wrongness that only triggers at scale — r11's
  * `q1_pricing_summary` CAST_OVERFLOW appeared at sf10 group sums, and
  * r12's curate row was silently wrong from sf2 up (synthetic-id
  * collision) while every small-SF oracle stayed green. This main runs
  * the rows with scale-sensitive arithmetic at ANY scale factor and
  * checks INVARIANTS (bounds, conservation, idempotence — not DuckDB
  * parity, which doesn't fit a 100 GB fixture) so a scale-only defect
  * fails the sweep loudly instead of shipping a plausible artifact.
  *
  * Usage: runMain graft.VerifyScale <sfDir> [check,check,...]
  * Prints one `SCALECHECK <name> PASS|FAIL <detail>` line per check and
  * a trailing JSON summary; exits nonzero on any FAIL. Predicate logic
  * lives in the testable `check*` functions — VerifyScaleSpec proves
  * the gate actually trips by feeding each an injected violation.
  */
object VerifyScale {

  /** q1: per-group bounds + whole-table conservation. A silent decimal
    * wrap or a broken micro-unit round-trip turns sums negative or
    * breaks sum_disc_price <= sum_base_price (discount in [0,1)); a
    * dropped/duplicated group breaks count conservation.
    */
  def checkQ1(out: DataFrame, lineitemCount: Long): Either[String, String] = {
    val r = out.agg(
      sum("count_order").cast("long"),
      min(col("sum_qty")), min(col("sum_base_price")), min(col("sum_disc_price")),
      max(when(col("sum_disc_price") > col("sum_base_price"), 1).otherwise(0)))
      .first()
    val (n, mq, mb, md, viol) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4))
    if (n != lineitemCount)
      Left(s"count_order sum $n != lineitem rows $lineitemCount")
    else if (mq <= 0 || mb <= 0 || md <= 0)
      Left(f"non-positive group sums: min qty=$mq%.4f base=$mb%.4f disc=$md%.4f")
    else if (viol == 1)
      Left("sum_disc_price > sum_base_price in some group (discount in [0,1) violated)")
    else Right(f"groups=${out.count()} rows=$n min_disc=$md%.2f")
  }

  /** a19: every event lands in exactly two hopping windows, so
    * sum(n) == 2 * |events|; window starts must sit on the 5-minute
    * grid; (win, event_type) keys must be unique.
    */
  def checkA19(out: DataFrame, eventCount: Long): Either[String, String] = {
    val slide = 300000000000L
    val r = out.agg(
      sum("n").cast("long"),
      sum(when(pmod(col("win_start_ns"), lit(slide)) =!= 0, 1L).otherwise(0L)),
      count(lit(1)).cast("long")).first()
    val (total, offGrid, rows) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val distinctKeys = out.select("win_start_ns", "event_type").distinct().count()
    if (total != 2 * eventCount)
      Left(s"sum(n)=$total != 2*events=${2 * eventCount}")
    else if (offGrid != 0) Left(s"$offGrid window starts off the 5-minute grid")
    else if (distinctKeys != rows) Left(s"duplicate (window, event_type) keys: $rows rows, $distinctKeys distinct")
    else Right(s"rows=$rows events_covered=$total")
  }

  /** Cosine pair set: scores in [threshold, 1+eps] (quantized dot can
    * exceed 1 by rounding only), ordered ids, no duplicate pairs.
    */
  def checkCosinePairs(out: DataFrame, threshold: Double): Either[String, String] = {
    val r = out.agg(
      coalesce(min("cosine"), lit(1.0)), coalesce(max("cosine"), lit(1.0)),
      sum(when(col("id_a") >= col("id_b"), 1L).otherwise(0L)),
      count(lit(1)).cast("long")).first()
    val (lo, hi, unordered, rows) =
      (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3))
    val distinctPairs = out.select("id_a", "id_b").distinct().count()
    if (lo < threshold) Left(f"cosine $lo%.6f below threshold $threshold")
    else if (hi > 1.0 + 1e-6) Left(f"cosine $hi%.6f above 1")
    else if (unordered != 0) Left(s"$unordered pairs with id_a >= id_b")
    else if (distinctPairs != rows) Left(s"duplicate pairs: $rows rows, $distinctPairs distinct")
    else Right(f"pairs=$rows cosine=[$lo%.4f,$hi%.4f]")
  }

  /** Contamination outputs must be a SUBSET of the corpus id space. */
  def checkSubset(out: DataFrame, corpusIds: DataFrame, idCol: String): Either[String, String] = {
    val extra = out.select(idCol).join(corpusIds, Seq(idCol), "left_anti").count()
    if (extra != 0) Left(s"$extra output ids not in the corpus")
    else Right(s"rows=${out.count()} all in corpus")
  }

  /** Curate stage counts must be monotone non-increasing through the
    * pipeline (each stage only drops documents) and end non-negative.
    */
  def checkCurateCounts(out: DataFrame): Either[String, String] = {
    val rows = out.orderBy("stage").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // retention stages only: '6_' is an id-sum, 'rule:'/'signal:' rows
    // are diagnostics (per-rule drops, pair-budget routing), not a
    // monotone retention chain
    val stages = rows.filter(r =>
      r._1.headOption.exists(_.isDigit) && !r._1.startsWith("6_"))
    val bad = stages.sliding(2).collectFirst {
      case Array((s1, n1), (s2, n2)) if n2 > n1 =>
        s"$s2=$n2 exceeds $s1=$n1 (stages can only drop docs)"
    }
    if (rows.exists(_._2 < 0)) Left("negative stage count")
    else bad.toLeft(s"stages=${stages.map(t => s"${t._1}:${t._2}").mkString(",")}")
  }

  /** z-order: values inside [0, 4^bits), count preserved (pure map). */
  def checkZOrder(out: DataFrame, eventCount: Long, bits: Int): Either[String, String] = {
    val r = out.agg(count(lit(1)).cast("long"),
      coalesce(min("zval"), lit(0L)), coalesce(max("zval"), lit(0L))).first()
    val (rows, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val bound = 1L << (2 * bits)
    if (rows != eventCount) Left(s"rows=$rows != events=$eventCount (map must preserve count)")
    else if (lo < 0 || hi >= bound) Left(s"zval out of [0, $bound): min=$lo max=$hi")
    else Right(s"rows=$rows z=[$lo,$hi)")
  }

  /** The synthetic-id namespace premise every *WithNearDups fixture and
    * the curate quarter-slice rely on (r12's silent-wrongness root
    * cause): real doc ids must stay strictly below the 1e9 injection
    * offset at EVERY scale factor.
    */
  def checkIdNamespace(docs: DataFrame): Either[String, String] = {
    val mx = docs.agg(coalesce(max("doc_id"), lit(0L))).first().getLong(0)
    if (mx >= 1000000000L)
      Left(s"max real doc_id $mx collides with the 1e9 injected-id offset")
    else Right(s"max_doc_id=$mx < 1e9")
  }

  /** Determinism/idempotence: two independent executions of the same
    * row must agree on (count, order-independent content hash) — the
    * cheap scale twin of the sf0.01 hash oracle.
    */
  def checkDeterminism(mk: () => DataFrame): Either[String, String] = {
    def sig(df: DataFrame): (Long, Long, String) = {
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      val h = xxhash64(cols: _*)
      // XOR alone cancels duplicate rows PAIRWISE (count + xor cannot
      // tell {x,x,y} from {x,y,y} — ADVICE r13), so the signature also
      // carries the order-independent SUM of hashes. decimal(38,0), not
      // long: ANSI sum(long) over billions of full-range hashes would
      // overflow-throw; the decimal sum is exact and deterministic.
      val r = df.agg(count(lit(1)).cast("long"),
        coalesce(bit_xor(h), lit(0L)),
        coalesce(sum(h.cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))).first()
      (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString)
    }
    val (a, b) = (sig(mk()), sig(mk()))
    if (a != b) Left(s"two executions disagree: $a vs $b")
    else Right(s"stable n=${a._1} xor=${a._2} sum=${a._3}")
  }

  /** Named checks over the live query surface at `dir`. */
  def checks(spark: SparkSession, dir: String): Seq[(String, () => Either[String, String])] = {
    def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)
    val docs = () => graft.core.Tables.load(spark, dir, "documents")
    Seq(
      "q1_invariants" -> (() =>
        checkQ1(q("q1_pricing_summary"),
          graft.core.Tables.load(spark, dir, "lineitem").count())),
      "a19_conservation" -> (() =>
        // a19 drops null-ts rows (floor-alignment fix, ADVICE r13), so
        // the conservation base is the non-null event count
        checkA19(q("a19_hopping_window"),
          graft.core.Tables.load(spark, dir, "events")
            .where(col("ts").isNotNull).count())),
      "d4_capped_bounds" -> (() => checkCosinePairs(q("d4_cosine_capped"), 0.3)),
      "d6_subset" -> (() =>
        checkSubset(q("d6_decontaminate"), docs().select("doc_id"), "doc_id")),
      "d18_subset" -> (() =>
        checkSubset(q("d18_semantic_decon"),
          graft.core.Tables.load(spark, dir, "embeddings").select("vec_id"), "vec_id")),
      "curate_monotone" -> (() => checkCurateCounts(q("curate_pipeline"))),
      "z1_bounds" -> (() =>
        checkZOrder(q("z1_zorder_curve"),
          graft.core.Tables.load(spark, dir, "events").count(), bits = 8)),
      "id_namespace" -> (() => checkIdNamespace(docs())),
      "d1_determinism" -> (() => checkDeterminism(() => q("d1_dedup_exact")))
    )
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VerifyScale <sfDir> [check,check,...]")
    val dir = args(0)
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = 0
    val results = checks(spark, dir)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, run) =>
        val t0 = System.nanoTime()
        val res =
          try run()
          catch { case e: Throwable =>
            Left(s"threw ${e.getClass.getSimpleName}: ${e.getMessage}") }
        val secs = (System.nanoTime() - t0) / 1e9
        // a failed row must be VISIBLE: stdout line + nonzero exit
        res match {
          case Left(msg) =>
            failed += 1; println(f"SCALECHECK $name FAIL ($secs%.1fs) $msg"); (name, false)
          case Right(detail) =>
            println(f"SCALECHECK $name PASS ($secs%.1fs) $detail"); (name, true)
        }
        // block hygiene between checks, the Bench discipline
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (name, res.isRight)
      }
    val json = results.map { case (n, ok) => s""""$n":$ok""" }
      .mkString(s"""{"sf":"$dir","n_failed":$failed,"checks":{""", ",", "}}")
    println(json)
    val outDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out/scratch")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, s"scalecheck_${new java.io.File(dir).getName}.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
