package graft.functions

import graft.SparkSpec
import graft.datapipe.Vectors
import org.apache.spark.sql.functions._

/** Every native expression must actually COMPILE under codegen — not
  * silently fall back to interpreted eval. A doGenCode bug (wrong FQN,
  * bad cast) is invisible to value-equality specs: Spark logs an
  * executor-side ERROR and re-runs interpreted, results stay correct,
  * and the "codegen'd" expression quietly loses its reason to exist
  * (caught for real in JlProjectLong: a `catalyst.util.UnsafeArrayData`
  * reference — the class lives in `catalyst.expressions` — meant its
  * generated code never compiled once). `CODEGEN_ONLY` factory mode
  * makes compile failures throw instead of falling back.
  */
class NativeCodegenSpec extends SparkSpec {

  private def withCodegenOnly[T](f: => T): T = {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f
    finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("all four native expressions compile and run under CODEGEN_ONLY") {
    val s = spark; import s.implicits._
    GraftFunctions.register(spark)
    withCodegenOnly {
      // graft_dot_q (DotProductLong)
      val dot = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
        .select(Vectors.dotQN(col("a"), col("b")).as("d")).as[Long].head()
      assert(dot == 32L)

      // graft_jl_project (JlProjectLong) — pinned against the HOF twin
      val v = Seq((1L, Seq(5L, -3L, 7L, 11L, -2L, 9L, 4L, -8L))).toDF("id", "q")
      val native = v.select(Vectors.jlProjectN(col("q"), 4).as("p"))
        .as[Seq[Long]].head()
      val hof = v.select(array(
          (0 until 4).map(p => Vectors.projectPortable(col("q"), p)): _*).as("p"))
        .as[Seq[Long]].head()
      assert(native == hof, "codegen'd projection must equal the HOF twin")

      // graft_minhash_md5 (MinhashMd5): (tokens, n, k) — k double-hash
      // lanes off one streamed md5 per shingle; lane values in [0, 2^40)
      val sig = Seq(Tuple1(Seq("a", "b", "c", "d", "e"))).toDF("t")
        .select(call_function(GraftFunctions.minhashName,
          col("t"), lit(3), lit(4)).as("s"))
        .as[Seq[Long]].head()
      assert(sig.length == 4 && sig.forall(v => v >= 0L && v < (1L << 40)))

      // graft_feature_buckets (FeatureBucketsMd5): (tokens, seed, nBuckets)
      val fb = Seq(Tuple1(Seq("x", "y", "z"))).toDF("t")
        .select(call_function(GraftFunctions.featureBucketsName,
          col("t"), lit(0L), lit(64)).as("b"))
        .as[Seq[Long]].head()
      assert(fb.nonEmpty && fb.forall(b => b >= 0 && b < 64))

      // graft_gram_hashes (GramHashes) feeding graft_winnow_select's
      // array<long> input path — the production winnowing pipeline shape
      val sel = Seq(Tuple1(Seq("a", "b", "c", "d", "e", "f"))).toDF("t")
        .select(call_function(GraftFunctions.winnowSelectName,
          call_function(GraftFunctions.gramHashesName,
            col("t"), lit(2), lit(0L)), lit(3)).as("s"))
        .select(explode(col("s")).as("fp"))
        .select(col("fp.pos"), col("fp.h"))
        .collect()
      assert(sel.nonEmpty && sel.forall(_.getInt(0) >= 0))
      val gh = Seq(Tuple1(Seq("a", "b", "c"))).toDF("t")
        .select(call_function(GraftFunctions.gramHashesName,
          col("t"), lit(2), lit(0L)).as("g"))
        .as[Seq[Long]].head()
      assert(gh == GramHashes.reference(Seq("a", "b", "c"), 2, 0L))
    }
  }
}
