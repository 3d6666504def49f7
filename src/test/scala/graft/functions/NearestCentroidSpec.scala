package graft.functions

import graft.SparkSpec
import graft.datapipe.{Similarity, Vectors}
import org.apache.spark.sql.functions._

/** Pins the per-row argmax/argmin expressions verdict-equal to the old
  * aggregate formulations they replaced (r13: the struct-ordered
  * max_by/min_by buffers forced SortAggregate over the n×k candidate
  * explosion — 139 GB spill at sf100). Random corpora plus crafted
  * exact-tie fixtures, so the lowest-id tie-break is pinned, not lucky.
  */
class NearestCentroidSpec extends SparkSpec {

  private def randVec(seed: Int, dim: Int): Seq[Float] = {
    val r = new scala.util.Random(seed)
    Seq.fill(dim)(r.nextFloat() * 2f - 1f)
  }

  test("ivfAssignIds equals the max_by(cosine, -cid) formulation on random data") {
    val s = spark; import s.implicits._
    val vecs = (0 until 200).map(i => (i.toLong, randVec(i, 8))).toDF("vec_id", "embedding")
    val cents = (0 until 13).map(i => (i.toLong, randVec(1000 + i, 8)))
      .toDF("centroid_id", "embedding")
    val got = Similarity.ivfAssignIds(vecs, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the replaced formulation, inlined
    val c = cents.select(col("centroid_id"), Vectors.quantize(col("embedding")).as("q_cent"))
    val v = vecs.select(col("vec_id"), Vectors.quantize(col("embedding")).as("q_vec"))
    val want = v.crossJoin(broadcast(c))
      .withColumn("cosine", Vectors.cosineQ(col("q_vec"), col("q_cent")))
      .groupBy("vec_id")
      .agg(max_by(col("centroid_id"),
        struct(col("cosine"), (-col("centroid_id")).as("neg_cid"))).as("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.size == 200)
  }

  test("exact cosine ties assign to the LOWEST centroid id") {
    val s = spark; import s.implicits._
    val vecs = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    // centroids 7 and 3 are IDENTICAL vectors -> exact tie; 9 is worse
    val shared = Seq(0.9f, 0.1f, 0.0f, 0.0f)
    val cents = Seq((7L, shared), (3L, shared), (9L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("centroid_id", "embedding")
    val got = Similarity.ivfAssignIds(vecs, cents).collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L)
  }

  test("pqAssign equals the min_by(dist, code) formulation on random data") {
    val s = spark; import s.implicits._
    val vecs = (0 until 150).map(i => (i.toLong, randVec(i + 31, 8))).toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(vecs, m = 4, ksub = 8)
    val got = Similarity.pqAssign(vecs, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // the replaced formulation, inlined (integer L2 contrast)
    val m = 4
    val sub = vecs
      .select(col("vec_id"), Vectors.quantize(col("embedding")).as("__qv"))
      .select(col("vec_id"), col("__qv"),
        explode(sequence(lit(0), lit(m - 1))).as("m"),
        expr(s"(size(__qv) + ${m - 1}) div $m").as("__L"))
      .select(col("vec_id"), col("m"),
        slice(col("__qv"), col("m") * col("__L") + 1, col("__L")).as("qx"))
    val want = sub.join(broadcast(books), Seq("m"))
      .withColumn("__d",
        Vectors.dotQ(col("qc"), col("qc")) - lit(2L) * Vectors.dotQ(col("qx"), col("qc")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("code"), struct(col("__d"), col("code"))).as("code"))
      .groupBy("vec_id")
      .agg(transform(
        sort_array(collect_list(struct(col("m"), col("code")))),
        x => x.getField("code")).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got == want)
    assert(got.size == 150)
  }

  test("the assignment plan carries no SortAggregate and no n-by-k explosion") {
    val s = spark; import s.implicits._
    val vecs = (0 until 50).map(i => (i.toLong, randVec(i, 4))).toDF("vec_id", "embedding")
    val cents = (0 until 5).map(i => (i.toLong, randVec(99 + i, 4)))
      .toDF("centroid_id", "embedding")
    val plan = Similarity.ivfAssignIds(vecs, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"),
      s"assignment must not sort-aggregate the score explosion:\n$plan")
  }
}
