package graft.datapipe

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def embs = Tables.load(spark, dir, "embeddings")

  test("brute force: query vector is its own top-1 with cosine ~1") {
    val top = Similarity.bruteForceTopK(embs, embs.where(col("vec_id") === 7), k = 3)
      .collect()
    assert(top.head.getAs[Long]("vec_id") == 7L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("kmeans iteration: singleton clusters reproduce their own vector") {
    val s = spark; import s.implicits._
    // orthogonal unit vectors: each is its own nearest centroid, so the
    // refined centroid equals the (quantized) vector itself
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = vecs.select(col("vec_id").as("centroid_id"), col("embedding"))
    val out = Similarity.kmeansIter(vecs, cents).collect()
    assert(out.length == 9) // 3 centroids x 3 dims
    out.foreach { r =>
      val cid = r.getAs[Long]("centroid_id"); val pos = r.getAs[Long]("pos")
      val expected = if (cid == pos) 1000000.0 else 0.0
      assert(r.getAs[Double]("mean_q") == expected, s"cid=$cid pos=$pos")
    }
  }

  test("kmeans iteration: merged cluster means its members") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.2f)), // both near centroid 0
      (2L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0f, 0.1f)), (9L, Seq(0.0f, 1.0f)))
      .toDF("centroid_id", "embedding")
    val out = Similarity.kmeansIter(vecs, cents).collect()
      .map(r => (r.getAs[Long]("centroid_id"), r.getAs[Long]("pos")) -> r.getAs[Double]("mean_q"))
      .toMap
    assert(out((0L, 0L)) == 1000000.0)   // (1e6 + 1e6) / 2
    assert(out((0L, 1L)) == 100000.0)    // (0 + 2e5) / 2
    assert(out((9L, 1L)) == 1000000.0)
  }

  test("IVF top-k with full probing equals brute force top-k") {
    val centroids = embs.where(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val q = embs.where(col("vec_id") === 7)
    val nCent = centroids.count().toInt
    val brute = Similarity.bruteForceTopK(embs, q, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val ivf = Similarity.ivfTopK(embs, centroids, q, k = 10, nProbe = nCent)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivf == brute, "probing every centroid must recover exact top-k")
  }

  test("IVF with small nProbe still finds the query itself") {
    val centroids = embs.where(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val ivf = Similarity.ivfTopK(embs, centroids,
        query = embs.where(col("vec_id") === 7), k = 5, nProbe = 2)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(ivf.head == 7L)
  }

  test("ivfCentroids: deterministic sqrt-sized seeding; trained index answers queries") {
    val c1 = Similarity.ivfCentroids(embs).collect()
      .map(_.getAs[Long]("centroid_id")).toSeq
    val c2 = Similarity.ivfCentroids(embs).collect()
      .map(_.getAs[Long]("centroid_id")).toSeq
    assert(c1 == c2, "seeding must be deterministic (hashed-id order)")
    val n = embs.count()
    assert(c1.length == math.ceil(math.sqrt(n.toDouble)).toInt)
    assert(Similarity.ivfCentroids(embs, nlist = 5).count() == 5L)
    // full training loop: centroids refine, then serve as the IVF index
    val trained = Similarity.ivfTrain(embs, nlist = 4, iters = 2)
    assert(trained.count() <= 4L && trained.count() > 0L)
    val hits = Similarity.ivfTopK(embs, trained,
        query = embs.where(col("vec_id") === 7), k = 5, nProbe = 4)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(hits.head == 7L) // full probing of the trained index is exact
  }

  test("centroidsFromMeans round-trips a kmeans mean matrix to float vectors") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = vecs.select(col("vec_id").as("centroid_id"), col("embedding"))
    val back = Similarity.centroidsFromMeans(Similarity.kmeansIter(vecs, cents))
      .collect().map(r => r.getAs[Long]("centroid_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toList).toMap
    assert(back(0L) == List(1.0f, 0.0f, 0.0f))
    assert(back(1L) == List(0.0f, 1.0f, 0.0f))
  }

  test("vector quantization: cosineQ of a vector with itself is ~1") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Seq(0.3f, -0.2f, 0.9f))).toDF("vec_id", "embedding")
      .select(Vectors.quantize(col("embedding")).as("q"))
      .select(Vectors.cosineQ(col("q"), col("q")).as("c"))
    assert(math.abs(df.first().getDouble(0) - 1.0) < 1e-12)
  }

  test("PQ: seed vectors own their codes; ADC retrieves the query first; layout-independent") {
    val s = spark; import s.implicits._
    // n == ksub: every vector seeds the codebook, so each sub-vector's
    // nearest entry is its own slice (||c||^2 - 2x.c is minimized at
    // c = x when x is a candidate) -> codes are the vector's own rank and
    // ADC must retrieve the query itself at distance -(sum ||q_m||^2)
    val vecs = (0 until 8).map { i =>
      (i.toLong, (0 until 6).map(d => ((i * 7 + d * 3) % 11 - 5) / 5.0f))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(vecs, m = 2, ksub = 8)
    assert(cb.count() == 16, "codebook must hold m x ksub entries")
    val codes = Similarity.pqAssign(vecs, cb)
    (0 until 8).foreach { i =>
      val top = Similarity.pqTopK(codes, cb,
        vecs.where(col("vec_id") === i), k = 1).collect().head
      assert(top.getAs[Long]("vec_id") == i.toLong,
        s"query $i must retrieve itself, got ${top.getAs[Long]("vec_id")}")
    }
    val a = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Similarity.pqAssign(vecs.repartition(5), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b, "PQ codes must be layout-independent")
    assert(a.values.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 8)),
      "codes must be m entries in [0, ksub)")
  }

  test("PQ re-rank: equals brute force when the shortlist covers; query-first at 10x") {
    val e = embs
    val cb = Similarity.pqCodebooks(e, m = 4, ksub = 16)
    val codes = Similarity.pqAssign(e, cb)
    val q = e.where(col("vec_id") === 7)
    val n = e.count().toInt
    // mult sized so the ADC shortlist is the whole corpus: the re-rank
    // then IS brute force — exact id AND cosine equality
    val full = Similarity.pqTopKRerank(codes, cb, e, q, k = 10, mult = (n + 9) / 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.bruteForceTopK(e, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == brute,
      "full-coverage re-rank must reproduce brute force exactly")
    // production knobs (mult = 10): query retrieves itself, cosine ~1,
    // and every score is an EXACT cosine (bounded by 1), not an ADC sum
    val rr = Similarity.pqTopKRerank(codes, cb, e, q, k = 10).collect()
    assert(rr.length == 10)
    assert(rr.head.getAs[Long]("vec_id") == 7L)
    assert(math.abs(rr.head.getAs[Double]("cosine") - 1.0) < 1e-9)
    assert(rr.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0 + 1e-9))
  }

  test("IVF+PQ: results come from probed cells and equal PQ ranking of the candidate set") {
    val e = embs
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val cb = Similarity.pqCodebooks(e, m = 4, ksub = 16)
    val query = e.where(col("vec_id") === 7)
    val out = Similarity.ivfPqTopK(e, centroids, cb, query, k = 10, nProbe = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.nonEmpty, "probed cells must yield candidates")
    // every result must belong to one of the 3 probed cells
    val assigned = Similarity.ivfAssignIds(e, centroids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cellsUsed = out.map { case (id, _) => assigned(id) }.toSet
    assert(cellsUsed.size <= 3, s"results span ${cellsUsed.size} cells, probe was 3")
    // consistency: the composed search IS the PQ ranking of the IVF
    // candidate set (same distances, same order)
    val codes = Similarity.pqAssign(e, cb)
    val candIds = assigned.filter { case (_, c) => cellsUsed.contains(c) }.keys.toSeq
    val direct = Similarity.pqTopK(
        codes.where(col("vec_id").isin(candIds: _*)), cb, query, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq == direct.toSeq,
      "composed IVF+PQ must equal PQ ranking of the probed candidates")
  }

  test("int8 quantization: codes bounded, layout-independent, recall matches float top-k") {
    val codes = Similarity.quantizeInt8(embs)
    // every code within the int8 symmetric range
    val outOfRange = codes.select(explode(col("codes")).as("c"))
      .where(col("c") > 127 || col("c") < -127).count()
    assert(outOfRange == 0, "codes must stay in [-127, 127]")
    // deterministic: a layout change produces identical codes
    val a = codes.orderBy("vec_id").collect().map(r =>
      r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val b = Similarity.quantizeInt8(embs.repartition(7)).collect().map(r =>
      r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(a == b, "int8 codes must be layout-independent")
    // recall: quantized top-10 overlaps float cosine top-10 heavily (the
    // embeddings are ~unit-norm, so dot order tracks cosine order up to
    // quantization error)
    val floatTop = Similarity.bruteForceTopK(embs, embs.where(col("vec_id") === 7), k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val q8Top = Similarity.int8TopK(codes, codes.where(col("vec_id") === 7), k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(q8Top.head == 7L || q8Top.contains(7L), "query must retrieve itself")
    val recall = (floatTop & q8Top).size
    assert(recall >= 8, s"int8 recall@10 must be >= 0.8, got $recall/10")
  }

  test("JL projection: coordinates sign-consistent with SRP bits, layout-independent, useful recall") {
    val proj = Similarity.jlProject(embs, dims = 16)
    // internal consistency: the sign of coordinate p IS hyperplane bit p
    val qd = embs.select(col("vec_id"),
        graft.datapipe.Vectors.quantize(col("embedding")).as("q"))
      .withColumn("sig", graft.datapipe.Vectors.lshSignaturePortable(col("q"), 16))
      .select("vec_id", "sig")
    val joined = proj.join(qd, "vec_id").collect()
    joined.foreach { r =>
      val coords = r.getSeq[Long](r.fieldIndex("proj"))
      val sig = r.getAs[Long]("sig")
      coords.zipWithIndex.foreach { case (y, p) =>
        val bit = (sig >> p) & 1L
        assert((y >= 0) == (bit == 1L),
          s"coordinate $p sign must match SRP bit (y=$y, bit=$bit)")
      }
    }
    // layout independence
    val a = proj.orderBy("vec_id").collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Similarity.jlProject(embs.repartition(5), dims = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b, "projections must be layout-independent")
    // the native codegen'd expression is bit-identical to the
    // higher-order-function twin, coordinate for coordinate
    val hof = embs
      .select(col("vec_id"),
        graft.datapipe.Vectors.quantize(col("embedding")).as("__q"))
      .select(col("vec_id"),
        array((0 until 16).map(p =>
          graft.datapipe.Vectors.projectPortable(col("__q"), p)): _*).as("proj"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == hof, "native JlProjectLong must equal the HOF formulation")
    // the projected order is a useful first-pass: self retrieved, and
    // recall grows with dims (the JL tradeoff): on these near-random
    // unit vectors a 3x pool at 16 dims catches a few of the float
    // top-10, at 32 dims most of it; exact re-rank is the documented
    // second stage either way
    val floatTop = Similarity.bruteForceTopK(embs, embs.where(col("vec_id") === 7), k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    def pool(dims: Int) =
      Similarity.jlTopK(embs, embs.where(col("vec_id") === 7), k = 30, dims = dims)
        .collect().map(_.getAs[Long]("vec_id"))
    val p16 = pool(16)
    assert(p16.contains(7L), "query must retrieve itself")
    val r16 = (floatTop & p16.toSet).size
    val r32 = (floatTop & pool(32).toSet).size
    // the fixture's vectors are ~uniform on the sphere (no cluster
    // structure), the hardest case for any projection — the pin is
    // "clearly better than the ~7% random-pool baseline", not high
    // absolute recall (real corpora have neighborhoods; re-rank is the
    // second stage regardless)
    assert(r16 >= 2 && r32 >= 2,
      s"JL pools must beat the random baseline, got $r16/10 and $r32/10")
  }
}
