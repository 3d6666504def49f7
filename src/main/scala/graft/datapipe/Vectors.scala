package graft.datapipe

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built on Spark's
  * higher-order functions (zip_with / aggregate / transform) so everything
  * stays in Catalyst — no UDFs, no driver-side loops.
  *
  * Quantized path: floats are scaled to integer micro-units so dot
  * products accumulate exactly (order-insensitive, engine-independent) —
  * the same determinism discipline as the VWAP accumulator.
  */
object Vectors {

  /** float vector -> exact micro-unit long vector. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000000.0 + 0.5).cast("long"))

  /** Exact integer dot product of two quantized vectors (higher-order
    * function form — portable, but interpreted per element).
    */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Native codegen'd twin of [[dotQ]] (graft.functions.DotProductLong);
    * requires `GraftFunctions.register(spark)` (operators do this).
    * Bit-identical results to dotQ.
    */
  def dotQN(a: Column, b: Column): Column =
    call_function(graft.functions.GraftFunctions.dotQName, a, b)

  /** Cosine similarity from quantized vectors (deterministic doubles). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Native twin of [[cosineQ]] (requires GraftFunctions.register). */
  def cosineQN(a: Column, b: Column): Column =
    dotQN(a, b).cast("double") /
      (sqrt(dotQN(a, a).cast("double")) * sqrt(dotQN(b, b).cast("double")))

  /** Double-precision dot product (fast path; order-sensitive only within
    * one row's fold, which Spark evaluates sequentially — deterministic
    * for a fixed row).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane sign for LSH: plane `p` is
    * defined by component weights hash(p, i) mapped to ±1; the sign bit of
    * the weighted sum is one signature bit. Integer arithmetic throughout.
    */
  def hyperplaneBit(q: Column, plane: Int): Column = {
    val signedSum = aggregate(
      zip_with(q, transform(q, (_, i) => xxhash64(lit(plane), i)),
        (x, h) => when(h % 2 === 0, x).otherwise(-x)),
      lit(0L), (acc, x) => acc + x)
    when(signedSum >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** `nPlanes`-bit LSH signature of a quantized vector. */
  def lshSignature(q: Column, nPlanes: Int): Column =
    (0 until nPlanes)
      .map(p => hyperplaneBit(q, p) * lit(1L << p))
      .reduce(_ + _)

  /** Portable hyperplane sign for plane `p`, component index `i` (0-based):
    * one LCG step over (p, i), sign = bit 16 of the state. Plain integer
    * arithmetic (*, +, %, >>, &) — any SQL engine reproduces it exactly,
    * unlike the xxhash64 planes. LCG low bits alternate deterministically,
    * hence the mid-state bit.
    */
  def portablePlaneSign(plane: Int, i: Column): Column = {
    val h = (lit(1103515245L) * (lit(plane.toLong * 65537L) + i) + lit(12345L)) % lit(2147483648L)
    shiftright(h, 16).bitwiseAND(lit(1L))
  }

  /** Signed projection coordinate for plane `p`: the ±1-weighted
    * component sum (the pre-threshold value of
    * [[hyperplaneBitPortable]]) — one exact integer coordinate of an
    * Achlioptas/JL sign-matrix random projection.
    */
  def projectPortable(q: Column, plane: Int): Column =
    aggregate(
      transform(q, (x, i) =>
        when(portablePlaneSign(plane, i.cast("long")) === 0L, x).otherwise(-x)),
      lit(0L), (acc, x) => acc + x)

  /** Portable twin of [[hyperplaneBit]] over [[portablePlaneSign]]. */
  def hyperplaneBitPortable(q: Column, plane: Int): Column =
    when(projectPortable(q, plane) >= 0, lit(1L)).otherwise(lit(0L))

  /** Native codegen'd twin of `dims` × [[projectPortable]] in one pass
    * (graft.functions.JlProjectLong); requires
    * `GraftFunctions.register(spark)`. Bit-identical coordinates.
    */
  def jlProjectN(q: Column, dims: Int): Column =
    call_function(graft.functions.GraftFunctions.jlProjectName, q, lit(dims))

  /** Portable twin of [[lshSignature]] — cross-engine-verifiable buckets. */
  def lshSignaturePortable(q: Column, nPlanes: Int): Column =
    (0 until nPlanes)
      .map(p => hyperplaneBitPortable(q, p) * lit(1L << p))
      .reduce(_ + _)
}
