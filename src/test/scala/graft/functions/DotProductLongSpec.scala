package graft.functions

import graft.SparkSpec
import graft.datapipe.Vectors
import org.apache.spark.sql.functions._

class DotProductLongSpec extends SparkSpec {

  test("native dot product matches the higher-order-function twin exactly") {
    val s = spark; import s.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-1000000L, 2000000L), Seq(3000000L, 7000000L)),
      (Seq.empty[Long], Seq.empty[Long])
    ).toDF("a", "b")
    val out = df.select(
      Vectors.dotQ(col("a"), col("b")).as("hof"),
      Vectors.dotQN(col("a"), col("b")).as("native")).collect()
    assert(out(0).getLong(1) == 32L)
    assert(out(1).getLong(1) == -1000000L * 3000000L + 2000000L * 7000000L)
    assert(out(2).getLong(1) == 0L)
    out.take(2).foreach(r => assert(r.getLong(0) == r.getLong(1), "hof == native"))
  }

  test("native dot product works via SQL and survives codegen") {
    GraftFunctions.register(spark)
    val one = spark.sql(
      "SELECT graft_dot_q(array(1L, 2L), array(10L, 20L)) AS d").first()
    assert(one.getLong(0) == 50L)
    // force a non-trivial codegen'd pipeline around it
    val s = spark; import s.implicits._
    val big = (1 to 1000).map(i => (i.toLong, Seq.fill(64)(i.toLong))).toDF("id", "v")
    val total = big.select(Vectors.dotQN(col("v"), col("v")).as("d"))
      .agg(sum("d")).first().getLong(0)
    val expected = (1 to 1000).map(i => 64L * i * i).sum
    assert(total == expected)
  }

  test("type checking rejects wrong argument types") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot_q(array('a'), array(1L))").collect()
    }
    assert(e.getMessage.contains("array<bigint>"))
  }
}
