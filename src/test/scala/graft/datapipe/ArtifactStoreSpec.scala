package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArtifactStoreSpec extends SparkSpec {
  import spark.implicits._

  test("getOrBuild evaluates the builder once per key; later calls read files") {
    ArtifactStore.reset()
    var builds = 0
    def get() = ArtifactStore.getOrBuild(spark, "spec_key_a") {
      builds += 1
      Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    }
    val first = get().orderBy("id").collect().map(_.toSeq)
    val second = get().orderBy("id").collect().map(_.toSeq)
    assert(builds == 1, "second call must ride the stored artifact")
    assert(first.toSeq == second.toSeq)
    // the artifact is a plain parquet scan: no in-memory lineage to the
    // builder plan (a FileSourceScan, not the original LocalRelation)
    assert(get().queryExecution.executedPlan.toString.contains("Scan parquet"))
  }

  test("distinct keys build independently; reset() forces a rebuild") {
    ArtifactStore.reset()
    var builds = 0
    def get(key: String) = ArtifactStore.getOrBuild(spark, key) {
      builds += 1
      Seq((builds.toLong, "b")).toDF("id", "v")
    }
    get("spec_key_b").count()
    get("spec_key_c").count()
    assert(builds == 2)
    ArtifactStore.reset()
    get("spec_key_b").count()
    assert(builds == 3, "a dropped registry entry rebuilds (staleness safety)")
  }

  test("bucketed artifact: stored side joins exchange-free on the bucket key") {
    ArtifactStore.reset()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val stored = ArtifactStore.getOrBuildBucketed(
          spark, "spec_key_bk", bucketCol = "bucket", nBuckets = 8) {
        spark.range(1000L).select(
          (col("id") % 50).cast("string").as("bucket"), col("id").as("stored_id"))
      }
      val incoming = spark.range(100L).select(
        (col("id") % 50).cast("string").as("bucket"), col("id").as("incoming_id"))
      val plan = stored.join(incoming, Seq("bucket"))
        .queryExecution.executedPlan.toString
      // exactly ONE shuffle: the live incoming side aligns to the stored
      // buckets; the artifact's write-time shuffle replaced its read-time one
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"stored side must not re-shuffle:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("downstream filters push into the artifact scan") {
    ArtifactStore.reset()
    val df = ArtifactStore.getOrBuild(spark, "spec_key_d") {
      spark.range(1000L).select(col("id"), (col("id") % 7).as("m"))
    }
    val plan = df.where(col("m") === 3L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(m), EqualTo(m,3)]"),
      s"artifact consumers must get parquet pushdown:\n$plan")
  }
}
