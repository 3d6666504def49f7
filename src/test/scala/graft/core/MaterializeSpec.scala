package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Materialize.frontier strategy selection: small plans localCheckpoint;
  * large plans (forced via a zero threshold) take the fault-tolerant
  * paths — scratch-dir parquet round-trip when configured, replicated
  * disk persist otherwise — and every path returns identical rows.
  */
class MaterializeSpec extends SparkSpec {

  private def df = spark.range(0, 1000)
    .select(col("id"), (col("id") % 7).as("k"))

  private def rows(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("small estimate takes localCheckpoint (truncated lineage)") {
    val m = Materialize.frontier(df)
    assert(rows(m) == rows(df))
    // localCheckpoint truncates lineage to a scanned-RDD leaf
    assert(m.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
  }

  test("forced scale path without scratch dir persists with replication") {
    spark.conf.set(Materialize.LocalMaxBytesConf, "0")
    try {
      val m = Materialize.frontier(df)
      assert(rows(m) == rows(df))
      assert(m.storageLevel.useDisk && m.storageLevel.replication == 2)
      assert(!m.storageLevel.useMemory)
      m.unpersist()
    } finally spark.conf.unset(Materialize.LocalMaxBytesConf)
  }

  test("forced scale path with scratch dir round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("mat_scratch").toString
    spark.conf.set(Materialize.LocalMaxBytesConf, "0")
    spark.conf.set(Materialize.ScratchDirConf, dir)
    try {
      val m = Materialize.frontier(df)
      assert(rows(m) == rows(df))
      // the frontier now reads from files — a lost executor recomputes
      // from the scratch table, not from (truncated or giant) lineage
      assert(m.queryExecution.optimizedPlan.toString.toLowerCase.contains("parquet") ||
        m.inputFiles.nonEmpty)
      assert(m.inputFiles.forall(_.contains("frontier_")))
      // concurrent-app safety: the path is namespaced per application
      assert(m.inputFiles.forall(_.contains(spark.sparkContext.applicationId)))
    } finally {
      spark.conf.unset(Materialize.LocalMaxBytesConf)
      spark.conf.unset(Materialize.ScratchDirConf)
    }
  }

  test("cleanupScratch removes every scratch table this JVM wrote") {
    val dir = java.nio.file.Files.createTempDirectory("mat_scratch_gc").toString
    spark.conf.set(Materialize.LocalMaxBytesConf, "0")
    spark.conf.set(Materialize.ScratchDirConf, dir)
    try {
      val m = Materialize.frontier(df)
      assert(rows(m) == rows(df)) // fully consume before reclaiming
      assert(new java.io.File(dir).listFiles().nonEmpty)
      Materialize.cleanupScratch()
      val left = Option(new java.io.File(dir).listFiles()).map(_.toSeq).getOrElse(Nil)
      assert(left.isEmpty, s"scratch not reclaimed: $left")
      Materialize.cleanupScratch() // idempotent
    } finally {
      spark.conf.unset(Materialize.LocalMaxBytesConf)
      spark.conf.unset(Materialize.ScratchDirConf)
    }
  }

  test("reapScratch deletes aged frontier dirs, keeps live ones, clears dead-app husks") {
    val dir = java.nio.file.Files.createTempDirectory("mat_scratch_reap").toString
    spark.conf.set(Materialize.LocalMaxBytesConf, "0")
    spark.conf.set(Materialize.ScratchDirConf, dir)
    try {
      val now = System.currentTimeMillis()
      val dayMs = 24L * 3600 * 1000
      def frontierDir(m: org.apache.spark.sql.DataFrame) =
        new java.io.File(new java.net.URI(m.inputFiles.head)).getParentFile
      val oldF = Materialize.frontier(df)
      val liveF = Materialize.frontier(df)
      assert(rows(oldF) == rows(df) && rows(liveF) == rows(df))
      val oldDir = frontierDir(oldF)
      val liveDir = frontierDir(liveF)
      assert(oldDir.setLastModified(now - 2 * dayMs)) // abandoned yesterday
      // a crashed application's leftover namespace: old frontier inside
      val deadApp = new java.io.File(dir, "application_dead_00000000")
      val deadFr = new java.io.File(deadApp, "frontier_1")
      assert(deadFr.mkdirs())
      java.nio.file.Files.write(deadFr.toPath.resolve("part-0.parquet"), Array[Byte](1))
      assert(deadFr.setLastModified(now - 3 * dayMs))
      assert(deadApp.setLastModified(now - 3 * dayMs))
      // reap everything untouched for > 1 day (streaming-driver hygiene tick)
      val n = Materialize.reapScratch(spark, now - dayMs)
      assert(n == 2L, s"expected the aged + dead frontiers reaped, got $n")
      assert(!oldDir.exists() && !deadFr.exists())
      assert(!deadApp.exists(), "emptied dead-app namespace must go with its last frontier")
      assert(liveDir.exists(), "live frontier must survive")
      assert(rows(liveF) == rows(df), "surviving frontier must still be readable")
      // the jobs-layer age-expression form parses and runs (nothing < 1d old left)
      assert(graft.jobs.Prune.reapScratch(spark, "1d") == 0L)
    } finally {
      spark.conf.unset(Materialize.LocalMaxBytesConf)
      spark.conf.unset(Materialize.ScratchDirConf)
      Materialize.cleanupScratch()
    }
  }

  // deterministic lifecycle: blocks/files freed at release/close, not GC.
  // Assertions are ID-SET based (the blocks THIS test created are gone),
  // not global-count based: the async ContextCleaner may concurrently
  // reap GC'd frontiers from earlier suites in the shared session.

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("FrontierScope.close releases localCheckpoint blocks back to baseline") {
    val before = persistedIds
    var added = Set.empty[Int]
    val out = Materialize.withFrontiers { scope =>
      val a = scope.frontier(df)
      val b = scope.frontier(a.groupBy("k").agg(sum("id").as("s")))
      added = persistedIds -- before
      assert(added.nonEmpty, "frontiers must hold blocks while in scope")
      b.collect().length // last consumer runs inside the scope
    }
    assert(out == 7)
    assert(persistedIds.intersect(added).isEmpty,
      s"scope close must free every block it created, still live: ${persistedIds.intersect(added)}")
  }

  test("Frontier.release is deterministic, eager and idempotent") {
    val before = persistedIds
    val h = Materialize.frontierHandle(df)
    assert(rows(h.df) == rows(df))
    val added = persistedIds -- before
    assert(added.size == 1)
    h.release()
    assert(h.isReleased)
    assert(persistedIds.intersect(added).isEmpty, "release must free the block synchronously")
    h.release() // idempotent
    assert(persistedIds.intersect(added).isEmpty)
  }

  test("scratch-path release deletes that frontier's files only") {
    val dir = java.nio.file.Files.createTempDirectory("mat_scratch_rel").toString
    spark.conf.set(Materialize.LocalMaxBytesConf, "0")
    spark.conf.set(Materialize.ScratchDirConf, dir)
    try {
      val h1 = Materialize.frontierHandle(df)
      val h2 = Materialize.frontierHandle(df)
      assert(rows(h1.df) == rows(df) && rows(h2.df) == rows(df))
      val d1 = new java.io.File(new java.net.URI(h1.df.inputFiles.head)).getParentFile
      val d2 = new java.io.File(new java.net.URI(h2.df.inputFiles.head)).getParentFile
      h1.release()
      assert(!d1.exists(), "released frontier's scratch table must be deleted")
      assert(d2.exists(), "sibling frontier must survive")
      assert(rows(h2.df) == rows(df))
      h2.release()
      assert(!d2.exists())
    } finally {
      spark.conf.unset(Materialize.LocalMaxBytesConf)
      spark.conf.unset(Materialize.ScratchDirConf)
      Materialize.cleanupScratch()
    }
  }

  test("frontierObserved computes metrics in the materializing job on every path") {
    def check(): Unit = {
      val (h, m) = Materialize.frontierObserved(df,
        count(lit(1)).as("n"), sum(col("id")).as("s"))
      assert(m("n") == 1000L && m("s") == 499500L, s"observed $m")
      assert(rows(h.df) == rows(df))
      h.release()
    }
    check() // localCheckpoint path
    spark.conf.set(Materialize.LocalMaxBytesConf, "0")
    try {
      check() // DISK_ONLY_2 path
      val dir = java.nio.file.Files.createTempDirectory("mat_obs").toString
      spark.conf.set(Materialize.ScratchDirConf, dir)
      try check() // scratch parquet path
      finally spark.conf.unset(Materialize.ScratchDirConf)
    } finally spark.conf.unset(Materialize.LocalMaxBytesConf)
  }

  test("duplicateComponents with a scope frees all its frontiers at close") {
    val s = spark; import s.implicits._
    val before = persistedIds
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 7L))
      .toDF("id_a", "id_b")
    val labels = Materialize.withFrontiers { scope =>
      graft.datapipe.Dedup
        .duplicateComponents(pairs, scope = Some(scope))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 7L -> 7L))
    val leaked = persistedIds -- before
    assert(leaked.isEmpty,
      s"contraction frontiers must be freed at scope close, leaked: $leaked")
  }
}
