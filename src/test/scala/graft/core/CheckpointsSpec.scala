package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Spark-internal invariant [[Checkpoints.sweepAnonymous]]
  * keys on (ADVICE r5): Dataset-level caches carry a plan-derived RDD
  * name, while localCheckpoint RDDs are anonymous. If a Spark upgrade
  * ever breaks either half, these tests fail instead of the sweep
  * silently severing (or sparing) the wrong blocks.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def persistentNames(): Map[Int, String] =
    spark.sparkContext.getPersistentRDDs.map { case (id, r) =>
      id -> r.name
    }.toMap

  test("Dataset caches are named; localCheckpoint frames are anonymous") {
    val cached = Seq(1, 2, 3).toDF("x").persist()
    cached.count()
    val ck = Seq(4, 5, 6).toDF("y").localCheckpoint(true)
    try {
      val names = persistentNames()
      val cachedRdds = names.filter(_._2 != null).filter(_._2.contains("LocalTableScan"))
      assert(cachedRdds.nonEmpty,
        s"expected a plan-named cache RDD, got: $names")
      val ckRdd = ck.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
      assert(ckRdd.name == null, "localCheckpoint RDDs must stay anonymous")
    } finally {
      cached.unpersist(blocking = true)
      Checkpoints.drop(ck)
    }
  }

  test("sweepAnonymous drops checkpoint frames, spares Dataset caches") {
    val cached = Seq(1, 2, 3).toDF("x").persist()
    cached.count()
    val ck = Seq(4, 5, 6).toDF("y").localCheckpoint(true)
    val ckId = ck.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
    try {
      Checkpoints.sweepAnonymous(spark)
      // async unpersist: poll briefly for the block removal to land
      val deadline = System.nanoTime() + 5000000000L
      while (spark.sparkContext.getPersistentRDDs.contains(ckId) &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(!spark.sparkContext.getPersistentRDDs.contains(ckId),
        "checkpoint frame survived the sweep")
      assert(cached.storageLevel.useMemory, "named cache was swept")
      assert(cached.count() == 3) // still usable
    } finally cached.unpersist(blocking = true)
  }

  test("drop is a strict no-op on derived frames") {
    val ck = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    try {
      val derived = ck.select(col("x") + 1)
      Checkpoints.drop(derived) // must NOT unpersist the parent
      assert(ck.count() == 3) // parent blocks intact
    } finally Checkpoints.drop(ck)
  }

  test("withoutAqe scopes the conf, restores on exit and exception, nests") {
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key)
    Checkpoints.withoutAqe(spark) {
      assert(spark.conf.get(key) == "false")
      Checkpoints.withoutAqe(spark) { // loops call loops (MSF -> CC)
        assert(spark.conf.get(key) == "false")
      }
      assert(spark.conf.get(key) == "false")
    }
    assert(spark.conf.get(key) == before)
    intercept[RuntimeException] {
      Checkpoints.withoutAqe(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(key) == before)
  }

  test("withLoopShuffle sizes from state AND edge rows, restores, nests") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    spark.conf.set(key, "32")
    try {
      // floor: tiny tables clamp to 4
      Checkpoints.withLoopShuffle(spark, stateRows = 100L) {
        assert(spark.conf.get(key) == "4")
      }
      assert(spark.conf.get(key) == "32")
      // state-dominated: 186k/25k = 7
      Checkpoints.withLoopShuffle(spark, 186000L, 500000L) {
        assert(spark.conf.get(key) == "7")
      }
      // edge-dominated (dense graph): 5M/250k = 20 > V/25k
      Checkpoints.withLoopShuffle(spark, 100000L, 5000000L) {
        assert(spark.conf.get(key) == "20")
      }
      // session value is the upper bound — never grows the count
      Checkpoints.withLoopShuffle(spark, 10000000L, 100000000L) {
        assert(spark.conf.get(key) == "32")
      }
      // nesting (MSF -> distributed-CC fallback): inner prev is the
      // OUTER tuned value, so the inner scope can only shrink further
      // and the outer value is restored on inner exit
      Checkpoints.withLoopShuffle(spark, 186000L) { // tunes to 7
        Checkpoints.withLoopShuffle(spark, 50000L) { // min(7, 4) = 4
          assert(spark.conf.get(key) == "4")
        }
        assert(spark.conf.get(key) == "7")
      }
      assert(spark.conf.get(key) == "32")
      // restore on exception
      intercept[RuntimeException] {
        Checkpoints.withLoopShuffle(spark, 100L) {
          throw new RuntimeException("boom")
        }
      }
      assert(spark.conf.get(key) == "32")
    } finally spark.conf.set(key, before)
  }
}
