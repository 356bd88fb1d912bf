package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: below k the estimate is the exact distinct count") {
    val df = (1 to 200).map(i => ("g", s"u${i % 30}")).toDF("g", "v")
    val r = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64).collect()
    assert(r.length == 1 && r.head.getDouble(1) == 30.0)
  }

  test("kmvDistinct: at n >> k the estimate lands within sampling error") {
    // n = 5000 distinct; KMV k=256 has RSE ~ 1/sqrt(k-2) ~ 6.3%; allow 4σ
    val df = (1 to 5000).map(i => ("g", s"user$i")).toDF("g", "v")
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", k = 256)
      .collect().head.getDouble(1)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est too far")
  }

  test("kmvDistinct: insensitive to duplication and partitioning") {
    val base = (1 to 1000).map(i => ("g", s"id$i"))
    val dup = base ++ base ++ base
    val a = Sketches.kmvDistinct(base.toDF("g", "v").repartition(1),
      Seq("g"), "v", k = 64).collect().head.getDouble(1)
    val b = Sketches.kmvDistinct(dup.toDF("g", "v").repartition(17),
      Seq("g"), "v", k = 64).collect().head.getDouble(1)
    assert(a == b)
  }

  test("hllDistinct: estimate lands within sketch error at n >> m") {
    // m = 64 registers -> RSE ~ 1.04/8 = 13%; allow ~3σ
    val df = (1 to 5000).map(i => ("g", s"user$i")).toDF("g", "v")
    val est = Sketches.hllDistinct(df, Seq("g"), "v", p = 6)
      .collect().head.getDouble(1)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.4, s"estimate $est too far")
  }

  test("hllDistinct: small cardinality takes the linear-counting branch") {
    val df = (1 to 300).map(i => ("g", s"u${i % 10}")).toDF("g", "v")
    val est = Sketches.hllDistinct(df, Seq("g"), "v", p = 6)
      .collect().head.getDouble(1)
    // linear counting m·ln(m/V) is near-exact this far below m
    assert(math.abs(est - 10.0) < 3.0, s"estimate $est too far from 10")
  }

  test("hllDistinct: insensitive to duplication and partitioning (mergeable registers)") {
    val base = (1 to 1000).map(i => ("g", s"id$i"))
    val dup = base ++ base ++ base
    val a = Sketches.hllDistinct(base.toDF("g", "v").repartition(1),
      Seq("g"), "v", p = 6).collect().head.getDouble(1)
    val b = Sketches.hllDistinct(dup.toDF("g", "v").repartition(17),
      Seq("g"), "v", p = 6).collect().head.getDouble(1)
    assert(a == b)
  }

  test("hll registers update incrementally under Structured Streaming") {
    // the register table (group, bucket) -> max(rho) is ONE plain
    // streaming aggregation (the estimate fold stays downstream of the
    // sink — two chained stateful aggs would trip the global-watermark
    // correctness check); register equality implies estimate equality
    // since hllDistinct is a deterministic function of the registers
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val data = (1 to 800).map(i => ("g", s"user${i % 300}"))
    val mem = MemoryStream[(String, String)]
    val streamed = Sketches.hllRegisters(
      mem.toDF().toDF("g", "v"), Seq("g"), "v", p = 6)
    val q = streamed.writeStream.format("memory")
      .queryName("hll_test").outputMode("complete").start()
    try {
      mem.addData(data.take(300): _*)
      q.processAllAvailable()
      mem.addData(data.drop(300): _*)
      q.processAllAvailable()
      val live = spark.sql("select bucket, mreg from hll_test")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = Sketches.hllRegisters(data.toDF("g", "v"),
          Seq("g"), "v", p = 6)
        .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
      assert(live == batch)
    } finally q.stop()
  }

  test("histQuantiles: uniform values land near the true quantiles") {
    // values 0..999 in one group, width 10: p50 ~ 499.5 within one bin
    val df = (0 until 1000).map(v => ("g", v.toDouble)).toDF("g", "v")
    val r = Sketches.histQuantiles(df, Seq("g"), "v", binWidth = 10.0)
      .collect().head
    assert(math.abs(r.getDouble(1) - 499.5) <= 10.0) // p50
    assert(math.abs(r.getDouble(2) - 899.1) <= 10.0) // p90
    assert(math.abs(r.getDouble(3) - 989.01) <= 10.0) // p99
  }

  test("histQuantiles: insensitive to partitioning (mergeable bins)") {
    val vals = (1 to 500).map(i => ("g", (i * 37 % 211).toDouble))
    val a = Sketches.histQuantiles(vals.toDF("g", "v").repartition(1),
      Seq("g"), "v", binWidth = 5.0).collect().head.toSeq
    val b = Sketches.histQuantiles(vals.toDF("g", "v").repartition(13),
      Seq("g"), "v", binWidth = 5.0).collect().head.toSeq
    assert(a == b)
  }

  test("histQuantiles: single-value group interpolates to the value's bin") {
    val df = Seq(("g", 42.0)).toDF("g", "v")
    val r = Sketches.histQuantiles(df, Seq("g"), "v", binWidth = 10.0)
      .collect().head
    // n=1 -> pos=0, bin 4, est = 40.0 for every quantile
    assert(r.getDouble(1) == 40.0 && r.getDouble(2) == 40.0 && r.getDouble(3) == 40.0)
  }

  test("cmsCounts never under-counts and is exact without collisions") {
    // 20 values in a 4x256 sketch: collisions unlikely in any single
    // row, and the MIN over 4 rows needs a collision in EVERY row to
    // overestimate — assert the guaranteed bound est >= true, and
    // exactness here
    val df = (1 to 400).map(i => s"u${i % 20}").toDF("v")
    val r = Sketches.cmsCounts(df, "v", d = 4, w = 256)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.size == 20)
    assert(r.values.forall(_ >= 20L)) // true count per value = 20
    assert(r.values.forall(_ == 20L)) // no 4-row collision at this load
  }

  test("cmsCounts overestimates under heavy collision load but never under") {
    // 2000 distinct values into w=16: collisions guaranteed
    val df = (1 to 2000).map(i => s"k$i").toDF("v")
    val r = Sketches.cmsCounts(df, "v", d = 2, w = 16)
      .collect().map(_.getLong(1))
    assert(r.forall(_ >= 1L))
    assert(r.exists(_ > 1L))
  }

  test("hash32 stays in (0, 2^32] and is deterministic") {
    val df = (1 to 500).map(i => s"k$i").toDF("v")
      .select(Sketches.hash32(col("v")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 1L && h <= 4294967296L))
    assert(hs.distinct.length > 490) // 32-bit space: collisions ~0 at n=500
  }
}
