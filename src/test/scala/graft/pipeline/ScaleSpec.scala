package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join exactly") {
    // skew: one hot key with 1000 rows
    val large = ((1 to 1000).map(i => ("hot", i)) ++
      (1 to 50).map(i => (s"k$i", i))).toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
      .toDF("key", "w")
    val plain = large.join(small, Seq("key"))
      .orderBy("key", "v").collect().toSeq
    val salted = Scale.saltedJoin(large, small, "key", saltFactor = 8)
      .select("key", "v", "w").orderBy("key", "v").collect().toSeq
    assert(salted == plain)
  }

  test("salted join splits the hot key across salt partitions") {
    val large = (1 to 100).map(i => ("hot", i)).toDF("key", "v")
    val salts = large.withColumn("__salt",
      pmod(xxhash64(struct(col("key"), col("v"))), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1) // the hot key actually spreads
  }

  test("workspace-partitioned sink: dynamic overwrite replaces only the synced partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wsp").toFile.getAbsolutePath
    val v1 = Seq(("b1", "ws1", "old1"), ("b2", "ws2", "keep2"))
      .toDF("id", "workspace", "content")
    Scale.writeWorkspacePartitioned(v1, dir)
    // sync ws1: write ONLY ws1 rows; ws2's partition must survive
    val fresh = Seq(("b9", "ws1", "new1")).toDF("id", "workspace", "content")
    Scale.writeWorkspacePartitioned(fresh, dir)
    val back = spark.read.parquet(dir)
      .select("id", "workspace", "content")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(back == Set(("b9", "ws1", "new1"), ("b2", "ws2", "keep2")))
    // workspace-scoped reads prune at the partition level
    val pruned = spark.read.parquet(dir).filter(col("workspace") === "ws2")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(workspace"), scan)
  }

  test("bucketed tables join without an exchange") {
    val e = Seq(("a", "b", "calls"), ("b", "c", "calls"))
      .toDF("src", "dst", "edge_type")
    Scale.writeEdgeIndex(e, "edges_t", numBuckets = 4)
    val bySrc = spark.table("edges_t_by_src")
    val joined = bySrc.as("l").join(spark.table("edges_t_by_src").as("r"),
      col("l.src") === col("r.src"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides bucketed by src: no ShuffleExchange on the join keys
    assert(!plan.contains("Exchange hashpartitioning"))
    assert(joined.count() == 2)
    spark.sql("DROP TABLE IF EXISTS edges_t_by_src")
    spark.sql("DROP TABLE IF EXISTS edges_t_by_dst")
  }

  test("zValue matches a reference Morton interleave and preserves locality") {
    import spark.implicits._
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val pts = for (a <- 0L to 40L by 7L; b <- 0L to 40L by 7L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select($"a", $"b", Scale.zValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == morton(a, b, 16), s"($a,$b)") }
    // z-sorted order interleaves dimensions: the max z within the low
    // quadrant (both dims < 32) is below the min z where both dims >= 32
    val lowQuad = got.filter { case (a, b, _) => a < 32 && b < 32 }.map(_._3)
    val highQuad = got.filter { case (a, b, _) => a >= 32 && b >= 32 }.map(_._3)
    assert(lowQuad.max < highQuad.min)
    // round-trip through a z-ordered parquet write
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    val path = new java.io.File(dir, "t").getAbsolutePath
    Scale.writeZOrdered(pts.toDF("a", "b"), path, "a", "b")
    assert(spark.read.parquet(path).count() == pts.size)
  }

  test("bloomSemiJoin: no false negatives, exact match count, partition-stable") {
    val fact = (1L to 500L).map(k => (k, s"row$k")).toDF("fk", "payload")
    val dim = Seq(5L, 50L, 500L, 999L).toDF("dk2").select($"dk2".as("dk"))
    val r = Scale.bloomSemiJoin(fact, "fk", dim, "dk",
      mBits = 4096, nHashes = 3).collect().head
    val (nFact, nPass, nMatch, nFp, nMissed) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nFact == 500L && nMatch == 3L) // 999 not in fact
    assert(nMissed == 0L) // a Bloom filter can never reject a member
    assert(nPass == nMatch + nFp && nPass >= nMatch)
    // at 4 keys in 4096 bits false positives should be absent
    assert(nFp == 0L, s"unexpected false positives: $nFp")
    // deterministic on any partitioning
    val r2 = Scale.bloomSemiJoin(fact.repartition(13), "fk",
      dim.repartition(3), "dk", mBits = 4096, nHashes = 3).collect().head
    assert(r.toSeq == r2.toSeq)
  }
}
