package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mixture resampling: exact per-stratum counts, deterministic epoch
  * membership, partitioning-independence.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // 4 strata x 10 rows; ids disjoint across strata
  private lazy val docs = (0 until 40).map { i =>
    (i.toLong, s"s${i / 10}")
  }.toDF("id", "src")

  test("mixture hits the exact per-stratum targets, up- and down-sampled") {
    // weights 6:3:1 over s0..s2, budget 100 -> want 60/30/10 from 10
    // rows each: s0 = 6 full epochs, s1 = 3, s2 = 1; s3 dropped.
    val out = Sampling.mixture(docs, "id", "src",
      targets = Seq("s0" -> 6, "s1" -> 3, "s2" -> 1), budgetRows = 100L)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("s0" -> 60L, "s1" -> 30L, "s2" -> 10L))
    // every input row of a kept stratum appears exactly `full` times
    // when want divides evenly
    val perRow = out.filter(col("src") === "s0").groupBy("id").count()
      .collect().map(_.getLong(1)).toSet
    assert(perRow == Set(6L))
    // epochs are 1..reps per row
    val eps = out.filter(col("src") === "s1").groupBy("id")
      .agg(min("epoch").as("lo"), max("epoch").as("hi"), count(lit(1)).as("n"))
      .collect()
    eps.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == r.getLong(3))
    }
  }

  test("mixture fractional epoch selects a deterministic subset") {
    // weight 1, budget 25 over 10+30 rows of two strata: s0 wants
    // (25*1) div 2 = 12 from 10 rows -> 1 full epoch + 2 extras;
    // s1 wants 12 from 10 -> same. Extra-epoch rows are the hash-rank
    // leaders, stable across partitionings.
    val two = docs.filter(col("src").isin("s0", "s1"))
    val a = Sampling.mixture(two, "id", "src",
      targets = Seq("s0" -> 1, "s1" -> 1), budgetRows = 25L)
      .orderBy("id", "epoch").collect().toSeq
    val b = Sampling.mixture(two.repartition(7), "id", "src",
      targets = Seq("s0" -> 1, "s1" -> 1), budgetRows = 25L)
      .orderBy("id", "epoch").collect().toSeq
    assert(a == b)
    assert(a.count(_.getString(1) == "s0") == 12)
    assert(a.count(_.getString(1) == "s1") == 12)
    // exactly two s0 rows carry epoch 2, none carry epoch 3
    val s0eps = a.filter(_.getString(1) == "s0").map(_.getLong(2))
    assert(s0eps.count(_ == 2L) == 2 && !s0eps.contains(3L))
  }

  test("mixture rejects empty or all-zero weights") {
    intercept[IllegalArgumentException] {
      Sampling.mixture(docs, "id", "src", targets = Seq("s0" -> 0),
        budgetRows = 10L)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixture(docs, "id", "src", targets = Seq(), budgetRows = 10L)
    }
  }

  test("weightedSample equals the window formulation; k >= n returns all") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    val rows = (1L to 300L).map { i =>
      (i, s"s${i % 3}", 1L + rnd.nextInt(400).toLong)
    }.toDF("doc_id", "src", "w").repartition(7)
    val got = Sampling.weightedSample(rows, "doc_id", "src", col("w"), 10)
      .orderBy("src", "pos").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val u = (Sampling.hashOrder(col("doc_id")) + 1L).cast("double") / 4294967296.0
    val key = round(log(u) / greatest(col("w"), lit(1L)).cast("double"), 10)
    val win = Window.partitionBy("src").orderBy(col("__key").desc, col("doc_id"))
    val want = rows.withColumn("__key", key)
      .withColumn("rk", row_number().over(win)).filter(col("rk") <= 10)
      .select(col("src"), (col("rk") - 1).cast("int").as("pos"), col("doc_id"))
      .orderBy("src", "pos").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want)
    // k >= group size degenerates to a full weighted ORDERING per stratum
    val all = Sampling.weightedSample(rows, "doc_id", "src", col("w"), 1000)
    assert(all.count() == 300)
  }

  test("globalShuffle is a contiguous 1..N permutation, stable across partitionings") {
    val ids = (0L until 200L).map(i => Tuple1(i * 7 % 1009)).toDF("id")
    val a = Sampling.globalShuffle(ids, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.toSeq.sorted == (1L to 200L))       // contiguous ranks
    assert(a.keySet == ids.collect().map(_.getLong(0)).toSet)
    // equals the single global window it replaces, on any partitioning
    val b = Sampling.globalShuffle(ids.repartition(7), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    val want = ids.collect().map(_.getLong(0))
      .sortBy(id => ((Math.abs(id % 1000003L) * 2654435761L) % 4294967296L, id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(a == want)
  }

  test("importanceScores: target-like docs outscore off-target; mean is exact") {
    // target slice speaks {alpha beta}; off-target speaks {gamma delta}.
    // A new doc made of target words must outscore one of off-target
    // words, with the mixed doc in between.
    val docs = Seq(
      (1L, "en", "alpha beta alpha beta"),
      (2L, "en", "beta alpha beta alpha"),
      (3L, "xx", "gamma delta gamma delta"),
      (4L, "xx", "alpha beta alpha beta"),   // target-like, off-slice
      (5L, "xx", "alpha delta"))             // mixed
      .toDF("doc_id", "lang", "text")
    val r = Sampling.importanceScores(docs, "doc_id", "text",
        targetPred = col("lang") === "en")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(r(4L)._2 > r(3L)._2, "target-vocabulary doc outscores off-target")
    assert(r(5L)._2 > r(3L)._2 && r(5L)._2 < r(4L)._2, "mixed in between")
    assert(r(1L) == r(2L) && r(1L) == r(4L), "same bag of words, same score")
    // exact mean check (no bucket collisions among these 4 words):
    // alpha: all=7 (2+2+2+1), tgt=4 -> w = (4+1)*1e6 div (7+1) = 625000
    // delta: all=3, tgt=0        -> w = (0+1)*1e6 div (3+1) = 250000
    // doc 5 = (alpha delta): importance = (625000+250000) div 2 = 437500
    assert(r(5L) == (2L, 437500L))
    // deterministic across partitionings
    val a = Sampling.importanceScores(docs.repartition(7), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Sampling.importanceScores(docs.repartition(1), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
