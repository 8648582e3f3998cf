package graft

import graft.functions.{Kmv, KmvSketch}
import org.apache.spark.sql.functions._

/** KMV/theta distinct sketch: exactness when undersampled, accuracy
  * when sampling, set-operation estimators, and the determinism that
  * justifies oracle flags (merge-order invariance).
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 256

  test("undersampled sketch is exact (size < k keeps every hash)") {
    val df = (1 to 100).map(i => s"u$i").toDF("key")
    val est = df.agg(Kmv.estimate(Kmv.sketch(col("key"), K), K).as("e"))
      .as[Double].head()
    assert(est === 100.0)
  }

  test("estimate within 5 RSE on a sampled population") {
    val n = 20000
    val df = (1 to n).map(i => s"user-$i").toDF("key")
    val est = df.agg(Kmv.estimate(Kmv.sketch(col("key"), K), K).as("e"))
      .as[Double].head()
    val rse = 1.0 / math.sqrt(K - 2.0)
    assert(math.abs(est - n) <= 5 * rse * n, s"est=$est n=$n")
  }

  test("sketch is partition-order invariant (bit-stable)") {
    val df = (1 to 5000).map(i => s"k$i").toDF("key")
    val a = df.repartition(1).agg(Kmv.sketch(col("key"), K)).head().getSeq[Long](0)
    val b = df.repartition(13, col("key")).agg(Kmv.sketch(col("key"), K))
      .head().getSeq[Long](0)
    assert(a === b)
  }

  test("duplicates don't move the estimate (distinct semantics)") {
    val once = (1 to 3000).map(i => s"k$i").toDF("key")
    val dup = once.union(once).union(once)
    val e1 = once.agg(Kmv.estimate(Kmv.sketch(col("key"), K), K)).head().getDouble(0)
    val e3 = dup.agg(Kmv.estimate(Kmv.sketch(col("key"), K), K)).head().getDouble(0)
    assert(e1 === e3)
  }

  test("union and intersection estimates track planted overlap") {
    // A = 1..12000, B = 8001..20000 → |A|=12k |B|=12k |A∩B|=4k |A∪B|=20k
    val a = (1 to 12000).map(i => ("a", s"u$i"))
    val b = (8001 to 20000).map(i => ("b", s"u$i"))
    val df = (a ++ b).toDF("side", "key")
    val row = df.agg(
      Kmv.sketchIf(col("side") === "a", col("key"), K).as("sa"),
      Kmv.sketchIf(col("side") === "b", col("key"), K).as("sb"))
      .select(
        Kmv.unionEstimate(col("sa"), col("sb"), K).as("u"),
        Kmv.intersectEstimate(col("sa"), col("sb"), K).as("i"))
      .head()
    val rse = 1.0 / math.sqrt(K - 2.0)
    assert(math.abs(row.getDouble(0) - 20000) <= 5 * rse * 20000)
    // intersection error scales with the union magnitude
    assert(math.abs(row.getDouble(1) - 4000) <= 5 * rse * 20000)
  }

  test("sketchIf skips non-matching rows entirely") {
    val df = (1 to 50).map(i => (i % 2 == 0, s"k$i")).toDF("keep", "key")
    val sk = df.agg(Kmv.sketchIf(col("keep"), col("key"), K)).head().getSeq[Long](0)
    assert(sk.size === 25) // only the 25 keep=true keys, no seed-hash pollution
  }

  test("null keys are skipped by sketch (no phantom seed-hash distinct)") {
    val df = (1 to 40).map(i => if (i % 4 == 0) None else Some(s"k$i"))
      .toDF("key")
    val est = df.agg(Kmv.estimate(Kmv.sketch(col("key"), K), K)).head().getDouble(0)
    assert(est === 30.0) // the 10 nulls contribute nothing
  }

  test("property: 0 <= intersectEstimate <= min(estimates) across overlap fractions") {
    // adversarial overlaps: disjoint, tiny, half, contained, identical —
    // at sizes that straddle the undersampled/sampled boundary
    val cases = Seq(
      (2000, 2000, 0),      // disjoint, both sampled
      (20000, 20000, 7),    // near-disjoint large (the lucky-hash case
                            // the clamp exists for)
      (12000, 12000, 4000), // planted half-overlap
      (30000, 300, 300),    // b fully contained in a (est must be ~|b|)
      (9000, 9000, 9000),   // identical sets
      (100, 100, 50))       // both undersampled → exact path
    for ((na, nb, novr) <- cases) {
      val a = (1 to na).map(i => ("a", s"u$i"))
      val b = (na - novr + 1 to na - novr + nb).map(i => ("b", s"u$i"))
      val row = (a ++ b).toDF("side", "key").agg(
        Kmv.sketchIf(col("side") === "a", col("key"), K).as("sa"),
        Kmv.sketchIf(col("side") === "b", col("key"), K).as("sb"))
        .select(
          Kmv.intersectEstimate(col("sa"), col("sb"), K).as("i"),
          Kmv.estimate(col("sa"), K).as("ea"),
          Kmv.estimate(col("sb"), K).as("eb"))
        .head()
      val (i, ea, eb) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(i >= 0.0, s"case ($na,$nb,$novr): est $i < 0")
      assert(i <= math.min(ea, eb) + 1e-9,
        s"case ($na,$nb,$novr): est $i > min($ea, $eb)")
    }
  }

  test("boundary convention: a common hash equal to the union θ is excluded") {
    // Build sketches as literal arrays so the k-th union element is a
    // COMMON value exactly at the boundary: a = {1..k}·s, b =
    // {k..2k-1}·s in flipped-hash space (s = 2^40 keeps every frac()
    // far from double underflow, like real xxhash64 output). union's
    // k-th element = k·s, common = {k·s}; the strictly-below filter
    // must count zero ⇒ estimate 0 (the clamped path can't resurrect
    // it).
    val k = 16
    val s = 1L << 40
    val aArr = array((1 to k).map(i => lit(Long.MinValue + i * s)): _*)
    val bArr = array((k to 2 * k - 1).map(i => lit(Long.MinValue + i * s)): _*)
    val est = spark.range(1)
      .select(Kmv.intersectEstimate(aArr, bArr, k).as("i"))
      .head().getDouble(0)
    assert(est === 0.0, s"boundary hash leaked into the estimate: $est")
  }

  test("unionSketch equals sketching the concatenated stream") {
    val a = (1 to 9000).map(i => s"x$i").toDF("key")
    val b = (5000 to 14000).map(i => s"x$i").toDF("key")
    val sa = a.agg(Kmv.sketch(col("key"), K).as("s"))
    val sb = b.agg(Kmv.sketch(col("key"), K).as("s"))
    val merged = sa.crossJoin(sb.withColumnRenamed("s", "t"))
      .select(Kmv.unionSketch(col("s"), col("t"), K).as("u"))
      .head().getSeq[Long](0)
    val direct = a.union(b).agg(Kmv.sketch(col("key"), K))
      .head().getSeq[Long](0)
    assert(merged === direct)
  }
}
