package graft

import graft.etl.{Load, ZOrder}
import org.apache.spark.sql.functions._

/** Z-order clustering: z-value mechanics and the property the layout
  * exists for — a two-column box predicate prunes (by parquet-footer
  * min/max logic) far more z-ordered files than single-column-sorted
  * files.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: corners and midpoints land in order") {
    val df = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
      .toDF("x", "y")
    val bounds = Seq((0.0, 1.0), (0.0, 1.0))
    val zs = df.select(ZOrder.zValue(Seq(col("x"), col("y")), bounds, 2))
      .as[Long].collect().toSeq
    // 2 bits/col: buckets are 0 or 3; interleave (x bit i -> 2i, y -> 2i+1)
    // (0,0)=0; (0,3)=b1010=10; (3,0)=b0101=5; (3,3)=b1111=15
    assert(zs === Seq(0L, 10L, 5L, 15L))
  }

  test("nulls, NaN, and out-of-bounds values clamp instead of crashing") {
    // ANSI mode throws on cast(NaN/overflow as long) — the clamp
    // must happen in double space or one rogue row kills the rewrite
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (null, 5.0), (-100.0, 5.0), (100.0, 5.0),
      (Double.NaN, 5.0), (1e300, 5.0), (-1e300, 5.0)).toDF("x", "y")
    val zs = df.select(ZOrder.zValue(Seq(col("x"), col("y")),
        Seq((0.0, 10.0), (0.0, 10.0)), 4)).as[Long].collect()
    assert(zs.length === 6 && zs.forall(z => z >= 0L))
  }

  test("empty and all-null/NaN inputs degenerate instead of crashing") {
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    assert(ZOrder.columnBounds(empty, Seq("x", "y")) === Seq((0.0, 1.0), (0.0, 1.0)))
    val allBad = Seq[(java.lang.Double, java.lang.Double)](
      (null, Double.NaN), (Double.NaN, null)).toDF("x", "y")
    assert(ZOrder.columnBounds(allBad, Seq("x", "y")) === Seq((0.0, 1.0), (0.0, 1.0)))
    val dir = tmpDir("zempty") + "/t"
    ZOrder.writeZOrdered(spark, empty, Seq("x", "y"), bits = 4, numFiles = 2, dir)
    assert(spark.read.parquet(dir).count() === 0L)
  }

  test("a 2D box predicate prunes z-ordered files better than 1D-sorted") {
    val rnd = new scala.util.Random(11)
    val data = (1 to 20000).map(_ => (rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("x", "y")
    val nFiles = 32
    val zDir = tmpDir("zord") + "/t"
    val xDir = tmpDir("xsort") + "/t"
    ZOrder.writeZOrdered(spark, data, Seq("x", "y"), bits = 8, nFiles, zDir)
    Load.writeClustered(spark, data, "x", nFiles, xDir)
    // per-file [min,max] of x and y — what parquet footer pruning sees
    def fileRanges(dir: String): Seq[((Double, Double), (Double, Double))] = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      files.toSeq.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        ((r.getDouble(0), r.getDouble(1)), (r.getDouble(2), r.getDouble(3)))
      }
    }
    def mightMatch(dir: String, xr: (Double, Double), yr: (Double, Double)): Int =
      fileRanges(dir).count { case ((xlo, xhi), (ylo, yhi)) =>
        xlo <= xr._2 && xhi >= xr._1 && ylo <= yr._2 && yhi >= yr._1
      }
    // predicate on the NON-clustered dimension: the 1D layout prunes
    // nothing (every file spans all of y); z-order confines y too
    val full = (0.0, 100.0)
    val zHitY = mightMatch(zDir, full, (40.0, 50.0))
    val xHitY = mightMatch(xDir, full, (40.0, 50.0))
    assert(xHitY === nFiles, "1D layout should be blind to the y predicate")
    assert(zHitY < nFiles / 2,
      s"z-order must confine the y dimension (scans $zHitY of $nFiles)")
    // a 2D box: z-order stays near the box's area share; the 1D layout
    // pays its full x-slice — z must never be worse
    val zHitBox = mightMatch(zDir, (40.0, 50.0), (40.0, 50.0))
    val xHitBox = mightMatch(xDir, (40.0, 50.0), (40.0, 50.0))
    assert(zHitBox <= xHitBox,
      s"z-order lost to the 1D layout on its own box (z=$zHitBox, x=$xHitBox)")
    assert(zHitBox <= nFiles / 4, s"box scans $zHitBox of $nFiles files")
    // both layouts hold every row
    assert(spark.read.parquet(zDir).count() === 20000L)
  }
}
