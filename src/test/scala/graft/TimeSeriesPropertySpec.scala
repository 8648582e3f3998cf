package graft

import graft.etl.Resample
import graft.operators.{FuzzyJoin, QCut}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized (seeded, deterministic) properties for the round-5
  * operator tier: each Spark operator is compared against a direct
  * single-threaded Scala reference on generated data — the same
  * oracle style PropertySpec uses for the extract layer.
  */
class TimeSeriesPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int = 8)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(977L + i)))
    }

  private val series: Gen[List[(String, Long, Option[Double])]] = for {
    nKeys <- Gen.chooseNum(1, 4)
    rows <- Gen.listOfN(60, for {
      k <- Gen.chooseNum(0, nKeys - 1).map("k" + _)
      t <- Gen.chooseNum(0L, 40L)
      v <- Gen.option(Gen.chooseNum(-50.0, 50.0))
    } yield (k, t, v))
  } yield rows.groupBy(r => (r._1, r._2)).values.map(_.head).toList

  test("ffill == scan-forward reference on random sparse series") {
    forAllSeeded(series) { rows =>
      val df = rows.toDF("k", "t", "v")
      val got = Resample.ffill(df, Seq("k"), Seq("t"), Seq("v"))
        .select("k", "t", "v").collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
      val want = rows.groupBy(_._1).flatMap { case (k, g) =>
        var lastSeen = Option.empty[Double]
        g.sortBy(_._2).map { case (_, t, v) =>
          if (v.isDefined) lastSeen = v
          (k, t, lastSeen)
        }
      }.toSet
      assert(got === want)
    }
  }

  test("interpolateLinear == direct reference on random sparse series") {
    forAllSeeded(series) { rows =>
      val df = rows.toDF("k", "t", "v")
      val got = Resample.interpolateLinear(df, Seq("k"), "t", "v")
        .select("k", "t", "v").collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
      val want = rows.groupBy(_._1).flatMap { case (k, g) =>
        val sorted = g.sortBy(_._2)
        val known = sorted.collect { case (_, t, Some(v)) => (t, v) }
        sorted.map { case (_, t, v) =>
          val filled = v.orElse {
            val prev = known.filter(_._1 < t).lastOption
            val next = known.find(_._1 > t)
            (prev, next) match {
              case (Some((pt, pv)), Some((nt, nv))) =>
                Some(pv + (nv - pv) * (t.toDouble - pt.toDouble) /
                  (nt.toDouble - pt.toDouble))
              case _ => None
            }
          }
          (k, t, filled)
        }
      }.toSet
      assert(got === want)
    }
  }

  test("qcut bucket boundaries respect the exact quantile thresholds") {
    val values: Gen[List[Double]] =
      Gen.listOfN(80, Gen.chooseNum(0, 200).map(_.toDouble))
    forAllSeeded(values) { vs =>
      val k = 5
      val got = QCut.qcut(vs.toDF("v"), col("v"), k, "b")
        .select("v", "b").collect()
        .map(r => (r.getDouble(0), r.getLong(1)))
      // reference thresholds: same linear interpolation percentile
      val sorted = vs.sorted.toIndexedSeq
      def pct(q: Double): Double = {
        val rank = q * (sorted.size - 1)
        val lo = rank.toInt
        if (lo + 1 >= sorted.size) sorted.last
        else sorted(lo) + (rank - lo) * (sorted(lo + 1) - sorted(lo))
      }
      val qs = (1 until k).map(i => pct(i.toDouble / k))
      got.foreach { case (v, b) =>
        val want = 1L + qs.count(v > _)
        assert(b === want, s"v=$v bucket $b != $want (thresholds $qs)")
      }
    }
  }

  test("fuzzy join == brute force on random word soup") {
    val strs: Gen[List[String]] = Gen.listOfN(12,
      Gen.chooseNum(1, 14).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    forAllSeeded(strs, n = 6) { ss =>
      val left = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val right = ss.reverse.zipWithIndex.map { case (s, i) => (100L + i, s) }
      val got = FuzzyJoin.join(left.toDF("lid", "ls"), "lid", "ls",
          right.toDF("rid", "rs"), "rid", "rs", maxDist = 2)
        .select("lid", "rid", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (li, ls) <- left if ls.nonEmpty
        (ri, rs) <- right if rs.nonEmpty
        d = lev(ls, rs) if d <= 2
      } yield (li, ri, d)).toSet
      assert(got === want)
    }
  }
}
