package graft

import graft.etl.{ExplodeItems, Extract, Validate}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties (SURVEY.md §5.3): split∘explode round-trip,
  * quarantine partition invariant, extraction totals. Uses a seeded
  * manual sampler (the scalatest-scalacheck bridge isn't in the
  * offline cache) so runs are deterministic.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int = 15)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val word = Gen.oneOf("Solo", "Duo", "latte", "croffle", "x2", "Mild")
  private val item = Gen.nonEmptyListOf(word).map(_.mkString(" "))
  private val itemsList = Gen.listOfN(5, item)

  test("explode(split(join(xs))) recovers the non-empty trimmed items") {
    forAllSeeded(itemsList) { items =>
      val clean = items.map(_.trim).filter(_.nonEmpty)
      val df = Seq(Tuple1(clean.mkString(","))).toDF("Products")
      val out = ExplodeItems.explodeItems(df, "Products", "item")
        .select("item").as[String].collect().toSeq
      assert(out === clean)
    }
  }

  test("quarantine split is a partition for any data") {
    forAllSeeded(Gen.listOfN(40, Gen.chooseNum(-100.0, 100.0)), n = 5) { amounts =>
      val df = amounts.zipWithIndex.map { case (a, i) => (i.toString, a) }
        .toDF("id", "amt")
      val valid = !coalesce(col("amt") < 0, lit(false))
      val s = Validate.split(df, valid)
      assert(s.clean.count() + s.quarantine.count() === amounts.length.toLong)
      assert(s.clean.filter(col("amt") < 0).count() === 0)
      assert(s.quarantine.filter(col("amt") >= 0).count() === 0)
    }
  }

  test("quantity extraction: default 1.0 exactly when no x<digits> token") {
    forAllSeeded(itemsList, n = 10) { items =>
      val df = items.toDF("item")
        .select(col("item"), Extract.quantity(col("item")).as("q"))
      val rows = df.as[(String, Double)].collect()
      rows.foreach { case (s, q) =>
        // lowercase x only — the reference's extract has no re.I flag
        if ("x\\s*\\d+".r.findFirstIn(s).isDefined) assert(q >= 1.0)
        else assert(q === 1.0)
      }
    }
  }

  test("wordGrams == naive sliding-window join, for any doc and n") {
    // the zip_with chain must be byte-identical to the obvious
    // definition — order and duplicates preserved, size-n+1 grams,
    // empty when the doc is shorter than n
    val doc = Gen.listOfN(12, Gen.oneOf("a", "bb", "ccc", "", "a", "bb"))
      .map(_.mkString(" "))
    forAllSeeded(Gen.zip(doc, Gen.chooseNum(1, 7)), n = 25) { case (text, n) =>
      val got = Seq(Tuple1(text)).toDF("text")
        .select(graft.llm.TextStats.wordGrams(split(col("text"), " "), n).as("g"))
        .as[Seq[String]].collect().head
      val toks = text.split(" ", -1).toSeq
      val expected =
        if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
      assert(got === expected, s"n=$n text='$text'")
    }
  }

  test("q135 vocab cutoff is deterministic under count ties at the boundary") {
    // 1500 distinct tokens, ALL with corpus count 1 — the worst tie
    // case for a top-1000 cutoff. The (count desc, token asc) total
    // order must pick exactly the lexicographically smallest 1000,
    // independent of partitioning, so the registered query's output
    // is closed-form predictable and identical across runs.
    val dir = tmpDir("q135ties")
    val docs = (0 until 1500).map { i =>
      val tok = f"t$i%04d"
      (i.toLong, tok, "en", "synthetic", tok.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // two different physical layouts of the same logical table
    docs.repartition(7).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r1 = SparkEntry.queries("q135_vocab_coverage")(spark, dir).collect()
    docs.repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r2 = SparkEntry.queries("q135_vocab_coverage")(spark, dir).collect()
    assert(r1.toSeq === r2.toSeq, "cutoff changed with physical layout")
    assert(r1.length === 1)
    val r = r1.head
    // vocab = t0000..t0999; docs 1000..1499 are fully OOV → low
    assert(r.getAs[Long]("n_docs") === 1500L)
    assert(r.getAs[Long]("total_tokens") === 1500L)
    assert(r.getAs[Long]("in_vocab_tokens") === 1000L)
    assert(r.getAs[Long]("n_low") === 500L)
    assert(r.getAs[Double]("coverage") === 0.666667)
  }

  test("StatsIndex pruned read ≡ full filter for arbitrary data and bounds") {
    // the no-false-negatives contract, property-tested over random
    // key sets (duplicates, negatives, skew) and random/inverted/
    // out-of-range bounds — not just the tidy clustered layouts the
    // unit tests use
    val keysGen = Gen.listOfN(300, Gen.chooseNum(-500L, 500L))
    val boundsGen = Gen.zip(Gen.chooseNum(-600L, 600L), Gen.chooseNum(-600L, 600L))
    forAllSeeded(Gen.zip(keysGen, boundsGen), n = 6) { case (keys, (a, b)) =>
      val d = tmpDir("dsk_prop")
      // unclustered write: files get overlapping, unsorted ranges —
      // the adversarial layout for min/max pruning
      keys.toDF("k").repartition(5).write.parquet(s"$d/t")
      val stats = graft.etl.StatsIndex.build(spark, s"$d/t", Seq("k"))
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val (pruned, nRead, nTotal) = graft.etl.StatsIndex.prunedRead(
        spark, s"$d/t", stats, "k", Some(lit(lo)), Some(lit(hi)))
      val got = pruned.select("k").as[Long].collect().sorted
      val want = keys.filter(k => k >= lo && k <= hi).sorted.toArray
      assert(got === want, s"bounds [$lo,$hi]")
      assert(nRead <= nTotal && nTotal === 5)
    }
  }

  test("SigDedup band join ≡ all-pairs Hamming filter on random signatures") {
    // the pigeonhole guarantee, property-tested over ADVERSARIAL
    // random 64-bit signatures (not just decoded corpora): for any
    // signature set and any maxDist ≤ 7, the banded join returns
    // exactly the all-pairs result — no false negatives from the
    // blocking, no false positives past the verify
    val sigGen = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(0L, 0xFFFFFFFFL), Gen.chooseNum(0L, 0xFFFFFFFFL)))
    forAllSeeded(Gen.zip(sigGen, Gen.chooseNum(0, 7)), n = 8) { case (sigs, d) =>
      // plant a few near pairs so the filter isn't vacuously empty:
      // copy every 5th signature with the low bit flipped
      val planted = sigs.zipWithIndex.collect {
        case ((hi, lo), i) if i % 5 == 0 => (hi, lo ^ 1L)
      }
      val rows = (sigs ++ planted).zipWithIndex.map {
        case ((hi, lo), i) => (i.toLong, hi, lo)
      }
      val df = rows.toDF("id", "hi", "lo")
      val got = graft.llm.SigDedup.bandedNearDups(df, "id", "hi", "lo", d)
        .select(col("id_i"), col("id_j"), col("dist").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (i, h1, l1) <- rows; (j, h2, l2) <- rows if i < j
        dist = java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
        if dist <= d
      } yield (i, j, dist.toLong)).toSet
      assert(got === want, s"maxDist=$d")
    }
  }
}
