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
}
