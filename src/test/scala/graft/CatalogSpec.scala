package graft

import graft.etl.{Catalog, Snapshots}
import org.apache.spark.sql.functions._

/** Cross-table transactional catalog (etl/Catalog): atomic pin
  * flips, consistent star reads under in-flight table commits,
  * OCC refusal, and cross-table time travel.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fact(n: Int) =
    (1 to n).map(i => (i.toLong, i % 3)).toDF("k", "grp")
  private def dim(n: Int) =
    (1 to n).map(i => (i.toLong, s"d$i")).toDF("k", "name")

  test("pins flip atomically; in-flight table commits stay invisible") {
    val base = tmpDir("cat_atomic")
    val (f, d, c) = (s"$base/f", s"$base/d", s"$base/cat")
    Snapshots.commit(spark, fact(10), f)
    Snapshots.commit(spark, dim(10), d)
    Catalog.commit(spark, c, Map(
      "fact" -> Catalog.Pin(f, 1L), "dim" -> Catalog.Pin(d, 1L)))
    // a coordinated write lands BOTH tables, then pins them together
    Snapshots.commit(spark, fact(20), f)
    Snapshots.commit(spark, dim(20), d)
    // before the catalog publish, readers still see the v1 pair
    assert(Catalog.read(spark, c, "fact").count() === 10)
    assert(Catalog.read(spark, c, "dim").count() === 10)
    Catalog.commit(spark, c, Map(
      "fact" -> Catalog.Pin(f, 2L), "dim" -> Catalog.Pin(d, 2L)))
    assert(Catalog.read(spark, c, "fact").count() === 20)
    assert(Catalog.read(spark, c, "dim").count() === 20)
    // an UNPINNED fact-only commit is invisible through the catalog
    Snapshots.commit(spark, fact(35), f)
    assert(Catalog.read(spark, c, "fact").count() === 20)
    // ... and the consistent join carries no orphan facts, while the
    // raw latest fact would orphan 15 keys against the pinned dim
    val orphans = Catalog.read(spark, c, "fact")
      .join(Catalog.read(spark, c, "dim"), Seq("k"), "left_anti").count()
    assert(orphans === 0)
    val rawOrphans = Snapshots.read(spark, f)
      .join(Catalog.read(spark, c, "dim"), Seq("k"), "left_anti").count()
    assert(rawOrphans === 15)
  }

  test("cross-table time travel: one fetch restores the whole pin set") {
    val base = tmpDir("cat_tt")
    val (f, d, c) = (s"$base/f", s"$base/d", s"$base/cat")
    Snapshots.commit(spark, fact(5), f)
    Snapshots.commit(spark, dim(5), d)
    Catalog.commit(spark, c, Map(
      "fact" -> Catalog.Pin(f, 1L), "dim" -> Catalog.Pin(d, 1L)))
    Snapshots.commit(spark, fact(9), f)
    Snapshots.commit(spark, dim(9), d)
    Catalog.commit(spark, c, Map(
      "fact" -> Catalog.Pin(f, 2L), "dim" -> Catalog.Pin(d, 2L)))
    assert(Catalog.read(spark, c, "fact", Some(1L)).count() === 5)
    assert(Catalog.read(spark, c, "dim", Some(1L)).count() === 5)
    assert(Catalog.pins(spark, c, Some(2L))("fact").version === 2L)
    assert(Catalog.pinnedVersions(spark, c, f) === Set(1L, 2L))
  }

  test("expectedLatest refuses a lost update; retry from fresh pins succeeds") {
    val base = tmpDir("cat_occ")
    val (f, c) = (s"$base/f", s"$base/cat")
    Snapshots.commit(spark, fact(5), f)
    Catalog.commit(spark, c, Map("fact" -> Catalog.Pin(f, 1L)))
    Snapshots.commit(spark, fact(6), f)
    // a concurrent catalog writer lands first
    Catalog.commit(spark, c, Map("fact" -> Catalog.Pin(f, 2L)))
    val err = intercept[IllegalArgumentException] {
      Catalog.commit(spark, c, Map("fact" -> Catalog.Pin(f, 1L)),
        expectedLatest = Some(1L))
    }
    assert(err.getMessage.contains("advanced"))
    // the stale writer re-reads and retries at the fresh head
    val v3 = Catalog.commit(spark, c, Map("fact" -> Catalog.Pin(f, 2L)),
      expectedLatest = Some(2L))
    assert(v3 === 3L)
  }

  test("a pin at an uncommitted version refuses loudly") {
    val base = tmpDir("cat_missing")
    val (f, c) = (s"$base/f", s"$base/cat")
    Snapshots.commit(spark, fact(3), f)
    val err = intercept[IllegalArgumentException] {
      Catalog.commit(spark, c, Map("fact" -> Catalog.Pin(f, 7L)))
    }
    assert(err.getMessage.contains("no committed version 7"))
    val err2 = intercept[IllegalArgumentException] {
      Catalog.pins(spark, c)
    }
    assert(err2.getMessage.contains("no committed catalog versions"))
  }

  test("pin names and roots with quotes/backslashes round-trip") {
    val base = tmpDir("cat_esc")
    val (f, c) = (s"$base/f", s"$base/cat")
    Snapshots.commit(spark, fact(3), f)
    val weird = """we"ird\tbl"""
    Catalog.commit(spark, c, Map(weird -> Catalog.Pin(f, 1L)))
    val pins = Catalog.pins(spark, c)
    assert(pins.keySet === Set(weird), s"round-trip corrupted: ${pins.keySet}")
    assert(pins(weird) === Catalog.Pin(f, 1L))
    assert(Catalog.read(spark, c, weird).count() === 3L)
  }

  test("writeAndPin: stage N commits, flip the pin set atomically, merge over current") {
    val base = tmpDir("cat_wap")
    val (f, d, c) = (s"$base/f", s"$base/d", s"$base/cat")
    // seed: an existing unrelated pin the transaction must not lose
    Snapshots.commit(spark, fact(5), f)
    Catalog.commit(spark, c, Map("fact" -> Catalog.Pin(f, 1L)))
    val cv = Catalog.writeAndPin(spark, c) {
      val fv = Snapshots.commit(spark, fact(20), f)
      val dv = Snapshots.commit(spark, dim(20), d)
      Map("fact" -> Catalog.Pin(f, fv), "dim" -> Catalog.Pin(d, dv))
    }
    assert(cv === 2L)
    val pins = Catalog.pins(spark, c)
    assert(pins === Map("fact" -> Catalog.Pin(f, 2L),
      "dim" -> Catalog.Pin(d, 1L)))
    assert(Catalog.read(spark, c, "fact").count() === 20L)
    // a failing stage pins NOTHING (its committed versions stay
    // durable but invisible)
    intercept[RuntimeException] {
      Catalog.writeAndPin(spark, c) {
        Snapshots.commit(spark, fact(30), f)
        throw new RuntimeException("stage boom")
      }
    }
    assert(Catalog.pins(spark, c)("fact") === Catalog.Pin(f, 2L))
    assert(Snapshots.latestVersion(spark, f) === Some(3L),
      "the staged table commit is durable, merely unpinned")
  }

  test("writeAndPin: concurrent transactions lose no pins and tear no sets") {
    val base = tmpDir("cat_wap_race")
    val (f, d, c) = (s"$base/f", s"$base/d", s"$base/cat")
    Snapshots.commit(spark, fact(1), f)
    Snapshots.commit(spark, dim(1), d)
    Catalog.commit(spark, c, Map(
      "fact" -> Catalog.Pin(f, 1L), "dim" -> Catalog.Pin(d, 1L)))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def writer(name: String, root: String, mk: Int => org.apache.spark.sql.DataFrame) =
      new Thread(() => try {
        barrier.await()
        (1 to 3).foreach { i =>
          Catalog.writeAndPin(spark, c) {
            val v = Snapshots.commit(spark, mk(i), root)
            Map(name -> Catalog.Pin(root, v))
          }
        }
      } catch { case t: Throwable => errors.add(t) })
    val t1 = writer("fact", f, i => fact(10 * i))
    val t2 = writer("dim", d, i => dim(10 * i))
    t1.start(); t2.start(); t1.join(180000); t2.join(180000)
    assert(errors.isEmpty, s"failed: ${errors.peek()}")
    val pins = Catalog.pins(spark, c)
    // neither writer's last pin was lost to the other's flips
    assert(pins("fact") === Catalog.Pin(f, 4L), s"torn pins: $pins")
    assert(pins("dim") === Catalog.Pin(d, 4L), s"torn pins: $pins")
    // every catalog version carries a COMPLETE pin set (never torn)
    Snapshots.versions(spark, c).foreach { v =>
      assert(Catalog.pins(spark, c, Some(v)).keySet === Set("fact", "dim"))
    }
  }
}
