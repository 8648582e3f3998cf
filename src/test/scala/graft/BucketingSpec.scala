package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: writing both sides bucketed by the join
  * key removes the shuffle entirely — the at-scale answer for
  * repeated large-large joins on a stable key (SCALE.md).
  */
class BucketingSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without a shuffle exchange") {
    // (warehouse dir is a static conf — use the session default;
    // DROP TABLE below removes the managed files)
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      // and it still computes the right thing
      assert(joined.count() === Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  // --- bucket layout in the SNAPSHOT table format ---

  import graft.etl.Snapshots
  import graft.etl.Snapshots.Bucketing
  import graft.plans.SnapshotSql

  private def noShuffle(df: org.apache.spark.sql.DataFrame,
                        what: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"$what must plan without a shuffle exchange, got:\n${plan.take(4000)}")
  }

  test("snapshot bucket layout: every data file's rows hash to its tag") {
    // bucket identity is CORRECTNESS at read time — the scan claims
    // HashPartitioning(cols, n), so each file must hold exactly the
    // rows whose pmod(murmur3(col), n) equals its parsed tag
    val root = tmpDir("snap_bucket_id")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Snapshots.commit(spark, o, root,
      bucketBy = Some(Bucketing(4, Seq("o_custkey"), Seq("o_custkey"))))
    val v = Snapshots.latestVersion(spark, root).get
    val files = Snapshots.filesOfVersion(spark, root, v)
    assert(files.nonEmpty)
    val TagRe = """.*_(\d+)\..*""".r
    files.foreach { f =>
      val name = new org.apache.hadoop.fs.Path(f).getName
      val tag = name match {
        case TagRe(t) => t.toInt
        case _ => fail(s"bucketed file $name carries no bucket tag")
      }
      val off = spark.read.parquet(f)
        .filter(pmod(hash(col("o_custkey")), lit(4)) =!= lit(tag)).count()
      assert(off === 0L, s"$name holds rows outside bucket $tag")
    }
    // and the logged layout round-trips
    assert(Snapshots.versionMeta(spark, root, v).bucket ===
      Some(Bucketing(4, Seq("o_custkey"), Seq("o_custkey"))))
  }

  test("co-bucketed snapshot tables join and aggregate with zero shuffles") {
    val oRoot = tmpDir("snap_bucket_o")
    val cRoot = tmpDir("snap_bucket_c")
    Snapshots.commit(spark,
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      oRoot, bucketBy = Some(Bucketing(4, Seq("o_custkey"))))
    Snapshots.commit(spark,
      Tables.customer(spark, sf).select("c_custkey", "c_mktsegment"),
      cRoot, bucketBy = Some(Bucketing(4, Seq("c_custkey"))))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = SnapshotSql.sql(spark,
        s"SELECT c.c_mktsegment, o.o_totalprice FROM snap.`$oRoot` o " +
          s"JOIN snap.`$cRoot` c ON o.o_custkey = c.c_custkey")
      noShuffle(joined, "co-bucketed snapshot join")
      assert(joined.queryExecution.executedPlan.toString.contains("Bucketed: true"),
        "the scan must actually run bucketed, not merely shuffle-free")
      // correct against the plain (unbucketed-plan) read
      val expect = Snapshots.read(spark, oRoot)
        .join(Snapshots.read(spark, cRoot),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expect)
      // aggregation on the bucket key: partial+final collapse, no
      // exchange between them
      val agg = SnapshotSql.sql(spark,
        s"SELECT o_custkey, count(*) AS n FROM snap.`$oRoot` GROUP BY o_custkey")
      noShuffle(agg, "group-by on the bucket key")
      assert(agg.count() ===
        Snapshots.read(spark, oRoot).select("o_custkey").distinct().count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("append preserves the bucket layout; deletion vectors compose") {
    val root = tmpDir("snap_bucket_app")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Snapshots.commit(spark, o.limit(50), root,
      bucketBy = Some(Bucketing(4, Seq("o_custkey"))))
    Snapshots.append(spark, o.limit(100), root) // inherits the layout
    val v = Snapshots.latestVersion(spark, root).get
    assert(Snapshots.versionMeta(spark, root, v).bucket.map(_.n) === Some(4))
    val TagRe = """.*_(\d+)\..*""".r
    Snapshots.filesOfVersion(spark, root, v).foreach { f =>
      val name = new org.apache.hadoop.fs.Path(f).getName
      assert(TagRe.findFirstIn(name).nonEmpty,
        s"appended file $name lost its bucket tag")
    }
    // a merge-on-read delete keeps the spec AND the logical rows right
    val r = Snapshots.deleteWhere(spark, root, col("o_totalprice") < 1000.0)
    val expect = o.limit(50).unionAll(o.limit(100))
      .filter(!(col("o_totalprice") < 1000.0)).count()
    val got = SnapshotSql.sql(spark,
      s"SELECT count(*) AS n FROM snap.`$root`").head().getLong(0)
    assert(got === expect, s"post-delete logical count (dv v${r.version})")
  }

  test("point predicates on the bucket key prune to one bucket") {
    // the hash layout doubles as a point index: an equality predicate
    // on the bucket column scans 1/n of the table with zero stats —
    // SelectedBucketsCount pins Spark's own bucket pruning firing
    // through the snapshot relation
    val root = tmpDir("snap_bucket_prune")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val key = o.select("o_custkey").head().getLong(0)
    Snapshots.commit(spark, o, root,
      bucketBy = Some(Bucketing(8, Seq("o_custkey"))))
    val prev = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      val q = SnapshotSql.sql(spark,
        s"SELECT * FROM snap.`$root` WHERE o_custkey = $key")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected one-bucket scan:\n${plan.take(3000)}")
      assert(q.count() ===
        Snapshots.read(spark, root).filter(col("o_custkey") === key).count())
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }

  test("streaming snapshot ingest inherits the bucket layout") {
    import spark.implicits._
    val base = tmpDir("snap_bucket_stream")
    val staging = s"$base/staging"; val ckpt = s"$base/ckpt"
    val root = s"$base/table"
    Snapshots.commit(spark,
      (1L to 40L).map(i => (i, i % 7)).toDF("id", "k"), root,
      bucketBy = Some(Bucketing(4, Seq("k"))))
    (41L to 90L).map(i => (i, i % 7)).toDF("id", "k")
      .write.parquet(staging)
    graft.streaming.Ingest.snapshotIngestAvailableNow(spark, staging, ckpt,
      root, statsCols = Nil, schemaDDL = "id BIGINT, k BIGINT")
    val v = Snapshots.latestVersion(spark, root).get
    assert(Snapshots.read(spark, root).count() === 90L)
    val TagRe = """.*_(\d+)\..*""".r
    Snapshots.filesOfVersion(spark, root, v).foreach { f =>
      val name = new org.apache.hadoop.fs.Path(f).getName
      val tag = name match {
        case TagRe(t) => t.toInt
        case _ => fail(s"streamed file $name carries no bucket tag")
      }
      val off = spark.read.parquet(f)
        .filter(pmod(hash(col("k")), lit(4)) =!= lit(tag)).count()
      assert(off === 0L, s"streamed rows mis-bucketed in $name")
    }
  }

  test("optimize compacts within the bucket layout; clusterBy refuses") {
    val root = tmpDir("snap_bucket_opt")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Snapshots.commit(spark, o.limit(40), root,
      bucketBy = Some(Bucketing(2, Seq("o_custkey"))))
    // small appends create per-bucket small-file debt
    Snapshots.append(spark, o.limit(60), root)
    Snapshots.append(spark, o.limit(80), root)
    val before = Snapshots.read(spark, root).count()
    val res = Snapshots.optimize(spark, root)
    assert(res.filesRewritten > 0)
    val v = Snapshots.latestVersion(spark, root).get
    val TagRe = """.*_(\d+)\..*""".r
    Snapshots.filesOfVersion(spark, root, v).foreach { f =>
      val name = new org.apache.hadoop.fs.Path(f).getName
      val tag = name match {
        case TagRe(t) => t.toInt
        case _ => fail(s"compacted file $name carries no bucket tag")
      }
      val off = spark.read.parquet(f)
        .filter(pmod(hash(col("o_custkey")), lit(2)) =!= lit(tag)).count()
      assert(off === 0L, s"compaction mis-bucketed rows in $name")
    }
    assert(Snapshots.read(spark, root).count() === before)
    val e = intercept[IllegalArgumentException] {
      Snapshots.optimize(spark, root, clusterBy = Seq("o_totalprice"))
    }
    assert(e.getMessage.contains("bucketed"))
  }

  test("merge casts drifted key dtypes to the table type before bucket hashing") {
    import spark.implicits._
    val root = tmpDir("bucket_dtype")
    Snapshots.commitWithStats(spark,
      (1L to 1000L).map(i => (i, i * 1.0)).toDF("id", "v"), root, Seq("id"),
      bucketBy = Some(Snapshots.Bucketing(8, Seq("id"), Seq("id"))))
    // an INT-typed key column: murmur3 hashes 17:Int and 17L
    // differently, so an uncast batch would prune the WRONG bucket —
    // the stale row carried, the update appended as a duplicate
    val updates = Seq((17, -1.0)).toDF("id", "v")
    val r = Snapshots.merge(spark, updates, root, "id", Seq("id"))
    assert(r.filesRewritten === 1)
    val after = Snapshots.read(spark, root)
    assert(after.count() === 1000L, "stale row replaced, not duplicated")
    assert(after.filter(col("id") === 17L).select("v").as[Double]
      .collect().toSeq === Seq(-1.0))
    // and the committed files stay readable under the logged schema
    assert(after.agg(sum("id")).head().getLong(0) === (1L to 1000L).sum)
  }

  test("merge on a key-bucketed table opens only the hit buckets' files") {
    import spark.implicits._
    val root = tmpDir("bucket_merge")
    val n = 8
    val base = (1L to 4000L).map(i => (i, i * 1.0)).toDF("id", "v")
    Snapshots.commitWithStats(spark, base, root, Seq("id"),
      bucketBy = Some(Snapshots.Bucketing(n, Seq("id"), Seq("id"))))
    // updates hit THREE keys — every file's [min,max] spans the whole
    // keyspace (hash layout scrambles ranges), so range targeting
    // alone would rewrite everything; bucket ids name the candidates
    val keys = Seq(17L, 1900L, 3333L)
    val updates = keys.map(k => (k, -1.0)).toDF("id", "v")
    val hitIds = updates.select(pmod(hash(col("id")), lit(n))).distinct()
      .collect().map(_.getInt(0)).toSet
    val TagRe = ".*_(\\d+)\\.[^/]*$".r
    val filesOfBuckets = Snapshots.filesOfVersion(spark, root, 1L).count { f =>
      f match { case TagRe(t) => hitIds.contains(t.toInt); case _ => true }
    }
    val r = Snapshots.merge(spark, updates, root, "id", Seq("id"))
    assert(r.filesRewritten === filesOfBuckets,
      s"merge must open exactly the hit buckets' files: " +
        s"${r.filesRewritten} vs $filesOfBuckets of ${r.filesTotal}")
    assert(r.filesRewritten < r.filesTotal)
    // values: updates applied, everything else intact
    val after = Snapshots.read(spark, root)
    assert(after.count() === 4000L)
    assert(after.filter(col("v") === -1.0).select("id").as[Long]
      .collect().toSet === keys.toSet)
    // the appended version keeps the layout, so a second merge still
    // bucket-targets (accreted multi-file buckets included)
    Snapshots.append(spark, Seq((5000L, 5.0)).toDF("id", "v"), root, Seq("id"))
    val r2 = Snapshots.merge(spark,
      Seq((17L, -2.0)).toDF("id", "v"), root, "id", Seq("id"))
    assert(r2.filesRewritten < r2.filesTotal)
    assert(Snapshots.read(spark, root).filter(col("id") === 17L)
      .select("v").head().getDouble(0) === -2.0)
  }
}
