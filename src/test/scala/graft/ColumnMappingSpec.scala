package graft

import org.apache.spark.sql.functions._
import graft.etl.Snapshots
import graft.plans.SnapshotSql

/** Metadata-only RENAME/DROP COLUMN (the snapshot tier's column
  * mapping — Delta column-mapping 'name' mode): renames and drops
  * are one tiny version publish, reads present logical names per
  * version (time travel included), appends accept logical batches,
  * and the rewriting writers refuse until the mapping materializes.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(root: String): Unit = {
    val df = (1L to 100L).map(i => (i, s"n$i", i * 2.0)).toDF("id", "name", "score")
    Snapshots.commit(spark, df, root)
  }

  test("rename is metadata-only; every read path presents logical names") {
    val root = tmpDir("cm_rename")
    freshTable(root)
    val filesBefore = Snapshots.filesOfVersion(spark, root, 1L)
    val v2 = Snapshots.renameColumn(spark, root, "score", "points")
    assert(v2 === 2L)
    // zero data churn: the new version references the same files
    assert(Snapshots.filesOfVersion(spark, root, v2) === filesBefore)
    assert(Snapshots.read(spark, root).columns.toSeq === Seq("id", "name", "points"))
    // time travel shows each version under ITS names
    assert(Snapshots.read(spark, root, Some(1L)).columns.contains("score"))
    // SQL sees (and filters on) the logical name, pushdown intact
    val n = SnapshotSql.sql(spark,
      s"SELECT count(*) AS n FROM snap.`$root` WHERE points > 100.0")
      .head().getLong(0)
    assert(n === 50L)
    // renaming back to the physical name clears the mapping entry
    Snapshots.renameColumn(spark, root, "points", "score")
    assert(Snapshots.versionMeta(spark, root, 3L).colmap.isIdentity)
  }

  test("drop hides the column everywhere; values stay right") {
    val root = tmpDir("cm_drop")
    freshTable(root)
    Snapshots.dropColumn(spark, root, "name")
    val df = Snapshots.read(spark, root)
    assert(df.columns.toSeq === Seq("id", "score"))
    assert(df.agg(sum("id")).head().getLong(0) === 5050L)
    intercept[Exception] {
      Snapshots.dropColumn(spark, root, "no_such")
    }
    // cannot drop below one column
    Snapshots.dropColumn(spark, root, "score")
    val e = intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, root, "id")
    }
    assert(e.getMessage.contains("last column"))
  }

  test("append takes logical batches; physical files stay mergeable; CDF follows") {
    val root = tmpDir("cm_append")
    freshTable(root)
    Snapshots.renameColumn(spark, root, "score", "points")
    val batch = (101L to 120L).map(i => (i, s"n$i", i * 2.0))
      .toDF("id", "name", "points")
    val v3 = Snapshots.append(spark, batch, root)
    val all = Snapshots.read(spark, root)
    assert(all.count() === 120L)
    assert(all.filter(col("points") === 240.0).count() === 1L)
    // a batch under the OLD name refuses (the logical schema is the contract)
    intercept[IllegalArgumentException] {
      Snapshots.append(spark,
        (200L to 210L).map(i => (i, s"n$i", 0.0)).toDF("id", "name", "score"),
        root)
    }
    // CDF presents the end-version's logical names
    val ch = Snapshots.changes(spark, root, 2L, v3)
    assert(ch.df.columns.contains("points"))
    assert(ch.df.filter(col("_change_type") === "insert").count() === 20L)
  }

  test("MoR delete evaluates predicates over logical names") {
    val root = tmpDir("cm_del")
    freshTable(root)
    Snapshots.renameColumn(spark, root, "score", "points")
    val r = Snapshots.deleteWhere(spark, root, col("points") <= 20.0)
    assert(r.rowsDeleted === 10L)
    assert(Snapshots.read(spark, root).count() === 90L)
  }

  test("rewriting writers refuse until materializeMapping bakes the names in") {
    val root = tmpDir("cm_gate")
    freshTable(root)
    Snapshots.dropColumn(spark, root, "name")
    val e = intercept[IllegalArgumentException] {
      Snapshots.updateWhere(spark, root, col("id") === 1L,
        Seq("score" -> lit(0.0)))
    }
    assert(e.getMessage.contains("materializeMapping"))
    val v = Snapshots.materializeMapping(spark, root)
    assert(Snapshots.versionMeta(spark, root, v).colmap.isIdentity)
    val df = Snapshots.read(spark, root)
    assert(df.columns.toSeq === Seq("id", "score"))
    assert(df.count() === 100L)
    // unblocked now
    val u = Snapshots.updateWhere(spark, root, col("id") === 1L,
      Seq("score" -> lit(0.0)))
    assert(u.rowsUpdated === 1L)
    // guards: layout/policy-referenced columns refuse mapping ops
    val root2 = tmpDir("cm_guard")
    Snapshots.commit(spark,
      (1L to 10L).map(i => (i, s"g${i % 2}")).toDF("id", "grp"),
      root2, partitionBy = Seq("grp"))
    val g = intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, root2, "grp", "bucket2")
    }
    assert(g.getMessage.contains("partition column"))
  }

  test("ALTER TABLE ADD COLUMN is metadata-only; old files read NULL") {
    val root = tmpDir("cm_addcol")
    freshTable(root)
    val v = SnapshotSql.sql(spark,
      s"ALTER TABLE snap.`$root` ADD COLUMN note STRING").head().getLong(0)
    assert(v === 2L)
    assert(Snapshots.filesOfVersion(spark, root, 2L) ===
      Snapshots.filesOfVersion(spark, root, 1L), "must publish metadata only")
    val df = Snapshots.read(spark, root)
    assert(df.columns.toSeq === Seq("id", "name", "score", "note"))
    assert(df.filter(col("note").isNull).count() === 100L)
    Snapshots.append(spark,
      (101L to 105L).map(i => (i, s"n$i", 1.0, "x"))
        .toDF("id", "name", "score", "note"), root)
    assert(Snapshots.read(spark, root).filter(col("note") === "x").count() === 5L)
    // parameterized types parse; duplicates refuse
    SnapshotSql.sql(spark, s"ALTER TABLE snap.`$root` ADD COLUMN amt DECIMAL(10,2)")
    intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, root, "note", "STRING")
    }
    // a dropped column's physical name refuses re-add (bytes would
    // resurrect from the old files)
    Snapshots.dropColumn(spark, root, "name")
    val e = intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, root, "name", "STRING")
    }
    assert(e.getMessage.contains("resurrect"))
  }

  test("SQL ALTER TABLE verbs: RENAME/DROP COLUMN, ADD/DROP CONSTRAINT") {
    val root = tmpDir("cm_sql")
    freshTable(root)
    assert(SnapshotSql.sql(spark,
      s"ALTER TABLE snap.`$root` RENAME COLUMN score TO points")
      .head().getLong(0) === 2L)
    assert(SnapshotSql.sql(spark,
      s"ALTER TABLE snap.`$root` DROP COLUMN name").head().getLong(0) === 3L)
    assert(spark.sql(s"SELECT * FROM snap.`$root`").columns.toSeq ===
      Seq("id", "points"))
    SnapshotSql.sql(spark,
      s"ALTER TABLE snap.`$root` ADD CONSTRAINT pos CHECK (points >= 0.0)")
    intercept[IllegalArgumentException] {
      Snapshots.append(spark, Seq((999L, -5.0)).toDF("id", "points"), root)
    }
    SnapshotSql.sql(spark, s"ALTER TABLE snap.`$root` DROP CONSTRAINT pos")
    Snapshots.append(spark, Seq((999L, -5.0)).toDF("id", "points"), root)
    assert(Snapshots.read(spark, root).count() === 101L)
  }

  test("verb lexing is console-robust: trailing ';', backticked names, complex types") {
    val root = tmpDir("cm_lex")
    freshTable(root)
    // trailing semicolon must not fall through to Spark's parser
    assert(SnapshotSql.sql(spark,
      s"ALTER TABLE snap.`$root` RENAME COLUMN score TO points;")
      .head().getLong(0) === 2L)
    // backtick-quoted identifiers with non-word chars route correctly
    SnapshotSql.sql(spark,
      s"ALTER TABLE snap.`$root` RENAME COLUMN `points` TO `points usd`")
    assert(spark.sql(s"SELECT * FROM snap.`$root`").columns.toSeq ===
      Seq("id", "name", "points usd"))
    SnapshotSql.sql(spark,
      s"ALTER TABLE snap.`$root` RENAME COLUMN `points usd` TO points")
    // ADD COLUMN delegates type validation to StructType.fromDDL, so
    // complex types work and a bad type gets the DDL parser's own error
    SnapshotSql.sql(spark,
      s"ALTER TABLE snap.`$root` ADD COLUMN tags ARRAY<STRING>;")
    SnapshotSql.sql(spark,
      s"ALTER TABLE snap.`$root` ADD COLUMN price DECIMAL(12, 2)")
    val sch = org.apache.spark.sql.types.StructType.fromDDL(
      graft.etl.Snapshots.versionMeta(spark, root,
        graft.etl.Snapshots.latestVersion(spark, root).get).schemaDdl.get)
    assert(sch("tags").dataType.typeName === "array")
    assert(sch("price").dataType.typeName === "decimal(12,2)")
    intercept[Exception] {
      SnapshotSql.sql(spark, s"ALTER TABLE snap.`$root` ADD COLUMN bad NOTATYPE")
    }
    // maintenance verbs tolerate the trailing ';' too
    assert(SnapshotSql.sql(spark, s"DESCRIBE HISTORY snap.`$root`;").count() >= 4L)
  }
}
