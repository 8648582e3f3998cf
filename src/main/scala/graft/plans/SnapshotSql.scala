package graft.plans

import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

import graft.etl.Snapshots

/** Analyzer rule that makes every snapshot table a SQL table: a
  * relation named `snap.\`/path/to/table\`` resolves to the
  * [[Snapshots.sqlScan]] plan — the manifest-listed, stats-skipping,
  * deletion-vector-aware parquet scan — and Spark's own time-travel
  * syntax routes through the version log:
  *
  * {{{
  *   SELECT ... FROM snap.`/data/orders`                      -- latest
  *   SELECT ... FROM snap.`/data/orders` VERSION AS OF 3      -- pinned
  *   SELECT ... FROM snap.`/data/orders` TIMESTAMP AS OF '..' -- as-of
  *   SELECT ... FROM snap.`/data/cat::fact`                   -- catalog
  *   SELECT ... FROM snap.`/data/cat::fact` VERSION AS OF 2   -- cat ver
  * }}}
  *
  * The `<catRoot>::<name>` form reads a table THROUGH a
  * [[graft.etl.Catalog]] pin — the consistent cross-table snapshot —
  * and `VERSION AS OF` on it travels the CATALOG (the pin set is the
  * unit of consistency). All forms plan through the same skipping
  * scan.
  *
  * The rule is injected by [[graft.GraftExtensions]] (plain
  * `spark.sql` in any session built with the extensions), and
  * [[SnapshotSql.sql]] applies the SAME rule to a parsed plan for
  * sessions built without them. Filters the user writes prune files
  * through the scan's [[SnapshotFileIndex]] at planning time — SQL
  * gets the data skipping for free, no explicit `readPruned` call.
  *
  * Idempotence: the replacement plan contains no unresolved
  * relations, so the analyzer's fixed-point loop passes through
  * untouched after the first application. `RelationTimeTravel` is an
  * unresolved LEAF (its child is not traversed), so the bare-relation
  * case can never consume the inner relation first.
  */
case class ResolveSnapshotTable(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case RelationTimeTravel(u: UnresolvedRelation, ts, v) if isSnap(u) =>
      rootOf(u) match {
        case Left(root) =>
          val version = v.map(parseVersion).orElse(
            ts.map(t => Snapshots.versionAsOf(spark, root, tsMillis(t))))
          scanPlan(root, version)
        case Right((cat, name)) =>
          // time travel on a catalog relation travels the CATALOG —
          // the pin set is the unit of consistency, so "this table at
          // catalog version 3" is the meaningful historical read
          require(ts.isEmpty,
            "snap: catalog relations time-travel by catalog VERSION AS OF")
          val pin = pinOf(cat, name, v.map(parseVersion))
          scanPlan(pin.root, Some(pin.version))
      }
    case u: UnresolvedRelation if isSnap(u) =>
      rootOf(u) match {
        case Left(root) => scanPlan(root, None)
        case Right((cat, name)) =>
          val pin = pinOf(cat, name, None)
          scanPlan(pin.root, Some(pin.version))
      }
  }

  private def pinOf(cat: String, name: String,
                    catV: Option[Long]): graft.etl.Catalog.Pin =
    graft.etl.Catalog.pins(spark, cat, catV).getOrElse(name,
      throw new IllegalArgumentException(
        s"$cat: no table '$name' in catalog version " +
          catV.map(_.toString).getOrElse("latest")))

  private def isSnap(u: UnresolvedRelation): Boolean = {
    val parts = u.multipartIdentifier
    parts.length == 2 && parts.head.equalsIgnoreCase("snap")
  }

  /** Left(tableRoot) for a plain snapshot relation, Right((catRoot,
    * tableName)) for a catalog relation `snap.\`<cat>::<name>\`` —
    * the consistent cross-table read ([[graft.etl.Catalog]]) in SQL.
    */
  private def rootOf(u: UnresolvedRelation): Either[String, (String, String)] = {
    val id = u.multipartIdentifier(1)
    id.split("::", 2) match {
      case Array(cat, name) if name.nonEmpty && id.contains("::") =>
        Right((cat, name))
      case _ => Left(id)
    }
  }

  private def parseVersion(s: String): Long =
    try s.toLong
    catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"snap: VERSION AS OF takes an integer version, got '$s'")
    }

  /** `TIMESTAMP AS OF <expr>`: fold the literal through Catalyst's
    * own cast (string → timestamp under the session time zone) and
    * resolve against commit-file mtimes ([[Snapshots.versionAsOf]]).
    */
  private def tsMillis(e: Expression): Long = {
    require(e.foldable, "snap: TIMESTAMP AS OF takes a literal expression")
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val micros = Cast(e, TimestampType, Some(tz)).eval(null)
    require(micros != null, s"snap: cannot read '$e' as a timestamp")
    micros.asInstanceOf[Long] / 1000L
  }

  private def scanPlan(root: String, version: Option[Long]): LogicalPlan =
    GraftShim.analyzedPlan(Snapshots.sqlScan(spark, root, version)._1)
}

/** SQL entry point for sessions built WITHOUT the extensions (the
  * driver's plain session): parse, apply [[ResolveSnapshotTable]]
  * once, hand the rewritten tree to the normal analyzer.
  *
  * DML routes to the snapshot writers — each statement maps to the
  * commit shape that survives at 100 TB:
  *
  * {{{
  *   INSERT INTO snap.`/t` SELECT ...            -- copy-on-write append
  *   INSERT OVERWRITE snap.`/t` SELECT ...       -- full-replace commit
  *   DELETE FROM snap.`/t` WHERE <pred>          -- merge-on-read vector
  *   UPDATE snap.`/t` SET c = e WHERE <pred>     -- merge-on-read update
  *   MERGE INTO snap.`/t` t USING src u ON t.k = u.k
  *     WHEN MATCHED [AND pred] THEN UPDATE SET * | SET c = e, ...
  *     WHEN MATCHED [AND pred] THEN DELETE
  *     WHEN NOT MATCHED [AND pred] THEN INSERT * -- copy-on-write merge
  *     WHEN NOT MATCHED BY SOURCE [AND pred]
  *       THEN UPDATE SET c = e | DELETE          -- dimension sync, O(table)
  *   CREATE [OR REPLACE] TABLE snap.`/t` [PARTITIONED BY (...)]
  *     [CLUSTERED BY (...) [SORTED BY (...)] INTO n BUCKETS]
  *     AS SELECT ...         -- birth (exclusive) / re-runnable replace
  *   CREATE [OR REPLACE] TABLE snap.`/d` SHALLOW CLONE snap.`/s`
  *     [VERSION AS OF v]     -- zero-copy fork; OR REPLACE re-points
  *   DROP TABLE snap.`/t`                        -- tombstone death
  * }}}
  *
  * MERGE sources may carry a COLUMN SUBSET of the table (key
  * included): UPDATE SET * updates the carried columns only and
  * INSERT * NULL-fills the rest. `MERGE WITH SCHEMA EVOLUTION`
  * accepts NEW source columns — they extend the logged schema as
  * nullable fields (ADD-only), filled by the matched updates and
  * inserts, NULL everywhere else.
  *
  * INSERT enforces the table's logged CHECK constraints and schema
  * (positional column matching, SQL's default); DELETE and UPDATE
  * write a deletion vector (plus, for UPDATE, one churn-sized fresh
  * dir) and rewrite ZERO pre-existing data files
  * ([[Snapshots.deleteWhere]] / [[Snapshots.updateWhere]]); MERGE is
  * the stats-targeted copy-on-write merge — the bare upsert shape
  * routes to [[Snapshots.merge]] (the reference's `ON CONFLICT DO
  * UPDATE` sink semantic, REF main.py:50), conditional clause sets
  * to [[Snapshots.mergeClauses]]; shapes outside the vocabulary
  * refuse loudly rather than guess. Every verb returns a one-row
  * commit receipt. Catalog relations (`<cat>::<name>`) are read-only
  * views of pinned state and refuse DML.
  */
object SnapshotSql {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable,
    InsertAction, InsertIntoStatement, InsertStarAction, MergeIntoTable,
    SubqueryAlias, UpdateStarAction, UpdateTable}

  // Maintenance statements Spark's parser has no grammar for —
  // matched lexically BEFORE parsePlan (the Delta pattern: Delta
  // ships a parser extension for exactly these verbs). Anchored,
  // case-insensitive keyword matches; the table root rides in
  // backticks like every other snap relation.
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+snap\.`([^`]+)`\s*(?:CLUSTER\s+BY\s*\(([^)]*)\)\s*)?""".r
  // DRY RUN must be WHITESPACE-separated from the unit keyword:
  // with a bare `\s*` between them, 'RETAIN 2 VERSIONSDRY RUN'
  // would parse as a valid dry-run statement instead of refusing
  private val VacuumRe =
    """(?is)\s*VACUUM\s+snap\.`([^`]+)`\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS)(?:\s+(DRY\s+RUN))?\s*""".r
  // COPY INTO — Databricks' idempotent batch file load, lexed like
  // the other non-Spark-grammar verbs; FORMAT_OPTIONS mirrors the
  // Databricks spelling ('k' = 'v', ...)
  private val CopyIntoRe =
    ("""(?is)\s*COPY\s+INTO\s+snap\.`([^`]+)`\s+FROM\s+'([^']+)'\s+""" +
      """FILEFORMAT\s*=\s*(\w+)""" +
      """(?:\s+PATTERN\s*=\s*'([^']+)')?""" +
      """(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?\s*""").r
  // CREATE TABLE ... AS SELECT — the missing BIRTH verb of the SQL
  // lifecycle: the layout clauses mirror Spark's own CTAS grammar
  // (PARTITIONED BY for the path layout, CLUSTERED BY ... [SORTED
  // BY ...] INTO n BUCKETS for the shuffle-free bucket layout)
  private val CreateRe =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+snap\.`([^`]+)`\s*""" +
      """(?:PARTITIONED\s+BY\s*\(([^)]*)\)\s*)?""" +
      """(?:CLUSTERED\s+BY\s*\(([^)]*)\)\s*""" +
      """(?:SORTED\s+BY\s*\(([^)]*)\)\s*)?INTO\s+(\d+)\s+BUCKETS\s*)?""" +
      """AS\s+(.+)""").r
  // CREATE TABLE ... SHALLOW CLONE — the zero-copy fork as SQL
  private val CloneRe =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+snap\.`([^`]+)`\s+""" +
      """SHALLOW\s+CLONE\s+""" +
      """snap\.`([^`]+)`\s*(?:VERSION\s+AS\s+OF\s+(\d+)\s*)?""").r
  // DROP TABLE — the tombstone death verb (Snapshots.dropTable)
  private val DropTableRe =
    """(?is)\s*DROP\s+TABLE\s+snap\.`([^`]+)`\s*""".r
  private val RestoreRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?snap\.`([^`]+)`\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*""".r
  // RESTORE by wall clock — resolved against commit-file mtimes
  // (Snapshots.versionAsOf), the same clock SQL time travel reads
  private val RestoreTsRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?snap\.`([^`]+)`\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*""".r
  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+snap\.`([^`]+)`\s*""".r
  private val DetailRe =
    """(?is)\s*DESCRIBE\s+DETAIL\s+snap\.`([^`]+)`\s*""".r
  private val ShowCreateRe =
    """(?is)\s*SHOW\s+CREATE\s+TABLE\s+snap\.`([^`]+)`\s*""".r
  private val ShowPartsRe =
    """(?is)\s*SHOW\s+PARTITIONS\s+snap\.`([^`]+)`\s*""".r
  private val ShowTablesRe =
    """(?is)\s*SHOW\s+TABLES\s+IN\s+snap\.`([^`]+)`\s*""".r
  // `KEYED BY k` upgrades the insert/delete vocabulary to the full
  // CDF one (update_preimage/update_postimage) via Snapshots
  // .changesKeyed — the SQL consumer reconstructing upserts no
  // longer pairs rows by hand
  private val ChangesVerbRe =
    ("""(?is)\s*DESCRIBE\s+CHANGES\s+snap\.`([^`]+)`\s+FROM\s+(\d+)\s+""" +
      """TO\s+(\d+)(?:\s+KEYED\s+BY\s+(`[^`]+`|\w+))?\s*""").r
  // column/constraint identifiers: either a backtick-quoted name
  // (any non-backtick chars — matching Spark's own identifier
  // grammar) or a bare word; [[unquote]] strips the ticks after the
  // match, so `odd name!` and plain names route identically
  private val Id = """(`[^`]+`|\w+)"""
  private val RenameColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+snap\.`([^`]+)`\s+RENAME\s+COLUMN\s+""" +
      Id + """\s+TO\s+""" + Id + """\s*""").r
  private val DropColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+snap\.`([^`]+)`\s+DROP\s+COLUMN\s+""" +
      Id + """\s*""").r
  // the type is everything after the name — addColumn delegates its
  // validation to StructType.fromDDL, so ARRAY<...>/MAP/STRUCT/
  // DECIMAL forms all work and a bad type surfaces the DDL parser's
  // own diagnostic, not an unrelated Spark parse error
  private val AddColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+snap\.`([^`]+)`\s+ADD\s+COLUMN\s+""" +
      Id + """\s+(\S.*?)\s*""").r
  // explicit type widening (Delta's ALTER COLUMN ... TYPE DDL) —
  // metadata-only; Snapshots.alterColumnType admits exactly the
  // lossless widenings and refuses partition/bucket columns
  private val AlterColTypeRe =
    ("""(?is)\s*ALTER\s+TABLE\s+snap\.`([^`]+)`\s+ALTER\s+COLUMN\s+""" +
      Id + """\s+TYPE\s+(\S.*?)\s*""").r
  private val AddConsRe =
    ("""(?is)\s*ALTER\s+TABLE\s+snap\.`([^`]+)`\s+ADD\s+CONSTRAINT\s+""" +
      Id + """\s+CHECK\s*\((.*)\)\s*""").r
  private val DropConsRe =
    ("""(?is)\s*ALTER\s+TABLE\s+snap\.`([^`]+)`\s+DROP\s+CONSTRAINT\s+""" +
      Id + """\s*""").r

  private def unquote(id: String): String =
    if (id.length >= 2 && id.startsWith("`") && id.endsWith("`"))
      id.substring(1, id.length - 1)
    else id

  /** SQL entry point: SELECT/time-travel plans through
    * [[ResolveSnapshotTable]], DML routes to the snapshot writers
    * (doc above), and the maintenance verbs — `OPTIMIZE [CLUSTER BY
    * (...)]`, `VACUUM ... RETAIN n VERSIONS`, `RESTORE ... TO
    * VERSION AS OF v`, `DESCRIBE HISTORY` — route to
    * [[Snapshots.optimize]]/[[Snapshots.vacuum]]/
    * [[Snapshots.rollback]]/[[Snapshots.history]], each returning a
    * one-row receipt (or the history frame). RESTORE is
    * metadata-only; VACUUM's receipt counts the version files it
    * trimmed (data-dir reclaim honors the in-flight-commit grace
    * window, exactly as the API call does). `ALTER TABLE ... RENAME
    * COLUMN / DROP COLUMN` route to the metadata-only column mapping
    * ([[Snapshots.renameColumn]]/[[Snapshots.dropColumn]] — zero
    * bytes rewritten at any table size), and `ALTER TABLE ... ADD
    * CONSTRAINT name CHECK (...) / DROP CONSTRAINT name` to the
    * logged CHECK-constraint tier.
    */
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    // the verb regexes are FULL-string matches, so a trailing ';'
    // (every SQL console's habit) must strip before matching or the
    // statement silently falls through to Spark's parser and dies
    // with an unrelated error
    sqlVerb(spark, sqlText.replaceFirst("[;\\s]+$", ""))

  private def sqlVerb(spark: SparkSession, sqlText: String): DataFrame = sqlText match {
    case CloneRe(orReplace, dst, src, ver) =>
      runClone(spark, noCatalog(dst, "CREATE TABLE"),
        noCatalog(src, "SHALLOW CLONE"), Option(ver).map(_.toLong),
        orReplace != null)
    case CreateRe(orReplace, root, parts, cluster, sorted, buckets, select) =>
      runCreate(spark, noCatalog(root, "CREATE TABLE"), orReplace != null,
        Option(parts), Option(cluster), Option(sorted),
        Option(buckets).map(_.toInt), select)
    case DropTableRe(root) =>
      runDrop(spark, noCatalog(root, "DROP TABLE"))
    case OptimizeRe(root, cluster) =>
      runOptimize(spark, noCatalog(root, "OPTIMIZE"), Option(cluster))
    case VacuumRe(root, n, unit, dry) =>
      runVacuum(spark, noCatalog(root, "VACUUM"), n.toInt,
        unit.equalsIgnoreCase("HOURS"), dry != null)
    case CopyIntoRe(root, src, fmt, pat, opts) =>
      runCopyInto(spark, noCatalog(root, "COPY INTO"), src, fmt,
        Option(pat), Option(opts))
    case RestoreRe(root, v) =>
      runRestore(spark, noCatalog(root, "RESTORE"), v.toLong)
    case RestoreTsRe(root, ts) =>
      val r = noCatalog(root, "RESTORE")
      runRestore(spark, r, Snapshots.versionAsOf(spark, r, tsLitMillis(spark, ts)))
    case ShowPartsRe(root) =>
      runShowPartitions(spark, noCatalog(root, "SHOW PARTITIONS"))
    case ShowTablesRe(cat) => runShowTables(spark, cat)
    case ChangesVerbRe(root, fromV, toV, keyed) =>
      val r = noCatalog(root, "DESCRIBE CHANGES")
      Option(keyed) match {
        case Some(k) =>
          Snapshots.changesKeyed(spark, r, fromV.toLong, toV.toLong,
            unquote(k)).df
        case None => Snapshots.changes(spark, r, fromV.toLong, toV.toLong).df
      }
    case RenameColRe(root, from, to) =>
      alterReceipt(spark, Snapshots.renameColumn(spark,
        noCatalog(root, "ALTER TABLE"), unquote(from), unquote(to)))
    case DropColRe(root, name) =>
      alterReceipt(spark, Snapshots.dropColumn(spark,
        noCatalog(root, "ALTER TABLE"), unquote(name)))
    case AddColRe(root, name, typeDdl) =>
      alterReceipt(spark, Snapshots.addColumn(spark,
        noCatalog(root, "ALTER TABLE"), unquote(name), typeDdl))
    case AlterColTypeRe(root, name, typeDdl) =>
      alterReceipt(spark, Snapshots.alterColumnType(spark,
        noCatalog(root, "ALTER TABLE"), unquote(name), typeDdl))
    case AddConsRe(root, name, check) =>
      alterReceipt(spark, Snapshots.addConstraint(spark,
        noCatalog(root, "ALTER TABLE"), unquote(name), check))
    case DropConsRe(root, name) =>
      alterReceipt(spark, Snapshots.dropConstraint(spark,
        noCatalog(root, "ALTER TABLE"), unquote(name)))
    case DetailRe(root) =>
      runDetail(spark, noCatalog(root, "DESCRIBE DETAIL"))
    case ShowCreateRe(root) =>
      runShowCreate(spark, noCatalog(root, "SHOW CREATE TABLE"))
    case HistoryRe(root) =>
      // read-only: a catalog relation's history is its pinned root's
      Snapshots.history(spark, root.split("::", 2) match {
        case Array(cat, name) if root.contains("::") && name.nonEmpty =>
          graft.etl.Catalog.pins(spark, cat, None).getOrElse(name,
            throw new IllegalArgumentException(
              s"$cat: no table '$name' in the latest catalog version")).root
        case _ => root
      })
    case _ => GraftShim.parsePlan(spark, sqlText) match {
      case i: InsertIntoStatement => runInsert(spark, i)
      case d: DeleteFromTable => runDelete(spark, d)
      case u: UpdateTable => runUpdate(spark, u)
      case m: MergeIntoTable => runMerge(spark, m)
      case other =>
        GraftShim.ofRows(spark, ResolveSnapshotTable(spark)(other))
    }
  }

  private def alterReceipt(spark: SparkSession, v: Long): DataFrame = {
    import spark.implicits._
    Seq(v).toDF("version")
  }

  /** `SHOW PARTITIONS` — the partition-value inventory from PATH
    * metadata alone (one manifest/listing read, no data opened): one
    * row per distinct value tuple, with its file count. Files whose
    * path carries no value for a column (pre-partitioning layouts,
    * the ambiguous null/'' default marker) surface it as NULL.
    * Errors on an unpartitioned table, matching Spark's own verb.
    */
  private def runShowPartitions(spark: SparkSession,
                                root: String): DataFrame = {
    val v = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed versions"))
    val m = Snapshots.versionMeta(spark, root, v)
    require(m.parts.nonEmpty, s"SHOW PARTITIONS: $root is not partitioned")
    val keys = m.parts.map(c => Snapshots.partKey(c) + "=")
    val tuples = Snapshots.filesOfVersion(spark, root, v).map { f =>
      val segs = f.split('/')
      keys.map { k =>
        segs.collectFirst {
          case seg if seg.startsWith(k) =>
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(seg.drop(k.length))
        }.orNull
      }
    }
    val rows = tuples.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.map { case (vals, n) =>
        org.apache.spark.sql.Row.fromSeq(vals :+ n)
      }
    import org.apache.spark.sql.types._
    val schema = StructType(
      m.parts.map(c => StructField(c, StringType)) :+
        StructField("n_files", LongType))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema).orderBy(m.parts.map(org.apache.spark.sql.functions.col): _*)
  }

  /** `SHOW TABLES IN snap.\`<catRoot>\`` — the catalog's pinned table
    * set at its latest version (name, table root, pinned version).
    */
  private def runShowTables(spark: SparkSession, cat: String): DataFrame = {
    import spark.implicits._
    graft.etl.Catalog.pins(spark, cat, None).toSeq
      .map { case (name, pin) => (name, pin.root, pin.version) }
      .sortBy(_._1).toDF("name", "root", "version")
  }

  private def noCatalog(root: String, op: String): String = {
    require(!root.contains("::"),
      s"snap: catalog relations are read-only pinned views — $op the " +
        "underlying table and publish a new catalog version")
    root
  }

  private def runOptimize(spark: SparkSession, root: String,
                          cluster: Option[String]): DataFrame = {
    import spark.implicits._
    val cols = cluster.toSeq.flatMap(_.split(',')).map(_.trim)
      .filter(_.nonEmpty).map(_.stripPrefix("`").stripSuffix("`"))
    val r = Snapshots.optimize(spark, root, clusterBy = cols)
    Seq((r.version, r.filesRewritten, r.filesTotal, r.rowsWritten))
      .toDF("version", "files_rewritten", "files_total", "rows_written")
  }

  /** `TIMESTAMP AS OF '<literal>'` for the lexically-matched verbs:
    * fold through Catalyst's own string→timestamp cast under the
    * session time zone — the same resolution the SELECT-side
    * time travel uses.
    */
  private def tsLitMillis(spark: SparkSession, s: String): Long = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    // under ANSI (the session default) the cast THROWS on a bad
    // literal rather than returning null — catch both shapes so the
    // operator sees the verb's own refusal, not a raw cast error
    val micros =
      try Cast(org.apache.spark.sql.catalyst.expressions.Literal(s),
        TimestampType, Some(tz)).eval(null)
      catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"snap: cannot read '$s' as a timestamp", e)
      }
    require(micros != null, s"snap: cannot read '$s' as a timestamp")
    micros.asInstanceOf[Long] / 1000L
  }

  private def runVacuum(spark: SparkSession, root: String,
                        keep: Int, hours: Boolean,
                        dryRun: Boolean = false): DataFrame = {
    import spark.implicits._
    if (dryRun) {
      // the PREVIEW: what the same statement would reclaim, nothing
      // mutated — one (kind, path) row per would-be-deleted artifact
      if (hours)
        Snapshots.vacuumDryRunRetainMs(spark, root, keep * 3600L * 1000L)
      else Snapshots.vacuumDryRun(spark, root, keepLast = keep)
    } else {
      val before = Snapshots.versions(spark, root).size
      if (hours)
        Snapshots.vacuumRetainMs(spark, root, keep * 3600L * 1000L)
      else Snapshots.vacuum(spark, root, keepLast = keep)
      val after = Snapshots.versions(spark, root).size
      Seq((after, before - after)).toDF("versions_retained", "versions_removed")
    }
  }

  /** `COPY INTO snap.\`/t\` FROM '<dir>' FILEFORMAT = <fmt> [PATTERN
    * = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', ...)]` →
    * [[Snapshots.copyInto]]: idempotent file-level batch load —
    * already-loaded files skip, so the statement is safely
    * re-runnable. Receipt = (version, files_loaded, files_skipped,
    * rows_loaded).
    */
  private def runCopyInto(spark: SparkSession, root: String, src: String,
                          fmt: String, pattern: Option[String],
                          optsRaw: Option[String]): DataFrame = {
    import spark.implicits._
    val OptRe = """'([^']*)'\s*=\s*'([^']*)'""".r
    val options: Map[String, String] = optsRaw
      .map(s => OptRe.findAllMatchIn(s)
        .map(m => m.group(1) -> m.group(2)).toMap)
      .getOrElse(Map.empty)
    val r = Snapshots.copyInto(spark, root, src, fmt, options, pattern)
    Seq((r.version, r.filesLoaded, r.filesSkipped, r.rowsLoaded))
      .toDF("version", "files_loaded", "files_skipped", "rows_loaded")
  }

  private def splitCols(s: Option[String]): Seq[String] =
    s.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .map(unquote)

  /** `CREATE TABLE snap.\`/t\` [PARTITIONED BY (...)] [CLUSTERED BY
    * (...) [SORTED BY (...)] INTO n BUCKETS] AS SELECT ...` — the
    * SQL lifecycle's birth verb: the SELECT plans through the same
    * snapshot resolution as every other statement (so a table can be
    * born FROM another snapshot table, version-pinned included), and
    * the layout clauses land in the version log exactly as the Scala
    * [[Snapshots.commit]] records them — partition columns prune
    * from paths, the bucket layout makes co-bucketed joins
    * shuffle-free, and every later INSERT inherits both. Refuses an
    * existing table (CREATE, not CREATE OR REPLACE — a silent
    * replace of a 100 TB table is not a default anyone wants).
    * Receipt = (version, n_rows).
    */
  private def runCreate(spark: SparkSession, root: String,
                        orReplace: Boolean,
                        parts: Option[String], cluster: Option[String],
                        sorted: Option[String], buckets: Option[Int],
                        select: String): DataFrame = {
    val data = sql(spark, select)
    val bucketing = buckets.map(n =>
      Snapshots.Bucketing(n, splitCols(cluster), splitCols(sorted)))
    // CREATE publishes at EXACTLY the first free slot and fails if
    // taken (Snapshots.create — racing CREATEs can never silently
    // become a replace); OR REPLACE is the explicit full-replace verb
    // (re-runnable CTAS pipelines, revives a dropped table, old
    // versions stay time-travel-readable until VACUUM)
    val v =
      if (orReplace)
        Snapshots.replaceTable(spark, data, root, splitCols(parts), bucketing)
      else Snapshots.create(spark, data, root, splitCols(parts), bucketing)
    receipt(spark, v, Snapshots.versionMeta(spark, root, v).nRows)
  }

  /** `DROP TABLE snap.\`/t\`` — the tombstone death verb
    * ([[Snapshots.dropTable]]): metadata-only; reads/writes on the
    * latest refuse from here on, pre-drop versions stay readable and
    * RESTORE undrops, VACUUM reclaims the bytes. Receipt = the
    * tombstone version.
    */
  private def runDrop(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    Seq(Snapshots.dropTable(spark, root)).toDF("tombstone_version")
  }

  /** `CREATE TABLE snap.\`dst\` SHALLOW CLONE snap.\`src\` [VERSION
    * AS OF v]` — the zero-copy fork ([[Snapshots.cloneShallow]]) as
    * a statement. Receipt = (version, n_rows) of the clone.
    */
  private def runClone(spark: SparkSession, dst: String, src: String,
                       version: Option[Long],
                       orReplace: Boolean = false): DataFrame = {
    val v = Snapshots.cloneShallow(spark, src, dst, version, orReplace)
    receipt(spark, v, Snapshots.versionMeta(spark, dst, v).nRows)
  }

  private def runRestore(spark: SparkSession, root: String,
                         to: Long): DataFrame = {
    import spark.implicits._
    val v = Snapshots.rollback(spark, root, to)
    Seq((v, to, Snapshots.versionMeta(spark, root, v).nRows))
      .toDF("version", "restored_from", "n_rows")
  }

  private def tableRootOf(spark: SparkSession, plan: LogicalPlan,
                          op: String): String = plan match {
    // DML targets may carry an alias (MERGE INTO snap.`/t` t)
    case SubqueryAlias(_, child) => tableRootOf(spark, child, op)
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("snap") =>
      val id = u.multipartIdentifier(1)
      require(!id.contains("::"),
        s"snap: catalog relations are read-only pinned views — $op the " +
          "underlying table and publish a new catalog version")
      id
    case _ => throw new IllegalArgumentException(
      s"snap: $op targets must be snap.`<root>` relations")
  }

  private def receipt(spark: SparkSession, version: Long,
                      nRows: Long): DataFrame = {
    import spark.implicits._
    Seq((version, nRows)).toDF("version", "n_rows")
  }

  private def runInsert(spark: SparkSession,
                        i: InsertIntoStatement): DataFrame = {
    val root = tableRootOf(spark, i.table, "INSERT")
    if (i.partitionSpec.nonEmpty) {
      require(i.userSpecifiedCols.isEmpty,
        "snap: INSERT column lists do not combine with PARTITION specs")
      return runPartitionInsert(spark, i, root)
    }
    val data0 = GraftShim.ofRows(spark,
      ResolveSnapshotTable(spark)(i.query))
    // the schema comes from the LOG (logical names), so INSERT works
    // on a freshly created still-empty table too
    val schema = Snapshots.tableSchema(spark, root)
    val data =
      if (i.userSpecifiedCols.nonEmpty) {
        // `INSERT INTO t (a, b) SELECT ...` — the SELECT supplies the
        // named columns positionally; unnamed table columns fill with
        // NULL (SQL's rule); named values cast to the column's logged
        // type (ANSI store assignment)
        // resolve the user's names CASE-INSENSITIVELY (Spark's
        // default resolution everywhere else) to the schema's
        // canonical spelling
        val names = i.userSpecifiedCols.map(c =>
          schema.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(
            throw new IllegalArgumentException(
              s"snap: $c is not a column of $root")))
        require(names.distinct.size == names.size,
          s"snap: duplicate INSERT columns in ${names.mkString(", ")}")
        require(data0.columns.length == names.length,
          s"snap: INSERT supplies ${data0.columns.length} columns for " +
            s"${names.length} named")
        val named = data0.toDF(names: _*)
        named.select(schema.fields.toSeq.map { f =>
          if (names.contains(f.name))
            org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
              .as(f.name)
          else org.apache.spark.sql.functions.lit(null).cast(f.dataType)
            .as(f.name)
        }: _*)
      } else {
        val names = schema.fieldNames
        require(data0.columns.length == names.length,
          s"snap: INSERT arity ${data0.columns.length} != table arity ${names.length}")
        // SQL INSERT matches by POSITION unless BY NAME — rename to the
        // table's schema so the writer's drift check compares like names
        if (i.byName) data0 else data0.toDF(names.toIndexedSeq: _*)
      }
    val v =
      if (i.overwrite) Snapshots.commit(spark, data, root)
      else Snapshots.append(spark, data, root)
    receipt(spark, v, Snapshots.versionMeta(spark, root, v).nRows)
  }

  /** `DESCRIBE DETAIL` — the one-row operational summary
    * ([[Snapshots.detail]]): version, rows, files, bytes, layouts,
    * policy counts. Listing metadata only.
    */
  private def runDetail(spark: SparkSession, root: String): DataFrame =
    Snapshots.detail(spark, root)

  /** `SHOW CREATE TABLE` — one row per statement of the executable
    * re-creation script ([[Snapshots.createTableStmts]]).
    */
  private def runShowCreate(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    Snapshots.createTableStmts(spark, root).toDF("stmt")
  }

  /** Partition INSERT (Hive/Spark's `PARTITION (k='v', d)` clause):
    * the SELECT supplies the non-spec'd columns positionally, then
    * any DYNAMIC partition columns (spec'd without a value) LAST in
    * table-partition order — Hive's shape; each static value fills
    * its column as a cast literal, and every column store-assigns to
    * the table's logged type. `INSERT INTO` appends. `INSERT
    * OVERWRITE` with a fully static spec routes to
    * [[Snapshots.replacePartition]] — the atomic partition reload
    * that carries every other partition's files by reference and, on
    * a cleanly partitioned table, reads zero pre-existing bytes;
    * with dynamic columns it routes to
    * [[Snapshots.replacePartitions]], which replaces exactly the
    * partition tuples PRESENT in the data (Spark's
    * `partitionOverwriteMode=dynamic` contract, capped by the
    * dynamic-partition guard). A fully static `IF NOT EXISTS`
    * overwrite SKIPS as a no-op when the partition already holds
    * rows (Hive's contract) — the emptiness probe is path-first and
    * scans at most the one partition's ambiguous files.
    */
  private def runPartitionInsert(spark: SparkSession, i: InsertIntoStatement,
                                 root: String): DataFrame = {
    val v0 = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed versions"))
    val m = Snapshots.versionMeta(spark, root, v0)
    val schema = Snapshots.read(spark, root).schema
    val dynSet = i.partitionSpec.collect { case (c, None) => c }.toSet
    // dynamic columns evaluate in TABLE PARTITION ORDER — Hive's rule
    // (the PARTITION clause must list them in layout order anyway),
    // and the parsed spec is a Map, which keeps no order of its own
    val dyn = m.parts.filter(dynSet.contains)
    require(dyn.size == dynSet.size,
      s"snap: dynamic partition columns ${(dynSet -- m.parts.toSet).mkString(",")} " +
        s"are not partition columns of $root (${m.parts})")
    require(dyn.isEmpty || i.overwrite,
      "snap: dynamic PARTITION columns need INSERT OVERWRITE — a plain " +
        "INSERT INTO already takes partition values from the data")
    require(!i.ifPartitionNotExists || dyn.isEmpty,
      "snap: IF NOT EXISTS combines only with a fully static PARTITION spec")
    val spec: Map[String, org.apache.spark.sql.Column] =
      i.partitionSpec.collect { case (c, Some(raw)) =>
        require(m.parts.contains(c),
          s"snap: $c is not a partition column of $root (${m.parts})")
        val f = schema.find(_.name == c).getOrElse(throw new
            IllegalArgumentException(s"snap: unknown column $c"))
        c -> org.apache.spark.sql.functions.lit(raw).cast(f.dataType)
      }.toMap
    val rest = schema.fieldNames.filterNot(c =>
      spec.contains(c) || dynSet.contains(c))
    val data0 = GraftShim.ofRows(spark, ResolveSnapshotTable(spark)(i.query))
    require(data0.columns.length == rest.length + dyn.length,
      s"snap: INSERT PARTITION arity ${data0.columns.length} != " +
        s"${rest.length} non-partition + ${dyn.length} dynamic columns")
    val data = spec.foldLeft(data0.toDF((rest ++ dyn).toIndexedSeq: _*)) {
        case (d, (c, value)) => d.withColumn(c, value)
      }
      // ANSI store assignment: every column casts to the logged type
      // (a trivial cast folds away; a long SELECT into an int table
      // must not silently write long-typed files)
      .select(schema.fields.toSeq.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
          .as(f.name)): _*)
    if (i.overwrite) {
      // row accounting for carried files rides the stats index; an
      // index built on ANY columns carries the needed n_rows, so
      // reuse the table's existing index columns (or bootstrap one
      // on the partition columns)
      import spark.implicits._
      if (i.ifPartitionNotExists &&
          Snapshots.partitionNonEmpty(spark, root, spec))
        // Hive's IF NOT EXISTS: the partition already holds rows —
        // the overwrite skips as a no-op, no new version
        return Seq((v0, 0, 0, 0L))
          .toDF("version", "files_rewritten", "files_total", "rows_written")
      val statsCols = Snapshots.statsTableOf(spark, root, v0)
        .map(_.columns.toSeq.collect {
          case c if c.startsWith("min_") => c.stripPrefix("min_")
        }).filter(_.nonEmpty)
        .getOrElse((spec.keys.toSeq ++ dyn).distinct)
      val r =
        if (dyn.isEmpty)
          Snapshots.replacePartition(spark, data, root, spec, statsCols)
        else Snapshots.replacePartitions(spark, data, root,
          spec.keys.toSeq ++ dyn, statsCols)
      Seq((r.version, r.filesRewritten, r.filesTotal, r.rowsWritten))
        .toDF("version", "files_rewritten", "files_total", "rows_written")
    } else {
      val v = Snapshots.append(spark, data, root)
      receipt(spark, v, Snapshots.versionMeta(spark, root, v).nRows)
    }
  }

  private def runDelete(spark: SparkSession,
                        d: DeleteFromTable): DataFrame = {
    val root = tableRootOf(spark, d.table, "DELETE")
    // the parsed condition resolves against the table read at
    // analysis time (unresolved attrs/functions, the col() shape)
    val r = Snapshots.deleteWhere(spark, root,
      GraftShim.column(stripQualifiers(d.condition)))
    receipt(spark, r.version, r.rowsDeleted)
  }

  /** Single-table DML conditions/assignments may qualify columns with
    * the target's alias (`t.price`); the writer evaluates them
    * against a bare one-table frame, so qualifiers drop to the last
    * name part.
    */
  private def stripQualifiers(e: Expression): Expression = e.transform {
    case a: UnresolvedAttribute if a.nameParts.length > 1 =>
      UnresolvedAttribute(Seq(a.nameParts.last))
  }

  /** `UPDATE snap.\`/t\` SET c = e, ... [WHERE pred]` → the
    * merge-on-read [[Snapshots.updateWhere]]: zero pre-existing data
    * files rewritten; receipt = (version, rows_updated).
    */
  private def runUpdate(spark: SparkSession, u: UpdateTable): DataFrame = {
    import spark.implicits._
    val root = tableRootOf(spark, u.table, "UPDATE")
    val set = u.assignments.map { a =>
      val name = a.key match {
        case attr: UnresolvedAttribute => attr.nameParts.last
        case other => throw new IllegalArgumentException(
          s"snap: UPDATE SET targets must be plain columns, got $other")
      }
      name -> GraftShim.column(stripQualifiers(a.value))
    }
    val cond = u.condition.map(c => GraftShim.column(stripQualifiers(c)))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val r = Snapshots.updateWhere(spark, root, cond, set)
    Seq((r.version, r.rowsUpdated)).toDF("version", "rows_updated")
  }

  /** `MERGE INTO snap.\`/t\` t USING src u ON t.k = u.k ...` — the
    * full conditional clause vocabulary:
    *
    * {{{
    *   WHEN MATCHED [AND pred] THEN UPDATE SET * | SET c = e, ...
    *   WHEN MATCHED [AND pred] THEN DELETE
    *   WHEN NOT MATCHED [AND pred] THEN INSERT * | INSERT (cols) VALUES (...)
    *   WHEN NOT MATCHED BY SOURCE [AND pred] THEN UPDATE SET c = e | DELETE
    * }}}
    *
    * The bare upsert shape (unconditional UPDATE SET * + INSERT *)
    * routes to the stats-targeted copy-on-write [[Snapshots.merge]]
    * with its exact receipt; any richer clause set routes to
    * [[Snapshots.mergeClauses]] — same file targeting, clause
    * evaluation in declaration order — returning (version,
    * files_rewritten, files_total, rows_updated, rows_deleted,
    * rows_inserted). SEVERAL `WHEN NOT MATCHED` insert clauses
    * evaluate first-match-wins in declaration order (each unmatched
    * source row takes the first clause whose predicate passes), and
    * the receipt gains a per-clause count column. Shapes outside the
    * vocabulary (non-equality ON) refuse loudly — a half-guessed
    * merge on a 100 TB table is worse than no merge.
    */
  private def runMerge(spark: SparkSession, m: MergeIntoTable): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction,
      UpdateAction}
    import spark.implicits._
    val root = tableRootOf(spark, m.targetTable, "MERGE")
    val key = m.mergeCondition match {
      // the same fully-qualified reference on both sides (ON t.id =
      // t.id — a typo for t.id = s.id) must refuse, not silently run
      // an upsert; unqualified `ON id = id` stays legal (its only
      // sane reading IS target.id = source.id)
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          l: UnresolvedAttribute, r: UnresolvedAttribute)
          if l.nameParts.last == r.nameParts.last &&
            !(l.nameParts.length > 1 && l.nameParts == r.nameParts) =>
        l.nameParts.last
      case other => throw new IllegalArgumentException(
        "snap: MERGE ON must be target.<key> = source.<key> " +
          s"(one equality, same column name, distinct sides), got $other")
    }
    val src = GraftShim.ofRows(spark, ResolveSnapshotTable(spark)(m.sourceTable))
    // WHEN NOT MATCHED BY SOURCE — the dimension-sync clauses
    // (conditions/assignments reference target columns only; UPDATE
    // needs explicit SET — no source row exists for SET *)
    val nmbs: Seq[Snapshots.MatchedClause] = m.notMatchedBySourceActions.map {
      case UpdateAction(cond, assigns, _) =>
        Snapshots.MatchedUpdate(cond.map(GraftShim.column),
          Some(assigns.map { a =>
            val name = a.key match {
              case attr: UnresolvedAttribute => attr.nameParts.last
              case other => throw new IllegalArgumentException(
                s"snap: MERGE SET targets must be plain columns, got $other")
            }
            name -> GraftShim.column(a.value)
          }))
      case DeleteAction(cond) =>
        Snapshots.MatchedDelete(cond.map(GraftShim.column))
      case other => throw new IllegalArgumentException(
        "snap: WHEN NOT MATCHED BY SOURCE supports UPDATE SET c = e " +
          s"and DELETE, got $other")
    }
    // ONE metadata read per statement: the router probes the latest
    // (version, meta) pair once — the schema routes upsert-vs-clauses
    // (the bare upsert fast path replaces whole rows, so it needs the
    // FULL table schema; a column-subset source routes to the clause
    // form, whose UPDATE keeps unnamed columns), the tombstone
    // refusal names MERGE, and the SAME pair rides down as the merge
    // body's first-attempt meta (a stale hint just loses the publish
    // race, which re-reads fresh)
    val hint = {
      val v0 = Snapshots.latestVersion(spark, root).getOrElse(
        throw new IllegalArgumentException(
          s"$root has no committed versions"))
      (v0, Snapshots.versionMeta(spark, root, v0))
    }
    val isPlainUpsert =
      m.matchedActions == Seq(UpdateStarAction(None)) &&
        m.notMatchedActions == Seq(InsertStarAction(None)) &&
        nmbs.isEmpty && !m.withSchemaEvolution &&
        src.columns.toSet == Snapshots.tableSchemaOf(spark, root,
          hint._1, hint._2, "MERGE").fieldNames.toSet
    if (isPlainUpsert) {
      val r = Snapshots.merge(spark, src, root, key, statsCols = Seq(key),
        metaHint = Some(hint))
      Seq((r.version, r.filesRewritten, r.filesTotal, r.rowsWritten))
        .toDF("version", "files_rewritten", "files_total", "rows_written")
    } else {
      val matched: Seq[Snapshots.MatchedClause] = m.matchedActions.map {
        case UpdateStarAction(cond) =>
          Snapshots.MatchedUpdate(cond.map(GraftShim.column), None)
        case UpdateAction(cond, assigns, _) =>
          Snapshots.MatchedUpdate(cond.map(GraftShim.column),
            Some(assigns.map { a =>
              val name = a.key match {
                case attr: UnresolvedAttribute => attr.nameParts.last
                case other => throw new IllegalArgumentException(
                  s"snap: MERGE SET targets must be plain columns, got $other")
              }
              name -> GraftShim.column(a.value)
            }))
        case DeleteAction(cond) =>
          Snapshots.MatchedDelete(cond.map(GraftShim.column))
        case other => throw new IllegalArgumentException(
          s"snap: unsupported WHEN MATCHED action $other")
      }
      // insert clauses, star or explicit column list, in declaration
      // order — SEVERAL conditional clauses evaluate first-match-wins
      // (SQL MERGE's multi-insert rule: route unmatched rows to
      // different defaults by predicate); the column-list form
      // (`INSERT (cols) VALUES (exprs)`, the shape generated SQL
      // tools emit) routes its assignments through the NULL-fill
      // machinery
      val inserts: Seq[Snapshots.InsertClause] = m.notMatchedActions.map {
        case InsertStarAction(cond) =>
          Snapshots.InsertClause(cond.map(GraftShim.column), None)
        case InsertAction(cond, assigns) =>
          Snapshots.InsertClause(cond.map(GraftShim.column),
            Some(assigns.map { a =>
              val name = a.key match {
                case attr: UnresolvedAttribute => attr.nameParts.last
                case other => throw new IllegalArgumentException(
                  s"snap: MERGE INSERT columns must be plain names, got $other")
              }
              name -> GraftShim.column(a.value)
            }))
        case other => throw new IllegalArgumentException(
          "snap: MERGE inserts must be WHEN NOT MATCHED [AND pred] " +
            s"THEN INSERT * | INSERT (cols) VALUES (...), got $other")
      }
      val r = Snapshots.mergeClauses(spark, src, root, key, Seq(key),
        aliasOf(m.targetTable, "t"), aliasOf(m.sourceTable, "u"),
        matched, None, nmbs, evolveSchema = m.withSchemaEvolution,
        inserts = inserts, metaHint = Some(hint))
      val base = Seq((r.version, r.filesRewritten, r.filesTotal,
          r.rowsUpdated, r.rowsDeleted, r.rowsInserted))
        .toDF("version", "files_rewritten", "files_total", "rows_updated",
          "rows_deleted", "rows_inserted")
      // the multi-insert statement's receipt carries the first-match-
      // wins routing breakdown (one count per clause, declaration
      // order); single-clause receipts keep their documented shape
      if (inserts.size >= 2)
        base.withColumn("rows_inserted_by_clause",
          org.apache.spark.sql.functions.lit(
            r.insertedPerClause.mkString(",")))
      else base
    }
  }

  /** The statement alias of a DML side (`MERGE INTO snap.\`/t\` t`)
    * — clause conditions resolve through it; a side written without
    * an alias gets `fallback` (conditions must then use unqualified
    * or fallback-qualified names).
    */
  private def aliasOf(plan: LogicalPlan, fallback: String): String =
    plan match {
      case SubqueryAlias(id, _) => id.name
      case _ => fallback
    }
}
