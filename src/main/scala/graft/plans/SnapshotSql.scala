package graft.plans

import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
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
  * }}}
  *
  * INSERT enforces the table's logged CHECK constraints and schema
  * (positional column matching, SQL's default); DELETE writes a
  * deletion vector and ZERO data files ([[Snapshots.deleteWhere]]).
  * Both return a one-row frame (`version`, `n_rows`) — the commit
  * receipt. Catalog relations (`<cat>::<name>`) are read-only views
  * of pinned state and refuse DML.
  */
object SnapshotSql {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement}

  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    GraftShim.parsePlan(spark, sqlText) match {
      case i: InsertIntoStatement => runInsert(spark, i)
      case d: DeleteFromTable => runDelete(spark, d)
      case other =>
        GraftShim.ofRows(spark, ResolveSnapshotTable(spark)(other))
    }
  }

  private def tableRootOf(spark: SparkSession, plan: LogicalPlan,
                          op: String): String = plan match {
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
    require(i.userSpecifiedCols.isEmpty,
      "snap: INSERT column lists are not supported — match the table schema")
    val data0 = GraftShim.ofRows(spark,
      ResolveSnapshotTable(spark)(i.query))
    val names = Snapshots.read(spark, root).schema.fieldNames
    require(data0.columns.length == names.length,
      s"snap: INSERT arity ${data0.columns.length} != table arity ${names.length}")
    // SQL INSERT matches by POSITION unless BY NAME — rename to the
    // table's schema so the writer's drift check compares like names
    val data = if (i.byName) data0 else data0.toDF(names.toIndexedSeq: _*)
    val v =
      if (i.overwrite) Snapshots.commit(spark, data, root)
      else Snapshots.append(spark, data, root)
    receipt(spark, v, Snapshots.versionMeta(spark, root, v).nRows)
  }

  private def runDelete(spark: SparkSession,
                        d: DeleteFromTable): DataFrame = {
    val root = tableRootOf(spark, d.table, "DELETE")
    // the parsed condition resolves against the table read at
    // analysis time (unresolved attrs/functions, the col() shape)
    val r = Snapshots.deleteWhere(spark, root, GraftShim.column(d.condition))
    receipt(spark, r.version, r.rowsDeleted)
  }
}
