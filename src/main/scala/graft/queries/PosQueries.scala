package graft.queries

import graft.etl.{Categorize, Extract, Pos, Transform}
import org.apache.spark.sql.functions._
import QueryDefs._

/** End-to-end parity queries: the synthetic POS report (Pos) through
  * the full E2 transform (Transform) — the reference pipeline
  * `main.py:95-407` + F5 routing — checked against a DuckDB oracle
  * that mirrors the entire dataflow (synthesis, explode, extraction,
  * the real flavor vocabulary, the real 131-entry product dim,
  * corrections, payment, coercion, validation) in SQL. The oracle's
  * vocabulary fragments are GENERATED from the same Scala Seqs the
  * engine uses ([[graft.etl.Extract.pastryFlavorList]],
  * [[graft.etl.Categorize.referenceDim]], [[graft.etl.Pos]] picks),
  * so engine and oracle cannot drift.
  */
object PosQueries {

  /** q37/q38/q42 are routes of one pipeline run — cache the pre-split
    * fact frame per (session, dir) so later queries reuse the first's
    * computation (engine-level table caching, not a benchmark trick).
    * Caching a NEW dir for a session unpersists that session's other
    * entries (bounded footprint in long-lived sessions).
    */
  private val factCache =
    scala.collection.concurrent.TrieMap.empty[
      (org.apache.spark.sql.SparkSession, String),
      (org.apache.spark.sql.DataFrame, Transform.FactSplit)]

  private def split(s: org.apache.spark.sql.SparkSession, dir: String): Transform.FactSplit =
    factCache.get((s, dir)) match {
      case Some((_, routed)) => routed
      case None => factCache.synchronized {
        factCache.get((s, dir)) match {
          case Some((_, routed)) => routed
          case None =>
            factCache.keysIterator.filter(k => k._1 == s && k._2 != dir).toList
              .foreach(k => factCache.remove(k).foreach(_._1.unpersist()))
            // cache the PRE-split fact: both routes are cheap filters
            // over one materialization (caching the filtered sides
            // would make each side re-run the whole pipeline).
            val fact = Transform.transform(Pos.rawReport(s, dir), Transform.dimDF(s)).cache()
            val routed = Transform.route(fact)
            factCache.put((s, dir), (fact, routed))
            routed
        }
      }
    }

  /** Dev/profiling hook: the cached pipeline routes for a dir. */
  private[graft] def routes(s: org.apache.spark.sql.SparkSession,
                            dir: String): Transform.FactSplit = split(s, dir)

  /** Test/bench hook: drop and unpersist every cached fact. */
  def clearCache(): Unit = factCache.synchronized {
    factCache.keysIterator.toList
      .foreach(k => factCache.remove(k).foreach(_._1.unpersist()))
  }

  val queries: Map[String, Q] = Map(
    // q37 — E2 flagship: clean-path aggregate signature of the whole
    // pipeline (any divergence in any operator shifts these groups).
    "q37_pos_pipeline" -> ((s, dir) => {
      split(s, dir).clean
        .groupBy("category", "sub_category", "payment_type", "order_type")
        .agg(count(lit(1)).as("n"),
          moneySum(col("quantity")).as("sum_qty"),
          moneySum(col("total_order_amount")).as("total"))
        .orderBy("category", "sub_category", "payment_type", "order_type")
    }),

    // q38 — F5 quarantine path, row-level: unmapped items (null
    // category: 'Mystery Box', 'Croissant - Matcha') + negative
    // amounts.
    "q38_pos_quarantine" -> ((s, dir) => {
      split(s, dir).quarantine
        .select("order_id", "items", "sub_category", "category",
          "quantity", "total_order_amount")
        .orderBy("order_id", "items", "quantity")
    }),

    // q42 — S6/J1: in-Spark star-schema normalization over the clean
    // fact — all FKs must resolve, so the joined row count equals the
    // fact count and dim cardinalities match the distincts.
    "q42_star_schema" -> ((s, dir) => {
      val star = graft.etl.Load.normalizeStar(split(s, dir).clean)
      val joined = star.fact
        .join(broadcast(star.dimItem), Seq("item_id"))
        .join(broadcast(star.dimPayment), Seq("payment_type_id"))
        .join(broadcast(star.dimOrderType), Seq("order_type_id"))
      joined.agg(
        count(lit(1)).as("n_fact"),
        countDistinct(col("items")).as("n_items"),
        countDistinct(col("payment_type")).as("n_payment_types"),
        countDistinct(col("order_type")).as("n_order_types"),
        moneySum(col("quantity")).as("sum_qty"))
    }),

    // q52 — M1/M2/R7-R10 golden-vocabulary fixture: real reference
    // item strings (dict keys, pastry renames, the corrections entry,
    // the 'Biscoff tiramisu' pre-title-case quirk) flow through the
    // full Transform; the oracle recomputes independently in DuckDB
    // over the same inline fixture.
    "q52_reference_vocab" -> ((s, dir) => {
      import s.implicits._
      val raw = vocabFixture.zipWithIndex.map { case (products, i) =>
        ((i + 1).toString, products, "1,234.50", "1,234.50",
          "2026-01-01 10:00:00", "1234.50", "-", "Dine-in")
      }.toDF("Order ID", "Products", "Product amount", "Received amount",
        "Payment time", "Cash", "Gcash", "Type/Channel")
      Transform.transform(raw, Transform.dimDF(s))
        .select("order_id", "items", "sub_category", "category",
          "size", "variation", "flavor", "sugar_level", "spice_level", "quantity")
        .orderBy("order_id", "items", "quantity")
    }))

  /** Real reference item strings (one Products blob per synthetic
    * order): every vocabulary section of `main.py:186-330` is hit,
    * plus each miss path.
    */
  val vocabFixture: Seq[String] = Seq(
    // beverages with paren modifiers; the corrections entry; size/sugar extracts
    "Spanish Latte (Solo) (Hot) (Sugar 50%) x2,Fruit Lemonade w/Popping Pearls (Familia) (Cold),Americano (Duo) (Hot)",
    // pastry renames across all three categories + cookie-strip flavors
    "Almond Nutella Croffle x1,Spam and Egg Croissant,Nutella Pecan Cookies x3,Chip and Chunk Walnut Cookies",
    // food + spice parens; appetizer flavor (R3); add-ons
    "Nachos (Mild (1/4)) x2,French Fries (Cheese),Extra Rice x5,Candle + Topper Set - Big Candle + Big Bday T.",
    // desserts incl. the lowercase 'Biscoff tiramisu' dict quirk
    "Biscoff tiramisu,Ube Cheesecake x2,Garnet Velvet,Banana Bread",
    // miss paths: dict miss, pastry dict miss, unknown flavor (null → dropped)
    "Mystery Box x9,Matcha Croissant,Durian Croffle x4",
    // milk-based single-word keys + hot tea
    "Chocolate (Medio) (Cold) x6,Matcha (Solo) (Hot),Peppermint,Coke in Can",
    // case-sensitivity pins: uppercase X2 is NOT a quantity token and
    // NOT stripped (dict miss keeps the row, unmapped); lowercase
    // sugar token title-cases on extraction
    "Oreo Milk X2 (Solo),Matcha (solo) (sugar 50%) x3")

  // ---- DuckDB mirror ----

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
  private def sqlList(xs: Seq[String]): String = xs.map(sqlStr).mkString("[", ", ", "]")
  /** Mirror of Pos.pick: element_at(list, key % size + 1). */
  private def pickSql(xs: Seq[String], key: String): String =
    s"list_extract(${sqlList(xs)}, CAST($key % ${xs.size} AS INT) + 1)"

  private def ucfirst(x: String): String =
    s"(upper(substr($x, 1, 1)) || lower(substr($x, 2)))"

  private def ext(pat: String): String =
    s"NULLIF(regexp_extract(item, '(?i)$pat', 1), '')"

  private val grouped = (e: String) =>
    s"regexp_replace(CAST(CAST($e AS DECIMAL(12,2)) AS VARCHAR), '^(\\d+)(\\d{3}\\.)', '\\1,\\2')"

  /** The reference 18-flavor alternation (`main.py:146-153`) — order
    * preserved; entries are alternation-safe (no regex
    * metacharacters), so a raw join mirrors Spark's quoted pattern.
    */
  private val pastryFlavorPat =
    Extract.pastryFlavorList.mkString("(", "|", ")")

  private val catExtract = ucfirst(s"lower(${ext("(croissant|croffle|cookies|cookie)")})")

  /** Exact mirror of Extract.pastryFlavor: original-case extract,
    * global case-insensitive `\s*Cookie` strip, trim, ''→null.
    */
  private val flavorPart =
    s"trim(NULLIF(regexp_replace(regexp_extract(item, '(?i)$pastryFlavorPat', 1), '(?i)\\s*cookie', '', 'g'), ''))"

  /** Spark `initcap` mirror: per-space-delimited-word ucfirst+lower. */
  private def initcapSql(x: String): String =
    s"array_to_string(list_transform(string_split($x, ' '), w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ')"

  /** Exact-match corrections chain (pandas Series.replace parity). */
  private def correctionsSql(x: String): String =
    Extract.corrections.foldLeft(x) { case (acc, (from, to)) =>
      s"(CASE WHEN $acc = ${sqlStr(from)} THEN ${sqlStr(to)} ELSE $acc END)"
    }

  private val dimValues: String =
    Categorize.referenceDim
      .map { case (p, sc, c) => s"(${sqlStr(p)}, ${sqlStr(sc)}, ${sqlStr(c)})" }
      .mkString(",\n  ")

  /** R7-R10 clean-item expression, built WITHOUT stripMargin (a `||`
    * at a line start would be eaten by the enclosing template's
    * stripMargin — see graft-spark-gotchas).
    */
  private val cleanItemSql: String = correctionsSql(
    s"(CASE WHEN regexp_matches(item, '(?i)(croissant|croffle|cookies|cookie)') THEN " +
      s"(CASE WHEN $catExtract = 'Cookie' THEN 'Cookies' ELSE $catExtract END) || ' - ' || $flavorPart " +
      // the quantity strip is case-SENSITIVE (reference replace has no re.I)
      s"ELSE trim(regexp_replace(regexp_replace(item, 'x\\s*\\d+', '', 'g'), '\\s*\\(.*\\)', '', 'g')) END)")

  /** item → (extract columns + clean_item) SQL fragments, shared by
    * the synthetic pipeline and the q52 fixture oracle. Every
    * interpolated fragment is single-line, so the enclosing
    * stripMargin templates stay safe.
    */
  private val extractCols: String =
    s"""    ${ucfirst(s"lower(${ext("(solo|duo|medio|familia)")})")} AS size,
       |    ${ucfirst(s"lower(${ext("(hot|cold)")})")} AS variation,
       |    CASE WHEN regexp_matches(item, '(?i)(fries|lemonade)')
       |         THEN ${ucfirst(s"lower(${ext("(cheese|bbq|sour cream|plain|mango)")})")} END AS flavor,
       |    ${initcapSql(ext("(sugar 20%|sugar 50%|sugar 75%|sugar 100%)"))} AS sugar_level,
       |    ${initcapSql(ext("(mild \\(1/4\\)|regular \\(2/4\\)|spicy \\(3/4\\))"))} AS spice_level,
       |    COALESCE(TRY_CAST(NULLIF(regexp_extract(item, 'x\\s*(\\d+)', 1), '') AS DOUBLE), 1.0) AS quantity,
       |    $cleanItemSql AS clean_item""".stripMargin

  private val pipelineSql: String =
    s"""WITH li0 AS (
       |  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       |         ${pickSql(Pos.pastryCats, "l_orderkey")} AS pcat
       |  FROM lineitem),
       |li AS (
       |  SELECT l_orderkey, l_linenumber,
       |    (CASE WHEN l_partkey % 41 = 0 THEN 'Mystery Box'
       |          WHEN l_partkey % 4 = 0 THEN
       |            (CASE WHEN l_partkey % 48 = 0 THEN 'Durian'
       |                  WHEN pcat = 'Croissant' THEN ${pickSql(Pos.croissantFlavors, "l_suppkey")}
       |                  WHEN pcat = 'Croffle' THEN ${pickSql(Pos.croffleFlavors, "l_suppkey")}
       |                  ELSE ${pickSql(Pos.cookieFlavors, "l_suppkey")} END) || ' ' || pcat
       |          WHEN l_partkey % 4 = 1 THEN
       |            ${pickSql(Pos.foods, "l_suppkey")}
       |            || (CASE WHEN l_partkey % 3 = 0 THEN ' (' || ${pickSql(Pos.spices, "l_suppkey")} || ')' ELSE '' END)
       |          ELSE
       |            ${pickSql(Pos.beverages, "l_suppkey")}
       |            || ' (' || ${pickSql(Pos.sizes, "l_linenumber")} || ')'
       |            || (CASE WHEN l_suppkey % 2 = 0 THEN ' (Hot)' ELSE ' (Cold)' END)
       |            || (CASE WHEN l_partkey % 3 = 0 THEN ' (' || ${pickSql(Pos.sugars, "l_suppkey")} || ')' ELSE '' END)
       |     END) || (CASE WHEN l_linenumber % 7 = 0 THEN '' ELSE ' x' || CAST(l_linenumber AS VARCHAR) END) AS item
       |  FROM li0),
       |ord_items AS (
       |  SELECT l_orderkey, string_agg(item, ',' ORDER BY l_linenumber) AS products
       |  FROM li GROUP BY 1),
       |raw AS (
       |  SELECT CAST(o_orderkey AS VARCHAR) AS order_id, products,
       |    ${grouped("CASE WHEN o_orderkey % 97 = 0 THEN -1.0*o_totalprice ELSE o_totalprice END")} AS product_amount,
       |    ${grouped("o_totalprice")} AS received_amount_s,
       |    strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS payment_time,
       |    CASE WHEN o_orderstatus = 'F' THEN '0.00'
       |         WHEN o_orderstatus = 'O' THEN ${grouped("o_totalprice")}
       |         ELSE '-' END AS cash,
       |    CASE WHEN o_orderstatus = 'P' AND o_orderkey % 2 = 0
       |         THEN ${grouped("o_totalprice")} ELSE '-' END AS gcash,
       |    CASE WHEN o_orderkey % 3 = 0 THEN 'Dine-in'
       |         WHEN o_orderkey % 3 = 1 THEN 'Take-out'
       |         ELSE 'Delivery' END AS order_type
       |  FROM orders JOIN ord_items ON o_orderkey = l_orderkey),
       |raw_items AS (
       |  SELECT *, unnest(string_split(products, ',')) AS item0 FROM raw),
       |expl AS (
       |  SELECT * EXCLUDE (item0), trim(item0) AS item
       |  FROM raw_items WHERE trim(item0) <> ''),
       |ext AS (
       |  SELECT order_id, product_amount, received_amount_s, payment_time,
       |         cash, gcash, order_type, item,
       |$extractCols
       |  FROM expl),
       |dim(clean_item, sub_category, category) AS (VALUES
       |  $dimValues),
       |fact AS (
       |  SELECT order_id, ${initcapSql("e.clean_item")} AS items,
       |    d.sub_category, d.category,
       |    flavor, variation, size, quantity, sugar_level, spice_level,
       |    TRY_CAST(replace(product_amount, ',', '') AS DOUBLE) AS total_order_amount,
       |    TRY_CAST(replace(received_amount_s, ',', '') AS DOUBLE) AS received_amount,
       |    payment_time,
       |    CASE WHEN COALESCE(cash, 'nan') IN ('0.00','0') THEN 'Free/Voucher/Discounted'
       |         WHEN COALESCE(cash, 'nan') <> '-' THEN 'Cash'
       |         WHEN COALESCE(gcash, 'nan') <> '-' THEN 'Gcash'
       |         ELSE 'Credit / Debit' END AS payment_type,
       |    order_type
       |  FROM ext e LEFT JOIN dim d ON e.clean_item = d.clean_item
       |  WHERE e.clean_item IS NOT NULL),
       |flagged AS (
       |  SELECT *, (items IS NOT NULL AND sub_category IS NOT NULL AND category IS NOT NULL
       |             AND NOT COALESCE(quantity < 0, FALSE)
       |             AND NOT COALESCE(total_order_amount < 0, FALSE)
       |             AND NOT COALESCE(received_amount < 0, FALSE)) AS valid
       |  FROM fact)""".stripMargin

  /** q52 oracle: same extraction/mapping SQL over the inline fixture. */
  private val vocabSql: String = {
    val rawValues = vocabFixture.zipWithIndex
      .map { case (p, i) => s"(${sqlStr((i + 1).toString)}, ${sqlStr(p)})" }
      .mkString(",\n  ")
    s"""WITH raw(order_id, products) AS (VALUES
       |  $rawValues),
       |raw_items AS (
       |  SELECT *, unnest(string_split(products, ',')) AS item0 FROM raw),
       |expl AS (
       |  SELECT * EXCLUDE (item0), trim(item0) AS item
       |  FROM raw_items WHERE trim(item0) <> ''),
       |ext AS (
       |  SELECT order_id, item,
       |$extractCols
       |  FROM expl),
       |dim(clean_item, sub_category, category) AS (VALUES
       |  $dimValues)
       |SELECT order_id, ${initcapSql("e.clean_item")} AS items,
       |       d.sub_category, d.category,
       |       size, variation, flavor, sugar_level, spice_level, quantity
       |FROM ext e LEFT JOIN dim d ON e.clean_item = d.clean_item
       |WHERE e.clean_item IS NOT NULL
       |ORDER BY order_id, items, quantity""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // NOTE: pipelineSql is already margin-stripped — concatenate, do
    // not re-apply stripMargin (it would eat the leading '|' of '||'
    // continuation lines).
    "q37_pos_pipeline" -> (pipelineSql + "\n" +
      s"""SELECT category, sub_category, payment_type, order_type,
         |       COUNT(*) AS n, ${oraSum("quantity")} AS sum_qty,
         |       ${oraSum("total_order_amount")} AS total
         |FROM flagged WHERE valid
         |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin),
    "q38_pos_quarantine" -> (pipelineSql + "\n" +
      """SELECT order_id, items, sub_category, category, quantity, total_order_amount
        |FROM flagged WHERE NOT valid
        |ORDER BY order_id, items, quantity""".stripMargin),
    "q42_star_schema" -> (pipelineSql + "\n" +
      s"""SELECT COUNT(*) AS n_fact, COUNT(DISTINCT items) AS n_items,
         |       COUNT(DISTINCT payment_type) AS n_payment_types,
         |       COUNT(DISTINCT order_type) AS n_order_types,
         |       ${oraSum("quantity")} AS sum_qty
         |FROM flagged WHERE valid""".stripMargin),
    "q52_reference_vocab" -> vocabSql
  )
}
