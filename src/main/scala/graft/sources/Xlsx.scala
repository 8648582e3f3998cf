package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** S3: a REAL .xlsx sheet scan with no external dependency — an xlsx
  * is a zip of SpreadsheetML parts (ECMA-376), so the JDK's
  * ZipInputStream + StAX cover the reference's
  * `read_excel(..., sheet_name='Paid order list')` contract
  * (`main.py:98`).
  *
  * Scale shape: files load through the `binaryFile` source (one
  * task per workbook — matching the one-workbook-per-day cadence),
  * and each workbook parses ON THE EXECUTOR inside `flatMap`;
  * nothing routes through the driver, and many daily workbooks
  * parse in parallel. All cells surface as strings (the raw-report
  * contract types everything downstream, R13).
  *
  * Supported SpreadsheetML: shared strings (`t="s"`), inline
  * strings (`t="inlineStr"`), direct values (numeric / `t="str"`
  * formula results / booleans), sheet lookup by NAME through
  * workbook.xml + its rels part, sparse rows via the `r="D5"` cell
  * reference, and styles.xml number formats far enough to detect
  * DATE-formatted numeric cells and render their serial as an
  * ISO-8601 string (what `pd.read_excel`/openpyxl yields for the
  * reference's `Payment time`, `main.py:98,377` — without this a
  * date cell surfaces as a raw serial like `45678.604` that the
  * downstream contract would mis-parse). Not parsed (not in the
  * reference's data): merged cells, formulas themselves.
  */
object Xlsx {

  /** Parse one workbook's bytes: the named sheet's rows as string
    * cells (None where a cell is absent), in sheet order.
    */
  def parseSheet(bytes: Array[Byte], sheetName: String): Seq[Seq[Option[String]]] = {
    val parts = readParts(bytes,
      p => p == "xl/workbook.xml" || p == "xl/_rels/workbook.xml.rels" ||
        p == "xl/sharedStrings.xml" || p == "xl/styles.xml" ||
        p.startsWith("xl/worksheets/sheet"))
    val workbook = parts.getOrElse("xl/workbook.xml",
      sys.error("not an xlsx: missing xl/workbook.xml"))
    val rels = parts.getOrElse("xl/_rels/workbook.xml.rels",
      sys.error("not an xlsx: missing workbook rels"))
    val relId = sheetRelId(workbook, sheetName)
      .getOrElse(sys.error(s"sheet '$sheetName' not found in workbook"))
    val target = relTarget(rels, relId)
      .getOrElse(sys.error(s"no relationship target for $relId"))
    val sheetPath = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
    val sheetXml = parts.getOrElse(sheetPath,
      sys.error(s"worksheet part $sheetPath missing"))
    val shared = parts.get("xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(Vector.empty)
    val ds = parts.get("xl/styles.xml").map(dateStyles).getOrElse(Set.empty)
    sheetRows(sheetXml, shared, ds)
  }

  /** Named sheet of every .xlsx under `dir` as one DataFrame: first
    * row of each workbook is the header (validated identical across
    * workbooks), every cell a string + the source file path.
    *
    * With `skipCorrupt` (the reference's F1 behavior — an unreadable
    * workbook is skipped, the rest of the day's files still load,
    * `main.py:99-101`), files that fail to parse contribute zero
    * rows; list them with [[corruptFiles]] for quarantine/alerting.
    * With it off (default), a bad workbook fails the job loudly.
    */
  def readSheets(spark: SparkSession, dir: String, sheetName: String,
                 schema: StructType, skipCorrupt: Boolean = false): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(dir)
      .select("path", "content")
    sheetsOf(files, sheetName, schema, skipCorrupt)
  }

  /** Parse a `(path, content)` frame of workbook bytes (however it
    * was sourced — batch binaryFile scan or a STREAMING micro-batch)
    * into the named sheet's rows. Parsing runs executor-side in
    * flatMap; headers are validated against the contract.
    */
  def sheetsOf(files: DataFrame, sheetName: String, schema: StructType,
               skipCorrupt: Boolean = false): DataFrame = {
    val spark = files.sparkSession
    val n = schema.length
    val out = StructType(StructField("_src_file", StringType) +: schema.fields.toIndexedSeq)
    val expected = schema.fieldNames.toSeq
    val rows = files.select("path", "content").rdd.flatMap { r =>
      val path = r.getString(0)
      def parse(): Iterator[Row] = {
        val rowsOfFile = parseSheet(r.getAs[Array[Byte]](1), sheetName)
        // An empty parsed sheet is a contract violation like header
        // drift (corruptFiles applies the same rule): under
        // skipCorrupt it quarantines, otherwise it fails loudly —
        // never a silent zero-row load.
        require(rowsOfFile.nonEmpty, s"$path: empty sheet under a header contract")
        val header = rowsOfFile.head.map(_.getOrElse("").trim)
        require(header == expected,
          s"$path: sheet header $header != contract $expected")
        rowsOfFile.iterator.drop(1).map { cells =>
          val padded = (0 until n).map(i =>
            cells.lift(i).flatten.orNull)
          Row.fromSeq(path +: padded)
        }
      }
      if (!skipCorrupt) parse()
      else try parse() catch { case scala.util.control.NonFatal(_) => Iterator.empty }
    }
    spark.createDataFrame(rows, out)
  }

  /** Paths under `dir` whose named sheet `readSheets` would skip —
    * the file-grained quarantine companion to `skipCorrupt`
    * (metadata pass over the same binaryFile source, executor-side).
    * Runs the SAME validation as `readSheets`: parse AND (when a
    * `schema` is given) the header-contract check — a workbook whose
    * header drifted contributes zero rows under `skipCorrupt`, so it
    * must appear in this listing, not vanish silently.
    */
  def corruptFiles(spark: SparkSession, dir: String, sheetName: String,
                   schema: StructType = null): Seq[String] = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(dir)
      .select("path", "content")
    val expected = Option(schema).map(_.fieldNames.toSeq)
    files.rdd.flatMap { r =>
      try {
        val rows = parseSheet(r.getAs[Array[Byte]](1), sheetName)
        expected.foreach { exp =>
          // An empty parsed sheet contributes zero rows under
          // skipCorrupt just like a header drift does, so under a
          // schema contract it must surface here, not vanish.
          require(rows.nonEmpty,
            s"${r.getString(0)}: empty sheet under a header contract")
          require(rows.head.map(_.getOrElse("").trim) == exp,
            s"${r.getString(0)}: sheet header != contract")
        }
        None
      }
      catch { case scala.util.control.NonFatal(_) => Some(r.getString(0)) }
    }.collect().toSeq.sorted
  }

  // ---- SpreadsheetML parsing (pure JDK StAX) ----

  private def readParts(bytes: Array[Byte],
                        want: String => Boolean): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Byte](64 * 1024)
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory && want(e.getName)) {
        val bos = new java.io.ByteArrayOutputStream()
        var n = zin.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = zin.read(buf) }
        out += e.getName -> bos.toByteArray
      }
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  private def newReader(xml: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false) // no XXE
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(xml))
  }

  /** workbook.xml: <sheet name=".." r:id="rIdN"/> → rel id. */
  private[sources] def sheetRelId(workbook: Array[Byte], name: String): Option[String] = {
    val r = newReader(workbook)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet" &&
            r.getAttributeValue(null, "name") == name) {
          (0 until r.getAttributeCount).foreach { i =>
            if (r.getAttributeLocalName(i) == "id")
              return Some(r.getAttributeValue(i))
          }
        }
      }
      None
    } finally r.close()
  }

  /** workbook.xml.rels: rel id → worksheet part target. */
  private[sources] def relTarget(rels: Array[Byte], relId: String): Option[String] = {
    val r = newReader(rels)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            r.getAttributeValue(null, "Id") == relId)
          return Option(r.getAttributeValue(null, "Target"))
      }
      None
    } finally r.close()
  }

  /** sharedStrings.xml: the <si> string table, rich-text runs
    * concatenated (a formatted cell splits its text across <r><t>
    * runs).
    */
  private[sources] def sharedStrings(xml: Array[Byte]): Vector[String] = {
    val r = newReader(xml)
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText); ()
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += cur.toString; cur = null
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
      out.result()
    } finally r.close()
  }

  /** Built-in numFmtIds Excel defines as date/time formats
    * (ECMA-376 §18.8.30: 14-22 dates/times, 27-36 locale dates,
    * 45-47 durations rendered as times).
    */
  private val builtinDateFmtIds: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47)).toSet

  /** A format code is a date/time format iff it contains a y/m/d/h/s
    * token outside quoted literals, backslash escapes, and [bracket]
    * sections (colors/conditions — but elapsed-time [h]/[mm]/[ss]
    * brackets DO mean time, so they are probed before the strip) —
    * the openpyxl `is_date_format` approach.
    */
  private[graft] def isDateCode(code: String): Boolean = {
    val cleaned = code
      .replaceAll("\"[^\"]*\"", "") // quoted literals
      .replaceAll("\\\\.", "")      // escaped single chars
    if (cleaned.toLowerCase.matches(".*\\[(h+|m+|s+)\\].*")) return true // elapsed [h]/[mm]/[ss]
    val noBrackets = cleaned.replaceAll("\\[[^\\]]*\\]", "") // colors/conditions
    noBrackets.toLowerCase.exists(c => c == 'y' || c == 'm' || c == 'd' ||
      c == 'h' || c == 's')
  }

  /** styles.xml → the set of cellXfs indices (a cell's `s` attribute)
    * whose number format is a date/time format.
    */
  private[sources] def dateStyles(xml: Array[Byte]): Set[Int] = {
    val r = newReader(xml)
    val customDateIds = Set.newBuilder[Int]
    val xfFmtIds = Vector.newBuilder[Int]
    var inCellXfs = false
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
              val code = Option(r.getAttributeValue(null, "formatCode"))
              if (id.isDefined && code.exists(isDateCode)) customDateIds += id.get
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfFmtIds += Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.toInt).getOrElse(0)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
      val custom = customDateIds.result()
      xfFmtIds.result().zipWithIndex.collect {
        case (fmt, i) if builtinDateFmtIds(fmt) || custom(fmt) => i
      }.toSet
    } finally r.close()
  }

  private val excelEpoch = java.time.LocalDate.of(1899, 12, 30)
  private val isoFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Excel date serial → ISO-8601 string ("yyyy-MM-dd HH:mm:ss" —
    * what `str(datetime)` prints, midnight included, matching the
    * reference's pandas surface). Day 0 = 1899-12-30 (openpyxl's
    * epoch, which also absorbs Excel's 1900 leap-year bug for
    * serials ≥ 61); time of day is the fraction, rounded to the
    * nearest second.
    */
  private[sources] def serialToIso(serial: Double): String = {
    val days = math.floor(serial).toLong
    val secs = math.round((serial - days) * 86400.0)
    excelEpoch.atStartOfDay.plusDays(days).plusSeconds(secs).format(isoFmt)
  }

  /** "D5" → 0-based column 3. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** worksheet XML → rows of sparse string cells. Numeric cells
    * whose style index is in `dateStyles` render as ISO-8601.
    */
  private[sources] def sheetRows(xml: Array[Byte], shared: Vector[String],
                                 dateStyles: Set[Int] = Set.empty): Seq[Seq[Option[String]]] = {
    val r = newReader(xml)
    val rows = Seq.newBuilder[Seq[Option[String]]]
    var row: scala.collection.mutable.ArrayBuffer[Option[String]] = null
    var cellCol = -1
    var cellType = ""
    var cellStyle = -1
    var inV = false
    var text = new StringBuilder
    def endCell(): Unit = if (row != null && cellCol >= 0) {
      val raw = text.toString
      val value = cellType match {
        case "s" =>
          val idx = raw.trim
          if (idx.isEmpty) None else shared.lift(idx.toInt)
        // untyped/numeric ("n") cell in a date-formatted style:
        // stored value is a date serial — surface the ISO string the
        // reference's pandas read yields, not the raw serial
        case "" | "n" if dateStyles(cellStyle) && raw.nonEmpty =>
          raw.toDoubleOption.map(serialToIso).orElse(Some(raw))
        case _ => if (raw.isEmpty) None else Some(raw)
      }
      while (row.length <= cellCol) row += None
      row(cellCol) = value
      cellCol = -1
    }
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = scala.collection.mutable.ArrayBuffer.empty
            case "c" =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref != null) colIndex(ref)
                        else if (row == null) -1 else row.length
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellStyle = Option(r.getAttributeValue(null, "s"))
                .flatMap(_.toIntOption).getOrElse(-1)
              text = new StringBuilder
            case "v" | "t" => inV = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV =>
          text.append(r.getText); ()
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" => inV = false
            case "c" => endCell()
            case "row" => rows += row.toSeq; row = null
            case _ =>
          }
        case _ =>
      }
      rows.result()
    } finally r.close()
  }
}
