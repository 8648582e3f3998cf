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
  * reference. Not parsed (not in the reference's data): styles,
  * number formats, merged cells, formulas themselves.
  */
object Xlsx {

  /** Parse one workbook's bytes: the named sheet's rows as string
    * cells (None where a cell is absent), in sheet order.
    */
  def parseSheet(bytes: Array[Byte], sheetName: String): Seq[Seq[Option[String]]] = {
    val parts = readParts(bytes,
      p => p == "xl/workbook.xml" || p == "xl/_rels/workbook.xml.rels" ||
        p == "xl/sharedStrings.xml" || p.startsWith("xl/worksheets/sheet"))
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
    sheetRows(sheetXml, shared)
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
    val n = schema.length
    val out = StructType(StructField("_src_file", StringType) +: schema.fields.toIndexedSeq)
    val expected = schema.fieldNames.toSeq
    val rows = files.rdd.flatMap { r =>
      val path = r.getString(0)
      def parse(): Iterator[Row] = {
        val rowsOfFile = parseSheet(r.getAs[Array[Byte]](1), sheetName)
        if (rowsOfFile.isEmpty) Iterator.empty
        else {
          val header = rowsOfFile.head.map(_.getOrElse("").trim)
          require(header == expected,
            s"$path: sheet header $header != contract $expected")
          rowsOfFile.iterator.drop(1).map { cells =>
            val padded = (0 until n).map(i =>
              cells.lift(i).flatten.orNull)
            Row.fromSeq(path +: padded)
          }
        }
      }
      if (!skipCorrupt) parse()
      else try parse() catch { case scala.util.control.NonFatal(_) => Iterator.empty }
    }
    spark.createDataFrame(rows, out)
  }

  /** Paths under `dir` whose named sheet fails to parse — the
    * file-grained quarantine companion to `skipCorrupt` (metadata
    * pass over the same binaryFile source, executor-side).
    */
  def corruptFiles(spark: SparkSession, dir: String, sheetName: String): Seq[String] = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(dir)
      .select("path", "content")
    files.rdd.flatMap { r =>
      try { parseSheet(r.getAs[Array[Byte]](1), sheetName); None }
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

  /** "D5" → 0-based column 3. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** worksheet XML → rows of sparse string cells. */
  private[sources] def sheetRows(xml: Array[Byte],
                                 shared: Vector[String]): Seq[Seq[Option[String]]] = {
    val r = newReader(xml)
    val rows = Seq.newBuilder[Seq[Option[String]]]
    var row: scala.collection.mutable.ArrayBuffer[Option[String]] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var text = new StringBuilder
    def endCell(): Unit = if (row != null && cellCol >= 0) {
      val raw = text.toString
      val value = cellType match {
        case "s" =>
          val idx = raw.trim
          if (idx.isEmpty) None else shared.lift(idx.toInt)
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
