package graft.sources

import org.w3c.dom.Element

import scala.collection.mutable

/** Minimal native XLSX reader — closes the reference's one remaining
  * source-surface gap (B16 reads uploads with `pd.read_excel`,
  * ref: backend/app.py:198) WITHOUT external dependencies: an .xlsx is
  * a ZIP of XML, and the JDK ships both `java.util.zip` and
  * `javax.xml.parsers`. Supported surface = what an upload sheet
  * contains: one worksheet, a header row, shared / inline / formula
  * strings, numbers, booleans, dates-as-serials (numeric cells whose
  * style resolves to a date/time number format surface as ISO strings,
  * matching what the reference's `pd.read_excel` hands downstream),
  * and sheet selection by name (default: first sheet in workbook
  * order, pandas' `sheet_name=0`). Not supported (loudly out of
  * scope): streaming XML for multi-GB workbooks — upload ingestion is
  * a driver-side, bounded, single-small-file read in the reference too
  * (Flask + pandas on the web tier); the DISTRIBUTED ingest paths
  * remain CSV/JSON/parquet.
  */
object ExcelIngest {

  /** Built-in OOXML number-format ids that render as dates/times
    * (ECMA-376 §18.8.30): 14–22 date/time, 27–36 locale calendars,
    * 45–47 elapsed-time. Custom formats (id >= 164) are classified by
    * their format code instead. */
  private val BuiltinDateFmts: Set[Int] = ((14 to 22) ++ (27 to 36) ++ (45 to 47)).toSet

  /** Does a custom format code render a date/time? After stripping
    * quoted literals, [bracketed] sections, and backslash-escaped
    * chars, any remaining y/m/d/h/s token is a date or time field
    * (m is month-or-minute — either way a date/time format); pure
    * numeric formats ("0.00", "#,##0") contain none. */
  private[sources] def isDateFormat(code: String): Boolean = {
    val clean = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "")
    clean.exists(c => c == 'y' || c == 'Y' || c == 'm' || c == 'M' ||
      c == 'd' || c == 'D' || c == 'h' || c == 'H' || c == 's' || c == 'S')
  }

  /** Excel date serial → ISO-8601 string. Serials count days from the
    * 1899-12-30 epoch (the epoch choice absorbs Excel's phantom
    * 1900-02-29 for every date after Feb 1900 — the only serials real
    * upload workbooks contain); the fraction is the time of day.
    * Whole serials render date-only, like pandas' midnight Timestamps. */
  private[sources] def serialToIso(serial: Double): String = {
    val days = math.floor(serial).toLong
    val date = java.time.LocalDate.of(1899, 12, 30).plusDays(days)
    val secs = math.round((serial - days) * 86400.0)
    if (secs == 0L) date.toString
    else if (secs >= 86400L) date.plusDays(1).toString
    else date.atStartOfDay.plusSeconds(secs)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  /** "BC23" → 0-based column index 54. */
  private[sources] def colIndex(ref: String, fallback: Int): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    if (acc == 0) fallback else acc - 1
  }

  /** Parse one sheet of an .xlsx into rows of nullable strings (ragged
    * rows padded with null to each row's own width; callers align
    * widths). `sheet = None` reads the FIRST sheet in workbook order
    * (pandas' default); `Some(name)` selects by tab name. */
  def readRows(path: String, sheet: Option[String] = None): Seq[Array[String]] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      def parse(name: String): Option[org.w3c.dom.Document] =
        Option(zf.getEntry(name)).map { e =>
          val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
          f.setNamespaceAware(false)
          // no external entity resolution — the workbook is untrusted input
          f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
          f.newDocumentBuilder().parse(zf.getInputStream(e))
        }
      val shared: IndexedSeq[String] = parse("xl/sharedStrings.xml").map { d =>
        val sis = d.getElementsByTagName("si")
        (0 until sis.getLength).map { i =>
          // rich-text runs: concatenate every <t> under the <si>
          val ts = sis.item(i).asInstanceOf[Element].getElementsByTagName("t")
          (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
        }.toIndexedSeq
      }.getOrElse(IndexedSeq.empty)
      // style index → "is a date/time style", from xl/styles.xml cellXfs
      // (cells reference styles by position via their s attribute)
      val dateStyle: IndexedSeq[Boolean] = parse("xl/styles.xml").map { d =>
        val custom = {
          val nf = d.getElementsByTagName("numFmt")
          (0 until nf.getLength).map { i =>
            val e = nf.item(i).asInstanceOf[Element]
            e.getAttribute("numFmtId").toInt -> e.getAttribute("formatCode")
          }.toMap
        }
        val cellXfs = d.getElementsByTagName("cellXfs")
        if (cellXfs.getLength == 0) IndexedSeq.empty
        else {
          val xfs = cellXfs.item(0).asInstanceOf[Element].getElementsByTagName("xf")
          (0 until xfs.getLength).map { i =>
            val idStr = xfs.item(i).asInstanceOf[Element].getAttribute("numFmtId")
            val id = if (idStr.isEmpty) 0 else idStr.trim.toInt
            BuiltinDateFmts(id) || custom.get(id).exists(isDateFormat)
          }.toIndexedSeq
        }
      }.getOrElse(IndexedSeq.empty)
      // resolve the sheet via xl/workbook.xml (tab order + names) and the
      // workbook rels (r:id → worksheets/sheetN.xml); fall back to the
      // conventional sheet1.xml only for workbooks without a manifest
      val sheetPath: String = parse("xl/workbook.xml").flatMap { wb =>
        val rels: Map[String, String] = parse("xl/_rels/workbook.xml.rels").map { d =>
          val rs = d.getElementsByTagName("Relationship")
          (0 until rs.getLength).map { i =>
            val e = rs.item(i).asInstanceOf[Element]
            e.getAttribute("Id") -> e.getAttribute("Target")
          }.toMap
        }.getOrElse(Map.empty)
        val ss = wb.getElementsByTagName("sheet")
        val entries = (0 until ss.getLength).map { i =>
          val e = ss.item(i).asInstanceOf[Element]
          e.getAttribute("name") -> e.getAttribute("r:id")
        }
        val chosen = sheet match {
          case Some(n) => Some(entries.find(_._1 == n).getOrElse(
            throw new IllegalArgumentException(
              s"$path: no sheet named '$n' — workbook has " +
                entries.map(_._1).mkString("[", ", ", "]"))))
          case None => entries.headOption
        }
        chosen.flatMap { case (_, rid) => rels.get(rid) }
          .map(t => if (t.startsWith("/")) t.drop(1)
            else if (t.startsWith("xl/")) t else "xl/" + t)
      }.getOrElse {
        sheet.foreach(n => throw new IllegalArgumentException(
          s"$path: sheet '$n' requested but the workbook has no xl/workbook.xml manifest"))
        "xl/worksheets/sheet1.xml"
      }
      val sheetDoc = parse(sheetPath).getOrElse(
        throw new IllegalArgumentException(s"$path: no $sheetPath — not an .xlsx?"))
      val rowNodes = sheetDoc.getElementsByTagName("row")
      (0 until rowNodes.getLength).map { r =>
        val cells = rowNodes.item(r).asInstanceOf[Element].getElementsByTagName("c")
        val m = mutable.Map[Int, String]()
        (0 until cells.getLength).foreach { ci =>
          val c = cells.item(ci).asInstanceOf[Element]
          val idx = colIndex(c.getAttribute("r"), ci)
          def tag(name: String): Option[String] = {
            val ns = c.getElementsByTagName(name)
            if (ns.getLength > 0) Some(ns.item(0).getTextContent) else None
          }
          val v = c.getAttribute("t") match {
            case "s"         => tag("v").flatMap(s => shared.lift(s.trim.toInt)).orNull
            case "inlineStr" =>
              // rich-text runs: concatenate every <t> under the cell's
              // <is>, mirroring the sharedStrings handling above
              val ts = c.getElementsByTagName("t")
              if (ts.getLength == 0) null
              else (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
            case "b"         => tag("v").map(s => if (s.trim == "1") "true" else "false").orNull
            case "" | "n" => // numeric: date-styled serials surface as ISO
              tag("v").map { s =>
                val styled = c.getAttribute("s") match {
                  case "" => false
                  case si => dateStyle.lift(si.trim.toInt).getOrElse(false)
                }
                if (styled) s.trim.toDoubleOption.map(serialToIso).getOrElse(s) else s
              }.orNull
            case _           => tag("v").orNull // t="str" formula strings etc.
          }
          if (v != null) m(idx) = v
        }
        val width = if (m.isEmpty) 0 else m.keys.max + 1
        Array.tabulate(width)(i => m.getOrElse(i, null))
      }.filter(_.nonEmpty)
    } finally zf.close()
  }
}
