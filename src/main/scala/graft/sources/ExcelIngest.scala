package graft.sources

import org.w3c.dom.Element

import scala.collection.mutable

/** Minimal native XLSX reader — closes the reference's one remaining
  * source-surface gap (B16 reads uploads with `pd.read_excel`,
  * ref: backend/app.py:198) WITHOUT external dependencies: an .xlsx is
  * a ZIP of XML, and the JDK ships both `java.util.zip` and
  * `javax.xml.parsers`. Supported surface = what an upload sheet
  * contains: one worksheet, a header row, shared / inline / formula
  * strings, numbers, booleans. Not supported (loudly out of scope):
  * dates-as-serials, styles, multiple sheets, streaming XML for
  * multi-GB workbooks — upload ingestion is a driver-side, bounded,
  * single-small-file read in the reference too (Flask + pandas on the
  * web tier); the DISTRIBUTED ingest paths remain CSV/JSON/parquet.
  */
object ExcelIngest {

  /** "BC23" → 0-based column index 54. */
  private[sources] def colIndex(ref: String, fallback: Int): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    if (acc == 0) fallback else acc - 1
  }

  /** Parse sheet1 of an .xlsx into rows of nullable strings (ragged rows
    * padded with null to each row's own width; callers align widths). */
  def readRows(path: String): Seq[Array[String]] = {
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
      val sheet = parse("xl/worksheets/sheet1.xml").getOrElse(
        throw new IllegalArgumentException(s"$path: no xl/worksheets/sheet1.xml — not an .xlsx?"))
      val rowNodes = sheet.getElementsByTagName("row")
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
            case _           => tag("v").orNull // numbers and t="str" formula strings
          }
          if (v != null) m(idx) = v
        }
        val width = if (m.isEmpty) 0 else m.keys.max + 1
        Array.tabulate(width)(i => m.getOrElse(i, null))
      }.filter(_.nonEmpty)
    } finally zf.close()
  }
}
