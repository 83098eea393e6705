package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal XLSX (Office Open XML spreadsheet) shard sink + reader — the
  * reference's Excel export surface (lib/BIGSdb/Utils.pm text2excel:
  * every exporter plugin offers query results as .xlsx), re-expressed as
  * a sharded sink: one workbook per shard id, written from the executor
  * that holds the shard's rows, read back in parallel via the binaryFile
  * source + a parsing expression (the [[WebDataset]] posture).
  *
  * The workbook is assembled by a pure-JVM writer (JDK java.util.zip, no
  * dependencies): the five mandatory OPC parts with fixed zip timestamps
  * and name-ordered entries, strings as inline-string cells (no shared-
  * strings table), numbers as native numeric cells — so the bytes are a
  * deterministic function of the rows, and any spreadsheet tool opens
  * the result. A shard is buffered in memory while its archive builds —
  * the same bounded-shard contract as the tar sink (Excel itself caps a
  * sheet at ~1M rows, so shards are small by construction).
  */
object Xlsx {

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  /** 0-based column index → A1-style letters. */
  def colLetters(c: Int): String = {
    var n = c + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cellXml(rowNum: Int, colIdx: Int, v: Any): String = {
    val ref = s"${colLetters(colIdx)}$rowNum"
    v match {
      case null => ""
      case s: String =>
        s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(s)}</t></is></c>"""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) =>
        s"""<c r="$ref"><v>$n</v></c>"""
      case d: java.math.BigDecimal => s"""<c r="$ref"><v>${d.toPlainString}</v></c>"""
      case other =>
        s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
    }
  }

  /** Worksheet XML: header row + data rows, all cells explicit. */
  def sheetXml(header: Seq[String], rows: Iterable[Seq[Any]]): String = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    sb ++= s"""<row r="1">"""
    header.zipWithIndex.foreach { case (h, c) => sb ++= cellXml(1, c, h) }
    sb ++= "</row>"
    var r = 2
    rows.foreach { cells =>
      sb ++= s"""<row r="$r">"""
      cells.zipWithIndex.foreach { case (v, c) => sb ++= cellXml(r, c, v) }
      sb ++= "</row>"
      r += 1
    }
    sb ++= "</sheetData></worksheet>"
    sb.toString
  }

  // fixed zip entry time (1980-01-01, the DOS-time epoch) → deterministic bytes
  private val ZipEpoch: Long = {
    val cal = new java.util.GregorianCalendar(1980, 0, 1, 0, 0, 0)
    cal.set(java.util.Calendar.MILLISECOND, 0)
    cal.getTimeInMillis
  }

  private val StaticParts: Seq[(String, String)] = Seq(
    "[Content_Types].xml" ->
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>"""),
    "_rels/.rels" ->
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""),
    "xl/workbook.xml" ->
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>""" +
        """</workbook>"""),
    "xl/_rels/workbook.xml.rels" ->
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>"""))

  /** Complete workbook bytes for one header + row set. */
  def xlsxBytes(header: Seq[String], rows: Iterable[Seq[Any]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    val parts = StaticParts :+ ("xl/worksheets/sheet1.xml" -> sheetXml(header, rows))
    parts.foreach { case (name, content) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(ZipEpoch)
      zip.putNextEntry(e)
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    zip.close()
    bos.toByteArray
  }

  // --- reader expression ------------------------------------------------

  import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

  /** Parse workbook bytes → rows of cell strings (header row included at
    * position 0; missing cells are null). DOM-based — the sheet is one
    * bounded shard by the sink contract.
    *
    * Accepts BOTH string encodings real workbooks use: the sink's
    * inline-string cells (`t="inlineStr"`) and the shared-strings table
    * (`t="s"` indices into `xl/sharedStrings.xml` — the form Excel itself
    * and most writer libraries emit). Rich-text shared entries (`<si>`
    * with multiple `<r><t>` runs) concatenate their runs, matching how
    * spreadsheet tools render them. Falls back to the first .xml part
    * under `xl/worksheets/` when the workbook doesn't name its sheet
    * `sheet1.xml`.
    */
  def rowsOfXlsx(bytes: Array[Byte]): ArrayData = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var sheet: Array[Byte] = null
    var anySheet: Array[Byte] = null
    var sstXml: Array[Byte] = null
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName == "xl/worksheets/sheet1.xml") sheet = zin.readAllBytes()
      else if (anySheet == null
          && e.getName.startsWith("xl/worksheets/")
          && e.getName.endsWith(".xml")) anySheet = zin.readAllBytes()
      else if (e.getName == "xl/sharedStrings.xml") sstXml = zin.readAllBytes()
      e = zin.getNextEntry
    }
    if (sheet == null) sheet = anySheet
    require(sheet != null, "no worksheet part in workbook")
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // shared-strings table: one entry per <si>, rich-text runs joined
    val sst: IndexedSeq[String] =
      if (sstXml == null) IndexedSeq.empty
      else {
        val sdoc = dbf.newDocumentBuilder()
          .parse(new java.io.ByteArrayInputStream(sstXml))
        val sis = sdoc.getElementsByTagName("si")
        (0 until sis.getLength).map { i =>
          val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element]
            .getElementsByTagName("t")
          (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
        }
      }
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(sheet))
    val rowNodes = doc.getElementsByTagName("row")
    val out = new Array[Any](rowNodes.getLength)
    var i = 0
    while (i < rowNodes.getLength) {
      val rowEl = rowNodes.item(i).asInstanceOf[org.w3c.dom.Element]
      val cellNodes = rowEl.getElementsByTagName("c")
      val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      var j = 0
      while (j < cellNodes.getLength) {
        val c = cellNodes.item(j).asInstanceOf[org.w3c.dom.Element]
        val ref = c.getAttribute("r")
        val colIdx = {
          var n = 0; var p = 0
          while (p < ref.length && ref.charAt(p).isLetter) {
            n = n * 26 + (ref.charAt(p) - 'A' + 1); p += 1
          }
          n - 1
        }
        val t = c.getAttribute("t")
        val value =
          if (t == "inlineStr") {
            val ts = c.getElementsByTagName("t")
            if (ts.getLength > 0) ts.item(0).getTextContent else ""
          } else if (t == "s") { // shared-string index
            val vs = c.getElementsByTagName("v")
            if (vs.getLength == 0) null
            else sst(vs.item(0).getTextContent.trim.toInt)
          } else {
            val vs = c.getElementsByTagName("v")
            if (vs.getLength > 0) vs.item(0).getTextContent else null
          }
        if (value != null) cells += ((colIdx, value))
        j += 1
      }
      val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
      val arr = new Array[Any](width)
      cells.foreach { case (ci, v) => arr(ci) = UTF8String.fromString(v) }
      out(i) = new GenericArrayData(arr)
      i += 1
    }
    new GenericArrayData(out)
  }

  case class XlsxRows(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(ArrayType(StringType, containsNull = true), containsNull = false)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      rowsOfXlsx(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.sources.Xlsx.rowsOfXlsx($c)")
  }

  private val B = org.apache.spark.sql.graft.ColumnBridge
  def xlsxRows(bytes: Column): Column = B.column(XlsxRows(B.expression(bytes)))

  // --- sink / source ----------------------------------------------------

  /** Write one `shard-NNNNN.xlsx` per distinct `shardCol` value (cast to
    * long). Columns other than `shardCol` become the sheet columns, in
    * schema order, with a header row of field names; rows within a shard
    * order by `sortCols` for byte determinism. Rows repartition by shard
    * and each workbook writes from the executor holding it.
    */
  def write(df: DataFrame, shardCol: String, sortCols: Seq[String],
      dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val staged = df.withColumn("__shard", col(shardCol).cast("long"))
      .drop(shardCol)
    val dataFields = staged.schema.fields.filter(_.name != "__shard")
    val header: Seq[String] = dataFields.map(_.name).toSeq
    val shardIdx = staged.schema.fieldIndex("__shard")
    val colIdxs: Seq[Int] = dataFields.map(f => staged.schema.fieldIndex(f.name)).toSeq
    staged
      .repartition(col("__shard"))
      .sortWithinPartitions(col("__shard") +: sortCols.map(col): _*)
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        var cur = Long.MinValue
        val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
        def flush(): Unit = if (buf.nonEmpty) {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, f"shard-$cur%05d.xlsx"),
            xlsxBytes(header, buf))
          buf.clear()
        }
        rows.foreach { r =>
          val s = r.getLong(shardIdx)
          if (s != cur) { flush(); cur = s }
          buf += colIdxs.map(r.get)
        }
        flush()
      }
  }

  /** Load workbooks in parallel; one row per sheet row: (path, rn, cells)
    * with rn 1-based (rn 1 = the header row), cells as strings.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    // pathGlobFilter, not a `*` glob path (see WebDataset.read: the glob
    // form makes FileStreamSink's metadata probe log a spurious WARN stack)
    spark.read.format("binaryFile").option("pathGlobFilter", "*.xlsx").load(dir)
      .select(col("path"), posexplode(xlsxRows(col("content"))))
      .withColumnRenamed("pos", "rn")
      .withColumnRenamed("col", "cells")
      .withColumn("rn", col("rn") + 1)
}
