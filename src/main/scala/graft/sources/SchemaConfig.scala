package graft.sources

import org.apache.spark.sql.types._

/** Dynamic, config-driven entity schema (SURVEY §2.1 S2 / §7.4 hard-part 4).
  *
  * The reference's isolate table schema is declared per deployment in XML
  * (xml/isolates_config.xml, parsed by lib/BIGSdb/Parser.pm:155-328): each
  * field carries a type, optional `multiple="yes"` (array), `required`,
  * an optlist, and a validation regex. The engine equivalent builds a
  * StructType at startup from the same declaration shape — everything
  * downstream (QueryCompiler, predicates) is schema-driven, never
  * hard-coded.
  *
  * Parsed with the JDK's DOM parser — no external dependency.
  */
object SchemaConfig {

  final case class FieldDef(
    name: String,
    fieldType: String,
    multiple: Boolean = false,
    required: Boolean = false,
    optlist: Seq[String] = Nil,
    regex: Option[String] = None)

  /** Map a declared field type to Spark (Parser.pm type vocabulary). */
  def sparkType(t: String): DataType = t.toLowerCase match {
    case "int" | "integer" => IntegerType
    case "bigint" => LongType
    case "float" => DoubleType
    case "bool" | "boolean" => BooleanType
    case "date" => DateType
    case "datestamp" | "timestamp" => TimestampType
    case "geography_point" => StructType(Seq(
      StructField("lat", DoubleType), StructField("lon", DoubleType)))
    case _ => StringType // text, optlist-backed, etc.
  }

  /** Parse the XML field declaration:
    * {{{
    * <fields>
    *   <field type="text" required="yes">isolate</field>
    *   <field type="text" multiple="yes" optlist="yes">
    *     continent
    *     <optlist><option>Africa</option>...</optlist>
    *   </field>
    * </fields>
    * }}}
    */
  def parse(xml: String): Seq[FieldDef] = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val nodes = doc.getElementsByTagName("field")
    (0 until nodes.getLength).map { i =>
      val el = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
      def attr(a: String): Option[String] =
        Option(el.getAttribute(a)).filter(_.nonEmpty)
      val opts = el.getElementsByTagName("option")
      val optlist = (0 until opts.getLength)
        .map(j => opts.item(j).getTextContent.trim)
      // field name = direct text content, excluding child elements
      val name = {
        val children = el.getChildNodes
        (0 until children.getLength)
          .map(children.item)
          .filter(_.getNodeType == org.w3c.dom.Node.TEXT_NODE)
          .map(_.getTextContent).mkString.trim
      }
      FieldDef(
        name = name,
        fieldType = attr("type").getOrElse("text"),
        multiple = attr("multiple").contains("yes"),
        required = attr("required").contains("yes"),
        optlist = optlist,
        regex = attr("regex"))
    }
  }

  /** Build the entity StructType: `multiple` fields become arrays. */
  def toStructType(fields: Seq[FieldDef]): StructType =
    StructType(fields.map { f =>
      val base = sparkType(f.fieldType)
      val t = if (f.multiple) ArrayType(base) else base
      StructField(f.name, t, nullable = !f.required)
    })
}
