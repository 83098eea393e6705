package graft.api

import graft.api.QueryCompiler._
import graft.operators.Predicates
import graft.operators.Predicates.Op

/** REST JSON query grammar (SURVEY §2.2 F13 / §3.2) — the reference's
  * POST /db/:db/isolates/search body: `{"field.country": "UK",
  * "locus.abcZ": "5", "query.operator": ">=", ...}` parsed with the same
  * operator names the web grammar uses
  * (lib/BIGSdb/REST/Routes/Isolates.pm:452-716).
  *
  * Kept dependency-free: the subset grammar is flat key/value, so a tiny
  * recursive-descent JSON reader suffices (no external JSON library on the
  * engine classpath).
  */
object RestQuery {

  /** Operator names accepted by the REST grammar (Constants.pm:242). */
  val operators: Map[String, Op] = Map(
    "=" -> Predicates.Eq,
    "contains" -> Predicates.Contains,
    "starts with" -> Predicates.StartsWith,
    "ends with" -> Predicates.EndsWith,
    ">" -> Predicates.Gt,
    ">=" -> Predicates.Ge,
    "<" -> Predicates.Lt,
    "<=" -> Predicates.Le,
    "NOT" -> Predicates.NotEq,
    "NOT contain" -> Predicates.NotContains)

  /** Field-name routing registry (REST/Routes/Isolates.pm:537-573): the
    * reference inspects each `field.X` name against the extended-attribute
    * and EAV registries before treating it as a provenance column. An
    * empty `provenance` set accepts any unrouted name as provenance (the
    * permissive default).
    */
  final case class FieldRegistry(
    provenance: Set[String] = Set.empty,
    eav: Set[String] = Set.empty,
    extended: Map[String, String] = Map.empty) // attribute → parent field

  /** Parse `{"field.<name>": value, "locus.<pos>": allele,
    * "scheme.<id>.<field>": value, "oper": op}` into a QuerySpec.
    * `field.*` routes through `registry` (extended attribute → EAV →
    * provenance, like _get_field_query); `locus.*` → designation clause;
    * the optional `oper` applies to all clauses (default `=`), mirroring
    * the REST route's single-operator bodies. Numeric JSON values compile
    * as non-text (typed range compare).
    */
  def parse(json: String): QuerySpec = parse(json, FieldRegistry())

  def parse(json: String, registry: FieldRegistry): QuerySpec = {
    val kv = JsonMini.parseObject(json)
    val op = kv.get("oper").map(_.toString)
      .map(o => operators.getOrElse(o,
        throw new IllegalArgumentException(s"unknown operator: $o")))
      .getOrElse(Predicates.Eq)
    def render(v: Any): String = v match {
      case d: Double if d.isWhole => d.toLong.toString
      case other => other.toString
    }
    val fieldKv = kv.collect { case (k, v) if k.startsWith("field.") =>
      (k.stripPrefix("field."), v)
    }.toSeq
    val extended = fieldKv.collect {
      case (f, v) if registry.extended.contains(f) =>
        ExtendedClause(registry.extended(f), f, op, render(v))
    }
    val eav = fieldKv.collect {
      case (f, v) if !registry.extended.contains(f) && registry.eav(f) =>
        EavClause(f, op, render(v), isText = v.isInstanceOf[String])
    }
    val prov = fieldKv.collect {
      case (f, v) if !registry.extended.contains(f) && !registry.eav(f) =>
        if (registry.provenance.nonEmpty && !registry.provenance(f))
          throw new IllegalArgumentException(s"$f is not a valid field")
        FieldClause(f, op, render(v), isText = v.isInstanceOf[String])
    }
    val des = kv.collect { case (k, v) if k.startsWith("locus.") =>
      HasAllele(k.stripPrefix("locus.").toInt, op, render(v)): DesignationClause
    }.toSeq
    // scheme.<id>.<field> → scheme-field cache clause
    // (REST/Routes/Isolates.pm:677-716)
    val schemes = kv.collect {
      case (k, v) if k.startsWith("scheme.") =>
        val rest = k.stripPrefix("scheme.")
        val dot = rest.indexOf('.')
        require(dot > 0, s"scheme key needs scheme.<id>.<field>: $k")
        SchemeClause(rest.take(dot).toInt, rest.drop(dot + 1), op, render(v),
          isText = v.isInstanceOf[String])
    }.toSeq
    val page = for {
      p <- kv.get("page").collect { case d: Double => d.toInt }
      s <- Some(kv.get("page_size").collect { case d: Double => d.toInt }
        .getOrElse(100)) // REST default page size (Interface.pm:54)
    } yield PageSpec(p, s)
    // F12: REST listings suppress superseded record versions unless the
    // caller passes all_versions (REST/Routes/Isolates.pm:49,491)
    val allVersions = kv.get("all_versions").contains(true)
    QuerySpec(provenance = prov, extended = extended, eav = eav,
      designations = des, schemeFields = schemes,
      page = page, suppressOldVersions = !allVersions)
  }

  /** Minimal JSON object reader: flat string/number/bool values (the REST
    * search grammar's shape). Not a general JSON parser.
    */
  private[api] object JsonMini {
    def parseObject(s: String): Map[String, Any] = {
      val t = s.trim
      require(t.startsWith("{") && t.endsWith("}"), "expected JSON object")
      var i = 1
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      def ws(): Unit = while (i < t.length && t(i).isWhitespace) i += 1
      def str(): String = {
        require(t(i) == '"', s"expected string at $i"); i += 1
        val sb = new StringBuilder
        while (t(i) != '"') {
          if (t(i) == '\\') { i += 1; sb += (t(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case 'u' => val h = t.substring(i + 1, i + 5); i += 4
              Integer.parseInt(h, 16).toChar
            case c => c }) }
          else sb += t(i)
          i += 1
        }
        i += 1; sb.toString
      }
      def value(): Any = {
        ws()
        t(i) match {
          case '"' => str()
          case 't' => i += 4; true
          case 'f' => i += 5; false
          case 'n' => i += 4; null
          case _ =>
            val start = i
            while (i < t.length && "-+.eE0123456789".indexOf(t(i)) >= 0) i += 1
            t.substring(start, i).toDouble
        }
      }
      ws()
      while (t(i) != '}') {
        ws()
        val k = str()
        ws(); require(t(i) == ':', s"expected ':' at $i"); i += 1
        out(k) = value()
        ws()
        if (t(i) == ',') i += 1
        ws()
      }
      out.toMap
    }
  }
}
