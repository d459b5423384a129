package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDateTime, ZoneOffset}

/** Row-to-text encoders replicating the reference formatters'
  * byte-level output (chiv_formatters.go: CSV 42–96, YAML 98–143,
  * JSON 145–221) against the golden corpus in
  * /root/reference/testdata/postgres/.
  *
  * Pure functions over (schema, row) — no Spark execution here, so
  * they unit-test without a session and run inside any partition
  * iterator. Typed rendering replaces the reference's bytes+regex
  * re-parsing (chiv_formatters.go:244–276): Spark rows are already
  * typed (SURVEY.md §1.4).
  */
object Render {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
  private val tsFracFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")

  /** Scalar → text; None = SQL NULL. Numeric rendering matches Go's
    * strconv/json.Marshal shortest forms (42, 3.14, integral doubles
    * without ".0").
    */
  def scalar(v: Any): Option[String] = v match {
    case null => None
    case d: Double => Some(num(d))
    // floats keep their own shortest form — widening to double would
    // print binary noise (3.14f.toDouble = 3.140000104904175)
    case f: Float =>
      Some(if (f.isWhole && math.abs(f) < 1e15f) f.toLong.toString else f.toString)
    case dec: java.math.BigDecimal => Some(dec.stripTrailingZeros.toPlainString)
    case i: Instant => Some(ts(i))
    case t: java.sql.Timestamp => Some(ts(t.toInstant))
    case ldt: LocalDateTime => Some(ts(ldt.toInstant(ZoneOffset.UTC)))
    case d: java.time.LocalDate => Some(d.toString)
    case d: java.sql.Date => Some(d.toLocalDate.toString)
    case b: Array[Byte] => Some(java.util.Base64.getEncoder.encodeToString(b))
    case other => Some(other.toString)
  }

  private def num(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def ts(i: Instant): String = {
    val utc = i.atZone(ZoneOffset.UTC)
    if (i.getNano == 0) tsFmt.format(utc) else tsFracFmt.format(utc)
  }

  /** Null overlay (chiv.go:175–181): placeholder replaces NULL in any
    * column and is rendered as a plain string downstream.
    */
  def cell(v: Any, nullValue: Option[String]): Option[String] =
    scalar(v).orElse(nullValue)
}

/** Formatter SPI (reference `Formatter`: Open/Format/Close,
  * chiv_formatters.go:23–35): optional prologue, per-row text, row
  * separator, optional epilogue. OPEN for user implementations — the
  * reference accepts any `Formatter`/`FormatterFunc` via `WithFormat`
  * (chiv_formatters.go:23–40, chiv_options.go:7–12); the Spark-side
  * equivalent is `Format.Custom(myFormatter, ext)` in [[ArchiveConfig]],
  * flowing through both the single-object and sharded row paths.
  * Implementations run inside partition iterators on executors, hence
  * `Serializable`; they must be pure functions of (schema, row) — any
  * speculative re-execution must produce identical bytes.
  */
trait RowFormatter extends Serializable {
  def open(schema: StructType): String
  def row(schema: StructType, r: Row, nullValue: Option[String]): String
  def separator: String
  def close: String
}

/** Go encoding/csv semantics: comma delimiter, `\n` terminator,
  * minimal quoting (quote only fields containing `"` `,` CR LF or
  * leading space/tab), `"` escaped by doubling. Header on open.
  */
object CsvFormatter extends RowFormatter {
  def open(schema: StructType): String =
    schema.fieldNames.map(quoteIfNeeded).mkString(",") + "\n"
  def row(schema: StructType, r: Row, nullValue: Option[String]): String =
    (0 until r.length)
      .map(i => Render.cell(r.get(i), nullValue).fold("")(quoteIfNeeded))
      .mkString(",") + "\n"
  val separator = ""
  val close = ""

  private def quoteIfNeeded(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r') ||
      s.startsWith(" ") || s.startsWith("\t"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}

/** One JSON array of objects with alphabetically ordered keys (Go map
  * marshaling order) and Go's HTML-escaping of `<` `>` `&`
  * (json.Marshal default) — byte-compatible with the golden corpus.
  */
object JsonArrayFormatter extends RowFormatter {
  def open(schema: StructType): String = "["
  def row(schema: StructType, r: Row, nullValue: Option[String]): String = {
    val fields = schema.fields.zipWithIndex
      .sortBy(_._1.name)
      .map { case (f, i) =>
        val v = r.get(i) match {
          case null => nullValue.map(escape).getOrElse("null")
          case b: Boolean => b.toString
          case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
          case d: Double => Render.scalar(d).get
          case fl: Float => Render.scalar(fl).get
          case dec: java.math.BigDecimal => dec.stripTrailingZeros.toPlainString
          case other => escape(Render.scalar(other).get)
        }
        "\"" + f.name + "\":" + v
      }
    "{" + fields.mkString(",") + "}"
  }
  val separator = ","
  val close = "]"

  private def escape(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '<' => sb.append("\\u003c")
      case '>' => sb.append("\\u003e")
      case '&' => sb.append("\\u0026")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }
}

/** go-yaml block-sequence style: `- key: value` entries, keys sorted,
  * `null` for NULL; strings quoted only when plain style would
  * misresolve — double quotes when the text resolves to another type
  * (timestamp/bool/number/null), single quotes when it contains flow
  * punctuation (golden: ts_column double-quoted, json_column
  * single-quoted, plain strings bare).
  */
object YamlFormatter extends RowFormatter {
  def open(schema: StructType): String = ""
  def row(schema: StructType, r: Row, nullValue: Option[String]): String = {
    val fields = schema.fields.zipWithIndex
      .sortBy(_._1.name)
      .map { case (f, i) =>
        val v = r.get(i) match {
          case null => nullValue.map(scalarStyle).getOrElse("null")
          case b: Boolean => b.toString
          case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
          case d: Double => Render.scalar(d).get
          case fl: Float => Render.scalar(fl).get
          case dec: java.math.BigDecimal => dec.stripTrailingZeros.toPlainString
          case other => scalarStyle(Render.scalar(other).get)
        }
        s"${f.name}: $v"
      }
    fields.zipWithIndex
      .map { case (line, idx) => (if (idx == 0) "- " else "  ") + line }
      .mkString("", "\n", "\n")
  }
  val separator = ""
  val close = ""

  private val typedLike =
    ("^(true|false|yes|no|on|off|null|~|[-+]?[0-9]+|[-+]?(\\.inf)|\\.nan|" +
      "[-+]?[0-9]*\\.[0-9]+([eE][-+]?[0-9]+)?|" +
      "[0-9]{4}-[0-9]{2}-[0-9]{2}([Tt ][0-9:.]+([Zz]|[-+][0-9:]+)?)?)$").r

  private def plainSafe(s: String): Boolean =
    s.nonEmpty && !s.exists(c => "{}[]#&*!|>'\"%@`,\n\r\t".contains(c)) &&
      !s.startsWith(" ") && !s.endsWith(" ") && !s.startsWith("- ") &&
      !s.contains(": ") && !s.endsWith(":")

  private def scalarStyle(s: String): String =
    if (s.exists(c => c == '\n' || c == '\r' || c == '\t' || c < ' ') ||
      typedLike.matches(s.toLowerCase))
      // double-quoted style: the only style that represents control
      // characters faithfully (single-quoted folds raw newlines)
      "\"" + s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\x${c.toInt}%02x"
        case c => c.toString
      } + "\""
    else if (!plainSafe(s))
      "'" + s.replace("'", "''") + "'"
    else s
}

object RowFormatter {
  def of(format: Format): RowFormatter = format match {
    case Format.Csv => CsvFormatter
    case Format.JsonArray => JsonArrayFormatter
    case Format.Yaml => YamlFormatter
    case Format.Custom(formatter, _) => formatter
    case columnar => throw new IllegalArgumentException(
      s"$columnar has no row formatter — columnar formats go through Spark's writers")
  }
}
