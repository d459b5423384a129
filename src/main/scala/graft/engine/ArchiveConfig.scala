package graft.engine

/** Output format — the reference's `Formatter` SPI surface
  * (chiv_formatters.go:23–35): the three shipped implementations,
  * each format's default extension (`Extensioner`,
  * chiv_formatters.go:37–40), columnar extensions, and — `WithFormat`
  * parity (chiv_options.go:7–12) — a `Custom` carrier for any
  * user-supplied [[RowFormatter]].
  */
sealed trait Format { def extension: String }
object Format {
  case object Csv extends Format { val extension = "csv" }

  /** One JSON array (not JSON-lines) — chiv_formatters.go:145–221. */
  case object JsonArray extends Format { val extension = "json" }

  /** `- key: value` block sequence — chiv_formatters.go:98–143. */
  case object Yaml extends Format { val extension = "yaml" }

  /** User-pluggable formatter — the reference's open `Formatter`/
    * `FormatterFunc` SPI (chiv_formatters.go:23–40): any
    * [[RowFormatter]] implementation rides the same single-object and
    * sharded row paths as the shipped formats. `extension` feeds key
    * negotiation exactly like a built-in (`Extensioner` parity).
    */
  final case class Custom(formatter: RowFormatter, extension: String = "txt")
      extends Format

  /** Columnar formats (beyond the reference: the archive formats a
    * Spark-era pipeline actually wants on an object store — typed,
    * splittable, compressed). Sharded mode writes them through the
    * committer; single-object mode writes one part and renames it to
    * the exact key.
    */
  case object Parquet extends Format { val extension = "parquet" }
  case object Orc extends Format { val extension = "orc" }
}

/** Archive options, mirroring the reference's functional options
  * (chiv_options.go:7–39) with its overlay semantics: a per-call
  * config shadows the engine's constructor config via `copy`
  * (chiv.go:87–91).
  *
  * @param format    output format (`WithFormat`)
  * @param key       exact object key, beats extension (`WithKey`)
  * @param extension key extension when `key` is unset (`WithExtension`)
  * @param nullValue placeholder substituted for NULL cells (`WithNull`)
  * @param columns   projection pushed to the source (`WithColumns`)
  * @param sharded   scale extension (not in the reference): write many
  *                  part objects under the key as a prefix instead of
  *                  one object — the 100 TB path; single-object
  *                  archives serialize through one stream by design.
  * @param partitionBy scale extension (sharded mode only): hive-style
  *                  directory layout `<key>/col=value/part-…` — the
  *                  standard lake layout that gives every downstream
  *                  reader partition pruning for free. Rejected in
  *                  single-object mode (one key cannot carry a
  *                  directory tree).
  */
final case class ArchiveConfig(
    format: Format = Format.Csv,
    key: Option[String] = None,
    extension: Option[String] = None,
    nullValue: Option[String] = None,
    columns: Seq[String] = Nil,
    sharded: Boolean = false,
    partitionBy: Seq[String] = Nil) {

  /** Object key for a table archive: `key` if set, else
    * `<table>.<extension|format-default>` (chiv.go:224–233).
    */
  def resolvedKey(table: String): String =
    key.getOrElse(s"$table.${extension.getOrElse(format.extension)}")
}

/** Stage-prefixed failure, matching the reference's error contract
  * (`chiv: <stage>: <cause>`, chiv.go:255–257).
  */
final class ArchiveException(stage: String, cause: Throwable)
    extends RuntimeException(s"graft: $stage: ${cause.getMessage}", cause)
