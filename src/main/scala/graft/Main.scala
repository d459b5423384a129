package graft

import graft.engine.{ArchiveConfig, Engine, Format}
import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's `chiv` command
  * (cmd/chiv/main.go:22–161): same flags, Spark execution.
  *
  * {{{
  * spark-submit --class graft.Main graft.jar \
  *   -d /root/testdata/sf0.001 -t lineitem -b /tmp/archive \
  *   [-f csv|json|yaml|parquet|orc] [-c col1,col2] [-k key] [-e ext] [-n null]
  *   [--sharded] [--manifest] [-p partcol1,partcol2]
  * }}}
  *
  * `-d` is the data source — a parquet data directory OR a JDBC URL
  * (`jdbc:` prefix), the reference CLI's native shape
  * (`chiv -d $DATABASE_URL -t table -b bucket`). Like the reference,
  * `-d` falls back to the `DATABASE_URL` environment variable when
  * omitted (cmd/chiv/main.go:30–40). `-b` is the destination "bucket"
  * (any Hadoop FS URI), `-t` the table.
  *
  * `--jdbc-partitions col:lower:upper:n` (JDBC sources only) splits
  * the extraction into n parallel stride reads on `col` — the 100 TB
  * scan path the reference's single cursor cannot express; bounds
  * shape the strides, every row is read regardless.
  */
object Main {
  def main(args: Array[String]): Unit = {
    // full flag validation BEFORE paying Spark startup: a missing -b
    // or a bogus -f must fail in milliseconds with a clean message,
    // not after a multi-second session build with the error buried in
    // executor logs
    val opts = parse(args.toList, Map.empty)
    configOf(opts)
    val (dir, table, bucket) = required(opts, sys.env)
    partitionsOf(opts, dir) // fail fast on a malformed spec too
    validateManifestFlags(opts) // and on an incoherent flag pair
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-archive")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    try {
      val dest = archive(spark, opts, dir, table, bucket)
      println(s"archived $table -> $dest")
    } finally spark.stop()
  }

  /** Flag parsing + archive on a caller-owned session (separated from
    * `main` so the CLI path is testable without stopping the JVM-wide
    * session; `env` injectable for the DATABASE_URL fallback).
    * Returns the destination key.
    */
  def run(spark: SparkSession, args: Array[String],
      env: Map[String, String] = sys.env): String = {
    val opts = parse(args.toList, Map.empty)
    val (dir, table, bucket) = required(opts, env)
    archive(spark, opts, dir, table, bucket)
  }

  private def archive(spark: SparkSession, opts: Map[String, String],
      dir: String, table: String, bucket: String): String = {
    // re-checked here so the `run` test path fails fast too (main()
    // already validated before paying Spark startup)
    validateManifestFlags(opts)
    val engine = new Engine(spark, configOf(opts))
    val dest = partitionsOf(opts, dir) match {
      case Some((col, lo, hi, n)) =>
        val df = graft.sources.Sources.jdbcTablePartitioned(
          spark, dir, table, col, lo, hi, n)
        engine.archiveDF(df, bucket, table)
      case None =>
        engine.archive(dir, table, bucket)
    }
    // --manifest: record the landed shards + re-read row count as
    // _MANIFEST.json
    if (opts.contains("manifest")) engine.writeManifest(dest)
    dest
  }

  /** A single exact-key object is its own integrity unit (atomic
    * rename) and needs no shard manifest.
    */
  private def validateManifestFlags(opts: Map[String, String]): Unit =
    if (opts.contains("manifest") && !opts.contains("sharded"))
      sys.error("graft: --manifest requires --sharded (a single object needs no shard manifest)")

  private def partitionsOf(opts: Map[String, String],
      source: String): Option[(String, Long, Long, Int)] =
    opts.get("jdbc-partitions").map { spec =>
      if (!source.startsWith("jdbc:"))
        sys.error("graft: --jdbc-partitions requires a jdbc: source")
      spec.split(":") match {
        case Array(col, lo, hi, n) if col.nonEmpty =>
          val parsed =
            try (col, lo.toLong, hi.toLong, n.toInt)
            catch { case _: NumberFormatException =>
              sys.error(s"graft: malformed --jdbc-partitions: $spec")
            }
          if (parsed._4 < 1 || parsed._2 > parsed._3)
            sys.error(s"graft: --jdbc-partitions wants lower <= upper and n >= 1, got: $spec")
          parsed
        case _ => sys.error(
          s"graft: --jdbc-partitions wants col:lower:upper:n, got: $spec")
      }
    }

  private def required(opts: Map[String, String],
      env: Map[String, String]): (String, String, String) = {
    def req(k: String): String = opts.getOrElse(k,
      sys.error(s"graft: missing required flag -$k"))
    // reference parity: -d beats the environment; DATABASE_URL is the
    // fallback source (cmd/chiv/main.go:30–40)
    val source = opts.get("d").orElse(env.get("DATABASE_URL")).getOrElse(
      sys.error("graft: missing required flag -d (and DATABASE_URL is unset)"))
    (source, req("t"), req("b"))
  }

  private def configOf(opts: Map[String, String]): ArchiveConfig =
    ArchiveConfig(
      format = opts.get("f").map {
        case "csv" => Format.Csv
        case "json" => Format.JsonArray
        case "yaml" => Format.Yaml
        case "parquet" => Format.Parquet
        case "orc" => Format.Orc
        case other => sys.error(s"graft: unknown format: $other")
      }.getOrElse(Format.Csv),
      key = opts.get("k"),
      extension = opts.get("e"),
      nullValue = opts.get("n"),
      columns = opts.get("c").map(_.split(",").toSeq).getOrElse(Nil),
      sharded = opts.contains("sharded"),
      partitionBy = opts.get("p").map(_.split(",").toSeq).getOrElse(Nil))

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--sharded" :: rest => parse(rest, acc + ("sharded" -> "true"))
      case "--manifest" :: rest => parse(rest, acc + ("manifest" -> "true"))
      case flag :: value :: rest if flag.startsWith("-") =>
        parse(rest, acc + (flag.stripPrefix("--").stripPrefix("-") -> value))
      case other :: _ => sys.error(s"graft: unexpected argument: $other")
    }
}
