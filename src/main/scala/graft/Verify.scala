package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the library config (Main.scala ships it): correctness must be
      // checked on the session users actually get — incl. the
      // TopKRewrite/TopKPerKey plans the extension injects
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=name,name: dump just those queries (validated,
    // local iteration); unset (the driver path) = all
    val (selected, _) = SparkEntry.selected(sys.env.get("SPARK_GRAFT_ONLY"))
    // Full runs own the directory: remove result dirs for queries no
    // longer in the registry (a RENAMED query's stale dump otherwise
    // survives and reads as a rows-only pass in any dir-driven compare
    // — exactly the silent false-green this tool exists to prevent).
    // Filtered runs leave siblings alone so iteration stays cheap.
    if (sys.env.get("SPARK_GRAFT_ONLY").isEmpty) {
      val keep = selected.keySet + "oracle_sql.json"
      // blast-radius guard, two independent conditions: (1) outDir must
      // be PROVABLY a prior verify dir — oracle_sql.json, which only
      // this tool writes, already present — so a mistakenly-passed
      // outDir ('.', $HOME, a data-lake path full of ordinary parquet
      // datasets) is never cleaned at all; (2) within a proven dir,
      // only entries named like registry queries ([qdsexm]NN_...) that
      // also LOOK like dumps (parquet commit marker or part files,
      // covering dumps interrupted before _SUCCESS) are eligible.
      // Proof = oracle_sql.json (written at the END of a completed
      // run) OR the .graft-verify marker (written at the START of
      // every run, below) — the marker closes the hole where run A
      // dies mid-dump before oracle_sql.json exists and run B would
      // otherwise skip cleanup over A's stale directories.
      val provenVerifyDir =
        new java.io.File(outDir, "oracle_sql.json").isFile ||
          new java.io.File(outDir, ".graft-verify").isFile
      val registryName = "^[a-z]\\d\\d_[a-z0-9_]+$".r
      def looksLikeDump(f: java.io.File): Boolean =
        f.isDirectory && registryName.matches(f.getName) &&
          Option(f.list()).getOrElse(Array.empty).exists(n =>
            n == "_SUCCESS" || (n.startsWith("part-") && n.contains(".parquet")))
      (if (provenVerifyDir)
        Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      else Array.empty[java.io.File])
        .filterNot(f => keep(f.getName))
        .filter(looksLikeDump)
        .foreach { f =>
          System.err.println(s"[verify] removing stale output: ${f.getName}")
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(rm); x.delete(); ()
          }
          rm(f)
        }
    }
    // Claim the directory BEFORE dumping (see provenVerifyDir above).
    Files.writeString(Paths.get(s"$outDir/.graft-verify"), "")
    selected.foreach { case (name, fn) =>
      // queries like d03/x07 cache() shingle tables; in this
      // long-lived loop distinct entries would otherwise accumulate
      // until LRU eviction — drop them between queries like Bench does
      spark.sharedState.cacheManager.clearCache()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
