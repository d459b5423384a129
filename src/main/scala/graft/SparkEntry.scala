package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + aggregate: orders ⋈ customer ⋈ broadcast(nation, region).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q03_join_broadcast").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose output depends on
    * engine-internal hashing (HLL sketches, xxhash LSH buckets) — the
    * driver records a weaker rows-only check for those.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Dev-tooling filter shared by Bench/Verify: SPARK_GRAFT_ONLY as a
    * comma-separated name list narrows a run to those entries (fast
    * iteration on one regression). Unknown names fail fast — a typo
    * must not "succeed" as an empty run. `extra` admits non-query
    * entries a caller also times (Bench's archive entries).
    */
  def selected(only: Option[String], extra: Set[String] = Set.empty)
      : (Map[String, (SparkSession, String) => DataFrame], Set[String]) =
    only.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet) match {
      case None => (queries, extra)
      case Some(names) =>
        // a set variable that parses to NOTHING (empty string, only
        // commas/whitespace) is a malformed filter, not "run nothing" —
        // same contract as unknown names: a filter must never
        // "succeed" as an empty run
        require(names.nonEmpty,
          "graft: SPARK_GRAFT_ONLY is set but names no entries (unset it to run the full suite)")
        val unknown = names -- queries.keySet -- extra
        require(unknown.isEmpty,
          s"graft: SPARK_GRAFT_ONLY names not in the registry: ${unknown.toSeq.sorted.mkString(", ")}")
        (queries.filter { case (n, _) => names(n) }, extra.filter(names))
    }
}
