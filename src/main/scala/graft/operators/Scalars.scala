package graft.operators

import graft.{QueryDef, Qdsl, Tables}
import Qdsl._
import org.apache.spark.sql.functions._

/** Set operations, scalar expression surface (string/date/math/CASE),
  * and chiv's own projection + null-placeholder operators
  * (SURVEY.md §2.3 P1/P2, §2.5 scalar rows).
  */
object Scalars {

  def queries: Seq[QueryDef] = Seq(q17, q18, q19, q20, q23, q24, q25, q30, q31, p01, p02)

  /** String aggregation (LISTAGG shape): deterministic via sorted
    * collect — concat_ws(sort_array(collect_list(…))) ≡ DuckDB
    * string_agg(… ORDER BY …).
    */
  val q30 = QueryDef(
    "q30_string_agg",
    Some("""SELECT c_mktsegment,
      string_agg(c_name, ',' ORDER BY c_name) AS names,
      count(*) AS n
      FROM (SELECT * FROM customer WHERE c_custkey <= 100)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")) { (s, d) =>
    Tables.customer(s, d)
      .where(col("c_custkey") <= 100)
      .groupBy("c_mktsegment")
      .agg(
        concat_ws(",", sort_array(collect_list(col("c_name")))).as("names"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  /** The SQL surface itself (S2's `spark.sql` face): temp views +
    * a multi-join analytical query in pure SQL — same Catalyst plans
    * as the DataFrame formulations.
    */
  val q31 = QueryDef(
    "q31_sql_surface",
    Some("""SELECT o_orderpriority, n_name,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderstatus = 'O' AND n_regionkey < 2
      GROUP BY o_orderpriority, n_name
      ORDER BY o_orderpriority, n_name""")) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql("""SELECT o_orderpriority, n_name,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderstatus = 'O' AND n_regionkey < 2
      GROUP BY o_orderpriority, n_name
      ORDER BY o_orderpriority, n_name""")
  }

  /** Array / map / struct surface: construction, indexing, HOF
    * transform+filter, sort, map from entries. DuckDB lists/maps
    * mirror each (list_transform/list_filter, map {}).
    */
  val q23 = QueryDef(
    "q23_array_map_funcs",
    Some("""SELECT p_partkey,
      array_to_string(string_split(p_type, ' '), ',') AS type_words,
      CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_type_words,
      string_split(p_type, ' ')[1] AS first_word,
      array_to_string(list_sort(list_distinct(string_split(p_type, ' '))), ',') AS sorted_words,
      array_to_string(list_transform(string_split(p_type, ' '), w -> upper(w)), ',') AS upper_words,
      coalesce(array_to_string(list_filter(string_split(p_type, ' '), w -> len(w) > 5), ','), '') AS long_words,
      CAST(p_size AS BIGINT) AS p_size
      FROM part ORDER BY p_partkey""")) { (s, d) =>
    Tables.part(s, d)
      .withColumn("tw", split(col("p_type"), " "))
      .select(
        col("p_partkey"),
        concat_ws(",", col("tw")).as("type_words"),
        big(size(col("tw"))).as("n_type_words"),
        element_at(col("tw"), 1).as("first_word"),
        concat_ws(",", array_sort(array_distinct(col("tw")))).as("sorted_words"),
        concat_ws(",", expr("transform(tw, w -> upper(w))")).as("upper_words"),
        concat_ws(",", expr("filter(tw, w -> length(w) > 5)")).as("long_words"),
        big(col("p_size")).as("p_size"))
      .orderBy("p_partkey")
  }

  /** Generator / UDTF shape: posexplode of the token array — one
    * output row per (doc, position, token), then re-aggregated so the
    * result is small and totally ordered.
    */
  val q24 = QueryDef(
    "q24_explode",
    Some("""SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS n_docs,
        CAST(min(pos) AS BIGINT) AS min_pos
      FROM (SELECT doc_id, r.i - 1 AS pos, string_split(text, ' ')[r.i] AS tok
            FROM documents, unnest(range(1, len(string_split(text, ' ')) + 1)) AS r(i))
      GROUP BY tok HAVING count(*) >= 100 ORDER BY tok""")) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"),
        big(min("pos")).as("min_pos"))
      .where(col("n") >= 100)
      .orderBy("tok")
  }

  /** Multiset set ops (ALL variants): bag semantics via intersectAll /
    * exceptAll / union, keeping duplicate multiplicities.
    */
  val q25 = QueryDef(
    "q25_setops_all",
    Some("""SELECT o_custkey FROM (
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       INTERSECT ALL
       SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      ORDER BY o_custkey""")) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .intersectAll(o.filter(col("o_totalprice") > 100000).select("o_custkey"))
      .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** UNION / INTERSECT / EXCEPT (all distinct-semantics, matching SQL). */
  val q17 = QueryDef(
    "q17_setops",
    Some("""SELECT * FROM (
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      UNION
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P' AND o_totalprice < 2000
      ) ORDER BY o_custkey""")) { (s, d) =>
    val o = Tables.orders(s, d)
    val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    val fin  = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val big  = o.filter(col("o_totalprice") > 300000).select("o_custkey")
    val tinyP = o.filter(col("o_orderstatus") === "P" && col("o_totalprice") < 2000).select("o_custkey")
    open.intersect(fin).except(big).union(tinyP).distinct().orderBy("o_custkey")
  }

  /** String function surface — upper/substring/length/concat_ws/
    * replace/LIKE/lpad/split. Length-ish outputs are BIGINT on both
    * engines (DuckDB length() is BIGINT, Spark's is INT).
    */
  val q18 = QueryDef(
    "q18_string_funcs",
    Some("""SELECT p_partkey,
      upper(p_name) AS name_upper,
      substring(p_name, 1, 8) AS name_prefix,
      CAST(length(p_name) AS BIGINT) AS name_len,
      concat_ws('-', p_brand, p_type) AS brand_type,
      replace(p_name, ' ', '_') AS name_snake,
      (p_name LIKE '%a%') AS has_a,
      lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
      CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
      FROM part ORDER BY p_partkey""")) { (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        big(length(col("p_name"))).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        col("p_name").like("%a%").as("has_a"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        big(size(split(col("p_name"), " "))).as("n_words"))
      .orderBy("p_partkey")
  }

  /** Date + math function surface. Only IEEE-exact math (sqrt/abs/
    * floor/mod) is emitted raw; nothing here depends on libm rounding.
    */
  val q19 = QueryDef(
    "q19_date_math",
    Some("""SELECT o_orderkey,
      CAST(year(o_orderdate) AS BIGINT) AS o_year,
      CAST(month(o_orderdate) AS BIGINT) AS o_month,
      CAST(dayofmonth(o_orderdate) AS BIGINT) AS o_day,
      strftime(o_orderdate, '%Y-%m') AS o_ym,
      CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
      abs(o_totalprice - 200000.0) AS price_dist,
      CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kbucket,
      o_orderkey % 7 AS key_mod,
      sqrt(o_totalprice) AS price_sqrt
      FROM orders ORDER BY o_orderkey""")) { (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        big(year(col("o_orderdate"))).as("o_year"),
        big(month(col("o_orderdate"))).as("o_month"),
        big(dayofmonth(col("o_orderdate"))).as("o_day"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"),
        big(datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp_ntz"))).as("days_since_epoch_start"),
        abs(col("o_totalprice") - 200000.0).as("price_dist"),
        big(floor(col("o_totalprice") / 1000)).as("price_kbucket"),
        (col("o_orderkey") % 7).as("key_mod"),
        sqrt(col("o_totalprice")).as("price_sqrt"))
      .orderBy("o_orderkey")
  }

  /** CASE expression + conditional aggregation. */
  val q20 = QueryDef(
    "q20_case_expr",
    Some("""SELECT
      CASE WHEN c_acctbal < 0 THEN 'negative'
           WHEN c_acctbal < 3000 THEN 'low'
           WHEN c_acctbal < 7000 THEN 'mid'
           ELSE 'high' END AS bal_bucket,
      count(*) AS n,
      CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(c_acctbal AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS building_bal
      FROM customer GROUP BY 1 ORDER BY bal_bucket""")) { (s, d) =>
    Tables.customer(s, d)
      .groupBy(
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("bal_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("c_mktsegment") === "BUILDING", col("c_acctbal").cast(m2))
          .otherwise(lit(0).cast(m2))).cast("double").as("building_bal"))
      .orderBy("bal_bucket")
  }

  /** chiv P1 — column projection pushdown (`WithColumns`,
    * chiv_options.go:35–39): the read schema at the parquet scan is
    * exactly the projected columns.
    */
  val p01 = QueryDef(
    "p01_project",
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      ORDER BY c_custkey""")) { (s, d) =>
    Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** chiv P2 — NULL placeholder overlay (`WithNull`,
    * chiv.go:175–181): nulls manufactured with NULLIF (testdata has
    * none), then coalesced to the configured placeholder, exactly the
    * per-cell substitution chiv performs.
    */
  val p02 = QueryDef(
    "p02_null_fill",
    Some("""SELECT l_orderkey, l_linenumber,
      coalesce(nullif(l_returnflag, 'N'), 'custom_null') AS flag_filled
      FROM lineitem ORDER BY l_orderkey, l_linenumber""")) { (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("custom_null")).as("flag_filled"))
      .orderBy("l_orderkey", "l_linenumber")
  }
}
