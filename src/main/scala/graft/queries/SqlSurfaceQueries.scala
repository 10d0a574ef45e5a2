package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Skew

/** SQL-surface breadth beyond the reference's inventory: multi-dimensional
  * aggregation (rollup/cube/having), subquery shapes (scalar, semi),
  * pivot, scalar-function families (string/date/conditional), exact
  * percentiles, and the salted-aggregation rewrite verified against its
  * unsalted oracle.
  */
object SqlSurfaceQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "agg_rollup",
      (s, dir) => Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    ),

    QueryDef(
      "agg_cube",
      (s, dir) => Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // explicit grouping-set membership indicators
    QueryDef(
      "agg_grouping_sets",
      (s, dir) => Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
             |  count(*) AS n
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // array-function family: ordered collect, slice, stringify
    QueryDef(
      "agg_array_ops",
      (s, dir) => {
        val ranked = Tables.customer(s, dir)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("c_nationkey").orderBy(desc("c_acctbal"), col("c_custkey"))))
        ranked.filter(col("rn") <= 3)
          .groupBy("c_nationkey")
          .agg(
            // collect_list has no ordering guarantee — collect (rn, name)
            // structs, sort, then project, for a deterministic result
            concat_ws(",", transform(
              array_sort(collect_list(struct(col("rn"), col("c_name")))),
              x => x.getField("c_name"))).as("top3_names"),
            count(lit(1)).as("n_top"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey,
             |  string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_custkey) AS top3_names,
             |  count(*) AS n_top
             |FROM (
             |  SELECT c_nationkey, c_name, c_acctbal, c_custkey,
             |    row_number() OVER (PARTITION BY c_nationkey
             |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) WHERE rn <= 3
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    ),

    QueryDef(
      "agg_having",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
        .filter(col("n") >= 100)
        .orderBy("l_suppkey"),
      Some("""SELECT l_suppkey, count(*) AS n, round(sum(l_extendedprice), 2) AS total
             |FROM lineitem GROUP BY l_suppkey HAVING count(*) >= 100
             |ORDER BY l_suppkey""".stripMargin)
    ),

    // scalar subquery: orders above the average total price
    QueryDef(
      "sq_scalar",
      (s, dir) => {
        val o   = Tables.orders(s, dir)
        val avgP = o.agg(avg("o_totalprice").as("avg_price"))
        o.crossJoin(broadcast(avgP))
          .filter(col("o_totalprice") > col("avg_price"))
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)
    ),

    // semi join: customers that have at least one urgent order
    QueryDef(
      "sq_semi",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)
    ),

    // pivot: documents per (source, lang) as wide columns
    QueryDef(
      "pivot_lang",
      (s, dir) => Tables.documents(s, dir)
        .groupBy("source")
        .pivot("lang", Seq("en", "fr", "es", "de", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("source"),
      Some("""SELECT source,
             |  count(*) FILTER (lang = 'en') AS en,
             |  count(*) FILTER (lang = 'fr') AS fr,
             |  count(*) FILTER (lang = 'es') AS es,
             |  count(*) FILTER (lang = 'de') AS de,
             |  count(*) FILTER (lang = 'zh') AS zh
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    ),

    // scalar string-function family
    QueryDef(
      "fn_string",
      (s, dir) => Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        lower(col("p_type")).as("type_lo"),
        substring(col("p_name"), 1, 5).as("name_head"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), "[aeiou]", "_").as("type_sub"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
        when(col("p_name").like("%gold%"), lit("gold")).otherwise(lit("other")).as("tag"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  upper(p_brand) AS brand_up, lower(p_type) AS type_lo,
             |  substring(p_name, 1, 5) AS name_head,
             |  CAST(length(p_name) AS BIGINT) AS name_len,
             |  regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_sub,
             |  concat_ws('|', p_brand, p_type) AS joined,
             |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
             |  CASE WHEN p_name LIKE '%gold%' THEN 'gold' ELSE 'other' END AS tag
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),

    // date/time function family
    QueryDef(
      "fn_datetime",
      (s, dir) => Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1995-01-01"))).cast("long").as("days_since"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS BIGINT) AS y,
             |  CAST(month(o_orderdate) AS BIGINT) AS m,
             |  CAST(day(o_orderdate) AS BIGINT) AS d,
             |  CAST(date_part('dow', o_orderdate) AS BIGINT) AS dow,
             |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
             |  date_trunc('month', o_orderdate) AS month_start,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),

    // math-function family (IEEE-exact ops only: abs/ceil/floor/sqrt/sign/mod
    // are bit-deterministic across engines; transcendentals are not)
    QueryDef(
      "fn_math",
      (s, dir) => Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - lit(30000.0)).as("abs_diff"),
        ceil(col("l_quantity") / 7.0).cast("long").as("ceil_q"),
        floor(col("l_quantity") / 7.0).cast("long").as("floor_q"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        signum(col("l_discount") - col("l_tax")).as("rate_sign"),
        (col("l_orderkey") % 97).as("key_mod"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  abs(l_extendedprice - 30000.0) AS abs_diff,
             |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_q,
             |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_q,
             |  sqrt(l_extendedprice) AS sqrt_price,
             |  CAST(sign(l_discount - l_tax) AS DOUBLE) AS rate_sign,
             |  l_orderkey % 97 AS key_mod
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // conditional/null-handling family
    QueryDef(
      "fn_conditional",
      (s, dir) => Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"),
        nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_coalesced"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 40, "mid")
          .otherwise("high").as("qty_band"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  greatest(l_discount, l_tax) AS max_rate,
             |  least(l_discount, l_tax) AS min_rate,
             |  nullif(l_returnflag, 'N') AS flag_or_null,
             |  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_coalesced,
             |  CASE WHEN l_quantity < 10 THEN 'low'
             |       WHEN l_quantity < 40 THEN 'mid' ELSE 'high' END AS qty_band
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // exact interpolated percentiles per group
    QueryDef(
      "agg_percentile",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_price"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
             |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
             |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // inverted-index style: top document-frequency terms
    QueryDef(
      "text_top_terms",
      (s, dir) => graft.ops.Dedup.tokenSets(Tables.documents(s, dir), "doc_id", "text")
        .groupBy("tok").agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), col("tok"))
        .limit(20),
      Some("""SELECT tok, count(*) AS df FROM (
             |  SELECT DISTINCT doc_id, tok
             |  FROM (SELECT doc_id,
             |          list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS toks
             |        FROM documents) d, UNNEST(d.toks) AS t(tok))
             |GROUP BY tok ORDER BY df DESC, tok LIMIT 20""".stripMargin)
    ),

    // window-function family beyond row_number
    QueryDef(
      "w2_window_funcs",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w  = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir).select(
          col("o_custkey"), col("o_orderkey"),
          rank().over(Window.partitionBy("o_custkey")
            .orderBy(desc("o_totalprice"), col("o_orderkey"))).cast("long").as("price_rank"),
          dense_rank().over(Window.partitionBy("o_custkey")
            .orderBy(col("o_orderstatus"))).cast("long").as("status_drank"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          count(lit(1)).over(wr).cast("long").as("running_n"),
          round(sum(col("o_totalprice")).over(wr), 2).as("running_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank,
             |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS status_drank,
             |  lag(o_orderkey, 1) OVER w AS prev_order,
             |  lead(o_orderkey, 1) OVER w AS next_order,
             |  CAST(count(*) OVER wr AS BIGINT) AS running_n,
             |  round(sum(o_totalprice) OVER wr, 2) AS running_total
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |       wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),

    // full outer join with both-null handling
    QueryDef(
      "join_full_outer",
      (s, dir) => {
        val c = Tables.customer(s, dir).groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_cust"))
        val su = Tables.supplier(s, dir).groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_supp"))
        c.join(su, c("c_nationkey") === su("s_nationkey"), "full_outer")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
             |  coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
             |FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
             |FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
             |  ON c.c_nationkey = s.s_nationkey
             |ORDER BY nationkey""".stripMargin)
    ),

    // bag-semantics set ops
    QueryDef(
      "set_except_all",
      (s, dir) => Tables.orders(s, dir).select(col("o_custkey").as("k"))
        .exceptAll(Tables.customer(s, dir).select(col("c_custkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT k, count(*) AS n FROM (
             |  SELECT o_custkey AS k FROM orders
             |  EXCEPT ALL SELECT c_custkey AS k FROM customer)
             |GROUP BY k ORDER BY k""".stripMargin)
    ),

    // bag intersection (multiplicity = min of the two sides)
    QueryDef(
      "set_intersect_all",
      (s, dir) => Tables.orders(s, dir).select(col("o_custkey").as("k"))
        .intersectAll(Tables.lineitem(s, dir).select(col("l_suppkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT k, count(*) AS n FROM (
             |  SELECT o_custkey AS k FROM orders
             |  INTERSECT ALL SELECT l_suppkey AS k FROM lineitem)
             |GROUP BY k ORDER BY k""".stripMargin)
    ),

    // boolean aggregate family: conditional counts and every/any per group
    QueryDef(
      "agg_boolean",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          bool_and(col("l_quantity") >= 1.0).as("all_qty_positive"),
          bool_or(col("l_tax") > 0.07).as("any_high_tax"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
             |  bool_and(l_quantity >= 1.0) AS all_qty_positive,
             |  bool_or(l_tax > 0.07) AS any_high_tax
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ordered string aggregation
    QueryDef(
      "agg_string",
      (s, dir) => Tables.nation(s, dir)
        .groupBy("n_regionkey")
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
        .orderBy("n_regionkey"),
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    ),

    // null-safe equality (<=> / IS NOT DISTINCT FROM)
    QueryDef(
      "fn_nullsafe",
      (s, dir) => Tables.orders(s, dir).select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("st_n"))
        .withColumn("same_as_null", col("st_n") <=> lit(null))
        .withColumn("same_as_f", col("st_n") <=> lit("F"))
        .select("o_orderkey", "st_n", "same_as_null", "same_as_f")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st_n,
             |  nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL AS same_as_null,
             |  nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS same_as_f
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),

    // nested types: struct construction + field access, map construction +
    // key lookup (DuckDB map extraction yields a list — [1] unwraps it)
    QueryDef(
      "fn_nested",
      (s, dir) => Tables.customer(s, dir).select(
        col("c_custkey"),
        struct(col("c_name").as("name"), col("c_acctbal").as("bal"))
          .getField("name").as("s_name"),
        element_at(
          map(lit("seg"), col("c_mktsegment"),
            lit("nat"), col("c_nationkey").cast("string")), "seg").as("m_seg"),
        element_at(
          map(lit("seg"), col("c_mktsegment"),
            lit("nat"), col("c_nationkey").cast("string")), "missing").as("m_absent"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  struct_pack(name := c_name, bal := c_acctbal).name AS s_name,
             |  (map(['seg','nat'], [c_mktsegment, CAST(c_nationkey AS VARCHAR)])['seg'])[1] AS m_seg,
             |  (map(['seg','nat'], [c_mktsegment, CAST(c_nationkey AS VARCHAR)])['missing'])[1] AS m_absent
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),

    // analytic-window family: distribution functions + value accessors
    QueryDef(
      "w3_window_analytics",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
        Tables.customer(s, dir).select(
          col("c_nationkey"), col("c_custkey"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("c_custkey")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("poorest"),
          nth_value(col("c_custkey"), 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_poorest"))
          .orderBy("c_nationkey", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey,
             |  percent_rank() OVER w AS pct_rank,
             |  cume_dist() OVER w AS cume,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |  first_value(c_custkey) OVER wr AS poorest,
             |  nth_value(c_custkey, 2) OVER wr AS second_poorest
             |FROM customer
             |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey),
             |       wr AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY c_nationkey, c_custkey""".stripMargin)
    ),

    // time-RANGE window frame: trailing-30-day per-customer spend. Ordered
    // on epoch seconds so both engines use a numeric RANGE frame; the sum
    // runs in exact decimal (sliding-frame double add/remove orders differ
    // per engine — NOTES.md money-sum rule).
    QueryDef(
      "w4_window_range_frame",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("epoch_s"))
          .rangeBetween(-2592000L, 0L) // 30 days in seconds
        Tables.orders(s, dir)
          .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
          .select(col("o_orderkey"), col("o_custkey"),
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double").as("spend_30d"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
             |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),

    // range (interval) join: orders matched into derived quarter intervals
    // by containment. Bucketed (graft.ops.RangeJoin) so the plan is a
    // BroadcastHashJoin on the bucket key with the range predicate as a
    // residual — never a nested-loop sweep of points × intervals.
    QueryDef(
      "range_join_quarters",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val quarters = o.select(date_trunc("quarter", col("o_orderdate")).as("q_start"))
          .distinct()
          .withColumn("q_end", expr("q_start + INTERVAL 3 MONTH"))
        graft.ops.RangeJoin.intervalJoin(o, quarters, "o_orderdate",
            "q_start", "q_end", bucketDays = 45)
          .groupBy("q_start")
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("q_start")
      },
      Some("""WITH quarters AS (
             |  SELECT DISTINCT date_trunc('quarter', o_orderdate) AS q_start,
             |    date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH AS q_end
             |  FROM orders)
             |SELECT q_start, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN quarters
             |  ON o_orderdate >= q_start AND o_orderdate < q_end
             |GROUP BY q_start ORDER BY q_start""".stripMargin)
    ),

    // salted two-phase aggregation == plain GROUP BY (skew rewrite proof).
    // The salt count comes from the MEASURED key distribution
    // (Skew.suggestSaltN — deterministic seeded sample): l_returnflag has
    // 3 heavy values, so the probe suggests real salting, and the rewrite
    // provably doesn't change the answer at any saltN.
    QueryDef(
      "skew_salted_agg",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val n = math.max(2, Skew.suggestSaltN(li, Seq("l_returnflag"),
          sampleFraction = 0.05))
        Skew.saltedSumCount(li, Seq("l_returnflag"), "l_quantity",
          saltN = n, saltBy = Seq("l_orderkey"))
          .select(col("l_returnflag"), col("sum_l_quantity").as("sum_qty"), col("n_rows"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // salted replicated join == plain inner join (the hot-key join rewrite:
    // the fact side is salted, the dim side replicated saltN×, so one hot
    // nation key spreads over saltN reducers without changing the answer)
    QueryDef(
      "skew_salted_join",
      (s, dir) => Skew.saltedJoin(
        Tables.customer(s, dir),
        Tables.nation(s, dir).select(col("n_nationkey").as("c_nationkey"), col("n_name")),
        Seq("c_nationkey"), saltN = 8, saltBy = Seq("c_custkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy("n_name"),
      Some("""SELECT n_name, count(*) AS n_customers,
             |  round(sum(c_acctbal), 2) AS total_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)
    )
  )
}
