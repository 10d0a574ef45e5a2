package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.{Diff, Loading, ValueSpec}
import graft.ops.ValueSpec._

/** The reference's relational operator inventory (SURVEY.md §2.1–§2.7) as
  * verifiable queries over the test corpus. Each maps a §2 operator ID to a
  * DataFrame plan + DuckDB oracle SQL.
  */
object CoreQueries {

  def all: Seq[QueryDef] = Seq(

    // ── P1/P3/F1: mapped projection with every ValueSpec kind + WHERE ──────
    QueryDef(
      "p1_append_map",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        Loading.appendProjection(
          li,
          Seq(
            "order_id"   -> col_("l_orderkey"),
            "line_no"    -> col_("l_linenumber"),
            "src_label"  -> Str("datacamp"),
            "unit_price" -> Sql("round(l_extendedprice * (1.0 - l_discount), 4)"),
            "load_date"  -> DateLit("15.3.2026"),
            "note"       -> Null()
          ),
          condition = Some("l_quantity > 45.0")
        ).orderBy("order_id", "line_no")
      },
      Some("""SELECT l_orderkey AS order_id, l_linenumber AS line_no,
             |'datacamp' AS src_label,
             |round(l_extendedprice * (1.0 - l_discount), 4) AS unit_price,
             |DATE '2026-03-15' AS load_date, CAST(NULL AS VARCHAR) AS note,
             |'loaded' AS record_status
             |FROM lineitem WHERE l_quantity > 45.0
             |ORDER BY order_id, line_no""".stripMargin)
    ),

    // ── P2: identity projection from schema introspection ──────────────────
    QueryDef(
      "p2_identity",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        Loading.appendProjection(c, Loading.identityMapping(c)).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             |'loaded' AS record_status
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),

    // ── U1/J3: keyed update-join (UPDATE … JOIN as join+merge) ─────────────
    QueryDef(
      "u1_update_join",
      (s, dir) => {
        val orders = Tables.orders(s, dir).withColumn("record_status", lit("new"))
        val sta = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
            count(lit(1)).as("n_items"))
        Loading.updateWithMap(
          orders, sta,
          mapping   = Seq("o_totalprice" -> qcol("sta", "revenue")),
          keys      = Seq("o_orderkey"),
          condition = Some("sta.n_items > 1")
        ).orderBy("o_orderkey")
      },
      Some("""WITH sta AS (
             |  SELECT l_orderkey AS o_orderkey,
             |         round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
             |         count(*) AS n_items
             |  FROM lineitem GROUP BY 1)
             |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
             |  CASE WHEN s.o_orderkey IS NOT NULL AND s.n_items > 1
             |       THEN s.revenue ELSE o.o_totalprice END AS o_totalprice,
             |  o.o_orderdate, o.o_orderpriority,
             |  CASE WHEN s.o_orderkey IS NOT NULL AND s.n_items > 1
             |       THEN 'loaded' ELSE 'new' END AS record_status
             |FROM orders o LEFT JOIN sta s ON o.o_orderkey = s.o_orderkey
             |ORDER BY o.o_orderkey""".stripMargin)
    ),

    // ── U3: finalize/publish status transition ─────────────────────────────
    QueryDef(
      "u3_finalize",
      (s, dir) => {
        val ds = Tables.orders(s, dir)
          .withColumn("record_status",
            when(col("o_orderstatus") === "F", lit("loaded")).otherwise(lit("pending")))
        Loading.finalizeDataset(ds, batchId = 42L, now = expr("timestamp'2026-01-15 12:00:00'"))
          .select("o_orderkey", "record_status", "created_at", "created_by",
                  "quality_status", "batch_id", "validity_date", "is_hidden")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'F' THEN 'new' ELSE 'pending' END AS record_status,
             |  CASE WHEN o_orderstatus = 'F' THEN TIMESTAMP '2026-01-15 12:00:00' END AS created_at,
             |  CASE WHEN o_orderstatus = 'F' THEN 'system_loading' END AS created_by,
             |  CASE WHEN o_orderstatus = 'F' THEN 'ok' END AS quality_status,
             |  CASE WHEN o_orderstatus = 'F' THEN CAST(42 AS BIGINT) END AS batch_id,
             |  CAST(NULL AS DATE) AS validity_date,
             |  CASE WHEN o_orderstatus = 'F' THEN true ELSE false END AS is_hidden
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),

    // ── F1: predicate filter from a SQL condition string ───────────────────
    QueryDef(
      "f1_filter",
      (s, dir) => Loading.appendProjection(
        Tables.lineitem(s, dir),
        Loading.identityMapping(Tables.lineitem(s, dir)),
        condition = Some("l_returnflag = 'R' AND l_quantity >= 30.0"),
        withRecordStatus = false
      ).orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             |l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
             |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 30.0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // ── F2: incremental watermark filter ───────────────────────────────────
    QueryDef(
      "f2_incremental",
      (s, dir) => Loading.incrementalFilter(
        Tables.lineitem(s, dir), "l_shipdate", expr("timestamp'2000-01-01 00:00:00'"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate
             |FROM lineitem WHERE l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // ── A1: MD5 row fingerprint ────────────────────────────────────────────
    QueryDef(
      "a1_fingerprint",
      (s, dir) => Diff.recordFingerprint(
        Tables.part(s, dir), Seq("p_partkey"), Seq("p_name", "p_brand", "p_type", "p_size"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |md5(concat(coalesce(p_name,''), coalesce(p_brand,''),
             |           coalesce(p_type,''), coalesce(CAST(p_size AS VARCHAR),''))) AS md5_sum
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),

    // ── §2.7 flagship: CDC table diff (J1 anti + J2 residual in one join) ──
    QueryDef(
      "cdc_table_diff",
      (s, dir) => {
        val t1 = Tables.orders(s, dir)
        val t2 = t1.filter(col("o_orderkey") % 7 =!= 0)
          .withColumn("o_orderpriority",
            when(col("o_orderkey") % 5 === 0, lit("X-MODIFIED")).otherwise(col("o_orderpriority")))
        Diff.tableDiff(t1, t2, Seq("o_orderkey"), Seq("o_orderstatus", "o_orderpriority"))
          .orderBy("o_orderkey")
      },
      Some("""WITH t2 AS (
             |  SELECT o_orderkey, o_orderstatus,
             |    CASE WHEN o_orderkey % 5 = 0 THEN 'X-MODIFIED' ELSE o_orderpriority END AS o_orderpriority
             |  FROM orders WHERE o_orderkey % 7 <> 0),
             |f1 AS (SELECT o_orderkey,
             |  md5(concat(coalesce(o_orderstatus,''), coalesce(o_orderpriority,''))) AS md5_sum FROM orders),
             |f2 AS (SELECT o_orderkey,
             |  md5(concat(coalesce(o_orderstatus,''), coalesce(o_orderpriority,''))) AS md5_sum FROM t2)
             |SELECT f1.o_orderkey,
             |  CASE WHEN f2.o_orderkey IS NULL THEN 'n' ELSE 'c' END AS diff
             |FROM f1 LEFT JOIN f2 ON f1.o_orderkey = f2.o_orderkey
             |WHERE f2.o_orderkey IS NULL OR f1.md5_sum <> f2.md5_sum
             |ORDER BY f1.o_orderkey""".stripMargin)
    ),

    // ── J1: anti-join (customers with no orders) ───────────────────────────
    QueryDef(
      "j1_anti_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)
    ),

    // ── J2: inner join + inequality residual ───────────────────────────────
    QueryDef(
      "j2_changed_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o  = Tables.orders(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .filter(col("l_extendedprice") > col("o_totalprice"))
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, o_totalprice
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_extendedprice > o_totalprice
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // ── GROUP BY family (north-star §7.3): TPC-H-style pricing summary ─────
    // Money sums run in EXACT decimal and only cast to double at the output
    // boundary: at 100 TB a double fold's order-dependent ulp error exceeds
    // any rounding guard (observed at sf0.1 already), while decimal sums are
    // order-independent and bit-identical across engines.
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        val price = col("l_extendedprice").cast("decimal(12,2)")
        val disc1 = (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(4,2)")
        val tax1  = (lit(1) + col("l_tax").cast("decimal(3,2)")).cast("decimal(4,2)")
        val prod1 = (price * disc1).cast("decimal(18,4)")
        val prod2 = (prod1 * tax1).cast("decimal(24,6)")
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= expr("timestamp'1998-09-02 00:00:00'"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            sum(price).cast("double").as("sum_base_price"),
            sum(prod1).cast("double").as("sum_disc_price"),
            sum(prod2).cast("double").as("sum_charge"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) * CAST(1 + CAST(l_tax AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // ── join + agg + deterministic top-k ───────────────────────────────────
    QueryDef(
      "q3_topk_revenue",
      (s, dir) => {
        val c  = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o  = Tables.orders(s, dir).filter(col("o_orderdate") < expr("timestamp'1997-01-01 00:00:00'"))
        val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > expr("timestamp'1997-01-01 00:00:00'"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
          .orderBy(desc("revenue"), col("o_orderkey"))
          .limit(10)
          .select("o_orderkey", "revenue", "o_orderdate")
      },
      Some("""SELECT o_orderkey,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue, o_orderdate
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
    ),

    // ── multi-way join with broadcast dims ─────────────────────────────────
    QueryDef(
      "q5_nation_revenue",
      (s, dir) => {
        val c  = Tables.customer(s, dir)
        val o  = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= expr("timestamp'1995-01-01 00:00:00'") &&
                  col("o_orderdate") <  expr("timestamp'1999-01-01 00:00:00'"))
        val li = Tables.lineitem(s, dir)
        val su = Tables.supplier(s, dir)
        val n  = Tables.nation(s, dir)
        val r  = Tables.region(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(li, o("o_orderkey") === li("l_orderkey"))
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(sum((col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(4,2)"))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name,
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)
    ),

    // ── conditional-aggregate ratio (TPC-H Q14 shape) ──────────────────────
    QueryDef(
      "q14_promo_ratio",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
                  col("l_shipdate") <  expr("timestamp'1997-01-01 00:00:00'"))
        val p   = Tables.part(s, dir)
        val rev = (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(4,2)"))
          .cast("decimal(18,4)")
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .agg((lit(100.0) *
            sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
            sum(rev).cast("double")).as("promo_revenue_pct"))
      },
      Some("""SELECT 100.0 *
             |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
             |        THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))
             |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE)
             |  AS promo_revenue_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'""".stripMargin)
    ),

    // ── correlated aggregate filter (TPC-H Q17 shape) ──────────────────────
    QueryDef(
      "q17_small_qty",
      (s, dir) => {
        val li     = Tables.lineitem(s, dir)
        val perPart = li.groupBy(col("l_partkey").as("p_key"))
          .agg(avg("l_quantity").as("avg_qty"))
        li.join(perPart, li("l_partkey") === perPart("p_key"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(
            sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("total_price"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
             |  count(*) AS n_rows
             |FROM lineitem l
             |JOIN (SELECT l_partkey AS p_key, avg(l_quantity) AS avg_qty
             |      FROM lineitem GROUP BY 1) a ON l.l_partkey = a.p_key
             |WHERE l.l_quantity < 0.5 * a.avg_qty""".stripMargin)
    ),

    // ── TPC-H q10 shape: returned-item revenue per customer ────────────────
    QueryDef(
      "q10_returned_items",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= expr("timestamp'1996-10-01 00:00:00'") &&
            col("o_orderdate") < expr("timestamp'1997-01-01 00:00:00'"))
        val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        val c  = Tables.customer(s, dir)
        val n  = Tables.nation(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
          .orderBy(desc("revenue"), col("c_custkey"))
          .limit(20)
          .select("c_custkey", "c_name", "revenue", "n_name")
      },
      Some("""SELECT c_custkey, c_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue, n_name
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
    ),

    // ── TPC-H q18 shape: large-volume orders (agg-filtered semi join) ──────
    QueryDef(
      "q18_large_orders",
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
          .filter(col("sum_qty") > 250)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        big.join(o, big("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
            round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, o_orderkey, o_orderdate,
             |  round(o_totalprice, 2) AS o_totalprice, sum_qty
             |FROM (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
             |      FROM lineitem GROUP BY 1 HAVING CAST(sum(l_quantity) AS BIGINT) > 250) big
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)
    ),

    // ── window functions: top-3 orders per customer ────────────────────────
    QueryDef(
      "w1_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    CAST(row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
             |  FROM orders) WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)
    ),

    // ── set operations ─────────────────────────────────────────────────────
    QueryDef(
      "set_intersect",
      (s, dir) => Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .intersect(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |INTERSECT SELECT o_custkey AS c_custkey FROM orders
             |ORDER BY c_custkey""".stripMargin)
    ),
    QueryDef(
      "set_except",
      (s, dir) => Tables.customer(s, dir).select("c_custkey")
        .except(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
             |EXCEPT SELECT o_custkey AS c_custkey FROM orders
             |ORDER BY c_custkey""".stripMargin)
    ),
    QueryDef(
      "set_union",
      (s, dir) => Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .union(Tables.orders(s, dir).filter(col("o_totalprice") > 200000.0)
          .select(col("o_custkey").as("c_custkey")))
        .distinct()
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |UNION SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000.0
             |ORDER BY c_custkey""".stripMargin)
    ),

    // ── TPC-H q4 shape: priority count over an EXISTS semi join ───────────
    // (the corpus has no l_commitdate/l_receiptdate; "late" is adapted to
    // shipped >60 days after order date — same semi-join + agg shape)
    QueryDef(
      "q4_order_priority",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("timestamp'1996-04-01 00:00:00'"))
        val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
        o.join(li, o("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),

    // ── TPC-H q6 shape: pure scan-side filter + decimal-exact agg ─────────
    QueryDef(
      "q6_filter_revenue",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp'1997-01-01 00:00:00'") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice").cast("decimal(12,2)") *
            col("l_discount").cast("decimal(3,2)")).cast("decimal(18,4)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24""".stripMargin)
    ),

    // ── TPC-H q12 shape: join + conditional two-way counts per group ──────
    // (no l_shipmode column in the corpus; grouped by l_linestatus)
    QueryDef(
      "q12_priority_by_status",
      (s, dir) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("timestamp'1997-01-01 00:00:00'"))
        val o = Tables.orders(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
    ),

    // ── TPC-H q19 shape: disjunctive brand/size/quantity predicates ───────
    QueryDef(
      "q19_disjunctive_revenue",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val p = Tables.part(s, dir)
        val rev = (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(4,2)"))
          .cast("decimal(18,4)")
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 25) &&
              col("l_quantity").between(5, 30)) ||
            (col("p_brand") === "Brand#13" && col("p_size").between(1, 35) &&
              col("l_quantity").between(10, 40)))
          .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_rows"))
      },
      Some("""SELECT
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
             |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 5 AND 30)
             |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 10 AND 40)""".stripMargin)
    ),

    // ── TPC-H q7 shape: bidirectional nation-pair trade volume ────────────
    // Both dimension chains (supplier→nation, customer→nation) are
    // prefiltered to the two nations BEFORE the fact joins, so the big
    // lineitem⋈orders shuffle carries only pair-relevant rows; nation is
    // broadcast into both sides.
    QueryDef(
      "q7_volume_shipping",
      (s, dir) => {
        val pair = Seq("NATION_1", "NATION_2")
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("timestamp'1998-01-01 00:00:00'"))
        val o = Tables.orders(s, dir)
        val suN = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("s_nk"))
          .filter(col("supp_nation").isin(pair: _*))
        val cN = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("c_nk"))
          .filter(col("cust_nation").isin(pair: _*))
        val rev = (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(4,2)"))
          .cast("decimal(18,4)")
        li.join(broadcast(suN), li("l_suppkey") === suN("s_suppkey"))
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .join(cN, o("o_custkey") === cN("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .withColumn("l_year", year(col("l_shipdate")))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
             |    l_extendedprice, l_discount
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
             |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
    ),

    // ── TPC-H q8 shape: market share of one nation within a region ────────
    QueryDef(
      "q8_market_share",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("timestamp'1998-01-01 00:00:00'"))
        val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        val cR = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val suN = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("s_nk"))
          .select("s_suppkey", "supp_nation")
        val rev = (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(4,2)"))
          .cast("decimal(18,4)")
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .join(cR, o("o_custkey") === cR("c_custkey"))
          .join(broadcast(suN), li("l_suppkey") === suN("s_suppkey"))
          .withColumn("o_year", year(col("o_orderdate")))
          .withColumn("vol", rev)
          .groupBy("o_year")
          .agg((sum(when(col("supp_nation") === "NATION_3", col("vol"))
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
            sum(col("vol")).cast("double")).as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""SELECT o_year,
             |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             |    / CAST(sum(vol) AS DOUBLE) AS mkt_share
             |FROM (
             |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS vol,
             |    n1.n_name AS supp_nation
             |  FROM lineitem
             |  JOIN part ON l_partkey = p_partkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  JOIN region ON n2.n_regionkey = r_regionkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
             |GROUP BY o_year ORDER BY o_year""".stripMargin)
    ),

    // ── TPC-H q9 shape: product profit by supplier nation and year ────────
    // (the corpus has no partsupp/ps_supplycost; profit is adapted to
    // discounted revenue — same join tree and aggregation shape)
    QueryDef(
      "q9_product_profit",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
        val p = Tables.part(s, dir).filter(col("p_name").contains("red"))
        val suN = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))),
            col("s_nationkey") === col("s_nk"))
          .select("s_suppkey", "nation")
        val rev = (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(4,2)"))
          .cast("decimal(18,4)")
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .join(broadcast(suN), li("l_suppkey") === suN("s_suppkey"))
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .withColumn("o_year", year(col("o_orderdate")))
          .groupBy("nation", "o_year")
          .agg(sum(rev).cast("double").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON l_orderkey = o_orderkey
             |WHERE p_name LIKE '%red%'
             |GROUP BY 1, 2
             |ORDER BY 1, 2 DESC""".stripMargin)
    ),

    // ── TPC-H q13 shape: customer order-count distribution ────────────────
    // Left outer join with a join-side predicate (not a WHERE — customers
    // with zero qualifying orders must survive with c_count = 0), then a
    // second aggregation over the first's result.
    QueryDef(
      "q13_order_distribution",
      (s, dir) => {
        val c = Tables.customer(s, dir).select("c_custkey")
        val o = Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
             |      FROM customer LEFT OUTER JOIN orders
             |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |      GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)
    ),

    // ── TPC-H q15 shape: top supplier vs a scalar-subquery max ────────────
    QueryDef(
      "q15_top_supplier",
      (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("timestamp'1996-04-01 00:00:00'"))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum((col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(4,2)"))
            .cast("decimal(18,4)")).cast("double").as("total_revenue"))
        val mx = rev.agg(max("total_revenue").as("mx"))
        rev.join(broadcast(mx)).filter(col("total_revenue") === col("mx"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("supplier_no") === col("s_suppkey"))
          .select("s_suppkey", "s_name", "total_revenue")
          .orderBy("s_suppkey")
      },
      Some("""WITH revenue AS (
             |  SELECT l_suppkey AS supplier_no,
             |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, total_revenue
             |FROM supplier JOIN revenue ON s_suppkey = supplier_no
             |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
             |ORDER BY s_suppkey""".stripMargin)
    ),

    // ── TPC-H q22 shape: above-average idle customers per segment ─────────
    // (the corpus has no c_phone; the country-code substring group is
    // adapted to c_mktsegment, and "no orders" to "no 1-URGENT orders" —
    // every sf0.01 customer has SOME order — keeping the same
    // scalar-subquery threshold + NOT EXISTS anti join + aggregate
    // shape). The threshold is derived as exact-decimal sum / count so
    // both engines compute the identical double.
    QueryDef(
      "q22_idle_customers",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val thr = c.filter(col("c_acctbal") > 0.0)
          .agg((sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") /
            count(lit(1))).as("thr"))
        c.join(broadcast(thr)).filter(col("c_acctbal") > col("thr"))
          .join(Tables.orders(s, dir)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("numcust"),
            sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("totacctbal"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS numcust,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (
             |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
             |    FROM customer WHERE c_acctbal > 0.0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    ),

    // ── TPC-H q2 shape: min-cost supplier per part in a region ────────────
    // No partsupp table in the corpus; lineitem stands in as the
    // part–supplier supply relation with supply_cost = min line price per
    // (part, supplier) — decimal-exact, so min() is engine-portable. The
    // correlated min-cost subquery becomes a re-aggregation + equi-join;
    // the region-filtered supplier dimension and the part filter are
    // broadcast (both bounded dims), so the only big shuffles are the
    // supply aggregation and the per-part min — each on a single key.
    QueryDef(
      "q2_min_cost_supplier",
      (s, dir) => {
        // The part predicate (p_size/p_type) selects WHICH partkeys are
        // output, and every aggregation below is keyed by partkey — so a
        // broadcast semi-join of the selected part keys pushed BELOW the
        // (partkey, suppkey) aggregation restricts the groups without
        // changing any surviving group's min (guide §3.2: pre-filter the
        // big side before its shuffle; the optimizer cannot move the part
        // join below the min-cost self-aggregation itself). Results are
        // identical: the final inner join applies the same key filter.
        val partsSel = Tables.part(s, dir)
          .filter(col("p_size") <= 10 && col("p_type") === "LARGE")
        val supply = Tables.lineitem(s, dir)
          .join(broadcast(partsSel.select("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
          .agg(min(col("l_extendedprice").cast("decimal(12,2)")).as("cost"))
        val dims = Tables.supplier(s, dir)
          .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_acctbal", "s_name", "n_name")
        val eligible = supply.join(broadcast(dims), col("suppkey") === col("s_suppkey"))
        val minCost = eligible.groupBy("partkey").agg(min("cost").as("mincost"))
        eligible.join(minCost, Seq("partkey"))
          .filter(col("cost") === col("mincost"))
          .join(broadcast(partsSel), col("partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
            col("p_brand"), col("cost").cast("double").as("supply_cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH supply AS (
             |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             |         min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
             |  FROM lineitem GROUP BY 1,2),
             |eligible AS (
             |  SELECT su.partkey, su.cost, s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
             |  FROM supply su JOIN supplier s ON su.suppkey = s.s_suppkey
             |  JOIN nation n ON s.s_nationkey = n.n_nationkey
             |  JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'EUROPE')
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
             |       CAST(cost AS DOUBLE) AS supply_cost
             |FROM eligible e JOIN part p ON e.partkey = p.p_partkey
             |WHERE p_size <= 10 AND p_type = 'LARGE'
             |  AND cost = (SELECT min(cost) FROM eligible e2 WHERE e2.partkey = e.partkey)
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin)
    ),

    // ── TPC-H q11 shape: important stock value per part vs global share ───
    // Inventory value adapted to lineitem (price × qty, decimal-exact).
    // The scalar-subquery total is the decimal re-sum of the per-part
    // group sums (associative, exact) — one shuffle total, not a second
    // scan; the threshold comparison happens in double on both engines.
    QueryDef(
      "q11_important_stock",
      (s, dir) => {
        val suppN = Tables.supplier(s, dir)
          .join(Tables.nation(s, dir).filter(col("n_name") === "NATION_3"),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val joined = Tables.lineitem(s, dir)
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        val value = joined
          .groupBy(col("l_partkey").as("partkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            col("l_quantity").cast("decimal(12,2)")).as("dval"))
        val total = value.agg(sum("dval").cast("double").as("total"))
        value.join(broadcast(total))
          .filter(col("dval").cast("double") > col("total") * 0.0003)
          .select(col("partkey"), col("dval").cast("double").as("val"))
          .orderBy(col("val").desc, col("partkey"))
      },
      Some("""WITH value AS (
             |  SELECT l_partkey AS partkey,
             |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS dval
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  WHERE n_name = 'NATION_3' GROUP BY 1)
             |SELECT partkey, CAST(dval AS DOUBLE) AS val FROM value
             |WHERE CAST(dval AS DOUBLE) > (SELECT CAST(sum(dval) AS DOUBLE) * 0.0003 FROM value)
             |ORDER BY val DESC, partkey""".stripMargin)
    ),

    // ── TPC-H q16 shape: supplier counts by part attribute, NOT IN dim ────
    // The part–supplier relation is the distinct (l_partkey, l_suppkey)
    // projection; the NOT IN over negative-balance suppliers is a
    // broadcast anti join (s_suppkey is non-null, so anti ≡ NOT IN).
    QueryDef(
      "q16_parts_supplier_counts",
      (s, dir) => {
        // Both the NOT-IN supplier filter and the part predicate are
        // row-wise key filters on the distinct's own columns, so they
        // commute with the distinct — applied as broadcast anti/semi
        // joins BELOW it, the (partkey, suppkey) dedup exchange carries
        // only surviving keys (guide §2.3: shuffle fewer bytes; the
        // planner cannot reorder joins past a Deduplicate). Rows are
        // identical: distinct∘filter ≡ filter∘distinct for per-row
        // predicates on the distinct key.
        val badSupp = Tables.supplier(s, dir)
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        val partsSel = Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#5" &&
            !col("p_type").startsWith("PROMO") &&
            col("p_size").isin(1, 4, 7))
        val ps = Tables.lineitem(s, dir)
          .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
          .join(broadcast(badSupp), col("suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(partsSel.select("p_partkey")),
            col("partkey") === col("p_partkey"), "left_semi")
          .distinct()
        ps.join(broadcast(partsSel), col("partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  CAST(count(DISTINCT suppkey) AS BIGINT) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem) ps
             |JOIN part ON partkey = p_partkey
             |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%' AND p_size IN (1,4,7)
             |  AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1,2,3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    ),

    // ── TPC-H q20 shape: suppliers with excess stock of selected parts ────
    // availqty adapted to total quantity supplied per (part, supplier);
    // the 1996 shipped quantity comes from a conditional sum in the SAME
    // aggregation (null when no 1996 rows ≡ the oracle's inner join), so
    // one lineitem scan and one shuffle cover both subqueries. Quantities
    // are integral doubles — sums are exact in any order on both engines.
    QueryDef(
      "q20_excess_stock_suppliers",
      (s, dir) => {
        val in96 = col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp'1997-01-01 00:00:00'")
        // The red-part filter is a key filter on pk, one of the two group
        // keys — pushed BELOW the aggregation as a broadcast semi-join it
        // prunes lineitem before the (pk, sk) shuffle instead of pruning
        // finished groups after it (guide §3.2). Per-group sums over the
        // surviving keys are untouched, so rows are identical to the old
        // post-aggregation semi-join.
        val ps = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
              .filter(col("p_name").startsWith("red")).select("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .agg(sum("l_quantity").cast("double").as("avail_qty"),
            sum(when(in96, col("l_quantity"))).cast("double").as("ship_qty"))
          .filter(col("ship_qty").isNotNull &&
            col("avail_qty") > lit(0.5) * col("ship_qty"))
        Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_1")),
            col("s_nationkey") === col("n_nationkey"))
          .join(ps.select("sk").distinct(), col("s_suppkey") === col("sk"), "left_semi")
          .select(col("s_name"), col("s_acctbal").cast("double").as("s_acctbal"))
          .orderBy("s_name")
      },
      Some("""WITH avail AS (
             |  SELECT l_partkey AS pk, l_suppkey AS sk,
             |    CAST(sum(l_quantity) AS DOUBLE) AS avail_qty
             |  FROM lineitem GROUP BY 1,2),
             |shipped AS (
             |  SELECT l_partkey AS pk, l_suppkey AS sk,
             |    CAST(sum(l_quantity) AS DOUBLE) AS ship_qty
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  GROUP BY 1,2)
             |SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name = 'NATION_1' AND s_suppkey IN (
             |  SELECT a.sk FROM avail a JOIN shipped sh ON a.pk = sh.pk AND a.sk = sh.sk
             |  WHERE a.pk IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
             |    AND a.avail_qty > 0.5 * sh.ship_qty)
             |ORDER BY s_name""".stripMargin)
    ),

    // ── TPC-H q21 shape: sole late supplier per multi-supplier order ──────
    // No receipt/commit dates in the corpus; "late" is adapted to shipping
    // more than 60 days after the order date (same per-order reference
    // point for the outer row and the NOT EXISTS probe). EXISTS/NOT
    // EXISTS become semi/anti joins keyed on the order — the non-equi
    // supplier-differs predicate rides along as a join residual, so both
    // probes shuffle on l_orderkey only.
    QueryDef(
      "q21_sole_late_supplier",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
        val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val late = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        val others = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
        val lateOthers = late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
        late
          .join(others, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
            "left_semi")
          .join(lateOthers, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
            "left_anti")
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM supplier
             |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
             |JOIN orders ON o_orderkey = l1.l_orderkey
             |WHERE o_orderstatus = 'F'
             |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
    ),

    // ── distinct aggregates ────────────────────────────────────────────────
    QueryDef(
      "agg_distinct",
      (s, dir) => Tables.lineitem(s, dir).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty")),
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
             |count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows,
             |min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
             |FROM lineitem""".stripMargin)
    )
  )
}
