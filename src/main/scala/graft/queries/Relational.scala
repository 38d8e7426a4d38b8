package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Cleaning, Conform, Dedup, Enrich}
import org.apache.spark.sql.types._
import Registry._

/** Relational operator coverage (SURVEY.md §2.3-§2.9) over the TPC-H-ish
  * star schema. Query names carry the SURVEY operator IDs they exercise.
  *
  * Performance stance for all of these: filters/projections sit directly on
  * the parquet scan (pushdown), dimension joins are broadcast, aggregations
  * rely on Spark's partial (map-side) aggregation, and the only shuffles are
  * the ones the semantics require (groupBy/join keys).
  */
object Relational {

  val defs: Seq[(String, Entry)] = Seq(

    // ---- A1/A5: group-by sum + count (detail summarization,
    //      /root/reference/dags/CotyData_IPN.py:1235,1365,1689)
    "a1_group_sum" -> withOracle(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"),
               round(sum("l_extendedprice"), 2).as("sum_price"),
               count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus"),
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ---- A2/X15: group-max latest-event-wins flag derivation
    //      (/root/reference/dags/CotyData_IPN.py:702-708)
    "a2_group_max_flag" -> withOracle(
      (s, d) =>
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(date_format(max(when(col("event_type") === "error", col("ts"))),
                 "yyyy-MM-dd HH:mm:ss").as("last_error"),
               date_format(max(when(col("event_type") === "click", col("ts"))),
                 "yyyy-MM-dd HH:mm:ss").as("last_click"))
          .withColumn("error_after_click",
            when(col("last_error") > col("last_click"), 1).otherwise(0))
          .orderBy("user_id"),
      """SELECT user_id, last_error, last_click,
        |       CASE WHEN last_error > last_click THEN 1 ELSE 0 END AS error_after_click
        |FROM (
        |  SELECT user_id,
        |         strftime(max(CASE WHEN event_type = 'error' THEN ts END), '%Y-%m-%d %H:%M:%S') AS last_error,
        |         strftime(max(CASE WHEN event_type = 'click' THEN ts END), '%Y-%m-%d %H:%M:%S') AS last_click
        |  FROM events GROUP BY user_id
        |) ORDER BY user_id""".stripMargin),

    // ---- A3: full-row distinct (/root/reference/dags/Funciones_CotyData.py:310)
    "a3_distinct" -> withOracle(
      (s, d) =>
        Dedup.exact(Tables.lineitem(s, d).select("l_returnflag", "l_linestatus"))
          .orderBy("l_returnflag", "l_linestatus"),
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem ORDER BY 1, 2""".stripMargin),

    // ---- A4/§2.7: deterministic keep='first' dedup via Window+row_number
    //      (/root/reference/dags/CotyData_IPN.py:1750,1798)
    "a4_dedup_first" -> withOracle(
      (s, d) =>
        Dedup.keepFirst(Seq("l_orderkey"),
            Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
                col("l_quantity")))(Tables.lineitem(s, d))
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
          .orderBy("l_orderkey"),
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |                ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn
        |      FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin),

    // ---- J1: multi-key inner equi-join against a derived (part,supp) dim
    //      (/root/reference/dags/Funciones_CotyData.py:197,289)
    "j1_join_multikey" -> withOracle(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ps = li.groupBy("l_partkey", "l_suppkey")
          .agg(count(lit(1)).as("ps_cnt"), round(sum("l_quantity"), 2).as("ps_qty"))
          .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
                  col("ps_cnt"), col("ps_qty"))
        li.join(ps, li("l_partkey") === col("pk") && li("l_suppkey") === col("sk"))
          .groupBy("l_returnflag")
          .agg(sum("ps_cnt").as("cnt_sum"), round(sum("ps_qty"), 2).as("qty_sum"))
          .orderBy("l_returnflag")
      },
      """WITH ps AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |         count(*) AS ps_cnt, round(sum(l_quantity), 2) AS ps_qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l.l_returnflag,
        |       CAST(sum(ps.ps_cnt) AS BIGINT) AS cnt_sum,
        |       round(sum(ps.ps_qty), 2) AS qty_sum
        |FROM lineitem l
        |JOIN ps ON l.l_partkey = ps.pk AND l.l_suppkey = ps.sk
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- J2: left join with null-preserving count (zero-order customers)
    "j2_left_count" -> withOracle(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- J3: broadcast dim-lookup chain (Series.map semantics,
    //      /root/reference/dags/Funciones_CotyData.py:19-24)
    "j3_dim_lookup" -> withOracle(
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("acctbal_sum"))
          .orderBy("r_name")
      },
      """SELECT r_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS acctbal_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- J2-dual: same dim joined under two roles (origin/destination
    //      pattern, /root/reference/dags/CotyData_IPN.py:1138-1157)
    "j5_dual_dim" -> withOracle(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d)
        val c  = Tables.customer(s, d)
        val su = Tables.supplier(s, d)
        val n  = Tables.nation(s, d)
        val cn = n.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        val sn = n.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(cn), c("c_nationkey") === col("cn_key"))
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .join(broadcast(sn), su("s_nationkey") === col("sn_key"))
          .groupBy("cust_nation", "supp_nation")
          .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("revenue"))
          .orderBy("cust_nation", "supp_nation")
      },
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |       count(*) AS cnt, round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey  = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN supplier ON l_suppkey  = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ---- J6: anti-join (load-only-new, /root/reference/dags/CotyData_IPN.py:2148-2154)
    //      keyed on customers lacking 'P'-status orders so the result is
    //      non-vacuous at every SF
    "j6_anti" -> withOracle(
      (s, d) => {
        val c = Tables.customer(s, d)
        val p = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("c_custkey"))
        Enrich.antiJoin(c, p, Seq("c_custkey"))
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY 1""".stripMargin),

    // ---- J7: semi-join membership (/root/reference/dags/CotyData_IPN.py:79-80,139)
    "j7_semi" -> withOracle(
      (s, d) => {
        val c = Tables.customer(s, d)
        val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey"))
        Enrich.semiJoin(c, f, Seq("c_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
          .orderBy("c_mktsegment")
      },
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- F1: isin membership (credit-note set,
    //      /root/reference/dags/CotyData_IPN.py:73-75,112)
    "f1_isin" -> withOracle(
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_returnflag").isin("A", "R"))
          .groupBy("l_returnflag")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_returnflag IN ('A', 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- F2: negated 3-conjunct mask (/root/reference/dags/CotyData_IPN.py:1511-1518)
    "f2_negated" -> withOracle(
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(!(col("l_quantity") > 25 && col("l_discount") > 0.05 &&
                    col("l_returnflag") === "A"))
          .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("sum_price")),
      """SELECT count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE NOT (l_quantity > 25 AND l_discount > 0.05 AND l_returnflag = 'A')""".stripMargin),

    // ---- F3/X4: string-content predicate + unconditional prefix
    //      (/root/reference/dags/Funciones_CotyData.py:154-158)
    "f3_string_prefix" -> withOracle(
      (s, d) =>
        Tables.part(s, d)
          .withColumn("brand_code",
            Cleaning.prefixUnlessContains(col("p_name"), "green", "000-")
              .substr(lit(1), lit(4)))
          .groupBy("brand_code").agg(count(lit(1)).as("cnt"))
          .orderBy("brand_code"),
      """SELECT substr(CASE WHEN p_name NOT LIKE '%green%'
        |                   THEN '000-' || p_name ELSE p_name END, 1, 4) AS brand_code,
        |       count(*) AS cnt
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- F4/X3: ''/sentinel -> null then null-drop
    //      (/root/reference/dags/Funciones_CotyData.py:356; CotyData_IPN.py:97)
    "f4_null_drop" -> withOracle(
      (s, d) =>
        Tables.events(s, d)
          .withColumn("et", when(col("event_type") === "error", lit(null))
                              .otherwise(col("event_type")))
          .na.drop(Seq("et"))
          .groupBy("et").agg(count(lit(1)).as("cnt"))
          .orderBy("et"),
      """SELECT et, count(*) AS cnt
        |FROM (SELECT nullif(event_type, 'error') AS et FROM events)
        |WHERE et IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- P4: fixed-schema conform, missing column -> typed null
    //      (/root/reference/dags/CotyData_IPN.py:87-94)
    "p4_conform" -> withOracle(
      (s, d) =>
        Conform.conformTo(StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType),
          StructField("missing_note", StringType))))(Tables.orders(s, d))
          .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |       CAST(NULL AS VARCHAR) AS missing_note
        |FROM orders ORDER BY 1""".stripMargin),

    // ---- P6/X10: derived measures with conditional fiscal arithmetic
    //      (/root/reference/dags/CotyData_IPN.py:107-108,129,133-134)
    "p6_derived" -> withOracle(
      (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net"),
            (col("l_extendedprice") * (lit(1) - col("l_discount")) *
             (lit(1) + col("l_tax"))).as("gross"),
            when(col("l_returnflag").isin("A", "R"),
                 col("l_extendedprice") / 1.21 * 0.21)
              .otherwise(0.0).as("utilidad_fiscal"))
          .orderBy("l_orderkey", "l_linenumber", "net", "gross", "utilidad_fiscal"),
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice * (1 - l_discount), 4) AS net,
        |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross,
        |       CASE WHEN l_returnflag IN ('A', 'R')
        |            THEN l_extendedprice / 1.21 * 0.21 ELSE 0.0 END AS utilidad_fiscal
        |FROM lineitem ORDER BY 1, 2, 3, 4, 5""".stripMargin),

    // ---- P8: conditional sign flip (credit-note convention,
    //      /root/reference/dags/CotyData_IPN.py:112-113,139,160)
    "p8_signflip" -> withOracle(
      (s, d) =>
        Cleaning.signFlip(Seq("l_quantity", "l_extendedprice"),
                          col("l_returnflag") === "R")(Tables.lineitem(s, d))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END AS l_quantity,
        |       CASE WHEN l_returnflag = 'R' THEN -l_extendedprice ELSE l_extendedprice END AS l_extendedprice
        |FROM lineitem ORDER BY 1, 2, 3, 4""".stripMargin),

    // ---- X1: split-into-columns (invoice "0001-00001234" split,
    //      /root/reference/dags/CotyData_IPN.py:99)
    "x1_split" -> withOracle(
      (s, d) =>
        Cleaning.splitInto("o_orderpriority", "-", Seq("prio_code", "prio_label"))(
            Tables.orders(s, d))
          .groupBy("prio_code", "prio_label").agg(count(lit(1)).as("cnt"))
          .orderBy("prio_code", "prio_label"),
      """SELECT string_split(o_orderpriority, '-')[1] AS prio_code,
        |       string_split(o_orderpriority, '-')[2] AS prio_label,
        |       count(*) AS cnt
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ---- X3: value recode with keep-on-miss
    //      (/root/reference/dags/CotyData_IPN.py:1160)
    "x3_recode" -> withOracle(
      (s, d) =>
        Tables.orders(s, d)
          .withColumn("status_name",
            Cleaning.recode(col("o_orderstatus"),
              Seq("O" -> "OPEN", "F" -> "FILLED", "P" -> "PENDING")))
          .groupBy("status_name").agg(count(lit(1)).as("cnt"))
          .orderBy("status_name"),
      """SELECT CASE o_orderstatus WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FILLED'
        |            WHEN 'P' THEN 'PENDING' ELSE o_orderstatus END AS status_name,
        |       count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- X2/X4: substring + separator concat
    //      (/root/reference/dags/Funciones_CotyData.py:210,277)
    "x4_concat" -> withOracle(
      (s, d) =>
        Tables.customer(s, d)
          .select(col("c_custkey"),
            concat_ws("-", col("c_mktsegment"), substring(col("c_name"), 1, 8)).as("seg_key"))
          .orderBy("c_custkey"),
      """SELECT c_custkey, c_mktsegment || '-' || substr(c_name, 1, 8) AS seg_key
        |FROM customer ORDER BY 1""".stripMargin),

    // ---- X6: timestamp -> date truncation (/root/reference/dags/CotyData_IPN.py:1117)
    "x6_date_count" -> withOracle(
      (s, d) =>
        Tables.lineitem(s, d)
          .withColumn("ship_date", to_date(col("l_shipdate")))
          .groupBy("ship_date").agg(count(lit(1)).as("cnt"))
          .orderBy("ship_date"),
      """SELECT CAST(l_shipdate AS DATE) AS ship_date, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- U1: union of conformed branches (pd.concat,
    //      /root/reference/dags/CotyData_IPN.py:1775-1782)
    "u1_union" -> withOracle(
      (s, d) => {
        val o = Tables.orders(s, d)
        val a = o.filter(col("o_orderpriority").contains("URGENT"))
          .select(col("o_orderkey"), lit("urgent").as("src"))
        val b = o.filter(!col("o_orderpriority").contains("URGENT"))
          .select(col("o_orderkey"), lit("other").as("src"))
        a.unionByName(b).groupBy("src").agg(count(lit(1)).as("cnt")).orderBy("src")
      },
      """SELECT src, count(*) AS cnt FROM (
        |  SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority LIKE '%URGENT%'
        |  UNION ALL
        |  SELECT o_orderkey, 'other' AS src FROM orders WHERE o_orderpriority NOT LIKE '%URGENT%'
        |) GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- U2: except (complement of the J6 anti-join)
    "u2_except" -> withOracle(
      (s, d) =>
        Tables.customer(s, d).select("c_nationkey").distinct()
          .except(Tables.nation(s, d).filter(col("n_regionkey") === 2)
            .select(col("n_nationkey").as("c_nationkey")))
          .orderBy("c_nationkey"),
      """SELECT DISTINCT c_nationkey FROM customer
        |EXCEPT
        |SELECT n_nationkey FROM nation WHERE n_regionkey = 2
        |ORDER BY c_nationkey""".stripMargin),

    // ---- S8: store-list driven fan-out — collect a small dim to the
    //      driver, run one parameterized pass per key, union the results
    //      (/root/reference/dags/utils.py:162-164; CotyData_IPN.py:2282-2291)
    "s8_fanout_union" -> withOracle(
      (s, d) => {
        val n = Tables.nation(s, d)
        val c = Tables.customer(s, d)
        val regions = Tables.region(s, d).select("r_regionkey", "r_name")
          .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
        regions.map { case (rk, rname) =>
          c.join(broadcast(n.filter(col("n_regionkey") === rk)),
                 c("c_nationkey") === n("n_nationkey"))
            .agg(count(lit(1)).as("n_cust"))
            .select(lit(rname).as("r_name"), col("n_cust"))
        }.reduce(_ unionByName _).orderBy("r_name")
      },
      """SELECT r_name, count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
