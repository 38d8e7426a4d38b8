package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Cleaning, Dates, Normalize}
import Registry._

/** Window functions, explode/normalize generators (SURVEY.md §2.7, §2.10),
  * multi-format timestamp handling (§2.9), and JSON extraction (X16).
  */
object Analytics {

  val defs: Seq[(String, Entry)] = Seq(

    // ---- §2.7: row_number top-k per group (makes A4-style keep-first
    //      deterministic; no reference-local window exists, SURVEY §2.7)
    "w1_topk_orders" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rk")
      },
      """SELECT o_custkey, CAST(rk AS INTEGER) AS rk, o_orderkey, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin),

    // ---- running aggregate over an explicit frame
    "w2_running_sum" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("event_id"), round(sum(col("value")).over(w), 2).as("running_value"))
          .orderBy("event_id")
      },
      """SELECT event_id,
        |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events ORDER BY event_id""".stripMargin),

    // ---- lag: inter-event gap per user (millisecond-exact, no
    //      second-boundary ambiguity)
    "w3_lag_gap" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("event_id"),
            (unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))).as("gap_ms"))
          .orderBy("event_id")
      },
      """SELECT event_id,
        |       epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
        |                      ORDER BY ts, event_id)) AS gap_ms
        |FROM events ORDER BY event_id""".stripMargin),

    // ---- §2.11: tumbling-window aggregation (batch form of the streaming
    //      windowed agg; Streams.windowedCounts is the readStream twin)
    "w4_window_hourly" -> withOracle(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("value_sum"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour"),
                  col("event_type"), col("cnt"), col("value_sum"))
          .orderBy("hour", "event_type"),
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |       event_type, count(*) AS cnt, round(sum(value), 2) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ---- X7: multi-format ('mixed') timestamp parsing
    //      (/root/reference/dags/CotyData_IPN.py:103-104,1748)
    "x7_ts_multiformat" -> withOracle(
      (s, d) =>
        Tables.events(s, d)
          .withColumn("raw",
            when(col("event_id") % 2 === 0, date_format(col("ts"), Dates.IsoT))
              .otherwise(date_format(col("ts"), Dates.DmyHms)))
          .select(col("event_id"),
            date_format(Dates.parseTimestampMulti(col("raw"), Seq(Dates.IsoT, Dates.DmyHms)),
              "yyyy-MM-dd HH:mm:ss").as("parsed"))
          .orderBy("event_id"),
      """SELECT event_id,
        |       strftime(COALESCE(try_strptime(raw, '%Y-%m-%dT%H:%M:%S'),
        |                         try_strptime(raw, '%d/%m/%Y %H:%M:%S')),
        |                '%Y-%m-%d %H:%M:%S') AS parsed
        |FROM (SELECT event_id,
        |             CASE WHEN event_id % 2 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
        |                  ELSE strftime(ts, '%d/%m/%Y %H:%M:%S') END AS raw
        |      FROM events) ORDER BY event_id""".stripMargin),

    // ---- X8: 23-char millisecond-truncated format
    //      (/root/reference/dags/CotyData_IPN.py:1749)
    "x8_format_ms" -> withOracle(
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_id"), Dates.formatMs23(col("ts")).as("ts23"))
          .orderBy("event_id"),
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS ts23
        |FROM events ORDER BY event_id""".stripMargin),

    // ---- X11/X12/X13: array-of-structs first-match extraction
    //      (fiscal-address pattern, /root/reference/dags/CotyData_IPN.py:343,2215-2217)
    "x11_first_match" -> withOracle(
      (s, d) => {
        val nested = Normalize.nest(Tables.lineitem(s, d), Seq("l_orderkey"),
          Seq("l_linenumber", "l_partkey", "l_quantity"), "items")
        nested.select(col("l_orderkey"),
            element_at(filter(col("items"), x => x.getField("l_quantity") > 30), 1)
              .getField("l_partkey").as("first_heavy_part"))
          .orderBy("l_orderkey")
      },
      """SELECT l_orderkey,
        |       min_by(l_partkey, l_linenumber * 100000000 + l_partkey)
        |         FILTER (WHERE l_quantity > 30) AS first_heavy_part
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- X14: null-safe "State; City" conditional concat
    //      (/root/reference/dags/CotyData_IPN.py:354-359)
    "x14_nullsafe_concat" -> withOracle(
      (s, d) =>
        Tables.events(s, d)
          .withColumn("a", when(col("event_type") === "view", lit(null))
                             .otherwise(col("event_type")))
          .withColumn("b", when(col("event_type") === "error", lit(null))
                             .otherwise(upper(col("event_type"))))
          .withColumn("label", Cleaning.nullSafeJoin(col("a"), col("b"), "; "))
          .groupBy("label").agg(count(lit(1)).as("cnt"))
          .orderBy(col("label").asc_nulls_first),
      """SELECT CASE WHEN a IS NOT NULL AND b IS NOT NULL THEN a || '; ' || b
        |            WHEN a IS NOT NULL THEN a END AS label,
        |       count(*) AS cnt
        |FROM (SELECT nullif(event_type, 'view') AS a,
        |             CASE WHEN event_type = 'error' THEN NULL
        |                  ELSE upper(event_type) END AS b
        |      FROM events)
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin),

    // ---- X16: JSON field extraction (/root/reference/dags/API_IPN.py:451)
    "x16_json_extract" -> withOracle(
      (s, d) =>
        Tables.events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(sum("k").as("k_sum"), count(lit(1)).as("cnt"))
          .orderBy("event_type"),
      """SELECT event_type, CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
        |       count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- semi-structured VARIANT column (Spark 4's columnar JSON twin
    //      of x16): parse once into the binary variant encoding, extract
    //      typed fields with variant_get — at scale this beats re-parsing
    //      the JSON string per predicate (parse cost paid once per row,
    //      extraction reads the encoded offsets). Oracle restates the
    //      same arithmetic over DuckDB's JSON operators. Type check +
    //      per-type percent via schema_of_variant, value math identical
    //      to x16 so the two surfaces cross-check each other.
    //      n_objects is a STRUCTURAL check on BOTH sides: Spark matches
    //      schema_of_variant == OBJECT<k: BIGINT>; DuckDB matches the
    //      same shape via json_type(props)='OBJECT', json_keys=['k'],
    //      json_type($.k) an int64 (UBIGINT for >=0, BIGINT for <0 — both
    //      render as Spark BIGINT). A variant-typing regression (extra
    //      field, null/double k) now fails on the Spark side ONLY, which
    //      is exactly what a typing oracle should do — unlike the old
    //      json_valid(props) predicate, which coincided with the typed
    //      check only because every generated row is exactly {"k": int}.
    "x28_variant_extract" -> withOracle(
      (s, d) =>
        Tables.events(s, d)
          .withColumn("v", parse_json(col("props")))
          .withColumn("k", variant_get(col("v"), "$.k", "long"))
          .withColumn("vt", schema_of_variant(col("v")))
          .groupBy("event_type")
          .agg(sum("k").as("k_sum"),
            min("k").as("k_min"), max("k").as("k_max"),
            count(when(col("vt") === "OBJECT<k: BIGINT>", 1)).as("n_objects"),
            count(lit(1)).as("cnt"))
          .orderBy("event_type"),
      """SELECT event_type,
        |       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
        |       CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_min,
        |       CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_max,
        |       CAST(count(CASE WHEN json_type(props::JSON) = 'OBJECT'
        |                        AND json_keys(props::JSON) = ['k']
        |                        AND json_type(props::JSON, '$.k') IN ('BIGINT', 'UBIGINT')
        |                       THEN 1 END) AS BIGINT) AS n_objects,
        |       count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- G1: nest -> explode round-trip (sales doc split,
    //      /root/reference/dags/CotyData_IPN.py:251-275). Quantity totals
    //      must survive the round-trip exactly.
    "g1_nest_explode_roundtrip" -> withOracle(
      (s, d) => {
        val nested = Normalize.nest(Tables.lineitem(s, d), Seq("l_orderkey"),
          Seq("l_linenumber", "l_partkey", "l_quantity"), "items")
        val back = Normalize.explodeChild(nested, "items", Seq("l_orderkey"))
        val o = Tables.orders(s, d)
        back.join(o, back("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty_sum"))
          .orderBy("o_orderstatus")
      },
      """SELECT o_orderstatus, count(*) AS cnt, round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- G2: child flatten with parent keys injected
    //      (/root/reference/dags/CotyData_IPN.py:1252-1275)
    "g2_explode_parent" -> withOracle(
      (s, d) => {
        val nested = Normalize.nest(Tables.lineitem(s, d), Seq("l_orderkey"),
          Seq("l_linenumber", "l_partkey", "l_suppkey", "l_quantity"), "items")
        Normalize.explodeChild(nested, "items", Seq("l_orderkey"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
      },
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem ORDER BY 1, 2, 3, 4, 5""".stripMargin),

    // ---- G8: two-level nesting flattened by chained explode
    //      (3-level attribute nest, /root/reference/dags/CotyData_IPN.py:528-536)
    "g8_two_level" -> withOracle(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d)
        val lvl1 = Normalize.nest(li, Seq("l_orderkey"),
          Seq("l_linenumber", "l_partkey", "l_quantity"), "items")
        val withCust = lvl1.join(o, lvl1("l_orderkey") === o("o_orderkey"))
          .select(col("o_custkey"), col("l_orderkey"), col("items"))
        val lvl2 = withCust.groupBy("o_custkey")
          .agg(sort_array(collect_list(struct(col("l_orderkey"), col("items")))).as("orders"))
        val flatOrders = lvl2.select(col("o_custkey"), explode(col("orders")).as("o"))
          .select(col("o_custkey"), col("o.l_orderkey"), col("o.items"))
        Normalize.explodeChild(flatOrders, "items", Seq("o_custkey", "l_orderkey"))
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty_sum"))
      },
      """SELECT count(*) AS cnt, round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin),

    // ---- G10: token explode (barcode-list flatten,
    //      /root/reference/dags/CotyData_IPN.py:509-520)
    "g10_explode_tokens" -> withOracle(
      (s, d) =>
        Tables.orders(s, d)
          .select(explode(split(col("o_orderpriority"), "-")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy("tok"),
      """SELECT tok, count(*) AS cnt
        |FROM (SELECT unnest(string_split(o_orderpriority, '-')) AS tok FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- time-series resample + LOCF gap fill: put every user on a dense
    //      hourly grid over their own span (sequence-explode — no global
    //      calendar table, no cross join) and carry the last observation
    //      forward with an ignore-nulls running window partitioned by
    //      user. The hourly sums round on the value grid (st1's blessed
    //      pattern: .01-grid inputs keep double error ~1e-13, five orders
    //      inside the .005 rounding boundary). Scale: grid size is
    //      span-bounded per user, the LOCF window shuffles once on
    //      user_id, and no stage is single-partition.
    "ts1_gapfill_locf" -> withOracle(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
          .groupBy("user_id", "h")
          .agg(round(sum("value"), 2).as("obs"), count(lit(1)).as("n_events"))
        val grid = hourly.groupBy("user_id")
          .agg(min("h").as("h0"), max("h").as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
        val w = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "h"), "left")
          .select(col("user_id"),
            date_format(col("h"), "yyyy-MM-dd HH:mm").as("hour"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            when(col("obs").isNull, 1L).otherwise(0L).as("is_gap"),
            last(col("obs"), ignoreNulls = true).over(w).as("filled"))
          .orderBy("user_id", "hour")
      },
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |         round(sum(value), 2) AS obs, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(min(h), max(h), INTERVAL '1 hour')) AS h
        |  FROM hourly GROUP BY user_id)
        |SELECT g.user_id,
        |       strftime(g.h, '%Y-%m-%d %H:%M') AS hour,
        |       CAST(COALESCE(hr.n_events, 0) AS BIGINT) AS n_events,
        |       CAST(CASE WHEN hr.obs IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
        |       last_value(hr.obs IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.h
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
        |ORDER BY g.user_id, hour""".stripMargin)
  )
}
