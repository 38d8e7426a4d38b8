package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import Registry._

/** Event-behavior analytics: ordered funnels, next-event transition
  * matrices, and cohort retention over the events table. These are the
  * product-analytics shapes (Amplitude/Mixpanel-style) a warehouse team
  * runs daily; the reference has no event surface at all (its DAGs are
  * batch master-data pulls), so this is engine-extension territory like
  * the sketch/ANN families.
  *
  * All ratios are integer parts-per-million via integer division — no
  * float ever reaches the output, so every query is hash-exact against
  * its oracle.
  */
object Behavior {

  val defs: Seq[(String, Entry)] = Seq(

    // ---- strict ordered funnel signup -> view -> click -> purchase:
    //      each stage's timestamp must strictly follow the user's
    //      previous-stage FIRST timestamp. Four stage aggregates, each a
    //      groupBy(user) + key join — state per user is one timestamp per
    //      stage, so the shape is shuffle-bounded and skew-free at any
    //      scale (no per-user event array is ever materialized, unlike
    //      the collect_list funnel idiom that dies on a bot user with
    //      10M events).
    "fn1_funnel" -> withOracle(
      (s, d) => {
        val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
        def stage(typ: String, prev: org.apache.spark.sql.DataFrame, prevT: String, t: String) =
          ev.filter(col("event_type") === typ)
            .join(prev, "user_id")
            .filter(col("ts") > col(prevT))
            .groupBy("user_id").agg(min("ts").as(t))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val s2 = stage("view", s1, "t1", "t2")
        val s3 = stage("click", s2, "t2", "t3")
        val s4 = stage("purchase", s3, "t3", "t4")
        val one = s1.agg(count(lit(1)).as("u1"))
          .crossJoin(s2.agg(count(lit(1)).as("u2")))
          .crossJoin(s3.agg(count(lit(1)).as("u3")))
          .crossJoin(s4.agg(count(lit(1)).as("u4")))
        one.select(explode(array(
            struct(lit(1).as("step"), lit("signup").as("stage"), col("u1").as("users"),
              lit(1000000L).as("conv_ppm")),
            struct(lit(2).as("step"), lit("view").as("stage"), col("u2").as("users"),
              expr("CASE WHEN u1 > 0 THEN u2 * 1000000L div u1 ELSE 0L END").as("conv_ppm")),
            struct(lit(3).as("step"), lit("click").as("stage"), col("u3").as("users"),
              expr("CASE WHEN u2 > 0 THEN u3 * 1000000L div u2 ELSE 0L END").as("conv_ppm")),
            struct(lit(4).as("step"), lit("purchase").as("stage"), col("u4").as("users"),
              expr("CASE WHEN u3 > 0 THEN u4 * 1000000L div u3 ELSE 0L END").as("conv_ppm"))))
            .as("r"))
          .select(col("r.step"), col("r.stage"), col("r.users"), col("r.conv_ppm"))
          .orderBy("step")
      },
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t2 GROUP BY 1),
        |s4 AS (SELECT e.user_id, min(ts) AS t4 FROM events e JOIN s3 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t3 GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s1) AS u1, (SELECT count(*) FROM s2) AS u2,
        |             (SELECT count(*) FROM s3) AS u3, (SELECT count(*) FROM s4) AS u4)
        |SELECT * FROM (
        |  SELECT CAST(1 AS INTEGER) AS step, 'signup' AS stage, u1 AS users,
        |         CAST(1000000 AS BIGINT) AS conv_ppm FROM c
        |  UNION ALL SELECT 2, 'view', u2,
        |         CASE WHEN u1 > 0 THEN u2 * 1000000 // u1 ELSE 0 END FROM c
        |  UNION ALL SELECT 3, 'click', u3,
        |         CASE WHEN u2 > 0 THEN u3 * 1000000 // u2 ELSE 0 END FROM c
        |  UNION ALL SELECT 4, 'purchase', u4,
        |         CASE WHEN u3 > 0 THEN u4 * 1000000 // u3 ELSE 0 END FROM c)
        |ORDER BY step""".stripMargin),

    // ---- first-order Markov transition matrix over per-user event
    //      sequences: one lead() pass (shuffle on user_id), then a
    //      25-cell aggregate; row-normalized probabilities in integer ppm
    //      (window sum over the AGGREGATED 25-row frame, never the data).
    "mk1_transitions" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wf = Window.partitionBy("from_type")
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"),
            lead(col("event_type"), 1).over(w).as("to_type"))
          .filter(col("to_type").isNotNull)
          .groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
          .withColumn("total", sum("cnt").over(wf))
          .withColumn("p_ppm", expr("(cnt * 1000000L) div total"))
          .drop("total")
          .orderBy("from_type", "to_type")
      },
      """SELECT from_type, to_type, cnt,
        |       (cnt * 1000000) // CAST(sum(cnt) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
        |FROM (SELECT from_type, to_type, count(*) AS cnt
        |      FROM (SELECT event_type AS from_type,
        |                   lead(event_type) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS to_type
        |            FROM events)
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |ORDER BY from_type, to_type""".stripMargin),

    // ---- weekly retention cohorts: users grouped by the ISO week of
    //      their first event; distinct actives per (cohort, weeks-since).
    //      Two shuffles (first-event groupBy, cohort-cell distinct-count)
    //      — both keyed, both skew-free; nothing is per-user state beyond
    //      one timestamp.
    "coh1_retention" -> withOracle(
      (s, d) => {
        val ev = Tables.events(s, d).select("user_id", "ts")
        val first = ev.groupBy("user_id")
          .agg(date_trunc("week", min("ts")).as("cohort"))
        ev.join(first, "user_id")
          .select(col("user_id"), col("cohort"),
            ((unix_timestamp(date_trunc("week", col("ts"))) - unix_timestamp(col("cohort")))
              / lit(604800L)).cast("long").as("weeks_since"))
          .groupBy("cohort", "weeks_since")
          .agg(countDistinct("user_id").as("users"))
          .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
            col("weeks_since"), col("users"))
          .orderBy("cohort_week", "weeks_since")
      },
      """WITH first AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |               FROM events GROUP BY 1)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |       (CAST(floor(epoch(date_trunc('week', e.ts))) AS BIGINT)
        |        - CAST(floor(epoch(cohort)) AS BIGINT)) // 604800 AS weeks_since,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS users
        |FROM events e JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ---- two-proportion A/B test: variant = user_id parity, metric =
    //      purchase conversion; pooled z-score emitted as the RAW double
    //      (never rounded — IEEE ops are exactly rounded, so identical
    //      integer inputs through the identical expression tree give the
    //      bit-identical double in both engines; rounding it would
    //      re-introduce the boundary problem — the oracle-writing rule
    //      in .claude/skills/verify/SKILL.md).
    //      Two distinct-count aggregates over users — no per-event state.
    "ab1_ab_test" -> withOracle(
      (s, d) => {
        val ev = Tables.events(s, d)
        val agg = ev.select(col("user_id"), (col("user_id") % 2).as("variant"),
            col("event_type"))
          .groupBy("variant")
          .agg(countDistinct("user_id").as("n"),
            countDistinct(when(col("event_type") === "purchase", col("user_id")))
              .as("conv"))
        val a = agg.filter(col("variant") === 0)
          .select(col("n").as("n_a"), col("conv").as("c_a"))
        val b = agg.filter(col("variant") === 1)
          .select(col("n").as("n_b"), col("conv").as("c_b"))
        a.crossJoin(b)
          .withColumn("p_a", col("c_a").cast("double") / col("n_a"))
          .withColumn("p_b", col("c_b").cast("double") / col("n_b"))
          .withColumn("p_pool",
            (col("c_a") + col("c_b")).cast("double") / (col("n_a") + col("n_b")))
          .withColumn("z",
            (col("p_a") - col("p_b")) /
              sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
                   (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
          .select("n_a", "c_a", "n_b", "c_b", "p_a", "p_b", "z")
      },
      """WITH agg AS (
        |  SELECT user_id % 2 AS variant,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n,
        |         CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
        |                                  THEN user_id END) AS BIGINT) AS conv
        |  FROM events GROUP BY 1),
        |ab AS (SELECT a.n AS n_a, a.conv AS c_a, b.n AS n_b, b.conv AS c_b
        |       FROM (SELECT * FROM agg WHERE variant = 0) a,
        |            (SELECT * FROM agg WHERE variant = 1) b),
        |p AS (SELECT *, CAST(c_a AS DOUBLE) / n_a AS p_a,
        |             CAST(c_b AS DOUBLE) / n_b AS p_b,
        |             CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) AS p_pool
        |      FROM ab)
        |SELECT n_a, c_a, n_b, c_b, p_a, p_b,
        |       (p_a - p_b) / sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_a + 1.0 / n_b)) AS z
        |FROM p""".stripMargin),

    // ---- top event-type trigram paths: two lead() passes in ONE window
    //      shuffle (same user_id/ts order), then a bounded (<= |types|^3)
    //      aggregate; top-15 with a total tie order.
    "path1_top_paths" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("e1"),
            lead(col("event_type"), 1).over(w).as("e2"),
            lead(col("event_type"), 2).over(w).as("e3"))
          .filter(col("e2").isNotNull && col("e3").isNotNull)
          .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3"))
          .limit(15)
      },
      """SELECT e1, e2, e3, count(*) AS cnt
        |FROM (SELECT event_type AS e1,
        |             lead(event_type, 1) OVER w AS e2,
        |             lead(event_type, 2) OVER w AS e3
        |      FROM events
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY cnt DESC, e1, e2, e3 LIMIT 15""".stripMargin),

    // ---- last-touch attribution: each purchase credited to the user's
    //      most recent preceding (inclusive-tie) non-purchase event —
    //      ops.AsOf's carry-forward composition, so the cost is ONE
    //      user-keyed shuffle instead of the naive join-then-max that
    //      materializes every (purchase, earlier touch) pair.
    //      Deterministic because (user_id, ts) is unique in the data
    //      (scd1's pinned premise). The oracle IS the naive formulation —
    //      a different algorithm computing the same answer.
    "att1_last_touch" -> withOracle(
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id")
        val touches = ev.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"),
            struct(col("event_id").as("eid"), col("event_type").as("etype"))
              .as("touch"))
        graft.ops.AsOf.joinAsOf(purchases, touches, Seq("user_id"),
            "ts", "ts", "touch", "t")
          .select(col("event_id"), col("t.eid").as("touch_event_id"),
            col("t.etype").as("touch_type"))
          .orderBy("event_id")
      },
      """WITH p AS (SELECT user_id, ts, event_id FROM events
        |           WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts, event_id, event_type FROM events
        |      WHERE event_type <> 'purchase'),
        |j AS (SELECT p.event_id, t.event_id AS touch_event_id,
        |             t.event_type AS touch_type,
        |             row_number() OVER (PARTITION BY p.event_id
        |                 ORDER BY t.ts DESC) AS rk
        |      FROM p JOIN t ON t.user_id = p.user_id AND t.ts <= p.ts)
        |SELECT p.event_id, j.touch_event_id, j.touch_type
        |FROM p LEFT JOIN (SELECT * FROM j WHERE rk = 1) j USING (event_id)
        |ORDER BY event_id""".stripMargin),

    // ---- seasonal-naive forecast backtest: predict each hour's event
    //      count by the SAME hour one day earlier (the standard baseline
    //      any real forecaster must beat), score by MAE per event type.
    //      Joined on (type, hour - 24h) — NOT lag(24 rows), which silently
    //      misaligns across gap hours. Counts are integers, so the MAE
    //      numerator is exact and the final mean is one exact division.
    "fc1_seasonal_naive" -> withOracle(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val prev = hourly.select(col("event_type"),
          (col("h") + expr("interval 24 hours")).as("h"), col("cnt").as("pred"))
        hourly.join(prev, Seq("event_type", "h"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_hours"),
            sum(abs(col("cnt") - col("pred"))).as("mae_num"))
          .withColumn("mae", col("mae_num").cast("double") / col("n_hours"))
          .orderBy("event_type")
      },
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_hours,
        |       CAST(sum(abs(a.cnt - p.cnt)) AS BIGINT) AS mae_num,
        |       CAST(sum(abs(a.cnt - p.cnt)) AS DOUBLE) / count(*) AS mae
        |FROM hourly a JOIN hourly p
        |  ON a.event_type = p.event_type AND p.h = a.h - INTERVAL 24 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- CUSUM changepoint detection, integer-exact: for each type's
    //      hourly series, S_k = n*prefix_k - k*total (the mean-centered
    //      cumulative sum scaled by n to stay in integers — no rational
    //      mean is ever materialized); the changepoint is the hour
    //      maximizing |S_k| (tie -> earliest). One group window pass.
    "cp1_cusum" -> withOracle(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("cnt"))
        val wcum = Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wall = Window.partitionBy("event_type")
        val scored = hourly
          .withColumn("cum", sum("cnt").over(wcum))
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type").orderBy("h")))
          .withColumn("n", count(lit(1)).over(wall))
          .withColumn("total", sum("cnt").over(wall))
          .withColumn("s_abs", abs(col("n") * col("cum") - col("rk") * col("total")))
        scored.withColumn("pick", row_number().over(
            Window.partitionBy("event_type").orderBy(col("s_abs").desc, col("h"))))
          .filter(col("pick") === 1)
          .select(col("event_type"),
            date_format(col("h"), "yyyy-MM-dd HH:mm").as("cp_hour"),
            col("s_abs"))
          .orderBy("event_type")
      },
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |scored AS (
        |  SELECT event_type, h,
        |         abs(CAST(count(*) OVER w2 AS BIGINT)
        |               * CAST(sum(cnt) OVER w1 AS BIGINT)
        |             - CAST(row_number() OVER w0 AS BIGINT)
        |               * CAST(sum(cnt) OVER w2 AS BIGINT)) AS s_abs
        |  FROM hourly
        |  WINDOW w0 AS (PARTITION BY event_type ORDER BY h),
        |         w1 AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         w2 AS (PARTITION BY event_type))
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M') AS cp_hour,
        |       CAST(s_abs AS BIGINT) AS s_abs
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |          ORDER BY s_abs DESC, h) AS pick FROM scored)
        |WHERE pick = 1 ORDER BY event_type""".stripMargin)
  )
}
