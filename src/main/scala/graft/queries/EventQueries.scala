package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOf, Dedup}

/** Event-stream operators (keep-first dedup A1, as-of join J9, lag/session
  * windows W1, regex F1/F2, JSON F17/F18) over the `events` table.
  * Timestamps never appear raw in outputs (parquet ns vs us precision);
  * epoch integers are used instead.
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // A1: deterministic keep-first dedup — earliest event per (user, type).
    "q10_dedup_keepfirst" -> ((s, dir) => {
      Dedup.keepFirst(Tables(s, dir, "events"),
          Seq("user_id", "event_type"), Seq(col("ts").asc, col("event_id").asc))
        .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
        .orderBy("user_id", "event_type")
    }),

    // F2: regex capture-group extraction.
    "q13_regex_extract" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k_bucket")
    }),

    // F17/F18: JSON field extraction + conditional aggregation.
    "q14_json_extract" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .where(col("k") > 50)
        .groupBy("event_type")
        .agg(round(sum("value"), 2).as("sum_value"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // J9: backward as-of join — each click matched to the user's latest
    // purchase at-or-before the click, via the NATIVE sort-merge as-of
    // operator (graft.plans.AsOfJoinPlan/Exec): one shuffle per side +
    // streaming merge. The union-and-fill composition (AsOf.joinBackward)
    // is the built-ins-only fallback with identical semantics.
    "q26_asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_event_id"))
      AsOf.joinBackwardSortMerge(clicks, purchases,
          byKeys = Seq("user_id"), leftTs = "ts", rightTs = "p_ts",
          rightCols = Seq("p_event_id"))
        .select(col("event_id"), col("user_id"), col("p_event_id").as("matched_purchase_id"))
        .orderBy("event_id")
    }),

    // W1 (lag form): session counts from >30-minute gaps; exact integers.
    "q27_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // HLL sketch distinct counts — the constant-memory path for distinct
    // users at 100 TB. Oracle-checked: the sketch internals differ from
    // DuckDB's, so the query emits the EXACT distinct count (DuckDB
    // mirrors it) plus a within-tolerance flag on the HLL estimate (rsd
    // 0.01 -> 5% is a wide deterministic bound); a drifting sketch flips
    // the flag and fails the hash compare.
    "q49_approx_distinct" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), 0.01).as("__approx"),
          count_distinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_events"))
        .withColumn("hll_within_5pct",
          abs(col("__approx") - col("exact_users")).cast("double") <=
            col("exact_users").cast("double") * 0.05)
        .select("event_type", "exact_users", "n_events", "hll_within_5pct")
        .orderBy("event_type")
    }),

    // Funnel analysis: users progressing view -> click -> purchase in
    // order (subsequence). One shuffle regardless of funnel depth (the
    // naive k-step funnel is k-1 self-joins); ordered-letter aggregation
    // + per-prefix regex, mirrored verbatim by the oracle.
    "q66_funnel" -> ((s, dir) => {
      graft.operators.Funnel.funnelCounts(
          Tables(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("stage_k")
    }),

    // Conditional aggregation (pivot shape, deterministic column set).
    "q28_pivot_counts" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      ev.groupBy("user_id")
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "signup", 1)).as("n_signup"),
          count(when(col("event_type") === "error", 1)).as("n_error"))
        .orderBy("user_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q66_funnel" ->
      """WITH seqs AS (
        |  SELECT user_id, string_agg(CASE event_type WHEN 'view' THEN 'a'
        |    WHEN 'click' THEN 'b' WHEN 'purchase' THEN 'c' END, ''
        |    ORDER BY ts, event_id) AS s
        |  FROM events WHERE event_type IN ('view','click','purchase')
        |  GROUP BY user_id),
        | st AS (SELECT user_id, CASE
        |   WHEN regexp_matches(s, 'a.*b.*c') THEN 3
        |   WHEN regexp_matches(s, 'a.*b') THEN 2
        |   WHEN regexp_matches(s, 'a') THEN 1 ELSE 0 END AS stage FROM seqs)
        | SELECT stage_k, count(*) AS n_users
        | FROM st, unnest(generate_series(1, 3)) AS g(stage_k)
        | WHERE stage >= stage_k GROUP BY stage_k ORDER BY stage_k""".stripMargin.replaceAll("\n", " "),
    "q49_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | count(*) AS n_events, true AS hll_within_5pct
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    "q10_dedup_keepfirst" ->
      """SELECT user_id, event_type, event_id AS first_event_id FROM (
        | SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin.replaceAll("\n", " "),
    "q13_regex_extract" ->
      """SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 10 AS k_bucket,
        | count(*) AS n FROM events GROUP BY k_bucket ORDER BY k_bucket""".stripMargin.replaceAll("\n", " "),
    "q14_json_extract" ->
      """SELECT event_type, round(sum(value),2) AS sum_value, count(*) AS n
        | FROM (SELECT event_type, value, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        | WHERE k > 50 GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\n", " "),
    "q26_asof_join" ->
      """SELECT c.event_id, c.user_id, p.event_id AS matched_purchase_id
        | FROM (SELECT * FROM events WHERE event_type='click') c
        | ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        | ORDER BY c.event_id""".stripMargin.replaceAll("\n", " "),
    "q27_sessionize" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        | SELECT user_id, CASE WHEN prev_ts IS NULL
        |   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
        | FROM (SELECT user_id, ts, event_id,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events))
        | GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\n", " "),
    "q28_pivot_counts" ->
      """SELECT user_id,
        | count(*) FILTER (event_type='click') AS n_click,
        | count(*) FILTER (event_type='view') AS n_view,
        | count(*) FILTER (event_type='purchase') AS n_purchase,
        | count(*) FILTER (event_type='signup') AS n_signup,
        | count(*) FILTER (event_type='error') AS n_error
        | FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\n", " ")
  )
}
