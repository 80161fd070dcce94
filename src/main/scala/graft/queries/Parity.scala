package graft.queries

import graft.Engine
import graft.functions.ScalarOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The t2 parity query set (SURVEY.md §2.3 Q1–Q22): every reference operator
  * category re-expressed over the driver tables, each with a DuckDB oracle.
  *
  * Determinism contract (hash-match): total ORDER BY on every output, all
  * doubles ROUND(x,4), all timestamps rendered `yyyy-MM-dd HH:mm:ss` (UTC),
  * all epoch arithmetic in microseconds (test timestamps carry µs), counts
  * and ranks cast to long to match DuckDB's BIGINT.
  */
object Parity {

  type QueryFn = (SparkSession, String) => DataFrame

  /** The raw `events.ts` parquet column is TIMESTAMP(NANOS); the engine reads
    * it as µs (see Engine.Tables.events). Normalize the oracle identically:
    * every `FROM events` is rewritten to cast ts down to µs precision. */
  private val EvCast = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"
  private def oracle(sql: String): Option[String] =
    Some(sql.replace("FROM events", s"FROM $EvCast"))

  /** The q13/q18/q18b star-join input (orders→customer→nation→region
    * revenue rows): ONE definition so a join-condition fix cannot reach
    * rollup but miss cube (or the flagship q13). */
  private def revenueFlat(t: Engine.Tables): DataFrame =
    t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "o_totalprice")

  /** (name, spark builder, duckdb oracle) triples. */
  val all: Seq[(String, QueryFn, Option[String])] = Seq(

    // Q1 — scan + projection (T12)
    ("q01_project", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .select(col("event_id"), col("event_type"), r4(col("value")).as("v"))
        .orderBy("event_id")
    }, oracle("""SELECT event_id, event_type, ROUND(value,4) AS v FROM events ORDER BY event_id""")),

    // Q2 — filter / predicates (T10, T11)
    ("q02_filter", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .filter(col("event_type") === "click" && col("value").between(10, 100))
        .select(col("event_id"), r4(col("value")).as("v"))
        .orderBy("event_id")
    }, oracle("""SELECT event_id, ROUND(value,4) AS v FROM events WHERE event_type = 'click' AND value BETWEEN 10 AND 100 ORDER BY event_id""")),

    // Q3 — unit scale + battery model + clamp (T1–T4)
    ("q03_scale_clamp", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .select(col("event_id"),
          r4(unitScale(col("value"))).as("scaled"),
          r4(battPct(col("value"))).as("batt"))
        .orderBy("event_id")
    }, oracle("""SELECT event_id, ROUND(value/10.0,4) AS scaled, ROUND(LEAST(100.0, GREATEST(0.0, (value-6)/2.4*100)),4) AS batt FROM events ORDER BY event_id""")),

    // Q4 — timestamp format + extract (T5, T6)
    ("q04_time", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .select(col("event_id"), isoFormat(col("ts")).as("iso"),
          hour(col("ts")).cast("long").as("hr"))
        .orderBy("event_id")
    }, oracle("""SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso, CAST(hour(ts) AS BIGINT) AS hr FROM events ORDER BY event_id""")),

    // Q5 — JSON extract with sentinel default 888.8 (T8)
    ("q05_json_default", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .select(col("event_id"),
          r4(jsonDoubleOrDefault(col("props"), "$.k", 888.8)).as("k_val"))
        .orderBy("event_id")
    }, oracle("""SELECT event_id, ROUND(COALESCE(CAST(json_extract_string(props,'$.k') AS DOUBLE), 888.8),4) AS k_val FROM events ORDER BY event_id""")),

    // Q6 — sign-based status classify (T13)
    ("q06_classify", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .groupBy(chargeStatus(col("value")).as("status"))
        .agg(count("*").as("cnt"))
        .orderBy("status")
    }, oracle("""SELECT CASE WHEN value > 0 THEN 'Charging' ELSE 'Discharging' END AS status, COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY status""")),

    // Q7 — latest-value hold per key (T9)
    ("q07_latest", (s: SparkSession, d: String) => {
      // the operator itself (T9 batch form) — not a re-implementation, so
      // the streaming-equivalence tests and this oracle pin the SAME plan
      graft.streaming.StatefulOps.latestValueBatch(Engine.Tables(s, d).events)
        .select(col("user_id"), date_format(col("ts"), TsFmt).as("ts_s"),
          r4(col("value")).as("v"))
        .orderBy("user_id")
    }, oracle("""SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, ROUND(value,4) AS v FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1 ORDER BY user_id""")),

    // Q8 — lag-based change detection (X1): sign(value-100) flips per user
    ("q08_flip", (s: SparkSession, d: String) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Engine.Tables(s, d).events
        .withColumn("sg", signum(col("value") - 100))
        .withColumn("ps", lag(col("sg"), 1).over(w))
        .filter(col("ps").isNotNull && col("sg") =!= col("ps"))
        .groupBy("user_id").agg(count("*").as("flips"))
        .orderBy("user_id")
    }, oracle("""SELECT user_id, COUNT(*) AS flips FROM (SELECT user_id, SIGN(value-100) AS sg, LAG(SIGN(value-100)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ps FROM events) WHERE ps IS NOT NULL AND sg <> ps GROUP BY user_id ORDER BY user_id""")),

    // Q9 — rate of change per user (X2)
    ("q09_rate", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .groupBy("user_id")
        .agg(r4((max(col("value")) - min(col("value"))) /
          ((max(epochUs(col("ts"))) - min(epochUs(col("ts")))) / lit(1e6) + 1)).as("rate"))
        .orderBy("user_id")
    }, oracle("""SELECT user_id, ROUND((MAX(value)-MIN(value)) / ((MAX(epoch_us(ts))-MIN(epoch_us(ts)))/1e6 + 1),4) AS rate FROM events GROUP BY user_id ORDER BY user_id""")),

    // Q10 — staleness predicate (X3, X4): users > 3600 s behind global max ts
    ("q10_stale", (s: SparkSession, d: String) => {
      graft.streaming.StatefulOps.staleKeysBatch(Engine.Tables(s, d).events, 3600L)
        .orderBy("user_id")
    }, oracle("""SELECT user_id FROM (SELECT user_id, MAX(epoch_us(ts)) AS umax FROM events GROUP BY user_id), (SELECT MAX(epoch_us(ts)) AS gmax FROM events) WHERE gmax - umax > 3600000000 ORDER BY user_id""")),

    // Q11 — hash aggregation, multiple aggregates
    ("q11_agg", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .groupBy("event_type")
        .agg(count("*").as("cnt"), r4(avg(col("value"))).as("avg_v"),
          r4(sum(col("value"))).as("sum_v"),
          date_format(min(col("ts")), TsFmt).as("min_ts"),
          date_format(max(col("ts")), TsFmt).as("max_ts"))
        .orderBy("event_type")
    }, oracle("""SELECT event_type, COUNT(*) AS cnt, ROUND(AVG(value),4) AS avg_v, ROUND(SUM(value),4) AS sum_v, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS min_ts, strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts FROM events GROUP BY event_type ORDER BY event_type""")),

    // Q12 — exact distinct count (HLL variant tested in ScalaTest with tolerance)
    ("q12_distinct", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")
    }, oracle("""SELECT event_type, COUNT(DISTINCT user_id) AS users FROM events GROUP BY event_type ORDER BY event_type""")),

    // Q13 — multi-way equi-join + agg; dims broadcast
    ("q13_join_agg", (s: SparkSession, d: String) => {
      // the ONE star-join definition (revenueFlat) — q13/q18/q18b share
      // it so a join-condition fix cannot reach one and miss another
      revenueFlat(Engine.Tables(s, d))
        .groupBy("r_name")
        .agg(r4(sum(col("o_totalprice"))).as("revenue"))
        .orderBy("r_name")
    }, oracle("""SELECT r_name, ROUND(SUM(o_totalprice),4) AS revenue FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name""")),

    // Q14a — left semi join (EXISTS)
    ("q14a_semi", (s: SparkSession, d: String) => {
      val t = Engine.Tables(s, d)
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }, oracle("""SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""")),

    // Q14b — left anti join (NOT EXISTS)
    ("q14b_anti", (s: SparkSession, d: String) => {
      val t = Engine.Tables(s, d)
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }, oracle("""SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""")),

    // Q14c — equi + range theta-join: shipdate within 30 days of order date
    ("q14c_range", (s: SparkSession, d: String) => {
      val t = Engine.Tables(s, d)
      t.orders.join(t.lineitem,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"))
        .agg(count("*").as("cnt"))
        .orderBy("month")
    }, oracle("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month, COUNT(*) AS cnt FROM orders JOIN lineitem ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY GROUP BY 1 ORDER BY month""")),

    // Q15a — ranking window: top-3 orders per priority
    ("q15a_topk", (s: SparkSession, d: String) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Engine.Tables(s, d).orders
        .withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
          r4(col("o_totalprice")).as("price"))
        .orderBy("o_orderpriority", "rn")
    }, oracle("""SELECT o_orderpriority, rn, o_orderkey, ROUND(o_totalprice,4) AS price FROM (SELECT *, CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_orderpriority, rn""")),

    // Q15b — analytic windows: running sum + rank over per-type daily sums
    ("q15b_running", (s: SparkSession, d: String) => {
      val daily = Engine.Tables(s, d).events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value")).as("sv"))
      val wRun = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wRank = Window.partitionBy("event_type").orderBy(r4(col("sv")).desc, col("day"))
      daily
        .withColumn("running", r4(sum(col("sv")).over(wRun)))
        .withColumn("rnk", rank().over(wRank).cast("long"))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day_s"),
          col("running"), col("rnk"))
        .orderBy("event_type", "day_s")
    }, oracle("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(value) AS sv FROM events GROUP BY 1, 2) SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s, ROUND(SUM(sv) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS running, CAST(rank() OVER (PARTITION BY event_type ORDER BY ROUND(sv,4) DESC, day) AS BIGINT) AS rnk FROM daily ORDER BY event_type, day_s""")),

    // Q16 — tumbling 10-minute window aggregation (batch form of the
    // streaming query; same code path as streaming.WindowedAggs)
    ("q16_tumble", (s: SparkSession, d: String) => {
      graft.streaming.WindowedAggs.rendered(
        graft.streaming.WindowedAggs.tumbling(Engine.Tables(s, d).events), "event_type")
        .orderBy("wstart", "event_type")
    }, oracle("""SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS wstart, event_type, COUNT(*) AS cnt, ROUND(AVG(value),4) AS avg_v FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""")),

    // Q17a — sliding windows (10 min width, 5 min slide)
    ("q17a_slide", (s: SparkSession, d: String) => {
      graft.streaming.WindowedAggs.rendered(
        graft.streaming.WindowedAggs.sliding(Engine.Tables(s, d).events), "event_type")
        .orderBy("wstart", "event_type")
    }, oracle("""SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart, event_type, COUNT(*) AS cnt, ROUND(AVG(value),4) AS avg_v FROM (SELECT time_bucket(INTERVAL '10 minutes', ts) AS ws, event_type, value FROM events UNION ALL SELECT time_bucket(INTERVAL '10 minutes', ts, INTERVAL '5 minutes') AS ws, event_type, value FROM events) GROUP BY 1, 2 ORDER BY wstart, event_type""")),

    // Q17b — session windows, 30-minute gap, per user
    ("q17b_session", (s: SparkSession, d: String) => {
      graft.streaming.WindowedAggs.session(Engine.Tables(s, d).events)
        .select(col("user_id"), date_format(col("w.start"), TsFmt).as("session_start"),
          col("cnt"))
        .orderBy("user_id", "session_start")
    }, oracle("""WITH marked AS (SELECT user_id, ts, event_id, CASE WHEN LAG(ts) OVER w IS NULL OR ts - LAG(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), sess AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM marked) SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start, COUNT(*) AS cnt FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""")),

    // Q18 — rollup with grouping flags
    ("q18_rollup", (s: SparkSession, d: String) => {
      // via the engine's SQL surface: DataFrame-side grouping() currently
      // trips the analyzer's ambiguous-self-join check under rollup
      revenueFlat(Engine.Tables(s, d)).createOrReplaceTempView("q18_flat")
      s.sql("""SELECT r_name, n_name, FLOOR(SUM(o_totalprice) * 1e4 + 5e-1) / 1e4 AS revenue,
                      CAST(GROUPING(r_name) AS BIGINT) AS g_r,
                      CAST(GROUPING(n_name) AS BIGINT) AS g_n
               FROM q18_flat GROUP BY ROLLUP(r_name, n_name)
               ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
    }, oracle("""SELECT r_name, n_name, ROUND(SUM(o_totalprice),4) AS revenue, CAST(GROUPING(r_name) AS BIGINT) AS g_r, CAST(GROUPING(n_name) AS BIGINT) AS g_n FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP(r_name, n_name) ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""")),

    // Q18b — cube with grouping flags (same flat input as Q18)
    ("q18b_cube", (s: SparkSession, d: String) => {
      revenueFlat(Engine.Tables(s, d)).createOrReplaceTempView("q18b_flat")
      s.sql("""SELECT r_name, n_name, FLOOR(SUM(o_totalprice) * 1e4 + 5e-1) / 1e4 AS revenue,
                      CAST(GROUPING(r_name) AS BIGINT) AS g_r,
                      CAST(GROUPING(n_name) AS BIGINT) AS g_n
               FROM q18b_flat GROUP BY CUBE(r_name, n_name)
               ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
    }, oracle("""SELECT r_name, n_name, ROUND(SUM(o_totalprice),4) AS revenue, CAST(GROUPING(r_name) AS BIGINT) AS g_r, CAST(GROUPING(n_name) AS BIGINT) AS g_n FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY CUBE(r_name, n_name) ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""")),

    // Q19a — INTERSECT: users active in both halves of the time range
    ("q19a_intersect", (s: SparkSession, d: String) => {
      val ev = Engine.Tables(s, d).events
      val g = ev.agg((max(epochUs(col("ts"))) + min(epochUs(col("ts")))).as("gsum"))
      val tagged = ev.select(col("user_id"), (epochUs(col("ts")) * 2).as("e2"))
        .crossJoin(broadcast(g))
      tagged.filter(col("e2") < col("gsum")).select("user_id").distinct()
        .intersect(tagged.filter(col("e2") >= col("gsum")).select("user_id").distinct())
        .orderBy("user_id")
    }, oracle("""WITH g AS (SELECT MAX(epoch_us(ts)) + MIN(epoch_us(ts)) AS gsum FROM events) SELECT DISTINCT user_id FROM events, g WHERE 2*epoch_us(ts) < gsum INTERSECT SELECT DISTINCT user_id FROM events, g WHERE 2*epoch_us(ts) >= gsum ORDER BY user_id""")),

    // Q19b — EXCEPT: users active only in the first half
    ("q19b_except", (s: SparkSession, d: String) => {
      val ev = Engine.Tables(s, d).events
      val g = ev.agg((max(epochUs(col("ts"))) + min(epochUs(col("ts")))).as("gsum"))
      val tagged = ev.select(col("user_id"), (epochUs(col("ts")) * 2).as("e2"))
        .crossJoin(broadcast(g))
      tagged.filter(col("e2") < col("gsum")).select("user_id").distinct()
        .except(tagged.filter(col("e2") >= col("gsum")).select("user_id").distinct())
        .orderBy("user_id")
    }, oracle("""WITH g AS (SELECT MAX(epoch_us(ts)) + MIN(epoch_us(ts)) AS gsum FROM events) SELECT DISTINCT user_id FROM events, g WHERE 2*epoch_us(ts) < gsum EXCEPT SELECT DISTINCT user_id FROM events, g WHERE 2*epoch_us(ts) >= gsum ORDER BY user_id""")),

    // Q19c — INTERSECT ALL (multiset semantics) on per-half user multisets
    ("q19c_intersect_all", (s: SparkSession, d: String) => {
      val ev = Engine.Tables(s, d).events
      val g = ev.agg((max(epochUs(col("ts"))) + min(epochUs(col("ts")))).as("gsum"))
      val tagged = ev.select(col("user_id"), (epochUs(col("ts")) * 2).as("e2"))
        .crossJoin(broadcast(g))
      tagged.filter(col("e2") < col("gsum")).select("user_id")
        .intersectAll(tagged.filter(col("e2") >= col("gsum")).select("user_id"))
        .orderBy("user_id")
    }, oracle("""WITH g AS (SELECT MAX(epoch_us(ts)) + MIN(epoch_us(ts)) AS gsum FROM events) SELECT user_id FROM events, g WHERE 2*epoch_us(ts) < gsum INTERSECT ALL SELECT user_id FROM events, g WHERE 2*epoch_us(ts) >= gsum ORDER BY user_id""")),

    // Q23 — exact percentiles (linear interpolation, both engines)
    ("q23_percentile", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .groupBy("event_type")
        .agg(r4(expr("percentile(value, 0.5)")).as("p50"),
          r4(expr("percentile(value, 0.9)")).as("p90"))
        .orderBy("event_type")
    }, oracle("""SELECT event_type, ROUND(quantile_cont(value, 0.5),4) AS p50, ROUND(quantile_cont(value, 0.9),4) AS p90 FROM events GROUP BY event_type ORDER BY event_type""")),

    // Q24 — string-function batch (SQL surface)
    ("q24_stringfns", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).part.createOrReplaceTempView("q24_part")
      s.sql("""SELECT p_partkey, UPPER(p_name) AS up, LOWER(p_brand) AS lo,
                      regexp_extract(p_name, '([a-z]+)', 1) AS w1,
                      lpad(p_brand, 12, '*') AS pad,
                      replace(p_type, ' ', '_') AS rep,
                      CAST(length(p_name) AS BIGINT) AS len,
                      concat_ws('|', p_brand, p_type) AS cw
               FROM q24_part ORDER BY p_partkey""")
    }, Some("""SELECT p_partkey, UPPER(p_name) AS up, LOWER(p_brand) AS lo, regexp_extract(p_name, '([a-z]+)', 1) AS w1, lpad(p_brand, 12, '*') AS pad, replace(p_type, ' ', '_') AS rep, CAST(length(p_name) AS BIGINT) AS len, concat_ws('|', p_brand, p_type) AS cw FROM part ORDER BY p_partkey""")),

    // Q25 — date/time-function batch
    ("q25_datefns", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events.createOrReplaceTempView("q25_ev")
      s.sql("""SELECT event_id,
                      date_format(last_day(ts), 'yyyy-MM-dd') AS month_end,
                      date_format(date_trunc('week', ts), 'yyyy-MM-dd') AS week_start,
                      CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
                      CAST(day(ts) AS BIGINT) AS dm,
                      CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT) AS d_since
               FROM q25_ev ORDER BY event_id""")
    }, oracle("""SELECT event_id, strftime(last_day(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start, CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m, CAST(day(ts) AS BIGINT) AS dm, CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d_since FROM events ORDER BY event_id""")),

    // Q20 — sort/limit + string functions
    ("q20_topk_str", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).part
        .orderBy(col("p_retailprice").desc, col("p_partkey")).limit(20)
        .select(col("p_partkey"), upper(substring(col("p_name"), 1, 10)).as("uname"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("bt"),
          r4(col("p_retailprice")).as("price"))
    }, oracle("""SELECT p_partkey, UPPER(SUBSTRING(p_name, 1, 10)) AS uname, p_brand || '/' || p_type AS bt, ROUND(p_retailprice,4) AS price FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 20""")),

    // Q21 — array explode with position + filter (T10)
    ("q21_explode", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).embeddings
        .filter(col("label") === 1)
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
          r4(col("col").cast("double")).as("v"))
        .orderBy("vec_id", "pos")
    }, oracle("""SELECT vec_id, CAST(p.pos AS BIGINT) AS pos, ROUND(CAST(embedding[p.pos] AS DOUBLE),4) AS v FROM embeddings, (VALUES (1),(2),(3),(4)) AS p(pos) WHERE label = 1 ORDER BY vec_id, pos""")),

    // Q26 — map functions: props JSON → map, keys/values surfaced
    ("q26_mapfns", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))
        .select(col("event_id"),
          concat_ws(",", map_keys(col("m"))).as("ks"),
          // try_: under ANSI a missing key THROWS from element_at, while
          // the oracle's json_extract_string yields NULL for the same row
          try_element_at(col("m"), lit("k")).cast("long").as("k_val"),
          size(col("m")).cast("long").as("n_keys"))
        .orderBy("event_id")
    }, oracle("""SELECT event_id, list_aggregate(json_keys(props), 'string_agg', ',') AS ks, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val, CAST(len(json_keys(props)) AS BIGINT) AS n_keys FROM events ORDER BY event_id""")),

    // Q27 — array functions: size/min/max/contains over embeddings
    ("q27_arrayfns", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).embeddings
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          r4(array_min(col("embedding")).cast("double")).as("mn"),
          r4(array_max(col("embedding")).cast("double")).as("mx"),
          array_contains(col("embedding"), 0.0f).as("has_zero"))
        .orderBy("vec_id")
    }, Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, ROUND(CAST(list_min(embedding) AS DOUBLE),4) AS mn, ROUND(CAST(list_max(embedding) AS DOUBLE),4) AS mx, list_contains(embedding, 0.0) AS has_zero FROM embeddings ORDER BY vec_id""")),

    // Q28 — correlated scalar subquery (Catalyst decorrelation)
    ("q28_subquery", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).orders.createOrReplaceTempView("q28_orders")
      s.sql("""SELECT o_orderkey FROM q28_orders o
               WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM q28_orders o2
                                     WHERE o2.o_custkey = o.o_custkey)
               ORDER BY o_orderkey""")
    }, Some("""SELECT o_orderkey FROM orders o WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) ORDER BY o_orderkey""")),

    // Q29 — pivot: per-day event counts pivoted by type (oracle uses the
    // portable conditional-aggregation form)
    ("q29_pivot", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count().na.fill(0L)
        .orderBy("day")
    }, oracle("""SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, COUNT(*) FILTER (event_type = 'click') AS click, COUNT(*) FILTER (event_type = 'error') AS error, COUNT(*) FILTER (event_type = 'purchase') AS purchase, COUNT(*) FILTER (event_type = 'signup') AS signup, COUNT(*) FILTER (event_type = 'view') AS view FROM events GROUP BY 1 ORDER BY day""")),

    // Q30 — value histogram via width_bucket (profiling surface)
    ("q30_histogram", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .groupBy(width_bucket(col("value"), lit(0d), lit(500d), lit(20)).as("bucket"))
        .agg(count("*").as("cnt"))
        .orderBy("bucket")
    }, oracle("""SELECT CAST(CASE WHEN value < 0 THEN 0 WHEN value >= 500 THEN 21 ELSE FLOOR(value / 25.0) + 1 END AS BIGINT) AS bucket, COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY bucket""")),

    // Q31 — bounded window frames: centered moving average + frame edges
    ("q31_movavg", (s: SparkSession, d: String) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(-2, 2)
      Engine.Tables(s, d).events
        .select(col("user_id"), col("event_id"),
          r4(avg(col("value")).over(frame)).as("mov_avg"),
          r4(first(col("value")).over(frame)).as("fv"),
          r4(last(col("value")).over(frame)).as("lv"))
        .orderBy("event_id")
    }, oracle("""SELECT user_id, event_id, ROUND(AVG(value) OVER w, 4) AS mov_avg, ROUND(first_value(value) OVER w, 4) AS fv, ROUND(last_value(value) OVER w, 4) AS lv FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) ORDER BY event_id""")),

    // Q32 — full X2 derived-metric parity incl. the formatted ETA wall-clock
    // column (ref module_rpi_ups_hat.c:210-219): events mapped to UPS
    // readings (current = value-100 so the signal flips sign, pct = value),
    // run through StatefulOps.upsDerivedBatch — the oracle twin of the
    // flatMapGroupsWithState stream form (equivalence in StreamingSpec).
    ("q32_ups_eta", (s: SparkSession, d: String) => {
      import s.implicits._
      val readings = Engine.Tables(s, d).events
        .select(col("user_id").as("device_id"), col("ts"),
          (col("value") - 100).as("current_ma"), col("value").as("batt_pct"))
        .as[graft.streaming.StatefulOps.UpsReading]
      graft.streaming.StatefulOps.upsDerivedBatch(readings)
        // batt_pct/status tiebreak (device_id, ts) collisions: without them
        // the sort is not total and the driver's order-sensitive hash could
        // diverge on tied timestamps
        .orderBy("device_id", "ts", "batt_pct", "status")
        .select(col("device_id"), date_format(col("ts"), TsFmt).as("ts"),
          r4(col("batt_pct")).as("batt_pct"), col("status"),
          r4(col("batt_use_per_sec")).as("rate"),
          r4(col("remaining_hrs")).as("remaining_hrs"), col("eta"))
    }, oracle("""WITH r AS (SELECT user_id AS device_id, ts, value - 100 AS current_ma, value AS batt_pct, epoch_us(ts) // 1000000 AS tsec FROM events), s AS (SELECT *, CASE WHEN current_ma > 0 THEN 1 ELSE -1 END AS sign FROM r), f AS (SELECT *, sign <> COALESCE(LAG(sign) OVER (PARTITION BY device_id ORDER BY ts, current_ma), 0) AS flip FROM s), b AS (SELECT *, LAST_VALUE(CASE WHEN flip THEN tsec END IGNORE NULLS) OVER wr AS t0, LAST_VALUE(CASE WHEN flip THEN batt_pct END IGNORE NULLS) OVER wr AS pct0 FROM f WINDOW wr AS (PARTITION BY device_id ORDER BY ts, current_ma ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), c AS (SELECT *, (pct0 - batt_pct) / (tsec - t0 + 1) AS rate FROM b) SELECT device_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, ROUND(batt_pct, 4) AS batt_pct, CASE WHEN sign > 0 THEN 'Charging' ELSE 'Discharging' END AS status, CASE WHEN rate > 0 THEN ROUND(rate, 4) END AS rate, CASE WHEN rate > 0 THEN ROUND(batt_pct / rate / 3600.0, 4) END AS remaining_hrs, CASE WHEN rate > 0 AND batt_pct / rate < 3.15e9 THEN strftime(make_timestamp((tsec + CAST(FLOOR(batt_pct / rate) AS BIGINT)) * 1000000), '%Y-%m-%dT%H:%M:%S') END AS eta FROM c ORDER BY device_id, c.ts, c.batt_pct, status""")),

    // Q22 — to_json ∘ from_json round trip (T7+T8); oracle is the identity
    ("q22_json_roundtrip", (s: SparkSession, d: String) => {
      Engine.Tables(s, d).events
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("event_type"),
            r4(col("value")).as("v"))).as("js"))
        .select(col("event_id"), get_json_object(col("js"), "$.event_type").as("extracted"))
        .orderBy("event_id")
    }, oracle("""SELECT event_id, event_type AS extracted FROM events ORDER BY event_id"""))
  )
}
