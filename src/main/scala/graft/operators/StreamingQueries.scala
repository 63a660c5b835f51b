package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streaming

/** Streaming + event-time operators over the events table. st1 executes
  * a REAL Structured Streaming query (file source, event-time window,
  * watermark, AvailableNow trigger, memory sink) whose result must
  * hash-match the batch SQL oracle — the strongest possible check that
  * micro-batch execution and batch semantics agree.
  */
object StreamingQueries {

  // ---------------------------------------------------------------------
  // st1_stream_hourly — streaming tumbling-window agg == batch GROUP BY.
  def st1(spark: SparkSession, dir: String): DataFrame =
    Streaming.hourlyEventCounts(spark, dir)
      .orderBy(col("hour"), col("event_type"))

  private val st1Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_scaled
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // st2_sessions — gap-based sessionization (30 min) via window
  // functions; the stateful streaming twin (mapGroupsWithState) is
  // spec-verified to produce identical session counts.
  def st2(spark: SparkSession, dir: String): DataFrame =
    Streaming.sessionize(Tables.events(spark, dir), gapMinutes = 30)
      .groupBy(col("user_id"))
      .agg(
        max(col("session_seq")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  private val st2Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tsu,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |s AS (
      |  SELECT user_id,
      |    CASE WHEN prev IS NULL OR tsu - prev > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e)
      |SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // st3_stream_join — stream–static broadcast join + event-time window,
  // executed as a real streaming query; oracle is the batch equivalent
  // with the same inline dimension.
  def st3(spark: SparkSession, dir: String): DataFrame =
    Streaming.enrichedDailyCounts(spark, dir)
      .orderBy(col("day"), col("severity"))

  private val st3Sql =
    """WITH dim(event_type, severity) AS (VALUES
      |  ('view', 'low'), ('click', 'low'), ('signup', 'medium'),
      |  ('purchase', 'high'), ('error', 'critical'))
      |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, severity,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_scaled
      |FROM events JOIN dim USING (event_type)
      |GROUP BY 1, 2 ORDER BY day, severity""".stripMargin

  // ---------------------------------------------------------------------
  // st4_stream_stream — stream–stream inner join with an event-time
  // interval bound (views → purchases within 30 min), run as a real
  // double-watermarked streaming query; per-user pair counts must
  // hash-match the batch self-join oracle.
  def st4(spark: SparkSession, dir: String): DataFrame =
    Streaming.viewPurchaseJoin(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("view_id")).as("min_view"),
        max(col("purchase_id")).as("max_purchase"))
      .orderBy(col("user_id"))

  private val st4Sql =
    """SELECT v.user_id, COUNT(*) AS n_pairs,
      |  MIN(v.event_id) AS min_view, MAX(p.event_id) AS max_purchase
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      |  AND v.event_type = 'view' AND p.event_type = 'purchase'
      |  AND epoch_us(p.ts) >= epoch_us(v.ts)
      |  AND epoch_us(p.ts) <= epoch_us(v.ts) + 30 * 60 * 1000000
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // st11_stream_outer — st4's interval join in LEFT OUTER form, the
  // watermark-eviction-driven operator: unmatched views null-extend
  // only when the watermark closes their 30-minute window (a window
  // the final watermark never closes stays unemitted — bounded-state
  // semantics the oracle reproduces with the same watermark
  // arithmetic). Matched rows emit like the inner join, so the two
  // paths compose in one result: per-user matched vs evicted-unmatched
  // counts.
  //
  // Watermark subtlety the oracle MUST model (pinned empirically at
  // all three sfs): each `withWatermark` operator tracks the max event
  // time of ITS OWN filtered stream, and the query's global watermark
  // is the MIN across watermark operators — so here
  // wm = min(max view_ts, max purchase_ts) − 1h, NOT max(all events)
  // − 1h. A view's null row emits iff view_ts + 30min < wm. Modeling
  // wm from the unfiltered max over-evicts whenever the two event
  // types' maxima diverge (they always do in real data).
  def st11(spark: SparkSession, dir: String): DataFrame =
    Streaming.viewPurchaseLeftOuter(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("purchase_id")).as("n_matched"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("n_unmatched"),
        min(col("view_id")).as("min_view"))
      .orderBy(col("user_id"))

  private val st11Sql =
    """WITH e AS (
      |  SELECT epoch_us(ts) AS tsu, event_type, user_id, event_id FROM events),
      |m AS (SELECT LEAST(
      |        MAX(CASE WHEN event_type = 'view' THEN tsu END),
      |        MAX(CASE WHEN event_type = 'purchase' THEN tsu END))
      |        // 1000 * 1000 - 3600000000 AS wm FROM e),
      |v AS (SELECT user_id, tsu AS vts, event_id AS view_id
      |      FROM e WHERE event_type = 'view'),
      |p AS (SELECT user_id AS pu, tsu AS pts, event_id AS purchase_id
      |      FROM e WHERE event_type = 'purchase'),
      |mt AS (
      |  SELECT v.user_id, v.view_id, p.purchase_id
      |  FROM v JOIN p ON v.user_id = p.pu
      |    AND p.pts >= v.vts AND p.pts <= v.vts + 1800000000),
      |um AS (
      |  SELECT v.user_id, v.view_id, CAST(NULL AS BIGINT) AS purchase_id
      |  FROM v CROSS JOIN m
      |  WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.pu = v.user_id
      |                    AND p.pts >= v.vts AND p.pts <= v.vts + 1800000000)
      |    AND v.vts + 1800000000 < m.wm),
      |allr AS (SELECT * FROM mt UNION ALL SELECT * FROM um)
      |SELECT user_id, COUNT(*) AS n_rows,
      |  COUNT(purchase_id) AS n_matched,
      |  CAST(SUM(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unmatched,
      |  MIN(view_id) AS min_view
      |FROM allr GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // st12_stream_full_outer — the FULL OUTER stream-stream join: both
  // sides null-extend on state eviction, with ASYMMETRIC eviction
  // rules that fall out of the interval condition (views wait out
  // their 30-minute window: view_ts + 30min < wm; purchases only wait
  // for the watermark itself: p_ts < wm, since any joining view
  // precedes its purchase). Same min-across-watermark-operators wm as
  // st11. Per-user row/matched/unmatched-by-side counts.
  def st12(spark: SparkSession, dir: String): DataFrame =
    Streaming.viewPurchaseFullOuter(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("view_id").isNotNull && col("purchase_id").isNotNull, 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("n_view_only"),
        sum(when(col("view_id").isNull, 1L).otherwise(0L)).as("n_purchase_only"))
      .orderBy(col("user_id"))

  private val st12Sql =
    """WITH e AS (
      |  SELECT epoch_us(ts) AS tsu, event_type, user_id, event_id FROM events),
      |m AS (SELECT LEAST(
      |        MAX(CASE WHEN event_type = 'view' THEN tsu END),
      |        MAX(CASE WHEN event_type = 'purchase' THEN tsu END))
      |        // 1000 * 1000 - 3600000000 AS wm FROM e),
      |v AS (SELECT user_id, tsu AS vts, event_id AS view_id
      |      FROM e WHERE event_type = 'view'),
      |p AS (SELECT user_id AS pu, tsu AS pts, event_id AS purchase_id
      |      FROM e WHERE event_type = 'purchase'),
      |mt AS (
      |  SELECT v.user_id, v.view_id, p.purchase_id
      |  FROM v JOIN p ON v.user_id = p.pu
      |    AND p.pts >= v.vts AND p.pts <= v.vts + 1800000000),
      |vo AS (
      |  SELECT v.user_id, v.view_id, CAST(NULL AS BIGINT) AS purchase_id
      |  FROM v CROSS JOIN m
      |  WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.pu = v.user_id
      |                    AND p.pts >= v.vts AND p.pts <= v.vts + 1800000000)
      |    AND v.vts + 1800000000 < m.wm),
      |po AS (
      |  SELECT p.pu AS user_id, CAST(NULL AS BIGINT) AS view_id, p.purchase_id
      |  FROM p CROSS JOIN m
      |  WHERE NOT EXISTS (SELECT 1 FROM v WHERE v.user_id = p.pu
      |                    AND p.pts >= v.vts AND p.pts <= v.vts + 1800000000)
      |    AND p.pts < m.wm),
      |allr AS (SELECT * FROM mt UNION ALL SELECT * FROM vo
      |         UNION ALL SELECT * FROM po)
      |SELECT user_id, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN view_id IS NOT NULL AND purchase_id IS NOT NULL
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      |  CAST(SUM(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_view_only,
      |  CAST(SUM(CASE WHEN view_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_purchase_only
      |FROM allr GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // st5_stateful_sessions — the custom-state streaming path
  // (KeyValueGroupedDataset.mapGroupsWithState) run as a REAL streaming
  // query, hash-matched against the SAME batch oracle as st2: the
  // stateful kernel and the window-function plan must agree row for
  // row. st2 proves the relational form; st5 proves the stateful form.
  // The max-aggregate makes the result batch-count-proof: the update-
  // mode memory sink appends one row per user PER MICRO-BATCH, and both
  // counters are monotone, so max() selects each user's final state
  // even if the file source ever splits into multiple batches (today
  // AvailableNow drains the directory in one).
  def st5(spark: SparkSession, dir: String): DataFrame =
    Streaming.statefulSessionCounts(spark, dir, gapMinutes = 30)
      .groupBy(col("user_id"))
      .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------------
  // st6_session_flows — append-clean completed-session emission
  // (flatMapGroupsWithState + EventTimeTimeout, state removed on
  // expiry), run as a real streaming query. Emitted = sessions closed
  // by an in-batch successor ∪ sessions whose timeout (end + gap, in
  // watermark milliseconds) precedes the final watermark (max event
  // time, delay 0) — the trailing watermark-advance batch fires those.
  // A session still inside its gap horizon at end-of-stream is
  // correctly absent: it is not final yet.
  def st6(spark: SparkSession, dir: String): DataFrame =
    Streaming.sessionFlowCounts(spark, dir, gapMinutes = 30)
      .orderBy(col("user_id"), col("start_tsu"))

  private val st6Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tsu,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |s AS (
      |  SELECT user_id, tsu,
      |    SUM(CASE WHEN prev IS NULL OR tsu - prev > 30 * 60 * 1000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS seq
      |  FROM e),
      |g AS (
      |  SELECT user_id, seq, min(tsu) AS start_tsu, max(tsu) AS end_tsu,
      |    COUNT(*) AS n_events
      |  FROM s GROUP BY user_id, seq),
      |m AS (SELECT max(tsu) // 1000 AS wm_ms FROM e)
      |SELECT user_id, start_tsu, end_tsu, n_events
      |FROM g, m
      |WHERE seq < (SELECT max(seq) FROM g g2 WHERE g2.user_id = g.user_id)
      |   OR end_tsu // 1000 + 30 * 60 * 1000 < wm_ms
      |ORDER BY user_id, start_tsu""".stripMargin

  // ---------------------------------------------------------------------
  // st7_distinct_users — chained stateful streaming: event-time dedup →
  // windowed count-distinct-users per (hour, event_type), append mode.
  // The oracle applies the append-mode finalization cutoff: only
  // windows whose end precedes the final watermark (max event time −
  // 1 h delay) have emitted — the same convention as st6's timeout
  // cutoff, here on window boundaries.
  def st7(spark: SparkSession, dir: String): DataFrame =
    Streaming.distinctUsersHourly(spark, dir)
      .orderBy(col("hour"), col("event_type"))

  private val st7Sql =
    """WITH e AS (
      |  SELECT epoch_us(ts) AS tsu, event_type, user_id FROM events),
      |m AS (SELECT max(tsu) - 3600000000 AS wm FROM e),
      |d AS (
      |  SELECT DISTINCT (tsu // 3600000000) AS hidx, event_type, user_id FROM e)
      |SELECT strftime(make_timestamp(hidx * 3600000000), '%Y-%m-%d %H:%M') AS hour,
      |  event_type, COUNT(*) AS n_users
      |FROM d, m
      |WHERE (hidx + 1) * 3600000000 <= wm
      |GROUP BY hidx, event_type ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // st8_tws_sessions — st6's completed-session emission re-expressed on
  // Spark 4's transformWithState (typed ValueState + explicit event-time
  // timers, RocksDB store), run as a real streaming query. Same output,
  // same batch oracle as st6: the legacy flatMapGroupsWithState path and
  // the TWS path must agree row for row — the migration-safety gate for
  // the new API.
  def st8(spark: SparkSession, dir: String): DataFrame =
    Streaming.sessionFlowCountsTws(spark, dir, gapMinutes = 30)
      .orderBy(col("user_id"), col("start_tsu"))

  // ---------------------------------------------------------------------
  // st9_tws_profiles — transformWithState with MAP state: per-user
  // event-type counters in a MapState (only touched entries read/write,
  // vs the single-slot GroupState blob), finalized on an event-time
  // timer once the watermark passes the user's last event. The SUM
  // downstream makes the result epoch-proof: if a user's events ever
  // straddle a mid-stream finalize (multi-batch run), each epoch emits
  // its own partial rows and the sum restores the batch total — the
  // same monotone-counter trick as st5's max().
  def st9(spark: SparkSession, dir: String): DataFrame =
    Streaming.userProfileCountsTws(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n")).as("n"))
      .orderBy(col("user_id"), col("event_type"))

  private val st9Sql =
    """SELECT user_id, event_type, COUNT(*) AS n
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // st10_session_window — the BUILT-IN session_window aggregation (the
  // engine's own gap-merge state store; no custom state code),
  // completing the sessionization triple: st2 relational, st5/6/8
  // custom state, st10 built-in. Window bounds are gap-extended
  // ([first, last + gap)); append mode finalizes once the watermark
  // reaches the extended end. The comparison happens at MICROSECOND
  // precision against the ms-quantized watermark (end_us <= wm_ms·1000,
  // inclusive): a session whose extended end is even 1 µs past the
  // watermark's millisecond stays open — the oracle must NOT truncate
  // the session end to ms before comparing, or it admits sessions in
  // the sub-ms band that Spark still holds.
  def st10(spark: SparkSession, dir: String): DataFrame =
    Streaming.sessionWindowCounts(spark, dir, gapMinutes = 30)
      .orderBy(col("user_id"), col("start_tsu"))

  private val st10Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tsu,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |s AS (
      |  SELECT user_id, tsu,
      |    SUM(CASE WHEN prev IS NULL OR tsu - prev > 30 * 60 * 1000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS seq
      |  FROM e),
      |g AS (
      |  SELECT user_id, seq, min(tsu) AS start_tsu,
      |    max(tsu) + 30 * 60 * 1000000 AS end_gap_tsu, COUNT(*) AS n_events
      |  FROM s GROUP BY user_id, seq),
      |m AS (SELECT max(tsu) // 1000 AS wm_ms FROM e)
      |SELECT user_id, start_tsu, end_gap_tsu, n_events
      |FROM g, m
      |WHERE end_gap_tsu <= wm_ms * 1000
      |ORDER BY user_id, start_tsu""".stripMargin

  // ---------------------------------------------------------------------
  // st13_lake_merge — streaming CDC → incremental parquet-table upsert
  // (LakeMerge: immutable generation dirs + atomic manifest swap, the
  // lakehouse MERGE loop without a table format). Four arrival
  // micro-batches merge into a 16-bucket table; only touched buckets
  // are read/rewritten per batch, and the merge is a commutative argmax
  // reduce, so ANY batch interleaving converges to the same table —
  // which is exactly what makes this streaming sink batch-oracle-able:
  // the final table must equal the batch latest-event-per-user, no
  // watermark modeling required. The gate rolls the table up per
  // event_type of each user's final event.
  def st13(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.LakeMerge.eventsLatestMerge(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        RelationalQueries.dsum(col("value")).as("sum_value"),
        max(col("tsu")).as("max_tsu"),
        min(col("user_id")).as("min_user"))
      .orderBy(col("event_type"))

  private val st13Sql =
    """WITH l AS (
      |  SELECT user_id, event_type, value, epoch_us(ts) AS tsu,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events WHERE user_id IS NOT NULL)
      |SELECT event_type, COUNT(*) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |  MAX(tsu) AS max_tsu, MIN(user_id) AS min_user
      |FROM l WHERE rn = 1
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // st14_tws_lastn — transformWithState LIST state (completing the
  // Value/Map/List state-type triple): bounded last-5 event ring + a
  // lifetime ValueState counter per user, snapshot-on-timer emission.
  // Under real micro-batch arrival an idle user's timer fires
  // MID-stream and emits an intermediate snapshot (state kept — see
  // RecentEventsProcessor's audit note); n_events is monotone, so the
  // max-n_events row per user is the final answer under ANY slicing.
  // Oracle: batch window rank, newest-first, top-5 ids joined.
  def st14(spark: SparkSession, dir: String): DataFrame =
    Streaming.recentEventsTws(spark, dir, n = 5)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max_by(col("recent"), col("n_events")).as("recent"))
      .orderBy(col("user_id"))

  private val st14Sql =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
      |r AS (
      |  SELECT user_id, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY tsu DESC, event_id DESC) AS rn
      |  FROM e)
      |SELECT user_id, COUNT(*) AS n_events,
      |  string_agg(CASE WHEN rn <= 5 THEN CAST(event_id AS VARCHAR) END,
      |    ',' ORDER BY rn) AS recent
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // st15_dedup_within_wm — engine-native `dropDuplicatesWithinWatermark`:
  // streaming first-arrival dedup whose key state evicts with the
  // watermark (bounded on an infinite stream, unlike plain
  // dropDuplicates). Key-column projection makes it order-independent ==
  // batch DISTINCT.
  def st15(spark: SparkSession, dir: String): DataFrame =
    Streaming.distinctPairsStreaming(spark, dir)
      .orderBy(col("user_id"), col("event_type"))

  private val st15Sql =
    """SELECT DISTINCT user_id, event_type FROM events
      |WHERE user_id IS NOT NULL
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // st16_stream_semi_join — stream-stream LEFT SEMI interval join
  // (streaming EXISTS): completes the join-type family (st4 inner, st11
  // left outer, st12 full outer). Emission is match-triggered, so the
  // full drain equals batch EXISTS with no watermark term in the oracle.
  def st16(spark: SparkSession, dir: String): DataFrame =
    Streaming.viewPurchaseSemi(spark, dir)
      .orderBy(col("user_id"), col("view_id"))

  private val st16Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
      |v AS (SELECT user_id, event_id AS view_id, tsu FROM e
      |      WHERE event_type = 'view'),
      |p AS (SELECT user_id, tsu FROM e WHERE event_type = 'purchase')
      |SELECT v.user_id, v.view_id FROM v
      |WHERE EXISTS (SELECT 1 FROM p
      |  WHERE p.user_id = v.user_id
      |    AND p.tsu >= v.tsu AND p.tsu <= v.tsu + 1800000000)
      |ORDER BY v.user_id, v.view_id""".stripMargin

  // ---------------------------------------------------------------------
  // st17_window_chain — two CHAINED windowed aggregations in one query
  // (hour → day rollup): the outer aggregate consumes the inner's
  // emitted hour rows, so rollup cost is hour-cardinality, independent
  // of stream volume. Oracle applies the append-mode cutoff at day
  // boundaries (day_end ≤ max − 1h), the st7 convention one level up.
  def st17(spark: SparkSession, dir: String): DataFrame =
    Streaming.hourlyThenDaily(spark, dir)
      .orderBy(col("day"), col("event_type"))

  private val st17Sql =
    """WITH e AS (SELECT epoch_us(ts) AS tsu, event_type FROM events),
      |m AS (SELECT max(tsu) - 3600000000 AS wm FROM e),
      |h AS (SELECT tsu // 3600000000 AS hidx, event_type, COUNT(*) AS n
      |      FROM e GROUP BY 1, 2),
      |d AS (SELECT hidx // 24 AS didx, event_type,
      |        CAST(SUM(n) AS BIGINT) AS n_events, COUNT(*) AS n_hours
      |      FROM h GROUP BY 1, 2)
      |SELECT strftime(make_timestamp(didx * 86400000000), '%Y-%m-%d') AS day,
      |  event_type, n_events, n_hours
      |FROM d, m WHERE (didx + 1) * 86400000000 <= wm
      |ORDER BY day, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // st18_stream_wau — rolling 7-day active users as a streaming query
  // (the stream twin of x29_rolling_wau): ×7 day-shift fan-out, then
  // the st7 chained dedup→window-count shape in the SHIFTED event-time
  // domain. The oracle is x29's first-distinct rewrite plus the
  // append-mode finalization cutoff in the shifted domain: a day-D
  // window's end is (D+1) midnight shifted, and the final watermark is
  // max event time + 6 days − 1 h, so emitted days satisfy
  // (D+1)·day ≤ tmax + 6·day − 1h. Days past the data's max day are
  // REAL emissions (their windows saw only the trailing edge) — the
  // oracle keeps them, unlike batch x29 which bounds to observed days.
  def st18(spark: SparkSession, dir: String): DataFrame =
    Streaming.rollingWauStream(spark, dir).orderBy(col("day_num"))

  private val st18Sql =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events WHERE ts IS NOT NULL),
      |t AS (SELECT max(epoch_us(ts)) AS tmax FROM events WHERE ts IS NOT NULL),
      |c AS (SELECT DISTINCT user_id, day + k AS day_num
      |      FROM ud CROSS JOIN range(0, 7) r(k))
      |SELECT day_num, COUNT(*) AS wau
      |FROM c CROSS JOIN t
      |WHERE (day_num + 1) * 86400000000 <= tmax + 6 * 86400000000 - 3600000000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // st19_stream_locf — x34's LOCF imputation as a STREAMING stateful
  // operator (transformWithState, List + Value state): events buffer
  // per user until the watermark finalizes them, then fold in event-time
  // order through a carried-reading ValueState that SURVIVES batches.
  // The oracle is x34's batch window restricted to non-null users (the
  // stream key is a primitive Long).
  def st19(spark: SparkSession, dir: String): DataFrame =
    Streaming.locfTws(spark, dir).orderBy(col("event_id"))

  private val st19Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS tsu, event_type,
      |    CASE WHEN event_type = 'click' THEN value END AS reading
      |  FROM events WHERE user_id IS NOT NULL)
      |SELECT event_id, user_id, event_type, reading,
      |  last_value(reading IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY tsu, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
      |FROM e ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // st20_stream_enrich — stream-STATIC broadcast dimension join (the
  // join family member st4/st11/st12/st16 don't cover: no state, dim
  // re-read per micro-batch) feeding a Complete-mode aggregate:
  // (market segment, event type) activity counts with exact scaled
  // value sums. Full drain == the batch join+GROUP BY oracle.
  def st20(spark: SparkSession, dir: String): DataFrame =
    Streaming.enrichedSegmentCounts(spark, dir)
      .orderBy(col("segment"), col("event_type"))

  private val st20Sql =
    """SELECT c_mktsegment AS segment, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
      |    AS sum_value_scaled
      |FROM events JOIN customer ON user_id = c_custkey
      |WHERE user_id IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // st21_stream_topk — streaming GLOBAL top-5 leaderboard (per-user
  // event counts) in Complete mode: the sort+limit runs over the
  // user-cardinality aggregate state re-emitted per micro-batch —
  // Append could never retract an already-emitted rank, which is why
  // Complete is the only correct mode for a streaming leaderboard.
  // Deterministic (count desc, user_id) tie-break; full drain == the
  // batch top-k oracle.
  def st21(spark: SparkSession, dir: String): DataFrame =
    Streaming.topUsersByEvents(spark, dir, k = 5)

  private val st21Sql =
    """SELECT user_id, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
      |    AS sum_value_scaled
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, user_id LIMIT 5""".stripMargin

  // ---------------------------------------------------------------------
  // st22_stream_funnel — the x2 conversion funnel as an always-on
  // streaming query: per-user conditional-min step timestamps in O(1)
  // mapGroupsWithState state (see [[Streaming.funnelCounts]]). Update-
  // mode emission — conversion is a living fact an out-of-order click
  // can flip either way — so the gate takes each user's LATEST row via
  // the monotone event count (`max(struct(n_events, converted))`, the
  // st5 batch-count-proof pattern), then filters to converted users.
  // Hash-matches x2's batch oracle: the incremental stateful form and
  // the batch rescan must agree user for user.
  def st22(spark: SparkSession, dir: String): DataFrame =
    Streaming.funnelCounts(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("converted"))).as("m"))
      .filter(col("m.converted"))
      .select(col("user_id"), col("m.n_events").as("n_events"))
      .orderBy(col("user_id"))

  private val st22Sql =
    """WITH m AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events FROM m
      |WHERE v < c AND c < p ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // st23_stream_kmv — bounded-state streaming distinct estimation: the
  // per-event-type distinct-user count kept as a k=64 KMV sketch in
  // mapGroupsWithState (512 B per key at ANY user cardinality, vs
  // exact streaming distinct's one-state-row-per-user) — see
  // [[Streaming.kmvDistinct]]. Update-mode: each batch re-emits the
  // key's sketch summary; the gate takes the LATEST row per key via
  // the monotone n_seen (st5/st22 pattern) and applies the
  // (k−1)·2^32/h_k estimator (exact count when the buffer never
  // filled). KMV insertion is order-independent, so the drained
  // incremental sketch equals the batch formula bit for bit — the
  // ESTIMATE hash-gates against a DuckDB oracle that never saw a
  // stream.
  def st23(spark: SparkSession, dir: String): DataFrame =
    Streaming.kmvDistinct(spark, dir)
      .groupBy(col("event_type"))
      .agg(max(struct(col("n_seen"), col("kth_hash"), col("kk"))).as("m"))
      .select(col("event_type"), col("m.kk").as("kk"),
        col("m.kth_hash").as("kth_hash"),
        expr("CASE WHEN m.kk < 64 THEN m.kk" +
          " ELSE (m.kk - 1) * 4294967296L div m.kth_hash END").as("est_users"))
      .orderBy(col("event_type"))

  private val st23Sql =
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |    ((user_id % 67108864) * 2654435761) % 4294967296 AS hv
      |  FROM events WHERE user_id IS NOT NULL),
      |r AS (SELECT event_type, hv,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      |  FROM h),
      |k AS (SELECT event_type, CAST(MAX(hv) AS BIGINT) AS kth_hash,
      |    COUNT(*) AS kk
      |  FROM r WHERE rn <= 64 GROUP BY 1)
      |SELECT event_type, kk, kth_hash,
      |  CAST(CASE WHEN kk < 64 THEN kk
      |    ELSE (kk - 1) * 4294967296 // kth_hash END AS BIGINT) AS est_users
      |FROM k ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // st29_stream_hll — hourly distinct-user ESTIMATION with 64 longs of
  // state per hour: the HLL register sketch as a plain streaming
  // windowed aggregation (see [[Streaming.hourlyHllRegisters]] for the
  // state story — this is the windowed, aggregation-only sibling of
  // st23's global mapGroupsWithState KMV). The gate derives the raw
  // HLL estimate from the drained registers in exact integer
  // arithmetic: S = Σ 2^(mx − rho_j) over present registers plus
  // (64 − present)·2^mx for the absent ones (the 2^−rho harmonic sum
  // scaled by 2^mx so it stays integral), then
  // est_raw = ⌊α_ppm·64²·2^mx / (S·10⁶)⌋ with α_ppm = 709365 (the
  // standard 0.7213/(1+1.079/m) constant in parts-per-million — a
  // shared literal, so no float crosses an engine boundary). Small-
  // range correction is the standard LINEAR COUNTING switch (raw ≤
  // 2.5m with empty registers → est = ⌊m·ln(m/V)⌋, V = empty count):
  // mandatory here, since sparse hours sit exactly in the regime where
  // the raw estimator reads register occupancy as ~4× the truth. The
  // ln lives in a 64-entry INTEGER table shared by both engines as
  // literals (V has only 64 possible values), keeping the whole gate
  // float-free.
  private val hllLcTable = Seq(
    266, 221, 195, 177, 163, 151, 141, 133, 125, 118, 112, 107, 102, 97,
    92, 88, 84, 81, 77, 74, 71, 68, 65, 62, 60, 57, 55, 52, 50, 48, 46,
    44, 42, 40, 38, 36, 35, 33, 31, 30, 28, 26, 25, 23, 22, 21, 19, 18,
    17, 15, 14, 13, 12, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0)

  def st29(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("hour"))
    Streaming.hourlyHllRegisters(spark, dir)
      .withColumn("mx", max(col("maxr")).over(w))
      .withColumn("term", expr("shiftleft(1L, cast(mx - maxr as int))"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n_present"), max(col("mx")).as("mx"),
        sum(col("term")).as("s_present"))
      .select(col("hour"), col("n_present"),
        col("mx").as("max_rho"),
        (col("s_present") + (lit(64L) - col("n_present")) *
          expr("shiftleft(1L, cast(mx as int))")).as("s_total"))
      .withColumn("est_raw",
        expr("cast((cast(709365 as decimal(38,0)) * 4096 *" +
          " cast(shiftleft(1L, cast(max_rho as int)) as decimal(38,0)))" +
          " div (cast(s_total as decimal(38,0)) * 1000000) as bigint)"))
      .withColumn("est_users",
        when(col("n_present") < 64L && col("est_raw") <= 160L,
          element_at(
            expr(s"array(${hllLcTable.mkString("L,")}L)"),
            (lit(64L) - col("n_present")).cast("int")))
          .otherwise(col("est_raw")))
      .orderBy(col("hour"))
  }

  private val st29Sql =
    """WITH e AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
      |    ((user_id % 67108864) * 2654435761) % 4294967296 AS hv
      |  FROM events WHERE user_id IS NOT NULL),
      |r1 AS (
      |  SELECT hour, hv % 64 AS reg,
      |    CASE WHEN hv // 64 = 0 THEN 27
      |         ELSE 27 - length(bin(hv // 64)) END AS rho
      |  FROM e),
      |regs AS (SELECT hour, reg, MAX(rho) AS maxr FROM r1 GROUP BY 1, 2),
      |h AS (SELECT hour, COUNT(*) AS n_present, MAX(maxr) AS mx
      |      FROM regs GROUP BY 1),
      |s AS (
      |  SELECT r.hour,
      |    SUM(CAST(1 AS BIGINT) << CAST(h.mx - r.maxr AS INTEGER)) AS s_present
      |  FROM regs r JOIN h USING (hour) GROUP BY 1),
      |f AS (
      |  SELECT h.hour, h.n_present, h.mx,
      |    s.s_present + (64 - h.n_present) *
      |      (CAST(1 AS BIGINT) << CAST(h.mx AS INTEGER)) AS s_total
      |  FROM h JOIN s USING (hour)),
      |g AS (
      |  SELECT hour, CAST(n_present AS BIGINT) AS n_present,
      |    CAST(mx AS BIGINT) AS max_rho, CAST(s_total AS BIGINT) AS s_total,
      |    CAST((CAST(709365 AS HUGEINT) * 4096 *
      |      (CAST(1 AS BIGINT) << CAST(mx AS INTEGER)))
      |      // (CAST(s_total AS HUGEINT) * 1000000) AS BIGINT) AS est_raw
      |  FROM f)
      |SELECT hour, n_present, max_rho, s_total, est_raw,
      |  CASE WHEN n_present < 64 AND est_raw <= 160 THEN CAST(
      |    [266,221,195,177,163,151,141,133,125,118,112,107,102,97,
      |     92,88,84,81,77,74,71,68,65,62,60,57,55,52,50,48,46,
      |     44,42,40,38,36,35,33,31,30,28,26,25,23,22,21,19,18,
      |     17,15,14,13,12,10,9,8,7,6,5,4,3,2,1,0][64 - n_present]
      |    AS BIGINT) ELSE est_raw END AS est_users
      |FROM g ORDER BY hour""".stripMargin

  // ---------------------------------------------------------------------
  // st24_stream_anti — streaming NOT EXISTS: views with no purchase in
  // their 30-minute window, as one continuous query. Structured
  // Streaming has no stream-stream left_anti; [[Streaming
  // .viewPurchaseAnti]] runs the canonical emulation (LEFT OUTER
  // interval join + null filter INSIDE the streaming query), so
  // emission is eviction-triggered: a view emits exactly when the
  // watermark proves no matching purchase can still arrive — the only
  // sound streaming NOT-EXISTS. The oracle is st11's unmatched branch
  // alone, with the same min-across-watermark-operators wm model
  // (wm = min(max view_ts, max purchase_ts) − 1h); a view whose
  // window the final watermark never closes is NOT emitted, and the
  // oracle reproduces that bounded-state contract explicitly.
  def st24(spark: SparkSession, dir: String): DataFrame =
    Streaming.viewPurchaseAnti(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_unconverted"),
        min(col("view_id")).as("min_view"),
        max(col("view_id")).as("max_view"))
      .orderBy(col("user_id"))

  private val st24Sql =
    """WITH e AS (
      |  SELECT epoch_us(ts) AS tsu, event_type, user_id, event_id FROM events),
      |m AS (SELECT LEAST(
      |        MAX(CASE WHEN event_type = 'view' THEN tsu END),
      |        MAX(CASE WHEN event_type = 'purchase' THEN tsu END))
      |        // 1000 * 1000 - 3600000000 AS wm FROM e),
      |v AS (SELECT user_id, tsu AS vts, event_id AS view_id
      |      FROM e WHERE event_type = 'view'),
      |p AS (SELECT user_id AS pu, tsu AS pts
      |      FROM e WHERE event_type = 'purchase'),
      |um AS (
      |  SELECT v.user_id, v.view_id
      |  FROM v CROSS JOIN m
      |  WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.pu = v.user_id
      |                    AND p.pts >= v.vts AND p.pts <= v.vts + 1800000000)
      |    AND v.vts + 1800000000 < m.wm)
      |SELECT user_id, COUNT(*) AS n_unconverted,
      |  MIN(view_id) AS min_view, MAX(view_id) AS max_view
      |FROM um GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // st25_stream_drift — streaming distribution-drift monitoring
  // ([[Streaming.hourlyDriftTvd]]): per closed hour, the total-variation
  // distance (exact integer ppm) between that hour's event-type mix and
  // the static global reference distribution, flagged at 200 000 ppm
  // (≈ the sf0.01 median, so both classes stay live). Two chained
  // stateful aggs (st17's pattern at EQUAL window width) with a
  // stream-static broadcast ref join between them; absent types
  // contribute their full reference share via ref_tot − Σ r_present.
  // Oracle: the same integral-division TVD over batch hourly counts,
  // with the append-mode hour-finalization cutoff (st7/st17
  // convention: (hidx+1)·1h ≤ max event time − 1h).
  def st25(spark: SparkSession, dir: String): DataFrame =
    Streaming.hourlyDriftTvd(spark, dir, thresholdPpm = 200000L)
      .orderBy(col("hour"))

  private val st25Sql =
    """WITH e AS (SELECT epoch_us(ts) AS tsu, event_type FROM events),
      |m AS (SELECT max(tsu) - 3600000000 AS wm FROM e),
      |r AS (SELECT event_type,
      |    CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM e) AS BIGINT)
      |      AS ref_ppm
      |  FROM e GROUP BY 1),
      |rt AS (SELECT CAST(SUM(ref_ppm) AS BIGINT) AS ref_tot FROM r),
      |h AS (SELECT tsu // 3600000000 AS hidx, event_type, COUNT(*) AS n
      |      FROM e GROUP BY 1, 2),
      |ht AS (SELECT hidx, CAST(SUM(n) AS BIGINT) AS n_events FROM h GROUP BY 1),
      |terms AS (SELECT h.hidx,
      |    CAST(SUM(ABS(CAST(h.n * 1000000 AS BIGINT) // ht.n_events
      |      - r.ref_ppm)) AS BIGINT) AS s_present,
      |    CAST(SUM(r.ref_ppm) AS BIGINT) AS r_present
      |  FROM h JOIN ht USING (hidx) JOIN r USING (event_type) GROUP BY 1),
      |f AS (SELECT t.hidx, ht.n_events,
      |    CAST((t.s_present + rt.ref_tot - t.r_present) // 2 AS BIGINT)
      |      AS tvd_ppm
      |  FROM terms t JOIN ht USING (hidx) CROSS JOIN rt)
      |SELECT strftime(make_timestamp(hidx * 3600000000), '%Y-%m-%d %H:%M')
      |    AS hour,
      |  n_events, tvd_ppm, tvd_ppm >= 200000 AS drifted
      |FROM f, m WHERE (hidx + 1) * 3600000000 <= wm
      |ORDER BY hour""".stripMargin

  // ---------------------------------------------------------------------
  // st26_rate_limit — x59's GCRA admission as an always-on streaming
  // query ([[Streaming.rateLimitTws]], transformWithState List+Value
  // state): events buffer per user until the watermark finalizes their
  // event-time order, then fold through the theoretical-arrival-time
  // ValueState — which SURVIVES across micro-batches, so a burst that
  // straddles a batch boundary is still throttled (the property that
  // makes this a streaming operator, not a per-batch recomputation).
  // Unlike x59's per-user counts, this gate emits the PER-EVENT
  // decisions — the stream a downstream ingest would actually filter
  // on. The oracle runs the identical recurrence (seed tat = ts + T,
  // admit iff ts ≥ tat − 2T, tat' = max(ts, tat) + T) as a recursive
  // CTE stepping each user's rank sequence in lockstep.
  def st26(spark: SparkSession, dir: String): DataFrame =
    Streaming.rateLimitTws(spark, dir, periodUs = 30000000L)
      .orderBy(col("event_id"))

  private val st26Sql =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, epoch_us(ts) AS tsu, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events WHERE user_id IS NOT NULL),
      |sim AS (
      |  SELECT user_id, rn, event_id, tsu + 30000000 AS tat, TRUE AS admitted
      |  FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn, e.event_id,
      |    CASE WHEN e.tsu >= s.tat - 60000000
      |      THEN GREATEST(e.tsu, s.tat) + 30000000 ELSE s.tat END,
      |    e.tsu >= s.tat - 60000000
      |  FROM sim s JOIN e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
      |SELECT event_id, user_id, admitted
      |FROM sim ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // st27_window_funnel — x62's ordered window-funnel as an always-on
  // transformWithState query ([[Streaming.windowFunnelTws]]): the
  // per-level latest-two-achieve-times DP folds each watermark-
  // finalized batch in event-time order through a ValueState that
  // SURVIVES micro-batches, so a view→click→purchase chain straddling
  // a batch boundary still counts (the property a per-batch rescan
  // loses). Each finalize emits the user's current level; the gate
  // takes the LATEST row per user via the monotone cumulative event
  // count (st22's pattern), then counts users per level — hash-equal
  // to x62's batch EXISTS-chain oracle.
  // ---------------------------------------------------------------------
  // st28_session_enrich — stream-STATIC range-join enrichment
  // ([[Streaming.sessionEnrichedPurchases]]): arriving purchases gain
  // their session id/size from a batch-computed per-user session-
  // interval dimension via user equality + point-in-interval — the
  // SCD2-lookup shape (x61) as an always-on query, and the one
  // streaming join flavor st1–st27 didn't cover (stream-stream
  // inner/outer/semi/anti all exist; this is the stateless
  // dimension-enrichment lane). Oracle: the identical islands +
  // interval join in batch SQL.
  def st28(spark: SparkSession, dir: String): DataFrame =
    Streaming.sessionEnrichedPurchases(spark, dir)
      .orderBy(col("user_id"), col("event_id"))

  private val st28Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu
      |  FROM events WHERE user_id IS NOT NULL),
      |g AS (
      |  SELECT user_id, tsu,
      |    CASE WHEN LAG(tsu) OVER w IS NULL
      |           OR tsu - LAG(tsu) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
      |s AS (
      |  SELECT user_id, tsu,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY tsu
      |      ROWS UNBOUNDED PRECEDING) AS sidx
      |  FROM g),
      |si AS (
      |  SELECT user_id, CAST(sidx AS BIGINT) AS sidx,
      |    MIN(tsu) AS s_start, MAX(tsu) AS s_end, COUNT(*) AS s_n
      |  FROM s GROUP BY 1, 2),
      |p AS (SELECT user_id, event_id, tsu FROM e
      |      WHERE event_type = 'purchase')
      |SELECT p.user_id AS user_id, p.event_id, si.sidx, si.s_n
      |FROM p JOIN si ON si.user_id = p.user_id
      |  AND p.tsu BETWEEN si.s_start AND si.s_end
      |ORDER BY user_id, event_id""".stripMargin

  def st27(spark: SparkSession, dir: String): DataFrame =
    Streaming.windowFunnelTws(spark, dir, windowUs = 3600000000L)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_seen"), col("lvl"))).as("m"))
      .filter(col("m.lvl") >= 1L)
      .groupBy(col("m.lvl").as("lvl"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("lvl"))

  // ---------------------------------------------------------------------
  // st30_chunked_hourly — APPEND-mode hourly counts over a CHUNKED
  // REPLAY: events arrive as 4 contiguous ts-range files, one per
  // micro-batch, so the watermark genuinely advances BETWEEN batches
  // and each batch finalizes+emits+EVICTS the hours it closed — the
  // progressive-eviction execution every other windowed gate (single
  // micro-batch) never exercises, and the one a production stream runs
  // constantly. State holds only the watermark-open tail (audited
  // per-batch in STATE_SF01.md). The result is exactly the hours the
  // FINAL watermark closed; the oracle reproduces the engine's
  // watermark arithmetic pinned by st10/st25: wm advances in
  // ms-floored event time minus the 1h delay, a window emits iff
  // window_end_us <= wm_us.
  def st30(spark: SparkSession, dir: String): DataFrame =
    Streaming.hourlyClosedWindows(spark, dir, chunks = 4)
      .orderBy(col("hour"), col("event_type"))

  private val st30Sql =
    """WITH m AS (
      |  SELECT ((max(epoch_us(ts)) // 1000) - 3600000) * 1000 AS wm FROM events)
      |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_scaled
      |FROM events, m
      |WHERE epoch_us(date_trunc('hour', ts)) + 3600000000 <= wm
      |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // st31_chunked_ssj — st4's stream-stream interval join over the same
  // 4-chunk replay: both join buffers fill, match, and get
  // watermark-evicted across real micro-batch boundaries (st4's
  // single-batch run never evicts mid-stream — the audit's replay of
  // it showed ~1000 rows/batch churn). Because the chunks are
  // contiguous in event time, eviction can never lose a future match
  // (a purchase in batch N has ts above every prior watermark, and its
  // candidate views within 30 min are strictly newer than what the 1h
  // delay evicts), so the multi-batch join must equal the batch join
  // exactly — same oracle as st4, no watermark term.
  def st31(spark: SparkSession, dir: String): DataFrame =
    Streaming.withChunkedReplay(spark, dir, 4) { staged =>
      Streaming.viewPurchaseJoin(spark, staged)
    }.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("view_id")).as("min_view"),
        max(col("purchase_id")).as("max_purchase"))
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------------
  // st32_stream_neardup — ONLINE MinHash-LSH dedup: documents replayed
  // as 4 doc_id-range micro-batches; one long of flatMapGroupsWithState
  // state per distinct LSH band key (the band's min doc_id); a doc is
  // near-dup iff an earlier doc shares any of its 4 bands. Because
  // arrival order is doc_id order, incremental admission equals the
  // batch election — the oracle is d2's candidate-pair CTEs verbatim,
  // projected to per-doc flags. A doc emits one flag per band; the
  // wrapper max-aggregates to the per-doc verdict AFTER the drain
  // (batch-side, so the stream stays single-stateful-operator).
  def st32(spark: SparkSession, dir: String): DataFrame =
    Streaming.streamingNearDup(spark, dir, chunks = 4)
      .groupBy(col("doc_id"))
      .agg(max(col("dup")).as("is_dup"))
      .orderBy(col("doc_id"))

  private val st32Sql =
    s"""WITH ${DedupQueries.pairCtes},
       |dup AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
       |SELECT sig.doc_id,
       |  CAST(CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
       |FROM sig LEFT JOIN dup d ON sig.doc_id = d.doc_id
       |ORDER BY sig.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // st33_stream_asof — the NATIVE as-of operator inside a streaming
  // pipeline (see [[Streaming.streamAsOfEnriched]]): clicks arrive one
  // ts-range chunk per micro-batch and each batch as-of joins the
  // once-materialized static purchase history through the custom
  // AsOfJoinExec in foreachBatch, landing exactly-once batchId-scoped
  // parquet. x54 proves the operator; this gate proves it COMPOSES —
  // with Structured Streaming's replay/idempotency machinery and the
  // stream-static materialization rule — while the oracle stays
  // DuckDB's native ASOF over the same attribution arithmetic (x54's),
  // because as-of against a static right side is chunking-invariant.
  def st33(spark: SparkSession, dir: String): DataFrame =
    Streaming.streamAsOfEnriched(spark, dir, chunks = 4)
      .select(
        when(col("v").isNull, lit(-1L))
          .otherwise(least(expr("(tsu - rtsu) div 60000000"), lit(60L)))
          .as("gap_min"),
        col("v"))
      .groupBy(col("gap_min"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(floor(col("v") * 100).cast("long"), lit(0L)))
          .as("cents"))
      .orderBy(col("gap_min"))

  private val st33Sql = // x54's oracle: the streamed pipeline must equal it
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tsu
      |  FROM events),
      |l AS (SELECT event_id, user_id, tsu FROM e WHERE event_type = 'click'),
      |r AS (SELECT user_id, tsu AS rtsu, MAX(value) AS v
      |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
      |j AS (SELECT l.tsu, r.rtsu, r.v
      |      FROM l ASOF LEFT JOIN r
      |        ON l.user_id = r.user_id AND l.tsu >= r.rtsu)
      |SELECT CASE WHEN v IS NULL THEN -1
      |            ELSE LEAST((tsu - rtsu) // 60000000, 60) END AS gap_min,
      |  COUNT(*) AS n,
      |  CAST(SUM(COALESCE(CAST(floor(v * 100) AS BIGINT), 0)) AS BIGINT)
      |    AS cents
      |FROM j GROUP BY 1 ORDER BY gap_min""".stripMargin

  // ---------------------------------------------------------------------
  // st34_stream_cusum — ONLINE drift detection: per-user one-sided CUSUM
  // (S_t = max(0, S_{t−1} + x_t − k), x scaled 1e6, k = 50.0, alarm at
  // h = 500.0) folded INCREMENTALLY in mapGroupsWithState — the
  // streaming twin of the batch x36 gate and the anomaly-detection
  // class the streaming table lacked. State is six longs per monitored
  // user (prefix sum + clamped prefix min — the closed form — plus the
  // latched alarm counters); the oracle restates the SAME closed form
  // as two window passes (prefix sum, prefix min) — no recursive CTE
  // needed, unlike x36's mean-centered variant. Update-mode emissions
  // carry cumulative counters with strictly-increasing n_events, so
  // the max-n_events row per user is the global answer under any
  // micro-batch slicing (the chunked-replay recovery rule).
  def st34(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Streaming.cusumDrift(spark, dir, kScaled = 50000000L, hScaled = 500000000L)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("user_id"))
  }

  private val st34Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tsu,
      |    CAST(floor(value * 1000000) AS BIGINT) - 50000000 AS d
      |  FROM events),
      |p AS (
      |  SELECT user_id, tsu, event_id,
      |    SUM(d) OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS pt
      |  FROM e),
      |s AS (
      |  SELECT user_id, tsu, event_id, pt,
      |    pt - LEAST(0, MIN(pt) OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |                                ROWS UNBOUNDED PRECEDING)) AS st
      |  FROM p),
      |fin AS (
      |  SELECT user_id, st,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY tsu DESC, event_id DESC) AS rn
      |  FROM s),
      |agg AS (
      |  SELECT user_id, COUNT(*) AS n_events, CAST(MAX(st) AS BIGINT) AS max_s,
      |    CAST(SUM(CASE WHEN st >= 500000000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_alarms,
      |    MIN(CASE WHEN st >= 500000000 THEN tsu END) AS first_alarm_tsu
      |  FROM s GROUP BY user_id)
      |SELECT a.user_id, a.n_events, CAST(f.st AS BIGINT) AS final_s, a.max_s,
      |  a.n_alarms, a.first_alarm_tsu
      |FROM agg a JOIN fin f ON f.user_id = a.user_id AND f.rn = 1
      |ORDER BY a.user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st34_stream_cusum" -> (st34 _),
    "st33_stream_asof" -> (st33 _),
    "st32_stream_neardup" -> (st32 _),
    "st30_chunked_hourly" -> (st30 _),
    "st31_chunked_ssj" -> (st31 _),
    "st27_window_funnel" -> (st27 _),
    "st28_session_enrich" -> (st28 _),
    "st26_rate_limit" -> (st26 _),
    "st25_stream_drift" -> (st25 _),
    "st24_stream_anti" -> (st24 _),
    "st29_stream_hll" -> (st29 _),
    "st23_stream_kmv" -> (st23 _),
    "st22_stream_funnel" -> (st22 _),
    "st21_stream_topk" -> (st21 _),
    "st20_stream_enrich" -> (st20 _),
    "st19_stream_locf" -> (st19 _),
    "st18_stream_wau" -> (st18 _),
    "st16_stream_semi_join" -> (st16 _),
    "st17_window_chain" -> (st17 _),
    "st14_tws_lastn" -> (st14 _),
    "st15_dedup_within_wm" -> (st15 _),
    "st13_lake_merge" -> (st13 _),
    "st10_session_window" -> (st10 _),
    "st9_tws_profiles" -> (st9 _),
    "st8_tws_sessions" -> (st8 _),
    "st1_stream_hourly" -> (st1 _),
    "st2_sessions" -> (st2 _),
    "st3_stream_join" -> (st3 _),
    "st4_stream_stream" -> (st4 _),
    "st5_stateful_sessions" -> (st5 _),
    "st6_session_flows" -> (st6 _),
    "st7_distinct_users" -> (st7 _),
    "st11_stream_outer" -> (st11 _),
    "st12_stream_full_outer" -> (st12 _))

  val oracleSql: Map[String, String] = Map(
    "st34_stream_cusum" -> st34Sql,
    "st33_stream_asof" -> st33Sql,
    "st32_stream_neardup" -> st32Sql,
    "st30_chunked_hourly" -> st30Sql,
    "st31_chunked_ssj" -> st4Sql,
    // the streaming funnel shares x62's batch oracle: same semantics,
    // incremental execution
    "st27_window_funnel" -> CrossQueries.oracleSql("x62_window_funnel"),
    "st28_session_enrich" -> st28Sql,
    "st26_rate_limit" -> st26Sql,
    "st25_stream_drift" -> st25Sql,
    "st24_stream_anti" -> st24Sql,
    "st29_stream_hll" -> st29Sql,
    "st23_stream_kmv" -> st23Sql,
    "st22_stream_funnel" -> st22Sql,
    "st21_stream_topk" -> st21Sql,
    "st20_stream_enrich" -> st20Sql,
    "st19_stream_locf" -> st19Sql,
    "st18_stream_wau" -> st18Sql,
    "st16_stream_semi_join" -> st16Sql,
    "st17_window_chain" -> st17Sql,
    "st14_tws_lastn" -> st14Sql,
    "st15_dedup_within_wm" -> st15Sql,
    "st13_lake_merge" -> st13Sql,
    // TWS formulation shares st6's oracle: same semantics, new API
    "st8_tws_sessions" -> st6Sql,
    "st9_tws_profiles" -> st9Sql,
    "st10_session_window" -> st10Sql,
    "st1_stream_hourly" -> st1Sql,
    "st2_sessions" -> st2Sql,
    "st3_stream_join" -> st3Sql,
    "st4_stream_stream" -> st4Sql,
    "st5_stateful_sessions" -> st2Sql,
    "st6_session_flows" -> st6Sql,
    "st7_distinct_users" -> st7Sql,
    "st11_stream_outer" -> st11Sql,
    "st12_stream_full_outer" -> st12Sql)
}
