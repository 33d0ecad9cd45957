package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
  * Every operator family from SURVEY §2 has a `queries` entry; SQL-
  * expressible ones also have a DuckDB oracle (column names match the
  * Spark output exactly; rows are explicitly ordered on both sides).
  */
object SparkEntry {

  /** Flagship: the full hotdog pipeline (decode → parse → route → per-topic
    * counts) over a deterministically synthesized sequences corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val seqs = graft.hotdog.Corpus.sequences(spark, 20000)
    graft.hotdog.Router.route(seqs, graft.hotdog.Configs.flagship)
      .groupBy("topic").count()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // hotdog operators (SURVEY §2.1-2.5)
    "hd_decode_roundtrip" -> (Queries.hdDecodeRoundtrip _),
    "hd_parse_fields" -> (Queries.hdParseFields _),
    "hd_route_topics" -> (Queries.hdRouteTopics _),
    "hd_route_rows" -> (Queries.hdRouteRows _),
    "hd_stats" -> (Queries.hdStats _),
    "hd_enrich" -> (Queries.hdEnrich _),
    "hd_testmode" -> (Queries.hdTestmode _),
    "hd_route_jmes" -> (Queries.hdRouteJmes _),
    "hd_window" -> (Queries.hdWindow _),
    "hd_state_totals" -> (Queries.hdStateTotals _),
    // generic relational operators
    "q_agg" -> (Queries.qAgg _),
    "q_window" -> (Queries.qWindow _),
    "q_join" -> (Queries.qJoin _),
    "q_json" -> (Queries.qJson _),
    "q_regex" -> (Queries.qRegex _),
    "q_topk" -> (Queries.qTopk _),
    "q_asof" -> (Queries.qAsof _),
    "q_rollup" -> (Queries.qRollup _),
    "q_semi" -> (Queries.qSemi _),
    "ev_sessions" -> (Queries.evSessions _),
    "ev_sessions_stream" -> (Queries.evSessionsStream _),
    "ev_funnel" -> (Queries.evFunnel _),
    "ev_retention" -> (Queries.evRetention _),
    "ev_transitions" -> (Queries.evTransitions _),
    "ev_anomaly" -> (Queries.evAnomaly _),
    "ev_attrib" -> (Queries.evAttrib _),
    "ev_latency" -> (Queries.evLatency _),
    "ev_paths" -> (Queries.evPaths _),
    "ev_dau" -> (Queries.evDau _),
    "ev_sessions_native" -> (Queries.evSessionsNative _),
    "q_pivot" -> (Queries.qPivot _),
    "txt_tfidf" -> (Queries.txtTfidf _),
    // training-data pipeline operators
    "dd_exact" -> (Queries.ddExact _),
    "dd_wordset_jaccard" -> (Queries.ddWordsetJaccard _),
    "dd_minhash" -> (Queries.ddMinhash _),
    "dd_simhash" -> (Queries.ddSimhash _),
    "dd_neardup_dedup" -> (Queries.ddNeardupDedup _),
    "dd_components" -> (Queries.ddComponents _),
    "dd_components_best" -> (Queries.ddComponentsBest _),
    "dd_embed_neardup" -> (Queries.ddEmbedNearDup _),
    "dd_semantic" -> (Queries.ddSemantic _),
    "dd_semantic_kmeans" -> (Queries.ddSemanticKmeans _),
    "sim_cluster_stats" -> (Queries.simClusterStats _),
    "sim_topk" -> (Queries.simTopk _),
    "sim_topk_lsh" -> (Queries.simTopkLsh _),
    "sim_topk_ivf" -> (Queries.simTopkIvf _),
    "mm_features" -> (Queries.mmFeatures _),
    "txt_quality" -> (Queries.txtQuality _),
    "txt_langid" -> (Queries.txtLangid _),
    "txt_fingerprint" -> (Queries.txtFingerprint _),
    "txt_repetition" -> (Queries.txtRepetition _),
    "txt_rolling" -> (Queries.txtRolling _),
    "pipe_clean" -> (Queries.pipeClean _),
    "dd_stream_dedup" -> (Queries.ddStreamDedup _),
    "pipe_pack" -> (Queries.pipePack _),
    "pipe_sample" -> (Queries.pipeSample _),
    "dd_contam" -> (Queries.ddContam _),
    "dd_span" -> (Queries.ddSpan _),
    "txt_vocab" -> (Queries.txtVocab _),
    "txt_oov" -> (Queries.txtOov _),
    "tok_ngrams" -> (Queries.tokNgrams _),
    "tok_bpe" -> (Queries.tokBpe _),
    "tok_bpe_apply" -> (Queries.tokBpeApply _),
    "tok_span_dup" -> (Queries.tokSpanDup _),
    "tok_contam" -> (Queries.tokContam _),
    "tok_scrub" -> (Queries.tokScrub _),
    "txt_redact" -> (Queries.txtRedact _),
    "dd_lines" -> (Queries.ddLines _),
    "dd_incr_near" -> (Queries.ddIncrNear _),
    "txt_lm_ppl" -> (Queries.txtLmPpl _),
    "pipe_shuffle" -> (Queries.pipeShuffle _),
    "pipe_interleave" -> (Queries.pipeInterleave _),
    "pipe_epochs" -> (Queries.pipeEpochs _),
    "pipe_tok_budget" -> (Queries.pipeTokBudget _),
    "ev_scd2" -> (Queries.evScd2 _),
    "ev_state_at" -> (Queries.evStateAt _),
    "ev_alerts" -> (Queries.evAlerts _),
    "ev_collapse" -> (Queries.evCollapse _),
    "sim_kmeans" -> (Queries.simKmeans _),
    "dd_incremental" -> (Queries.ddIncremental _),
    "txt_classify" -> (Queries.txtClassify _),
    "pipe_dsir" -> (Queries.pipeDsir _),
    "txt_entropy" -> (Queries.txtEntropy _),
    "tok_entropy" -> (Queries.tokEntropy _),
    "txt_srcdiv" -> (Queries.txtSrcdiv _),
    "pipe_pack_fold" -> (Queries.pipePackFold _),
    "pipe_pack_manifest" -> (Queries.pipePackManifest _),
    "pipe_pack_emit" -> (Queries.pipePackEmit _),
    "tok_scrub_clean" -> (Queries.tokScrubClean _),
    "txt_gopher" -> (Queries.txtGopher _),
    "txt_lenq" -> (Queries.txtLenq _),
    "txt_bm25" -> (Queries.txtBm25 _),
    "txt_chunks" -> (Queries.txtChunks _),
    "pipe_split" -> (Queries.pipeSplit _),
    "pipe_stratified" -> (Queries.pipeStratified _),
    "ev_uniq_kmv" -> (Queries.evUniqKmv _),
    "ev_heavy_cms" -> (Queries.evHeavyCms _),
    "ev_pagerank" -> (Queries.evPagerank _),
    "ev_value_bands" -> (Queries.evValueBands _),
    "pipe_batch" -> (Queries.pipeBatch _),
    "txt_index" -> (Queries.txtIndex _),
    "dd_src_overlap" -> (Queries.ddSrcOverlap _),
    "ev_props_profile" -> (Queries.evPropsProfile _),
    "ev_templates" -> (Queries.evTemplates _),
    "ev_stream_join" -> (Queries.evStreamJoin _),
    "ev_rate_limit" -> (Queries.evRateLimit _),
    "pipe_upsert" -> (Queries.pipeUpsert _),
    "pipe_snapshot_diff" -> (Queries.pipeSnapshotDiff _))

  // ---- shared fragments reused inside the oracle SQL (DuckDB dialect) ----
  private val msgE = Queries.msgExpr
  private val lineE = Queries.lineExpr
  private val topicE = Queries.topicExpr
  private val hostE = Queries.hostExpr
  private val normE =
    "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
  private val sevList =
    "['emerg','alert','crit','err','warning','notice','info','debug']"
  private val facList =
    "['kern','user','mail','daemon','auth','syslog','lpr','news','uucp','cron','authpriv','ftp','ntp','audit','alert','clockd','local0','local1','local2','local3','local4','local5','local6','local7']"

  /** expected routed output string, recomputed in pure SQL (for hd_route_rows) */
  private val outputE: String =
    s"""CASE event_type
       |  WHEN 'error' THEN NULL
       |  WHEN 'signup' THEN 'This is the total message: hello user' || user_id || ' &lt;signup&gt;' || chr(10) || chr(10) || 'And the name is: user' || user_id || chr(10)
       |  WHEN 'purchase' THEN '{"k":' || event_id || ',"meta":{"hotdog":{"timestamp":"${Queries.FixedIso}","version":"0.5.1"},"topic":"t' || (user_id % 3) || '"}}'
       |  ELSE $msgE
       |END""".stripMargin

  /** DuckDB replica of OpsKernels.planeMatrix's weight bit: murmur3 fmix32
    * of (p·65537 + i + 1), bit 13. Expanded inline (DuckDB lambdas cannot
    * bind intermediates); all arithmetic mod 2^32 in UBIGINT — the largest
    * intermediate, 0xffffffff·0xc2b2ae35 ≈ 1.47e19, fits UBIGINT. */
  private val planeBitSql: String = {
    val k0 = "((p*65537 + i + 1)::UBIGINT)"
    val a  = s"xor($k0, $k0 >> 16)"
    val b  = s"((($a) * 2246822507::UBIGINT) % 4294967296::UBIGINT)"
    val c  = s"xor($b, $b >> 13)"
    val d  = s"((($c) * 3266489909::UBIGINT) % 4294967296::UBIGINT)"
    val e  = s"xor($d, $d >> 16)"
    s"((($e) >> 13) & 1)"
  }

  def oracleSql: Map[String, String] = Map(
    "hd_decode_roundtrip" ->
      "SELECT doc_id, text AS line FROM documents ORDER BY doc_id",

    "hd_parse_fields" ->
      s"""SELECT event_id,
         |  event_type <> 'error' AS parse_ok,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE $msgE END AS msg,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE list_extract($sevList, (event_id % 192) % 8 + 1) END AS severity,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE list_extract($facList, (event_id % 192) // 8 + 1) END AS facility,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE $hostE END AS hostname,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE 'app-' || (user_id % 10) END AS appname
         |FROM events ORDER BY event_id""".stripMargin,

    "hd_route_topics" ->
      s"""SELECT topic, count(*)::BIGINT AS n
         |FROM (SELECT $topicE AS topic FROM events) t
         |GROUP BY topic ORDER BY topic NULLS FIRST""".stripMargin,

    "hd_route_rows" ->
      s"""SELECT event_id, $topicE AS topic, $outputE AS output
         |FROM events ORDER BY event_id""".stripMargin,

    "hd_stats" ->
      s"""WITH t AS (SELECT $topicE AS topic FROM events)
         |SELECT metric, value FROM (
         |  SELECT 'kafka.submitted.' || topic AS metric, count(*)::BIGINT AS value FROM t WHERE topic IS NOT NULL GROUP BY topic
         |  UNION ALL SELECT 'kafka.submitted', count(*)::BIGINT FROM t WHERE topic IS NOT NULL
         |  UNION ALL SELECT 'lines', count(*)::BIGINT FROM events WHERE event_type <> 'error'
         |  UNION ALL SELECT 'error.log_parse', count(*)::BIGINT FROM events WHERE event_type = 'error'
         |  UNION ALL SELECT 'error.merge_of_invalid_json', 0::BIGINT
         |  UNION ALL SELECT 'error.merge_target_not_json', 0::BIGINT
         |  UNION ALL SELECT 'connections', 0::BIGINT
         |  UNION ALL SELECT 'error.full_internal_queue', 0::BIGINT
         |  UNION ALL SELECT 'error.internal_push_failed', 0::BIGINT
         |  UNION ALL SELECT 'error.topic_parse_failed', 0::BIGINT
         |  UNION ALL SELECT 'kafka.producer.sent', 0::BIGINT
         |) ORDER BY metric""".stripMargin,

    "hd_enrich" ->
      s"""SELECT topic, n_name, count(*)::BIGINT AS n
         |FROM (SELECT $topicE AS topic, event_id % 25 AS nkey FROM events) t
         |JOIN nation ON nkey = n_nationkey
         |WHERE topic IS NOT NULL
         |GROUP BY topic, n_name ORDER BY topic, n_name""".stripMargin,

    // full-JMESPath routing: filter+pipe / slice / max_by matchers replayed
    // as CASE logic; output = the untouched forwarded msg
    "hd_route_jmes" ->
      s"""SELECT event_id, ${Queries.jmesTopicExpr} AS topic,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE ${Queries.jmesMsgExpr} END AS output
         |FROM events ORDER BY event_id""".stripMargin,

    "hd_testmode" ->
      """SELECT doc_id + 1 AS line_no,
        |  CASE WHEN doc_id % 7 = 0
        |    THEN 'Regex: ^hello\s+(?P<name>\w+)?|Regex: .*'
        |    ELSE 'Regex: .*' END AS matches
        |FROM documents ORDER BY line_no""".stripMargin,

    // the final mapGroupsWithState cumulative total per topic must equal
    // the batch per-topic count — multi-batch state accumulation verified
    "hd_state_totals" ->
      s"""SELECT topic, count(*)::BIGINT AS n
         |FROM (SELECT $topicE AS topic FROM events) t
         |WHERE topic IS NOT NULL
         |GROUP BY topic ORDER BY topic""".stripMargin,

    // append-mode watermark cutoff: a window emits only once the watermark
    // (max event_time − 10 min) passes its END — the trailing window is
    // withheld by the streaming job AND excluded here, symmetrically
    "hd_window" ->
      s"""WITH t AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, $topicE AS topic FROM events),
         |wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
         |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, topic,
         |  count(*)::BIGINT AS n
         |FROM t, wm
         |WHERE topic IS NOT NULL AND ws + INTERVAL 1 HOUR <= w
         |GROUP BY ws, topic ORDER BY 1, 2""".stripMargin,

    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_c,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_price_c,
        |  count(*)::BIGINT AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)::INT AS rn,
        |  sum(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_value_c
        |FROM events ORDER BY event_id""".stripMargin,

    "q_join" ->
      """SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_json" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_regex" ->
      """SELECT lang, count(*)::BIGINT AS n FROM documents
        |WHERE regexp_matches(text, 'vector|stream.*join')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_topk" ->
      """SELECT user_id, count(*)::BIGINT AS n FROM events
        |GROUP BY 1 ORDER BY n DESC, user_id ASC LIMIT 5""".stripMargin,

    "q_asof" ->
      """WITH p AS (
        |  SELECT user_id, ts, max(event_id) AS last_purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT e.event_id, p.last_purchase_id
        |FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  (grouping(l_returnflag)*2 + grouping(l_linestatus))::BIGINT AS gid,
        |  count(*)::BIGINT AS n,
        |  sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS qty_c
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_semi" ->
      """SELECT count(*)::BIGINT AS n_unfilled,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS unfilled_c
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,

    // per-doc top-5 tf-idf keywords: smoothed idf, integer-floored score
    // ranks with term tiebreak (k=5 < per-doc vocab — boundary load-bearing)
    "txt_tfidf" ->
      s"""WITH base AS (SELECT doc_id, string_split($normE, ' ') AS ws
         |  FROM documents),
         |stats AS (SELECT count(*)::BIGINT AS n_docs FROM base),
         |m AS (SELECT doc_id, unnest(ws) AS term FROM base),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM m
         |  WHERE len(term) > 0 GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         |    CAST(floor(tf.tf * (ln((stats.n_docs + 1.0) / (dfq.df + 1.0)) + 1.0)
         |      * 1000000.0) AS BIGINT) AS score_e6
         |  FROM tf JOIN dfq USING (term) CROSS JOIN stats),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score_e6 DESC, term ASC) AS rank FROM s)
         |SELECT doc_id, rank::INT AS rank, term, tf, df, score_e6
         |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    // cohort retention: users cohorted by first-seen day; distinct users
    // active k days after it
    "ev_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (
        |  SELECT user_id, min(d) AS cohort FROM e GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT f.cohort, date_diff('day', f.cohort, e.d) AS day_k,
        |    e.user_id
        |  FROM e JOIN f ON e.user_id = f.user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        |  day_k::BIGINT AS day_k, count(*)::BIGINT AS n_users
        |FROM a GROUP BY cohort, day_k ORDER BY 1, 2""".stripMargin,

    // ordered funnel view → click → purchase: step k strictly after the
    // RUNNING earliest completion of step k-1 (evaluated at each row),
    // then per-user earliest qualifying times
    "ev_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
        |  FROM events
        |  UNION ALL
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
        |  FROM (VALUES
        |    (9000001, 1000001, 'click',    TIMESTAMP '2024-01-01 00:00:10'),
        |    (9000002, 1000001, 'view',     TIMESTAMP '2024-01-01 00:00:20'),
        |    (9000003, 1000002, 'view',     TIMESTAMP '2024-01-01 00:00:10'),
        |    (9000004, 1000002, 'purchase', TIMESTAMP '2024-01-01 00:00:15'),
        |    (9000005, 1000002, 'click',    TIMESTAMP '2024-01-01 00:00:20'),
        |    (9000006, 1000003, 'error',    TIMESTAMP '2024-01-01 00:00:10'),
        |    (9000007, 1000004, 'view',     TIMESTAMP '2024-01-01 00:00:10'),
        |    (9000008, 1000004, 'click',    TIMESTAMP '2024-01-01 00:00:10'),
        |    (9000009, 1000004, 'purchase', TIMESTAMP '2024-01-01 00:00:30')
        |  ) AS v(event_id, user_id, event_type, ts)),
        |s1 AS (
        |  SELECT *, CASE WHEN event_type = 'view' THEN tus END AS q0 FROM e),
        |s2 AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND min(q0) OVER w IS NOT NULL
        |      AND tus > min(q0) OVER w THEN tus END AS q1
        |  FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s3 AS (
        |  SELECT *, CASE WHEN event_type = 'purchase' AND min(q1) OVER w IS NOT NULL
        |      AND tus > min(q1) OVER w THEN tus END AS q2
        |  FROM s2 WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g AS (
        |  SELECT user_id, min(q0)::BIGINT AS t1_us, min(q1)::BIGINT AS t2_us,
        |    min(q2)::BIGINT AS t3_us
        |  FROM s3 GROUP BY 1)
        |SELECT user_id, t1_us, t2_us, t3_us,
        |  (CASE WHEN t3_us IS NOT NULL THEN 3 WHEN t2_us IS NOT NULL THEN 2
        |        WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS stage
        |FROM g ORDER BY user_id""".stripMargin,

    // gap sessionization (6 h = 21600000000 µs): the naive window replay
    "ev_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |      OR tus - lag(tus) OVER w > 21600000000 THEN 1 ELSE 0 END AS is_start
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (
        |  SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq, count(*)::BIGINT AS n_events,
        |  min(tus)::BIGINT AS t_start_us, max(tus)::BIGINT AS t_end_us,
        |  (max(tus) - min(tus))::BIGINT AS dur_us, sum(vc)::BIGINT AS value_c
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin,

    // streaming sessions: every DATA-closed session (a later event of the
    // same user proves the > gap boundary) plus each user's final session
    // iff the final watermark (max event time − 1 h, ms grain) passed its
    // close horizon (end + gap) — the withheld-tail contract of
    // Sessionize.streamSessions under Trigger.AvailableNow
    "ev_sessions_stream" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |      OR tus - lag(tus) OVER w > 21600000000 THEN 1 ELSE 0 END AS is_start
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
        |s AS (
        |  SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY tus
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM m),
        |g AS (
        |  SELECT user_id, sess, min(tus) AS t_start_us, max(tus) AS t_end_us,
        |    count(*)::BIGINT AS n_events, sum(vc)::BIGINT AS value_c,
        |    max(sess) OVER (PARTITION BY user_id) AS last_sess
        |  FROM s GROUP BY user_id, sess),
        |wm AS (SELECT max(tus) // 1000 - 3600000 AS w FROM e)
        |SELECT user_id, t_start_us::BIGINT AS t_start_us,
        |  t_end_us::BIGINT AS t_end_us, n_events, value_c
        |FROM g, wm
        |WHERE sess < last_sess OR (t_end_us // 1000) + 21600000 < w
        |ORDER BY user_id, t_start_us""".stripMargin,

    // Markov transitions: identical (ts, id)-ordered lag adjacency +
    // integer-ppm probability arithmetic
    "ev_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    event_type FROM events),
        |p AS (SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id) AS prev_type FROM e),
        |c AS (SELECT prev_type, event_type, count(*)::BIGINT AS n_pairs
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n_pairs,
        |  (sum(n_pairs) OVER (PARTITION BY prev_type))::BIGINT AS n_from,
        |  (n_pairs * 1000000) //
        |    (sum(n_pairs) OVER (PARTITION BY prev_type))::BIGINT AS p_ppm
        |FROM c ORDER BY prev_type, event_type""".stripMargin,

    // rate anomaly: identical (type, hour) counts, trailing-24h RANGE
    // sum, integer spike comparison, per-type 24h warmup exclusion
    "ev_anomaly" ->
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT *,
        |    coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY hour_id
        |      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS trail_n,
        |    min(hour_id) OVER (PARTITION BY event_type) AS first_h
        |  FROM c)
        |SELECT event_type, hour_id, n, trail_n,
        |  (CASE WHEN n * 24 > trail_n * 3 THEN 1 ELSE 0 END)::BIGINT AS is_spike
        |FROM w WHERE hour_id >= first_h + 24
        |ORDER BY event_type, hour_id""".stripMargin,

    // last-touch attribution: for each purchase, the latest strictly-
    // preceding view/click of the same user within 6 h (the correlated
    // subquery replays the running-max-struct semantics exactly)
    "ev_attrib" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |pick AS (
        |  SELECT c.vc, c.tus,
        |    (SELECT struct_pack(y := t.event_type, t := t.tus) FROM e t
        |     WHERE t.user_id = c.user_id
        |       AND t.event_type IN ('view', 'click')
        |       AND (t.tus < c.tus OR (t.tus = c.tus AND t.event_id < c.event_id))
        |       AND c.tus - t.tus <= 21600000000
        |     ORDER BY t.tus DESC, t.event_id DESC LIMIT 1) AS lt
        |  FROM e c WHERE c.event_type = 'purchase')
        |SELECT coalesce(lt.y, 'none') AS touch_type,
        |  count(*)::BIGINT AS n_conv, sum(vc)::BIGINT AS revenue_c,
        |  sum(CASE WHEN lt.y IS NULL THEN 0 ELSE tus - lt.t END)::BIGINT
        |    AS lag_us_sum
        |FROM pick GROUP BY 1 ORDER BY touch_type""".stripMargin,

    // session entry paths: identical gap sessionization (tie-broken by
    // event_id like ev_sessions), first-3 selection + '>' join replayed
    // with row_number + ORDER BY-ed string_agg
    "ev_paths" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    event_type FROM events),
        |m AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |      OR tus - lag(tus) OVER w > 21600000000 THEN 1 ELSE 0 END AS is_start
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT *, sum(is_start) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM m),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess
        |    ORDER BY tus, event_id) AS rk FROM s),
        |p AS (SELECT user_id, sess,
        |    string_agg(event_type, '>' ORDER BY rk) AS path
        |  FROM r WHERE rk <= 3 GROUP BY user_id, sess)
        |SELECT path, count(*)::BIGINT AS n_sessions
        |FROM p GROUP BY path ORDER BY path""".stripMargin,

    // native session_window replay: same > gap split rule as
    // ev_sessions (session_window windows are end-INCLUSIVE — an event
    // AT last+gap extends the session; pinned in SessionizeSpec on an
    // exact-gap fixture), window end reported as last + gap
    "ev_sessions_native" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus,
        |    CAST(round(value * 100) AS BIGINT) AS vc FROM events),
        |m AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |      OR tus - lag(tus) OVER w > 21600000000 THEN 1 ELSE 0 END AS is_start
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
        |s AS (SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY tus
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM m)
        |SELECT user_id, min(tus)::BIGINT AS w_start_us,
        |  (max(tus) + 21600000000)::BIGINT AS w_end_us,
        |  count(*)::BIGINT AS n_events, sum(vc)::BIGINT AS value_c
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, w_start_us""".stripMargin,

    // DAU + calendar-month MAU stickiness: identical distinct frames +
    // integer-ppm arithmetic
    "ev_dau" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
        |  FROM events),
        |dau AS (SELECT d, count(*)::BIGINT AS dau FROM du GROUP BY d),
        |mau AS (SELECT date_trunc('month', d) AS m, count(DISTINCT user_id)::BIGINT AS mau
        |  FROM du GROUP BY 1)
        |SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, mau.mau,
        |  (dau.dau * 1000000) // mau.mau AS stickiness_ppm
        |FROM dau JOIN mau ON date_trunc('month', dau.d) = mau.m
        |ORDER BY day""".stripMargin,

    // pivoted per-day event-type counts (static column list, 0-filled)
    "q_pivot" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  count(*) FILTER (event_type = 'click')::BIGINT AS click,
        |  count(*) FILTER (event_type = 'error')::BIGINT AS error,
        |  count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
        |  count(*) FILTER (event_type = 'signup')::BIGINT AS signup,
        |  count(*) FILTER (event_type = 'view')::BIGINT AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    // schema-drift profile: same constructed payloads (shared fragment),
    // key set via json_keys guarded by json_valid + root-object check,
    // DuckDB's json_type vocabulary mapped onto {object,array,string,
    // number,boolean,null} (a present key holding JSON null probes as
    // SQL NULL → coalesce to 'null')
    "ev_props_profile" ->
      s"""WITH p AS (SELECT event_type, ${Queries.propsExpr} AS pj FROM events),
         |f AS (SELECT event_type, pj,
         |    CASE WHEN json_valid(pj) AND json_type(pj) = 'OBJECT'
         |         THEN json_keys(pj) ELSE ['_malformed'] END AS ks
         |  FROM p),
         |e AS (SELECT event_type, u.k AS key,
         |    CASE WHEN u.k = '_malformed' THEN '-'
         |         ELSE CASE coalesce(json_type(pj, '$$.' || u.k), 'null')
         |           WHEN 'VARCHAR' THEN 'string'
         |           WHEN 'BOOLEAN' THEN 'boolean'
         |           WHEN 'ARRAY' THEN 'array'
         |           WHEN 'OBJECT' THEN 'object'
         |           WHEN 'null' THEN 'null'
         |           WHEN 'NULL' THEN 'null'
         |           ELSE 'number' END
         |    END AS vtype
         |  FROM f, UNNEST(ks) AS u(k))
         |SELECT event_type, key, vtype, count(*)::BIGINT AS n
         |FROM e GROUP BY 1, 2, 3
         |ORDER BY event_type, key, vtype""".stripMargin,

    // stream-stream interval join: the oracle is the batch interval join
    // the streaming inner join must reproduce pair-for-pair (strict upper
    // bound, inclusive 24h lower bound, exact µs lags)
    "ev_stream_join" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS pt
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS touch_id, ts AS tt
        |  FROM events WHERE event_type IN ('click', 'view'))
        |SELECT purchase_id, touch_id,
        |  (epoch_us(pt) - epoch_us(tt))::BIGINT AS lag_us
        |FROM p JOIN t USING (user_id)
        |WHERE tt < pt AND tt >= pt - INTERVAL 24 HOUR
        |ORDER BY purchase_id, touch_id""".stripMargin,

    // Drain-style template mining: same constructed messages (shared
    // fragment); cluster key = (token count, first token), a position is
    // wildcard iff min(tok) ≠ max(tok) over the cluster, template
    // reassembled in position order, n_msgs = the position-1 count
    "ev_templates" ->
      s"""WITH t AS (SELECT ${Queries.tmplMsgExpr} AS msg FROM events),
         |s AS (SELECT string_split(msg, ' ') AS ls FROM t),
         |e AS (SELECT len(ls) AS n, ls[1] AS tok0, u.p.pos AS pos, u.p.tok AS tok
         |  FROM s, UNNEST(list_transform(generate_series(1, len(ls)),
         |    i -> struct_pack(pos := i, tok := ls[i]))) AS u(p)),
         |a AS (SELECT n, tok0, pos, min(tok) AS lo, max(tok) AS hi,
         |    count(*) AS cnt
         |  FROM e GROUP BY 1, 2, 3)
         |SELECT
         |  string_agg(CASE WHEN lo = hi THEN lo ELSE '<*>' END, ' '
         |    ORDER BY pos) AS template,
         |  max(CASE WHEN pos = 1 THEN cnt END)::BIGINT AS n_msgs
         |FROM a GROUP BY n, tok0
         |ORDER BY template""".stripMargin,

    // KMV bottom-64 distinct sketch: identical 60-bit md5 hash, per-type
    // bottom-64 selection, and the two-IEEE-op estimate (63·2^60 / kth —
    // the product is exactly representable, the division exact-rounded,
    // so floor() agrees bit-for-bit across engines)
    // PageRank replay: all 3 integer power-iteration rounds
    "ev_pagerank" -> pageRankOracleSql(iters = 3),

    // cross-source overlap replay: distinct (source, shingle) slots,
    // pair join on the shared gram, integer containment
    "dd_src_overlap" ->
      s"""WITH w AS (SELECT source, $normE AS norm,
         |    string_split($normE, ' ') AS ws FROM documents),
         |sh AS (SELECT source, ${shingleListE(8)} AS sh FROM w),
         |d AS (SELECT DISTINCT source AS src, unnest(sh) AS gram FROM sh),
         |ps AS (SELECT src, count(*)::BIGINT AS n_grams FROM d GROUP BY 1),
         |pr AS (SELECT a.src AS src_a, b.src AS src_b, count(*)::BIGINT AS n_shared
         |  FROM d a JOIN d b ON a.gram = b.gram AND a.src < b.src
         |  GROUP BY 1, 2)
         |SELECT pr.src_a, pr.src_b, pr.n_shared,
         |  pa.n_grams AS n_a, pb.n_grams AS n_b,
         |  (pr.n_shared * 1000000 // least(pa.n_grams, pb.n_grams))::BIGINT AS containment_ppm
         |FROM pr JOIN ps pa ON pa.src = pr.src_a
         |  JOIN ps pb ON pb.src = pr.src_b
         |ORDER BY 1, 2""".stripMargin,

    // inverted-index replay: same tokenizer, postings rebuilt with
    // ORDER BY doc_id lists per (term, 100-doc shard)
    "txt_index" ->
      s"""WITH w AS (SELECT doc_id, unnest(string_split($normE, ' ')) AS term
         |  FROM documents),
         |t AS (SELECT term, doc_id, count(*)::BIGINT AS tf
         |  FROM w WHERE term <> '' GROUP BY 1, 2)
         |SELECT term, (doc_id // 100)::BIGINT AS shard,
         |  count(*)::BIGINT AS n_docs, sum(tf)::BIGINT AS n_occ,
         |  list(doc_id ORDER BY doc_id) AS doc_ids,
         |  list(tf ORDER BY doc_id) AS tfs
         |FROM t GROUP BY 1, 2 ORDER BY term, shard""".stripMargin,

    // length-bucketed batching replay: naive per-bucket window rank
    // under the (salt, id) scramble order — salt = Sketches.scramble32
    // (murmur3 fmix32 finalizer) mod 256, replayed here in plain BIGINT
    // arithmetic (every intermediate ≤ 2^48: 32×32 multiplies split
    // into 16-bit limbs exactly as the Spark side computes them);
    // constant capacity max(1, budget // padded_len)
    "pipe_batch" ->
      """WITH b0 AS (SELECT doc_id, n_chars::BIGINT AS n_tok,
        |    ((greatest(n_chars, 1) + 63) // 64 * 64)::BIGINT AS padded_len,
        |    (xor(doc_id::BIGINT, doc_id::BIGINT >> 32) % 4294967296) AS s0
        |  FROM documents),
        |b1 AS (SELECT *, xor(s0, s0 >> 16) AS s1 FROM b0),
        |b2 AS (SELECT *, ((((s1 >> 16) * 2246822507) % 65536) * 65536 + (s1 % 65536) * 2246822507) % 4294967296 AS s2 FROM b1),
        |b3 AS (SELECT *, xor(s2, s2 >> 13) AS s3 FROM b2),
        |b4 AS (SELECT *, ((((s3 >> 16) * 3266489909) % 65536) * 65536 + (s3 % 65536) * 3266489909) % 4294967296 AS s4 FROM b3),
        |b AS (SELECT doc_id, n_tok, padded_len, xor(s4, s4 >> 16) % 256 AS salt FROM b4),
        |r AS (SELECT *, (row_number() OVER (PARTITION BY padded_len ORDER BY salt, doc_id) - 1)::BIGINT AS rk FROM b),
        |a AS (SELECT *, (rk // greatest(1, 1024 // padded_len))::BIGINT AS batch_idx FROM r)
        |SELECT padded_len, batch_idx, count(*)::BIGINT AS n_seqs,
        |  sum(n_tok)::BIGINT AS n_tok_real,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |  (count(*) * padded_len)::BIGINT AS n_tok_padded,
        |  (count(*) * padded_len - sum(n_tok))::BIGINT AS waste
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // range join replay: the naive interval predicate the binary-search
    // kernel replaces; non-overlap makes the left join at-most-one
    "ev_value_bands" ->
      """WITH dim(lo, hi, band) AS (VALUES
        |  (0.0, 10.0, 'fast'), (10.0, 30.0, 'ok'), (30.0, 75.0, 'slow'),
        |  (90.0, 150.0, 'very_slow'), (150.0, 400.0, 'critical'),
        |  (450.0, 1000.0, 'extreme'))
        |SELECT e.event_id::BIGINT AS event_id, e.value AS value, d.band AS band
        |FROM events e LEFT JOIN dim d ON e.value >= d.lo AND e.value < d.hi
        |ORDER BY 1""".stripMargin,

    // Count-Min replay: counters from the corpus with the row-salted
    // md5 hash, estimate = min over rows of the probed counter; both
    // sides integer, pmod and % agree on non-negative hashes
    "ev_heavy_cms" ->
      """WITH ky AS (SELECT user_id::VARCHAR AS user_id,
        |    count(*)::BIGINT AS n_exact FROM events GROUP BY 1),
        |c AS (SELECT u.j AS j,
        |    ('0x' || substr(md5(u.j::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::BIGINT % 8 AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM events, UNNEST(generate_series(0, 3)) AS u(j)
        |  GROUP BY 1, 2),
        |kb AS (SELECT k.user_id, k.n_exact, u.j AS j,
        |    ('0x' || substr(md5(u.j::VARCHAR || ':' || k.user_id), 1, 15))::BIGINT % 8 AS bucket
        |  FROM ky k, UNNEST(generate_series(0, 3)) AS u(j)),
        |e AS (SELECT kb.user_id, kb.n_exact,
        |    min(coalesce(c.cnt, 0))::BIGINT AS n_est
        |  FROM kb LEFT JOIN c USING (j, bucket) GROUP BY 1, 2)
        |SELECT user_id, n_exact, n_est,
        |  (n_est - n_exact)::BIGINT AS overcount
        |FROM e ORDER BY user_id""".stripMargin,

    "ev_uniq_kmv" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
        |  FROM events),
        |r AS (SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk
        |  FROM h),
        |m AS (SELECT event_type, count(*)::BIGINT AS uniques_exact,
        |    max(hv) FILTER (rk <= 64) AS kth,
        |    count(*) FILTER (rk <= 64) AS n_in
        |  FROM r GROUP BY 1),
        |t AS (SELECT event_type, count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1)
        |SELECT t.event_type, t.n_events, m.uniques_exact,
        |  CASE WHEN m.n_in < 64 THEN m.uniques_exact
        |       ELSE CAST(floor(63.0 * 1152921504606846976.0 / kth) AS BIGINT)
        |  END AS uniques_est
        |FROM t JOIN m USING (event_type) ORDER BY event_type""".stripMargin,

    // per-(user, hour) quota 1: the naive window replay of the salted
    // two-phase rank (equal because the (ts, id) order is total)
    "ev_rate_limit" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
        |    epoch_us(ts) // 3600000000 AS win FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, win
        |    ORDER BY tus, event_id) AS rk FROM e)
        |SELECT event_type, count(*)::BIGINT AS n_total,
        |  count(*) FILTER (rk <= 1)::BIGINT AS n_kept,
        |  (count(*) - count(*) FILTER (rk <= 1))::BIGINT AS n_dropped
        |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin,

    // CDC latest-wins merge: same synthetic change batch, winner = the
    // highest version per key, deletes filtered after the argmax
    "pipe_upsert" ->
      """WITH base AS (SELECT doc_id, 0::BIGINT AS version, 'upsert' AS op,
        |    text, source FROM documents),
        |up AS (SELECT doc_id, 1::BIGINT, 'upsert', text || ' [rev2]', source
        |  FROM documents WHERE doc_id % 7 = 0),
        |del AS (SELECT doc_id, 2::BIGINT, 'delete', NULL, NULL
        |  FROM documents WHERE doc_id % 11 = 0),
        |ins AS (SELECT doc_id + 1000000, 1::BIGINT, 'upsert',
        |    'new doc ' || doc_id, 'cdc'
        |  FROM documents WHERE doc_id % 13 = 0),
        |al AS (SELECT * FROM base UNION ALL SELECT * FROM up
        |  UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins),
        |w AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY version DESC) AS rn FROM al)
        |SELECT doc_id, version, md5(text) AS payload_md5, source
        |FROM w WHERE rn = 1 AND op <> 'delete' ORDER BY doc_id""".stripMargin,

    // snapshot diff: same synthetic after-snapshot, statuses via the
    // full outer join the aggregate form replaces
    "pipe_snapshot_diff" ->
      """WITH bf AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |af AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 17 <> 3
        |  UNION ALL
        |  SELECT doc_id + 2000000, md5('added doc ' || doc_id)
        |  FROM documents WHERE doc_id % 19 = 0)
        |SELECT coalesce(bf.doc_id, af.doc_id) AS doc_id,
        |  CASE WHEN bf.doc_id IS NULL THEN 'added'
        |       WHEN af.doc_id IS NULL THEN 'removed'
        |       WHEN bf.fp = af.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM bf FULL JOIN af ON bf.doc_id = af.doc_id
        |ORDER BY doc_id""".stripMargin,

    // exact discrete percentiles over the integer-cents vocabulary:
    // smallest value whose cumulative count reaches ceil(p*n/100)
    "ev_latency" ->
      """WITH c AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT *,
        |    (sum(cnt) OVER (PARTITION BY event_type ORDER BY vc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum,
        |    (sum(cnt) OVER (PARTITION BY event_type))::BIGINT AS n
        |  FROM c)
        |SELECT event_type, max(n)::BIGINT AS n,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN vc END)::BIGINT AS p50_c,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN vc END)::BIGINT AS p90_c,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN vc END)::BIGINT AS p99_c
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,

    "dd_exact" ->
      s"""SELECT md5($normE) AS text_hash, min(doc_id) AS keep_id,
         |  count(*)::BIGINT AS n_dupes
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // exact all-pairs answer — equality with the Spark LSH output proves
    // BOTH soundness (every pair re-verified) and recall (none missed)
    "dd_wordset_jaccard" ->
      s"""WITH base AS (
         |  SELECT source AS g, doc_id AS id,
         |    list_distinct(string_split($normE, ' ')) AS sh
         |  FROM documents)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(floor(100.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) AS jaccard_pct
         |FROM base a JOIN base b ON a.g = b.g AND a.id < b.id
         |WHERE CAST(floor(100.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) >= 60
         |ORDER BY id_a, id_b""".stripMargin,

    // exact all-pairs 3-gram-shingle jaccard (soundness + recall oracle
    // for the minhash-LSH path; LSH miss prob < 1e-7 at the dupe
    // similarities in this corpus — verified equal on the sf slice)
    "dd_minhash" ->
      s"""WITH w AS (SELECT doc_id AS id, $normE AS norm,
         |    string_split($normE, ' ') AS ws FROM documents),
         |base AS (SELECT id, list_distinct(
         |    CASE WHEN len(ws) < 3 THEN [norm]
         |         ELSE list_transform(range(0, len(ws) - 2),
         |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS sh
         |  FROM w)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(floor(100.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) AS jaccard_pct
         |FROM base a JOIN base b ON a.id < b.id
         |WHERE CAST(floor(100.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) >= 60
         |ORDER BY id_a, id_b""".stripMargin,

    // exact-dedup → near-dup composition: every doc doubled as a synthetic
    // exact copy (id + 1e6), deduped keeping the min id per md5(norm), then
    // exact all-pairs 3-gram jaccard among the representatives — a copy
    // surviving the dedupe would pair at jaccard 100 and fail the compare
    "dd_neardup_dedup" ->
      s"""WITH alldocs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
         |w AS (SELECT doc_id AS id, $normE AS norm,
         |    string_split($normE, ' ') AS ws FROM alldocs
         |  QUALIFY row_number() OVER (PARTITION BY md5($normE) ORDER BY doc_id) = 1),
         |base AS (SELECT id, list_distinct(
         |    CASE WHEN len(ws) < 3 THEN [norm]
         |         ELSE list_transform(range(0, len(ws) - 2),
         |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS sh
         |  FROM w)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(floor(100.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) AS jaccard_pct
         |FROM base a JOIN base b ON a.id < b.id
         |WHERE CAST(floor(100.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) >= 60
         |ORDER BY id_a, id_b""".stripMargin,

    // pairs → keep/drop verdict: recursive-CTE transitive closure over the
    // exact all-pairs 3-gram near-dup graph (the dd_minhash graph); rep =
    // min id reachable, keep ⇔ the doc IS its component's min
    "dd_components" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id AS id, $normE AS norm,
         |    string_split($normE, ' ') AS ws FROM documents),
         |base AS (SELECT id, list_distinct(
         |    CASE WHEN len(ws) < 3 THEN [norm]
         |         ELSE list_transform(range(0, len(ws) - 2),
         |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS sh
         |  FROM w),
         |p AS (SELECT a.id AS u, b.id AS v
         |  FROM base a JOIN base b ON a.id < b.id
         |  WHERE CAST(floor(100.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) >= 60),
         |edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         |reach AS (
         |  SELECT u AS id, v AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r)
         |SELECT id AS doc_id, least(id, min(r)) AS rep_id,
         |  least(id, min(r)) = id AS keep
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    // quality-aware survivor: the same recursive-CTE closure, but keep
    // = argmax(n_chars, id asc) per component instead of min id
    "dd_components_best" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id AS id, $normE AS norm,
         |    string_split($normE, ' ') AS ws FROM documents),
         |base AS (SELECT id, list_distinct(
         |    CASE WHEN len(ws) < 3 THEN [norm]
         |         ELSE list_transform(range(0, len(ws) - 2),
         |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS sh
         |  FROM w),
         |p AS (SELECT a.id AS u, b.id AS v
         |  FROM base a JOIN base b ON a.id < b.id
         |  WHERE CAST(floor(100.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) >= 60),
         |edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         |reach AS (
         |  SELECT u AS id, v AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
         |comp AS (SELECT id, least(id, min(r)) AS rep_id FROM reach GROUP BY id),
         |j AS (SELECT comp.id, comp.rep_id, d.n_chars::BIGINT AS n_chars
         |  FROM comp JOIN documents d ON d.doc_id = comp.id),
         |r2 AS (SELECT *, row_number() OVER (PARTITION BY rep_id
         |    ORDER BY n_chars DESC, id ASC) AS rn FROM j)
         |SELECT id AS doc_id, rep_id, n_chars, rn = 1 AS keep
         |FROM r2 ORDER BY doc_id""".stripMargin,

    // the 64-bit simhash sketch recomputed in SQL from the same FNV-1a
    // kernel (ASCII corpus: unicode(c) == utf8 byte), then EXACT all-pairs
    // hamming <= 3 — 4x16-bit banding guarantees 100% recall at <= 3, so
    // the Spark banded output must equal this exactly
    "dd_simhash" ->
      s"""WITH n AS (SELECT doc_id, string_split($normE, ' ') AS ws FROM documents),
         |h AS (SELECT doc_id, list_transform(ws, w ->
         |    (list_reduce(list_prepend(14695981039346656037::HUGEINT,
         |      list_transform(range(1, length(w) + 1), i -> unicode(w[i])::HUGEINT)),
         |      (a, b) -> (xor(a, b) * 1099511628211) % 18446744073709551616::HUGEINT))::UBIGINT) AS hs FROM n),
         |sk AS (SELECT doc_id,
         |  list_reduce(list_prepend(0::UBIGINT, list_transform(range(0, 64), b ->
         |    CASE WHEN 2 * len(list_filter(hs, x -> (x >> b) & 1 = 1)) > len(hs)
         |         THEN (1::UBIGINT << b) ELSE 0::UBIGINT END)), (a, b) -> a | b) AS sk
         |  FROM h)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.sk, b.sk))::BIGINT AS hamming
         |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sk, b.sk)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    // full replication of the hyperplane-LSH pipeline in SQL: identical
    // ±1 plane weights (fmix32 finalizer — see planeBitSql), identical
    // packed signature, identical (band, chunk) bucketing, exact cosine
    // verify — byte-equal with the Spark plan by construction
    "dd_embed_neardup" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    len(embedding) AS n FROM embeddings),
        |sig AS (SELECT vec_id,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 16), p ->
        |    CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(0, n::INT),
        |        i -> v[i+1] * (CASE WHEN $planeBitSql = 1
        |                       THEN 1.0 ELSE -1.0 END))),
        |        (a, b) -> a + b) >= 0.0
        |    THEN (1::BIGINT << p) ELSE 0::BIGINT END)), (a, b) -> a | b) AS s
        |  FROM v),
        |banded AS (SELECT vec_id, b AS band, (s >> (b*4)) & 15 AS chunk
        |  FROM sig, (SELECT unnest(range(0, 4)) AS b)),
        |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.chunk = b.chunk AND a.vec_id < b.vec_id),
        |sim AS (SELECT id_a, id_b,
        |    CAST(floor(list_dot_product(va.v, vb.v) /
        |      (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))) * 1000000.0) AS BIGINT) AS sim_e6
        |  FROM cand JOIN v va ON va.vec_id = cand.id_a JOIN v vb ON vb.vec_id = cand.id_b)
        |SELECT id_a, id_b, sim_e6 FROM sim WHERE sim_e6 >= 300000
        |ORDER BY id_a, id_b""".stripMargin,

    // SemDeDup replicated in SQL: same deterministic coarse quantizer as
    // sim_topk_ivf (first-16 centroids, nearest cell, ties by cent_id),
    // all within-cell pairs, drop ⇔ a lower-id cell-mate at cosine ≥ 0.40;
    // the 100 planted copies pair at 1.0, the organic near-dups at ~0.4-0.5
    "dd_semantic" ->
      """WITH allv AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 100),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM allv),
        |cents AS (SELECT vec_id AS cent_id, v AS cv FROM v WHERE vec_id < 16),
        |sims AS (SELECT a.vec_id, c.cent_id,
        |    list_dot_product(a.v, c.cv) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS s
        |  FROM v a, cents c),
        |cell AS (SELECT vec_id, cent_id FROM (SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id ASC) AS rn
        |  FROM sims) WHERE rn = 1),
        |drops AS (SELECT DISTINCT greatest(a.vec_id, b.vec_id) AS vec_id
        |  FROM cell a JOIN cell b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
        |  JOIN v va ON va.vec_id = a.vec_id JOIN v vb ON vb.vec_id = b.vec_id
        |  WHERE floor(list_dot_product(va.v, vb.v) /
        |      (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v)))
        |      * 1000000.0) >= 400000)
        |SELECT v.vec_id, (d.vec_id IS NULL) AS keep
        |FROM v LEFT JOIN drops d ON d.vec_id = v.vec_id
        |ORDER BY v.vec_id""".stripMargin,

    // SemDeDup under the TRAINED quantizer: both Lloyd rounds replayed on
    // the augmented corpus (first-16 init, the sim_kmeans recipe), the
    // final trained-centroid assignment, then the same within-cell
    // lower-id drop rule — training + assignment + verdict end-to-end
    "dd_semantic_kmeans" ->
      s"""WITH allv AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 100),
         |v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM allv),
         |c0 AS (SELECT id AS cid, v AS cv FROM v WHERE id < 16),
         |${kmeansRoundE("s1", "a1", "v", "c0")},
         |${kmeansMeansE("a1", "m1", "c1")},
         |${kmeansRoundE("s2", "a2", "v", "c1")},
         |${kmeansMeansE("a2", "m2", "c2")},
         |${kmeansRoundE("s3", "a3", "v", "c2")},
         |drops AS (SELECT DISTINCT greatest(a.id, b.id) AS id
         |  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.id < b.id
         |  JOIN v va ON va.id = a.id JOIN v vb ON vb.id = b.id
         |  WHERE floor(list_dot_product(va.v, vb.v) /
         |      (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v)))
         |      * 1000000.0) >= 400000)
         |SELECT v.id AS vec_id, (d.id IS NULL) AS keep
         |FROM v LEFT JOIN drops d ON d.id = v.id
         |ORDER BY vec_id""".stripMargin,

    // quantizer diagnostics: identical 2-round Lloyd training, then
    // per-cell population + cohesion; TOTAL over the trained centroid
    // table (empty cells surface as n_vecs 0, null sims)
    "sim_cluster_stats" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |c0 AS (SELECT id AS cid, v AS cv FROM v WHERE id < 16),
         |${kmeansRoundE("s1", "a1", "v", "c0")},
         |${kmeansMeansE("a1", "m1", "c1")},
         |${kmeansRoundE("s2", "a2", "v", "c1")},
         |${kmeansMeansE("a2", "m2", "c2")},
         |${kmeansRoundE("s3", "a3", "v", "c2")},
         |st AS (SELECT cid, count(*)::BIGINT AS n_vecs, avg(sim) AS mean_sim,
         |    min(sim) AS min_sim FROM a3 GROUP BY cid)
         |SELECT c2.cid AS cent_id, coalesce(st.n_vecs, 0) AS n_vecs,
         |  st.mean_sim, st.min_sim
         |FROM c2 LEFT JOIN st ON st.cid = c2.cid
         |ORDER BY cent_id""".stripMargin,

    "sim_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id,
        |    list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
        |  FROM q, c WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank FROM s)
        |SELECT query_id, neighbor_id, rank::INT AS rank, CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_e6
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // identical coarse quantizer (first-16 centroids, nearest-cell
    // assignment, 2-cell probe) + exact cosine re-rank, replicated in SQL
    "sim_topk_ivf" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, v AS cv FROM v WHERE vec_id < 16),
        |sims AS (SELECT a.vec_id, c.cent_id,
        |    list_dot_product(a.v, c.cv) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS s
        |  FROM v a, cents c),
        |ranked AS (SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cent_id ASC) AS rn
        |  FROM sims),
        |corpus_cell AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
        |query_cell AS (SELECT vec_id, cent_id FROM ranked WHERE rn <= 2 AND vec_id < 10),
        |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM query_cell q JOIN corpus_cell c
        |  ON q.cent_id = c.cent_id AND q.vec_id <> c.vec_id),
        |s2 AS (SELECT query_id, neighbor_id,
        |    list_dot_product(qv.v, cv.v) /
        |      (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS sim
        |  FROM cand JOIN v qv ON qv.vec_id = cand.query_id
        |            JOIN v cv ON cv.vec_id = cand.neighbor_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank FROM s2)
        |SELECT query_id, neighbor_id, rank::INT AS rank,
        |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_e6
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // identical hyperplane bucketing + exact cosine re-rank, replicated in
    // SQL — equality with the Spark LSH plan is by construction
    "sim_topk_lsh" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    len(embedding) AS n FROM embeddings),
        |sig AS (SELECT vec_id,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 16), p ->
        |    CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(0, n::INT),
        |        i -> v[i+1] * (CASE WHEN $planeBitSql = 1
        |                       THEN 1.0 ELSE -1.0 END))),
        |        (a, b) -> a + b) >= 0.0
        |    THEN (1::BIGINT << p) ELSE 0::BIGINT END)), (a, b) -> a | b) AS s
        |  FROM v),
        |banded AS (SELECT vec_id, b AS band, (s >> (b*4)) & 15 AS chunk
        |  FROM sig, (SELECT unnest(range(0, 4)) AS b)),
        |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM banded q JOIN banded c
        |  ON q.band = c.band AND q.chunk = c.chunk AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10),
        |s AS (SELECT query_id, neighbor_id,
        |    list_dot_product(qv.v, cv.v) /
        |      (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS sim
        |  FROM cand JOIN v qv ON qv.vec_id = cand.query_id
        |            JOIN v cv ON cv.vec_id = cand.neighbor_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank FROM s)
        |SELECT query_id, neighbor_id, rank::INT AS rank,
        |  CAST(floor(sim * 1000000.0) AS BIGINT) AS sim_e6
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "txt_quality" ->
      s"""SELECT doc_id,
         |  length($normE)::INT AS n_chars_norm,
         |  len(string_split($normE, ' '))::INT AS n_words,
         |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))::INT AS n_tokens_re,
         |  len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]'))::INT AS n_punct,
         |  len(list_filter(string_split($normE, ' '), x -> x IN ('the','a','of','and','to','in','is','it')))::INT AS n_stopwords_en,
         |  len(regexp_extract_all(text, '[A-Z]'))::INT AS n_upper,
         |  coalesce(list_max(list_transform(string_split($normE, ' '), w -> length(w))), 0)::INT AS max_word_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_langid" ->
      s"""WITH sc AS (SELECT doc_id,
         |  len(list_filter(string_split($normE, ' '), x -> x IN ('the','a','of','and','to','in','is','it'))) AS en,
         |  len(list_filter(string_split($normE, ' '), x -> x IN ('el','la','de','y','que','en','un','es'))) AS es,
         |  len(list_filter(string_split($normE, ' '), x -> x IN ('der','die','und','das','ist','ein','zu','den'))) AS de,
         |  len(list_filter(string_split($normE, ' '), x -> x IN ('le','la','de','et','un','est','en','que'))) AS fr
         | FROM documents)
         |SELECT doc_id,
         |  CASE WHEN en = 0 AND es = 0 AND de = 0 AND fr = 0 THEN 'und'
         |       WHEN en >= es AND en >= de AND en >= fr THEN 'en'
         |       WHEN es >= de AND es >= fr THEN 'es'
         |       WHEN de >= fr THEN 'de'
         |       ELSE 'fr' END AS lang_guess
         |FROM sc ORDER BY doc_id""".stripMargin,

    "txt_fingerprint" ->
      s"SELECT doc_id, md5($normE) AS fp FROM documents ORDER BY doc_id",

    "txt_repetition" ->
      s"""WITH w AS (SELECT doc_id, $normE AS norm,
         |    string_split($normE, ' ') AS ws FROM documents)
         |SELECT doc_id,
         |  len(ws)::INT AS n_words,
         |  (CASE WHEN len(ws) < 3 THEN 1 ELSE len(ws) - 2 END)::INT AS n_tri_total,
         |  len(list_distinct(
         |    CASE WHEN len(ws) < 3 THEN [norm]
         |         ELSE list_transform(range(0, len(ws) - 2),
         |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END))::INT AS n_tri_distinct,
         |  ((CASE WHEN len(ws) < 3 THEN 1 ELSE len(ws) - 2 END) -
         |   len(list_distinct(
         |    CASE WHEN len(ws) < 3 THEN [norm]
         |         ELSE list_transform(range(0, len(ws) - 2),
         |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END)))::INT AS n_tri_dup
         |FROM w ORDER BY doc_id""".stripMargin,

    "txt_rolling" ->
      s"""WITH n AS (SELECT doc_id, $normE AS t FROM documents)
         |SELECT doc_id,
         |  list_reduce(
         |    list_prepend(0::BIGINT,
         |      list_transform(range(1, length(t) + 1), i -> unicode(t[i])::BIGINT)),
         |    (a, b) -> (a * 31 + b) % 1000000007) AS rfp
         |FROM n ORDER BY doc_id""".stripMargin,

    "mm_features" ->
      """SELECT doc_id AS media_id,
        |  list_extract(['image','audio','video'], (doc_id % 3) + 1) AS kind,
        |  octet_length(encode(text))::INT AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY media_id""".stripMargin,

    // streaming keyed dedup: the surviving key SET is deterministic (the
    // output projects to the dedup keys), so the oracle is the plain
    // distinct over the parse-ok stream's key columns
    "dd_stream_dedup" ->
      s"""SELECT DISTINCT $hostE AS hostname, 'app-' || (user_id % 10) AS appname
         |FROM events WHERE event_type <> 'error'
         |ORDER BY hostname, appname""".stripMargin,

    // end-to-end corpus-clean verdict, replayed stage by stage: quality
    // (word count) → language (stopword argmax) → exact dedup (row_number
    // over md5(norm) among filter survivors) → near-dup components
    // (recursive-CTE transitive closure over the exact all-pairs 3-gram
    // jaccard graph of the exact representatives); status = first
    // rejecting stage, total over the doubled corpus
    "pipe_clean" ->
      s"""WITH RECURSIVE alldocs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
         |sc AS (SELECT doc_id, text,
         |  len(string_split($normE, ' ')) AS nw,
         |  len(list_filter(string_split($normE, ' '), x -> x IN ('the','a','of','and','to','in','is','it'))) AS en,
         |  len(list_filter(string_split($normE, ' '), x -> x IN ('el','la','de','y','que','en','un','es'))) AS es,
         |  len(list_filter(string_split($normE, ' '), x -> x IN ('der','die','und','das','ist','ein','zu','den'))) AS de,
         |  len(list_filter(string_split($normE, ' '), x -> x IN ('le','la','de','et','un','est','en','que'))) AS fr
         | FROM alldocs),
         |st AS (SELECT doc_id, text, nw >= 20 AS q_ok,
         |  (CASE WHEN en = 0 AND es = 0 AND de = 0 AND fr = 0 THEN 'und'
         |        WHEN en >= es AND en >= de AND en >= fr THEN 'en'
         |        WHEN es >= de AND es >= fr THEN 'es'
         |        WHEN de >= fr THEN 'de' ELSE 'fr' END) = 'en' AS l_ok
         | FROM sc),
         |ex AS (SELECT doc_id, text,
         |   row_number() OVER (PARTITION BY md5($normE) ORDER BY doc_id) AS rn
         | FROM st WHERE q_ok AND l_ok),
         |w AS (SELECT doc_id AS id, $normE AS norm, string_split($normE, ' ') AS ws
         | FROM ex WHERE rn = 1),
         |base AS (SELECT id, list_distinct(
         |   CASE WHEN len(ws) < 3 THEN [norm]
         |        ELSE list_transform(range(0, len(ws) - 2),
         |               i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS sh
         | FROM w),
         |p AS (SELECT a.id AS u, b.id AS v FROM base a JOIN base b ON a.id < b.id
         | WHERE CAST(floor(100.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) >= 60),
         |edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         |reach AS (
         |  SELECT u AS id, v AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
         |nd AS (SELECT id, least(id, min(r)) = id AS nd_keep FROM reach GROUP BY id)
         |SELECT st.doc_id,
         |  CASE WHEN NOT st.q_ok THEN 'drop_quality'
         |       WHEN NOT st.l_ok THEN 'drop_lang'
         |       WHEN ex.rn > 1 THEN 'drop_exact'
         |       WHEN nd.nd_keep = false THEN 'drop_neardup'
         |       ELSE 'kept' END AS status
         |FROM st LEFT JOIN ex ON ex.doc_id = st.doc_id
         |        LEFT JOIN nd ON nd.id = st.doc_id
         |ORDER BY st.doc_id""".stripMargin,

    // the naive GLOBAL window (one total order over the corpus) — the
    // Spark side computes the same running sum with the distributed
    // two-level scan in Packing, so equality proves that scan exact
    "pipe_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |    len(string_split($normE, ' '))::BIGINT AS n_tok FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
         |  FROM t)
         |SELECT doc_id, n_tok, start_off,
         |  (start_off // 2048)::BIGINT AS bin_first,
         |  ((start_off + n_tok - 1) // 2048)::BIGINT AS bin_last
         |FROM c ORDER BY doc_id""".stripMargin,

    // identical md5-prefix hash and per-source rate arithmetic — row
    // membership is a pure function of (doc_id, source) in both engines
    "pipe_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100
        |      < (substr(source, 4)::INT * 7) % 101
        |ORDER BY doc_id""".stripMargin,

    "dd_contam" ->
      s"""WITH w AS (SELECT doc_id, $normE AS norm,
         |    string_split($normE, ' ') AS ws FROM documents),
         |sh AS (SELECT doc_id, ${shingleListE(4)} AS sh FROM w),
         |ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 23 = 0),
         |tr AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 23 <> 0)
         |SELECT tr.doc_id, count(*)::BIGINT AS n_shared
         |FROM tr JOIN ev USING (g)
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    "dd_span" ->
      s"""WITH w AS (SELECT doc_id, $normE AS norm,
         |    string_split($normE, ' ') AS ws FROM documents),
         |sh AS (SELECT doc_id, ${shingleListE(8)} AS sh FROM w),
         |gr AS (SELECT doc_id, unnest(sh) AS g FROM sh),
         |d AS (SELECT g FROM gr GROUP BY g HAVING min(doc_id) <> max(doc_id)),
         |gd AS (SELECT gr.doc_id, count(*)::BIGINT AS n_dup FROM gr
         |  JOIN d USING (g) GROUP BY gr.doc_id)
         |SELECT sh.doc_id, len(sh.sh)::BIGINT AS n_sh,
         |  coalesce(gd.n_dup, 0)::BIGINT AS n_dup_sh
         |FROM sh LEFT JOIN gd USING (doc_id) ORDER BY sh.doc_id""".stripMargin,

    "txt_vocab" ->
      s"""WITH w AS (SELECT doc_id,
         |    unnest(string_split($normE, ' ')) AS word FROM documents)
         |SELECT word, count(*)::BIGINT AS n,
         |  count(DISTINCT doc_id)::BIGINT AS n_docs
         |FROM w GROUP BY word
         |ORDER BY n DESC, word ASC LIMIT 20""".stripMargin,

    // per-source OOV vs the identical top-20 vocab (same tie order);
    // integer counts, so the compare is exact
    "txt_oov" ->
      s"""WITH w AS (SELECT source,
         |    unnest(string_split($normE, ' ')) AS word FROM documents),
         |wv AS (SELECT doc_id,
         |    unnest(string_split($normE, ' ')) AS word FROM documents),
         |vocab AS (SELECT word FROM (
         |  SELECT word, count(*) AS n FROM wv GROUP BY word
         |  ORDER BY n DESC, word ASC LIMIT 20)),
         |j AS (SELECT w.source, vocab.word AS vw
         |  FROM w LEFT JOIN vocab ON vocab.word = w.word)
         |SELECT source, count(*)::BIGINT AS n_tokens,
         |  sum(CASE WHEN vw IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
         |FROM j GROUP BY source ORDER BY source""".stripMargin,

    // token-axis operators: tokens = codepoints of the constructed line
    // (stringToCodepoints parity), grams rendered comma-joined in both
    // engines — the compare covers windowing, counting and the k-boundary
    // BPE training oracle: all four rounds replayed in SQL (see
    // bpeOracleSql) — pair counts, tie-break, greedy run-parity merge,
    // and the rewritten corpus each subsequent round trains on
    "tok_bpe" -> bpeOracleSql(rounds = 4, vocabBase = 1 << 20),
    // the encoded corpus itself: frozen merges applied in training order
    "tok_bpe_apply" -> bpeApplyOracleSql(rounds = 4, vocabBase = 1 << 20),

    "tok_ngrams" ->
      s"""WITH s AS (SELECT event_id::VARCHAR AS doc_id, ($lineE) AS line FROM events),
         |g AS (SELECT doc_id, unnest(${tokGramListE(3)}) AS gram FROM s)
         |SELECT gram, count(*)::BIGINT AS n,
         |  count(DISTINCT doc_id)::BIGINT AS n_docs
         |FROM g GROUP BY gram
         |ORDER BY n DESC, gram ASC LIMIT 25""".stripMargin,

    "tok_span_dup" ->
      s"""WITH s AS (SELECT event_id::VARCHAR AS doc_id, ($lineE) AS line FROM events),
         |sh AS (SELECT doc_id, list_distinct(${tokGramListE(16)}) AS sh FROM s),
         |gr AS (SELECT doc_id, unnest(sh) AS g FROM sh),
         |d AS (SELECT g FROM gr GROUP BY g HAVING min(doc_id) <> max(doc_id)),
         |gd AS (SELECT gr.doc_id, count(*)::BIGINT AS n_dup FROM gr
         |  JOIN d USING (g) GROUP BY gr.doc_id)
         |SELECT sh.doc_id, len(sh.sh)::BIGINT AS n_sh,
         |  coalesce(gd.n_dup, 0)::BIGINT AS n_dup_sh
         |FROM sh LEFT JOIN gd USING (doc_id) ORDER BY sh.doc_id""".stripMargin,

    "tok_contam" ->
      s"""WITH s AS (SELECT event_id, event_id::VARCHAR AS doc_id,
         |    ($lineE) AS line FROM events),
         |sh AS (SELECT event_id, doc_id,
         |    list_distinct(${tokGramListE(12)}) AS sh FROM s),
         |ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE event_id % 23 = 0),
         |tr AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE event_id % 23 <> 0)
         |SELECT tr.doc_id, count(*)::BIGINT AS n_shared
         |FROM tr JOIN ev USING (g)
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    // ExactSubstr-style scrub verdict: duplicated window starts (count>=2
    // over the WHOLE corpus, within-doc repeats included), then the
    // interval-union length via the same lead()-window fold the Spark side
    // uses — equality covers windowing, the frequency threshold, the
    // overlap merge arithmetic and the left-join totality
    "tok_scrub" ->
      s"""WITH s AS (SELECT event_id::VARCHAR AS doc_id, ($lineE) AS line FROM events),
         |pg AS (SELECT doc_id, unnest(${tokGramPosListE(16)}) AS u FROM s),
         |g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM pg),
         |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |st AS (SELECT doc_id, pos FROM g JOIN d USING (gram)),
         |cv AS (SELECT doc_id,
         |    least(coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos), pos + 16) - pos, 16) AS c
         |  FROM st),
         |agg AS (SELECT doc_id, sum(c)::BIGINT AS n_dup_tok FROM cv GROUP BY doc_id)
         |SELECT s.doc_id, len(line)::BIGINT AS n_tok,
         |  coalesce(agg.n_dup_tok, 0)::BIGINT AS n_dup_tok,
         |  len(line)::BIGINT - coalesce(agg.n_dup_tok, 0)::BIGINT AS n_keep_tok
         |FROM s LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    // same pattern strings (Java/RE2-shared subset), same sequential
    // masking for the counts — regexp_replace needs the 'g' flag here
    "txt_redact" ->
      s"""WITH p AS (SELECT doc_id,
         |  text || ' contact u' || doc_id || '@ex-mail.org from 10.' ||
         |    (doc_id % 256) || '.0.' || (doc_id % 100) || ' acct ' ||
         |    lpad((doc_id * 37)::VARCHAR, 16, '9') AS t FROM documents),
         |m1 AS (SELECT doc_id, t,
         |  regexp_replace(t, '$emailRe', '<EMAIL>', 'g') AS t1 FROM p),
         |m2 AS (SELECT doc_id, t, t1,
         |  regexp_replace(t1, '$ipv4Re', '<IP>', 'g') AS t2 FROM m1)
         |SELECT doc_id,
         |  regexp_replace(t2, '$idnumRe', '<IDNUM>', 'g') AS text_redacted,
         |  len(regexp_extract_all(t, '$emailRe'))::BIGINT AS n_email,
         |  len(regexp_extract_all(t1, '$ipv4Re'))::BIGINT AS n_ipv4,
         |  len(regexp_extract_all(t2, '$idnumRe'))::BIGINT AS n_idnum
         |FROM m2 ORDER BY doc_id""".stripMargin,

    // CCNet paragraph dedup: first occurrence per normalized line key
    // under the (doc_id, pos) total order; the oracle replays the
    // multi-line construction, the first-occurrence window, and the
    // ordered reassembly (string_agg ORDER BY pos), with the same
    // left-join totality for fully-deduped documents
    "dd_lines" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    'Join Our Newsletter Today!' || chr(10) ||
         |    regexp_replace(text, ' table ', chr(10), 'g') || chr(10) ||
         |    'copyright footer ' || (doc_id % 7) AS t
         |  FROM (SELECT doc_id, text FROM documents
         |        UNION ALL SELECT doc_id + 1000000, text FROM documents)),
         |ls AS (SELECT doc_id, string_split(t, chr(10)) AS a FROM d),
         |l AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM
         |  (SELECT doc_id, unnest(list_transform(range(0, len(a)),
         |     i -> {'pos': i, 'line': a[i+1]})) AS u FROM ls)),
         |k AS (SELECT doc_id, pos, line,
         |  regexp_replace(trim(lower(line)), '\\s+', ' ', 'g') AS lkey FROM l),
         |kept AS (SELECT doc_id, pos, line FROM
         |  (SELECT k.*, row_number() OVER (PARTITION BY lkey ORDER BY doc_id, pos) AS rn FROM k)
         |  WHERE rn = 1),
         |r AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
         |       string_agg(line, chr(10) ORDER BY pos) AS text_clean
         |      FROM kept GROUP BY doc_id),
         |n AS (SELECT doc_id, len(string_split(t, chr(10)))::BIGINT AS n_lines FROM d)
         |SELECT n.doc_id, n.n_lines,
         |  coalesce(r.n_kept, 0)::BIGINT AS n_kept,
         |  (n.n_lines - coalesce(r.n_kept, 0))::BIGINT AS n_removed,
         |  coalesce(r.text_clean, '') AS text_clean
         |FROM n LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    // incremental near-dup verdict: exact all-pairs batch×prior 3-gram
    // jaccard (same shingle construction as dd_minhash) with the TOTAL
    // left-join verdict — LSH recall AND the keep flags are load-bearing
    "dd_incr_near" ->
      s"""WITH b AS (SELECT doc_id + 1000000 AS id, text FROM documents WHERE doc_id % 5 = 0),
         |p AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 <> 0 OR doc_id % 10 = 0),
         |wb AS (SELECT id, $normE AS norm, string_split($normE, ' ') AS ws FROM b),
         |wp AS (SELECT id, $normE AS norm, string_split($normE, ' ') AS ws FROM p),
         |sb AS (SELECT id, ${shingleListE(3)} AS sh FROM wb),
         |sp AS (SELECT id, ${shingleListE(3)} AS sh FROM wp),
         |pr AS (SELECT sb.id AS id_b, sp.id AS id_p FROM sb JOIN sp ON
         |  CAST(floor(100.0 * len(list_intersect(sb.sh, sp.sh)) / len(list_distinct(list_concat(sb.sh, sp.sh)))) AS BIGINT) >= 60),
         |m AS (SELECT id_b, min(id_p) AS dup_prior_id, count(*)::BIGINT AS n_prior_dups
         |      FROM pr GROUP BY id_b)
         |SELECT b.id AS doc_id, m.dup_prior_id,
         |  coalesce(m.n_prior_dups, 0)::BIGINT AS n_prior_dups,
         |  m.dup_prior_id IS NULL AS keep
         |FROM b LEFT JOIN m ON b.id = m.id_b ORDER BY doc_id""".stripMargin,

    // CCNet-style bigram-LM scoring: ordered bigrams WITH multiplicity
    // (range(0, len-1) is empty for <2-word docs), add-one smoothing
    // p = (cb+1)/(cu+V) with cu = history count over the reference slice
    // and V = its distinct-word vocab; ln/exp differences between engines
    // sit ~1e-15 rel, far inside the compare's 1e-6 float tolerance
    "txt_lm_ppl" ->
      s"""WITH w AS (SELECT doc_id, string_split($normE, ' ') AS ws FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(0, len(ws) - 1),
         |    i -> {'g': ws[i+1] || ' ' || ws[i+2], 'w1': ws[i+1]})) AS u FROM w),
         |b2 AS (SELECT doc_id, u.g AS g, u.w1 AS w1 FROM bg),
         |bi AS (SELECT g, count(*)::BIGINT AS cb FROM b2 WHERE doc_id % 5 = 0 GROUP BY g),
         |uni AS (SELECT w1, count(*)::BIGINT AS cu FROM b2 WHERE doc_id % 5 = 0 GROUP BY w1),
         |v AS (SELECT count(DISTINCT word)::BIGINT AS v FROM
         |  (SELECT unnest(ws) AS word FROM w WHERE doc_id % 5 = 0)),
         |sc AS (SELECT b2.doc_id, count(*)::BIGINT AS n_big,
         |    sum(ln((coalesce(bi.cb, 0) + 1.0) / (coalesce(uni.cu, 0) + v.v))) AS slp
         |  FROM b2 LEFT JOIN bi USING (g) LEFT JOIN uni USING (w1) CROSS JOIN v
         |  GROUP BY b2.doc_id)
         |SELECT d.doc_id, coalesce(sc.n_big, 0)::BIGINT AS n_big,
         |  -sc.slp / sc.n_big AS avg_nll,
         |  exp(-sc.slp / sc.n_big) AS ppl
         |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // the naive GLOBAL row_number window over the pseudo-random total
    // order — the Spark side computes the same position with the
    // distributed two-level rank scan, so equality proves the scan exact
    "pipe_shuffle" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY md5(doc_id::VARCHAR || 'epoch1'), doc_id) - 1 AS pos
        |FROM documents ORDER BY doc_id""".stripMargin,

    // stride-scheduled source interleave replay: per-source scramble
    // rank (naive window), then the integer stride slot
    // ((2r+1)·W div 2w)·nSrc + sidx — W=100, nSrc=4, sidx by sorted
    // source name; unlisted sources drop via the inner join
    "pipe_interleave" ->
      """WITH w(source, wt, sidx) AS (VALUES
        |    ('src0', 50, 0), ('src1', 30, 1), ('src2', 15, 2), ('src3', 5, 3)),
        |r AS (SELECT d.doc_id, d.source, w.wt, w.sidx,
        |    (row_number() OVER (PARTITION BY d.source
        |       ORDER BY md5(d.doc_id::VARCHAR || 'ep1'), d.doc_id) - 1)::BIGINT AS rnd
        |  FROM documents d JOIN w USING (source))
        |SELECT doc_id, source, rnd AS src_round,
        |  ((((2*rnd + 1) * 100) // (2*wt)) * 4 + sidx)::BIGINT AS sched_pos
        |FROM r ORDER BY doc_id""".stripMargin,

    // fixed-budget multi-epoch mixture replay: per-source slot
    // allocation (150·w div 100), epoch fan-out ceil(nslots/ndocs) via
    // unnest(range(..)), per-(source, epoch) scramble rank with the
    // epoch folded into the md5 seed, partial-last-epoch filter, then
    // the identical stride-slot arithmetic
    "pipe_epochs" ->
      """WITH w(source, wt, sidx) AS (VALUES
        |    ('src0', 50, 0), ('src1', 30, 1), ('src2', 15, 2), ('src3', 5, 3)),
        |n AS (SELECT source, count(*)::BIGINT AS ndocs FROM documents GROUP BY 1),
        |t AS (SELECT w.source, w.wt, w.sidx, n.ndocs,
        |    ((150 * w.wt) // 100)::BIGINT AS nslots
        |  FROM w JOIN n USING (source) WHERE ((150 * w.wt) // 100) > 0),
        |ep AS (SELECT *, unnest(range(0, (nslots + ndocs - 1) // ndocs))::BIGINT AS k FROM t),
        |r AS (SELECT d.doc_id, ep.source, ep.k, ep.wt, ep.sidx, ep.ndocs, ep.nslots,
        |    (row_number() OVER (PARTITION BY ep.source, ep.k
        |       ORDER BY md5(d.doc_id::VARCHAR || 'ep' || ep.k::VARCHAR), d.doc_id) - 1)::BIGINT AS erank
        |  FROM documents d JOIN ep USING (source)),
        |f AS (SELECT *, (k * ndocs + erank)::BIGINT AS rnd FROM r
        |  WHERE k * ndocs + erank < nslots)
        |SELECT doc_id, source, k AS epoch, rnd AS src_round,
        |  ((((2*rnd + 1) * 100) // (2*wt)) * 4 + sidx)::BIGINT AS sched_pos
        |FROM f ORDER BY doc_id, epoch""".stripMargin,

    // token-budget mixture replay: per-source exclusive prefix token
    // sum in the scramble order (naive window), keep docs starting
    // before the source's 12000·w div 100 token allocation
    "pipe_tok_budget" ->
      """WITH w(source, wt) AS (VALUES
        |    ('src0', 50), ('src1', 30), ('src2', 15), ('src3', 5)),
        |r AS (SELECT d.doc_id, d.source, d.n_chars::BIGINT AS n_tok, w.wt,
        |    coalesce(sum(d.n_chars) OVER (PARTITION BY d.source
        |       ORDER BY md5(d.doc_id::VARCHAR || 'tb'), d.doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_start
        |  FROM documents d JOIN w USING (source))
        |SELECT doc_id, source, tok_start, n_tok FROM r
        |WHERE tok_start < (12000 * wt) // 100
        |ORDER BY doc_id""".stripMargin,

    // SCD2 replay: per-(user, day) last event type (row_number by
    // (ts, event_id) desc), then interval chaining via lead over the
    // day sequence; the key's latest row carries null valid_to
    "ev_scd2" ->
      """WITH r AS (SELECT user_id, ts::DATE AS day, event_type,
        |    row_number() OVER (PARTITION BY user_id, ts::DATE
        |       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |daily AS (SELECT user_id, day, event_type AS state FROM r WHERE rn = 1),
        |h AS (SELECT user_id, day AS valid_from, state,
        |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS valid_to
        |  FROM daily)
        |SELECT user_id, valid_from, state, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM h ORDER BY user_id, valid_from""".stripMargin,

    // hysteresis alert replay: per-type hourly counts densified over
    // min..max hour (absent hour = 0), forced state n>=3 on / n<2 off,
    // dead band carries via last_value IGNORE NULLS, rising edges
    "ev_alerts" ->
      """WITH c AS (SELECT event_type,
        |    (epoch_us(ts) // 3600000000)::BIGINT AS hour_id,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hour_id) AS h0, max(hour_id) AS h1
        |  FROM c GROUP BY 1),
        |hrs AS (SELECT event_type,
        |    unnest(range(h0, h1 + 1))::BIGINT AS hour_id FROM b),
        |d AS (SELECT h.event_type, h.hour_id, coalesce(c.n, 0)::BIGINT AS n
        |  FROM hrs h LEFT JOIN c USING (event_type, hour_id)),
        |f AS (SELECT *, CASE WHEN n >= 3 THEN 'on'
        |    WHEN n < 2 THEN 'off' END AS forced FROM d),
        |s AS (SELECT *, coalesce(last_value(forced IGNORE NULLS) OVER
        |    (PARTITION BY event_type ORDER BY hour_id
        |     ROWS UNBOUNDED PRECEDING), 'off') AS state FROM f)
        |SELECT event_type, hour_id, n, state,
        |  (state = 'on' AND coalesce(lag(state) OVER
        |    (PARTITION BY event_type ORDER BY hour_id), 'off') = 'off')
        |  AS alert_started
        |FROM s ORDER BY event_type, hour_id""".stripMargin,

    // SCD2-at-event-time replay: the daily-state derivation (as in
    // ev_scd2) shifted one day forward, then DuckDB's native ASOF LEFT
    // JOIN — latest state_day <= the event's day; day-1 events get null
    "ev_state_at" ->
      """WITH r AS (SELECT user_id, ts::DATE AS day, event_type,
        |    row_number() OVER (PARTITION BY user_id, ts::DATE
        |       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |s AS (SELECT user_id, day + 1 AS state_day, event_type AS prev_state
        |  FROM r WHERE rn = 1),
        |e AS (SELECT event_id, user_id, ts::DATE AS day, event_type FROM events)
        |SELECT e.event_id, e.user_id, e.event_type, s.prev_state
        |FROM e ASOF LEFT JOIN s
        |  ON e.user_id = s.user_id AND e.day >= s.state_day
        |ORDER BY e.event_id""".stripMargin,

    // consecutive-duplicate run collapse replay: boundary = first row
    // of the key OR lag IS DISTINCT FROM current (the explicit rn=1
    // marker matches the Spark side exactly even when the value column
    // is NULL — see EventAnalytics.collapseRuns), run id = running sum
    // of boundaries, per-run count + first/last µs
    "ev_collapse" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type
        |  FROM events),
        |m AS (SELECT *, CASE WHEN row_number() OVER
        |      (PARTITION BY user_id ORDER BY t_us, event_id) = 1
        |      OR lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY t_us, event_id)
        |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS new_run
        |  FROM e),
        |r AS (SELECT *, (sum(new_run) OVER (PARTITION BY user_id
        |      ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS run_seq
        |  FROM m)
        |SELECT user_id, run_seq, min(event_type) AS event_type,
        |  count(*)::BIGINT AS n_events,
        |  min(t_us)::BIGINT AS first_us, max(t_us)::BIGINT AS last_us
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // both Lloyd update rounds replayed in SQL: first-16 init, cosine
    // arg-max assignment (ties to smaller cid), per-dimension member
    // means (the embedding dim is fixed 64 — see TESTDATA.md) — twice —
    // then the final assignment under the twice-trained centroids;
    // output floors the final cosine to 1e-6
    "sim_kmeans" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |c0 AS (SELECT id AS cid, v AS cv FROM v WHERE id < 16),
         |${kmeansRoundE("s1", "a1", "v", "c0")},
         |${kmeansMeansE("a1", "m1", "c1")},
         |${kmeansRoundE("s2", "a2", "v", "c1")},
         |${kmeansMeansE("a2", "m2", "c2")},
         |${kmeansRoundE("s3", "a3", "v", "c2")}
         |SELECT a3.id AS vec_id, a3.cid,
         |  CAST(floor(a3.sim * 1000000.0) AS BIGINT) AS sim_e6
         |FROM a3 ORDER BY vec_id""".stripMargin,

    // the bloom index is a pure prefilter (verification makes the verdict
    // exact), so the oracle is plain set membership against the prior
    // snapshot — no bloom arithmetic to replicate
    "dd_incremental" ->
      s"""WITH prior AS (
         |  SELECT md5($normE) AS k FROM documents WHERE doc_id % 3 <> 1)
         |SELECT doc_id,
         |  CASE WHEN md5($normE) IN (SELECT k FROM prior)
         |       THEN 'drop_prior' ELSE 'kept' END AS status
         |FROM documents ORDER BY doc_id""".stripMargin,

    // full replay of NB training (per-class occurrence counts, class
    // totals, doc priors, vocab size) + per-doc log-odds scoring — the
    // trained model and every score are load-bearing in the compare
    "txt_classify" ->
      s"""WITH refd AS (
         |  SELECT lang = 'en' AS pos, string_split($normE, ' ') AS ws
         |  FROM documents WHERE doc_id % 5 = 0),
         |refw AS (SELECT pos, unnest(ws) AS w FROM refd),
         |model AS (SELECT w,
         |    sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS cp,
         |    sum(CASE WHEN pos THEN 0 ELSE 1 END)::BIGINT AS cn
         |  FROM refw GROUP BY w),
         |consts AS (SELECT
         |    (SELECT sum(CASE WHEN pos THEN len(ws) ELSE 0 END) FROM refd) AS np,
         |    (SELECT sum(CASE WHEN pos THEN 0 ELSE len(ws) END) FROM refd) AS nn,
         |    (SELECT count(*) FROM refd WHERE pos) AS dp,
         |    (SELECT count(*) FROM refd WHERE NOT pos) AS dn,
         |    (SELECT count(DISTINCT w) FROM refw) AS v),
         |occ AS (SELECT doc_id, unnest(string_split($normE, ' ')) AS w
         |  FROM documents),
         |lo AS (SELECT doc_id,
         |    ln(coalesce(cp, 0) + 1.0) - ln((np + v)::DOUBLE)
         |    - ln(coalesce(cn, 0) + 1.0) + ln((nn + v)::DOUBLE) AS lo
         |  FROM occ LEFT JOIN model USING (w), consts),
         |sc AS (SELECT doc_id, count(*)::BIGINT AS n_words, sum(lo) AS slo
         |  FROM lo GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(sc.n_words, 0)::BIGINT AS n_words,
         |  ln(c.dp::DOUBLE) - ln(c.dn::DOUBLE) + coalesce(sc.slo, 0) AS score,
         |  (ln(c.dp::DOUBLE) - ln(c.dn::DOUBLE) + coalesce(sc.slo, 0)) > 0 AS keep
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id, consts c
         |ORDER BY d.doc_id""".stripMargin,

    // DSIR full replay: hashed-bigram buckets (32-bit-md5 mod 4096, the
    // pipe_sample idiom), both smoothed multinomials, per-doc importance
    // weight, the md5-seeded Gumbel inverse-CDF, and the top-200
    // threshold — weights AND the selection set are load-bearing
    "pipe_dsir" ->
      s"""WITH w AS (SELECT doc_id, string_split($normE, ' ') AS ws
         |  FROM documents),
         |bg AS (SELECT doc_id, unnest(
         |    CASE WHEN len(ws) < 2 THEN []
         |         ELSE list_transform(range(0, len(ws) - 1),
         |                i -> ws[i+1] || ' ' || ws[i+2]) END) AS g FROM w),
         |bb AS (SELECT doc_id,
         |    ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS b FROM bg),
         |tgt AS (SELECT b FROM bb JOIN documents USING (doc_id)
         |  WHERE lang = 'en'),
         |ct AS (SELECT b, count(*)::BIGINT AS ct FROM tgt GROUP BY b),
         |cr AS (SELECT b, count(*)::BIGINT AS cr FROM bb GROUP BY b),
         |consts AS (SELECT (SELECT count(*) FROM tgt) AS nt,
         |                  (SELECT count(*) FROM bb) AS nr),
         |lo AS (SELECT doc_id,
         |    ln(coalesce(ct, 0) + 1.0) - ln((nt + 4096)::DOUBLE)
         |    - ln(coalesce(cr, 0) + 1.0) + ln((nr + 4096)::DOUBLE) AS lr
         |  FROM bb LEFT JOIN ct USING (b) LEFT JOIN cr USING (b), consts),
         |sc AS (SELECT doc_id, count(*)::BIGINT AS n_feat, sum(lr) AS slr
         |  FROM lo GROUP BY doc_id),
         |fin AS (SELECT d.doc_id,
         |    coalesce(sc.n_feat, 0)::BIGINT AS n_feat,
         |    coalesce(sc.slr, 0) AS logw,
         |    coalesce(sc.slr, 0) - ln(-ln(
         |      ((('0x' || substr(md5(d.doc_id::VARCHAR || 'dsir1'), 1, 8))::BIGINT
         |        + 0.5) / 4294967296.0))) AS sel_key
         |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
         |th AS (SELECT min(sel_key) AS th FROM
         |  (SELECT sel_key FROM fin ORDER BY sel_key DESC LIMIT 200))
         |SELECT f.doc_id, f.n_feat, f.logw, f.sel_key,
         |  f.sel_key >= t.th AS selected
         |FROM fin f, th t ORDER BY f.doc_id""".stripMargin,

    // explode every character of the normalized text, histogram per doc,
    // H = ln(n) − Σ k·ln(k)/n — the kernel's counting and arithmetic are
    // both load-bearing; empty-norm docs coalesce to (0, 0, 0.0)
    "txt_entropy" ->
      s"""WITH nm AS (SELECT doc_id, $normE AS t FROM documents),
         |cs AS (SELECT doc_id,
         |    unnest(list_transform(range(1, length(t) + 1), i -> t[i::INT])) AS ch
         |  FROM nm),
         |f AS (SELECT doc_id, ch, count(*)::DOUBLE AS k FROM cs GROUP BY 1, 2),
         |e AS (SELECT doc_id, sum(k)::BIGINT AS n_cp,
         |    count(*)::BIGINT AS n_distinct_cp,
         |    ln(sum(k)) - sum(k * ln(k)) / sum(k) AS h_char
         |  FROM f GROUP BY doc_id)
         |SELECT nm.doc_id, coalesce(e.n_cp, 0)::BIGINT AS n_cp,
         |  coalesce(e.n_distinct_cp, 0)::BIGINT AS n_distinct_cp,
         |  coalesce(e.h_char, 0.0)::DOUBLE AS h_char
         |FROM nm LEFT JOIN e USING (doc_id) ORDER BY nm.doc_id""".stripMargin,

    // token-axis entropy: explode every codepoint token of the line,
    // histogram per sequence, same ln arithmetic as txt_entropy
    "tok_entropy" ->
      s"""WITH s AS (SELECT event_id::VARCHAR AS doc_id, ($lineE) AS line FROM events),
         |tk AS (SELECT doc_id,
         |    unnest(list_transform(range(1, length(line) + 1),
         |      i -> unicode(line[i::INT]))) AS t FROM s),
         |f AS (SELECT doc_id, t, count(*)::DOUBLE AS k FROM tk GROUP BY 1, 2),
         |e AS (SELECT doc_id, sum(k)::BIGINT AS n_tok_total,
         |    count(*)::BIGINT AS n_distinct_tok,
         |    ln(sum(k)) - sum(k * ln(k)) / sum(k) AS h_tok
         |  FROM f GROUP BY doc_id)
         |SELECT s.doc_id, coalesce(e.n_tok_total, 0)::BIGINT AS n_tok_total,
         |  coalesce(e.n_distinct_tok, 0)::BIGINT AS n_distinct_tok,
         |  coalesce(e.h_tok, 0.0)::DOUBLE AS h_tok
         |FROM s LEFT JOIN e USING (doc_id) ORDER BY s.doc_id""".stripMargin,

    // per-source hashed-unigram KL vs the corpus: same 32-bit-md5 bucket
    // hash, add-one smoothing over 512 buckets, observed buckets summed
    // over the source×global-bucket grid + the closed-form term for the
    // buckets nothing hits
    "txt_srcdiv" ->
      s"""WITH w AS (SELECT source,
         |    unnest(string_split($normE, ' ')) AS word FROM documents),
         |sb AS (SELECT source,
         |    ('0x' || substr(md5(word), 1, 8))::BIGINT % 512 AS b,
         |    count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
         |gb AS (SELECT b, sum(c)::BIGINT AS cb FROM sb GROUP BY b),
         |ns AS (SELECT source, sum(c)::BIGINT AS n_words,
         |    count(*)::BIGINT AS n_buckets FROM sb GROUP BY source),
         |tot AS (SELECT sum(cb)::DOUBLE AS n, count(*)::BIGINT AS g FROM gb),
         |grid AS (SELECT ns.source, ns.n_words, gb.cb,
         |    coalesce(sb.c, 0)::BIGINT AS csb
         |  FROM ns CROSS JOIN gb
         |  LEFT JOIN sb ON sb.source = ns.source AND sb.b = gb.b),
         |obs AS (SELECT source,
         |    sum(((csb + 1.0) / (n_words + 512))
         |        * ln(((csb + 1.0) / (n_words + 512))
         |             / ((cb + 1.0) / (t.n + 512)))) AS kl_obs
         |  FROM grid, tot t GROUP BY source)
         |SELECT ns.source, ns.n_words, ns.n_buckets,
         |  obs.kl_obs + (512 - t.g) * (1.0 / (ns.n_words + 512))
         |    * ln((1.0 / (ns.n_words + 512)) / (1.0 / (t.n + 512))) AS kl
         |FROM ns JOIN obs USING (source), tot t
         |ORDER BY ns.source""".stripMargin,

    // the naive global row_number window over (n_tok desc, doc_id) — the
    // Spark side computes the same rank with the distributed two-level
    // scan, so hash equality proves that scan exact under a heavily-tied,
    // payload-correlated sort key; bin totals replayed from the same rank
    "pipe_pack_fold" ->
      s"""WITH t AS (SELECT doc_id,
         |    len(string_split($normE, ' '))::BIGINT AS n_tok FROM documents),
         |r AS (SELECT doc_id, n_tok,
         |    (row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1)::BIGINT AS rnk
         |  FROM t),
         |b AS (SELECT doc_id, n_tok, rnk,
         |    (CASE WHEN (rnk // 32) % 2 = 0 THEN rnk % 32
         |          ELSE 31 - (rnk % 32) END)::BIGINT AS bin FROM r),
         |s AS (SELECT bin, sum(n_tok)::BIGINT AS bin_tokens FROM b GROUP BY bin)
         |SELECT b.doc_id, b.n_tok, b.rnk, b.bin, s.bin_tokens
         |FROM b JOIN s USING (bin) ORDER BY b.doc_id""".stripMargin,

    // chunk→doc fragment manifest rebuilt from the naive global window:
    // running-sum offsets, the doc's chunk range, and the boundary-split
    // slice arithmetic all replayed in SQL (zero-token docs excluded on
    // both sides)
    "pipe_pack_manifest" ->
      s"""WITH s AS (SELECT event_id::VARCHAR AS doc_id, ($lineE) AS line FROM events),
         |c AS (SELECT doc_id, length(line)::BIGINT AS n_tok,
         |    coalesce(sum(length(line)::BIGINT) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
         |  FROM s),
         |f AS (SELECT doc_id, n_tok, start_off,
         |    unnest(range(start_off // 2048, (start_off + n_tok - 1) // 2048 + 1)) AS chunk_id
         |  FROM c WHERE n_tok > 0)
         |SELECT chunk_id::BIGINT AS chunk_id, doc_id,
         |  (start_off + greatest(0, chunk_id*2048 - start_off) - chunk_id*2048)::BIGINT AS chunk_off,
         |  greatest(0, chunk_id*2048 - start_off)::BIGINT AS doc_off,
         |  (least(n_tok, (chunk_id+1)*2048 - start_off)
         |   - greatest(0, chunk_id*2048 - start_off))::BIGINT AS tok_len
         |FROM f ORDER BY chunk_id, doc_id""".stripMargin,

    // materialized packed chunks rebuilt the brute-force way: EVERY corpus
    // token exploded to its global stream index (running-sum offset +
    // within-doc position), regrouped by index div budget, array order =
    // the global index — so the emitted token arrays are compared
    // element-by-element, boundary-crossing docs included
    "pipe_pack_emit" ->
      s"""WITH s AS (SELECT event_id::VARCHAR AS doc_id, ($lineE) AS line FROM events),
         |c AS (SELECT doc_id, line,
         |    coalesce(sum(length(line)::BIGINT) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_off
         |  FROM s),
         |u AS (SELECT start_off, unnest(list_transform(range(0, length(line)),
         |    i -> {'i': i, 't': unicode(line[(i+1)::INT])})) AS tk FROM c),
         |g AS (SELECT (start_off + tk.i)::BIGINT AS gidx, tk.t AS tok FROM u)
         |SELECT (gidx // 2048)::BIGINT AS chunk_id, count(*)::BIGINT AS n_tok,
         |  list(tok ORDER BY gidx) AS tokens
         |FROM g GROUP BY 1 ORDER BY chunk_id""".stripMargin,

    // the scrub OUTPUT: same duplicated-start derivation as tok_scrub,
    // then the mask replayed with list filtering — tokens_clean itself is
    // hash-compared (sequences with no duplicated window pass through)
    "tok_scrub_clean" ->
      s"""WITH s AS (SELECT event_id::VARCHAR AS doc_id, ($lineE) AS line FROM events),
         |pg AS (SELECT doc_id, unnest(${tokGramPosListE(16)}) AS u FROM s),
         |g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM pg),
         |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |st AS (SELECT doc_id, pos FROM g JOIN d USING (gram)),
         |sa AS (SELECT doc_id, list(pos ORDER BY pos) AS starts FROM st GROUP BY doc_id)
         |SELECT s.doc_id,
         |  list_transform(
         |    list_filter(range(0, length(line)),
         |      i -> sa.starts IS NULL
         |           OR len(list_filter(sa.starts, x -> i >= x AND i < x + 16)) = 0),
         |    i -> unicode(line[(i+1)::INT])) AS tokens_clean
         |FROM s LEFT JOIN sa USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Gopher quality-rule verdict: the oracle replays the per-class
    // corpus augmentation AND all seven integer-arithmetic rules
    // (first-failing reason) — see Queries.txtGopher / TextAnalysis
    // .gopherVerdict for the rule order contract
    "txt_gopher" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000,
         |    CASE doc_id % 7
         |      WHEN 0 THEN '- ' || replace(text, ' ', chr(10) || '- ')
         |      WHEN 1 THEN replace(text, ' ', '...' || chr(10))
         |      WHEN 2 THEN replace(text, ' ', ' # ')
         |      WHEN 3 THEN regexp_replace(text, '[a-z]', '9', 'g')
         |      WHEN 4 THEN array_to_string(list_transform(string_split($normE, ' '),
         |        w -> CASE WHEN w IN ('the','a','data','table','value') THEN 'zz' ELSE w END), ' ')
         |      WHEN 5 THEN CASE WHEN doc_id % 2 = 0
         |        THEN array_to_string(list_slice(string_split($normE, ' '), 1, 3), ' ')
         |        ELSE repeat(text || ' ', 12) END
         |      ELSE replace(text, ' ', 'xxxxxxxxxxxx ') END
         |  FROM documents),
         |c AS (SELECT doc_id, text,
         |    string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS ws,
         |    string_split(text, chr(10)) AS lines
         |  FROM aug),
         |k AS (SELECT doc_id,
         |  coalesce(len(ws), 0)::INT AS n_words,
         |  coalesce(len(lines), 0)::INT AS n_lines,
         |  coalesce(len(list_filter(lines, l -> starts_with(l, '- ')
         |    OR starts_with(l, '* ') OR starts_with(l, '•'))), 0)::INT AS n_bullet_lines,
         |  coalesce(len(list_filter(lines, l -> ends_with(l, '...')
         |    OR ends_with(l, '…'))), 0)::INT AS n_ellipsis_lines,
         |  coalesce((length(text) - length(replace(text, '#', '')))
         |    + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS INT), 0)::INT AS n_symbols,
         |  coalesce(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))), 0)::INT AS n_alpha_words,
         |  coalesce(list_sum(list_transform(ws, w -> length(w)::BIGINT)), 0)::BIGINT AS sum_word_chars,
         |  coalesce(len(list_distinct(list_filter(ws,
         |    w -> w IN ('the','a','data','table','value')))), 0)::INT AS n_stop_distinct
         | FROM c)
         |SELECT doc_id, n_words, n_lines, n_bullet_lines, n_ellipsis_lines,
         |  n_symbols, n_alpha_words, sum_word_chars, n_stop_distinct,
         |  CASE WHEN n_words < 8 OR n_words > 600 THEN 'word_count'
         |       WHEN n_bullet_lines * 10 > n_lines THEN 'bullet_lines'
         |       WHEN n_ellipsis_lines * 10 > n_lines * 3 THEN 'ellipsis_lines'
         |       WHEN n_symbols * 10 > n_words THEN 'symbol_ratio'
         |       WHEN n_alpha_words * 5 < n_words * 4 THEN 'alpha_words'
         |       WHEN sum_word_chars < n_words * 3 OR sum_word_chars > n_words * 10 THEN 'mean_word_len'
         |       WHEN n_stop_distinct < 2 THEN 'stop_words'
         |       ELSE 'pass' END AS fail_reason
         |FROM k ORDER BY doc_id""".stripMargin,

    // exact per-source length quantiles: the oracle replays the identical
    // histogram-cumsum ceil-rank order statistic (percentile_disc
    // semantics), integer-only
    "txt_lenq" ->
      s"""WITH h AS (SELECT source AS grp, n_chars AS v, count(*)::BIGINT AS c
         |  FROM documents GROUP BY 1, 2),
         |cum AS (SELECT grp, v, c,
         |  sum(c) OVER (PARTITION BY grp ORDER BY v)::BIGINT AS cum,
         |  sum(c) OVER (PARTITION BY grp)::BIGINT AS n FROM h),
         |x AS (SELECT grp, v, cum, n, unnest([25, 50, 75, 90, 99]) AS q_pct FROM cum)
         |SELECT grp AS source, q_pct::INT AS q_pct, min(v)::BIGINT AS value,
         |  min(n)::BIGINT AS n_rows
         |FROM x WHERE cum * 100 >= q_pct * n
         |GROUP BY 1, 2 ORDER BY source, q_pct""".stripMargin,

    // BM25 top-k: tokenization, tf/df/N/avgdl and the Okapi formula
    // replayed token-for-token with Retrieval.bm25TopK's operand order
    // (ln precedent: txt_lm_ppl); per-(query,doc) term scores fold in
    // ascending-term order on both sides so the double addition order is
    // pinned; floor(score·1e6) compared
    "txt_bm25" ->
      s"""WITH base AS (SELECT doc_id,
         |    string_split($normE, ' ') AS ws,
         |    coalesce(len(string_split($normE, ' ')), 0)::INT AS dl
         |  FROM documents),
         |stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl::BIGINT)::BIGINT AS sum_dl FROM base),
         |q(query_id, term) AS (VALUES (1, 'spark'), (1, 'join'), (2, 'window'),
         |  (2, 'agg'), (2, 'stream'), (3, 'customer'), (3, 'value')),
         |m AS (SELECT doc_id, dl, unnest(list_filter(ws, w -> w IN
         |    ('spark','join','window','agg','stream','customer','value'))) AS term
         |  FROM base),
         |tf AS (SELECT doc_id, dl, term, count(*)::BIGINT AS tf FROM m GROUP BY 1, 2, 3),
         |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |pt AS (SELECT q.query_id, tf.doc_id, tf.term,
         |    ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
         |      * (tf.tf * (1.2 + 1.0)) /
         |      (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl / (stats.sum_dl / stats.n_docs))) AS score_t
         |  FROM tf JOIN dfq USING (term) JOIN q ON q.term = tf.term CROSS JOIN stats),
         |s AS (SELECT query_id, doc_id,
         |    list_reduce(list(score_t ORDER BY term), (a, b) -> a + b) AS score,
         |    count(*)::BIGINT AS n_terms_hit
         |  FROM pt GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id, score, n_terms_hit,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM s)
         |SELECT query_id, doc_id, rank::INT AS rank,
         |  CAST(floor(score * 1000000.0) AS BIGINT) AS score_e6, n_terms_hit
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // sliding-window chunking: the oracle replays the stride grid
    // (every stride-aligned start below the word count, one chunk for an
    // empty doc), the slice arithmetic and the short tail chunk — DuckDB
    // range() excludes its upper bound and list_slice is inclusive-end,
    // hence the +1 / +11 offsets mirroring Spark's sequence/slice
    "txt_chunks" ->
      s"""WITH c AS (SELECT doc_id, string_split($normE, ' ') AS ws
         |  FROM documents),
         |s AS (SELECT doc_id, ws,
         |    unnest(range(0, greatest(len(ws) - 1, 0) + 1, 8)) AS tok_start
         |  FROM c)
         |SELECT doc_id, (tok_start // 8)::INT AS chunk_ix,
         |  tok_start::INT AS tok_start,
         |  len(list_slice(ws, tok_start + 1, tok_start + 12))::INT AS n_tok,
         |  array_to_string(list_slice(ws, tok_start + 1, tok_start + 12), ' ')
         |    AS chunk_text
         |FROM s ORDER BY doc_id, chunk_ix""".stripMargin,

    // deterministic split: the oracle replays the md5 hash-band
    // arithmetic (first 32 bits of md5(id || seed) mod 100) and the
    // cumulative 80/90 band edges
    "pipe_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, source,
        |    ('0x' || substr(md5(doc_id::VARCHAR || 'r5'), 1, 8))::BIGINT % 100 AS h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // stratified fixed-size sample: the oracle IS the naive per-source
    // window over md5(id || seed) - equality proves the salted two-phase
    // rank exact
    "pipe_stratified" ->
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR || 'r5') ASC, doc_id ASC) AS sample_rank
        |  FROM documents)
        |SELECT doc_id, source, sample_rank::INT AS sample_rank
        |FROM r WHERE sample_rank <= 10
        |ORDER BY source, sample_rank""".stripMargin)

  /** DuckDB replica of the [[graft.ops.OpsKernels.wordShingles]] contract:
    * distinct word n-grams of the normalized text; fewer than n words ⇒
    * the whole normalized text as the single shingle. */
  // PII pattern strings shared verbatim with ops.TextAnalysis.redactPii
  private val emailRe = graft.ops.TextAnalysis.PiiPatterns(0)._2
  private val ipv4Re = graft.ops.TextAnalysis.PiiPatterns(1)._2
  private val idnumRe = graft.ops.TextAnalysis.PiiPatterns(2)._2

  /** DuckDB replica of the [[graft.ops.TokenOps.tokenNgrams]] contract
    * over codepoint token streams: every window of n consecutive
    * codepoints of `line`, comma-joined. range(0, len-n+1) is empty for
    * lines shorter than n — same as the Spark side's empty-array guard. */
  /** The tok_bpe oracle: replay `rounds` full BPE rounds in SQL. Per
    * round r over the previous corpus d{r-1}: adjacency pair counts
    * (overlaps included) → argmax with the (n DESC, a, b) tie-break →
    * the GREEDY left-to-right merge via run-parity (consecutive
    * candidate positions — only possible when a=b — form islands;
    * greedy keeps the 1st, 3rd, … of each island) → corpus rebuild
    * (kept position → new id, its successor dropped, everything else
    * verbatim). Every multiply-referenced CTE is MATERIALIZED — DuckDB
    * inlines CTEs by default, and d{r-1} is referenced 3× per round, so
    * an un-hinted chain re-derives the base explosion 3^rounds times
    * (measured: the inlined form ran >100 CPU-min / 32 GB at sf0.01;
    * materialized it's seconds). */
  private def bpeOracleSql(rounds: Int, vocabBase: Int): String = {
    val sb = new StringBuilder
    sb ++= bpeChainSql(rounds, vocabBase)
    sb ++= (1 to rounds).map { r =>
      s"""SELECT ${r}::BIGINT AS round, a::BIGINT AS a, b::BIGINT AS b,
         |  n::BIGINT AS n_pairs, ${vocabBase + r}::BIGINT AS new_id,
         |  (SELECT sum(len(ts)) FROM d$r)::BIGINT AS n_tok_after
         |FROM m$r""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY round")
    sb.toString
  }

  /** The tok_bpe_apply oracle: the SAME round chain, but the result is
    * the final rewritten corpus itself — encoded token arrays compared
    * element-by-element. */
  private def bpeApplyOracleSql(rounds: Int, vocabBase: Int): String =
    bpeChainSql(rounds, vocabBase) +
      s"""SELECT doc_id, len(ts)::BIGINT AS n_tok, ts AS tokens
         |FROM d$rounds ORDER BY doc_id""".stripMargin

  /** The ev_pagerank oracle: replay every power-iteration round in
    * integer SQL — edge build + out-weights once, then per round the
    * inflow join-sum and the teleport/damping fold. `//` and Spark's
    * `div` agree on the non-negative operands here. */
  private def pageRankOracleSql(iters: Int): String = {
    val base = 1000000L
    val damp = 85
    val teleport = base * (100 - damp) / 100
    val sb = new StringBuilder
    sb ++= s"""WITH ut AS MATERIALIZED (
              |  SELECT 'u:' || user_id::VARCHAR AS src, 't:' || event_type AS dst,
              |    count(*)::BIGINT AS w
              |  FROM events GROUP BY 1, 2),
              |ed AS MATERIALIZED (
              |  SELECT src, dst, w FROM ut UNION ALL SELECT dst, src, w FROM ut),
              |ow AS (SELECT src, sum(w)::BIGINT AS outw FROM ed GROUP BY 1),
              |e AS MATERIALIZED (
              |  SELECT ed.src, ed.dst, ed.w, ow.outw FROM ed JOIN ow USING (src)),
              |n AS MATERIALIZED (SELECT DISTINCT node FROM
              |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
              |r0 AS (SELECT node, ${base}::BIGINT AS pr FROM n),
              |""".stripMargin
    for (i <- 1 to iters) {
      sb ++= s"""f$i AS (SELECT e.dst, sum((r.pr * e.w) // e.outw)::BIGINT AS inflow
                |  FROM e JOIN r${i - 1} r ON r.node = e.src GROUP BY 1),
                |r$i AS MATERIALIZED (SELECT n.node,
                |    ($teleport + ($damp * coalesce(f$i.inflow, 0)) // 100)::BIGINT AS pr
                |  FROM n LEFT JOIN f$i ON f$i.dst = n.node),
                |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop the last CTE's trailing ",\n"
    sb ++= "\n"
    sb ++= s"SELECT node, pr FROM r$iters ORDER BY node"
    sb.toString
  }

  /** The shared WITH-chain: d0 = codepoint corpus, then per round the
    * pair counts / argmax / greedy-keep / rebuild CTEs, ending after
    * d`rounds`. */
  private def bpeChainSql(rounds: Int, vocabBase: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH d0 AS MATERIALIZED (
              |  SELECT event_id::VARCHAR AS doc_id,
              |    list_transform(generate_series(1, len(line)),
              |      i -> unicode(substr(line, i::INT, 1))) AS ts
              |  FROM (SELECT event_id, ($lineE) AS line FROM events)),
              |""".stripMargin
    for (r <- 1 to rounds) {
      val nid = vocabBase + r
      sb ++= s"""p$r AS (
                |  SELECT ts[u.i] AS a, ts[u.i+1] AS b, count(*) AS n
                |  FROM d${r - 1}, UNNEST(generate_series(1, len(ts)-1)) AS u(i)
                |  GROUP BY 1, 2),
                |m$r AS MATERIALIZED (SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1),
                |c$r AS (
                |  SELECT d.doc_id, u.i AS pos
                |  FROM d${r - 1} d, m$r m, UNNEST(generate_series(1, len(d.ts)-1)) AS u(i)
                |  WHERE d.ts[u.i] = m.a AND d.ts[u.i+1] = m.b),
                |k$r AS MATERIALIZED (
                |  SELECT doc_id, pos FROM (
                |    SELECT doc_id, pos,
                |      row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS rr
                |    FROM (SELECT doc_id, pos,
                |        row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
                |      FROM c$r))
                |  WHERE rr % 2 = 1),
                |x$r AS (
                |  SELECT d.doc_id, u.i AS i, d.ts[u.i] AS tok
                |  FROM d${r - 1} d, UNNEST(generate_series(1, len(d.ts))) AS u(i)),
                |d$r AS MATERIALIZED (
                |  SELECT x.doc_id,
                |    list(CASE WHEN k.pos IS NOT NULL THEN $nid ELSE x.tok END
                |      ORDER BY x.i) AS ts
                |  FROM x$r x
                |  LEFT JOIN k$r k ON k.doc_id = x.doc_id AND k.pos = x.i
                |  LEFT JOIN k$r k2 ON k2.doc_id = x.doc_id AND k2.pos = x.i - 1
                |  WHERE k2.pos IS NULL
                |  GROUP BY x.doc_id),
                |""".stripMargin
    }
    sb.setLength(sb.length - 2) // drop the last CTE's trailing ",\n"
    sb ++= "\n"
    sb.toString
  }

  private def tokGramListE(n: Int): String = {
    val gram = (1 to n)
      .map(j => s"unicode(substr(line, (i+$j)::INT, 1))::VARCHAR")
      .mkString(" || ',' || ")
    s"list_transform(range(0, len(line) - ${n - 1}), i -> $gram)"
  }

  /** [[tokGramListE]] with window-start positions: a list of
    * {'pos', 'gram'} structs, one per n-token window of `line`. */
  private def tokGramPosListE(n: Int): String = {
    val gram = (1 to n)
      .map(j => s"unicode(substr(line, (i+$j)::INT, 1))::VARCHAR")
      .mkString(" || ',' || ")
    s"list_transform(range(0, len(line) - ${n - 1}), i -> {'pos': i, 'gram': $gram})"
  }

  /** one Lloyd half-round in DuckDB SQL: cosine of every vector against
    * every centroid in `cents`, arg-max assignment with ties to the
    * smaller cid — kmeansAssign's max(struct(sim, -cid)) rule. */
  private def kmeansRoundE(simCte: String, asgCte: String, vecs: String,
      cents: String): String =
    s"""$simCte AS (SELECT a.id, c.cid,
       |    list_dot_product(a.v, c.cv) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS sim
       |  FROM $vecs a, $cents c),
       |$asgCte AS (SELECT id, cid, sim FROM (SELECT id, cid, sim,
       |    row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid ASC) AS rn
       |  FROM $simCte) WHERE rn = 1)""".stripMargin

  /** the Lloyd centroid update in DuckDB SQL: per-(cluster, dimension)
    * member mean, re-listed in dimension order. */
  private def kmeansMeansE(asgCte: String, mCte: String,
      cCte: String): String =
    s"""$mCte AS (SELECT $asgCte.cid, t.i AS pos, avg(v.v[t.i + 1]) AS m
       |  FROM $asgCte JOIN v USING (id) CROSS JOIN range(0, 64) t(i)
       |  GROUP BY $asgCte.cid, t.i),
       |$cCte AS (SELECT cid, list(m ORDER BY pos) AS cv FROM $mCte GROUP BY cid)""".stripMargin

  private def shingleListE(n: Int): String = {
    val gram = (1 to n).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""list_distinct(CASE WHEN len(ws) < $n THEN [norm]
       |    ELSE list_transform(range(0, len(ws) - ${n - 1}), i -> $gram) END)""".stripMargin
  }
}
