package graft

import graft.operators.{IngestParityQueries => IP, RelationalQueries => R,
  TextQueries => T, VectorQueries => V}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB oracle in [[oracleSql]] (same
  * column names, deterministic values — see RelationalQueries scaladoc for
  * the determinism rules). Keys map to SURVEY §2 operators:
  *   s1_s2 (hive TSV scan + partition-overwrite sink + landing DDL),
  *   j1/o1 (job machine, workflow), p1/p2 (partition codec, last-hour),
  *   q1-q11 (§2.2 checklist categories: agg, filter/project, joins,
  *   window, top-k, set ops, semi/anti, rollup, scalar fns, distinct,
  *   hourly time bucketing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    R.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_s2_ingest_roundtrip" -> (IP.s1s2IngestRoundtrip _),
    "j1_job_lifecycle" -> (IP.j1JobLifecycle _),
    "o1_workflow" -> (IP.o1Workflow _),
    "p1_partition_codec" -> (R.p1PartitionCodec _),
    "p2_last_hour" -> (R.p2LastHour _),
    "q1_agg" -> (R.q1Agg _),
    "q2_filter_project" -> (R.q2FilterProject _),
    "q3_join_agg" -> (R.q3JoinAgg _),
    "q4_window" -> (R.q4Window _),
    "q5_topk" -> (R.q5TopK _),
    "q6_setops" -> (R.q6SetOps _),
    "q7_semi_anti" -> (R.q7SemiAnti _),
    "q8_rollup" -> (R.q8Rollup _),
    "q9_scalar" -> (R.q9Scalar _),
    "q10_distinct" -> (R.q10Distinct _),
    "q11_hourly_window" -> (R.q11HourlyWindow _),
    "d1_dedup_exact" -> (T.d1DedupExact _),
    "d2_text_stats" -> (T.d2TextStats _),
    "d3_quality_score" -> (T.d3QualityScore _),
    "d4_lang_score" -> (T.d4LangScore _),
    "d5_fingerprint" -> (T.d5Fingerprint _),
    "d6_token_freq" -> (T.d6TokenFreq _),
    "e1_norms" -> (V.e1Norms _),
    "e2_knn_brute" -> ((s, d) => V.e2KnnBrute(s, d)),
    "e3_lsh_buckets" -> ((s, d) => V.e3LshBuckets(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "s1_s2_ingest_roundtrip" ->
      """SELECT date_trunc('hour', ts) AS hour_ts,
        | count(*) AS cnt,
        | CAST(sum(user_id) AS BIGINT) AS sum_uid,
        | CAST(sum(event_id) AS BIGINT) AS sum_eid,
        | CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts,
        | CAST(sum(length(props)) AS BIGINT) AS props_len
        |FROM events GROUP BY date_trunc('hour', ts)""".stripMargin,
    "j1_job_lifecycle" ->
      """SELECT 'SUCCESS' AS state, 2 AS state_code, count(*) AS rows_loaded
        |FROM events
        |WHERE date_trunc('hour', ts) = (SELECT min(date_trunc('hour', ts)) FROM events)""".stripMargin,
    "o1_workflow" ->
      ("SELECT 'existing_hour' AS run, 2 AS status_code " +
        "UNION ALL SELECT 'absent_hour', 0"),
    "p1_partition_codec" ->
      """SELECT event_id,
        | strftime(ts, '%Y%m%d%H') AS bq_id,
        | 'year=' || strftime(ts, '%Y') || '/month=' || strftime(ts, '%m') ||
        | '/day=' || strftime(ts, '%d') || '/hour=' || strftime(ts, '%H') AS hive_path
        |FROM events""".stripMargin,
    "p2_last_hour" ->
      """SELECT event_id,
        | strftime(date_trunc('hour', ts) - INTERVAL 1 HOUR, '%Y%m%d%H') AS prev_hour_id
        |FROM events""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_discount > 0.08 AND l_quantity < 5.0""".stripMargin,
    "q3_join_agg" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
        | count(*) AS line_cnt
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q4_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) t WHERE rn <= 3""".stripMargin,
    "q5_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q6_setops" ->
      """SELECT 'except' AS op, c_custkey FROM (
        | SELECT c_custkey FROM customer WHERE c_acctbal > 0
        | EXCEPT
        | SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F') e
        |UNION ALL
        |SELECT 'intersect' AS op, c_custkey FROM (
        | SELECT c_custkey FROM customer WHERE c_acctbal > 0
        | INTERSECT
        | SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F') i""".stripMargin,
    "q7_semi_anti" ->
      """SELECT 'has_orders' AS op, c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_orders' AS op, c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q8_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS cnt,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)""".stripMargin,
    "q9_scalar" ->
      """SELECT p_partkey,
        | upper(p_brand) AS brand_u,
        | substr(p_name, 1, 5) AS name5,
        | length(p_type) AS type_len,
        | p_size % 7 AS size_mod,
        | abs(p_retailprice - 1000.0) AS price_dist,
        | p_brand || '|' || p_type AS brand_type
        |FROM part""".stripMargin,
    "q10_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS uniq_cust,
        | count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q11_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS cnt,
        | CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
        | count(DISTINCT user_id) AS uniq_users
        |FROM events GROUP BY date_trunc('hour', ts)""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        | count(*) AS dup_cnt
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "d2_text_stats" ->
      """SELECT doc_id, length(text) AS len,
        | len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        | length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS punct_cnt,
        | length(regexp_replace(text, '[^aeiou]', '', 'g')) AS vowel_cnt,
        | CAST(length(text) AS DOUBLE) /
        |   len(string_split_regex(trim(text), '\s+')) AS chars_per_token
        |FROM documents""".stripMargin,
    "d3_quality_score" ->
      """SELECT doc_id,
        | (CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1 ELSE 0 END +
        |  CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 10 THEN 1 ELSE 0 END +
        |  CASE WHEN len(regexp_extract_all(text, '\bthe\b')) > 0 THEN 1 ELSE 0 END)
        |   AS quality_score,
        | len(regexp_extract_all(text, '\bthe\b')) AS stop_the_cnt
        |FROM documents""".stripMargin,
    "d4_lang_score" ->
      """SELECT doc_id, lang,
        | len(regexp_extract_all(lower(text), '\b(the|and|of)\b')) AS score_stop,
        | len(regexp_extract_all(lower(text), '\b(fast|slow|small)\b')) AS score_adj,
        | len(regexp_extract_all(lower(text), '\b(data|table|row)\b')) AS score_data,
        | CASE
        |  WHEN len(regexp_extract_all(lower(text), '\b(the|and|of)\b')) >=
        |       len(regexp_extract_all(lower(text), '\b(fast|slow|small)\b'))
        |   AND len(regexp_extract_all(lower(text), '\b(the|and|of)\b')) >=
        |       len(regexp_extract_all(lower(text), '\b(data|table|row)\b'))
        |   THEN 'stopword'
        |  WHEN len(regexp_extract_all(lower(text), '\b(fast|slow|small)\b')) >=
        |       len(regexp_extract_all(lower(text), '\b(data|table|row)\b'))
        |   THEN 'adjective'
        |  ELSE 'dataword' END AS profile
        |FROM documents""".stripMargin,
    "d5_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(string_split_regex(trim(text), '\s+')), ' '))
        |   AS bow_fingerprint
        |FROM documents""".stripMargin,
    "d6_token_freq" ->
      """SELECT token, count(*) AS cnt FROM (
        | SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        | FROM documents) t
        |GROUP BY token HAVING count(*) >= 10""".stripMargin,
    "e1_norms" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        | sqrt(list_aggregate(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS l2_norm,
        | list_aggregate(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE)), 'sum') / len(embedding) AS mean_val
        |FROM embeddings""".stripMargin,
    "e2_knn_brute" ->
      """WITH dots AS (
        | SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |  CAST(
        |   list_aggregate(list_transform(range(1, len(q.embedding)+1),
        |     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)), 'sum') /
        |   (sqrt(list_aggregate(list_transform(q.embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
        |    sqrt(list_aggregate(list_transform(n.embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
        |  AS DECIMAL(20,6)) AS sim_dec
        | FROM embeddings q, embeddings n
        | WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id),
        |ranked AS (
        | SELECT query_id, neighbor_id, sim_dec,
        |  row_number() OVER (PARTITION BY query_id
        |                     ORDER BY sim_dec DESC, neighbor_id ASC) AS rank
        | FROM dots)
        |SELECT query_id, rank, neighbor_id, CAST(sim_dec AS DOUBLE) AS cos_sim
        |FROM ranked WHERE rank <= 5""".stripMargin,
    "e3_lsh_buckets" ->
      """WITH sigs AS (
        | SELECT vec_id,
        |  concat(
        |   CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
        |   CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
        |   CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
        |   CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
        |   CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
        |   CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
        |   CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
        |   CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket
        | FROM embeddings)
        |SELECT a.bucket AS bucket, count(*) AS candidate_pairs,
        | CAST(min(a.vec_id) AS INT) AS min_id, CAST(max(b.vec_id) AS INT) AS max_id
        |FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |GROUP BY a.bucket""".stripMargin,
  )
}
