package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Wide↔long reshaping (SURVEY §2.10): stack/unpivot, explode, JSON-line
  * extraction, derived-row unions — the shapes the reference's inspector
  * parsers produce (U1-U7), mapped onto the harness tables. All map-side
  * (no shuffle) except the final presentation sort. */
object ReshapeQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // ---- U1: fixed-key map → rows (passmark-style unpivot via stack)
    "u1_stack_unpivot" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          expr("stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice)")
            .as(Seq("metric", "value")))
        .orderBy(col("p_partkey"), col("metric"))
    }),

    // ---- U2: nested structure → rows (explode)
    "u2_explode_tokens" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"), explode(split(col("p_name"), "\\s+")).as("word"))
        .orderBy(col("p_partkey"), col("word"))
    }),

    // ---- U6: JSON-per-line extraction (llm_speed JSONL shape)
    "u6_json_props" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k_val"))
        .orderBy(col("event_id"))
    }),

    // ---- U7: derived-metric rows unioned beside measured ones
    "u7_derived_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
      val measured = ev.select(col("event_id"), col("value"), lit("measured").as("kind"))
      val derived = ev.select(col("event_id"),
        round(col("value") * 2, 2).as("value"), lit("extrapolated").as("kind"))
      measured.unionByName(derived).orderBy(col("event_id"), col("kind"))
    }),

    // ---- U5: first-crossing synthesis (membench RAM-scope shape): per
    //      user, the first event whose running total value crosses 1000
    "u5_first_crossing" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("running", sum(col("value")).over(w))
        .filter(col("running") >= 1000)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), round(col("running"), 2).as("running"))
        .orderBy(col("user_id"))
    }))

  val oracle: Map[String, String] = Map(
    "u1_stack_unpivot" ->
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part)
        |ORDER BY p_partkey, metric""".stripMargin,
    "u2_explode_tokens" ->
      """SELECT p_partkey, unnest(regexp_split_to_array(p_name, '\s+')) AS word
        |FROM part ORDER BY p_partkey, word""".stripMargin,
    "u6_json_props" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "u7_derived_union" ->
      """SELECT event_id, value, kind FROM (
        |  SELECT event_id, value, 'measured' AS kind FROM events
        |  WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT event_id, ROUND(value * 2, 2) AS value, 'extrapolated' AS kind FROM events
        |  WHERE event_type = 'purchase')
        |ORDER BY event_id, kind""".stripMargin,
    "u5_first_crossing" ->
      """SELECT user_id, event_id, ROUND(running, 2) AS running FROM (
        |  SELECT user_id, event_id, running,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |    FROM events)
        |  WHERE running >= 1000)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)
}
