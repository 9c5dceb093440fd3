package graft.queries

import graft.{GQuery, Tables}
import graft.functions.ScalarFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface (SURVEY.md §2.4) exercised on the testdata
  * tables with DuckDB oracles. String-formatting outputs are restricted
  * to representations both engines print identically (ints, %02d padding,
  * explicit string concat); float→string formatting parity is covered by
  * ScalaTest golden tests instead. */
object Scalars {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** F1: epoch → timestamp conversion (µs-preserving), shown as epoch µs
    * to avoid cross-engine timestamp-printing differences. */
  val f1Epoch: GQuery = GQuery(
    "f1_epoch_to_timestamp",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          unix_micros(nanosToTimestamp(col("ts_ns"))).as("ts_us"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id, epoch_us(ts) AS ts_us
            FROM events ORDER BY event_id"""))

  /** F2/F3: coercing casts — try_cast semantics (null on bad input).
    * props is a JSON string; extract k via regexp (S4-adjacent) and
    * coerce; also coerce an intentionally-bad slice to prove null-on-
    * failure parity. */
  val f3Coerce: GQuery = GQuery(
    "f3_numeric_coerce",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1)
            .try_cast("int").as("k"),
          col("event_type").try_cast("double").as("bad_num"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
            TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k,
            TRY_CAST(event_type AS DOUBLE) AS bad_num
            FROM events ORDER BY event_id"""))

  /** S4-analog: JSON envelope decode with from_json (the Debezium-payload
    * pattern, bronze/consume_data2.py:33-35) — DuckDB oracle uses regexp
    * on the same field. */
  val s4Json: GQuery = GQuery(
    "s4_json_decode",
    (s, d) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      ev(s, d)
        .select(
          col("event_id"),
          from_json(col("props"), schema).getField("k").as("k"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
            TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
            FROM events ORDER BY event_id"""))

  /** F4: null-fill + cast (fillna(0).astype(int) analog) on a column made
    * partially null. DuckDB double→int cast rounds while Spark truncates,
    * so both sides floor() first (explicit, documented divergence-guard). */
  val f4FillCast: GQuery = GQuery(
    "f4_fill_cast",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          fillCastInt(floor(when(col("value") > 100, col("value")))).as("big_value"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
            CAST(coalesce(floor(CASE WHEN value > 100 THEN value END), 0) AS INT)
              AS big_value
            FROM events ORDER BY event_id"""))

  /** F6: elapsed seconds between consecutive events per user (lag/lead
    * window + µs-exact difference). */
  val f6Elapsed: GQuery = GQuery(
    "f6_elapsed_seconds",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      ev(s, d)
        .withColumn("next_ns", lead(col("ts_ns"), 1).over(w))
        .select(
          col("event_id"),
          ((col("next_ns") - col("ts_ns")) / lit(1000000000L)).cast("long")
            .as("gap_s"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
            CAST(floor((epoch_ns(next_ts) - epoch_ns(ts)) / 1e9) AS BIGINT) AS gap_s
            FROM (
              SELECT event_id, ts,
                     lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS next_ts
              FROM events) ORDER BY event_id"""))

  /** F7: integer seconds → zero-padded HH:MM:SS (%02d is identical in
    * Java format_string and DuckDB printf). */
  val f7Hms: GQuery = GQuery(
    "f7_seconds_to_hms",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          secondsToHms(floor(col("value") * 60)).as("hms"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
            printf('%02d:%02d:%02d',
                   CAST(floor(value * 60) AS BIGINT) // 3600,
                   (CAST(floor(value * 60) AS BIGINT) % 3600) // 60,
                   CAST(floor(value * 60) AS BIGINT) % 60) AS hms
            FROM events ORDER BY event_id"""))

  /** F8: French humanized duration — pure Column when/concat chain. */
  val f8French: GQuery = GQuery(
    "f8_french_duration",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          frenchDuration(floor(col("value") * 1000).cast("long")).as("duree"))
        .orderBy(col("event_id")),
    Some("""WITH t AS (SELECT event_id,
              CAST(floor(value * 1000) AS BIGINT) AS s FROM events),
            p AS (SELECT event_id, s,
              s // 86400 AS d, (s % 86400) // 3600 AS h, (s % 3600) // 60 AS m
              FROM t)
            SELECT event_id,
              CASE WHEN s < 60 THEN 'quelques secondes'
              ELSE array_to_string(list_filter([
                CASE WHEN d > 1 THEN d || ' jours'
                     WHEN d > 0 THEN d || ' jour' END,
                CASE WHEN h > 1 THEN h || ' heures'
                     WHEN h > 0 THEN h || ' heure' END,
                CASE WHEN m > 1 THEN m || ' minutes'
                     WHEN m > 0 THEN m || ' minute' END], x -> x IS NOT NULL),
                ' et ') END AS duree
            FROM p ORDER BY event_id"""))

  /** F10/F11: code → display-name lookup with default (literal map,
    * element_at — no join, no UDF). */
  val f10Lookup: GQuery = GQuery(
    "f10_code_lookup",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          codeLookup(col("event_type"),
            Map("click" -> "clic", "view" -> "vue", "purchase" -> "achat"),
            "activité").as("type_fr"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
            CASE event_type WHEN 'click' THEN 'clic' WHEN 'view' THEN 'vue'
                 WHEN 'purchase' THEN 'achat' ELSE 'activité' END AS type_fr
            FROM events ORDER BY event_id"""))

  /** F12: message-template concat with optional parts (int/string only). */
  val f12Template: GQuery = GQuery(
    "f12_message_template",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          activityMessage(
            lit("🏃"), col("user_id"),
            col("event_type"),
            when(col("value") > 50, concat(floor(col("value")).cast("long").cast("string"), lit(" m"))),
            secondsToHms(floor(col("value") * 60)),
            when(col("event_type") === "error", lit("oops"))).as("msg"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
            '🏃 Bravo ' || user_id || ' ! Tu viens de faire une session de '
            || event_type
            || CASE WHEN value > 50
                 THEN ' sur ' || CAST(floor(value) AS BIGINT) || ' m' ELSE '' END
            || ' en ' || printf('%02d:%02d:%02d',
                   CAST(floor(value * 60) AS BIGINT) // 3600,
                   (CAST(floor(value * 60) AS BIGINT) % 3600) // 60,
                   CAST(floor(value * 60) AS BIGINT) % 60)
            || ' !'
            || CASE WHEN event_type = 'error'
                 THEN ' Avec le commentaire : oops' ELSE '' END AS msg
            FROM events ORDER BY event_id"""))

  /** F13/F14/F15: normalize + category flags + range-conditional flag
    * (the commute business rules re-expressed on part). */
  val f14Flags: GQuery = GQuery(
    "f14_category_flags",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          normalized(col("p_type")).as("type_norm"),
          substring_index(col("p_type"), " ", 1).isin("PROMO", "ECONOMY")
            .as("is_cheap_line"),
          when(lower(col("p_type")).startsWith("promo"), col("p_size") > 25)
            .when(lower(col("p_type")).startsWith("standard"), col("p_size") > 40)
            .otherwise(lit(false)).as("is_large_for_type"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, lower(trim(p_type)) AS type_norm,
            split_part(p_type, ' ', 1) IN ('PROMO', 'ECONOMY') AS is_cheap_line,
            CASE WHEN lower(p_type) LIKE 'promo%' THEN p_size > 25
                 WHEN lower(p_type) LIKE 'standard%' THEN p_size > 40
                 ELSE false END AS is_large_for_type
            FROM part ORDER BY p_partkey"""))

  /** F16: dense sequential id over a defined order. */
  val f16SeqId: GQuery = GQuery(
    "f16_sequential_id",
    (s, d) =>
      Tables.nation(s, d)
        .withColumn("seq_id",
          row_number().over(Window.orderBy(col("n_name"))))
        .select(col("seq_id"), col("n_name"))
        .orderBy(col("seq_id")),
    Some("""SELECT row_number() OVER (ORDER BY n_name) AS seq_id, n_name
            FROM nation ORDER BY seq_id"""))

  /** F17: timestamp interval arithmetic (± seconds/days), µs-exact. */
  val f17Interval: GQuery = GQuery(
    "f17_interval_add",
    (s, d) =>
      ev(s, d)
        .select(
          col("event_id"),
          unix_micros(addSeconds(col("ts"), lit(90))).as("plus_90s_us"),
          unix_micros(addDays(col("ts"), lit(1))).as("plus_1d_us"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
            epoch_us(ts + INTERVAL 90 SECOND) AS plus_90s_us,
            epoch_us(ts + INTERVAL 1 DAY) AS plus_1d_us
            FROM events ORDER BY event_id"""))

  val all: Seq[GQuery] = Seq(
    f1Epoch, f3Coerce, s4Json, f4FillCast, f6Elapsed, f7Hms, f8French,
    f10Lookup, f12Template, f14Flags, f16SeqId, f17Interval)
}
