package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{exact, text}
import graft.operators.Curation

/** Oracle-checked queries for the curation operator set: sessionization,
  * boilerplate spans, benchmark contamination, stratified sampling, KMV
  * distinct estimation, embedding QA, weighted source mixing, and
  * JSON-property extraction. Numerics follow the graft.functions.exact
  * rules (integer microseconds, decimal sums, basis points) so every
  * query is engine-exact.
  */
object CurationQueries {

  import CoreQueries.t

  /** DuckDB fragments (mirroring TextQueries). */
  private val dTok = raw"string_split_regex(trim(text), '\s+')"
  private def dShingles(n: Int, tl: String = "t"): String =
    s"CASE WHEN len($tl) < $n THEN [array_to_string($tl, ' ')] " +
      s"ELSE list_transform(generate_series(0, len($tl) - $n), " +
      s"i -> array_to_string($tl[i+1:i+$n], ' ')) END"
  private def dHash32u(e: String): String =
    s"('0x' || substr(md5($e), 1, 8))::BIGINT"
  private def dHash32(seed: Int, e: String): String =
    s"('0x' || substr(md5('$seed:' || $e), 1, 8))::BIGINT"

  /** Distinct 5-gram shingle-hash pairs (doc_id, h) as a DuckDB CTE. */
  private def dShingleHashes(where: String = ""): String =
    s"""sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    list_transform(${dShingles(5)}, s -> ${dHash32u("s")}))) AS h
       |  FROM (SELECT doc_id, $dTok AS t FROM documents $where))""".stripMargin

  /** Per-source sampling rates (percent) for the weighted mix. */
  val mixRates: Seq[(String, Int)] = Seq(
    "src0" -> 5, "src1" -> 10, "src2" -> 15, "src3" -> 20, "src4" -> 25)
  val mixDefaultRate: Int = 50

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessionization (30-min inactivity): per user, how many
    // sessions, the largest session, and total events — the event-log
    // shape every behavioural/training-data pipeline aggregates.
    "q62_sessionize" -> ((s, dir) => {
      Curation.sessionize(
        t(s, dir, "events"), "user_id", "ts", "event_id", gapMinutes = 30)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(
          max(col("session_id")).cast(LongType).as("n_sessions"),
          max(col("n")).cast(LongType).as("max_session_events"),
          sum(col("n")).cast(LongType).as("n_events"))
    }),

    // Cross-document boilerplate profile: fraction of each doc's 5-gram
    // shingles that occur in >= 3 documents (basis points).
    "q63_boilerplate" -> ((s, dir) => {
      Curation.boilerplateProfile(
        t(s, dir, "documents"), "doc_id", "text", n = 5, minDf = 3)
    }),

    // Benchmark-contamination check: docs (id >= 20) sharing >= 3
    // distinct 5-gram shingles with the benchmark set (id < 20).
    "q64_contamination" -> ((s, dir) => {
      Curation.contamination(
        t(s, dir, "documents"), "doc_id", "text",
        isBenchmark = col("doc_id") < 20, n = 5, minShared = 3)
    }),

    // Stratified deterministic sample: 10 docs per lang, ordered by
    // content md5 (reproducible "random" with no RNG state).
    "q65_stratified_sample" -> ((s, dir) => {
      Curation.stratifiedSample(
        t(s, dir, "documents"), "lang", col("text"), "doc_id", 10)
        .select(col("lang"), col("rn"), col("doc_id"))
    }),

    // KMV distinct estimate per source from the native bottom-k sketch,
    // next to the exact count it approximates.
    "q66_kmv_distinct" -> ((s, dir) => {
      Curation.kmvDistinct(
        t(s, dir, "documents"), "source",
        text.md5Hash32(col("text"), 0), k = 8)
    }),

    // Embedding QA profile: per dimension, count, exact 1e-6-fixed-point
    // sum, and min/max — drift/scale checks before training.
    "q67_embed_profile" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim").cast(LongType).as("dim"),
          col("x").cast("double").as("x"))
        .groupBy(col("dim"))
        .agg(
          count(lit(1)).as("n"),
          (sum(col("x").cast(org.apache.spark.sql.types.DecimalType(20, 6)))
            * lit(1000000)).cast(LongType).as("sum_e6"),
          min(col("x")).as("min_x"),
          max(col("x")).as("max_x"))
    }),

    // Weighted source mixing: deterministic hash-mod sampling at a
    // per-source rate — the "dataset mixture" step of pretraining
    // pipelines, reproducible across runs and engines.
    "q68_source_mix" -> ((s, dir) => {
      val rate = mixRates.foldRight(lit(mixDefaultRate)) {
        case ((src, r), acc) => when(col("source") === src, r).otherwise(acc)
      }
      t(s, dir, "documents")
        .withColumn("bucket", text.md5Hash32(col("text"), 7) % 100)
        .withColumn("sampled", col("bucket") < rate)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
          exact.pctBp(
            sum(when(col("sampled"), 1L).otherwise(0L)),
            count(lit(1))).as("sampled_bp"))
    }),

    // Semi-structured property extraction: parse the JSON props column,
    // aggregate the numeric field per event type.
    "q69_props_json" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          count(col("k")).as("n_with_k"),
          sum(col("k")).cast(LongType).as("sum_k"),
          min(col("k")).cast(LongType).as("min_k"),
          max(col("k")).cast(LongType).as("max_k"))
    }))

  val oracle: Map[String, String] = Map(

    "q62_sessionize" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM s),
        |per AS (
        |  SELECT user_id, session_id, count(*) AS n
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
        |  CAST(max(n) AS BIGINT) AS max_session_events,
        |  CAST(sum(n) AS BIGINT) AS n_events
        |FROM per GROUP BY user_id""".stripMargin,

    "q63_boilerplate" ->
      s"""WITH ${dShingleHashes()},
         |dfreq AS (SELECT h, count(*) AS df FROM sh GROUP BY h)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_boiler,
         |  CAST(floor(10000.0 * sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END)
         |    / count(*)) AS BIGINT) AS boiler_bp
         |FROM sh JOIN dfreq USING (h)
         |GROUP BY doc_id""".stripMargin,

    "q64_contamination" ->
      s"""WITH ${dShingleHashes()},
         |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id < 20)
         |SELECT doc_id, count(*) AS n_shared
         |FROM sh JOIN bench USING (h)
         |WHERE doc_id >= 20
         |GROUP BY doc_id HAVING count(*) >= 3""".stripMargin,

    "q65_stratified_sample" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(text), doc_id) AS BIGINT) AS rn
        |  FROM documents) WHERE rn <= 10""".stripMargin,

    "q66_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT source, ${dHash32(0, "text")} AS h FROM documents),
         |agg AS (
         |  SELECT source, count(DISTINCT h) AS n_exact,
         |    list_sort(list(DISTINCT h))[8] AS kth
         |  FROM h GROUP BY source)
         |SELECT source, CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(COALESCE(30064771072 // kth, n_exact) AS BIGINT) AS n_est
         |FROM agg""".stripMargin,

    "q67_embed_profile" ->
      """SELECT dim, count(*) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(20,6))) * 1000000 AS BIGINT) AS sum_e6,
        |  min(x) AS min_x, max(x) AS max_x
        |FROM (
        |  SELECT CAST(dim - 1 AS BIGINT) AS dim, CAST(x AS DOUBLE) AS x
        |  FROM (SELECT unnest(embedding) AS x,
        |          generate_subscripts(embedding, 1) AS dim
        |        FROM embeddings))
        |GROUP BY dim""".stripMargin,

    "q68_source_mix" -> {
      val rateCase = "CASE " + mixRates.map { case (src, r) =>
        s"WHEN source = '$src' THEN $r"
      }.mkString(" ") + s" ELSE $mixDefaultRate END"
      s"""SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sampled,
         |  CAST(floor(10000.0 * sum(CASE WHEN sampled THEN 1 ELSE 0 END)
         |    / count(*)) AS BIGINT) AS sampled_bp
         |FROM (SELECT source,
         |        (${dHash32(7, "text")}) % 100 < $rateCase AS sampled
         |      FROM documents)
         |GROUP BY source""".stripMargin
    },

    "q69_props_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(k) AS n_with_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(min(k) AS BIGINT) AS min_k,
        |  CAST(max(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin)
}
