package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{exact, scrub, text}
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
        CoreQueries.spread(t(s, dir, "documents")),
        "doc_id", "text", n = 5, minDf = 3)
    }),

    // Benchmark-contamination check: docs (id >= 20) sharing >= 3
    // distinct 5-gram shingles with the benchmark set (id < 20).
    "q64_contamination" -> ((s, dir) => {
      Curation.contamination(
        CoreQueries.spread(t(s, dir, "documents")), "doc_id", "text",
        isBenchmark = col("doc_id") < 20, n = 5, minShared = 3)
    }),

    // Mixture PLANNING — the step before q68's rate application: given
    // a global token budget (half the corpus) and a target mixture
    // (uniform across observed sources), derive each source's sampling
    // rate and the token count the plan will actually deliver. Pure
    // integer arithmetic (div + basis points), so the plan is
    // deterministic and engine-exact; under-budget sources (rate capped
    // at 10000 bp) surface a deficit_tokens column — the signal that
    // the target mixture is infeasible without upsampling. One corpus
    // aggregate + a broadcast 1-row totals join; nothing text-sized
    // shuffles (token counts reduce map-side).
    "q188_mixture_plan" -> ((s, dir) => {
      val per = CoreQueries.spread(t(s, dir, "documents"))
        .select(col("source"),
          text.tokenCount(col("text")).cast(LongType).as("tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      val tot = per.agg(
        sum(col("n_tokens")).as("total_tokens"),
        count(lit(1)).as("n_sources"))
      per.crossJoin(broadcast(tot))
        .withColumn("target_tokens",
          expr("total_tokens div 2 div n_sources"))
        .withColumn("rate_bp",
          least(lit(10000L), expr("target_tokens * 10000 div n_tokens")))
        .withColumn("planned_tokens",
          expr("n_tokens * rate_bp div 10000"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("target_tokens"), col("rate_bp"), col("planned_tokens"),
          greatest(lit(0L), col("target_tokens") - col("planned_tokens"))
            .as("deficit_tokens"))
    }),

    // Mixture plan → APPLY, with upsampling — the loop q188 leaves
    // open: a weighted target mixture (source weight = index + 1, so
    // heavy sources upsample past 20000 bp and light ones downsample
    // below 1000) is planned UNCAPPED and then applied by
    // Curation.applyMixture — each doc replicated
    // rate_bp div 10000 (+1 by md5 residue) times, deterministic
    // integer arithmetic end to end, zero shuffles in the apply
    // (broadcast plan join + narrow explode). Verified per source:
    // rows out, distinct docs kept, token mass delivered, and the
    // largest copy index (proof the multi-copy path actually ran).
    "q205_mixture_apply" -> ((s, dir) => {
      val docs = CoreQueries.spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("source"), col("text"),
          text.tokenCount(col("text")).cast(LongType).as("tok"))
      val per = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_in"), sum(col("tok")).as("n_tokens"))
        .withColumn("w", substring(col("source"), 4, 10).cast(LongType) + 1L)
      val tot = per.agg(sum(col("n_tokens")).as("total_tokens"),
        sum(col("w")).as("w_sum"))
      val plan = per.crossJoin(broadcast(tot))
        .withColumn("target_tokens", expr("total_tokens * w div w_sum"))
        .withColumn("rate_bp", expr("target_tokens * 10000 div n_tokens"))
      val applied = Curation.applyMixture(
        docs, "source", plan.select(col("source"), col("rate_bp")),
        "text", seed = 11)
      applied.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_rows_out"),
          countDistinct(col("doc_id")).as("n_docs_kept"),
          sum(col("tok")).as("tokens_out"),
          max(col("copy_idx")).as("max_copy_idx"))
        .join(broadcast(plan.select(
          col("source"), col("n_docs_in"), col("rate_bp"))), Seq("source"))
        .select(col("source"), col("n_docs_in"), col("rate_bp"),
          col("n_docs_kept"), col("n_rows_out"), col("tokens_out"),
          col("max_copy_idx"))
    }),

    // DSIR importance weights + deterministic resampling (Xie et al.
    // 2023, integer-exact rational variant — Curation.importanceWeights
    // scaladoc): target = the doc_id % 19 == 0 slice standing in for a
    // trusted corpus, raw = all documents; hashed-unigram bucket ratios
    // in micro-units, per-doc linearized log-ratio score, top-50 by
    // (weight desc, id) via TakeOrderedAndProject. The oracle rebuilds
    // the same buckets/ratios/scores from scratch in SQL.
    "q210_dsir_weights" -> ((s, dir) => {
      val docs = CoreQueries.spread(t(s, dir, "documents"))
      val target = docs.filter(col("doc_id") % 19 === 0)
      Curation.importanceTopK(
        Curation.importanceWeights(docs, target, "doc_id", "text",
          nBuckets = 1024, seed = 7),
        "doc_id", 50)
    }),

    // Maximal duplicated-span detection (Lee et al. 2022 exact-substring
    // signal, token granularity): overlapping 5-gram windows, df >= 2
    // distinct docs, consecutive duplicated positions merged into
    // maximal spans with exact token boundaries. Oracle mirrors the
    // window hash, df filter, and the run-merge (pos - row_number
    // grouping) independently.
    "q211_dup_spans" -> ((s, dir) => {
      Curation.duplicatedSpans(
        CoreQueries.spread(t(s, dir, "documents")),
        "doc_id", "text", n = 5, minDf = 2)
    }),

    // Maximal duplicated-span REMOVAL (the acting half of q211's
    // detect step — Lee et al. 2022's pipeline complete): every token
    // covered by a cross-document duplicated span is excised, the
    // survivors reassemble in order. The oracle is independently
    // formulated: it materializes the COVERED-POSITION set (dup window
    // positions fanned to pos..pos+4) and anti-joins token indices,
    // where the Spark side filters token arrays against span INTERVALS.
    "q212_remove_spans" -> ((s, dir) => {
      Curation.removeDuplicatedSpans(
        CoreQueries.spread(t(s, dir, "documents")),
        "doc_id", "text", n = 5, minDf = 2)
    }),

    // DSIR importance weights on the paper's feature space — hashed
    // BIGRAMS (n = 2) riding the shingle machinery; same integer-exact
    // ratio/score arithmetic as q210, top-50 by (weight desc, id). The
    // oracle rebuilds bigram buckets/ratios/scores from scratch in SQL
    // (HUGEINT // mirroring DECIMAL(38,0) div).
    "q213_dsir_ngram" -> ((s, dir) => {
      val docs = CoreQueries.spread(t(s, dir, "documents"))
      val target = docs.filter(col("doc_id") % 19 === 0)
      Curation.importanceTopK(
        Curation.importanceWeights(docs, target, "doc_id", "text",
          nBuckets = 1024, seed = 7, n = 2),
        "doc_id", 50)
    }),

    // Duplicated spans in TOTAL-OCCURRENCE mode (distinctDocs = false):
    // a window repeated >= 2 times ANYWHERE — including within one
    // document — flags, the Lee-et-al. reading of the signal (q211's
    // default counts distinct docs and deliberately ignores
    // within-document repeats). Oracle: same independent run-merge,
    // HAVING count(*) instead of count(DISTINCT doc_id).
    "q214_dup_spans_occ" -> ((s, dir) => {
      Curation.duplicatedSpans(
        CoreQueries.spread(t(s, dir, "documents")),
        "doc_id", "text", n = 5, minDf = 2, distinctDocs = false)
    }),

    // fastText-style hashed linear classifier INFERENCE (Joulin et al.
    // 2016, integer micro-unit variant — Curation.classifierScore
    // scaladoc): a deterministic 1024-bucket weight table (md5-derived,
    // centered on 0, mirrored verbatim by the oracle — standing in for
    // an offline-trained model) dotted with each doc's hashed BIGRAM
    // bucket counts, mean-pooled, plus a bias. The oracle rebuilds the
    // weights, buckets, and the truncating mean from scratch in SQL.
    "q215_classifier_score" -> ((s, dir) => {
      val weights = s.range(0, 1024).select(
        col("id").as("bucket"),
        (text.md5Hash32(concat(lit("w"), col("id")), 13) % 2000001L
          - 1000000L).as("weight_micro"))
      Curation.classifierScore(
        CoreQueries.spread(t(s, dir, "documents")), "doc_id", "text",
        weights, nBuckets = 1024, seed = 7, n = 2, biasMicro = 250000L)
    }),

    // Classifier TRAINED end to end (the inference-only q215's missing
    // half): per-bucket log-odds micro-weights aggregated from a
    // labeled slice (doc_id % 3 = 0 is the "labeled" subset; positive
    // class = lang 'en', the reference-corpus-vs-crawl setup), then the
    // FULL corpus scored with the trained table — train -> score as one
    // composition, bigram feature space. The oracle rebuilds the
    // training counts, the add-one-smoothed HUGEINT ratio weights, the
    // bucketing, and the truncating mean from scratch in SQL.
    "q218_classifier_trained" -> ((s, dir) => {
      val docs = CoreQueries.spread(t(s, dir, "documents"))
      val weights = Curation.trainClassifier(
        docs.filter(col("doc_id") % 3 === 0), "text",
        col("lang") === "en", nBuckets = 1024, seed = 7, n = 2)
      Curation.classifierScore(docs, "doc_id", "text", weights,
        nBuckets = 1024, seed = 7, n = 2)
    }),

    // Duplicated spans WITH provenance (the audit question "duplicated
    // with WHOM"): each span carries the 3 smallest sharing doc ids,
    // rolled up from its windows' bounded sorted samples and joined to
    // a comma string. Oracle: same independent run-merge as q211 plus
    // DuckDB list machinery for the per-window/per-span samples.
    "q217_span_provenance" -> ((s, dir) => {
      Curation.duplicatedSpans(
        CoreQueries.spread(t(s, dir, "documents")),
        "doc_id", "text", n = 5, minDf = 2, provenanceK = 3)
    }),

    // Stratified deterministic sample: 10 docs per lang, ordered by
    // content md5 (reproducible "random" with no RNG state).
    "q65_stratified_sample" -> ((s, dir) => {
      Curation.stratifiedSample(
        t(s, dir, "documents"), "lang", col("text"), "doc_id", 10)
        .select(col("lang"), col("rn"), col("doc_id"))
    }),

    // Weighted priority sampling without replacement, integer-exact:
    // every doc draws a deterministic priority h div w (md5-derived
    // uniform over the source's weight, src0 -> 1 ... src19 -> 20), and
    // the global k lowest priorities win — higher-weight sources keep
    // proportionally more docs with NO floating-point u^(1/w) and no
    // RNG state. orderBy+limit compiles to TakeOrdered (per-partition
    // top-k then a k-row driver merge), so the corpus never sorts.
    "q169_weighted_sample" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), col("source"),
        text.md5Hash32(col("text"), 0).as("h"),
        (substring(col("source"), 4, 10).cast(LongType) + 1L).as("w"))
        .withColumn("priority", expr("h div w"))
        .orderBy(col("priority"), col("doc_id")).limit(100)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("priority")).cast(LongType).as("min_priority"))
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
    }),

    // PII scrubbing: detect + redact emails / phone fragments / IPv4
    // literals. The synthetic corpus is clean, so every 7th doc gets a
    // deterministic dirty suffix injected (mirrored in the oracle) to
    // exercise real matches; output = per-doc detection counts + md5 of
    // the redacted text (the scrubber's full output, hashed so the
    // compare ships digests, not documents).
    "q71_pii_scrub" -> ((s, dir) => {
      val dirty = when(col("doc_id") % 7 === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com tel 555-"),
          (col("doc_id") % 9000 + 1000).cast("string"),
          lit(" host 10.0."), (col("doc_id") % 200).cast("string"),
          lit("."), (col("doc_id") * 7 % 250).cast("string")))
        .otherwise(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), dirty.as("dt"))
        .select(
          col("doc_id"),
          scrub.countMatches(col("dt"), scrub.emailRe).as("n_emails"),
          scrub.countMatches(col("dt"), scrub.phoneRe).as("n_phones"),
          scrub.countMatches(col("dt"), scrub.ipRe).as("n_ips"),
          md5(scrub.redactPii(col("dt"))).as("redacted_md5"))
    }),

    // Intra-document repetition profile (RefinedWeb/Gopher-style
    // repetition signals): duplicate-token and duplicate-bigram rates
    // plus the top-token frequency share, in integer basis points.
    "q72_repetition" -> ((s, dir) => {
      val tok = CoreQueries.spread(t(s, dir, "documents"))
        .select(col("doc_id"), text.tokens(col("text")).as("t"))
      val uni = tok.select(col("doc_id"), explode(col("t")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("f"))
        .groupBy(col("doc_id"))
        .agg(sum(col("f")).cast(LongType).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max(col("f")).cast(LongType).as("max_f"))
      val bi = tok
        .select(col("doc_id"), explode(text.shinglesOf(col("t"), 2)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("f"))
        .groupBy(col("doc_id"))
        .agg(sum(col("f")).cast(LongType).as("n_bigrams"),
          count(lit(1)).as("n_distinct_bigrams"))
      uni.join(bi, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          exact.pctBp(col("n_tokens") - col("n_distinct"), col("n_tokens"))
            .as("dup_token_bp"),
          exact.pctBp(col("max_f"), col("n_tokens")).as("top_token_bp"),
          exact.pctBp(col("n_bigrams") - col("n_distinct_bigrams"),
            col("n_bigrams")).as("dup_bigram_bp"))
    }),

    // Corpus quality gate in the published Gopher-rules style: per-doc
    // integer-arithmetic flags (mean word length outside [3,10], punct
    // load, <2 hard stopwords, top-token share >20%), aggregated to one
    // corpus profile row. Integer cross-multiplication everywhere — no
    // float thresholds, so the flags are engine- and partition-exact.
    "q73_gopher_quality" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          text.tokens(col("text")).as("t"),
          text.punctCount(col("text")).cast(LongType).as("n_punct"))
      val perDoc = tok
        .select(col("doc_id"), explode(col("t")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("f"))
        .groupBy(col("doc_id"))
        .agg(sum(col("f")).cast(LongType).as("n_tok"),
          max(col("f")).cast(LongType).as("max_f"),
          sum(length(col("w")) * col("f")).cast(LongType).as("sum_len"),
          sum(when(col("w").isin(text.stopwords.map(lit(_)): _*), col("f"))
            .otherwise(lit(0))).cast(LongType).as("n_stop"))
        .join(tok.select(col("doc_id"), col("n_chars"), col("n_punct")),
          "doc_id")
      perDoc.agg(
        count(lit(1)).as("n_docs"),
        count(when(col("sum_len") < col("n_tok") * 3 ||
          col("sum_len") > col("n_tok") * 10, 1)).as("flag_word_len"),
        count(when(col("n_punct") * 10 > col("n_chars"), 1)).as("flag_punct"),
        count(when(col("n_stop") < 2, 1)).as("flag_stopword"),
        count(when(col("max_f") * 5 > col("n_tok"), 1)).as("flag_repetition"))
    }),

    // Context-window chunking: sliding 32-token windows advancing by 24
    // (8-token overlap); chunk text hashed so the compare ships digests.
    "q74_chunking" -> ((s, dir) => {
      Curation.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
        size = 32, stride = 24)
        .select(col("doc_id"), col("chunk_id"), col("chunk_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
    }),

    // Sequence-packing manifest: per-source greedy concatenate-and-cut
    // into 512-token bins — which bin each doc starts in, at what
    // offset, and how many bins it spans.
    "q75_packing" -> ((s, dir) => {
      Curation.packingManifest(t(s, dir, "documents"),
        shardCol = "source", idCol = "doc_id", textCol = "text",
        capacity = 512)
    }),

    // Corpus-level duplicated-segment removal (RefinedWeb-style line
    // dedup over fixed 8-token segments): segments occurring in >= 2
    // distinct documents are dropped everywhere and the survivors
    // reassembled; cleaned text ships as an md5 digest.
    "q77_segment_dedup" -> ((s, dir) => {
      Curation.removeDuplicatedSegments(
        t(s, dir, "documents"), "doc_id", "text",
        segTokens = 8, maxDf = 2)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_segments"), col("n_kept"), col("n_removed"))
    }),

    // Rolling distinct-user estimate from MERGED KMV sketches: one
    // bottom-8 sketch per hour, then each hour's sketch contributes to
    // the 3-hour windows ending at h, h+1, h+2 and the window sketch is
    // re-aggregated from the 8-long arrays — sketch(union) ==
    // bottomK(merge of sketches), exactly. At scale this is the whole
    // point of mergeable sketches: the rolling pass shuffles 8 longs
    // per hour instead of re-shuffling every user per window. The exact
    // distinct count rides along (3x explode — the cost the sketch
    // avoids) to show agreement; windows are clipped to hours present.
    "q89_rolling_distinct" -> ((s, dir) => {
      val h32 = text.md5Hash32(col("user_id").cast("string"), 3)
      val ev = t(s, dir, "events")
        .select(date_trunc("hour", col("ts")).as("h"), h32.as("uh"))
      val hourly = ev.groupBy(col("h"))
        .agg(graft.plans.BottomKAgg.bottomK(col("uh"), 8).as("sk"))
      val contrib = hourly
        .select(col("h"), explode(col("sk")).as("v"))
        .select(col("h"), col("v"),
          explode(sequence(lit(0), lit(2))).as("o"))
        .select((col("h") + expr("make_interval(0,0,0,0,o,0,0)")).as("hr"),
          col("v"))
      val merged = contrib.groupBy(col("hr"))
        .agg(graft.plans.BottomKAgg.bottomK(col("v"), 8).as("sk"))
        .withColumn("kth", element_at(col("sk"), 8))
        .select(col("hr"),
          when(size(col("sk")) >= 8,
            expr(s"CAST(${7L * 4294967296L} div kth AS BIGINT)"))
            .otherwise(size(col("sk")).cast(LongType)).as("n_est"))
      val exactCnt = ev
        .select(col("h"), col("uh"), explode(sequence(lit(0), lit(2))).as("o"))
        .select((col("h") + expr("make_interval(0,0,0,0,o,0,0)")).as("hr"),
          col("uh"))
        .groupBy(col("hr"))
        .agg(countDistinct(col("uh")).as("n_exact"))
      merged.join(exactCnt, "hr")
        .join(hourly.select(col("h").as("hr")), "hr")
        .select(date_format(col("hr"), "yyyy-MM-dd HH").as("hr"),
          col("n_est"), col("n_exact"))
    }),

    // Corpus snapshot diff (dataset-versioning audit): FULL OUTER join
    // of two corpus versions on doc_id comparing content hashes —
    // added / removed / modified / unchanged, one shuffle each side,
    // hashes not bodies. v2 is derived deterministically in-query
    // (every 13th doc dropped, every 17th edited, a high-id block
    // added) and mirrored in the oracle.
    "q88_corpus_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val v1 = docs.select(col("doc_id"), md5(col("text")).as("h1"))
      val v2 = docs
        .filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 17 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h2"))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            md5(col("text")).as("h2")))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") =!= col("h2"), "modified")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Deterministic train/val/test assignment: content-hash bucket mod
    // 100 -> 80/10/10 split. No RNG state, no shuffle for the
    // assignment itself (a narrow projection), stable across runs,
    // engines, and partitionings — the reproducible-split contract an
    // experiment pipeline needs. Profiled per split here.
    "q82_split_assign" -> ((s, dir) => {
      val bucket = text.md5Hash32(col("text"), 13) % 100
      val split = when(col("bucket") < 80, "train")
        .when(col("bucket") < 90, "val").otherwise("test")
      t(s, dir, "documents")
        .withColumn("bucket", bucket)
        .withColumn("split", split)
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("total_chars"),
          min(col("bucket")).cast(LongType).as("min_bucket"),
          max(col("bucket")).cast(LongType).as("max_bucket"))
    }),

    // Benchmark contamination broken down by source: which corpus
    // slices leak benchmark n-grams, and how badly — the per-dataset
    // report a decontamination pass actually acts on.
    "q81_contam_by_source" -> ((s, dir) => {
      val docs = CoreQueries.spread(t(s, dir, "documents"))
      Curation.contamination(docs, "doc_id", "text",
        isBenchmark = col("doc_id") < 20, n = 5, minShared = 3)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_contaminated"),
          sum(col("n_shared")).cast(LongType).as("total_shared"),
          max(col("n_shared")).cast(LongType).as("max_shared"))
    }),

    // Ordered conversion funnel signup → click → purchase: each step's
    // timestamp must FOLLOW the previous step (not merely co-occur).
    // One shuffle: per-user conditional collect_lists, then the step
    // times fall out of array expressions (array_min over a filtered
    // list), so no self-joins and no re-scan per step. Conversion is an
    // integer basis-point ratio.
    "q139_funnel" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          collect_list(when(col("event_type") === "signup", col("ts")))
            .as("s_ts"),
          collect_list(when(col("event_type") === "click", col("ts")))
            .as("c_ts"),
          collect_list(when(col("event_type") === "purchase", col("ts")))
            .as("p_ts"))
        .withColumn("t1", array_min(col("s_ts")))
        .withColumn("t2", array_min(filter(col("c_ts"), _ > col("t1"))))
        .withColumn("t3", array_min(filter(col("p_ts"), _ > col("t2"))))
        .agg(
          sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_click"),
          sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("n_purchase"))
        .withColumn("conv_bp",
          when(col("n_signup") > 0,
            expr("(n_purchase * 10000) div n_signup")).otherwise(lit(0L)))
    }),

    // Contingency crosstab with independence lift: source × lang cell
    // counts against the row×col expectation, in basis points — the
    // chi-square-family dependence check (log- and float-free). One
    // corpus scan; the marginals attach to the tiny crosstab via
    // windows, never a second pass.
    "q149_crosstab" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = t(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"))
      cells
        .withColumn("row_total",
          sum(col("n")).over(Window.partitionBy(col("source"))))
        .withColumn("col_total",
          sum(col("n")).over(Window.partitionBy(col("lang"))))
        .withColumn("grand", sum(col("n")).over(Window.partitionBy()))
        .select(col("source"), col("lang"), col("n"),
          col("row_total"), col("col_total"),
          expr("(n * grand * 10000) div (row_total * col_total)")
            .as("lift_bp"))
    }),

    // Last-touch attribution: for every purchase, the event type that
    // immediately preceded it in the user's timeline — one lag() window
    // pass, then a tiny aggregate with basis-point shares. The funnel's
    // (q139) complement: which activity converts.
    "q154_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val prev = t(s, dir, "events")
        .withColumn("prev_event", lag(col("event_type"), 1).over(w))
        .filter(col("event_type") === "purchase" &&
          col("prev_event").isNotNull)
        .groupBy(col("prev_event"))
        .agg(count(lit(1)).as("n_purchases"))
      prev
        .withColumn("total", sum(col("n_purchases")).over(
          Window.partitionBy()))
        .select(col("prev_event"), col("n_purchases"),
          expr("(n_purchases * 10000) div total").as("share_bp"))
    }),

    // Cohort retention: users grouped by first-seen date, counted
    // distinct on each subsequent day offset. Two shuffles (first-seen
    // aggregate, cohort-cell aggregate); the user→cohort join is an
    // equi-join AQE can broadcast while the user dimension is small and
    // shuffle when it is not. Output is bounded by days², not users.
    "q140_retention" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = e.groupBy(col("user_id"))
        .agg(min(col("d")).as("cohort_day"))
      e.join(first, "user_id")
        .groupBy(
          date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("d"), col("cohort_day")).cast(LongType)
            .as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }))

  val oracle: Map[String, String] = Map(

    "q188_mixture_plan" ->
      s"""WITH per AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len($dTok)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |               count(*) AS n_sources FROM per),
         |p AS (
         |  SELECT source, n_docs, n_tokens,
         |    total_tokens // 2 // n_sources AS target_tokens,
         |    least(10000, (total_tokens // 2 // n_sources) * 10000
         |      // n_tokens) AS rate_bp
         |  FROM per CROSS JOIN tot)
         |SELECT source, n_docs, n_tokens, target_tokens,
         |  CAST(rate_bp AS BIGINT) AS rate_bp,
         |  CAST(n_tokens * rate_bp // 10000 AS BIGINT) AS planned_tokens,
         |  CAST(greatest(0, target_tokens - n_tokens * rate_bp // 10000)
         |    AS BIGINT) AS deficit_tokens
         |FROM p""".stripMargin,

    "q205_mixture_apply" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, text,
         |    CAST(len($dTok) AS BIGINT) AS tok
         |  FROM documents),
         |per AS (
         |  SELECT source, count(*) AS n_docs_in, sum(tok) AS n_tokens,
         |    CAST(substr(source, 4) AS BIGINT) + 1 AS w
         |  FROM d GROUP BY source),
         |tot AS (SELECT sum(n_tokens) AS total_tokens, sum(w) AS w_sum
         |        FROM per),
         |plan AS (
         |  SELECT source, n_docs_in,
         |    CAST((total_tokens * w // w_sum) * 10000 // n_tokens AS BIGINT)
         |      AS rate_bp
         |  FROM per CROSS JOIN tot),
         |ap AS (
         |  SELECT d.source, d.doc_id, d.tok,
         |    rate_bp // 10000 +
         |      CASE WHEN ${dHash32(11, "d.text")} % 10000 < rate_bp % 10000
         |        THEN 1 ELSE 0 END AS copies
         |  FROM d JOIN plan USING (source)),
         |agg AS (
         |  SELECT source,
         |    CAST(sum(copies) AS BIGINT) AS n_rows_out,
         |    CAST(count(CASE WHEN copies > 0 THEN 1 END) AS BIGINT)
         |      AS n_docs_kept,
         |    CAST(sum(tok * copies) AS BIGINT) AS tokens_out,
         |    CAST(max(copies) - 1 AS BIGINT) AS max_copy_idx
         |  FROM ap GROUP BY source HAVING sum(copies) > 0)
         |SELECT p.source, p.n_docs_in, p.rate_bp,
         |  n_docs_kept, n_rows_out, tokens_out, max_copy_idx
         |FROM agg JOIN plan p USING (source)""".stripMargin,

    "q210_dsir_weights" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${dHash32(7, "w")} % 1024 AS b
         |  FROM (SELECT doc_id, unnest($dTok) AS w FROM documents)),
         |rc AS (SELECT b, count(*) AS c_r FROM tk GROUP BY 1),
         |tc AS (SELECT b, count(*) AS c_t FROM tk
         |       WHERE doc_id % 19 = 0 GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT count(*) FROM tk) AS r_tot,
         |         (SELECT count(*) FROM tk WHERE doc_id % 19 = 0) AS t_tot),
         |ratio AS (
         |  SELECT rc.b,
         |    CAST((CAST(coalesce(tc.c_t, 0) + 1 AS HUGEINT)
         |        * (r_tot + 1024) * 1000000)
         |      // (CAST(rc.c_r + 1 AS HUGEINT) * (t_tot + 1024)) AS BIGINT)
         |      AS ratio_micro
         |  FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot),
         |sc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(ratio_micro - 1000000) AS BIGINT) AS imp_micro
         |  FROM tk JOIN ratio USING (b) GROUP BY 1)
         |SELECT doc_id, n_tokens, imp_micro
         |FROM sc ORDER BY imp_micro DESC, doc_id LIMIT 50""".stripMargin,

    "q211_dup_spans" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $dTok AS t FROM documents),
         |g0 AS (
         |  SELECT doc_id, t,
         |    unnest(generate_series(0, len(t) - 5)) AS pos
         |  FROM toks WHERE len(t) >= 5),
         |g AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    md5(array_to_string(t[pos+1:pos+5], ' ')) AS h
         |  FROM g0),
         |dfh AS (
         |  SELECT h FROM g GROUP BY h
         |  HAVING count(DISTINCT doc_id) >= 2),
         |d AS (SELECT doc_id, pos FROM g JOIN dfh USING (h)),
         |r AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS grp
         |  FROM d),
         |sp AS (
         |  SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_tok,
         |    CAST(max(pos) + 4 AS BIGINT) AS end_tok
         |  FROM r GROUP BY doc_id, grp)
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_tok)
         |    AS BIGINT) AS span_id,
         |  start_tok, end_tok, end_tok - start_tok + 1 AS span_tokens
         |FROM sp""".stripMargin,

    "q212_remove_spans" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $dTok AS t FROM documents),
         |g0 AS (
         |  SELECT doc_id, t,
         |    unnest(generate_series(0, len(t) - 5)) AS pos
         |  FROM toks WHERE len(t) >= 5),
         |g AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    md5(array_to_string(t[pos+1:pos+5], ' ')) AS h
         |  FROM g0),
         |dfh AS (
         |  SELECT h FROM g GROUP BY h
         |  HAVING count(DISTINCT doc_id) >= 2),
         |d AS (SELECT doc_id, pos FROM g JOIN dfh USING (h)),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos + off AS ci
         |  FROM d, (SELECT unnest(generate_series(0, 4)) AS off)),
         |tw0 AS (
         |  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
         |  FROM toks),
         |tw AS (SELECT doc_id, i - 1 AS ti, t[i] AS w FROM tw0),
         |kept AS (
         |  SELECT tw.doc_id, tw.ti, tw.w
         |  FROM tw LEFT JOIN cov
         |    ON tw.doc_id = cov.doc_id AND tw.ti = cov.ci
         |  WHERE cov.doc_id IS NULL),
         |agg AS (
         |  SELECT doc_id,
         |    string_agg(w, ' ' ORDER BY ti) AS clean_text,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT toks.doc_id,
         |  coalesce(agg.clean_text, '') AS clean_text,
         |  CAST(len(toks.t) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(len(toks.t) - coalesce(agg.n_kept, 0) AS BIGINT)
         |    AS n_removed
         |FROM toks LEFT JOIN agg USING (doc_id)""".stripMargin,

    "q213_dsir_ngram" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${dHash32(7, "w")} % 1024 AS b
         |  FROM (SELECT doc_id, unnest(${dShingles(2)}) AS w
         |        FROM (SELECT doc_id, $dTok AS t FROM documents))),
         |rc AS (SELECT b, count(*) AS c_r FROM tk GROUP BY 1),
         |tc AS (SELECT b, count(*) AS c_t FROM tk
         |       WHERE doc_id % 19 = 0 GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT count(*) FROM tk) AS r_tot,
         |         (SELECT count(*) FROM tk WHERE doc_id % 19 = 0) AS t_tot),
         |ratio AS (
         |  SELECT rc.b,
         |    CAST((CAST(coalesce(tc.c_t, 0) + 1 AS HUGEINT)
         |        * (r_tot + 1024) * 1000000)
         |      // (CAST(rc.c_r + 1 AS HUGEINT) * (t_tot + 1024)) AS BIGINT)
         |      AS ratio_micro
         |  FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot),
         |sc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(CAST(ratio_micro - 1000000 AS HUGEINT)) AS BIGINT)
         |      AS imp_micro
         |  FROM tk JOIN ratio USING (b) GROUP BY 1)
         |SELECT doc_id, n_tokens, imp_micro
         |FROM sc ORDER BY imp_micro DESC, doc_id LIMIT 50""".stripMargin,

    "q215_classifier_score" ->
      s"""WITH w AS (
         |  SELECT CAST(b AS BIGINT) AS b,
         |    ('0x' || substr(md5('13:w' || CAST(b AS VARCHAR)), 1, 8))::BIGINT
         |      % 2000001 - 1000000 AS wm
         |  FROM (SELECT unnest(generate_series(0, 1023)) AS b)),
         |tk AS (
         |  SELECT doc_id, ${dHash32(7, "g")} % 1024 AS b
         |  FROM (SELECT doc_id, unnest(${dShingles(2)}) AS g
         |        FROM (SELECT doc_id, $dTok AS t FROM documents)))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
         |  CAST(sum(CAST(coalesce(wm, 0) AS HUGEINT)) AS BIGINT)
         |    AS score_sum_micro,
         |  CAST(250000 + sum(CAST(coalesce(wm, 0) AS HUGEINT)) // count(*)
         |    AS BIGINT) AS score_micro
         |FROM tk LEFT JOIN w USING (b) GROUP BY doc_id""".stripMargin,

    "q218_classifier_trained" ->
      s"""WITH tr AS (
         |  SELECT (lang = 'en') AS pos, ${dHash32(7, "g")} % 1024 AS b
         |  FROM (SELECT lang, unnest(${dShingles(2)}) AS g
         |        FROM (SELECT lang, $dTok AS t FROM documents
         |              WHERE doc_id % 3 = 0))),
         |cnt AS (
         |  SELECT b,
         |    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_p,
         |    sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS c_n
         |  FROM tr GROUP BY b),
         |tot AS (SELECT sum(c_p) AS p_tot, sum(c_n) AS n_tot FROM cnt),
         |w AS (
         |  SELECT b,
         |    CAST((CAST(c_p + 1 AS HUGEINT) * (n_tot + 1024) * 1000000)
         |      // (CAST(c_n + 1 AS HUGEINT) * (p_tot + 1024)) AS BIGINT)
         |      - 1000000 AS wm
         |  FROM cnt CROSS JOIN tot),
         |tk AS (
         |  SELECT doc_id, ${dHash32(7, "g")} % 1024 AS b
         |  FROM (SELECT doc_id, unnest(${dShingles(2)}) AS g
         |        FROM (SELECT doc_id, $dTok AS t FROM documents)))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
         |  CAST(sum(CAST(coalesce(wm, 0) AS HUGEINT)) AS BIGINT)
         |    AS score_sum_micro,
         |  CAST(sum(CAST(coalesce(wm, 0) AS HUGEINT)) // count(*)
         |    AS BIGINT) AS score_micro
         |FROM tk LEFT JOIN w USING (b) GROUP BY doc_id""".stripMargin,

    "q217_span_provenance" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $dTok AS t FROM documents),
         |g0 AS (
         |  SELECT doc_id, t,
         |    unnest(generate_series(0, len(t) - 5)) AS pos
         |  FROM toks WHERE len(t) >= 5),
         |g AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    md5(array_to_string(t[pos+1:pos+5], ' ')) AS h
         |  FROM g0),
         |dfh AS (
         |  SELECT h, list_sort(list_distinct(list(doc_id)))[1:3] AS sample
         |  FROM g GROUP BY h
         |  HAVING count(DISTINCT doc_id) >= 2),
         |d AS (SELECT doc_id, pos, sample FROM g JOIN dfh USING (h)),
         |r AS (
         |  SELECT doc_id, pos, sample,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS grp
         |  FROM d),
         |sp AS (
         |  SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_tok,
         |    CAST(max(pos) + 4 AS BIGINT) AS end_tok,
         |    array_to_string(list_transform(
         |      list_sort(list_distinct(flatten(list(sample))))[1:3],
         |      v -> CAST(v AS VARCHAR)), ',') AS sample_docs
         |  FROM r GROUP BY doc_id, grp)
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_tok)
         |    AS BIGINT) AS span_id,
         |  start_tok, end_tok, end_tok - start_tok + 1 AS span_tokens,
         |  sample_docs
         |FROM sp""".stripMargin,

    "q214_dup_spans_occ" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $dTok AS t FROM documents),
         |g0 AS (
         |  SELECT doc_id, t,
         |    unnest(generate_series(0, len(t) - 5)) AS pos
         |  FROM toks WHERE len(t) >= 5),
         |g AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    md5(array_to_string(t[pos+1:pos+5], ' ')) AS h
         |  FROM g0),
         |dfh AS (
         |  SELECT h FROM g GROUP BY h
         |  HAVING count(*) >= 2),
         |d AS (SELECT doc_id, pos FROM g JOIN dfh USING (h)),
         |r AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS grp
         |  FROM d),
         |sp AS (
         |  SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_tok,
         |    CAST(max(pos) + 4 AS BIGINT) AS end_tok
         |  FROM r GROUP BY doc_id, grp)
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_tok)
         |    AS BIGINT) AS span_id,
         |  start_tok, end_tok, end_tok - start_tok + 1 AS span_tokens
         |FROM sp""".stripMargin,

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

    "q169_weighted_sample" ->
      s"""WITH base AS (
         |  SELECT doc_id, source, ${dHash32(0, "text")} AS h,
         |    CAST(substr(source, 4) AS BIGINT) + 1 AS w
         |  FROM documents),
         |pick AS (
         |  SELECT doc_id, source, h // w AS priority FROM base
         |  ORDER BY priority, doc_id LIMIT 100)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(min(priority) AS BIGINT) AS min_priority
         |FROM pick GROUP BY source""".stripMargin,

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
        |GROUP BY event_type""".stripMargin,

    "q71_pii_scrub" ->
      raw"""WITH dirty AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
           |      doc_id || '@example.com tel 555-' ||
           |      CAST(doc_id % 9000 + 1000 AS VARCHAR) ||
           |      ' host 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.' ||
           |      CAST(doc_id * 7 % 250 AS VARCHAR)
           |    ELSE text END AS dt
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(dt,
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           |    AS n_emails,
           |  CAST(len(regexp_extract_all(dt, '\b\d{3}-\d{4}\b')) AS BIGINT)
           |    AS n_phones,
           |  CAST(len(regexp_extract_all(dt,
           |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           |  md5(regexp_replace(regexp_replace(regexp_replace(dt,
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           |    '\b\d{3}-\d{4}\b', '[PHONE]', 'g'),
           |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'))
           |    AS redacted_md5
           |FROM dirty""".stripMargin,

    "q72_repetition" ->
      s"""WITH tok AS (SELECT doc_id, $dTok AS t FROM documents),
         |uf AS (SELECT doc_id, w, count(*) AS f
         |       FROM (SELECT doc_id, unnest(t) AS w FROM tok) GROUP BY 1, 2),
         |us AS (SELECT doc_id, CAST(sum(f) AS BIGINT) AS n_tokens,
         |         count(*) AS n_distinct, CAST(max(f) AS BIGINT) AS max_f
         |       FROM uf GROUP BY 1),
         |bf AS (SELECT doc_id, g, count(*) AS f
         |       FROM (SELECT doc_id, unnest(${dShingles(2)}) AS g FROM tok)
         |       GROUP BY 1, 2),
         |bs AS (SELECT doc_id, CAST(sum(f) AS BIGINT) AS n_bigrams,
         |         count(*) AS n_distinct_bigrams FROM bf GROUP BY 1)
         |SELECT u.doc_id, n_tokens, n_distinct,
         |  CAST(floor(10000.0 * (n_tokens - n_distinct) / n_tokens) AS BIGINT)
         |    AS dup_token_bp,
         |  CAST(floor(10000.0 * max_f / n_tokens) AS BIGINT) AS top_token_bp,
         |  CAST(floor(10000.0 * (n_bigrams - n_distinct_bigrams) / n_bigrams)
         |    AS BIGINT) AS dup_bigram_bp
         |FROM us u JOIN bs b ON u.doc_id = b.doc_id""".stripMargin,

    "q73_gopher_quality" -> {
      val stopList = graft.functions.text.stopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH tok AS (SELECT doc_id, n_chars,
         |    length(text) - length(regexp_replace(text,
         |      '[.,;:!?''"()\\-]', '', 'g')) AS n_punct,
         |    $dTok AS t FROM documents),
         |uf AS (SELECT doc_id, w, count(*) AS f
         |       FROM (SELECT doc_id, unnest(t) AS w FROM tok) GROUP BY 1, 2),
         |per AS (SELECT doc_id, CAST(sum(f) AS BIGINT) AS n_tok,
         |    CAST(max(f) AS BIGINT) AS max_f,
         |    CAST(sum(length(w) * f) AS BIGINT) AS sum_len,
         |    CAST(sum(CASE WHEN w IN ($stopList) THEN f ELSE 0 END)
         |      AS BIGINT) AS n_stop
         |  FROM uf GROUP BY 1)
         |SELECT count(*) AS n_docs,
         |  count(CASE WHEN sum_len < n_tok * 3 OR sum_len > n_tok * 10
         |    THEN 1 END) AS flag_word_len,
         |  count(CASE WHEN n_punct * 10 > n_chars THEN 1 END) AS flag_punct,
         |  count(CASE WHEN n_stop < 2 THEN 1 END) AS flag_stopword,
         |  count(CASE WHEN max_f * 5 > n_tok THEN 1 END) AS flag_repetition
         |FROM per JOIN tok USING (doc_id)""".stripMargin
    },

    "q74_chunking" ->
      s"""WITH s AS (
         |  SELECT doc_id, t,
         |    greatest(0, CAST(floor((len(t) - 32 + 23) / 24.0) AS INT))
         |      AS k_max
         |  FROM (SELECT doc_id, $dTok AS t FROM documents)),
         |e AS (
         |  SELECT doc_id, t, unnest(generate_series(0, k_max)) AS k FROM s)
         |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
         |  CAST(len(t[k*24+1 : k*24+32]) AS BIGINT) AS chunk_tokens,
         |  md5(array_to_string(t[k*24+1 : k*24+32], ' ')) AS chunk_md5
         |FROM e""".stripMargin,

    "q75_packing" ->
      s"""WITH n AS (
         |  SELECT source, doc_id, CAST(len($dTok) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT source, doc_id, n_tokens,
         |    COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bfr
         |  FROM n)
         |SELECT source, doc_id, n_tokens,
         |  CAST(bfr // 512 AS BIGINT) AS bin_start,
         |  CAST(bfr % 512 AS BIGINT) AS offset_in_bin,
         |  CAST((bfr + n_tokens - 1) // 512 - bfr // 512 + 1 AS BIGINT)
         |    AS bins_spanned
         |FROM c""".stripMargin,

    "q77_segment_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $dTok AS t FROM documents),
         |seg AS (
         |  SELECT doc_id, CAST(k AS BIGINT) AS seg_idx,
         |    array_to_string(t[k*8+1 : k*8+8], ' ') AS seg
         |  FROM (SELECT doc_id, t,
         |          unnest(generate_series(0,
         |            CAST((len(t) + 7) // 8 - 1 AS INT))) AS k
         |        FROM toks)),
         |dfreq AS (
         |  SELECT seg, count(DISTINCT doc_id) AS seg_df FROM seg GROUP BY 1),
         |kept AS (
         |  SELECT s.doc_id AS kid, count(*) AS n_kept,
         |    array_to_string(list(s.seg ORDER BY s.seg_idx), ' ') AS clean_text
         |  FROM seg s JOIN dfreq f USING (seg)
         |  WHERE f.seg_df < 2 GROUP BY s.doc_id)
         |SELECT t.doc_id,
         |  md5(coalesce(k.clean_text, '')) AS clean_md5,
         |  CAST((len(t.t) + 7) // 8 AS BIGINT) AS n_segments,
         |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST((len(t.t) + 7) // 8 - coalesce(k.n_kept, 0) AS BIGINT)
         |    AS n_removed
         |FROM toks t LEFT JOIN kept k ON t.doc_id = k.kid""".stripMargin,

    "q89_rolling_distinct" ->
      s"""WITH ev AS (
         |  SELECT date_trunc('hour', ts) AS h,
         |    ${dHash32(3, "CAST(user_id AS VARCHAR)")} AS uh
         |  FROM events),
         |hours AS (SELECT DISTINCT h FROM ev),
         |win AS (
         |  SELECT hr.h AS whr, e.uh
         |  FROM hours hr JOIN ev e
         |    ON e.h >= hr.h - INTERVAL 2 HOUR AND e.h <= hr.h),
         |agg AS (
         |  SELECT whr, count(DISTINCT uh) AS nd,
         |    list_sort(list(DISTINCT uh))[8] AS kth
         |  FROM win GROUP BY whr)
         |SELECT strftime(whr, '%Y-%m-%d %H') AS hr,
         |  CAST(COALESCE(30064771072 // kth, nd) AS BIGINT) AS n_est,
         |  CAST(nd AS BIGINT) AS n_exact
         |FROM agg""".stripMargin,

    "q88_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 17 = 0 THEN text || ' v2'
        |             ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, md5(text) AS h2
        |  FROM documents WHERE doc_id % 11 = 0)
        |SELECT CASE WHEN h1 IS NULL THEN 'added'
        |            WHEN h2 IS NULL THEN 'removed'
        |            WHEN h1 <> h2 THEN 'modified'
        |            ELSE 'unchanged' END AS status,
        |  count(*) AS n_docs
        |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        |GROUP BY 1""".stripMargin,

    "q82_split_assign" ->
      s"""WITH b AS (
         |  SELECT n_chars, (${dHash32(13, "text")}) % 100 AS bucket
         |  FROM documents)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(min(bucket) AS BIGINT) AS min_bucket,
         |  CAST(max(bucket) AS BIGINT) AS max_bucket
         |FROM b GROUP BY 1""".stripMargin,

    "q81_contam_by_source" ->
      s"""WITH ${dShingleHashes()},
         |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id < 20),
         |contam AS (
         |  SELECT doc_id, count(*) AS n_shared
         |  FROM sh JOIN bench USING (h)
         |  WHERE doc_id >= 20
         |  GROUP BY doc_id HAVING count(*) >= 3)
         |SELECT d.source, count(*) AS n_contaminated,
         |  CAST(sum(c.n_shared) AS BIGINT) AS total_shared,
         |  CAST(max(c.n_shared) AS BIGINT) AS max_shared
         |FROM contam c JOIN documents d USING (doc_id)
         |GROUP BY d.source""".stripMargin,

    "q139_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    list(ts) FILTER (event_type = 'signup') AS s_ts,
        |    list(ts) FILTER (event_type = 'click') AS c_ts,
        |    list(ts) FILTER (event_type = 'purchase') AS p_ts
        |  FROM events GROUP BY user_id),
        |steps AS (
        |  SELECT
        |    list_min(s_ts) AS t1,
        |    list_min(list_filter(c_ts, x -> x > list_min(s_ts))) AS t2,
        |    list_min(list_filter(p_ts,
        |      x -> x > list_min(list_filter(c_ts,
        |        y -> y > list_min(s_ts))))) AS t3
        |  FROM per_user),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_signup,
        |    CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_click,
        |    CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_purchase
        |  FROM steps)
        |SELECT n_signup, n_click, n_purchase,
        |  CASE WHEN n_signup > 0 THEN (n_purchase * 10000) // n_signup
        |    ELSE 0 END AS conv_bp
        |FROM agg""".stripMargin,

    "q154_attribution" ->
      """WITH p AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_event
        |  FROM events),
        |c AS (
        |  SELECT prev_event, count(*) AS n_purchases
        |  FROM p WHERE event_type = 'purchase' AND prev_event IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(n_purchases) AS BIGINT) AS total FROM c)
        |SELECT prev_event, n_purchases,
        |  (n_purchases * 10000) // total AS share_bp
        |FROM c, t""".stripMargin,

    "q149_crosstab" ->
      """WITH cells AS (
        |  SELECT source, lang, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |m AS (
        |  SELECT source, lang, n,
        |    sum(n) OVER (PARTITION BY source) AS row_total,
        |    sum(n) OVER (PARTITION BY lang) AS col_total,
        |    sum(n) OVER () AS grand
        |  FROM cells)
        |SELECT source, lang, n,
        |  CAST(row_total AS BIGINT) AS row_total,
        |  CAST(col_total AS BIGINT) AS col_total,
        |  CAST((n * grand * 10000) // (row_total * col_total) AS BIGINT)
        |    AS lift_bp
        |FROM m""".stripMargin,

    "q140_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |first AS (
        |  SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN first ON e.user_id = first.user_id
        |GROUP BY cohort_day, date_diff('day', cohort_day, d)""".stripMargin)
}
