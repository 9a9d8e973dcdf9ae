package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.text

/** Corpus-mining operators for training-data pipelines: n-gram language
  * model statistics, truncation-duplicate detection, cross-source
  * overlap, shingle novelty, and ANN recall evaluation. Every operator
  * is a declarative Catalyst plan whose shuffles are keyed on bounded
  * hashes or tokens — no all-pairs joins, no driver-side loops — so the
  * same plan that verifies on the test tables holds on a large cluster.
  *
  * Reference scope: these extend the reference pipeline's profiling
  * surface (reference src/validation/quality.py computes per-dataset
  * profiles) with the corpus-level statistics an LLM-data curation run
  * needs; numerics follow graft.functions.exact (integer counts, basis
  * points) so results are engine-exact.
  */
object Mining {

  /** Bigram next-token table: for each prefix token, the most frequent
    * successor and the prefix's total continuation count — the n-gram
    * LM shape (KenLM-style count tables, autocomplete, domain-shift
    * probes). Adjacent pairs are built per-row with zip_with over two
    * slices of the token array — no positional explode + self-join, so
    * the only shuffle is the (w1, w2) count aggregation, which
    * map-side-combines to the vocabulary size.
    *
    * Ties on pair count break by successor token ascending; the final
    * ordering (prefix count desc, prefix asc) is total, so a LIMIT on
    * the result is deterministic. */
  def bigramNext(df: DataFrame, contentCol: String): DataFrame = {
    val pairs = df
      .select(text.tokens(col(contentCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        """zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
          |  (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val counts = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_n"))
    val byPrefix = Window.partitionBy(col("w1"))
    counts
      .withColumn("rk", row_number().over(
        byPrefix.orderBy(col("pair_n").desc, col("w2"))))
      .withColumn("prefix_n", sum(col("pair_n")).over(byPrefix))
      .filter(col("rk") === 1)
      .select(col("w1"), col("w2").as("next_w"),
        col("pair_n").cast(LongType).as("pair_n"),
        col("prefix_n").cast(LongType).as("prefix_n"))
  }

  /** Truncation/prefix duplicate groups: documents whose first
    * `prefixChars` characters agree. Groups where the full texts also
    * all agree are exact dups (q30's territory); groups with MORE
    * distinct full texts than one are the truncation/continuation
    * families exact dedup misses. One hash-keyed aggregation. */
  def prefixDupGroups(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      prefixChars: Int = 50): DataFrame =
    df.groupBy(md5(substring(col(contentCol), 1, prefixChars))
        .as("prefix_hash"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col(contentCol))).as("n_distinct_full"),
        min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") >= 2)

  /** Cross-source shingle overlap: for every source pair, the number of
    * shared distinct word-n-gram shingle hashes and the containment in
    * basis points relative to the smaller side — the corpus-diff /
    * contamination matrix between data sources.
    *
    * Shape: distinct (source, shingle-hash) pairs, then a self-join on
    * the hash. A shingle shared by s sources contributes s*(s-1)/2
    * rows, bounded by the square of the source COUNT (not corpus
    * size), so the join output stays proportional to the input. */
  def sourceOverlap(
      df: DataFrame,
      sourceCol: String,
      contentCol: String,
      n: Int = 5): DataFrame = {
    // One shingling pass: the shingle set self-joins on the hash with
    // a.source <= b.source, so the diagonal (x,x) count IS the
    // per-source distinct-shingle total and no separate totals scan is
    // needed. Both join inputs are the same shuffle-on-h exchange, which
    // Spark reuses (ReusedExchange) — the corpus is scanned and shingled
    // once. (A groupBy(h).collect_set alternative is one shuffle too,
    // but millions of tiny groups push ObjectHashAggregate into its
    // sort-based fallback and measure ~2× slower.) Totals then attach to
    // the pair rows with two windows over the tiny pair aggregate.
    val sh = df
      .select(col(sourceCol).as("source"),
        text.tokens(col(contentCol)).as("t"))
      .select(col("source"),
        explode(array_distinct(text.shingleHashesOf(col("t"), n))).as("h"))
      .distinct()
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") <= col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("cnt"))
    val diag = max(when(col("src_a") === col("src_b"), col("cnt")))
    pairs
      .withColumn("total_a", diag.over(Window.partitionBy(col("src_a"))))
      .withColumn("total_b", diag.over(Window.partitionBy(col("src_b"))))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        col("cnt").cast(LongType).as("shared"),
        col("total_a").cast(LongType).as("total_a"),
        col("total_b").cast(LongType).as("total_b"),
        expr("cnt * 10000 div least(total_a, total_b)")
          .cast(LongType).as("containment_bp"))
  }

  /** Per-document shingle novelty in first-seen (id ascending) order:
    * how many of a document's distinct shingles appear in NO
    * earlier-id document — the marginal-contribution measure behind
    * "process the crawl in order, keep what adds content". Two
    * hash-keyed shuffles (min-id per shingle, then count per doc). */
  def shingleNovelty(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      n: Int = 5): DataFrame = {
    // Single shingling pass: first_id is a min() window over the
    // shingle-hash partition, so the shingle set is computed and
    // shuffled once (the previous groupBy+join shape computed it twice
    // and shuffled it twice).
    val sh = df
      .select(col(idCol).as("id"), text.tokens(col(contentCol)).as("t"))
      .select(col("id"),
        explode(array_distinct(text.shingleHashesOf(col("t"), n))).as("h"))
    sh.withColumn("first_id", min(col("id")).over(
        Window.partitionBy(col("h"))))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("id"),
        col("n_shingles").cast(LongType).as("n_shingles"),
        col("n_novel").cast(LongType).as("n_novel"),
        expr("n_novel * 10000 div n_shingles")
          .cast(LongType).as("novelty_bp"))
  }

  /** Recall of an approximate top-k against the exact top-k: joins the
    * two result sets on (query, neighbor) and reports hit count over
    * the exact result size in basis points — the standard ANN quality
    * gate run before trusting a bucketed index at scale. Both inputs
    * must carry (query_id, neighbor_id) columns, as
    * Similarity.bruteForceTopK / bucketedTopK produce. */
  def annRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
    exact.agg(
        countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("exact_n"))
      .crossJoin(hits.agg(count(lit(1)).as("hits")))
      .select(col("n_queries"), col("exact_n"), col("hits"),
        when(col("exact_n") > 0, expr("hits * 10000 div exact_n"))
          .cast(LongType).as("recall_bp"))
  }
}
