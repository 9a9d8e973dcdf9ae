package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.text
import graft.plans.MisraGriesAgg

/** Retrieval-scoring and corpus-statistics operators: BM25 ranking,
  * sketch-gated exact heavy hitters, bigram language-model quality
  * scoring, and character-level encoding quality — the text-curation
  * scoring family, all in integer arithmetic so results are
  * partitioning- and engine-exact (see graft.functions.exact's
  * rationale; floats never survive an aggregation here).
  */
object Ranking {

  /** BM25 document ranking for a fixed term set, in the log-free
    * rational form: the classic idf `ln((N-df+0.5)/(df+0.5))` is
    * replaced by the rational odds `(2N-2df+1)/(2df+1)` (the same
    * monotone ordering in df — log is monotone — so rankings for a
    * single term agree; across terms the rational form weighs rare
    * terms more sharply). With k1 = 1.2 and b = 0.75 the per-term score
    *
    *   idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl))
    *
    * clears to integers when multiplied through by 10*T (T = total
    * corpus tokens, avgdl = T/N):
    *
    *   score_t = (2N-2df+1) * 22*T*tf * SCALE
    *             div ((2df+1) * (10*T*tf + 3*T + 9*len*N))
    *
    * — pure int64 arithmetic, summed per document as integers: no
    * float aggregation anywhere, so the result is bit-identical on any
    * engine at any partitioning. (int64 bounds: safe while
    * N*T*tf*SCALE < 9e18; at extreme corpus sizes drop SCALE or
    * compute in decimal.)
    *
    * Plan shape: tokens explode once, filtered to the term set BEFORE
    * any shuffle (the filter prunes to matching tokens only); df is a
    * |terms|-row broadcast; totals are a 1-row broadcast; the only
    * data-sized shuffles key on (doc, term) and doc.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      terms: Seq[String],
      scale: Long = 10000L): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      text.tokens(col(contentCol)).as("t"))
    val lens = toks.select(col("id"), size(col("t")).cast(LongType).as("len"))
    val totals = lens.agg(
      count(lit(1)).as("n_docs"),
      sum(col("len")).as("n_tokens"))
    val occ = toks
      .select(col("id"), explode(col("t")).as("w"))
      .filter(col("w").isin(terms: _*))
    val tf = occ.groupBy(col("id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "w")
      .join(lens, "id")
      .crossJoin(broadcast(totals))
      .withColumn("term_score",
        expr(s"""(2 * n_docs - 2 * df + 1) * (22 * n_tokens * tf) * $scale
                | div ((2 * df + 1)
                |      * (10 * n_tokens * tf + 3 * n_tokens + 9 * len * n_docs))
                |""".stripMargin).cast(LongType))
      .groupBy(col("id"))
      .agg(
        sum(col("term_score")).cast(LongType).as("bm25_scaled"),
        count(lit(1)).cast(LongType).as("n_terms_matched"))
  }

  /** Exact heavy hitters above the n/(k+1) frequency threshold, with a
    * Misra-Gries candidate pass: the sketch (native mergeable
    * TypedImperativeAggregate, sketchK >= k counters) yields a bounded
    * candidate array whose guarantee covers every true heavy hitter;
    * a semi-join re-counts ONLY candidate tokens exactly. The full
    * token vocabulary is never aggregated — at corpus scale the
    * grouped aggregation runs on a set bounded by sketchK, not by the
    * (billions-of-terms) vocabulary.
    */
  def heavyHitters(
      tokens: DataFrame,
      tokenCol: String,
      k: Int,
      sketchK: Int): DataFrame = {
    require(sketchK >= k, "sketchK must be >= k for the n/(k+1) guarantee")
    val w = tokens.select(col(tokenCol).as("w"))
    val cands = w.agg(MisraGriesAgg.misraGries(col("w"), sketchK).as("cands"))
      .select(explode(col("cands")).as("w"))
    val tot = w.agg(count(lit(1)).as("total"))
    w.join(broadcast(cands), Seq("w"), "left_semi")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * (k + 1) > col("total"))
      .select(col("w").as("token"), col("cnt"), col("total"))
  }

  /** Per-document bigram language-model score in integer millionths:
    * for each adjacent token pair, the corpus conditional probability
    * P(w2 | w1) = pairCount(w1,w2) / prefixCount(w1) floored to
    * millionths, then averaged per document by integer division — the
    * n-gram-LM fluency gate (KenLM-style filtering) without logs, so
    * every value is integer-exact. Adjacent pairs come from zip_with
    * over two array slices (no positional explode + self-join); the
    * count tables join back WITHOUT broadcast hints — they are
    * vocabulary-sized, and AQE broadcasts them only while genuinely
    * small.
    */
  def bigramLmScore(
      df: DataFrame,
      idCol: String,
      contentCol: String): DataFrame = {
    val pairs = df
      .select(col(idCol).as("id"), text.tokens(col(contentCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("id"), explode(expr(
        """zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
          |  (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin)).as("p"))
      .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_n"))
    val c1 = pairs.groupBy(col("w1"))
      .agg(count(lit(1)).as("prefix_n"))
    pairs
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .withColumn("p_micro", expr("pair_n * 1000000 div prefix_n"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).cast(LongType).as("n_pairs"),
        sum(col("p_micro")).cast(LongType).as("sum_p_micro"))
      .withColumn("avg_p_micro", expr("sum_p_micro div n_pairs").cast(LongType))
  }

  /** Character-level encoding quality: replacement characters (U+FFFD,
    * the mojibake fingerprint), C0 control characters, and the
    * ASCII-printable ratio in basis points. Count-by-removal
    * (length difference after regexp_replace) works identically in
    * Java regex and RE2; a narrow codegen'd projection, zero shuffles.
    */
  def charQuality(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val c = col(contentCol)
    def removedCount(pattern: String): Column =
      (length(c) - length(regexp_replace(c, pattern, ""))).cast(LongType)
    df.select(
        col(idCol),
        removedCount("�").as("n_replacement"),
        removedCount("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").as("n_control"),
        removedCount("[^\\x20-\\x7E\\t\\n\\r]").as("n_nonascii"),
        length(c).cast(LongType).as("n_chars"))
      // nullif: an empty document reports NULL instead of an ANSI
      // divide-by-zero crash.
      .withColumn("nonascii_bp",
        expr("n_nonascii * 10000 div nullif(n_chars, 0)").cast(LongType))
  }
}
