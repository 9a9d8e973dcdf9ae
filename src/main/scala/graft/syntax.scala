package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.{Curation, Dedup, Similarity}

/** Fluent extension syntax: the curation/dedup/similarity operators as
  * DataFrame methods, so pipelines read as one chain —
  *
  * {{{
  * import graft.syntax._
  * docs.nearDupPairs("doc_id", "text")
  * docs.chunk("doc_id", "text", size = 512, stride = 384)
  * corpus.topKNeighbors(queries, "vec_id", "embedding", k = 5)
  * }}}
  *
  * Pure delegation — every method forwards to the corresponding
  * operator object, so the fluent form and the explicit form build the
  * identical plan (SyntaxSpec asserts this).
  */
object syntax {

  implicit class DocumentOps(private val df: DataFrame) extends AnyVal {

    /** Exact content dedup — see [[Dedup.exactByHash]]. */
    def dedupExact(idCol: String, contentCol: String): DataFrame =
      Dedup.exactByHash(df, idCol, contentCol)

    /** MinHash+LSH near-dup candidate pairs with exact-Jaccard verify —
      * see [[Dedup.minhashLsh]]. */
    def nearDupPairs(
        idCol: String,
        contentCol: String,
        k: Int = 16,
        bands: Int = 4,
        shingleN: Int = 3,
        threshold: Double = 0.5): DataFrame =
      Dedup.minhashLsh(df, idCol, contentCol, k, bands, shingleN, threshold)

    /** Corpus-level duplicated-segment removal — see
      * [[Curation.removeDuplicatedSegments]]. */
    def dropDuplicatedSegments(
        idCol: String,
        textCol: String,
        segTokens: Int = 8,
        maxDf: Int = 2,
        fastHash: Boolean = false): DataFrame =
      Curation.removeDuplicatedSegments(
        df, idCol, textCol, segTokens, maxDf, fastHash)

    /** Maximal duplicated-span detection (overlapping n-gram windows,
      * exact token boundaries) — see [[Curation.duplicatedSpans]]. */
    def duplicatedSpans(
        idCol: String,
        textCol: String,
        n: Int = 5,
        minDf: Int = 2,
        fastHash: Boolean = false,
        distinctDocs: Boolean = true): DataFrame =
      Curation.duplicatedSpans(
        df, idCol, textCol, n, minDf, fastHash, distinctDocs)

    /** Maximal duplicated-span REMOVAL (excises the spans
      * [[duplicatedSpans]] detects, order-preserving reassembly) — see
      * [[Curation.removeDuplicatedSpans]]. EAGER (inherits the
      * detector's window-count pre-pass). */
    def dropDuplicatedSpans(
        idCol: String,
        textCol: String,
        n: Int = 5,
        minDf: Int = 2,
        fastHash: Boolean = false,
        distinctDocs: Boolean = true): DataFrame =
      Curation.removeDuplicatedSpans(
        df, idCol, textCol, n, minDf, fastHash, distinctDocs)

    /** Cross-document boilerplate profile — see
      * [[Curation.boilerplateProfile]]. */
    def boilerplateProfile(
        idCol: String,
        contentCol: String,
        n: Int = 5,
        minDf: Int = 3,
        fastHash: Boolean = false): DataFrame =
      Curation.boilerplateProfile(df, idCol, contentCol, n, minDf, fastHash)

    /** Benchmark-contamination check — see [[Curation.contamination]]. */
    def contaminationAgainst(
        isBenchmark: Column,
        idCol: String,
        contentCol: String,
        n: Int = 5,
        minShared: Int = 3,
        fastHash: Boolean = false): DataFrame =
      Curation.contamination(
        df, idCol, contentCol, isBenchmark, n, minShared, fastHash)

    /** Sliding context-window chunking — see [[Curation.chunkTokens]]. */
    def chunk(idCol: String, textCol: String, size: Int, stride: Int): DataFrame =
      Curation.chunkTokens(df, idCol, textCol, size, stride)

    /** Sequence-packing manifest — see [[Curation.packingManifest]]. */
    def packInto(
        shardCol: String,
        idCol: String,
        textCol: String,
        capacity: Int): DataFrame =
      Curation.packingManifest(df, shardCol, idCol, textCol, capacity)

    /** Deterministic per-stratum sample — see
      * [[Curation.stratifiedSample]]. */
    def stratifiedSample(
        strataCol: String,
        hashCol: Column,
        tieCol: String,
        perStratum: Int): DataFrame =
      Curation.stratifiedSample(df, strataCol, hashCol, tieCol, perStratum)

    /** Apply a planned source mixture (down- AND up-sampling) — see
      * [[Curation.applyMixture]]. */
    def applyMixture(
        sourceCol: String,
        plan: DataFrame,
        contentCol: String,
        seed: Int = 11): DataFrame =
      Curation.applyMixture(df, sourceCol, plan, contentCol, seed)

    /** DSIR-style hashed-n-gram importance weights against a target
      * corpus (`n = 2` = the paper's hashed bigrams) — see
      * [[Curation.importanceWeights]]. */
    def importanceWeightsAgainst(
        target: DataFrame,
        idCol: String,
        textCol: String,
        nBuckets: Int = 1024,
        seed: Int = 7,
        fastHash: Boolean = false,
        n: Int = 1): DataFrame =
      Curation.importanceWeights(
        df, target, idCol, textCol, nBuckets, seed, fastHash, n)

    /** Gap-based sessionization — see [[Curation.sessionize]]. */
    def sessionize(
        userCol: String,
        tsCol: String,
        tieCol: String,
        gapMinutes: Int = 30): DataFrame =
      Curation.sessionize(df, userCol, tsCol, tieCol, gapMinutes)

    /** Exact-recall prefix-filter similarity self-join — see
      * [[Dedup.prefixFilterPairs]]. EAGER (runs jobs at call time and
      * returns a materialized result). `shingle` > 1 selects the
      * hashed word-n-gram-shingle form — the scalable configuration
      * for near-dup corpora (see the operator's scaladoc). */
    def similarPairs(
        idCol: String,
        contentCol: String,
        thresholdBp: Int = 6000,
        shingle: Int = 1): DataFrame =
      Dedup.prefixFilterPairs(df, idCol, contentCol, thresholdBp, shingle)

    /** Directed containment join (quote/excerpt detection: id_a's set
      * >= threshold inside id_b's) — see [[Dedup.containmentPairs]].
      *
      * PREFER `shingle >= 2` on natural-language corpora: the cost is
      * the co-occurrence mass Σ df(w)², and at word level stopwords
      * have df ≈ corpus size, so the default `shingle = 1` goes
      * quadratic in n_docs regardless of how rare the rest of the
      * vocabulary is. The operator measures the mass before joining
      * and fails loudly above `coMassBudget` (with a pointer to
      * [[boilerplateProfile]] for corpora whose head is removable);
      * shingling is the structural fix — phrase containment is also
      * the actual quote/excerpt signal. */
    def containedInPairs(
        idCol: String,
        contentCol: String,
        thresholdBp: Int = 9000,
        shingle: Int = 1,
        coMassBudget: Long = 2000000000L): DataFrame =
      Dedup.containmentPairs(
        df, idCol, contentCol, thresholdBp, shingle, coMassBudget)

    /** Incremental corpus dedup: classify THIS frame (the incoming
      * batch) against `corpus` — exact_dup / near_dup / unique with the
      * smallest matching corpus id. EAGER; see [[Dedup.dedupAgainst]]
      * (per-batch cost scales with the batch plus index size, never
      * corpus²). */
    def dedupAgainst(
        corpus: DataFrame,
        idCol: String,
        contentCol: String,
        k: Int = 8,
        bands: Int = 4,
        shingleN: Int = 1,
        threshold: Double = 0.5): DataFrame =
      Dedup.dedupAgainst(
        corpus, df, idCol, contentCol, k, bands, shingleN, threshold)

    /** Sorted-neighborhood blocking pairs (shared-prefix duplicate
      * families at linear cost) — see
      * [[Dedup.sortedNeighborhoodPairs]]. Lazy, single shuffle. */
    def sortedNeighborhoodPairs(
        idCol: String,
        contentCol: String,
        blockPrefixLen: Int = 8,
        windowSize: Int = 3,
        thresholdBp: Int = 5000): DataFrame =
      Dedup.sortedNeighborhoodPairs(
        df, idCol, contentCol, blockPrefixLen, windowSize, thresholdBp)

    /** SimHash near-dup pairs via Manku multi-block banding — the scale
      * form of the simhash family (recall-complete by pigeonhole, key
      * width grows with the corpus). EAGER; see
      * [[Dedup.simhashDupBlocked]]. */
    def simhashDupPairs(
        idCol: String,
        contentCol: String,
        maxHamming: Int = 3,
        blocks: Int = 6): DataFrame =
      Dedup.simhashDupBlocked(df, idCol, contentCol, maxHamming, blocks)

    /** Candidate-volume probe for [[similarPairs]]' PPJoin filter
      * ladder (exact counts, no verification) — see
      * [[Dedup.prefixFilterCandidateProfile]]. EAGER, one row. */
    def similarPairsProfile(
        idCol: String,
        contentCol: String,
        thresholdBp: Int = 6000,
        shingle: Int = 1,
        positional: Boolean = true): DataFrame =
      Dedup.prefixFilterCandidateProfile(
        df, idCol, contentCol, thresholdBp, shingle, positional)

    /** Candidate-volume probe for [[simhashDupPairs]]' (blocks,
      * maxHamming) banding knob — see
      * [[Dedup.simhashBlockedCandidateProfile]]. EAGER, one row. */
    def simhashDupProfile(
        idCol: String,
        contentCol: String,
        maxHamming: Int = 3,
        blocks: Int = 6): DataFrame =
      Dedup.simhashBlockedCandidateProfile(
        df, idCol, contentCol, maxHamming, blocks)

    /** Candidate-volume probe for [[nearDupPairs]]' LSH banding —
      * raw/distinct candidate counts plus the largest band bucket (the
      * quadratic-group warning [[Dedup.lshCandidateProfile]]'s scaladoc
      * explains; collapse exact duplicates with [[dedupExact]] first).
      * EAGER, one row. */
    def nearDupProfile(
        idCol: String,
        contentCol: String,
        k: Int = 16,
        bands: Int = 4,
        shingleN: Int = 3): DataFrame =
      Dedup.lshCandidateProfile(df, idCol, contentCol, k, bands, shingleN)

    /** Native as-of (point-in-time) left join — the custom merge
      * operator, see [[graft.plans.AsOfNative.asofJoinLeft]]. Right
      * columns must not collide with the left's (alias them first).
      * `direction`: "backward" (latest right at-or-before, default),
      * "forward" (earliest right at-or-after) or "nearest" (smaller
      * absolute gap, ties backward).
      *
      * `rightTie` breaks ties among right rows sharing (key, ts):
      * backward keeps the max tie (arg_max: a null tie loses to any
      * non-null), forward the min (arg_min, null loses). CAVEAT for
      * direction="nearest" with a NULLABLE tie column: nearest shares
      * backward's physical sort, so its FORWARD candidate inherits
      * nulls-first ordering — a null-tie right row at an equal future
      * (key, ts) wins over non-null ones there, diverging from the
      * pandas/DuckDB arg_min convention plain forward follows. Use a
      * non-null tie column (any unique id) when nearest must match
      * those engines exactly. */
    def asofJoin(
        right: DataFrame,
        leftKey: String,
        rightKey: String,
        leftTs: String,
        rightTs: String,
        rightTie: String,
        toleranceUs: Option[Long] = None,
        direction: String = "backward"): DataFrame =
      graft.plans.AsOfNative.asofJoinLeft(
        df, right, leftKey, rightKey, leftTs, rightTs, rightTie,
        toleranceUs, direction)

    /** Composite-key native as-of join (DuckDB ASOF with multiple
      * equality conditions) — see
      * [[graft.plans.AsOfNative.asofJoinLeftMulti]]. */
    def asofJoinMulti(
        right: DataFrame,
        leftKeys: Seq[String],
        rightKeys: Seq[String],
        leftTs: String,
        rightTs: String,
        rightTie: String,
        toleranceUs: Option[Long] = None,
        direction: String = "backward"): DataFrame =
      graft.plans.AsOfNative.asofJoinLeftMulti(
        df, right, leftKeys, rightKeys, leftTs, rightTs, rightTie,
        toleranceUs, direction)
  }

  implicit class EmbeddingOps(private val corpus: DataFrame) extends AnyVal {

    /** Exact brute-force cosine top-k (broadcast query side) — see
      * [[Similarity.bruteForceTopK]]. */
    def topKNeighbors(
        queries: DataFrame,
        idCol: String,
        vecCol: String,
        k: Int = 5): DataFrame =
      Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)

    /** IVF-style sign-bucketed approximate top-k — see
      * [[Similarity.bucketedTopK]]. */
    def approxTopKNeighbors(
        queries: DataFrame,
        idCol: String,
        vecCol: String,
        k: Int = 3,
        signBits: Int = 8): DataFrame =
      Similarity.bucketedTopK(corpus, queries, idCol, vecCol, k, signBits)

    /** int8-quantized top-k (integer-exact scoring) — see
      * [[Similarity.quantizedTopK]]. */
    def quantizedTopKNeighbors(
        queries: DataFrame,
        idCol: String,
        vecCol: String,
        k: Int = 3): DataFrame =
      Similarity.quantizedTopK(corpus, queries, idCol, vecCol, k)

    /** Embedding near-duplicate pairs — see [[Dedup.embeddingNearDup]]. */
    def embeddingNearDups(
        idCol: String,
        vecCol: String,
        threshold: Double = 0.95,
        signBits: Int = 8): DataFrame =
      Dedup.embeddingNearDup(corpus, idCol, vecCol, threshold, signBits)
  }

  /** Graph primitives over (u, v) edge-list DataFrames — see
    * [[graft.operators.Graph]]. These run EAGER iterative jobs
    * (persist/force/release per round), unlike the lazy ops above. */
  implicit class EdgeListOps(private val edges: DataFrame) extends AnyVal {

    /** Triangle count + clustering profile — see
      * [[graft.operators.Graph.trianglesProfile]]. */
    def trianglesProfile(maxBroadcastEdges: Long = 10000000L): DataFrame =
      graft.operators.Graph.trianglesProfile(edges, maxBroadcastEdges)

    /** Bounded k-core peel — see [[graft.operators.Graph.kcorePeel]]. */
    def kcorePeel(k: Int, rounds: Int = 3): DataFrame =
      graft.operators.Graph.kcorePeel(edges, k, rounds)

    /** Bounded BFS reachability — see
      * [[graft.operators.Graph.bfsReach]]. */
    def bfsReach(seedPred: Column, hops: Int = 3): DataFrame =
      graft.operators.Graph.bfsReach(edges, seedPred, hops)
  }
}
