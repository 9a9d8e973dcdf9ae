package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Similarity}
import graft.syntax._

/** The fluent syntax must be pure delegation: identical logical plans
  * (and therefore identical results) to the explicit operator calls. */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "a b c d e f g h i j"),
    (3L, "k l m n o p q r s t"))
    .toDF("doc_id", "text")

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.5f, 0.2f, -0.1f, 0.3f, 0.7f, -0.4f)),
    (2L, Array(0.9f, 0.1f, 0.4f, 0.2f, -0.2f, 0.3f, 0.6f, -0.5f)),
    (3L, Array(-1.0f, 0.2f, -0.3f, -0.6f, 0.4f, -0.2f, -0.8f, 0.1f)))
    .toDF("vec_id", "embedding")

  private def samePlan(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit =
    assert(a.queryExecution.optimizedPlan.canonicalized ===
      b.queryExecution.optimizedPlan.canonicalized)

  test("document ops delegate to the operator objects") {
    samePlan(docs.dedupExact("doc_id", "text"),
      Dedup.exactByHash(docs, "doc_id", "text"))
    samePlan(docs.dropDuplicatedSegments("doc_id", "text"),
      Curation.removeDuplicatedSegments(docs, "doc_id", "text"))
    samePlan(docs.duplicatedSpans("doc_id", "text"),
      Curation.duplicatedSpans(docs, "doc_id", "text"))
    samePlan(docs.dropDuplicatedSpans("doc_id", "text"),
      Curation.removeDuplicatedSpans(docs, "doc_id", "text"))
    samePlan(docs.boilerplateProfile("doc_id", "text"),
      Curation.boilerplateProfile(docs, "doc_id", "text"))
    samePlan(docs.chunk("doc_id", "text", size = 4, stride = 2),
      Curation.chunkTokens(docs, "doc_id", "text", 4, 2))
    samePlan(docs.packInto("doc_id", "doc_id", "text", capacity = 8),
      Curation.packingManifest(docs, "doc_id", "doc_id", "text", 8))
    samePlan(
      docs.contaminationAgainst(col("doc_id") === 1L, "doc_id", "text"),
      Curation.contamination(docs, "doc_id", "text", col("doc_id") === 1L))
    locally {
      val plan = Seq(("a", 25000L)).toDF("source", "rate_bp")
      val src = docs.withColumn("source", lit("a"))
      samePlan(src.applyMixture("source", plan, "text"),
        Curation.applyMixture(src, "source", plan, "text"))
    }
    samePlan(docs.importanceWeightsAgainst(
        docs.filter(col("doc_id") === 1L), "doc_id", "text"),
      Curation.importanceWeights(
        docs, docs.filter(col("doc_id") === 1L), "doc_id", "text"))
    // containmentPairs is EAGER (r15) — result equality, like
    // similarPairs below.
    locally {
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
      assert(rows(docs.containedInPairs("doc_id", "text", 6000, shingle = 3)) ===
        rows(Dedup.containmentPairs(docs, "doc_id", "text", 6000, 3)))
    }
    // prefixFilterPairs is EAGER (localCheckpoint at construction), so
    // two invocations yield two distinct LogicalRDDs that can never
    // canonicalize equal — delegation is asserted on RESULTS, the same
    // convention the eager Graph ops use below. Both shingle forms.
    locally {
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
      assert(rows(docs.similarPairs("doc_id", "text")) ===
        rows(Dedup.prefixFilterPairs(docs, "doc_id", "text")))
      assert(rows(docs.similarPairs("doc_id", "text",
          thresholdBp = 5000, shingle = 3)) ===
        rows(Dedup.prefixFilterPairs(docs, "doc_id", "text", 5000, 3)))
    }
    // r16 additions: the remaining Dedup operators and candidate
    // probes. Lazy ones assert plan identity; eager ones (localCheckpoint
    // at construction) assert result equality, per the convention above.
    samePlan(
      docs.sortedNeighborhoodPairs("doc_id", "text", windowSize = 2),
      Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text", windowSize = 2))
    locally {
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.orderBy(d.columns.head, d.columns(1)).collect().map(_.toSeq).toSeq
      val corpus = docs.filter($"doc_id" < 3)
      val incoming = docs.filter($"doc_id" >= 3)
      assert(rows(incoming.dedupAgainst(corpus, "doc_id", "text")) ===
        rows(Dedup.dedupAgainst(corpus, incoming, "doc_id", "text")))
      assert(rows(docs.simhashDupPairs("doc_id", "text")) ===
        rows(Dedup.simhashDupBlocked(docs, "doc_id", "text")))
      assert(rows(docs.similarPairsProfile("doc_id", "text", shingle = 3)) ===
        rows(Dedup.prefixFilterCandidateProfile(
          docs, "doc_id", "text", shingle = 3)))
      assert(rows(docs.simhashDupProfile("doc_id", "text")) ===
        rows(Dedup.simhashBlockedCandidateProfile(docs, "doc_id", "text")))
      assert(rows(docs.nearDupProfile("doc_id", "text", k = 8)) ===
        rows(Dedup.lshCandidateProfile(docs, "doc_id", "text", k = 8)))
    }
    locally {
      val right = docs.select($"doc_id".as("rid"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("rt"))
      val left = docs.select($"doc_id",
        lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")).as("t"))
      samePlan(
        left.asofJoin(right, "doc_id", "rid", "t", "rt", "rid"),
        graft.plans.AsOfNative.asofJoinLeft(
          left, right, "doc_id", "rid", "t", "rt", "rid"))
    }
  }

  test("embedding ops delegate to the operator objects") {
    val q = vecs.filter($"vec_id" === 1L)
    samePlan(vecs.topKNeighbors(q, "vec_id", "embedding", k = 2),
      Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 2))
    samePlan(vecs.approxTopKNeighbors(q, "vec_id", "embedding"),
      Similarity.bucketedTopK(vecs, q, "vec_id", "embedding"))
    samePlan(vecs.embeddingNearDups("vec_id", "embedding"),
      Dedup.embeddingNearDup(vecs, "vec_id", "embedding"))
  }

  test("edge-list ops delegate to Graph (same results; ops are eager)") {
    // Graph ops run eager per-round jobs and return local relations,
    // so delegation is asserted on RESULTS (plan canonicalization
    // would itself execute both sides anyway).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("u", "v")
    assert(edges.trianglesProfile().collect().head.toSeq ===
      graft.operators.Graph.trianglesProfile(edges).collect().head.toSeq)
    assert(edges.kcorePeel(k = 2).collect().head.toSeq ===
      graft.operators.Graph.kcorePeel(edges, k = 2).collect().head.toSeq)
    assert(edges.bfsReach(col("sn") === 4L, hops = 2).collect().head.toSeq ===
      graft.operators.Graph.bfsReach(edges, col("sn") === 4L, 2)
        .collect().head.toSeq)
  }

  test("fluent chain end-to-end: dedup then near-dup pairs") {
    val pairs = docs.nearDupPairs("doc_id", "text", k = 8, bands = 4)
      .as[(Long, Long, Double, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    val kept = docs.dedupExact("doc_id", "text")
    assert(kept.count() === 2L)
  }
}
