package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mining, Similarity}

/** Unit coverage for graft.operators.Mining on small hand-checked
  * corpora (the oracle queries cover the same operators at SF scale). */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("bigramNext picks the most frequent successor, ties by token") {
    val df = docs(
      1L -> "a b a b a c",
      2L -> "a c x")
    // pairs: doc1 (a,b)x2 (b,a)x2 (a,c); doc2 (a,c) (c,x)
    // -> prefix a: b=2, c=2 (tie -> b), prefix_n = 4
    val out = Mining.bigramNext(df, "text")
      .orderBy($"w1").collect()
    val a = out.find(_.getString(0) == "a").get
    assert(a.getString(1) == "b" && a.getLong(2) == 2 && a.getLong(3) == 4)
    val c = out.find(_.getString(0) == "c").get
    assert(c.getString(1) == "x" && c.getLong(2) == 1)
  }

  test("prefixDupGroups groups by prefix and counts distinct full texts") {
    val common = "x" * 60
    val df = docs(
      1L -> (common + " tail one"),
      2L -> (common + " tail two"),
      3L -> (common + " tail one"),
      4L -> "completely different")
    val out = Mining.prefixDupGroups(df, "doc_id", "text", 50).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_docs") == 3)
    assert(out.head.getAs[Long]("n_distinct_full") == 2)
    assert(out.head.getAs[Long]("keep_id") == 1L)
  }

  test("sourceOverlap containment_bp is exact for full containment") {
    val df = Seq(
      ("s1", "p q r s t u v w"),          // shingles of s1
      ("s2", "p q r s t u v w extra a b") // superset side
    ).toDF("source", "text")
    val out = Mining.sourceOverlap(df, "source", "text", n = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("src_a") == "s1")
    // every s1 shingle appears in s2 -> containment vs the smaller side
    // is 100% = 10000 bp
    assert(r.getAs[Long]("shared") == r.getAs[Long]("total_a"))
    assert(r.getAs[Long]("containment_bp") == 10000L)
  }

  test("shingleNovelty marks first-seen shingles novel") {
    val df = docs(
      1L -> "a b c d e f",     // 2 distinct 5-gram shingles, both novel
      2L -> "a b c d e f",     // exact copy: nothing novel
      3L -> "z z z z z z z z") // disjoint: all novel
    val out = Mining.shingleNovelty(df, "doc_id", "text", n = 5)
      .orderBy($"id").collect()
    assert(out.map(_.getAs[Long]("novelty_bp")).toSeq ==
      Seq(10000L, 0L, 10000L))
    assert(out(1).getAs[Long]("n_novel") == 0L)
  }

  test("annRecall is 10000 bp when approx equals exact") {
    val emb = Seq(
      (0L, Array(1.0f, 0.1f, 0.2f, 0.3f, 0.1f, 0.2f)),
      (1L, Array(0.9f, 0.2f, 0.1f, 0.2f, 0.2f, 0.1f)),
      (2L, Array(0.8f, 0.1f, 0.3f, 0.1f, 0.3f, 0.2f)),
      (3L, Array(0.7f, 0.3f, 0.2f, 0.2f, 0.1f, 0.3f))
    ).toDF("vec_id", "embedding")
    val qs = emb.filter($"vec_id" < 2)
    // all vectors share the all-positive orthant -> bucket search IS
    // exhaustive -> recall must be exactly 1
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 2)
    val approx = Similarity.bucketedTopK(emb, qs, "vec_id", "embedding",
      k = 2, signBits = 6)
    val r = Mining.annRecall(exact, approx).collect().head
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Long]("exact_n") == 4L)
    assert(r.getAs[Long]("recall_bp") == 10000L)
  }

  test("semanticDedup drops the higher id of a near-identical cluster pair") {
    // Two tight groups far apart (orthogonal axes). k=2 with ids 0,1 as
    // seeds separates them; within each group every pair has cos ~1, so
    // the lowest id survives and every other member drops. The lone
    // near-orthogonal outlier (id 5, mixed direction, cos < 0.3 to
    // everything in its cluster) must survive.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(0.01f, 0.99f, 0.0f, 0.0f)),
      (4L, Array(0.98f, 0.0f, 0.01f, 0.0f)),
      (5L, Array(0.1f, 0.0f, -0.99f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.3)
      .orderBy("vid").collect()
    val dropped = out.filter(_.getAs[Boolean]("dropped")).map(_.getLong(0)).toSet
    assert(dropped === Set(2L, 3L, 4L)) // 0 and 1 survive as min ids; 5 unique
    assert(out.length === 6)
  }
}
