package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.text
import graft.plans.WordShingleMd5

/** Parity of the native md5 shingle hasher against the composable
  * forms it replaces: hash32 vs transform(shinglesOf, conv(substr(
  * md5)...)), hash128 vs the md5 HEX STRING (bijectivity is the
  * contract: equal structs <=> equal hex), and the native minhash fold
  * vs the aggregate+zip_with+least HOF — on randomized docs plus the
  * short-doc, empty-string, multi-space, null-token and unicode edges. */
class WordShingleMd5Spec extends SparkSpec {
  import spark.implicits._

  private def docsDf = {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "x", "Yz", "0", "ä", "日本")
    ((1 to 60).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))))
    } ++ Seq(
      (200L, Seq("")),                    // split("") shape
      (201L, Seq("one")),                 // shorter than n
      (202L, Seq("a", "b")),              // exactly n for n=2
      (203L, Seq[String]("a", null, "b")) // null token element
    )).toDF("id", "toks")
  }

  /** Pre-r19 composable hash32 form. */
  private def hofHash32(n: Int) =
    transform(text.shinglesOf(col("toks"), n), s =>
      conv(substring(md5(s), 1, 8), 16, 10).cast(LongType))

  test("hash32 == conv(substr(md5(shingle),1,8),16,10) for n=1,2,3") {
    Seq(1, 2, 3).foreach { n =>
      val got = docsDf.select(col("id"),
        WordShingleMd5.hash32(col("toks"), n).as("nat"),
        hofHash32(n).as("hof")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n id=${r.getLong(0)}")
      }
    }
  }

  test("hash32 with prefix == md5Hash32(shingle, seed) per token") {
    // empty arrays excluded: the per-token transform reference yields
    // [] there while shingle semantics (which the native follows, like
    // shinglesOf) yield one whole-doc shingle — callers feed split()
    // output, which is never empty
    val got = docsDf.filter(not(array_contains(col("toks"), "")) &&
        size(col("toks")) > 0)
      .select(col("id"),
        WordShingleMd5.hash32(col("toks"), 1, "7:").as("nat"),
        transform(col("toks"), w => text.md5Hash32(w, 7)).as("hof"))
      .collect()
    got.foreach { r =>
      // md5Hash32(null token) is null and the native skips nulls in
      // window assembly -> hashes md5("7:") instead; restrict the
      // parity claim to non-null tokens (the only callers' shape).
      val nat = r.getSeq[Long](1)
      val hof = r.getSeq[Any](2)
      if (!hof.contains(null))
        assert(nat == hof.map(_.asInstanceOf[Long]), s"id=${r.getLong(0)}")
    }
  }

  test("hash128 is bijective with the md5 hex string per window") {
    val n = 2
    val got = docsDf.select(col("id"),
      WordShingleMd5.hash128(col("toks"), n).as("nat"),
      transform(text.shinglesOf(col("toks"), n), s => md5(s)).as("hex"))
      .collect()
    got.foreach { r =>
      val nat = r.getSeq[org.apache.spark.sql.Row](1)
      val hex = r.getSeq[String](2)
      assert(nat.length == hex.length, s"id=${r.getLong(0)}")
      nat.zip(hex).foreach { case (st, hx) =>
        val h1 = java.lang.Long.parseUnsignedLong(hx.substring(0, 16), 16)
        val h2 = java.lang.Long.parseUnsignedLong(hx.substring(16, 32), 16)
        assert(st.getLong(0) == h1 && st.getLong(1) == h2,
          s"id=${r.getLong(0)} hex=$hx")
      }
    }
  }

  test("native minhash fold == aggregate+zip_with+least HOF") {
    val k = 8
    def hofMinhash(hs: org.apache.spark.sql.Column) =
      aggregate(hs,
        array((0 until k).map(_ => lit(Long.MaxValue)): _*),
        (acc, h) => zip_with(acc,
          array((0 until k).map { i =>
            val (a, b) = text.minhashPerm(i)
            (h * lit(a) + lit(b)) % lit(text.minhashPrime)
          }: _*),
          (x, y) => least(x, y)))
    val base = docsDf.select(col("id"),
      WordShingleMd5.hash32(col("toks"), 2).as("hs"))
    val got = base.select(col("id"),
      text.minhashFromHashes(col("hs"), k).as("nat"),
      hofMinhash(col("hs")).as("hof")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
  }

  test("duplicatedSpans md5 path unchanged by the hash128 key") {
    // the operator's old gram key was the md5 hex string; the struct
    // key must produce the identical span set
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f q"),
      (3L, "c d e f g h z z z"),
      (4L, "totally different words here now")).toDF("doc_id", "text")
    val spans = operators.Curation.duplicatedSpans(docs, "doc_id", "text",
      n = 3, minDf = 2).orderBy("doc_id", "start_tok").collect()
    // windows shared: doc1/doc2 share "a b c","b c d","c d e","d e f";
    // doc1/doc3 share "c d e","d e f","e f g","f g h"
    val byDoc = spans.groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getAs[Long]("start_tok"),
        r.getAs[Long]("end_tok"))).toSeq).toMap
    assert(byDoc(1L) == Seq((0L, 7L)))     // a..h fully covered
    assert(byDoc(2L) == Seq((2L, 7L)))     // a b c d e f
    assert(byDoc(3L) == Seq((0L, 5L)))     // c d e f g h
  }
}
