package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.text

/** Bit-parity of the native per-row SimHash60 against the explode +
  * 60-sum grouped aggregate it replaces (the pre-r19 Dedup.simhash),
  * on randomized corpora plus the edges: empty text (split yields
  * [""]), repeated tokens, multi-space runs, single-char docs, and a
  * null token ELEMENT (votes -1 per bit in both forms). */
class SimHash60Spec extends SparkSpec {
  import spark.implicits._

  /** The exact pre-r19 grouped form. */
  private def groupedSimhash(df: org.apache.spark.sql.DataFrame) = {
    val bits = 60
    val tok = df.select(col("doc_id").as("id"),
      explode(text.tokens(col("text"))).as("tok"))
      .withColumn("h", text.md5Hash60(col("tok")))
    val balances = tok.groupBy("id").agg(
      sum(when(expr("(h >> 0) & 1") === 1, 1).otherwise(-1)).as("b0"),
      (1 until bits).map(b =>
        sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"b$b")): _*)
    balances.select(col("id"),
      (0 until bits).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).cast(LongType).as("simhash"))
  }

  test("parity with the grouped form on randomized docs and edges") {
    val rnd = new scala.util.Random(19)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "Yz", "0", "ä")
    val docs = (1 to 80).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40) + 1)(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq(
      (200L, ""),              // split -> [""]
      (201L, "   "),           // trim -> "" -> [""]
      (202L, "a"),             // single token
      (203L, "a  b\t c"),      // multi-whitespace runs
      (204L, "same same same same"))
    val df = docs.toDF("doc_id", "text")
    val native = operators.Dedup.simhash(df, "doc_id", "text")
    val grouped = groupedSimhash(df)
    val joined = native.as("n").join(grouped.as("g"), Seq("id"), "full")
      .select(col("id"), col("n.simhash").as("ns"), col("g.simhash").as("gs"))
      .collect()
    assert(joined.length == docs.length)
    joined.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"id=${r.getLong(0)} missing")
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}")
    }
  }

  test("null text drops the row, like the explode did") {
    val df = Seq((1L, Option("a b")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val out = operators.Dedup.simhash(df, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }

  test("null token element votes -1 per bit, like the when/otherwise") {
    // feed a hand-built token array with a null element through both
    // the native expression and the grouped arithmetic
    val df = Seq((1L, Seq[String]("a", null, "b"))).toDF("id", "toks")
    val nat = df.select(graft.plans.SimHash60(col("toks")).as("s"))
      .head.getLong(0)
    val grouped = df
      .select(col("id"), explode(col("toks")).as("tok"))
      .withColumn("h", text.md5Hash60(col("tok")))
      .groupBy("id").agg(
        sum(when(expr("(h >> 0) & 1") === 1, 1).otherwise(-1)).as("b0"),
        (1 until 60).map(b =>
          sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"b$b")): _*)
    val g = grouped.select(
      (0 until 60).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).cast(LongType).as("s")).head.getLong(0)
    assert(nat == g)
  }

  test("codegen path inside a projection") {
    val df = Seq((1L, "hello world hello")).toDF("doc_id", "text")
    val a = operators.Dedup.simhash(df, "doc_id", "text").head.getLong(1)
    val b = groupedSimhash(df).head.getLong(1)
    assert(a == b)
  }
}
