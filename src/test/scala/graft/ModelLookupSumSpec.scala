package graft

import org.apache.spark.sql.functions._

import graft.plans.{BigramSurprisalSum, SortedKvLookupSum}

/** Bit-parity of the compiled binary-search model folds against the
  * map-probing HOF forms they replace in the streaming scorers
  * (classifierScoreStream / perplexityProxyStream), on randomized
  * corpora plus the null/miss/empty edges — including probe keys absent
  * from the model, null probe elements (a miss, +0), documents shorter
  * than one pair, and an empty model table. */
class ModelLookupSumSpec extends SparkSpec {
  import spark.implicits._

  test("SortedKvLookupSum == aggregate over map lookups (randomized)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 60).map { id =>
      // keys drawn wider than the model domain so misses occur
      (id.toLong, Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong: java.lang.Long))
    } :+ (99L, Seq.empty[java.lang.Long]) :+
      (100L, Seq[java.lang.Long](3L, null, 7L)) // null probe = miss
    val df = rows.toDF("id", "keys")
    // model: 20 distinct buckets with signed weights
    val kvRows = (0 until 40 by 2).map(b => (b.toLong, (b * 7 - 50).toLong))
    val kv = kvRows.toDF("b", "w")
      .agg(sort_array(collect_list(struct(col("b"), col("w")))).as("kv"),
        map_from_entries(collect_list(struct(col("b"), col("w")))).as("m"))
    val got = df.crossJoin(kv)
      .select(col("id"),
        SortedKvLookupSum(col("keys"), col("kv")).as("native"),
        expr("""aggregate(keys, 0L, (acc, k) ->
               |  acc + coalesce(m[k], 0L))""".stripMargin).as("hof"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}")
    }
  }

  test("SortedKvLookupSum survives codegen inside a projection") {
    val df = Seq((1L, Seq(2L, 4L, 999L))).toDF("id", "keys")
      .crossJoin(Seq((2L, 10L), (4L, -3L)).toDF("b", "w")
        .agg(sort_array(collect_list(struct(col("b"), col("w")))).as("kv")))
      .select(SortedKvLookupSum(col("keys"), col("kv")).as("s"))
    assert(df.collect().head.getLong(0) == 7L)
  }

  test("BigramSurprisalSum == aggregate over map lookups (randomized)") {
    val rnd = new scala.util.Random(11)
    val vocabWords = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def doc(n: Int) = Seq.fill(n)(vocabWords(rnd.nextInt(vocabWords.size)))
    val model = (1 to 40).map(i => (i.toLong, doc(rnd.nextInt(12)).mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = ((1 to 60).map(i => (i.toLong, doc(rnd.nextInt(20)).mkString(" "))) :+
      (200L, "zz qq zz") :+ // all-miss tokens
      (201L, "aa")          // single token: filtered (no pairs)
    ).toDF("doc_id", "text")
    val mp = model
      .select(graft.functions.text.tokens(col("text")).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(expr(
        """zip_with(slice(__t, 1, size(__t) - 1), slice(__t, 2, size(__t) - 1),
          |  (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val stat = mp.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      .agg(
        sort_array(collect_list(struct(
          concat_ws(" ", col("w1"), col("w2")).as("k"), col("n")))).as("pa"),
        map_from_entries(collect_list(struct(
          concat_ws(" ", col("w1"), col("w2")), col("n")))).as("pm"))
    val statF = mp.groupBy(col("w1")).agg(count(lit(1)).as("n"))
      .agg(
        sort_array(collect_list(struct(col("w1").as("k"), col("n")))).as("fa"),
        map_from_entries(collect_list(struct(col("w1"), col("n")))).as("fm"))
    val v = mp.agg(greatest(countDistinct(col("w2")), lit(1L)).as("v"))
    val got = corpus
      .crossJoin(stat.crossJoin(statF).crossJoin(v))
      .select(col("doc_id"),
        graft.functions.text.tokens(col("text")).as("__t"),
        col("pa"), col("fa"), col("pm"), col("fm"), col("v"))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"),
        BigramSurprisalSum(col("__t"), col("pa"), col("fa"), col("v"))
          .as("native"),
        expr(
          """aggregate(
            |  zip_with(slice(__t, 1, size(__t) - 1), slice(__t, 2, size(__t) - 1),
            |    (a, b) -> named_struct('w1', a, 'w2', b)),
            |  CAST(0 AS DECIMAL(38,0)), (acc, p) ->
            |  acc + CAST((coalesce(fm[p.w1], 0) + v) * 1000000
            |    div (coalesce(pm[concat(p.w1, ' ', p.w2)], 0) + 1)
            |    - 1000000 AS DECIMAL(38,0)))""".stripMargin)
          .cast("long").as("hof"))
      .collect()
    assert(got.length > 50)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"doc_id=${r.getLong(0)}")
    }
  }

  test("BigramSurprisalSum: empty model tables score (0+v)/1-1e6 per pair") {
    val df = Seq((1L, Seq("x", "y", "z"))).toDF("id", "t")
      .select(BigramSurprisalSum(col("t"),
        expr("CAST(array() AS array<struct<k:string,n:bigint>>)"),
        expr("CAST(array() AS array<struct<k:string,n:bigint>>)"),
        lit(5L)).as("s"))
    // per pair: (0 + 5) * 1000000 div 1 - 1000000 = 4000000; two pairs
    assert(df.collect().head.getLong(0) == 8000000L)
  }
}
