package graft

import org.apache.spark.sql.functions._

import graft.operators.Ranking
import graft.plans.{MisraGriesAgg, ZOrder16}

/** Retrieval-scoring family: Z-order interleave (native expression vs a
  * Scala bit-twiddling reference, locality property, SQL registration),
  * Misra-Gries heavy hitters (guarantee under adversarial order and
  * repartitioning), and BM25 ranking sanity. */
class RankingSpec extends SparkSpec {

  // independent per-bit reference implementation
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorder16 matches the per-bit reference on boundary and random points") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (255L, 256L), (43690L, 21845L)) ++
      (1 to 50).map(i => ((i * 2654435761L) & 0xFFFFL, (i * 40503L) & 0xFFFFL))
    import spark.implicits._
    val df = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder16.zorder16(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zorder16 SQL registration and interpreted path agree with codegen") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong * 37 % 65536, i.toLong * 101 % 65536))
      .toDF("x", "y").createOrReplaceTempView("zpts")
    val viaSql = spark.sql(
      "SELECT x, y, graft_zorder16(x, y) AS z FROM zpts").collect()
    viaSql.foreach(r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1))))
    spark.catalog.dropTempView("zpts")
  }

  test("zorder sort clusters 2-d neighborhoods (range-scan span shrinks)") {
    import spark.implicits._
    // 32x32 grid; rows sorted by zorder vs by row-major (x, y)
    val grid = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("z", ZOrder16.zorder16(col("x"), col("y")))
    // positions of an 8x8 query box in each ordering
    val zSorted = df.orderBy("z").collect().zipWithIndex
    val xySorted = df.orderBy("x", "y").collect().zipWithIndex
    def span(rows: Seq[(org.apache.spark.sql.Row, Int)]): Int = {
      val pos = rows.collect {
        case (r, i) if r.getLong(0) < 8 && r.getLong(1) < 8 => i
      }
      pos.max - pos.min + 1
    }
    val zSpan = span(zSorted.toSeq)
    val xySpan = span(xySorted.toSeq)
    // z-order keeps the 8x8 box in one contiguous run of 64; row-major
    // scatters it across 8 stripes spanning ~8*32 rows
    assert(zSpan == 64, s"z-order span $zSpan")
    assert(xySpan > 200, s"row-major span $xySpan")
  }

  test("misra-gries guarantee: heavy items survive adversarial order and partitioning") {
    import spark.implicits._
    // 3 heavy items (freq > n/(k+1) with k=4) drowned in distinct noise,
    // heavy items emitted LAST so the decrement path is exercised first
    val noise = (1 to 900).map(i => s"noise_$i")
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(250)("gamma")
    val data = (noise ++ heavy).toDF("w").repartition(7)
    val n = data.count() // 1850; n/5 = 370 -> only alpha qualifies at k=4
    val cands = data.agg(MisraGriesAgg.misraGries(col("w"), 4).as("c"))
      .head.getSeq[String](0).toSet
    assert(cands.contains("alpha"), s"alpha missing from $cands")
    assert(cands.size <= 4)
    // end-to-end: exact verify keeps exactly the true heavy hitters
    val hh = Ranking.heavyHitters(data, "w", k = 4, sketchK = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expected = Map("alpha" -> 400L, "beta" -> 300L)
      .filter { case (_, c) => c * 5 > n }
    assert(hh == expected, s"got $hh")
  }

  test("charQuality: empty document reports NULL ratio, no crash") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "ok")).toDF("doc_id", "text")
    val rows = Ranking.charQuality(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getLong(4) === 0L) // n_chars
    assert(rows(0).isNullAt(5)) // nonascii_bp NULL, not divide-by-zero
    assert(rows(1).getLong(5) === 0L)
  }

  test("bm25 ranks a term-dense short doc above a term-sparse long doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join join join fast"),
      (2L, "spark " + ("filler " * 200) + "join"),
      (3L, "no relevant terms here at all")).toDF("doc_id", "text")
    val scores = Ranking.bm25(docs, "doc_id", "text", Seq("join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scores.contains(1L) && scores.contains(2L) && !scores.contains(3L))
    assert(scores(1L) > scores(2L))
  }

  test("bigram LM score: common continuation outranks rare continuation") {
    import spark.implicits._
    val docs = (1 to 10).map(i => (i.toLong, "the quick brown fox")) ++
      Seq((11L, "the slow brown fox"))
    val r = Ranking.bigramLmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(3))).toMap
    // doc 1: (the,quick)=10/11, (quick,brown)=10/10, (brown,fox)=11/11
    assert(r(1L) == (909090L + 1000000L + 1000000L) / 3)
    // doc 11: (the,slow)=1/11 drags the average down
    assert(r(11L) == (90909L + 1000000L + 1000000L) / 3)
    assert(r(1L) > r(11L))
  }
}
