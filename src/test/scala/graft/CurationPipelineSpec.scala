package graft

import org.apache.spark.sql.functions._

/** End-to-end contract of the quickstart curation ladder
  * (CurationPipeline.curate): each stage removes exactly the planted
  * duplicates it is responsible for, survivors keep the input schema,
  * and the packing manifest accounts for every surviving token. */
class CurationPipelineSpec extends SparkSpec {

  test("curate removes planted exact, near, and semantic dups; manifest accounts tokens") {
    import spark.implicits._
    val base = (0L until 40L).map { i =>
      // Distinct base documents: shared scaffold, unique content words.
      i -> s"alpha bravo charlie delta echo doc$i word${i}x word${i}y unique token stream number $i"
    }
    val exactDup = Seq( // formatting-only variants -> normalized-exact stage
      100L -> (base(3)._2.toUpperCase + "  "),
      101L -> base(7)._2.replace(" ", "   "))
    val nearDup = Seq( // one appended word -> LSH stage (Jaccard ~0.92)
      200L -> (base(5)._2 + " extra"),
      201L -> (base(9)._2 + " extra"))
    val docs = (base ++ exactDup ++ nearDup).toDF("doc_id", "text")

    // Embeddings: docs 11 and 13 share a direction (cosine 1) while
    // their TEXTS are distinct — only the semantic stage can catch the
    // pair, and it must drop the higher id. Everything else random.
    val rnd = new scala.util.Random(11)
    val emb = base.map(_._1).map { id =>
      val v =
        if (id == 11L || id == 13L) Array.tabulate(16)(d => (d + 1).toFloat)
        else Array.fill(16)(rnd.nextFloat() * 2 - 1)
      (id, v)
    }.toDF("vec_id", "embedding")

    val r = CurationPipeline.curate(
      docs, Some(emb), lshThreshold = 0.8, semanticThreshold = 0.999)
    assert(r.nInput === 44)
    assert(r.nAfterExact === 42) // 100, 101 collapse onto 3 and 7
    assert(r.nAfterNearDup === 40) // 200, 201 collapse onto 5 and 9
    assert(r.nAfterSemantic === 39) // 13 drops (11 is the lower id)
    val kept = r.corpus.select("doc_id").as[Long].collect().toSet
    assert(kept === ((0L until 40L).toSet - 13L))
    assert(r.corpus.columns.toSeq === Seq("doc_id", "text"))

    // Manifest: one row per surviving doc; token accounting exact.
    val m = r.manifest.collect()
    assert(m.length === 39)
    val totalTokens = r.manifest.agg(sum("n_tokens")).head.getLong(0)
    val expectedTokens = r.corpus
      .select(graft.functions.text.tokenCount(col("text")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(totalTokens === expectedTokens)
    // Within a shard, placements are a gapless greedy concatenation:
    // each doc starts where the previous ended.
    val byShard = m.groupBy(_.getAs[Long]("shard"))
    byShard.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var before = 0L
      sorted.foreach { row =>
        assert(row.getAs[Long]("bin_start") === before / 2048)
        assert(row.getAs[Long]("offset_in_bin") === before % 2048)
        before += row.getAs[Long]("n_tokens")
      }
    }
  }
}
