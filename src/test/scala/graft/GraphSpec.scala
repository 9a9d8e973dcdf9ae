package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toSeq.toDF("u", "v")

  test("property: triangle profile matches brute force on random graphs") {
    // deterministic pseudo-random graphs (fixed seeds), brute-force
    // reference entirely independent of the operator's orientation trick
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 8 + rnd.nextInt(5)
      val es = (for {
        u <- 0L until n; v <- (u + 1) until n
        if rnd.nextInt(100) < 35
      } yield (u, v)).toSeq
      if (es.nonEmpty) {
        val adj = es.toSet
        def conn(a: Long, b: Long) = adj((a min b, a max b))
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val triBrute = (for {
          i <- nodes; j <- nodes if j > i; k <- nodes if k > j
          if conn(i, j) && conn(j, k) && conn(i, k)
        } yield 1).size.toLong
        val wedgeBrute = nodes.map { x =>
          val d = es.count(e => e._1 == x || e._2 == x).toLong
          d * (d - 1) / 2
        }.sum
        val row = Graph.trianglesProfile(edges(es: _*)).collect().head
        assert(row.getAs[Long]("n_triangles") === triBrute, s"seed=$seed")
        assert(row.getAs[Long]("n_wedges") === wedgeBrute, s"seed=$seed")
        assert(row.getAs[Long]("n_edges") === es.size.toLong, s"seed=$seed")
      }
    }
  }

  test("coOccurrenceEdges: members sharing a group, each pair once") {
    val rel = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 2L), (20L, 3L))
      .toDF("g", "m")
    val out = Graph.coOccurrenceEdges(rel, "g", "m")
      .orderBy("u", "v").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("trianglesProfile: K4 has 4 triangles, 12 wedges, closure 1.0") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val row = Graph.trianglesProfile(k4).collect().head
    assert(row.getAs[Long]("n_nodes") === 4L)
    assert(row.getAs[Long]("n_edges") === 6L)
    assert(row.getAs[Long]("n_wedges") === 12L)
    assert(row.getAs[Long]("n_triangles") === 4L)
    assert(row.getAs[Long]("closed_bp") === 10000L)
  }

  test("trianglesProfile: string-id graph takes the array_intersect fallback") {
    // Same K4 with non-integral node ids: exercises the non-native
    // closure count (SortedLongIntersectCount requires long elements).
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d")).toDF("u", "v")
    val row = Graph.trianglesProfile(k4).collect().head
    assert(row.getAs[Long]("n_triangles") === 4L)
    assert(row.getAs[Long]("n_wedges") === 12L)
  }

  test("trianglesProfile: equi-join fallback (gate=0) matches broadcast path") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
    val bcast = Graph.trianglesProfile(g).collect().head
    val shuffle = Graph.trianglesProfile(g, maxBroadcastEdges = 0L)
      .collect().head
    assert(bcast.toSeq === shuffle.toSeq)
    assert(bcast.getAs[Long]("n_triangles") === 2L)
  }

  test("kcorePeel: pendant drops, triangle core survives") {
    // triangle 1-2-3 plus pendant 4 on node 1
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val row = Graph.kcorePeel(g, k = 2, rounds = 3).collect().head
    assert(row.getAs[Long]("n_edges") === 4L)
    assert(row.getAs[Long]("core_r1") === 3L) // {1,2,3}
    assert(row.getAs[Long]("core_r2") === 3L) // stable
    assert(row.getAs[Long]("core_r3") === 3L)
    assert(row.getAs[Long]("edges_r3") === 3L) // the triangle
  }

  test("edge cases: wedge-free graph, over-aggressive peel, empty seed set") {
    // single edge: no wedges, no triangles — closed_bp is NULL (0/0
    // under non-ANSI integer div), everything else well-defined
    val one = edges((1L, 2L))
    val tp = Graph.trianglesProfile(one).collect().head
    assert(tp.getAs[Long]("n_edges") === 1L)
    assert(tp.getAs[Long]("n_wedges") === 0L)
    assert(tp.getAs[Long]("n_triangles") === 0L)
    assert(tp.isNullAt(tp.fieldIndex("closed_bp")))
    // k above every degree: the whole graph peels away in round 1 and
    // stays empty
    val g = edges((1L, 2L), (2L, 3L))
    val peel = Graph.kcorePeel(g, k = 10, rounds = 3).collect().head
    assert(peel.getAs[Long]("core_r1") === 0L)
    assert(peel.getAs[Long]("core_r3") === 0L)
    assert(peel.getAs[Long]("edges_r3") === 0L)
    // seed predicate matching nothing: all frontiers empty
    val bfs = Graph.bfsReach(g, seedPred = col("sn") === 99L, hops = 2)
      .collect().head
    assert((0 to 2).forall(i => bfs.getAs[Long](s"reach_h$i") === 0L))
  }

  test("operators never unpersist a caller-checkpointed input (ownership)") {
    // A caller may pass an already-localCheckpoint'ed edge list (its
    // lineage is truncated — the cached blocks ARE the data). The
    // iterative operators release their own per-round checkpoints
    // through the RDD handle; that branch must never fire on frames
    // they did not checkpoint themselves.
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.storage.StorageLevel
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).localCheckpoint()
    val rdd = g.queryExecution.analyzed.asInstanceOf[LogicalRDD].rdd
    assert(rdd.getStorageLevel !== StorageLevel.NONE)
    Graph.kcorePeel(g, k = 2, rounds = 2).collect()
    assert(rdd.getStorageLevel !== StorageLevel.NONE,
      "kcorePeel released the caller's checkpoint blocks")
    Graph.bfsReach(g, seedPred = col("sn") === 1L, hops = 2).collect()
    assert(rdd.getStorageLevel !== StorageLevel.NONE,
      "bfsReach released the caller's checkpoint blocks")
    assert(g.count() === 4L) // the caller's frame is still computable
  }

  test("SortedLongIntersectCount rejects non-bigint arrays at analysis") {
    // ArrayData.getLong misreads int-encoded elements; misuse must be
    // an analysis error, not silently-garbage counts.
    val ints = Seq((Array(1, 2, 3), Array(2, 3, 4))).toDF("a", "b")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(
        graft.plans.SortedLongIntersectCount(col("a"), col("b")).as("c"))
        .collect()
    }
    assert(ex.getMessage.contains("array<bigint>"))
    val longs = Seq((Array(1L, 2L, 3L), Array(2L, 3L, 4L))).toDF("a", "b")
    val c = longs.select(
      graft.plans.SortedLongIntersectCount(col("a"), col("b")).as("c"))
      .collect().head.getInt(0)
    assert(c === 2)
  }

  test("SortedLongListAgg == sort_array(collect_list) across partitionings") {
    val rows = (1 to 5000).map(i => ((i % 37).toLong, (i * 2654435761L) % 1000))
    val df = rows.toDF("k", "v")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val native = d.groupBy($"k")
        .agg(graft.plans.SortedLongListAgg.sortedLongList($"v").as("l"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composed = d.groupBy($"k")
        .agg(sort_array(collect_list($"v")).as("l"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native === composed)
    }
    run(df)            // in-memory path
    run(df.repartition(13)) // serialize/merge across partials
    // nulls are skipped, like collect_list
    val withNulls = Seq((1L, java.lang.Long.valueOf(5L)),
      (1L, null.asInstanceOf[java.lang.Long]), (1L, java.lang.Long.valueOf(2L)))
      .toDF("k", "v")
    val got = withNulls.groupBy($"k")
      .agg(graft.plans.SortedLongListAgg.sortedLongList($"v").as("l"))
      .collect().head.getSeq[Long](1)
    assert(got === Seq(2L, 5L))
  }

  test("bfsReach: frontier grows one hop per round on a path graph") {
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val row = Graph.bfsReach(path, seedPred = col("sn") === 1L, hops = 3)
      .collect().head
    assert(row.getAs[Long]("reach_h0") === 1L) // {1}
    assert(row.getAs[Long]("reach_h1") === 2L) // +2
    assert(row.getAs[Long]("reach_h2") === 3L) // +3
    assert(row.getAs[Long]("reach_h3") === 4L) // +4
  }
}
