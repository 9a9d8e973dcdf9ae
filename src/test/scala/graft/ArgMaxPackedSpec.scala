package graft

import org.apache.spark.sql.functions._

import graft.plans.ArgMaxPackedAgg.argMaxPacked

/** Native packed argmax (the CDC latest-wins winner picker): semantics
  * pinned against Spark's own max_by(struct, struct) on randomized
  * data, null-ordering rules, and the plan shape that motivates it
  * (codegen'd HashAggregate — not ObjectHashAggregate, whose
  * sort-based fallback resurrects the map-side sort at high key
  * cardinality, and not SortAggregate). */
class ArgMaxPackedSpec extends SparkSpec {
  import spark.implicits._

  test("argMaxPacked == max_by(struct, struct) on randomized changelog") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      (rng.nextInt(40).toLong, // key
        rng.nextInt(1000).toLong, // ord1 (many ties)
        i.toLong, // ord2 unique
        rng.nextDouble() * 100,
        rng.nextInt(10) == 0)
    }
    val df = rows.toDF("k", "o1", "o2", "v", "del")
    val native = df.groupBy($"k")
      .agg(argMaxPacked($"v", $"del", $"o1", $"o2").as("last"))
      .select($"k", $"last.value", $"last.flag")
      .as[(Long, Double, Boolean)].collect().toSet
    val reference = df.groupBy($"k")
      .agg(max_by(struct($"v", $"del"), struct($"o1", $"o2")).as("last"))
      .select($"k", $"last.v", $"last.del")
      .as[(Long, Double, Boolean)].collect().toSet
    assert(native === reference)
  }

  test("argMaxPacked computed children agree with pre-projected columns") {
    // The declarative update/merge expressions embed the child
    // expressions directly, so computed children (anything the
    // optimizer can't collapse to a column) must produce exactly what
    // the pre-projected column form produces.
    val rng = new scala.util.Random(7)
    val rows = (1 to 3000).map { i =>
      (rng.nextInt(30).toLong, rng.nextInt(500).toLong, i.toLong,
        rng.nextDouble() * 10, rng.nextInt(7) == 0)
    }
    val df = rows.toDF("k", "o1", "o2", "v", "del")
    // computed forms: * 2 preserves order; negation/arith on value+flag
    val viaEval = df.groupBy($"k")
      .agg(argMaxPacked($"v" + lit(1.0), !$"del", $"o1" * 2, $"o2" * 2)
        .as("last"))
      .select($"k", $"last.value", $"last.flag")
      .as[(Long, Double, Boolean)].collect().toSet
    val viaFast = df
      .select($"k", ($"v" + lit(1.0)).as("v2"), (!$"del").as("nd"),
        ($"o1" * 2).as("o1x"), ($"o2" * 2).as("o2x"))
      .groupBy($"k")
      .agg(argMaxPacked($"v2", $"nd", $"o1x", $"o2x").as("last"))
      .select($"k", $"last.value", $"last.flag")
      .as[(Long, Double, Boolean)].collect().toSet
    assert(viaEval === viaFast)
  }

  test("argMaxPacked ignores null-ordered rows; empty group yields null") {
    val df = Seq(
      (1L, Some(5L), Some(1L), 10.0, false),
      (1L, None, Some(9L), 99.0, true), // null ord1: never wins
      (1L, Some(9L), None, 98.0, true), // null ord2: never wins
      (2L, None, None, 1.0, false) // all null-ordered: group -> null
    ).toDF("k", "o1", "o2", "v", "del")
    val out = df.groupBy($"k")
      .agg(argMaxPacked($"v", $"del", $"o1", $"o2").as("last"))
      .select($"k", $"last.value")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(10.0))
    assert(out(2L) === None)
  }

  test("argMaxPacked plans as codegen'd HashAggregate (the point of " +
    "the primitive buffer)") {
    val df = spark.range(1000L).select(
      (col("id") % 10).as("k"), col("id").as("o2"),
      (col("id") % 7).as("o1"), col("id").cast("double").as("v"),
      (col("id") % 3 === 0).as("del"))
    val agg = df.groupBy($"k")
      .agg(argMaxPacked($"v", $"del", $"o1", $"o2").as("last"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    // Plain HashAggregate: Tungsten map, no ObjectHashAggregate
    // group-count fallback cliff, no SortAggregate demotion.
    assert(plan.contains("HashAggregate"),
      s"expected HashAggregate, got:\n$plan")
    assert(!plan.contains("ObjectHashAggregate"),
      s"expected plain HashAggregate (not ObjectHashAggregate):\n$plan")
    assert(!plan.contains("SortAggregate"))
  }

  test("argMaxPacked type-checks its inputs at analysis") {
    val df = Seq((1L, 1, 2L, 1.0, false)).toDF("k", "o1", "o2", "v", "del")
    val e = intercept[Exception] {
      df.groupBy($"k")
        .agg(argMaxPacked($"v", $"del", $"o1", $"o2")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("arg_max_packed") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
