package graft

import org.apache.spark.sql.functions._

import graft.plans.DoublePercentileAgg.doublePercentile

/** Native zero-boxing exact percentile over doubles: bit-identical to
  * Spark's built-in `percentile` on adversarial values (sign mix,
  * -0.0/0.0, magnitude extremes, ties, nulls), and P3's imputation
  * produces byte-identical output through it. */
class DoublePercentileSpec extends SparkSpec {
  import spark.implicits._

  private def bits(d: java.lang.Double): Option[Long] =
    Option(d).map(x => java.lang.Double.doubleToRawLongBits(x))

  test("doublePercentile == percentile bit-for-bit on adversarial doubles") {
    // Deliberately NO ±0.0 pair in the pool: Spark's double ordering
    // (nanSafeCompareDoubles) treats -0.0 == 0.0 as EQUAL, so the
    // built-in's relative order of zero-sign ties — and hence the bit
    // pattern of a bracket that straddles them — depends on its hash
    // map's iteration order. Our sortable-bits order is deterministic
    // (-0.0 < 0.0, a refinement within the built-in's own
    // nondeterminism envelope); everywhere the built-in is
    // well-defined the two agree to the bit.
    val rng = new scala.util.Random(11)
    val adversarial = Seq(1e308, -1e308, 1e-300, -1e-300, math.Pi,
      -math.E, 12345.6789, -0.001)
    val rows = (1 to 4000).map { i =>
      val v: java.lang.Double =
        if (i % 37 == 0) null
        else if (i % 11 == 0) adversarial(i % adversarial.size)
        else (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(12) - 6)
      (i % 25, v)
    } :+ ((25, null: java.lang.Double)) // group with a single null
    val df = rows.toDF("k", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val native = df.groupBy($"k").agg(doublePercentile($"v", p).as("m"))
        .collect().map(r => r.getInt(0) ->
          bits(if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      val builtin = df.groupBy($"k")
        .agg(expr(s"percentile(v, $p)").as("m"))
        .collect().map(r => r.getInt(0) ->
          bits(if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(native === builtin, s"p=$p")
    }
  }

  test("±0.0 ties: native result equals the built-in up to zero sign, " +
    "and is partitioning-deterministic to the bit") {
    // The documented envelope, enforced: the built-in treats -0.0 == 0.0
    // as EQUAL with hash-iteration-dependent tie order, so the zero's
    // SIGN bit in its result is outside its own contract; the native
    // sortable-bits order is the deterministic refinement -0.0 < 0.0.
    // Admissible agreement is therefore numeric equality (0.0 == -0.0),
    // plus bit-determinism of the native result across partitionings.
    val vals: Seq[java.lang.Double] =
      Seq(-1.5, -0.0, 0.0, -0.0, 0.0, 0.0, -0.0, 2.5, null)
    val df = vals.map(Tuple1(_)).toDF("v")
    for (p <- Seq(0.0, 0.2, 0.4, 0.5, 0.6, 0.8, 1.0)) {
      val nat = df.agg(doublePercentile($"v", p).as("m")).head.getDouble(0)
      val bi = df.agg(expr(s"percentile(v, $p)").as("m")).head.getDouble(0)
      assert(nat == bi, s"p=$p: native $nat vs builtin $bi")
      val nat7 = df.repartition(7)
        .agg(doublePercentile($"v", p).as("m")).head.getDouble(0)
      assert(bits(nat) === bits(nat7), s"p=$p not partition-deterministic")
    }
  }

  test("sortable-bits encoding is an order-preserving involution") {
    def sortable(d: Double): Long = {
      val b = java.lang.Double.doubleToLongBits(d)
      b ^ ((b >> 63) & Long.MaxValue)
    }
    def unsortable(s: Long): Double =
      java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
    val vals = Seq(Double.NegativeInfinity, -1e308, -1.5, -0.0, 0.0,
      Double.MinPositiveValue, 2.5, 1e308, Double.PositiveInfinity,
      Double.NaN)
    // encoded signed order == java.lang.Double.compare order
    val sorted = vals.sortBy(sortable)
    val expected = vals.sorted(Ordering.fromLessThan[Double](
      (a, b) => java.lang.Double.compare(a, b) < 0))
    assert(sorted.map(java.lang.Double.doubleToLongBits) ===
      expected.map(java.lang.Double.doubleToLongBits))
    vals.filterNot(_.isNaN).foreach(v =>
      assert(java.lang.Double.doubleToRawLongBits(
        unsortable(sortable(v))) ===
        java.lang.Double.doubleToRawLongBits(v)))
    assert(unsortable(sortable(Double.NaN)).isNaN)
  }

  test("imputeBattery exact path through the native percentile is " +
    "byte-identical to the built-in formulation") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 3000).map { i =>
      val battery: java.lang.Double =
        if (rng.nextInt(5) == 0) null else rng.nextDouble() * 100
      (s"s${i % 40}",
        new java.sql.Timestamp(1500000000000L + i * 60000L),
        if (i % 2 == 0) "temperature" else "humidity",
        rng.nextDouble() * 50, battery)
    } ++ (1 to 20).map { i => // sensor with NO non-null battery
      (s"allnull", new java.sql.Timestamp(1500000000000L + i * 60000L),
        "temperature", 1.0, null: java.lang.Double)
    }
    val df = rows.toDF("sensor_id", "timestamp", "reading_type",
      "value", "battery_level")
    val native = graft.transform.Transforms.imputeBattery()(df)
    // The pre-native formulation: built-in exact percentile in both the
    // per-sensor window and the global fallback.
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"sensor_id")
    val globalMed = df.agg(
      expr("percentile(battery_level, 0.5)").cast("double").as("__g"))
    val builtin = df.crossJoin(broadcast(globalMed))
      .withColumn("battery_level",
        coalesce($"battery_level",
          expr("percentile(battery_level, 0.5)").over(w), $"__g"))
      .drop("__g")
    val key = Seq($"sensor_id", $"timestamp", $"reading_type")
    val a = native.sort(key: _*).collect()
    val b = builtin.sort(key: _*).collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }
}
