package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.plans.ExciseSpans

/** Bit-parity of the native ExciseSpans sweep against the composable
  * higher-order form it replaces (the removeDuplicatedSpans reassembly
  * filter), plus the codegen path and adversarial span lists the
  * operator itself never produces (overlap, duplicates, reversed order,
  * out-of-range bounds) — the expression must not DEPEND on
  * duplicatedSpans' disjoint-and-maximal guarantee. */
class ExciseSpansSpec extends SparkSpec {
  import spark.implicits._

  /** The exact composable form used by removeDuplicatedSpans pre-r18. */
  private def hofForm = filter(col("toks"), (_, i) =>
    !exists(col("spans"), s =>
      i.cast(LongType) >= s.getField("start_tok") &&
        i.cast(LongType) <= s.getField("end_tok")))

  private def spanCol = expr(
    "transform(raw, p -> struct(p[0] as start_tok, p[1] as end_tok))")

  test("parity with the HOF filter on adversarial span lists") {
    val docs = Seq(
      // (id, tokens, spans as [start, end] pairs)
      (1L, Seq("a", "b", "c", "d", "e", "f"), Seq(Seq(1L, 2L))),
      (2L, Seq("a", "b", "c", "d", "e", "f"), Seq(Seq(0L, 5L))), // whole doc
      (3L, Seq("a", "b", "c"), Seq.empty[Seq[Long]]),            // no spans
      (4L, Seq("a", "b", "c", "d"), Seq(Seq(2L, 9L))),           // past end
      (5L, Seq("a", "b", "c", "d", "e"),
        Seq(Seq(3L, 4L), Seq(0L, 1L))),                          // unsorted
      (6L, Seq("a", "b", "c", "d", "e", "f", "g"),
        Seq(Seq(1L, 3L), Seq(2L, 4L), Seq(1L, 3L))),             // overlap+dup
      (7L, Seq("a", "b"), Seq(Seq(-3L, 0L))),                    // neg start
      (8L, Seq.empty[String], Seq(Seq(0L, 1L))),                 // empty doc
      (9L, Seq("a", "b", "c"), Seq(Seq(5L, 9L))),                // all past end
      // start >= 2^40: an unclamped (start << 24) pack would wrap to a
      // small key, activate at token 0 and excise the whole doc — the
      // clamp-to-numTokens makes any Long start cover nothing past end
      (10L, Seq("a", "b", "c"), Seq(Seq(1L << 41, Long.MaxValue))),
      (11L, Seq("a", "b", "c"),
        Seq(Seq(Long.MaxValue, Long.MaxValue), Seq(1L, 1L))))
      .toDF("id", "toks", "raw")
      .withColumn("spans", spanCol)
    val both = docs.select($"id",
      ExciseSpans($"toks", $"spans").as("native"),
      hofForm.as("hof"))
      .as[(Long, Seq[String], Seq[String])].collect()
    both.foreach { case (id, n, h) => assert(n === h, s"doc $id") }
    // spot-pin a few absolute results so the parity isn't two copies of
    // the same bug
    val byId = both.map(r => r._1 -> r._2).toMap
    assert(byId(1L) === Seq("a", "d", "e", "f"))
    assert(byId(2L) === Seq.empty)
    assert(byId(3L) === Seq("a", "b", "c"))
    assert(byId(5L) === Seq("c"))
    assert(byId(6L) === Seq("a", "f", "g"))
    assert(byId(7L) === Seq("b"))
    assert(byId(9L) === Seq("a", "b", "c"))
    assert(byId(10L) === Seq("a", "b", "c"))
    assert(byId(11L) === Seq("a", "c"))
  }

  test("parity on randomized docs/spans (deterministic seed)") {
    val rnd = new scala.util.Random(180)
    val rows = (1 to 300).map { id =>
      val m = rnd.nextInt(40) // docs of 0..39 tokens
      val toks = (0 until m).map(i => s"t$i")
      val nSpans = rnd.nextInt(6)
      val spans = (0 until nSpans).map { _ =>
        val a = rnd.nextInt(math.max(1, m + 4)) - 2L
        Seq(a, a + rnd.nextInt(6))
      }
      (id.toLong, toks, spans)
    }
    val df = rows.toDF("id", "toks", "raw").withColumn("spans", spanCol)
    val bad = df.select($"id",
      ExciseSpans($"toks", $"spans").as("native"), hofForm.as("hof"))
      .where(not($"native" <=> $"hof"))
      .count()
    assert(bad === 0L)
  }

  test("whole-stage codegen keeps the expression in-line (no fallback)") {
    // spark.range is a codegen source and its id is non-foldable, so
    // the projection cannot collapse to a LocalTableScan — this
    // actually exercises doGenCode.
    val out = spark.range(3).select(
      $"id",
      ExciseSpans(
        expr("array('a', 'b', 'c')"),
        expr("array(struct(id as start_tok, id as end_tok))")).as("kept"))
    val got = out.as[(Long, Seq[String])].collect().toMap
    assert(got(0L) === Seq("b", "c"))
    assert(got(1L) === Seq("a", "c"))
    assert(got(2L) === Seq("a", "b"))
    // '*(n)' prefixes a physical node INSIDE a WholeStageCodegen stage;
    // a codegen fallback would print a bare 'Project'.
    val plan = out.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).nonEmpty, plan)
  }
}
