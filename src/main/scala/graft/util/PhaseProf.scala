package graft.util

import java.util.concurrent.ConcurrentLinkedQueue

/** Per-operator phase timings for the bench artifact.
  *
  * Iterative operators (k-core peel, PageRank, triangle closure) spend
  * their wall time across internally-forced rounds the harness cannot
  * see from outside: a slow sample shows up as one opaque number and
  * the round's adjudication degenerates to guessing (r10: q171 flagged
  * weak because 3.5 s of wall could not be split into its three peel
  * rounds + edge build). Operators wrap each internal stage in
  * [[timed]]; the bench drains the accumulated (label, ms) pairs per
  * run and commits them in the details JSON, so a regression arrives
  * already attributed to the round that moved.
  *
  * Collection is process-wide and append-only between drains — the
  * bench runs queries strictly one at a time, so everything drained
  * after a run belongs to that run (same contract as the bench's
  * MetricsListener). Labels repeat across runs; the drain clears.
  *
  * Recording is OFF unless a harness opts in via [[enable]] (the
  * benches do, right after session setup): in a long-lived JVM that
  * never drains — Verify, or any production use of the instrumented
  * operators — an always-on queue would grow one entry per phase per
  * invocation, forever. Disabled, timed() is a pass-through and the
  * queue stays empty.
  */
object PhaseProf {
  private val q = new ConcurrentLinkedQueue[(String, Double)]()
  @volatile private var on = false

  /** Opt in to phase recording (bench harnesses only — anything that
    * enables this must also drain via [[drainJson]] per query). */
  def enable(): Unit = on = true

  /** Run `f`, recording its wall-time under `label` (ms, 1 decimal). */
  def timed[T](label: String)(f: => T): T =
    if (!on) f
    else {
      val t0 = System.nanoTime()
      try f
      finally q.add(label -> (math.rint((System.nanoTime() - t0) / 1e5) / 10))
    }

  /** Record an externally-measured duration. */
  def add(label: String, ms: Double): Unit =
    if (on) q.add(label -> (math.rint(ms * 10) / 10))

  /** All phases recorded since the last drain, in record order;
    * clears. Returns a JSON object fragment (`"phases":{...}`) or ""
    * when nothing was recorded, so the bench can splice it verbatim.
    * Duplicate labels get a numeric suffix (second `round` becomes
    * `round#2`) — JSON objects cannot carry repeated keys. */
  def drainJson(): String = {
    val buf = Vector.newBuilder[(String, Double)]
    var e = q.poll()
    while (e != null) { buf += e; e = q.poll() }
    val all = buf.result()
    if (all.isEmpty) ""
    else {
      val seen = scala.collection.mutable.Map.empty[String, Int]
      val items = all.map { case (l, ms) =>
        val n = seen.updateWith(l)(c => Some(c.getOrElse(0) + 1)).get
        val key = if (n == 1) l else s"$l#$n"
        "\"" + key + "\":" + ms
      }
      items.mkString("\"phases\":{", ",", "}")
    }
  }
}
