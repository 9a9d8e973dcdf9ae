package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed storage: the co-located fact-to-fact join strategy.
  *
  * Broadcast covers small dimension tables; bucketing covers the joins
  * where BOTH sides are big. Writing a table once with
  * `bucketBy(n, key).sortBy(key)` pre-pays the shuffle: every later
  * equi-join or aggregation keyed on the bucket columns reads matching
  * buckets directly — zero exchange on either side, and zero sort when
  * each bucket is a single file (Spark's v1 bucketed scan only trusts
  * the written sort order in that case, so [[ensure]] repartitions by
  * the bucket expression before writing: `repartition(n, cols)` and the
  * bucket-id assignment use the same `Pmod(Murmur3Hash(cols), n)`
  * routing, so every write task holds exactly one bucket and emits
  * exactly one file).
  *
  * At 100 TB this turns the nightly "join the 40 TB fact against the
  * 20 TB fact" from two full shuffles PER QUERY into one shuffle PER
  * LOAD, amortized across every downstream join, aggregation, and
  * incremental merge keyed on the same columns.
  */
object Bucketed {

  /** Deterministic catalog name for the bucketed copy of `table` keyed
    * by source dir + bucket spec, so distinct SF dirs (or bucket
    * layouts) in one session never collide. */
  def tableName(dir: String, table: String, bucketCols: Seq[String],
      nBuckets: Int): String = {
    val h = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        s"$dir|${bucketCols.mkString(",")}|$nBuckets") & 0x7fffffff)
    s"graft_bkt_${table}_${nBuckets}b_$h"
  }

  /** Materialize (once per session) a bucketed, per-bucket-sorted copy
    * of `src` and return it as a catalog-backed DataFrame. Memoized via
    * the session catalog, so the pre-paid shuffle+write happens on the
    * first call only; every later call is a metadata lookup. The files
    * land under the JVM temp dir (external table), not the warehouse,
    * and `overwrite` makes crashed leftovers harmless. Single-writer
    * assumption: the fixed path lets successive engine JVMs reuse the
    * same disk footprint (each rewrites on first use — a fresh catalog
    * cannot prove the files' provenance), so two CONCURRENT JVMs
    * pointed at the same source dir would race the write; run one
    * engine process at a time, as the bench/verify harnesses do.
    */
  def ensure(s: SparkSession, dir: String, table: String,
      bucketCols: Seq[String], nBuckets: Int)(src: => DataFrame): DataFrame =
    synchronized {
      require(bucketCols.nonEmpty, "bucketCols must be non-empty")
      // SPARK-28595 gated the bucketed scan's sort-order reporting
      // behind this conf (a multi-file bucket cannot guarantee global
      // order without a merge, and Spark stopped promising it by
      // default). The tables written here are exactly one sorted file
      // per bucket — the case the reporting is both correct and free
      // for, and the only case Spark reports ordering for even with
      // the conf on — so enable it for the session: downstream SMJs
      // on these tables then skip the redundant per-bucket sort.
      s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // Companion session policy (SPARK-31350, off by default): when
      // two tables bucket the same key at DIFFERENT counts — a table
      // re-bucketed wider as it grew, joined against an older layout —
      // read k adjacent buckets of the wider side per task instead of
      // shuffling both sides (ratio-capped by
      // coalesceBucketsInJoin.maxBucketRatio, default 4; a coalesced
      // side has >1 file per read-bucket, so it re-sorts — exchange
      // elimination is the win that matters). Both policies live HERE,
      // set once and idempotently when a bucketed layout enters the
      // session, so join helpers stay side-effect-free and the only
      // affected plans are joins of tables this operator wrote.
      s.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      val name = tableName(dir, table, bucketCols, nBuckets)
      if (!s.catalog.tableExists(name)) {
        src.repartition(nBuckets, bucketCols.map(col): _*)
          .write.format("parquet")
          .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
          .sortBy(bucketCols.head, bucketCols.tail: _*)
          .option("path",
            s"${System.getProperty("java.io.tmpdir")}/graft-bucketed/$name")
          .mode("overwrite")
          .saveAsTable(name)
      }
      s.table(name)
    }

  /** Incremental load into an [[ensure]]d bucketed table: append a
    * batch under the SAME bucket spec, so co-location survives daily
    * loads — every bucket gains one file per appended batch, and
    * key-aligned joins stay exchange-free (the SMJ re-sorts each
    * multi-file bucket locally; that re-sort is linear per-task work,
    * the exchange it replaces is the cluster-wide cost). Callers who
    * accumulate many small batches compact by re-running [[ensure]]
    * over the unioned source into a fresh layout.
    *
    * SESSION-SCOPED CACHE semantics, like everything this object
    * writes: the table is a derived layout over the immutable source
    * parquet under `dir`, not primary storage. A NEW session's first
    * ensure() rebuilds the layout from source (a fresh catalog cannot
    * prove the on-disk files' provenance), which discards any batches
    * a previous session appended — so appended data must always remain
    * re-derivable from the source dir, and a caller appending anything
    * else is using the wrong tool (that is primary storage, Loader's
    * job). */
  def append(s: SparkSession, dir: String, table: String,
      bucketCols: Seq[String], nBuckets: Int)(batch: DataFrame): DataFrame =
    synchronized {
      val name = tableName(dir, table, bucketCols, nBuckets)
      require(s.catalog.tableExists(name),
        s"append target $name not in this session's catalog — call " +
          "ensure() first (NOTE: ensure rebuilds the layout from the " +
          "source dir; batches appended by a PREVIOUS session are " +
          "discarded — this table is a session-scoped derived cache, " +
          "not primary storage)")
      batch.repartition(nBuckets, bucketCols.map(col): _*)
        .write.format("parquet")
        .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(bucketCols.head, bucketCols.tail: _*)
        .mode("append")
        .saveAsTable(name)
      s.table(name)
    }

  /** Equi-join two bucketed tables on their bucket key with the plan
    * pinned to sort-merge (`hint("merge")`): size-based planning would
    * broadcast a small side and bypass the bucket layout, which is the
    * wrong template for the big-big case this operator exists for. On
    * co-bucketed inputs the resulting SMJ has no exchange and no sort —
    * callers can assert that via the executed plan.
    */
  def colocatedJoin(left: DataFrame, right: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    left.hint("merge").join(right, cond, joinType)
}
