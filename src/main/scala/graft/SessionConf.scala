package graft

import org.apache.spark.sql.SparkSession

/** Guarded session-config mutation. Spark session conf is global mutable
  * state; an unsynchronized save/set/restore around a query races under
  * concurrent submission (two callers interleave and one "restores" the
  * other's temporary value). All operator-level conf changes in this
  * engine go through here so the mutation window is serialized.
  */
object SessionConf {
  private val lock = new Object

  /** Run `body` with `spark.sql.shuffle.partitions` set to `n`, restoring
    * the previous value afterwards. The body must TRIGGER the work it
    * wants sized (start the streaming query, run the actions of an
    * iterative loop, call `.fit`): shuffle-partition count is read at
    * query execution, so a lazily-built frame executed outside the block
    * does not see `n`. NOTE the guarantee is only that SessionConf
    * callers are serialized against each other — the conf value itself is
    * session-global, so an unrelated query planned on another thread
    * DURING the block observes the temporary `n`. Fine in this harness
    * (Verify/Bench/specs submit queries one at a time); a multi-tenant
    * deployment would give each workload its own SparkSession instead. */
  def withShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A =
    lock.synchronized {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try body
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

  /** Run `body` with runtime bloom-filter injection enabled and sized
    * for fixture scale, restoring previous values afterwards. Production
    * defaults gate the rewrite on a ≥10 GB application-side scan — right
    * for a cluster, never reachable in a test fixture — so the threshold
    * drops to 0 inside the block. Broadcast joins are disabled within
    * the block: the bloom rewrite targets the shuffle-join regime (a
    * broadcast join already prunes at the probe side). Like
    * [[withShufflePartitions]], the body must EXECUTE the plan it wants
    * filtered (the optimizer injects the filter at planning time). */
  def withRuntimeBloomFilter[A](spark: SparkSession)(body: => A): A =
    withConfs(spark,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")(body)

  /** Generic guarded save/set/restore for a set of session confs. Same
    * serialization guarantee (and the same caveat) as
    * [[withShufflePartitions]]: the body must execute the work it wants
    * to see the confs. */
  def withConfs[A](spark: SparkSession, confs: (String, String)*)(body: => A): A =
    lock.synchronized {
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; reading it as a raw long requires
    * `spark.sql.legacy.parquet.nanosAsLong`. The flag is re-checked at
    * SCAN EXECUTION, not plan time, so it must stay set for the lifetime
    * of every frame derived from the table — deliberately set-once and
    * never restored (restoring would break any lazily-executed frame
    * still holding the scan). Idempotent. */
  def ensureNanosAsLong(spark: SparkSession): Unit =
    lock.synchronized {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
}
