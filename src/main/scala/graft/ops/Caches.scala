package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Registry of persisted intermediates created inside library operators
  * (LSH band tables, label-propagation rounds). Operators register what
  * they persist; the *consumer* releases after its terminal action —
  * `Verify`/`Bench` release after each query, `SlicerServer` after each
  * request. This is what keeps a long-lived process from accumulating one
  * cached table per call (round-1 finding: persists in
  * `minhashCandidates`/`nearDupClusters` were never freed).
  */
object Caches {
  private val rdds = new ConcurrentLinkedQueue[RDD[_]]()
  private val dfs = new ConcurrentLinkedQueue[DataFrame]()

  def registerRdd[T](r: RDD[T]): RDD[T] = { rdds.add(r); r }
  def registerDf(d: DataFrame): DataFrame = { dfs.add(d); d }

  /** Unpersist everything registered since the last release. Safe to call
    * while results are still referenced: lineage is intact everywhere, so a
    * later action recomputes instead of failing. */
  def releaseAll(): Unit = {
    var r = rdds.poll()
    while (r != null) { r.unpersist(blocking = false); r = rdds.poll() }
    var d = dfs.poll()
    while (d != null) { d.unpersist(blocking = false); d = dfs.poll() }
  }
}
