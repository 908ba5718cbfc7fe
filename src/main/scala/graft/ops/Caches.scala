package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Registry of persisted intermediates created inside library operators
  * (LSH band tables, label-propagation rounds). Operators register what
  * they persist; the *consumer* releases after its terminal action —
  * `Verify`/`Bench` release after each query, `SlicerServer` after each
  * request. This is what keeps a long-lived process from accumulating one
  * cached table per call (round-1 finding: persists in
  * `minhashCandidates`/`nearDupClusters` were never freed).
  *
  * The registry is THREAD-SCOPED: operators register on the thread that
  * builds the plan (plan construction is driver-side), and `releaseAll`
  * frees only the calling thread's persists. Two concurrent server
  * requests therefore cannot release each other's in-flight
  * intermediates (round-2 finding: a process-global queue made one
  * request's `releaseAll` unpersist another's LSH band table mid-join,
  * silently forcing full recomputation). A request handled across
  * threads must release on the thread that registered.
  */
object Caches {
  private final class Scope {
    val rdds = scala.collection.mutable.ArrayBuffer.empty[RDD[_]]
    val dfs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  }
  private val scope: ThreadLocal[Scope] = ThreadLocal.withInitial(() => new Scope)

  def registerRdd[T](r: RDD[T]): RDD[T] = { scope.get.rdds += r; r }
  def registerDf(d: DataFrame): DataFrame = { scope.get.dfs += d; d }

  /** Unpersist everything this thread registered since its last release.
    * Safe to call while results are still referenced: lineage is intact
    * everywhere, so a later action recomputes instead of failing. */
  def releaseAll(): Unit = {
    val s = scope.get
    s.rdds.foreach(_.unpersist(blocking = false))
    s.rdds.clear()
    s.dfs.foreach(_.unpersist(blocking = false))
    s.dfs.clear()
  }
}
