package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators. Spark's AQE rewrites skewed
  * SHUFFLE joins at runtime, but it cannot reach every shape: streaming
  * micro-batch joins, bucketed one-shuffle layouts (AQE skew handling is
  * disabled when it would break a required distribution), or any plan
  * pinned by a required partitioning. Salting is the classic manual
  * rewrite for those paths — spread one hot key across `n` sub-keys and
  * pay `n`× replication of the OTHER side for it.
  */
object Skew {

  /** Salted inner equi-join: the probe (large, skewed) side gets a salt
    * `xxhash64(saltFrom) mod n`, the build side is replicated once per
    * salt value, and the join runs on `(keys..., salt)` — a key holding
    * half the probe rows lands in `n` tasks instead of one. The salt is
    * derived, not random: re-runs and retried tasks salt identically, so
    * the operator stays deterministic (a `rand()` salt breaks task-retry
    * idempotence, the classic silent-corruption bug in hand-salted
    * joins). Join OUTPUT is provably salt-independent — every probe row
    * still meets exactly the build rows of its key — which is what the
    * q112 oracle checks against the plain join.
    *
    * Cost model: build-side shuffle volume × n, probe untouched. Use
    * when the probe's hot keys dominate a task (sort/spill) and the
    * build side is small enough that n× replication is cheaper than the
    * straggler — exactly the trade AQE's skew-join makes with runtime
    * stats, applied statically where AQE cannot. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltFrom: String, n: Int): DataFrame = {
    require(n >= 1, s"salt fan-out must be >= 1, got $n")
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    val salted = probe.withColumn("__salt__",
      pmod(xxhash64(col(saltFrom)), lit(n.toLong)))
    val replicated = build.withColumn("__salt__",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(replicated, keys :+ "__salt__").drop("__salt__")
  }
}
