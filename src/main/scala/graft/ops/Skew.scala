package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join rewrites for 100 TB-shaped data.
  *
  * A hash-partitioned equi-join melts when one key holds a large share of
  * the rows: that key's partition becomes a straggler (or OOM). AQE's
  * skew-join split handles the sort-merge case at runtime; `saltedJoin` is
  * the explicit, planner-independent form — it spreads each hot key over
  * `nSalt` subkeys by salting the large side randomly-but-uniformly (hash
  * of a stable row id) and replicating the small-but-too-big-to-broadcast
  * side once per salt. Result set is identical to the plain join (verified
  * by the j7 oracle); only the partitioning changes: max partition load
  * drops by ~nSalt at the cost of replicating the right side nSalt times.
  *
  * Use when: both sides too big to broadcast AND key histogram is heavy at
  * the top. Prefer broadcast for small dims (J3) and plain shuffle joins
  * for uniform keys — salting uniform keys just multiplies the right side
  * for nothing.
  */
object Skew {

  /** Inner equi-join `left ⋈ right ON key`, with `left`'s rows spread over
    * `nSalt` salted subkeys and `right` replicated once per salt value.
    * `saltSource` must be a deterministic per-row column (an id, not
    * rand()) so retried tasks salt identically — nondeterministic salts
    * break exactly-once under speculative execution. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: String, nSalt: Int = 8): DataFrame = {
    require(nSalt >= 1, "nSalt must be positive")
    // pick a salt column name that collides with neither input, so a
    // pre-existing __salt (e.g. a nested saltedJoin) is never overwritten
    val taken = (left.columns ++ right.columns).toSet
    val saltCol = Iterator.from(0)
      .map(i => if (i == 0) "__salt" else s"__salt_$i")
      .find(!taken.contains(_)).get
    val salted = left.withColumn(saltCol, pmod(xxhash64(col(saltSource)), lit(nSalt)))
    val replicated = right.withColumn(saltCol,
      explode(array((0 until nSalt).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
