package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers sort-merge
  * joins it can observe at runtime; explicit salting remains the tool
  * when a known-hot key must never land on one reducer (or when the
  * skewed side feeds a non-SMJ plan). The salted AGGREGATION twin of
  * this technique is oracle-checked as q21.
  */
object Skew {

  /** Inner equi-join with the big side's rows scattered across
    * `saltBuckets` sub-partitions per key and the small side replicated
    * once per bucket: the hot key's probe rows spread over saltBuckets
    * reducers instead of one. Result is exactly `big.join(small, key)`.
    *
    * The salt mixes a whole-row hash with a partition-local row index
    * (`monotonically_increasing_id` = partitionId << 33 | row counter):
    * the index term guarantees spread even when a hot key's rows are
    * byte-identical duplicates (all hashing to one bucket otherwise —
    * the exact pathology salting exists to fix). Salt values can differ
    * across task retries, but the salt never reaches the output and any
    * bucket assignment yields the same join result. Inputs must not
    * already carry a `__salt` column. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin: inputs must not already have a __salt column")
    val b = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*) + monotonically_increasing_id(),
        lit(saltBuckets)))
    val s = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
