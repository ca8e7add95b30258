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
    * The salt derives from a hash of the whole big-side row, so the
    * spread needs no row id and stays deterministic. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val b = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(saltBuckets)))
    val s = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
