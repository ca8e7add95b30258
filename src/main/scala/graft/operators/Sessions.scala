package graft.operators

import org.apache.spark.sql.SparkSession

/** Cloned-session helper for conf-window operators (q35's bloom pins,
  * q36's AQE skew pins). */
object Sessions {

  /** `s.newSession()` plus the parent's RUNTIME SQLConf deltas.
    *
    * A bare `newSession()` inherits only builder-time (SparkConf)
    * settings; anything set via `s.conf.set(...)` at runtime — a
    * harness-applied shuffle-partition override, a timezone pin — would
    * be silently dropped inside the conf window, unlike the old
    * set/restore formulation which preserved them. Copying the parent's
    * conf map restores that behavior while keeping the window's
    * isolation (pins applied on the clone never leak to the parent).
    *
    * Static SQL confs (warehouse dir, extensions) cannot be set on a
    * live session; they are identical on the clone by construction
    * (same SparkContext), so the copy skips them. */
  private[graft] def cloneWithRuntimeConfs(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    s.conf.getAll.foreach { case (k, v) =>
      if (!ss.conf.getOption(k).contains(v)) {
        // Only a static/non-modifiable conf is skippable (it is already
        // equal on the clone — same SparkContext). Any other failure is
        // a genuinely dropped conf and must propagate.
        try ss.conf.set(k, v)
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "CANNOT_MODIFY_CONFIG" => ()
        }
      }
    }
    ss
  }
}
