package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key ordered sequence assembly — turning an event log into the
  * per-user behavioral sequences a sequence model trains on. The
  * training-pipeline sibling of the reference's record assembly
  * (banking-streamprocessing-demos assembles one record per message
  * lifecycle; this assembles one ordered sequence per user across the
  * whole log).
  */
object Sequences {

  /** x46 — assemble each user's events into one comma-joined,
    * time-ordered event-type sequence. Ordering inside a group is NOT
    * guaranteed by collect_list (partial aggregation buffers arrive in
    * shuffle order), so the sequence is made deterministic by
    * collecting (ts, event_type) structs and sort_array-ing the
    * completed group — struct ordering compares ts first, then
    * event_type as the tie-break for same-instant events, so the
    * output is a pure function of the data on any partitioning.
    *
    * Scale: one hash agg keyed by user; each group materializes that
    * user's own sequence and nothing else — the same per-key working
    * set any sequence assembly needs (x34's shard packing is the same
    * shape). A pathological power-key is capped upstream by filter or
    * by slicing the sorted array to the most recent N, not by giving
    * up ordering. */
  def userSequences(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type"))))
        .as("ordered"))
      .select(col("user_id"),
        size(col("ordered")).cast("long").as("n_events"),
        concat_ws(",", expr("transform(ordered, x -> x.event_type)"))
          .as("seq"))

  def x46(s: SparkSession, d: String): DataFrame =
    userSequences(Tables.events(s, d))

  val x46Sql: String =
    """SELECT user_id, count(*) AS n_events,
      |  string_agg(event_type, ',' ORDER BY ts, event_type) AS seq
      |FROM events GROUP BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x46_user_sequences" -> (x46 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x46_user_sequences" -> x46Sql,
  )
}
