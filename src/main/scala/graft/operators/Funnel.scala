package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over the event stream — the classic
  * product-analytics operator (reference events carry view / click /
  * purchase exactly like its SQLite status rollups aggregate message
  * states, phone_message_producer.py:560-612): for each user, the
  * earliest time each funnel step completed STRICTLY AFTER the
  * previous step, and the deepest stage reached. "view then click
  * then purchase, in that order" — a user whose only click precedes
  * their first view does NOT count as reaching stage 2 (the property
  * a naive per-type min-aggregate gets wrong).
  *
  * Scale shape: one narrow projection of the event table, then per
  * step one equi-join (on the uniformly-distributed user key) of the
  * step's events against the previous stage's |users|-row relation
  * plus a map-side-combinable min — S sequential shuffle waves of
  * O(|events_step|) rows each, no windows, no per-user event-list
  * materialization (the collect_list a sessionization shortcut would
  * pay blows up on hot users; this never holds more than one row per
  * user). Comparisons are unix-millisecond longs on both engines (the
  * q13/q14 convention), so strictness cannot drift on sub-ms ties.
  */
object Funnel {

  /** The gate's funnel, in order. */
  private val Steps = Seq("view", "click", "purchase")

  /** Library entry: ordered-funnel times over any (user_id, event_type,
    * ts) relation. Returns one row per user who completed step 1:
    * (user_id, t1_ms..tn_ms with NULLs past the deepest stage, stage).
    */
  def orderedFunnel(ev: DataFrame, steps: Seq[String] = Steps): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = ev.select(col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("tms"))
    // stage i relation: (user_id, t_i) — users whose step i completed
    // after their step i-1; each is bounded by |users| rows
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val mine = e.filter(col("event_type") === step)
        val eligible = prev match {
          case None => mine
          case Some(p) =>
            mine.join(p.select(col("user_id"), col(s"t$i").as("tprev")), "user_id")
              .filter(col("tms") > col("tprev"))
        }
        Some(eligible.groupBy("user_id").agg(min(col("tms")).as(s"t${i + 1}")))
    }.flatten
    val joined = stages.zipWithIndex.tail.foldLeft(stages.head) {
      case (acc, (st, _)) => acc.join(st, Seq("user_id"), "left")
    }
    val stage = (2 to steps.size).foldLeft(lit(1)) {
      case (acc, i) => acc + when(col(s"t$i").isNotNull, 1).otherwise(0)
    }
    joined.select(
      col("user_id") +:
        steps.indices.map(i => col(s"t${i + 1}").as(s"t${i + 1}_ms")) :+
        stage.cast("long").as("stage"): _*)
  }

  // ---------------------------------------------------------------- x67
  def x67(s: SparkSession, d: String): DataFrame =
    orderedFunnel(Tables.events(s, d))

  val x67Sql: String = {
    val stepCtes = Steps.zipWithIndex.map { case (step, i) =>
      val n = i + 1
      if (i == 0)
        s"""s1 AS (
           |  SELECT user_id, min(tms) AS t1 FROM e
           |  WHERE event_type = '$step' GROUP BY user_id)""".stripMargin
      else
        s"""s$n AS (
           |  SELECT e.user_id, min(e.tms) AS t$n
           |  FROM e JOIN s$i ON s$i.user_id = e.user_id
           |  WHERE e.event_type = '$step' AND e.tms > s$i.t$i
           |  GROUP BY e.user_id)""".stripMargin
    }.mkString(",\n")
    val joins = (2 to Steps.size)
      .map(n => s"LEFT JOIN s$n ON s$n.user_id = s1.user_id").mkString("\n")
    val tCols = (1 to Steps.size).map(n => s"s$n.t$n AS t${n}_ms").mkString(", ")
    val stage = (2 to Steps.size)
      .map(n => s"(CASE WHEN s$n.t$n IS NULL THEN 0 ELSE 1 END)")
      .mkString(" + ")
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
       |$stepCtes
       |SELECT s1.user_id, $tCols,
       |  CAST(1 + $stage AS BIGINT) AS stage
       |FROM s1
       |$joins""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x67_funnel" -> (x67 _))

  val oracleSql: Map[String, String] = Map(
    "x67_funnel" -> x67Sql)
}
