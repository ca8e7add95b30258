package graft.streaming

import graft.SparkSpec

class HoppingWindowSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000L // 1h in ms

  test("each event lands in exactly duration/slide = 2 windows") {
    // 10:05 and 10:40: the first belongs to [9:30,10:30) and [10:00,11:00),
    // the second to [10:00,11:00) and [10:30,11:30)
    val t0 = 1700000000000L - (1700000000000L % H) // aligned hour
    val ds = Seq(
      MessageStatus("a", "sent", 1L, "verizon", t0 + 5 * 60000),
      MessageStatus("b", "sent", 2L, "verizon", t0 + 40 * 60000)
    ).toDS()
    val out = WindowedCounts.byCarrierHopping(ds, "1 hour", "30 minutes")
      .select($"win_start".cast("long"), $"cnt").as[(Long, Long)]
      .collect().toMap
    assert(out == Map(
      (t0 - 30 * 60000) / 1000 -> 1L,  // [9:30,10:30): only 10:05
      t0 / 1000 -> 2L,                 // [10:00,11:00): both
      (t0 + 30 * 60000) / 1000 -> 1L)) // [10:30,11:30): only 10:40
  }

  test("tumbling is the degenerate hop (slide == duration)") {
    val t0 = 1700000000000L - (1700000000000L % H)
    val ds = Seq(
      MessageStatus("a", "sent", 1L, "att", t0 + 1000),
      MessageStatus("b", "delivered", 1L, "att", t0 + 2000)
    ).toDS()
    val hop = WindowedCounts.byCarrierHopping(ds, "1 hour", "1 hour")
      .collect().map(_.toSeq).sortBy(_.toString)
    val tum = WindowedCounts.byCarrier(ds, "1 hour")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(hop.toSeq == tum.toSeq)
  }
}
