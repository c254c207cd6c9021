package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

/** Pins the strict ordered funnel ([[Events.funnelOf]], r13): stage
  * timestamps must be at-or-after the previous stage's (a purchase
  * BEFORE the qualifying click does not convert), early out-of-order
  * clicks are skipped in favor of the first post-view click, the `>=`
  * boundary admits same-instant steps, and users missing the first step
  * are stage 0 regardless of later-step events. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private val events: Seq[(Long, String, Timestamp)] = Seq(
    // user 1: clean full funnel
    (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
    // user 2: purchase BEFORE the qualifying click → stage 2
    (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
    // user 3: early click before the view is skipped; the post-view click
    // (ts 4) qualifies and the purchase after it converts
    (3L, "click", ts(1)), (3L, "view", ts(2)), (3L, "click", ts(4)),
    (3L, "purchase", ts(5)),
    // user 4: click and purchase but never a view → stage 0
    (4L, "click", ts(1)), (4L, "purchase", ts(2)),
    // user 5: same-instant view/click/purchase — `>=` admits all three
    (5L, "view", ts(7)), (5L, "click", ts(7)), (5L, "purchase", ts(7)),
    // user 6: view only
    (6L, "view", ts(1)))

  test("funnel stages and first-touch timestamps match the contract") {
    val got = Events.funnelOf(events.toDF("user_id", "event_type", "ts"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)), r.getLong(4)))
      .toMap
    assert(got(1L) == ((Some(ts(1)), Some(ts(2)), Some(ts(3)), 3L)))
    assert(got(2L) == ((Some(ts(1)), Some(ts(3)), None, 2L)),
      "purchase before the qualifying click must not convert")
    assert(got(3L) == ((Some(ts(2)), Some(ts(4)), Some(ts(5)), 3L)),
      "the pre-view click is skipped, the post-view click qualifies")
    assert(got(4L) == ((None, None, None, 0L)))
    assert(got(5L) == ((Some(ts(7)), Some(ts(7)), Some(ts(7)), 3L)))
    assert(got(6L) == ((Some(ts(1)), None, None, 1L)))
  }

  test("N-stage generalization: a 4-stage funnel keeps strict ordering") {
    // view → click → add_to_cart → purchase (r13 VERDICT #7)
    val ev4: Seq[(Long, String, Timestamp)] = Seq(
      // user 1: clean 4-stage conversion
      (1L, "view", ts(1)), (1L, "click", ts(2)),
      (1L, "add_to_cart", ts(3)), (1L, "purchase", ts(4)),
      // user 2: cart BEFORE the qualifying click → stops at stage 2,
      // so the later purchase cannot convert either
      (2L, "view", ts(1)), (2L, "add_to_cart", ts(2)),
      (2L, "click", ts(3)), (2L, "purchase", ts(4)),
      // user 3: skips the cart entirely → stage 2 despite a purchase
      (3L, "view", ts(1)), (3L, "click", ts(2)), (3L, "purchase", ts(3)))
    val got = Events.funnelStagesOf(
        ev4.toDF("user_id", "event_type", "ts"),
        Seq("view", "click", "add_to_cart", "purchase"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(3)),
        Option(r.getTimestamp(4)), r.getLong(5)))
      .toMap
    assert(got(1L) == ((Some(ts(3)), Some(ts(4)), 4L)))
    assert(got(2L) == ((None, None, 2L)),
      "a cart before the qualifying click must not count, nor may the " +
        "purchase that depends on it")
    assert(got(3L) == ((None, None, 2L)))
  }

  test("3-stage funnelOf is exactly the generalized chain") {
    val e = events.toDF("user_id", "event_type", "ts")
    val a = Events.funnelOf(e).collect().toSeq
    val b = Events.funnelStagesOf(e, Seq("view", "click", "purchase"))
      .collect().toSeq
    assert(a == b)
  }
}
