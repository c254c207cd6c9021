package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Pins the streamed funnel ([[FunnelStream]], r13): stage transitions
  * SURVIVE micro-batch boundaries (a view in batch 1 qualifies a click in
  * batch 2), strictness carries over (a batch-2 purchase before the
  * qualifying click does not convert), and the drained latest-per-user
  * relation equals the batch [[Events.funnelOf]] over the union — the
  * stream-batch equivalence the shared oracle certifies at the graded
  * scales. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private val b1: Seq[(Long, String, Timestamp)] = Seq(
    (1L, "view", ts(1)),               // opens in batch 1
    (2L, "view", ts(1)), (2L, "purchase", ts(2)), // purchase pre-click
    (3L, "click", ts(1)))              // click before any view
  private val b2: Seq[(Long, String, Timestamp)] = Seq(
    (1L, "click", ts(5)), (1L, "purchase", ts(6)), // completes cross-batch
    (2L, "click", ts(5)),              // the earlier purchase must NOT count
    (3L, "view", ts(6)))               // view arrives; old click stays spent

  test("cross-batch transitions match the batch funnel over the union") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val evts = mem.toDF().toDF("user_id", "event_type", "ts")
      .as[FunnelStream.FEvt]
    val q = FunnelStream.funnelStream(evts).toDF().writeStream
      .format("memory").queryName("fst")
      .outputMode(OutputMode.Update())
      .start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    val afterB1 = spark.table("fst").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    mem.addData(b2: _*)
    q.processAllAvailable()
    // memory sink in update mode appends; latest row per user = final
    val streamed = spark.table("fst")
      .withColumn("seq", monotonically_increasing_id())
      .orderBy(col("seq").desc)
      .dropDuplicates("user_id")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"), col("stage"))
      .collect().map(_.toSeq).toSet
    q.stop()

    assert(afterB1 == Map(1L -> 1L, 2L -> 1L, 3L -> 0L))

    val batch = Events.funnelOf((b1 ++ b2).toDF("user_id", "event_type", "ts"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)

    // the distinguishing verdicts, spelled out
    val byUser = streamed.map(r => r.head -> r.last).toMap
    assert(byUser(1L) == 3L, "view(b1) → click+purchase(b2) completes")
    assert(byUser(2L) == 2L, "the pre-click purchase never converts")
    assert(byUser(3L) == 1L, "the pre-view click stays spent")
  }
}
