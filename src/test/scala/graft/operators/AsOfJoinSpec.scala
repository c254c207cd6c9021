package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Pins the documented [[AsOfJoin]] contract (AsOfJoin.scala:27-31):
  * inclusive backward match, right-before-left at equal timestamps,
  * left-outer NULLs when no right row precedes, and per-key isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val right = Seq(
    (1L, ts("2024-01-01 10:00:00"), "r10"),
    (1L, ts("2024-01-01 12:00:00"), "r12"),
    (2L, ts("2024-01-01 11:00:00"), "r11")
  ).toDF("k", "t", "payload")

  private def run(left: Seq[(Long, Timestamp, String)]) =
    AsOfJoin.backward(left.toDF("k", "t", "name"), right, key = "k", ts = "t")
      .select("k", "name", "prev_payload")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).orNull)).toSeq

  test("backward match picks the greatest right ts <= left ts") {
    assert(run(Seq((1L, ts("2024-01-01 11:30:00"), "l"))) ===
      Seq((1L, "l", "r10")))
    assert(run(Seq((1L, ts("2024-01-01 23:00:00"), "l"))) ===
      Seq((1L, "l", "r12")))
  }

  test("equal timestamps tie: the right row at exactly left.ts matches (inclusive)") {
    assert(run(Seq((1L, ts("2024-01-01 12:00:00"), "l"))) ===
      Seq((1L, "l", "r12")))
  }

  test("no prior right row => left kept with NULL right columns") {
    assert(run(Seq((1L, ts("2024-01-01 09:59:59"), "l"))) ===
      Seq((1L, "l", null)))
  }

  test("keys are isolated: a right row on another key never matches") {
    // key 2 has only an 11:00 row; key 1's 10:00/12:00 must not leak in
    assert(run(Seq((2L, ts("2024-01-01 10:30:00"), "l"))) ===
      Seq((2L, "l", null)))
    assert(run(Seq((2L, ts("2024-01-01 11:00:00"), "l"))) ===
      Seq((2L, "l", "r11")))
  }

  test("unmatched key (no right rows at all) => NULL") {
    assert(run(Seq((9L, ts("2024-01-01 12:00:00"), "l"))) ===
      Seq((9L, "l", null)))
  }

  test("duplicate-right precondition: after dedup to one row per (key, ts) the match is stable") {
    // the documented caller contract — dedupe right to (key, ts); with the
    // dup removed the carried row is deterministic across replays
    val dupRight = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:00:00"), "b")
    ).toDF("k", "t", "payload")
    val deduped = dupRight.orderBy("payload").dropDuplicates("k", "t")
    val out1 = AsOfJoin.backward(
      Seq((1L, ts("2024-01-01 10:30:00"), "l")).toDF("k", "t", "name"),
      deduped, "k", "t").select("prev_payload").collect()
    val out2 = AsOfJoin.backward(
      Seq((1L, ts("2024-01-01 10:30:00"), "l")).toDF("k", "t", "name"),
      deduped, "k", "t").select("prev_payload").collect()
    assert(out1.length === 1 && out1.sameElements(out2))
  }

  test("randomized cross-check against a brute-force reference") {
    // 400 left rows x 300 right rows over 7 keys with deliberate ts
    // collisions; the union+window encoding must agree with the obvious
    // O(L x R) argmax on every row
    val rnd = new scala.util.Random(42)
    val lRows = Seq.tabulate(400)(i =>
      (rnd.nextInt(7).toLong, new Timestamp(rnd.nextInt(2000) * 1000L), s"l$i"))
    val rRows = Seq.tabulate(300)(i =>
        (rnd.nextInt(7).toLong, new Timestamp(rnd.nextInt(2000) * 1000L), s"r$i"))
      .groupBy(t => (t._1, t._2)).values.map(_.maxBy(_._3)).toSeq // dedupe (key, ts)
    val got = AsOfJoin.backward(
        lRows.toDF("k", "t", "name"), rRows.toDF("k", "t", "payload"), "k", "t")
      .select("name", "prev_payload")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val expected = lRows.map { case (k, t, name) =>
      val best = rRows.filter(r => r._1 == k && !r._2.after(t))
        .sortBy(r => (r._2.getTime, r._3)).lastOption
      name -> best.map(_._3)
    }.toMap
    assert(got.size === 400)
    assert(got === expected)
  }

  test("all left columns pass through; right columns emerge as prev_*") {
    val out = AsOfJoin.backward(
      Seq((1L, ts("2024-01-01 11:00:00"), "l")).toDF("k", "t", "name"),
      right, "k", "t")
    assert(out.columns.toSeq === Seq("k", "t", "name",
      "prev_k", "prev_t", "prev_payload"))
  }
}
