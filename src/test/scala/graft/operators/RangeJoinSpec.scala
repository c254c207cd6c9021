package graft.operators

import graft.SparkSpec

/** Pins the [[RangeJoin]] contract: half-open `[start, end)` containment,
  * bucket-edge correctness (a pair must meet in exactly one bucket — the
  * point's — so no dedup is needed), and intervals narrower/wider than the
  * bucket width. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L // bucket width under test

  private def run(points: Seq[(Long, Long)], intervals: Seq[(Long, Long, Long)],
      width: Long = W) =
    RangeJoin.pointInInterval(
      points.toDF("pid", "p"),
      intervals.toDF("iid", "s", "e"),
      ptCol = "p", startCol = "s", endCol = "e", bucketWidth = width)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("half-open boundaries: start is inclusive, end is exclusive") {
    val iv = Seq((1L, 100L, 200L))
    assert(run(Seq((1L, 100L)), iv) === Seq((1L, 1L))) // p == start: in
    assert(run(Seq((2L, 199L)), iv) === Seq((2L, 1L))) // last inside point
    assert(run(Seq((3L, 200L)), iv) === Seq.empty)     // p == end: out
    assert(run(Seq((4L, 99L)), iv) === Seq.empty)      // just before start
  }

  test("interval crossing a bucket edge matches points in both buckets, once each") {
    // [150, 250) overlaps buckets 1 and 2
    val iv = Seq((1L, 150L, 250L))
    assert(run(Seq((1L, 160L), (2L, 240L), (3L, 140L), (4L, 250L)), iv) ===
      Seq((1L, 1L), (2L, 1L)))
  }

  test("interval narrower than the bucket (and strictly inside it)") {
    val iv = Seq((1L, 120L, 130L))
    assert(run(Seq((1L, 120L), (2L, 129L), (3L, 130L), (4L, 119L)), iv) ===
      Seq((1L, 1L), (2L, 1L)))
  }

  test("interval exactly at bucket boundaries [100, 300) does not bleed into bucket 3") {
    val iv = Seq((1L, 100L, 300L))
    assert(run(Seq((1L, 100L), (2L, 299L), (3L, 300L)), iv) ===
      Seq((1L, 1L), (2L, 1L)))
  }

  test("a pair meets exactly once even when the interval spans many buckets (no dup rows)") {
    val iv = Seq((1L, 0L, 1000L)) // 10 buckets
    val out = run(Seq((1L, 555L)), iv)
    assert(out === Seq((1L, 1L))) // exactly one output row
  }

  test("multiple intervals containing one point all match") {
    val iv = Seq((1L, 0L, 1000L), (2L, 500L, 600L), (3L, 556L, 600L))
    assert(run(Seq((1L, 555L)), iv) === Seq((1L, 1L), (1L, 2L)))
  }

  test("empty-ish interval (end == start + 1) contains only its start point") {
    val iv = Seq((1L, 100L, 101L))
    assert(run(Seq((1L, 100L), (2L, 101L)), iv) === Seq((1L, 1L)))
  }

  test("negative coordinates: floor (not truncate-toward-zero) bucketing") {
    // [-150, 50) spans buckets -2, -1, 0; truncation would compute bucket
    // -1 for point -150 and miss the -2 bucket entirely
    val iv = Seq((1L, -150L, 50L))
    assert(run(Seq((1L, -150L), (2L, -1L), (3L, 0L), (4L, 49L), (5L, 50L),
      (6L, -151L)), iv) ===
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("epoch-micros magnitudes: boundary points bucket exactly") {
    // worst case for double-division rounding: a point one unit below a
    // bucket-width multiple, at the ~1.7e15 magnitude the entries use
    val day = 86400L * 1000000L
    val k = 1700000000000000L / day
    val edge = (k + 1) * day
    val iv = Seq((1L, edge - day, edge)) // exactly one bucket wide
    assert(run(Seq((1L, edge - 1), (2L, edge), (3L, edge - day)), iv, width = day) ===
      Seq((1L, 1L), (3L, 1L)))
  }
}
