package graft.etl

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.star.Star

/** Unit tests for the P-transforms (SURVEY §5.1). */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("P3: age bracket lower bound for every reference bracket value") {
    val brackets = Seq(
      "0-17" -> 0, "18-25" -> 18, "26-35" -> 26, "36-45" -> 36,
      "46-50" -> 46, "51-55" -> 51, "55+" -> 55)
    val got = brackets.map(_._1).toDF("Age")
      .select(col("Age"), Transforms.ageLowerBound(col("Age")).as("lo"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    brackets.foreach { case (br, lo) => assert(got(br) == lo, s"bracket $br") }
  }

  test("P4: M/d/yyyy parse handles 1- and 2-digit fields") {
    val got = Seq("1/5/1996", "12/31/2020", "2/29/2000").toDF("d")
      .select(Transforms.parseDate(col("d")).as("p"))
      .collect().map(_.getDate(0).toString)
    assert(got.sameElements(Array("1996-01-05", "2020-12-31", "2000-02-29")))
  }

  test("P4 + fixture encoding round-trips every date") {
    val n = Seq.tabulate(366)(i => Date.valueOf("2000-01-01").toLocalDate.plusDays(i).toString)
      .toDF("iso")
      .select(col("iso").cast("date").as("d"))
      .select(col("d"), Transforms.parseDate(date_format(col("d"), "M/d/yyyy")).as("rt"))
      .where(col("d") =!= col("rt")).count()
    assert(n == 0)
  }

  test("P6: season boundaries for all 12 months (hybrid_join.py:436-444)") {
    val expect = Map(
      1 -> "Winter", 2 -> "Winter", 3 -> "Spring", 4 -> "Spring",
      5 -> "Spring", 6 -> "Summer", 7 -> "Summer", 8 -> "Summer",
      9 -> "Autumn", 10 -> "Autumn", 11 -> "Autumn", 12 -> "Winter")
    val got = (1 to 12).map(m => f"2000-$m%02d-15").toDF("iso")
      .select(month(col("iso").cast("date")).as("m"),
        Star.seasonOf(col("iso").cast("date")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    expect.foreach { case (m, s) => assert(got(m) == s, s"month $m") }
  }

  test("P6: time dim attributes for a known date") {
    val row = Seq("2000-07-09").toDF("iso") // a Sunday in July, Q3, Summer
      .select(Transforms.timeDimRow(col("iso").cast("date")): _*)
      .collect().head
    assert(row.getLong(0) == 20000709L) // date_id
    assert(row.getString(2) == "Sunday")
    assert(row.getString(3) == "July")
    assert(row.getInt(4) == 3)
    assert(row.getString(5) == "Summer")
    assert(row.getInt(6) == 2000)
  }

  test("date_id surrogate is strictly monotone in the date") {
    val ids = Seq("1999-12-31", "2000-01-01", "2000-01-02", "2000-02-01")
      .toDF("iso")
      .select(Star.dateId(col("iso").cast("date")).as("id"))
      .collect().map(_.getLong(0))
    assert(ids.sameElements(ids.sorted.distinct))
  }
}
