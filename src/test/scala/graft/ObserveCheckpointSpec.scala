package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Mechanism pin for the r21 loop fusion: does Observation deliver metrics when the action is an eager
  * localCheckpoint? (r21 loop-fusion mechanism probe) */
class ObserveCheckpointSpec extends SparkSpec {
  import spark.implicits._

  test("observe metrics fire on eager localCheckpoint") {
    val obs = Observation("probe")
    val d = Seq(1, 2, 3, 4).toDF("x")
      .observe(obs, sum(when(col("x") > 2, 1L).otherwise(0L)).as("n_big"))
      .localCheckpoint()
    // if the metric never fires, get blocks — bound it
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val got = Await.result(Future(obs.get), 60.seconds)
    assert(got.get("n_big").contains(2L), s"metrics=$got")
    assert(d.count() == 4)
  }
}
