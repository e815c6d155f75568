package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // intervals: user 1 has a window [10:00, 11:00), user 2 has [10:30, 11:30)
  private def intervals = Seq(
    (100L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
    (200L, 2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00"))
  ).toDF("iid", "user", "w_start", "w_end")

  private def points = Seq(
    (1L, 1L, ts("2024-01-01 10:00:00")),  // boundary: start is inclusive
    (2L, 1L, ts("2024-01-01 10:59:59")),  // inside, last second
    (3L, 1L, ts("2024-01-01 11:00:00")),  // boundary: end is exclusive
    (4L, 1L, ts("2024-01-01 09:59:59")),  // before window
    (5L, 2L, ts("2024-01-01 11:15:00")),  // inside user-2 window, crosses hour bucket
    (6L, 1L, ts("2024-01-01 11:15:00"))   // right time, wrong user
  ).toDF("pid", "user", "t")

  test("point-in-interval: inclusive start, exclusive end, per-key") {
    val out = RangeJoin.pointInInterval(points, intervals,
        "user", "t", "w_start", "w_end", bucketSeconds = 3600)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(out === Set((100L, 1L), (100L, 2L), (200L, 5L)))
  }

  test("no duplicate pairs when an interval spans multiple buckets") {
    // tiny buckets: the 1h window spans 61 one-minute buckets; each
    // matching point must still appear exactly once
    val out = RangeJoin.pointInInterval(points, intervals,
        "user", "t", "w_start", "w_end", bucketSeconds = 60)
      .select("iid", "pid").as[(Long, Long)].collect().toList
    assert(out.size === out.toSet.size)
    assert(out.toSet === Set((100L, 1L), (100L, 2L), (200L, 5L)))
  }

  test("differential: matches the naive inequality join on random data") {
    val rng = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    def randTs() = new java.sql.Timestamp(base + rng.nextInt(6 * 3600) * 1000L)
    val ivs = (0 until 60).map { i =>
      val start = randTs()
      val span = (rng.nextInt(7200) + 1) * 1000L  // 1s .. 2h — spans 0..3 buckets
      (i.toLong, rng.nextInt(5).toLong, start,
        new java.sql.Timestamp(start.getTime + span))
    }.toDF("iid", "user", "w_start", "w_end")
    val pts = (0 until 400).map { i =>
      (i.toLong, rng.nextInt(5).toLong, randTs())
    }.toDF("pid", "user", "t")

    val bucketed = RangeJoin.pointInInterval(pts, ivs,
        "user", "t", "w_start", "w_end", bucketSeconds = 3600)
      .select("iid", "pid").as[(Long, Long)].collect().sorted.toList
    val naive = pts.as("p").join(ivs.as("i"),
        col("p.user") === col("i.user") &&
          col("p.t") >= col("i.w_start") && col("p.t") < col("i.w_end"))
      .select("iid", "pid").as[(Long, Long)].collect().sorted.toList
    assert(bucketed === naive)
    assert(naive.nonEmpty)  // the comparison actually exercised matches
  }

  test("plan is an equi-join, not BroadcastNestedLoopJoin") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        "user", "t", "w_start", "w_end", bucketSeconds = 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
