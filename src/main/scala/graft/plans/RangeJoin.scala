package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join.
  *
  * Spark plans `p.key = i.key AND p.ts >= i.start AND p.ts < i.end` as a
  * shuffle join on `key` alone, with the range as a post-join filter —
  * fine when keys are selective, but a hot key (or no key) degenerates
  * to comparing every point against every interval of that key. This
  * operator makes the time axis part of the join key: intervals explode
  * into the fixed-width buckets they overlap (span/bucketSeconds + 1
  * rows each), points map to exactly one bucket, and the join becomes a
  * plain shuffle hash equi-join on `(key, bucket)` with an exact
  * residual filter. A point meets an interval in at most the point's
  * single bucket, so no post-join dedup is needed.
  *
  * Pick `bucketSeconds` near the typical interval span: candidate
  * fan-out stays O(1) per interval and each bucket's population is what
  * a single join task handles. Reference analog: the interval/windowed
  * stream joins of kpipe pipelines (batch form).
  *
  * Requires `start <= end` on every interval row (`sequence()` throws
  * otherwise) and non-null timestamps. Start is inclusive, end
  * exclusive.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
                      pointTsCol: String, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = lit(bucketSeconds)
    def bucketOf(ts: org.apache.spark.sql.Column) =
      floor(unix_timestamp(ts) / w).cast("long")
    val ip = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pp = points.withColumn("__bucket", bucketOf(col(pointTsCol)))
    pp.join(ip, Seq(keyCol, "__bucket"))
      .where(col(pointTsCol) >= col(startCol) && col(pointTsCol) < col(endCol))
      .drop("__bucket")
  }
}
