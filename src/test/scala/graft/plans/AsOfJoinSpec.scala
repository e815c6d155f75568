package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    // (key, time, trade_id)
    ("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L),
    ("B", 15L, 4L),
    ("C", 5L, 5L)).toDF("sym", "t", "trade_id")

  private val quotes = Seq(
    // (key, time, px)
    ("A", 5L, 100.0), ("A", 20L, 101.0), ("A", 25L, 102.0),
    ("B", 99L, 200.0), // after B's only trade — no match
    ("D", 1L, 300.0)).toDF("qsym", "qt", "px")

  test("backward as-of semantics: latest right row with time <= left time") {
    val out = AsOf.join(trades, quotes, "sym", "qsym", "t", "qt")
      .select("trade_id", "px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) === Some(100.0)) // qt=5 <= 10
    assert(out(2L) === Some(101.0)) // qt=20 <= 20 (inclusive), latest wins
    assert(out(3L) === Some(102.0))
    assert(out(4L) === None)        // only quote for B is later
    assert(out(5L) === None)        // no quotes for C at all
  }

  test("physical plan is the custom exec with one exchange+sort per side") {
    val df = AsOf.join(trades, quotes, "sym", "qsym", "t", "qt")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical)
    // EnsureRequirements must have added hash exchanges and (key, time) sorts
    assert("Exchange hashpartitioning".r.findAllIn(physical).size >= 2, physical)
    assert("Sort \\[".r.findAllIn(physical).size >= 2, physical)
  }

  test("null keys and null times never match") {
    val l = Seq((Some("A"), Some(10L), 1L), (None, Some(10L), 2L),
      (Some("A"), None, 3L)).toDF("k", "t", "id")
    val r = Seq((Some("A"), Some(1L), 9.0), (None, Some(1L), 8.0))
      .toDF("rk", "rt", "v")
    val out = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(9.0))
    assert(out(2L) === None)
    assert(out(3L) === None)
  }

  test("matches the union + running-last window composition on events") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val custom = AsOf.join(clicks, purchases, "user_id", "p_user", "ts", "p_ts")
      .select(col("event_id"), col("p_id").as("last_purchase"))

    val viaWindow = {
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(1).as("is_click"), lit(null).cast("long").as("p_id"))
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
          lit(0).as("is_click"), col("event_id").as("p_id"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("is_click"))
        .rowsBetween(Window.unboundedPreceding, 0)
      c.unionByName(p)
        .withColumn("last_purchase", last(col("p_id"), ignoreNulls = true).over(w))
        .where(col("is_click") === 1)
        .select(col("event_id"), col("last_purchase"))
    }
    assert(custom.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(custom).isEmpty)
  }

  test("tiebreak pins the winner among exact (key, time) duplicates") {
    // three quotes tied on (A, 10): without a tiebreak the carried px is
    // whichever sorted last (partition-nondeterministic); with
    // tiebreak=qid the greatest qid deterministically wins
    val l = Seq(("A", 10L, 1L)).toDF("sym", "t", "trade_id")
    val r = Seq(("A", 10L, 1L, 100.0), ("A", 10L, 3L, 300.0), ("A", 10L, 2L, 200.0))
      .toDF("qsym", "qt", "qid", "px")
      .repartition(3)   // scramble input order so sort ties are real
    (1 to 5).foreach { _ =>
      val out = AsOf.join(l, r, "sym", "qsym", "t", "qt",
          rightTiebreakCol = Some("qid"))
        .select("px").as[Double].collect()
      assert(out.toSeq === Seq(300.0))
    }
  }

  test("self-join legs from one source do not collide on attribute ids") {
    // both legs project the SAME attributes of the same scan
    val base = trades
    val out = AsOf.join(
      base.select(col("sym"), col("t"), col("trade_id")),
      base.select(col("sym"), col("t"), col("trade_id").as("prev_id")),
      "sym", "sym", "t", "t")
    // every row matches at least itself (t <= t, same key)
    assert(out.where(col("prev_id").isNull).count() === 0)
  }
}
