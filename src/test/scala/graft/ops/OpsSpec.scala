package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the transform combinators, mirroring the reference's
  * `OperatorsTest.java` cases (rename-missing-is-noop, addField
  * overwrites, requireField filters nulls, safe passes through on
  * failure, compose chains left-to-right, registry pass-through).
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "active", Some(10.0)),
    (2L, "inactive", Some(20.0)),
    (3L, "active", None)
  ).toDF("id", "status", "value")

  test("filter keeps matching rows; null predicate drops") {
    assert(Ops.filter($"status" === "active")(df).count() === 2)
    // null-valued predicate behaves as false, not as error
    assert(Ops.filter($"value" > 5)(df).count() === 2)
  }

  test("drop is the inverse filter") {
    assert(Ops.drop($"status" === "active")(df).count() === 1)
  }

  test("requireField filters null values; missing field yields empty") {
    assert(Ops.requireField("value")(df).count() === 2)
    assert(Ops.requireField("nope")(df).count() === 0)
  }

  test("rename renames; missing source is a no-op") {
    assert(Ops.rename("value", "amount")(df).columns.contains("amount"))
    assert(Ops.rename("nope", "x")(df).columns.toSeq === df.columns.toSeq)
  }

  test("addField overwrites existing column") {
    val out = Ops.addField("status", lit("forced"))(df)
    assert(out.select("status").distinct().as[String].collect().toSeq === Seq("forced"))
  }

  test("removeFields drops columns") {
    assert(Ops.removeFields("value", "status")(df).columns.toSeq === Seq("id"))
  }

  test("when routes rows through both branches") {
    val out = Ops.when($"status" === "active")(
      Ops.addField("route", lit("a")),
      Ops.addField("route", lit("b")))(df)
    val routes = out.select("id", "route").as[(Long, String)].collect().toMap
    assert(routes === Map(1L -> "a", 3L -> "a", 2L -> "b"))
  }

  test("whenColumn is the single-projection variant") {
    val out = Ops.whenColumn("flag", $"status" === "active", lit(1), lit(0))(df)
    assert(out.where($"flag" === 1).count() === 2)
  }

  test("pipeColumn with nullFilters drops rows the transform nulls out") {
    val out = Ops.pipeColumn("value", when($"value" > 15, $"value"), nullFilters = true)(df)
    assert(out.count() === 1)
  }

  test("compose chains left-to-right") {
    val out = Ops.compose(
      Ops.filter($"status" === "active"),
      Ops.addField("source", lit("test")),
      Ops.removeFields("value"))(df)
    assert(out.columns.toSeq === Seq("id", "status", "source"))
    assert(out.count() === 2)
  }

  test("safe returns input unchanged when the op fails at analysis") {
    val bad: Ops.Op = _.select(col("no_such_column"))
    assert(Ops.safe(bad)(df).columns.toSeq === df.columns.toSeq)
    assert(Ops.safe(Ops.filter($"status" === "active"))(df).count() === 2)
  }

  test("TryEval: per-row runtime failure yields null, row survives") {
    val out = Seq("5", "not-a-number").toDF("s")
      .select(col("s"), TryEval(expr("assert_true(s = '5')")).as("checked"))
      .collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(1))   // assert_true returns null on success
    assert(out(1).isNullAt(1))   // failure caught per row, not thrown
  }

  test("skipBytes strips a fixed prefix from a binary column") {
    val bin = Seq(Array[Byte](0, 1, 2, 3, 4, 5)).toDF("value")
    val out = Ops.skipBytes("value", 2)(bin).as[Array[Byte]].collect().head
    assert(out.toSeq === Seq[Byte](2, 3, 4, 5))
  }

  test("pipeline veneer chains like Stream") {
    val out = Pipeline(df)
      .filter($"status" === "active")
      .requireField("value")
      .rename("value", "amount")
      .addField("source", lit("kpipe"))
      .removeFields("status")
      .toDF
    assert(out.columns.toSeq === Seq("id", "amount", "source"))
    assert(out.count() === 1)
  }

  test("registry: registered op applies, missing name passes through once-warned") {
    val reg = new OperatorRegistry()
      .registerOperator("only_active", Ops.filter($"status" === "active"))
    assert(reg.operator("only_active")(df).count() === 2)
    assert(reg.operator("missing")(df).count() === 3)
    val chained = reg.pipeline("only_active", "missing")(df)
    assert(chained.count() === 2)
  }

  test("registry compositeSink: best-effort over registered sinks, unknown skipped") {
    val seen = scala.collection.mutable.Buffer.empty[String]
    val reg = new OperatorRegistry()
      .registerSink("good", _ => seen += "good")
      .registerSink("boom", _ => throw new RuntimeException("down"))
    reg.compositeSink("boom", "good", "missing")(df)
    assert(seen.toSeq === Seq("good"))
  }

  test("peek/observe leaves rows untouched") {
    val out = Ops.peek("metrics", count(lit(1)).as("rows"))(df)
    assert(out.count() === 3)
  }
}
