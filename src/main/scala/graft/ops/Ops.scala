package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level transform combinators — the Spark re-expression of kpipe's
  * operator algebra (reference: `lib/kpipe-core/.../registry/Operators.java:42-223`
  * and `lib/kpipe-api/.../Stream.java:46-92`).
  *
  * Every combinator is a `DataFrame => DataFrame` that compiles to pure
  * Catalyst expressions (no per-row UDFs, no driver-side loops), so chains
  * stay inside whole-stage codegen and filters are pushed to the scan. The
  * kpipe null-means-filter convention (`Stream.java:46-53`: an operator
  * returning null drops the record, offset still commits) becomes an
  * explicit `where(isNotNull)` after the transform — Catalyst then fuses
  * and pushes it where possible.
  */
object Ops {

  /** A pipeline stage: pure DataFrame transform. */
  type Op = DataFrame => DataFrame

  /** `Stream.pipe` — append a transform stage (`Stream.java:46-53`). */
  def pipe(f: Op): Op = f

  /** `Operators.map` — alias of pipe (`Operators.java:96-98`). */
  def map(f: Op): Op = f

  /** `pipe` for the common "rewrite one column, null drops the row" case:
    * kpipe's null-=-filter convention at column granularity.
    */
  def pipeColumn(name: String, value: Column, nullFilters: Boolean = false): Op =
    df => {
      val out = df.withColumn(name, value)
      if (nullFilters) out.where(col(name).isNotNull) else out
    }

  /** `Stream.filter` — predicate false or null drops the row
    * (`Stream.java:55-62`, `Operators.java:42-44`).
    */
  def filter(p: Column): Op = _.where(coalesce(p, lit(false)))

  /** `Operators.drop` — inverse filter (`Operators.java:59-61`). */
  def drop(p: Column): Op = _.where(!coalesce(p, lit(false)))

  /** `Stream.when(cond, ifTrue, ifFalse)` — conditional branch, both
    * branches required (`Stream.java:73-81`). Rows where `cond` is
    * null take the false branch (kpipe evaluates a boolean predicate).
    * Both branches must preserve a union-compatible schema.
    */
  def when(cond: Column)(ifTrue: Op, ifFalse: Op): Op = df => {
    val c = coalesce(cond, lit(false))
    ifTrue(df.where(c)).unionByName(ifFalse(df.where(!c)))
  }

  /** Column-level `when` for same-schema branches — stays a single
    * projection (no union, no double scan); preferred at scale.
    */
  def whenColumn(name: String, cond: Column, ifTrue: Column, ifFalse: Column): Op =
    _.withColumn(name, org.apache.spark.sql.functions.when(cond, ifTrue).otherwise(ifFalse))

  /** `Operators.requireField` — null/missing field drops the row
    * (`Operators.java:130-132`). A missing column is an analysis error in
    * Spark; we mirror kpipe's "missing field filters the record" by
    * treating absent columns as an always-false predicate.
    */
  def requireField(name: String): Op = df =>
    if (df.columns.contains(name)) df.where(col(name).isNotNull)
    else df.limit(0)

  /** `Operators.rename` — no-op when the source column is absent
    * (`Operators.java:147-153`).
    */
  def rename(from: String, to: String): Op = df =>
    if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df

  /** `Operators.removeFields` (`Operators.java:195-201`). */
  def removeFields(names: String*): Op = _.drop(names: _*)

  /** `Operators.addField` — put, overwrites (`Operators.java:217-223`). */
  def addField(name: String, value: Column): Op = _.withColumn(name, value)

  /** `Operators.compose` — left-to-right chain; each stage's null-filter
    * short-circuits downstream work (`Operators.java:171-181`), which
    * Catalyst reproduces via filter pushdown through the chain.
    */
  def compose(ops: Op*): Op = df => ops.foldLeft(df)((d, f) => f(d))

  /** `Operators.safe` — if applying the op fails (analysis error: missing
    * column, type mismatch), log and return the input unchanged
    * (`Operators.java:114-116`). Runtime row-level failures belong to the
    * Result/error-capture path (graft.formats), not here — Spark plans
    * fail at analysis time, not per row.
    */
  def safe(op: Op): Op = df =>
    try op(df)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"safe(): operator failed at analysis time, passing input through: ${e.getMessage}")
        df
    }

  /** `Stream.peek` — visibility without changing the outcome
    * (`Stream.java:64-71`). Implemented as `Dataset.observe` named
    * metrics: aggregates are collected by the listener/last-progress,
    * rows flow through untouched.
    */
  def peek(name: String, metrics: Column, more: Column*): Op =
    _.observe(name, metrics, more: _*)

  /** `Stream.skipBytes(n)` — strip a fixed-length wire prefix from a
    * binary column before decode (`Stream.java:269-282`). One offset move
    * in Tungsten, no copy amplification.
    */
  def skipBytes(column: String, n: Int): Op =
    _.withColumn(column, expr(s"substring($column, ${n + 1}, length($column) - $n)"))
}

/** Fluent veneer mirroring kpipe's `Stream` chaining
  * (`lib/kpipe-api/.../Stream.java:18-45`): each call returns a new
  * immutable `Pipeline` value wrapping a new logical plan — the same
  * copy-on-write shape as `DefaultStream` (`DefaultStream.java:34-57`),
  * except the "plan" is a Catalyst `LogicalPlan`, so building is free and
  * optimization is global.
  */
final case class Pipeline(df: DataFrame) {
  def pipe(f: Ops.Op): Pipeline                       = Pipeline(f(df))
  def pipeColumn(n: String, v: Column): Pipeline      = Pipeline(Ops.pipeColumn(n, v)(df))
  def filter(p: Column): Pipeline                     = Pipeline(Ops.filter(p)(df))
  def drop(p: Column): Pipeline                       = Pipeline(Ops.drop(p)(df))
  def when(c: Column)(t: Ops.Op, f: Ops.Op): Pipeline = Pipeline(Ops.when(c)(t, f)(df))
  def requireField(n: String): Pipeline               = Pipeline(Ops.requireField(n)(df))
  def rename(from: String, to: String): Pipeline      = Pipeline(Ops.rename(from, to)(df))
  def removeFields(ns: String*): Pipeline             = Pipeline(Ops.removeFields(ns: _*)(df))
  def addField(n: String, v: Column): Pipeline        = Pipeline(Ops.addField(n, v)(df))
  def peek(name: String, m: Column, more: Column*): Pipeline =
    Pipeline(Ops.peek(name, m, more: _*)(df))
  def toDF: DataFrame = df
}

/** Named-operator registry — `MessageProcessorRegistry` re-expressed
  * (`lib/kpipe-core/.../MessageProcessorRegistry.java:51-228`): two
  * namespaces (operators, sinks) keyed by name; a missing operator is a
  * warn-once identity pass-through (`:169-182`).
  */
final class OperatorRegistry {
  private val ops = scala.collection.concurrent.TrieMap.empty[String, Ops.Op]
  private val sinks = scala.collection.concurrent.TrieMap.empty[String, DataFrame => Unit]
  private val warned = scala.collection.concurrent.TrieMap.empty[String, Unit]
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def registerOperator(name: String, op: Ops.Op): this.type = { ops.put(name, op); this }
  def registerSink(name: String, sink: DataFrame => Unit): this.type = { sinks.put(name, sink); this }

  /** Missing name → identity, warned once per name (`MessageProcessorRegistry.java:169-182`). */
  def operator(name: String): Ops.Op = ops.getOrElse(name, {
    if (warned.putIfAbsent(name, ()).isEmpty)
      log.warn(s"unknown operator '$name' — passing through unchanged")
    identity[DataFrame] _
  })

  def sink(name: String): Option[DataFrame => Unit] = sinks.get(name)

  /** Build a pipeline from registered names, left to right
    * (`TypedPipelineBuilder.java:108-164`).
    */
  def pipeline(names: String*): Ops.Op = Ops.compose(names.map(operator): _*)

  /** Registry-level best-effort fan-out over registered sinks
    * (`MessageProcessorRegistry.compositeSink`, `:314-325`): each named
    * sink is attempted; a throwing sink is logged and suppressed;
    * unknown names are skipped with a warning.
    */
  def compositeSink(names: String*): DataFrame => Unit = df =>
    names.foreach { name =>
      sinks.get(name) match {
        case Some(sink) =>
          try sink(df)
          catch {
            case e: Exception =>
              log.warn(s"composite sink '$name' failed (suppressed): ${e.getMessage}")
          }
        case None => log.warn(s"composite sink '$name' not registered — skipped")
      }
    }
}
