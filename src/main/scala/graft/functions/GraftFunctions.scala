package graft.functions

import graft.dedup.Dedup
import graft.formats.{AvroCodec, AvroDecodeExpression, ConfluentEnvelope}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-visible registration of the engine's column functions, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works alongside the
  * Scala API — the `MessageProcessorRegistry`'s "named operators usable
  * from configuration" role (`MessageProcessorRegistry.java:51-228`) at
  * the SQL layer.
  *
  * Two wiring paths:
  *  - [[GraftFunctions.register]] on a live session (tests, notebooks);
  *  - [[GraftExtensions]] via `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (cluster deploys — the SURVEY §7 `SparkSessionExtensions` seam).
  */
object GraftFunctions {

  /** name → builder over child expressions. Composite column functions
    * are wrapped through the Column API and unwrapped back to an
    * Expression — they stay pure Catalyst trees.
    */
  private def viaColumns(f: Seq[Column] => Column): Seq[Expression] => Expression =
    exprs => GraftBridge.expression(f(exprs.map(GraftBridge.column)))

  val all: Map[String, Seq[Expression] => Expression] = Map(
    "graft_cosine" -> viaColumns { case Seq(a, b) => VectorFns.cosine(a, b) },
    "graft_dot" -> viaColumns { case Seq(a, b) => VectorFns.dot(a, b) },
    "graft_l2" -> viaColumns { case Seq(a, b) => VectorFns.l2Distance(a, b) },
    "graft_tokens" -> viaColumns { case Seq(t) => TextFns.tokens(t) },
    "graft_token_count" -> viaColumns { case Seq(t) => TextFns.tokenCount(t) },
    "graft_normalize" -> viaColumns { case Seq(t) => TextFns.normalize(t) },
    "graft_langid" -> viaColumns { case Seq(t) => TextFns.langId(t) },
    "graft_quality" -> viaColumns { case Seq(t) => TextFns.qualityScore(t) },
    "graft_fingerprint" -> viaColumns { case Seq(t) => TextFns.fingerprint(t) },
    "graft_fingerprint64" -> viaColumns { case Seq(t) => TextFns.fingerprint64(t) },
    "graft_simhash" -> viaColumns { case Seq(t) => Dedup.simhash(t) },
    "graft_word_jaccard" -> viaColumns { case Seq(a, b) => Dedup.wordJaccard(a, b) },
    "graft_jaro_winkler" -> viaColumns { case Seq(a, b) => JaroWinkler(a, b) },
    "graft_envelope_ok" -> viaColumns { case Seq(v) => ConfluentEnvelope.hasEnvelope(v) },
    "graft_schema_id" -> viaColumns { case Seq(v) => ConfluentEnvelope.schemaId(v) },
    "graft_avro_body" -> viaColumns { case Seq(v) => ConfluentEnvelope.avroBody(v) },
    // schema passed as a string literal: graft_from_avro(value, '{...}')
    "graft_from_avro" -> { exprs =>
      val schemaJson = literalString("graft_from_avro", "schema", exprs(1))
      AvroDecodeExpression(exprs.head, schemaJson)
    },
    "graft_hash61" -> viaColumns { case Seq(c) => HashFns.hash61(c) },
    // real container-header probe: binary → struct(format,width,height)
    "graft_image_dims" -> { exprs => ImageDims(exprs.head) },
    // width passed as a literal knob: graft_shingles(text, 3)
    "graft_shingles" -> { exprs =>
      WordShingles(exprs.head, literalKnob("graft_shingles", "n", exprs(1)))
    },
    // graft_zvalue(dim1, ..., dimD, bits) — trailing literal bit width
    "graft_zvalue" -> { exprs =>
      val bits = literalKnob("graft_zvalue", "bits", exprs.last)
      GraftBridge.expression(graft.ops.Layout.zValue(
        exprs.init.map(GraftBridge.column), bits))
    },
    // one-pass sketch AGGREGATES (arguments after the hash column are
    // literal knobs, folded at registration like graft_from_avro's
    // schema): SELECT g, graft_hll_agg(graft_hash61(v)) ... GROUP BY g
    "graft_hll_agg" -> viaColumns { case Seq(h) => graft.ops.Sketch.hllAgg(h) },
    "graft_kmv_agg" -> { exprs =>
      graft.plans.KmvAggregate(exprs.head,
        literalKnob("graft_kmv_agg", "k", exprs(1))).toAggregateExpression()
    },
    "graft_cms_agg" -> { exprs =>
      graft.plans.CmsAggregate(exprs.head,
        literalKnob("graft_cms_agg", "w", exprs(1)),
        literalKnob("graft_cms_agg", "d", exprs(2))).toAggregateExpression()
    })

  /** Fold a sketch-size knob that must be a literal (the aggregate's
    * buffer shape is fixed at plan time). A non-foldable argument gets
    * a clear error instead of an opaque NPE from `eval(null)`.
    */
  private def literalKnob(fn: String, arg: String, e: Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal integer (got non-foldable ${e.sql})")
    e.eval(null) match {
      case b: java.lang.Byte => b.intValue
      case s: java.lang.Short => s.intValue
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long if l >= Int.MinValue && l <= Int.MaxValue => l.intValue
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal integer (got $other)")
    }
  }

  /** Fold a string argument that must be a literal (e.g. an Avro schema
    * compiled at plan time). Same contract as [[literalKnob]]: clear
    * errors for non-foldable or NULL inputs instead of an opaque NPE.
    */
  private def literalString(fn: String, arg: String, e: Expression): String = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal string (got non-foldable ${e.sql})")
    e.eval(null) match {
      case null => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal string (got NULL)")
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a literal string (got $other)")
    }
  }

  /** Register every function on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** `spark.sql.extensions` entry point: SQL functions + the custom
  * operator planner strategies (as-of join).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftFunctions.type].getName, name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
