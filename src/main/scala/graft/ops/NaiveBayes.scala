package graft.ops

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification, integer end to end —
  * the fastText-shaped quality/language-classifier stage of a
  * training-data pipeline (McCallum & Nigam 1998, "A Comparison of
  * Event Models for Naive Bayes Text Classification"), with every
  * logarithm replaced by Mitchell's integer log2 approximation in
  * eighth-bit units ([[TextStats.mitchellE8Sql]]) so train AND
  * inference are oracle-hashable — the same no-float discipline as
  * the LM surprisal and BM25 operators.
  *
  * Scoring minimizes total surprisal (= maximizes log-likelihood):
  * per token t and class l, with add-one smoothing,
  * −log2 p(t|l) = log2((T_l + V)/(c_{l,t} + 1)) ≈ (m8(q) − 8·SHIFT)/8
  * where q = ((T_l + V) << SHIFT) div (c_{l,t} + 1), T_l = class
  * token total, V = training vocabulary size; the class prior adds
  * −log2(N_l/N) the same way. T_l ≥ c_{l,t} always, so q ≥ 2^SHIFT
  * and every term is non-negative; products route through DECIMAL
  * (HUGEINT on the oracle side) so corpus-scale counts cannot wrap.
  *
  * The model is three mergeable tables — class doc/token totals,
  * per-(class, token) counts, and the vocabulary SET (kept as a set,
  * not a count: distinct counts do not add) — counts add and sets
  * union, so `merge(train(A), train(B)) == train(A ∪ B)` exactly
  * (specced) and daily increments fold without rescanning history,
  * like the sketch and LM profile stores.
  *
  * Scale shape: training is two map-side-partial hash aggregations
  * plus a distinct (one corpus scan). Scoring precomputes the
  * per-(class, token) surprisal on the VOCAB-BOUNDED model grid
  * (plus the per-class unseen-token constant), broadcasts it, and
  * runs the token stream × L classes (L = class count, small)
  * through one broadcast hash probe + integer add per row into a
  * map-side-partial (doc, class) aggregation, then a per-doc window
  * for the argmin — the corpus is never shuffled before the
  * aggregation (beyond broadcastable vocabularies the count-table
  * shuffle join is the fallback shape). No driver-side state
  * anywhere.
  */
object NaiveBayes {

  /** A trained model: `classCounts(label, n_docs, n_tokens)`,
    * `tokenCounts(label, t, c)`, `vocab(t)` — all mergeable.
    */
  final case class NbModel(classCounts: DataFrame, tokenCounts: DataFrame,
                           vocab: DataFrame)

  /** Train on a labeled corpus: one scan, two hash aggregations and a
    * distinct, all map-side-partial.
    */
  def train(docs: DataFrame, labelCol: String, textCol: String): NbModel = {
    val toks = docs.select(col(labelCol).as("label"),
      TextFns.tokens(col(textCol)).as("w"))
    val tok = toks.select(col("label"), explode(col("w")).as("t"))
    NbModel(
      toks.groupBy("label").agg(count(lit(1)).as("n_docs"),
        sum(size(col("w")).cast("bigint")).as("n_tokens")),
      tok.groupBy("label", "t").agg(count(lit(1)).as("c")),
      tok.select("t").distinct())
  }

  /** Fold models: counts add, vocab sets union — associative, so
    * shards/days merge in any order, exactly.
    */
  def merge(a: NbModel, b: NbModel): NbModel = NbModel(
    a.classCounts.unionByName(b.classCounts).groupBy("label")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens")),
    a.tokenCounts.unionByName(b.tokenCounts).groupBy("label", "t")
      .agg(sum("c").as("c")),
    a.vocab.unionByName(b.vocab).distinct())

  private val Shift = TextStats.LmShift
  private val Two20 = s"CAST(${1L << Shift} AS BIGINT)"

  /** Score docs under a model: one row per doc — `(idCol, carry...,
    * pred, s_e8, margin_e8)` with `pred` the minimum-surprisal class
    * (ties to the smallest label), `s_e8` its total surprisal in
    * eighth-bits, and `margin_e8` the gap to the runner-up (0 when
    * the model has a single class). Unseen tokens smooth through
    * c = 0; empty docs score on priors alone.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, model: NbModel,
            carry: Seq[String] = Seq.empty): DataFrame = {
    val v = model.vocab.agg(count(lit(1)).as("v"))
    val nAll = model.classCounts.agg(sum("n_docs").as("n_all"))
    val classes = model.classCounts
      .crossJoin(broadcast(v)).crossJoin(broadcast(nAll))
      .withColumn("qp", expr(
        s"greatest((CAST(n_all AS DECIMAL(38,0)) * ${1L << Shift}) div n_docs, $Two20)"))
      .withColumn("prior_e8",
        graft.functions.MitchellE8(col("qp")) - lit(8L * Shift))
      .select("label", "n_tokens", "v", "prior_e8")

    val toks = docs.select(col(idCol).as("__id") +: carry.map(col) :+
      TextFns.tokens(col(textCol)).as("w"): _*)
    // r16 (the cvAuc scoring rationale): the surprisal arithmetic is a
    // function of the VOCAB-BOUNDED model grid, not of the corpus — so
    // the DECIMAL division + Mitchell log precompute per (class, token)
    // MODEL row (m8tab; u8tab carries the c = 0 unseen-token constant
    // per class, the identical expression with c pinned to 0), and the
    // corpus-side scoring pass is one broadcast hash probe + an integer
    // add per (token, class) row — no shuffle before the per-(doc,
    // class) partial aggregation, where the old shape sort-merge-joined
    // every (corpus token × class) row against the count table.
    // Bit-identical: same q/m8 expressions over the same (c, n_tokens,
    // v) values; the per-(doc, class) sum of longs is order-free.
    // Broadcast bound: trained vocab × L rows (the scaladoc's
    // "broadcast when the trained vocabulary is bounded" case); beyond
    // broadcastable vocabularies the old shuffle join is the fallback.
    val m8tab = model.tokenCounts
      .join(broadcast(classes.select("label", "n_tokens", "v")), Seq("label"))
      .withColumn("q", expr(
        s"greatest((CAST(n_tokens + v AS DECIMAL(38,0)) * ${1L << Shift}) " +
          s"div (c + 1), $Two20)"))
      // native m8 (r15): one leading-zeros call per row instead of the
      // ~130-branch CASE ladder; bit-equal (MitchellE8Spec)
      .select(col("label"), col("t"),
        (graft.functions.MitchellE8(col("q")) - lit(8L * Shift)).as("m8v"))
    val u8tab = classes
      .withColumn("c", lit(0L))
      .withColumn("q", expr(
        s"greatest((CAST(n_tokens + v AS DECIMAL(38,0)) * ${1L << Shift}) " +
          s"div (c + 1), $Two20)"))
      .select(col("label"),
        (graft.functions.MitchellE8(col("q")) - lit(8L * Shift)).as("u8v"))
    val perTok = toks.select(col("__id"), explode(col("w")).as("t"))
      .crossJoin(broadcast(u8tab))
      .join(broadcast(m8tab), Seq("label", "t"), "left")
      .groupBy("__id", "label")
      .agg(sum(coalesce(col("m8v"), col("u8v"))).as("tok_e8"))

    val byClass = toks.select(col("__id") +: carry.map(col): _*)
      .crossJoin(broadcast(classes.select("label", "prior_e8")))
      .join(perTok, Seq("__id", "label"), "left")
      .withColumn("s_e8", col("prior_e8") + coalesce(col("tok_e8"), lit(0L)))
    val w = Window.partitionBy("__id").orderBy(col("s_e8").asc, col("label").asc)
    byClass
      .withColumn("rnk", row_number().over(w))
      .withColumn("nxt", lead(col("s_e8"), 1).over(w))
      .where(col("rnk") === 1)
      .select(col("__id").as(idCol) +: carry.map(col) :+
        col("label").as("pred") :+ col("s_e8").cast("bigint").as("s_e8") :+
        coalesce(col("nxt") - col("s_e8"), lit(0L)).cast("bigint").as("margin_e8"): _*)
  }

  /** Train-on-holdin / score-holdout in one call (the q114 oracle
    * surface): train on `trainDocs`, score `scoreDocs`.
    */
  def trainScore(trainDocs: DataFrame, scoreDocs: DataFrame, labelCol: String,
                 idCol: String, textCol: String,
                 carry: Seq[String] = Seq.empty): DataFrame =
    score(scoreDocs, idCol, textCol, train(trainDocs, labelCol, textCol), carry)
}
