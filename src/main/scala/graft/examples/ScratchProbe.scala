package graft.examples

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe for timing operator variants in one JVM. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    // --- langId variants ---
    locally {
      import graft.functions.TextFns
      val docs = Tables.documents(spark, d)
      val markers = TextFns.LANG_MARKERS
      def hofLang(text: org.apache.spark.sql.Column) = {
        val t0 = transform(TextFns.tokens(text), w => lower(w))
        val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
          struct(
            size(filter(t0, w => array_contains(typedlit(words), w))).as("score"),
            lit(lang).as("lang"))
        }
        val best = array_max(array(scored: _*))
        when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
      }
      time("langid_hof") {
        docs.select(col("doc_id"), hofLang(col("text")).as("p")) }
      time("langid_strcount") {
        docs.select(col("doc_id"), TextFns.langId(col("text")).as("p")) }
      time("langid_hof2") {
        docs.select(col("doc_id"), hofLang(col("text")).as("p")) }
      time("langid_strcount2") {
        docs.select(col("doc_id"), TextFns.langId(col("text")).as("p")) }
    }

    // --- q263 stage breakdown ---
    val c = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_nationkey"), col("c_name"),
        col("c_mktsegment"), col("c_acctbal"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) + 100000")
          .as("bal_shift_cents"))
    import graft.dedup.Linkage
    val fields = Seq(
      Linkage.LinkField("name2", expr("right(c_name, 2)"), 950000L),
      Linkage.LinkField("bal",
        expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000"),
        900000L),
      Linkage.LinkField("seg", col("c_mktsegment"), 850000L))
    def pairs263 = Linkage.scorePairs(
        c.where(pmod(col("c_custkey"), lit(2L)) === 0L),
        c.where(pmod(col("c_custkey"), lit(2L)) === 1L),
        "c_custkey", blockKey = col("c_nationkey"), fields = fields)
      .where(col("score_e8") >= 0L)
      .select("id_a", "id_b")
    time("q263_blockjoin_raw") {
      val aa = c.where(pmod(col("c_custkey"), lit(2L)) === 0L)
        .select(col("c_custkey").as("id_a"), col("c_nationkey").as("__blk"),
          expr("right(c_name, 2)").as("ka1"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("ka2"),
          col("c_mktsegment").as("ka3"))
      val bb = c.where(pmod(col("c_custkey"), lit(2L)) === 1L)
        .select(col("c_custkey").as("id_b"), col("c_nationkey").as("__blk"),
          expr("right(c_name, 2)").as("kb1"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("kb2"),
          col("c_mktsegment").as("kb3"))
      aa.join(bb, Seq("__blk"))
        .select(col("id_a"), col("id_b"),
          (col("ka1") === col("kb1")).as("g1"),
          (col("ka2") === col("kb2")).as("g2"),
          (col("ka3") === col("kb3")).as("g3"))
    }
    time("q263_scorer_only") { pairs263 }
    time("q263_cc_labels") {
      graft.dedup.Dedup.connectedComponents(pairs263)._1 }
    time("q263_full") {
      Linkage.goldenRecords(c, "c_custkey", pairs263,
        canonCols = Seq("c_name", "c_mktsegment"),
        maxCols = Seq("bal_shift_cents"))
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))

    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"))
    val o = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    def ui = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("__u"), col("l_partkey").as("__it"))

    // components of itemSimilarity variants
    time("ui_distinct") { ui.distinct() }
    time("baskets_collect_set") {
      ui.groupBy("__u").agg(sort_array(collect_set(col("__it"))).as("__set"))
        .where(size(col("__set")) <= 1000)
    }
    val baskets = ui.groupBy("__u")
      .agg(sort_array(collect_set(col("__it"))).as("__set"))
      .where(size(col("__set")) <= 1000).select(col("__set"))
    time("pairs_from_slice") {
      baskets.select(col("__set"), posexplode(col("__set")))
        .select(col("col").as("a"),
          explode(slice(col("__set"), col("pos") + lit(2), size(col("__set")))).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_co"))
        .where(col("n_co") >= 3)
    }
    time("pairs_double_explode") {
      baskets.select(explode(col("__set")).as("a"), col("__set"))
        .select(col("a"), explode(col("__set")).as("b"))
        .where(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_co"))
        .where(col("n_co") >= 3)
    }
    val uid = ui.distinct()
    val sized = uid.groupBy("__u").agg(count(lit(1)).as("__b"))
      .where(col("__b") <= 1000)
    val kept = uid.join(sized.select("__u"), "__u")
    time("pairs_smj_selfjoin") {
      kept.as("i1").join(kept.as("i2"),
          col("i1.__u") === col("i2.__u") && col("i1.__it") < col("i2.__it"))
        .groupBy(col("i1.__it").as("a"), col("i2.__it").as("b"))
        .agg(count(lit(1)).as("n_co"))
        .where(col("n_co") >= 3)
    }
    val keptRows = baskets // exploded basket rows, partitioned by __u
    time("pairs_smj_from_baskets") {
      val ids = ui.groupBy(col("__u"))
        .agg(sort_array(collect_set(col("__it"))).as("__set"))
        .where(size(col("__set")) <= 1000)
        .select(col("__u"), explode(col("__set")).as("__it"))
      ids.as("i1").join(ids.as("i2"),
          col("i1.__u") === col("i2.__u") && col("i1.__it") < col("i2.__it"))
        .groupBy(col("i1.__it").as("a"), col("i2.__it").as("b"))
        .agg(count(lit(1)).as("n_co"))
        .where(col("n_co") >= 3)
    }
    spark.stop()
  }
}
