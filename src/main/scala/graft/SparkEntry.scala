package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: top-5 revenue customers —
    * a filtered fact-fact shuffle join (lineitem ⋈ orders) plus a
    * broadcast dimension join (customer) and a TakeOrdered top-k.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, d)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(22,4)"))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(5)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every query has an exact oracle: hash/LSH
    * queries use the md5-derived [[graft.functions.HashFns]] family, and
    * the multimodal stub codec derives its fake metadata/features from
    * the same family (dyadic-rational features), so even q35/q36
    * hash-match.
    */
  def oracleSql: Map[String, String] = OracleSql.all
}
