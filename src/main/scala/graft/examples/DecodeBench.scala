package graft.examples

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark of JSON decode variants (scratch tool). */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val records = Tables.events(spark, sfDir)
      .withColumn("rep", explode(sequence(lit(0), lit(19))))
      .select(to_json(struct(col("event_id"), col("user_id"), col("event_type"),
        col("value"))).as("payload"))
    records.cache()
    val n = records.count()
    println(s"rows: $n (cached)")

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()   // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $sec%8.2f s   ${n / sec / 1000}%8.0fk rec/s")
    }

    val ddl = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"

    time("raw pass-through")(records.select(length(col("payload")).as("l")))
    time("from_json x1")(records.select(
      from_json(col("payload"), graft.formats.Json.schemaOf(ddl)).as("v")))
    time("decodeResult (expr, 3 refs)")(records.select(
      graft.formats.Json.decodeResult(col("payload"), ddl).as("res")))
    // two-step: parse once into an attribute, then build the Result
    val schema = graft.formats.Json.schemaOf(ddl)
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    val twoStep = records
      .withColumn("__p", from_json(col("payload"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
      .select(struct(
        when(col("__p._corrupt").isNotNull, lit(null).cast(graft.formats.Json.schemaOf(ddl)))
          .otherwise(col("__p").dropFields("_corrupt")).as("value"),
        when(col("__p._corrupt").isNotNull,
          concat(lit("malformed JSON: "), substring(col("payload"), 1, 64)))
          .otherwise(lit(null).cast("string")).as("error")).as("res"))
    time("decodeResult (two-step)")(twoStep)

    // the full Graft pipeline shape: does the res-field filter re-inline
    // the parse via predicate pushdown?
    val kafkaShaped = records.select(
      lit(null).cast("binary").as("key"),
      col("payload").cast("binary").as("value"),
      lit("t").as("topic"), lit(0).as("partition"), lit(0L).as("offset"),
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("timestamp"),
      lit(0).as("timestampType"),
      array().cast("array<struct<key:string,value:binary>>").as("headers"))
    kafkaShaped.cache(); kafkaShaped.count()

    val decodedOnly = graft.streaming.Graft.json(kafkaShaped, ddl).toDF
      .select(col("res.value.event_id"))
    time("graft.json decode only")(decodedOnly)

    val withFilter = graft.streaming.Graft.json(kafkaShaped, ddl)
      .filter(col("res.error").isNull && col("res.value.event_type") =!= "error")
      .addField("source", lit("kpipe"))
      .toDF
      .select(col("res.value.event_id"), col("source"))
    time("graft.json + filter chain")(withFilter)
    println("== filter-chain plan ==")
    println(withFilter.queryExecution.executedPlan.toString.take(4000))

    spark.stop()
  }
}
