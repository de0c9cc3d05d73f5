package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format breadth: JSON (the reference's wire format —
  * Kafka carries JSON strings, ConsumerMultiThread.java:114), CSV, and
  * ORC, each as a write→schema-on-read round-trip whose oracle is the
  * original table — proving the format layer is lossless for the
  * engine's types.
  *
  * Round-trips are value-exact: Spark writes doubles as
  * shortest-round-trip decimals and parses them back to the identical
  * bits; event ids/types are integers/strings. Timestamps are carried
  * as microsecond epochs (integer-exact) rather than formatted text.
  */
object Sources {

  private def base(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("value"), unix_micros(col("ts")).as("ts_us"))

  private val schema = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts_us BIGINT"

  private def roundtrip(spark: SparkSession, d: String, fmt: String): DataFrame = {
    val out = s"${Tables.scratch}/roundtrip_${fmt}_${Tables.sanitize(d)}"
    base(spark, d).write.mode("overwrite").format(fmt).save(out)
    spark.read.schema(schema).format(fmt).load(out).orderBy(col("event_id"))
  }

  def a15_json(spark: SparkSession, d: String): DataFrame = roundtrip(spark, d, "json")
  def a16_csv(spark: SparkSession, d: String): DataFrame = roundtrip(spark, d, "csv")
  def a17_orc(spark: SparkSession, d: String): DataFrame = roundtrip(spark, d, "orc")

  private val baseSql =
    """SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
      |FROM events ORDER BY event_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "a15_json_roundtrip" -> baseSql,
    "a16_csv_roundtrip" -> baseSql,
    "a17_orc_roundtrip" -> baseSql,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a15_json_roundtrip" -> a15_json _,
    "a16_csv_roundtrip"  -> a16_csv _,
    "a17_orc_roundtrip"  -> a17_orc _,
  )
}
