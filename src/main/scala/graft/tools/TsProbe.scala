package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway probe: fixture timestamp physical/logical types under the
  * NTZ-inference conf. Deleted once the migration lands. */
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    println("default conf: " + spark.conf.getOption("spark.sql.parquet.inferTimestampNTZ.enabled"))
    val d1 = spark.read.parquet(s"$dir/events.parquet")
    println("NTZ-inferred schema: " + d1.schema.simpleString)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val d2 = spark.read.parquet(s"$dir/events.parquet")
    println("no-NTZ schema: " + d2.schema.simpleString)
    d2.selectExpr("min(ts)", "max(ts)", "min(unix_micros(ts))").show(false)
    val pushed = d2.filter(org.apache.spark.sql.functions.col("ts") >=
      java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))
    println(pushed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    println("rows>=2024-01-10: " + pushed.count())
    spark.stop()
  }
}
