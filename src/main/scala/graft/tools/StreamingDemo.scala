package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.streaming.{IncrementalBalance, RowImage}

/** End-to-end demo of the A5/T6 streaming path (SURVEY §2.8) on the driver
  * fixtures: stream the `events` table through the incremental-balance
  * pipeline via a file source, then check the final state equals the batch
  * A4 aggregate (the batch-equivalence law, SURVEY §7.3).
  *
  * Usage: runMain graft.tools.StreamingDemo [sfDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-streaming-demo")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$work/incoming"
    val destDir = s"$work/balances"

    // stage the fixture as the streaming source directory, ts normalized
    // to epoch-µs Long (RowImage.ts) whatever the fixture's physical type
    val raw = Tables.events(spark, sfDir)
    val events = raw.withColumn("ts", Tables.tsUs(raw))
    events.write.parquet(srcDir)

    // RowImage.amount is a primitive Double: NULL values (allowed by the
    // events schema) would fail deserialization — filter them on both the
    // streaming and the batch side so the comparison stays apples-to-apples.
    val images = spark.readStream
      .schema(events.schema)
      .parquet(srcDir)
      .filter(col("value").isNotNull)
      .select(col("event_id").as("key"), col("user_id").as("userId"),
        col("event_type").as("status"), col("value").as("amount"),
        col("ts"))
      .as[RowImage]

    val q = IncrementalBalance.run(images, destDir)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(destDir)
      .select("user_id", "balance")
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100))
      .toMap
    val batch = events
      .filter(col("value").isNotNull)
      .filter(col("event_type") =!= "error") // the qualifying guard, batch form
      .groupBy("user_id").agg(sum("value").as("balance"))
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100))
      .toMap

    println(s"streamed users=${streamed.size} batch users=${batch.size} " +
      (if (streamed == batch) "BATCH-EQUIVALENT" else "MISMATCH"))
    if (streamed != batch) {
      streamed.keySet.union(batch.keySet).toSeq.sorted.take(5).foreach { k =>
        println(s"  user $k: streamed=${streamed.get(k)} batch=${batch.get(k)}")
      }
      spark.stop(); sys.exit(1)
    }
    spark.stop()
  }
}
