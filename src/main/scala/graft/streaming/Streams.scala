package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape (SURVEY §2.9:
  * the reference is pure batch; this is the engine's streaming extension —
  * the daily→weekly calendar roll-up A1 becomes a watermarked tumbling
  * window).
  *
  * Scale: windowed aggregation state is keyed by (window, event_type) and
  * bounded by the watermark; mapGroupsWithState keys by user_id. Both shapes
  * run identically on a 1000-executor cluster — state lives in the state
  * store, never on the driver.
  */
object Streams {

  /** Post-conversion schema of the events stream (ts already micros NTZ). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming read of an events directory (nanos → micros). Unlike
    * graft.Tables.events this keeps ts as TIMESTAMP (local-tz): watermarks
    * require it — EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on TIMESTAMP_NTZ.
    * Session tz is UTC so wall-clock values match the batch reader.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling-window counts/sums with a watermark for late data. */
  def tumblingAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(25, 4))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window variant (windowLen every slide). */
  def slidingAgg(events: DataFrame, windowLen: String, slide: String,
                 watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows per user with a gap timeout (built-in session_window). */
  def sessionAgg(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
              col("user_id"), col("n_events"))

  /** Streaming dedup by event_id with bounded state: duplicates arriving
    * within the watermark horizon are dropped, and state for ids older than
    * the watermark is evicted (dropDuplicatesWithinWatermark — plain
    * dropDuplicates on a stream would keep ALL ids forever).
    */
  def dedupStream(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: the static side (a dimension) is
    * broadcast per micro-batch; the stream side never shuffles. The streaming
    * twin of the batch FK-filter join (J1).
    */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))

  final case class UserEvent(user_id: Long, event_id: Long)
  final case class UserRunning(user_id: Long, n_events: Long)

  /** Custom state: running per-user event counts via mapGroupsWithState
    * (KeyValueGroupedDataset surface, SURVEY §7.2 step 9).
    */
  def runningCounts(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Long, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          UserRunning(uid, n)
      }
  }

  /** Drive a streaming frame to completion against a memory sink and return
    * the materialized result (for specs and local smoke). Default mode is
    * Complete — right for the aggregation helpers; pass Append for
    * [[dedupStream]]/[[enrichStream]] (no aggregation). Always stops the
    * query, even when processing throws — a leaked StreamingQuery would keep
    * polling the source for the rest of the session.
    */
  def runToMemory(df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }
}
