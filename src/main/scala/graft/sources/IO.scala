package graft.sources

import graft.TSSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources and sinks for tidy time-series relations (the Spark-side
  * replacement for the reference's pandas CSV ingestion,
  * kats/consts.py:TimeSeriesData(df)).
  *
  * Readers validate the (key…, ts, value) contract up front — a wrong
  * column name fails at load, not three operators later — and normalize
  * the time column to TimestampType (epoch seconds/millis integers and
  * ISO strings all accepted). The sink writes partitioned, sorted
  * parquet: partition columns give coarse pruning, the within-partition
  * sort gives parquet min/max row-group pruning on ts — the layout a
  * 100 TB store needs for time-range scans.
  */
object IO {

  /** Validate the schema contract and normalize `ts` to a timestamp. */
  def timeSeries(df: DataFrame, s: TSSchema): DataFrame = {
    val missing = (s.keys :+ s.ts :+ s.value).filterNot(df.columns.contains)
    require(missing.isEmpty, s"time-series relation is missing columns: ${missing.mkString(", ")}")
    val tsType = df.schema(s.ts).dataType.typeName
    val normalized = tsType match {
      case "timestamp" => df
      case "long" | "integer" =>
        // magnitude split: |v| >= 1e11 can only be epoch millis (as seconds
        // it would mean year 5138+), anything smaller is epoch seconds.
        // Known ambiguity: millis for dates before 1973-03-03 fall under
        // the cutoff and parse as seconds — pre-convert such columns
        // yourself; no heuristic can split that window.
        df.withColumn(s.ts,
          when(abs(col(s.ts)) >= 100000000000L, timestamp_millis(col(s.ts)))
            .otherwise(timestamp_seconds(col(s.ts))))
      case "string" => df.withColumn(s.ts, to_timestamp(col(s.ts)))
      case other => throw new IllegalArgumentException(s"unsupported ts type: $other")
    }
    normalized.withColumn(s.value, col(s.value).cast("double"))
  }

  def readCsv(spark: SparkSession, path: String, s: TSSchema): DataFrame =
    timeSeries(spark.read.option("header", "true").option("inferSchema", "true").csv(path), s)

  def readJson(spark: SparkSession, path: String, s: TSSchema): DataFrame =
    timeSeries(spark.read.json(path), s)

  def readParquet(spark: SparkSession, path: String, s: TSSchema): DataFrame =
    timeSeries(spark.read.parquet(path), s)

  /** Partitioned + ts-sorted parquet sink (coarse partition pruning +
    * row-group min/max pruning on ts).
    */
  def writePartitioned(df: DataFrame, path: String, s: TSSchema): Unit =
    df.repartition(s.keyCols: _*)
      .sortWithinPartitions((s.keyCols :+ col(s.ts)): _*)
      .write.mode("overwrite").partitionBy(s.keys: _*).parquet(path)

  /** Bucketed + sorted catalog-table sink: hash-buckets rows by the
    * series keys and sorts by (keys…, ts) inside each bucket. Two tables
    * bucketed the same way join or aggregate on the keys WITHOUT a
    * shuffle (Catalyst recognizes the bucketing as a satisfied hash
    * distribution) — the co-located-join layout a 100 TB store pays for
    * once at write time and wins on every subsequent join. BucketSpec
    * asserts the no-Exchange plan contract.
    *
    * Caveat: the shuffle elimination applies when the join/agg keys
    * match the bucket keys EXACTLY — joining on a superset (keys…, ts)
    * makes the planner disable the bucketed scan and shuffle both sides,
    * so bucket by the columns you actually join on.
    */
  def writeBucketed(df: DataFrame, table: String, s: TSSchema, buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, s.keys.head, s.keys.tail: _*)
      .sortBy(s.keys.head, (s.keys.tail :+ s.ts): _*)
      .format("parquet")
      .saveAsTable(table)
}
