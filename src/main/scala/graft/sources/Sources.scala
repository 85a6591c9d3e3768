package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source layer (S1-S5, financial_engine.py:114-275), Spark-first: the
  * `DataSourceAdapter` interface IS `spark.read`/`spark.readStream`;
  * each adapter becomes a (format, schema, normalization projection)
  * triple. No HTTP in this environment, so the REST poller is modeled
  * by the JSON reader + the same field-extraction projection it would
  * apply to `GLOBAL_QUOTE` payloads; the mock WebSocket feed maps to
  * the `rate` source; the CSV reader is the CSV adapter verbatim.
  */
object Sources {

  /** Unified tick schema (financial_engine.py:186-194). */
  val tickSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("symbol", StringType),
    StructField("price", DoubleType),
    StructField("volume", LongType),
    StructField("ts_epoch", LongType),
    StructField("source", StringType)))

  /** Raw CSV schema — stringly typed, like the reference's in-memory
    * CSV rows before `float()`/`int()` casts (financial_engine.py:246-251).
    */
  val csvRawSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("symbol", StringType),
    StructField("price", StringType),
    StructField("volume", StringType),
    StructField("ts_epoch", StringType)))

  /** S4 CsvAdapter: header CSV, explicit schema (never inferSchema at
    * scale — a schema scan over 100 TB is a full extra pass), cast-on-
    * read projection (financial_engine.py:251).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    normalizeCsv(spark.read.option("header", "true").schema(csvRawSchema).csv(path))

  /** try_cast, not cast: under ANSI (Spark 4 default) a malformed
    * numeric would fail the job; the reference instead drops the
    * record (`float()` raising -> fetch returns None, :196-202), so
    * malformed -> null here and the cleaner filters it.
    */
  def normalizeCsv(raw: DataFrame): DataFrame =
    raw.select(
      col("id"),
      col("symbol"),
      expr("try_cast(price AS DOUBLE)").as("price"),
      expr("try_cast(volume AS BIGINT)").as("volume"),
      expr("try_cast(ts_epoch AS BIGINT)").as("ts_epoch"),
      lit("CSVMock").as("source"))

  /** S2 AlphaVantage-style: JSON records carrying the quote under
    * nested string-typed fields ("05. price"/"06. volume",
    * financial_engine.py:179-190); extraction + cast is one
    * projection. Reading with a permissive schema and extracting with
    * `get_json_object` keeps malformed records as nulls — the Spark
    * analog of the adapter returning None on a bad payload (:196-202);
    * a cleaner stage drops them (dead-letter in production).
    */
  def jsonQuotes(spark: SparkSession, path: String): DataFrame =
    normalizeJsonQuotes(spark.read
      .schema(StructType(Seq(
        StructField("id", StringType),
        StructField("symbol", StringType),
        StructField("quote", StringType),
        StructField("ts_epoch", LongType))))
      .json(path))

  def normalizeJsonQuotes(raw: DataFrame): DataFrame =
    raw.select(
      col("id"),
      col("symbol"),
      get_json_object(col("quote"), "$['05. price']").try_cast("double").as("price"),
      get_json_object(col("quote"), "$['06. volume']").try_cast("bigint").as("volume"),
      col("ts_epoch"),
      lit("AlphaVantage").as("source"))

  /** S3 mock-WebSocket feed: the `rate` streaming source plays the
    * MockWebSocketClient (synthetic high-frequency ticks,
    * financial_engine.py:222-223). The projection is pure so it is
    * unit-testable on a static frame with the same columns; price/
    * volume derive deterministically from the sequence value (the
    * reference uses random.uniform — nondeterminism is exactly what
    * the harness excludes, SURVEY §5).
    */
  def rateTicks(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    normalizeRate(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load())

  def normalizeRate(raw: DataFrame): DataFrame =
    raw.select(
      // Zero-padded id: downstream micro-batch ordering sorts ids
      // lexicographically (StreamingSma), so "ws_10" must not sort
      // before "ws_2" — 12 digits outlast any realistic sequence.
      format_string("ws_%012d", col("value")).as("id"),
      concat(lit("sym"), pmod(col("value"), lit(4))).as("symbol"),
      (lit(1450.0) + pmod(col("value") * 37L, lit(100)).cast("double")).as("price"),
      (lit(5000L) + pmod(col("value") * 101L, lit(15000))).as("volume"),
      unix_timestamp(col("timestamp")).as("ts_epoch"),
      lit("WebSocketMock").as("source"))

  /** S5 multiplexing: N sources, one pipeline (financial_engine.py:388-391). */
  def multiplex(sources: DataFrame*): DataFrame =
    sources.reduce(_ unionByName _)

  /** JSON-lines adapter for feeds that publish the unified schema
    * directly (one JSON object per line — the wire format most tick
    * archives and Kafka topics land as). Same discipline as [[csv]]:
    * explicit string-typed schema (no schema inference pass at
    * scale), try_cast-on-read so a malformed numeric becomes a null
    * for the cleaner instead of an ANSI job failure.
    */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    normalizeCsv(spark.read.schema(csvRawSchema).json(path))
      .withColumn("source", lit("JsonLines"))

  /** ORC adapter — the columnar format beside parquet that warehouse
    * exports actually arrive in; Spark bundles the reader, and the
    * cast-on-read projection is [[csv]]'s, so all three batch
    * adapters share one normalization seam.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    normalizeCsv(spark.read.schema(csvRawSchema).orc(path))
      .withColumn("source", lit("OrcExport"))

  /** Avro adapter — the Kafka wire format a migrating stream user
    * actually carries. This environment ships Avro CORE
    * (avro-1.12.1.jar) but not the `spark-avro` DataSource module, so
    * the adapter reads Avro OBJECT CONTAINER FILES with the public
    * `DataFileStream` API inside a distributed `binaryFiles` scan:
    * one task decodes one container file (the unsplittable-container
    * trade — sync-marker splitting is what spark-avro adds; at scale
    * you get parallelism from many files, which is how Kafka
    * connectors land them anyway). Field access is BY NAME with
    * missing-field and null tolerance, values surface as strings into
    * the SAME try_cast normalization seam as CSV/JSON-lines/ORC —
    * a malformed numeric becomes a null for the cleaner, never an
    * ANSI job failure.
    */
  def avro(spark: SparkSession, path: String): DataFrame = {
    import org.apache.avro.file.DataFileStream
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val fields = csvRawSchema.fieldNames
    val rows = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) =>
        val in = pds.open()
        try {
          val reader = new DataFileStream[GenericRecord](
            in, new GenericDatumReader[GenericRecord]())
          try {
            val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
            while (reader.hasNext) {
              val rec = reader.next()
              buf += org.apache.spark.sql.Row.fromSeq(fields.map { f =>
                if (rec.getSchema.getField(f) == null) null
                else Option(rec.get(f)).map(_.toString).orNull
              }.toSeq)
            }
            buf
          } finally reader.close()
        } finally in.close()
      }
    normalizeCsv(spark.createDataFrame(rows, csvRawSchema))
      .withColumn("source", lit("AvroExport"))
  }
}
