package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.operators.RefPipeline
import graft.sources.{PollSource, Sources}
import graft.streaming.StreamingSma

/** The incremental poll source (financial_engine.py:124-209, :367-377):
  * per-interval round-robin polling, None-on-error record drop, and
  * 2x-interval error backoff — driven end-to-end with a manual clock
  * and an injected failing fetcher.
  */
class PollSourceSpec extends SparkSuite {
  import spark.implicits._

  private def pollStream(sourceId: String, symbols: String, intervalMs: Long) =
    spark.readStream.format("graft.sources.PollSourceProvider")
      .option("sourceId", sourceId)
      .option("symbols", symbols)
      .option("intervalMs", intervalMs.toString)
      .load()

  test("polls round-robin per interval; a failed fetch drops the record and backs off 2x") {
    val clock = new AtomicLong(0L)
    PollSource.registerClock("t-backoff", () => clock.get())
    // attempt 1 fails (the API-limit/HTTP-error path, :150-152,:196-202)
    PollSource.registerFetcher("t-backoff", (sym, attempt) =>
      if (attempt == 1) None else PollSource.mockQuote(sym, attempt))

    val q = pollStream("t-backoff", "AAA,BBB", intervalMs = 100)
      .writeStream.format("memory").queryName("poll_backoff").start()
    def rows(): Seq[(String, String)] =
      try {
        q.processAllAvailable()
        spark.table("poll_backoff").select("id", "symbol").as[(String, String)]
          .collect().toSeq.sorted
      } finally ()

    // t=0: first poll fires immediately (:371) — attempt 0, symbol AAA
    assert(rows().map(_._2) == Seq("AAA"))
    // t=100: attempt 1 (BBB) FAILS -> nothing emitted
    clock.set(100)
    assert(rows().size == 1, "failed fetch must drop the record")
    // t=200: backoff means next attempt is due at 100 + 2*100 = 300
    clock.set(200)
    assert(rows().size == 1, "during backoff no poll may fire")
    clock.set(299)
    assert(rows().size == 1)
    // t=300: attempt 2 fires — round-robin CONTINUES at AAA (the
    // failed symbol is skipped, not retried: :159-160 advances per call)
    clock.set(300)
    val r3 = rows()
    assert(r3.map(_._2) == Seq("AAA", "AAA") && r3.map(_._1) ==
      Seq("av_000000000000", "av_000000000002"),
      s"attempt 1 must be a hole in the id sequence, got $r3")
    // t=400: normal cadence restored after the successful poll
    clock.set(400)
    assert(rows().map(_._2) == Seq("AAA", "AAA", "BBB"))
    q.stop()
  }

  test("checkpoint restart continues the id sequence; downtime polls are lost (at-most-once)") {
    val clock = new AtomicLong(0L)
    PollSource.registerClock("t-restart", () => clock.get())
    PollSource.registerFetcher("t-restart", (sym, a) => PollSource.mockQuote(sym, a))
    val ckpt = java.nio.file.Files.createTempDirectory("poll_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("poll_out").toString
    // file sink: supports checkpoint recovery (the memory sink does not)
    // and makes the no-duplicates claim checkable across both runs
    def start() = pollStream("t-restart", "AAA", intervalMs = 100)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def ids(): Seq[String] =
      try spark.read.parquet(out).select("id").collect().map(_.getString(0)).toSeq.sorted
      catch { case _: org.apache.spark.sql.AnalysisException => Nil } // sink not yet written
    // processAllAvailable can race the clock bump (the engine may mark
    // no-new-data just before it) — poll the sink with a deadline
    def awaitRows(n: Int): Seq[String] = {
      val deadline = System.currentTimeMillis() + 30000
      var cur = ids()
      while (cur.length < n && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); cur = ids()
      }
      cur
    }

    val q1 = start()
    // wait for attempt 0 BEFORE advancing the clock: the first poll
    // fires at whatever logical time the query observes at startup,
    // and advancing early would push attempt 1's due time out too
    assert(awaitRows(1).take(1) == Seq("av_000000000000"))
    clock.set(clock.get() + 100) // attempt 1 comes due
    assert(awaitRows(2) == Seq("av_000000000000", "av_000000000001"))
    q1.stop()
    // "downtime": the clock moves three intervals with the query down
    clock.set(clock.get() + 300)
    val q2 = start()
    // the resumed poll loop schedules its next attempt one interval
    // after whatever it observes at startup — keep advancing the clock
    // until the post-restart poll lands
    var advanced = 0
    while (ids().length < 3 && advanced < 20) {
      Thread.sleep(200)
      clock.set(clock.get() + 100)
      advanced += 1
    }
    val all = awaitRows(3)
    q2.stop()
    assert(all.length >= 3, s"restarted query must poll again: $all")
    assert(all.distinct == all, s"restart must not duplicate attempts: $all")
    assert(all.take(2) == Seq("av_000000000000", "av_000000000001"))
    val resumed = all.drop(2)
    assert(resumed.nonEmpty && resumed.forall(_ >= "av_000000000002"),
      s"restart must continue the id sequence above the committed offset: $all")
  }

  test("two poll streams multiplex into ONE streaming query (S5 on real streams)") {
    val clock = new AtomicLong(0L)
    for (id <- Seq("t-mux-a", "t-mux-b")) {
      PollSource.registerClock(id, () => clock.get())
      PollSource.registerFetcher(id, (sym, a) => PollSource.mockQuote(sym, a))
    }
    val merged = Sources.multiplex(
      Sources.normalizeJsonQuotes(pollStream("t-mux-a", "AAA", intervalMs = 100)),
      Sources.normalizeJsonQuotes(pollStream("t-mux-b", "BBB", intervalMs = 100)))
    val q = merged.writeStream.format("memory").queryName("poll_mux")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def srcs() = spark.table("poll_mux").select("symbol", "source", "price")
        .collect().map(r => (r.getString(0), r.getString(1)))
      while (srcs().map(_._1).distinct.length < 2 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val rows = srcs()
      assert(rows.map(_._1).distinct.sorted.toSeq == Seq("AAA", "BBB"),
        s"one query must carry both sources: ${rows.toSeq}")
      assert(rows.forall(_._2 == "AlphaVantage"), "normalization applied per source")
    } finally q.stop()
  }

  test("poll -> normalize -> clean -> SMA -> alerts end-to-end with an injected failure") {
    val n = 3
    val threshold = 1005.0 // first warm window's SMA (~1001.7) stays under it
    val clock = new AtomicLong(0L)
    PollSource.registerClock("t-e2e", () => clock.get())
    // Rising prices 995, 1000, 1005, ... cross the alert threshold as
    // the SMA warms up; attempt 2 fails (and must NOT contribute a
    // price to any window); attempt 5 is malformed JSON (extraction
    // yields null -> cleaner drops it, the dead-letter path).
    PollSource.registerFetcher("t-e2e", (_, attempt) =>
      if (attempt == 2) None
      else if (attempt == 5) Some("""{"no price here": true}""")
      else Some(s"""{"05. price": "${995 + 5 * attempt}", "06. volume": "10"}"""))

    val ticks = RefPipeline.clean(
        Sources.normalizeJsonQuotes(pollStream("t-e2e", "IBM", intervalMs = 10)))
      .select(col("id"), col("symbol"), col("price"))
      .as[StreamingSma.Tick]
    val sma = StreamingSma.withMovingAverage(ticks, n)
    val q = sma.writeStream.format("memory").queryName("poll_e2e")
      .outputMode("append").start()

    // 9 attempts: due times 0,10,20,(fail->+20),40,50,(malformed)60,70,80,90
    for (t <- 0L to 90L by 10L) { clock.set(t); q.processAllAvailable() }
    val out = spark.table("poll_e2e")
      .as[StreamingSma.SmaOut].collect().sortBy(_.id)
    q.stop()

    // successes: attempts 0,1,3,4,6,7,8 (2 failed, 5 malformed-dropped)
    assert(out.map(_.price).toSeq ==
      Seq(0, 1, 3, 4, 6, 7, 8).map(a => 995.0 + 5 * a),
      "failed and malformed polls must contribute nothing")
    // warm-up gate: first n-1 ticks emit no SMA
    assert(out.take(n - 1).forall(_.moving_average.isEmpty))
    val withSma = out.drop(n - 1)
    assert(withSma.forall(_.moving_average.nonEmpty))
    // windows slide over DELIVERED prices only: third window is
    // (1000, 1010, 1015) — a 1005 from the failed attempt would shift it
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val smaVals = withSma.map(_.moving_average.get).toSeq
    assert(smaVals.head == round6((995.0 + 1000.0 + 1010.0) / 3))
    assert(smaVals(1) == round6((1000.0 + 1010.0 + 1015.0) / 3))
    // alerts (strict >) fire exactly where the SMA crosses the threshold
    val alerts = withSma.filter(_.moving_average.get > threshold)
    assert(alerts.nonEmpty && alerts.forall(_.moving_average.get > threshold))
    assert(withSma.map(_.moving_average.get).exists(_ <= threshold),
      "test must cover both sides of the threshold")
  }

  /** Loopback stub of the GLOBAL_QUOTE endpoint: every reference
    * response shape behind one handler, selected by symbol
    * (financial_engine.py:166-185 — success, API-limit Note, empty
    * quote, missing price/volume, HTTP 500).
    */
  private def withStubServer[A](f: (String, java.util.concurrent.atomic.AtomicInteger) => A): A = {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/query", (exchange: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      val query = Option(exchange.getRequestURI.getQuery).getOrElse("")
      val symbol = query.split("&").collectFirst {
        case kv if kv.startsWith("symbol=") => kv.stripPrefix("symbol=")
      }.getOrElse("")
      val (status, body) = symbol match {
        case "NOTE"  => (200, """{"Note": "API call frequency is 5 calls per minute"}""")
        case "EMPTY" => (200, """{"Global Quote": {}}""")
        case "NOPX"  => (200, """{"Global Quote": {"01. symbol": "NOPX"}}""")
        case "BOOM"  => (500, "internal error")
        case "JUNK"  => (200, "<html>not json</html>")
        case s => (200,
          s"""{"Global Quote": {"01. symbol": "$s", "05. price": "123.45", "06. volume": "678"}}""")
      }
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(status, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}" +
          "/query?function=GLOBAL_QUOTE&symbol={symbol}&apikey={apikey}", hits)
    finally server.stop(0)
  }

  test("HttpQuoteFetcher drives the real HTTP stack: every reference drop path returns None") {
    withStubServer { (template, hits) =>
      val fetcher = new graft.sources.HttpQuoteFetcher(template, apiKey = "k")
      // success: the quote object's JSON comes back for the normalizer
      val ok = fetcher("IBM", 0)
      assert(ok.exists(_.contains(""""05. price":"123.45"""")), s"got $ok")
      assert(ok.exists(_.contains(""""06. volume":"678"""")), s"got $ok")
      // the reference's None paths (:171-185, :196-202)
      assert(fetcher("NOTE", 1).isEmpty, "API-limit Note must drop")
      assert(fetcher("EMPTY", 2).isEmpty, "empty Global Quote must drop")
      assert(fetcher("NOPX", 3).isEmpty, "missing price/volume must drop")
      assert(fetcher("BOOM", 4).isEmpty, "HTTP 5xx must drop")
      assert(fetcher("JUNK", 5).isEmpty, "unparsable body must drop")
      val served = hits.get()
      // placeholder API key: no request may even be sent (:150-152)
      val unconfigured = new graft.sources.HttpQuoteFetcher(template)
      assert(unconfigured("IBM", 6).isEmpty)
      assert(hits.get() == served, "placeholder key must not hit the endpoint")
      // unreachable endpoint (connect refused) → None, not an exception
      val dead = new graft.sources.HttpQuoteFetcher(
        "http://127.0.0.1:1/query?symbol={symbol}&apikey={apikey}", apiKey = "k",
        timeout = java.time.Duration.ofMillis(200))
      assert(dead("IBM", 7).isEmpty)
    }
  }

  test("endpoint option wires the HTTP fetcher into the poll stream end-to-end") {
    withStubServer { (template, _) =>
      val clock = new AtomicLong(0L)
      PollSource.registerClock("t-http", () => clock.get())
      // NO registered fetcher: the endpoint option must supply it
      val stream = spark.readStream.format("graft.sources.PollSourceProvider")
        .option("sourceId", "t-http")
        .option("symbols", "IBM,NOTE") // round-robin hits the drop path too
        .option("intervalMs", "100")
        .option("endpoint", template)
        .option("apiKey", "test-key")
        .load()
      val q = Sources.normalizeJsonQuotes(stream)
        .writeStream.format("memory").queryName("poll_http").start()
      def rows() = {
        q.processAllAvailable()
        spark.table("poll_http").select("id", "symbol", "price", "volume")
          .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
          .toSeq.sortBy(_._1)
      }
      try {
        // t=0: attempt 0 polls IBM over real HTTP and normalizes
        assert(rows() == Seq(("av_000000000000", "IBM", 123.45, 678L)))
        // t=100: attempt 1 (NOTE) returns the API-limit body -> dropped,
        // 2x backoff means attempt 2 is due at 300, not 200
        clock.set(100); assert(rows().size == 1)
        clock.set(200); assert(rows().size == 1, "backoff after the Note drop")
        clock.set(300)
        val r = rows()
        assert(r.map(_._2) == Seq("IBM", "IBM") &&
               r.map(_._1) == Seq("av_000000000000", "av_000000000002"),
          s"round-robin must continue past the dropped symbol: $r")
      } finally q.stop()
    }
  }
}
