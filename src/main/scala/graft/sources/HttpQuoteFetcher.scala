package graft.sources

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper

/** Default REST fetcher for [[PollSource]]: a `java.net.http` GET
  * against a GLOBAL_QUOTE-style endpoint, reproducing the reference
  * adapter's fetch semantics (financial_engine.py:149-205
  * `AlphaVantageAdapter.fetch_data`):
  *
  *  - unconfigured API key → no fetch at all (:150-152 skips with the
  *    placeholder key); only enforced when the template actually
  *    interpolates `{apikey}`;
  *  - HTTP error status, timeout, connect failure, unparsable JSON →
  *    `None` (:196-202 catches and drops — PollSource then backs off);
  *  - missing or empty `"Global Quote"` object → `None`, which covers
  *    the API-limit `"Note"` response (:171-176);
  *  - missing `"05. price"` / `"06. volume"` inside the quote →
  *    `None` (:181-185);
  *  - success returns the quote object's JSON, the raw shape
  *    [[Sources.normalizeJsonQuotes]] extracts downstream.
  *
  * The fetcher runs on the DRIVER inside `latestOffset()` (see
  * [[PollSource]] class doc) — one synchronous trickle-rate request
  * per poll interval, so a blocking client is the honest analog of the
  * reference's awaited session.get. Wire it per source either through
  * the registry (`PollSource.registerFetcher(id, new
  * HttpQuoteFetcher(...))`) or declaratively via the reader options
  * `endpoint` / `apiKey` / `timeoutMs` (see [[PollTable]]).
  */
final class HttpQuoteFetcher(
    endpointTemplate: String,
    apiKey: String = HttpQuoteFetcher.PlaceholderKey,
    timeout: Duration = Duration.ofSeconds(10),
    client: HttpClient = HttpQuoteFetcher.defaultClient)
    extends ((String, Long) => Option[String]) {

  private val mapper = new ObjectMapper

  override def apply(symbol: String, attempt: Long): Option[String] = {
    // The reference refuses to fetch with the placeholder key rather
    // than burn quota on guaranteed 401s (:150-152).
    if (endpointTemplate.contains("{apikey}") &&
        apiKey == HttpQuoteFetcher.PlaceholderKey) return None
    val url = endpointTemplate
      .replace("{symbol}", URLEncoder.encode(symbol, StandardCharsets.UTF_8))
      .replace("{apikey}", URLEncoder.encode(apiKey, StandardCharsets.UTF_8))
    try {
      val request = HttpRequest.newBuilder(URI.create(url))
        .timeout(timeout).GET().build()
      val response = client.send(request, HttpResponse.BodyHandlers.ofString())
      if (response.statusCode() / 100 != 2) return None
      val root = mapper.readTree(response.body())
      val quote = root.get("Global Quote")
      if (quote == null || !quote.isObject || quote.isEmpty) None
      else if (quote.get("05. price") == null || quote.get("06. volume") == null) None
      else Some(quote.toString)
    } catch { case NonFatal(_) => None }
  }
}

object HttpQuoteFetcher {
  /** The reference's unset-key sentinel (financial_engine.py:135). */
  val PlaceholderKey = "YOUR_ALPHA_VANTAGE_API_KEY"

  /** The reference's endpoint template (its config default). */
  val DefaultEndpoint: String =
    "https://www.alphavantage.co/query?function=GLOBAL_QUOTE&symbol={symbol}&apikey={apikey}"

  private lazy val defaultClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
}
