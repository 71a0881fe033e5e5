package graft.sources

/** Real transports for the two side-effect connectors, K3
  * ([[Sinks.postJsonBatches]]) and S8 ([[OcrConnector.ocrFiles]]) —
  * `java.net.http` (JDK built-in, no dependency), shaped exactly like
  * the functions those operators take, so a deployment writes
  * `Sinks.postJsonBatches(df, url, HttpTransport.postJson())` instead
  * of rolling its own. Until round 10 the transports were *pluggable
  * but unshipped*; these close the S8/K3 "spec-gated by design"
  * footnote — SinksSpec drives both through a real 127.0.0.1 socket.
  *
  * Retry taxonomy (the reference scripts run manual re-drives; a
  * distributed sink must decide per batch):
  *  - 5xx and connect/IO errors are TRANSIENT → retried up to `retries`
  *    times with doubling backoff (server hiccup, LB drain, socket
  *    reset — the usual fleet weather at 1000-executor fan-out);
  *  - 4xx is CONTRACTUAL → returned immediately, never retried (the
  *    payload won't get more acceptable by resending; it belongs in
  *    the caller's reject channel, main.py:69-76's error branch);
  *  - exhausted retries report status 599 (no real response to pass).
  *
  * One `HttpClient` per JVM (lazy module field): executors reuse
  * connections across batches, and the returned lambdas capture no
  * state — they serialize as references to this module. */
object HttpTransport {

  /** Synthetic status when every attempt threw (no HTTP response). */
  val ExhaustedStatus = 599

  private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .build()

  private def isTransient(status: Int): Boolean = status >= 500

  /** Run `send` with the retry taxonomy above; returns the last
    * (status, body). `backoffMs` doubles per attempt. */
  private def withRetries(retries: Int, backoffMs: Long)
                         (send: () => (Int, String)): (Int, String) = {
    var attempt = 0
    var last: (Int, String) = (ExhaustedStatus, "")
    while (attempt <= retries) {
      val r =
        try Some(send())
        catch { case _: java.io.IOException | _: InterruptedException => None }
      r match {
        case Some((status, body)) if !isTransient(status) => return (status, body)
        case Some(other)                                  => last = other
        case None                                         => last = (ExhaustedStatus, "")
      }
      attempt += 1
      if (attempt <= retries && backoffMs > 0)
        Thread.sleep(backoffMs << math.min(attempt - 1, 10))
    }
    last
  }

  /** K3 transport: POST a JSON-array body, return the status.
    * Plug into [[Sinks.postJsonBatches]]. */
  def postJson(retries: Int = 2, timeoutMs: Long = 30000,
               backoffMs: Long = 500,
               headers: Map[String, String] = Map.empty): (String, String) => Int =
    (url, body) => withRetries(retries, backoffMs) { () =>
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body, java.nio.charset.StandardCharsets.UTF_8))
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }._1

  /** S8 transport: multipart/form-data POST of an [[OcrConnector.OcrRequest]]
    * (fields + file under a random boundary, bearer header from the
    * request), returning (status, body). Plug into
    * [[OcrConnector.ocrFiles]]. */
  def postMultipart(retries: Int = 2, timeoutMs: Long = 120000,
                    backoffMs: Long = 500): OcrConnector.OcrRequest => (Int, String) =
    req => withRetries(retries, backoffMs) { () =>
      val boundary = "graft-" + java.util.UUID.randomUUID().toString
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(req.url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", s"multipart/form-data; boundary=$boundary")
        .POST(java.net.http.HttpRequest.BodyPublishers
          .ofByteArray(req.multipartBody(boundary)))
      req.headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
}
