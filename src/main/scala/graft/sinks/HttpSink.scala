package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** HTTP sink — the reference's `http` sink (src/sinks/http/config.rs:
  * uri, method, request.headers, payload_prefix/suffix, batch
  * settings; events encoded by the shared codec set and joined with
  * newline framing into one request body per batch).
  *
  * Distributed: every PARTITION posts its own batches, so sink
  * throughput scales with executors; a non-2xx response fails the
  * task (Spark's retry is the reference's retry layer analog), making
  * delivery at-least-once — the same contract as the reference
  * without end-to-end acknowledgements.
  */
object HttpSink {

  final case class Config(uri: String, method: String = "post",
                          headers: Seq[(String, String)] = Nil,
                          maxEvents: Int = 1000,
                          payloadPrefix: String = "", payloadSuffix: String = "")

  /** Post the single string column of `lines`, `maxEvents` lines per
    * request, newline-joined. Returns rows posted.
    */
  def writeLines(lines: DataFrame, cfg: Config): Long = {
    val acc = lines.sparkSession.sparkContext.longAccumulator("http_sink_rows")
    lines.select(col(lines.columns.head).cast("string")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val client = java.net.http.HttpClient.newBuilder()
          .connectTimeout(java.time.Duration.ofSeconds(10)).build()
        it.map(_.getString(0)).filter(_ != null).grouped(cfg.maxEvents).foreach { batch =>
          val body = cfg.payloadPrefix +
            batch.mkString("\n") + "\n" + cfg.payloadSuffix
          val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(cfg.uri))
            .timeout(java.time.Duration.ofSeconds(30))
            .method(cfg.method.toUpperCase,
              java.net.http.HttpRequest.BodyPublishers.ofString(body, java.nio.charset.StandardCharsets.UTF_8))
          cfg.headers.foreach { case (k, v) => b.header(k, v) }
          val resp = client.send(b.build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() < 200 || resp.statusCode() >= 300)
            throw new java.io.IOException(
              s"http sink: ${cfg.uri} returned ${resp.statusCode()}: " +
                resp.body().take(200))
          acc.add(batch.length.toLong)
        }
    }
    acc.value
  }
}
