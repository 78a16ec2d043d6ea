package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.CompletionStage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.Framing

/** The reference's `websocket` source (src/sources/websocket/): CONNECT
  * to a websocket endpoint as a client (unlike the push listeners —
  * this is the reference's own direction) and emit every received Text
  * or Binary message through the configured framing (each complete
  * websocket message is its own byte stream, the UDP-datagram stance).
  * An optional `initial_message` is sent on connect (config.rs:109) —
  * the subscribe-after-connect idiom. Standard ping control frames are
  * answered by the JDK client automatically; the custom
  * application-level ping/pong options are liveness knobs accepted
  * unused (same stance as scrape intervals).
  */
final class WsIngest(spark: SparkSession, uri: String,
                     initialMessage: Option[String],
                     framerB: () => Framing.Framer) extends IngestListener {

  import spark.implicits._

  private val stream = MemoryStream[(String, String)](spark)
  private val pushLock = new Object
  private def pushFrames(frames: Seq[Array[Byte]]): Unit =
    if (frames.nonEmpty) pushLock.synchronized {
      stream.addData(frames.map(f => (uri, new String(f, "UTF-8"))))
    }

  private val listener = new WebSocket.Listener {
    private val textBuf = new StringBuilder
    private val binBuf = new java.io.ByteArrayOutputStream()
    override def onText(ws: WebSocket, data: CharSequence,
                        last: Boolean): CompletionStage[_] = {
      textBuf.append(data)
      if (last) {
        val msg = textBuf.toString(); textBuf.clear()
        pushFrames(framerB().frameAll(msg.getBytes("UTF-8")))
      }
      ws.request(1); null
    }
    override def onBinary(ws: WebSocket, data: java.nio.ByteBuffer,
                          last: Boolean): CompletionStage[_] = {
      val arr = new Array[Byte](data.remaining()); data.get(arr)
      binBuf.write(arr)
      if (last) {
        val msg = binBuf.toByteArray; binBuf.reset()
        pushFrames(framerB().frameAll(msg))
      }
      ws.request(1); null
    }
  }

  private val ws: WebSocket = HttpClient.newHttpClient()
    .newWebSocketBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .buildAsync(URI.create(uri), listener)
    .join()
  initialMessage.foreach(m => ws.sendText(m, true).join())

  /** The connected endpoint's port (a client has no bound port). */
  def boundPort: Int = URI.create(uri).getPort

  /** Raw feed: (endpoint uri, message). */
  def df: DataFrame = stream.toDF().toDF("endpoint", "message")

  def close(): Unit = ws.abort()
}
