package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** HTTP health endpoint (`lib/kpipe-consumer/.../health/HttpHealthServer
  * .java:18-75` analog): `GET /health` → 200 when the query is active
  * and the breaker isn't OPEN, 503 otherwise; `GET /metrics` → the
  * snapshot counters as JSON. Port 0 = ephemeral (tests).
  */
final class HealthServer(queryHandle: Handle, port: Int = 0) extends AutoCloseable {

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)

  server.createContext("/health", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val healthy = queryHandle.isHealthy
      val body =
        s"""{"healthy":$healthy,"active":${queryHandle.query.isActive}}"""
          .getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(if (healthy) 200 else 503, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    }
  })

  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val body = queryHandle.metrics.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
        .getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    }
  })

  server.start()

  def boundPort: Int = server.getAddress.getPort
  override def close(): Unit = server.stop(0)
}
