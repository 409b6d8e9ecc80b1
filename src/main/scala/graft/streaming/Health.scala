package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Container health endpoint — parity with the reference's `HealthServer`
  * (`HealthServer.java:10-28`: HTTP 200 "OK" on `/health`). Uses the JDK's
  * built-in server; one daemon thread, no dependencies.
  */
final class Health(port: Int = 8080) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/health", (ex: HttpExchange) => {
    val body = "OK".getBytes("UTF-8")
    ex.sendResponseHeaders(200, body.length)
    try ex.getResponseBody.write(body) finally ex.close()
  })
  server.setExecutor(null)

  def start(): this.type = { server.start(); this }
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
