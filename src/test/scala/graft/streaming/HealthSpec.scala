package graft.streaming

import java.net.{HttpURLConnection, URL}

import org.scalatest.funsuite.AnyFunSuite

class HealthSpec extends AnyFunSuite {
  test("health endpoint answers 200 OK") {
    val h = new Health(0).start() // ephemeral port
    try {
      val conn = new URL(s"http://127.0.0.1:${h.boundPort}/health")
        .openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(body == "OK")
    } finally h.stop()
  }
}
