package graft.api

import java.io.PrintWriter
import java.net.{InetAddress, ServerSocket}
import java.util.concurrent.CountDownLatch

import graft.SparkSpec

/** Runtime verification of `socketTextStream` (reference
  * StreamExecutionEnvironment.java:1190-1274) against a LOOPBACK
  * server — no egress involved, closing the one §2.1 row that was
  * previously compile-level only (r14 verdict, Next-round #5).
  *
  * Semantics delta vs the reference, pinned here: Flink's
  * socketTextStream(maxRetry) reconnects after a server-side close;
  * Spark's socket source treats EOF as end-of-data — the query stays
  * healthy and simply stops producing (so "reconnect" is a RESTART
  * of the query, the streaming-engine-level retry). Both halves are
  * asserted: delivery while connected, and a clean (non-failing)
  * query after the server closes the connection.
  */
class SocketSpec extends SparkSpec {

  test("socketTextStream delivers loopback lines; server close does not fail the query") {
    val server = new ServerSocket(0, 1, InetAddress.getByName("127.0.0.1"))
    val port = server.getLocalPort
    val connected = new CountDownLatch(1)
    @volatile var writeError: Option[Throwable] = None
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        connected.countDown()
        val out = new PrintWriter(sock.getOutputStream, true)
        Seq("alpha", "beta", "gamma").foreach(out.println)
        out.flush()
        // hold the connection briefly so the source's reader drains
        // the lines before EOF, then close server-side
        Thread.sleep(500)
        sock.close()
      } catch { case t: Throwable => writeError = Some(t) }
    }, "socket-spec-feeder")
    feeder.setDaemon(true)
    feeder.start()

    val env = new StreamEnv(spark)
    val qname = "graft_socket_spec"
    spark.catalog.dropTempView(qname)
    val query = env.socketTextStream("127.0.0.1", port).ds
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      assert(connected.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "socket source never connected to the loopback server")
      // poll: socket delivery is asynchronous to micro-batch planning
      val deadline = System.nanoTime() + 30L * 1000000000L
      def rows(): Seq[String] = {
        query.processAllAvailable()
        spark.table(qname).collect().map(_.getString(0)).toSeq
      }
      var got = rows()
      while (got.size < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        got = rows()
      }
      assert(got.sorted == Seq("alpha", "beta", "gamma"),
        s"expected the 3 fed lines, got $got")
      feeder.join(10000)
      assert(writeError.isEmpty, s"feeder failed: $writeError")
      // server has closed: the source sees EOF as end-of-data — the
      // query must remain healthy, not fail
      query.processAllAvailable()
      assert(query.exception.isEmpty,
        s"query failed after server close: ${query.exception}")
      assert(query.isActive, "query died after server close")
    } finally {
      query.stop()
      server.close()
    }
  }
}
