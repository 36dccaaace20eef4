package graft.cdc

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** Scripted in-process AMQP 0-9-1 broker (test double): accepts ANY
  * number of connections — Spark publishes from one producer per task,
  * so a micro-batch with N partitions opens N sockets — performs the
  * full handshake on each, serves Queue.Declare, and records every
  * Basic.Publish delivery. A connection dropped without Connection.Close
  * (a completed Spark task abandoning its producer) is tolerated:
  * everything published before the drop is retained. */
private[cdc] class FakeAmqpBroker(tuneFrameMax: Long = 131072L) {
  import AmqpWire._

  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort
  private val buf = ArrayBuffer.empty[(String, String)] // (routingKey, body)
  @volatile var auth: (String, String) = ("", "")
  @volatile var vhost: String = ""
  @volatile var declared: String = ""
  @volatile var error: Throwable = _
  @volatile private var closed = false

  private val acceptor = new Thread(() => acceptLoop())
  acceptor.setDaemon(true)
  acceptor.start()

  def published: Seq[(String, String)] = buf.synchronized(buf.toList)

  /** Poll until `n` messages arrived (publish frames are read
    * asynchronously from the socket after the task returns). */
  def awaitPublished(n: Int, timeoutMs: Long = 10000): Seq[(String, String)] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (published.size < n && System.nanoTime() < deadline) Thread.sleep(10)
    val got = published
    require(got.size >= n, s"timed out: ${got.size}/$n messages")
    got
  }

  def stop(): Unit = { closed = true; server.close() }

  private def acceptLoop(): Unit =
    try while (!closed) {
      val sock = server.accept()
      val t = new Thread(() => serve(sock))
      t.setDaemon(true)
      t.start()
    } catch { case _: SocketException => () /* stop() */ }

  private def serve(sock: Socket): Unit = try {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    val hdr = new Array[Byte](8)
    in.readFully(hdr)
    require(hdr.sameElements(ProtocolHeader), "bad protocol header")
    writeFrame(out, FrameMethod, 0, method(ClassConnection, 10)(
      _.u8(0).u8(9).emptyTable().longstr("PLAIN").longstr("en_US")))
    val startOk = new Reader(readFrame(in).payload)
    require((startOk.u16(), startOk.u16()) == ((ClassConnection, 11)))
    startOk.skipTable()
    require(startOk.shortstr() == "PLAIN")
    val resp = new String(startOk.longstr(), UTF_8).split("\u0000")
    auth = (resp(1), resp(2)) // [authzid(empty), user, pass]
    writeFrame(out, FrameMethod, 0, method(ClassConnection, 30)(
      _.u16(2047).u32(tuneFrameMax).u16(0)))
    readFrame(in) // TuneOk
    val open = new Reader(readFrame(in).payload)
    require((open.u16(), open.u16()) == ((ClassConnection, 40)))
    vhost = open.shortstr()
    writeFrame(out, FrameMethod, 0, method(ClassConnection, 41)(_.shortstr("")))
    val chOpen = readFrame(in)
    require(chOpen.channel == 1)
    writeFrame(out, FrameMethod, 1, method(ClassChannel, 11)(_.longstr("")))

    var running = true
    while (running) {
      val f = readFrame(in)
      val r = new Reader(f.payload)
      (r.u16(), r.u16()) match {
        case (ClassQueue, 10) =>
          r.u16() // ticket
          declared = r.shortstr()
          writeFrame(out, FrameMethod, 1, method(ClassQueue, 11)(
            _.shortstr(declared).u32(0L).u32(0L)))
        case (ClassBasic, 40) =>
          r.u16() // ticket
          r.shortstr() // exchange ("")
          val rk = r.shortstr()
          val hdrFrame = readFrame(in)
          require(hdrFrame.tpe == FrameHeader, "expected content header")
          val h = new Reader(hdrFrame.payload)
          require(h.u16() == ClassBasic); h.u16() // weight
          var remaining = h.u64()
          val body = new java.io.ByteArrayOutputStream()
          while (remaining > 0) {
            val bf = readFrame(in)
            require(bf.tpe == FrameBody, "expected body frame")
            // a real broker rejects frames over the negotiated max —
            // enforce it so the client's body splitting is actually
            // verified, not just tolerated
            require(tuneFrameMax <= 8 || bf.payload.length + 8 <= tuneFrameMax,
              s"body frame ${bf.payload.length + 8}B exceeds frame-max $tuneFrameMax")
            body.write(bf.payload)
            remaining -= bf.payload.length
          }
          buf.synchronized { buf += ((rk, new String(body.toByteArray, UTF_8))); () }
        case (ClassConnection, 50) =>
          writeFrame(out, FrameMethod, 0, method(ClassConnection, 51)(w => w))
          running = false
        case (c, m) => throw new AssertionError(s"unexpected method $c.$m")
      }
    }
    sock.close()
  } catch {
    case _: EOFException | _: SocketException => () // task dropped its producer
    case t: Throwable => error = t
  }
}
