package graft.cdc

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal AMQP 0-9-1 wire codec — the frame grammar of the PUBLIC
  * protocol spec (amqp0-9-1, §2.3 framing + §4 the connection/channel/
  * queue/basic method classes), shared by the client and the test
  * broker so both sides are exercised against golden bytes rather than
  * a mirrored misunderstanding.
  *
  * Frame layout: type(1) channel(2) size(4) payload(size) end(0xCE).
  * Method payload: class-id(2) method-id(2) args. Strings are shortstr
  * (len1+bytes) / longstr (len4+bytes); field tables are length-
  * prefixed blobs (we only ever send the empty table). */
private[cdc] object AmqpWire {
  val FrameMethod = 1; val FrameHeader = 2; val FrameBody = 3
  val FrameHeartbeat = 8; val FrameEnd = 0xCE
  val ClassConnection = 10; val ClassChannel = 20
  val ClassQueue = 50; val ClassBasic = 60
  val ProtocolHeader: Array[Byte] =
    Array('A', 'M', 'Q', 'P', 0, 0, 9, 1).map(_.toByte)

  final case class Frame(tpe: Int, channel: Int, payload: Array[Byte])

  final class Writer {
    private val bos = new java.io.ByteArrayOutputStream()
    private val out = new DataOutputStream(bos)
    def u8(v: Int): Writer = { out.writeByte(v); this }
    def u16(v: Int): Writer = { out.writeShort(v); this }
    def u32(v: Long): Writer = { out.writeInt(v.toInt); this }
    def u64(v: Long): Writer = { out.writeLong(v); this }
    def shortstr(s: String): Writer = {
      val b = s.getBytes(UTF_8)
      require(b.length < 256, s"shortstr too long: ${b.length}")
      out.writeByte(b.length); out.write(b); this
    }
    def longstr(b: Array[Byte]): Writer = { out.writeInt(b.length); out.write(b); this }
    def longstr(s: String): Writer = longstr(s.getBytes(UTF_8))
    def emptyTable(): Writer = { out.writeInt(0); this }
    def bytes: Array[Byte] = { out.flush(); bos.toByteArray }
  }

  final class Reader(payload: Array[Byte]) {
    private val in = new DataInputStream(new java.io.ByteArrayInputStream(payload))
    def u8(): Int = in.readUnsignedByte()
    def u16(): Int = in.readUnsignedShort()
    def u32(): Long = in.readInt().toLong & 0xffffffffL
    def u64(): Long = in.readLong()
    def shortstr(): String = {
      val n = in.readUnsignedByte(); val b = new Array[Byte](n)
      in.readFully(b); new String(b, UTF_8)
    }
    def longstr(): Array[Byte] = {
      val n = in.readInt(); val b = new Array[Byte](n)
      in.readFully(b); b
    }
    def skipTable(): Unit = { val n = in.readInt(); in.skipBytes(n); () }
  }

  def writeFrame(out: DataOutputStream, tpe: Int, channel: Int,
      payload: Array[Byte]): Unit = {
    out.writeByte(tpe); out.writeShort(channel); out.writeInt(payload.length)
    out.write(payload); out.writeByte(FrameEnd); out.flush()
  }

  /** Read one frame, transparently skipping heartbeats. */
  def readFrame(in: DataInputStream): Frame = {
    while (true) {
      val tpe = in.readUnsignedByte()
      val ch = in.readUnsignedShort()
      val size = in.readInt()
      val payload = new Array[Byte](size)
      in.readFully(payload)
      val end = in.readUnsignedByte()
      require(end == FrameEnd, f"bad frame end 0x$end%02x")
      if (tpe != FrameHeartbeat) return Frame(tpe, ch, payload)
    }
    throw new EOFException("unreachable")
  }

  def method(classId: Int, methodId: Int)(args: Writer => Writer): Array[Byte] =
    args(new Writer().u16(classId).u16(methodId)).bytes

  /** Method frame payload for Basic.Publish to the default exchange. */
  def basicPublish(routingKey: String): Array[Byte] =
    method(ClassBasic, 40)(_.u16(0).shortstr("").shortstr(routingKey).u8(0))

  /** Content HEADER payload: class 60, weight 0, body size, and the
    * delivery-mode=2 (persistent) property — flag bit 12 per §4.2.6.1's
    * property-flags ordering. */
  def contentHeader(bodySize: Long): Array[Byte] =
    new Writer().u16(ClassBasic).u16(0).u64(bodySize).u16(1 << 12).u8(2).bytes
}

/** Minimal AMQP 0-9-1 PUBLISHER — the real network half of the
  * reference's RabbitMQ queue (reference src/queues.rs:17-65, which
  * delegates to the lapin crate): protocol handshake (Start/StartOk
  * with PLAIN auth → Tune/TuneOk → Open/OpenOk), one channel, durable
  * queue declare, Basic.Publish with persistent delivery — written
  * directly on the public frame grammar so the offline build carries no
  * broker dependency. Tested end-to-end against an in-process scripted
  * broker (AmqpQueueSpec); pointed at a real RabbitMQ it speaks the
  * same bytes.
  *
  * Deliberately publisher-only (no consume/ack machinery): the
  * reference never consumes. Not thread-safe — one client per task,
  * which is also the lapin usage shape in the reference. */
final class AmqpClient(host: String, port: Int, user: String = "guest",
    pass: String = "guest", vhost: String = "/") {
  import AmqpWire._

  private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: DataOutputStream = _
  // negotiated in connect(); 0 = unlimited (the spec's Tune sentinel)
  private var frameMaxBytes: Long = 0L

  private def expectMethod(f: Frame, classId: Int, methodId: Int): Reader = {
    require(f.tpe == FrameMethod, s"expected method frame, got type ${f.tpe}")
    val r = new Reader(f.payload)
    val (c, m) = (r.u16(), r.u16())
    require(c == classId && m == methodId,
      s"expected method $classId.$methodId, got $c.$m")
    r
  }

  def connect(): Unit = {
    socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    in = new DataInputStream(socket.getInputStream)
    out = new DataOutputStream(socket.getOutputStream)
    out.write(ProtocolHeader); out.flush()
    expectMethod(readFrame(in), ClassConnection, 10) // Start; args ignored
    writeFrame(out, FrameMethod, 0, method(ClassConnection, 11) { w =>
      w.emptyTable().shortstr("PLAIN")
        .longstr(s"\u0000$user\u0000$pass") // SASL PLAIN: NUL cid NUL pwd
        .shortstr("en_US")
    })
    val tune = expectMethod(readFrame(in), ClassConnection, 30)
    val (chMax, frMax) = (tune.u16(), tune.u32())
    frameMaxBytes = frMax
    writeFrame(out, FrameMethod, 0, method(ClassConnection, 31)(
      _.u16(chMax).u32(frMax).u16(0))) // heartbeat 0: no keepalive thread
    writeFrame(out, FrameMethod, 0, method(ClassConnection, 40)(
      _.shortstr(vhost).shortstr("").u8(0)))
    expectMethod(readFrame(in), ClassConnection, 41) // OpenOk
    writeFrame(out, FrameMethod, 1, method(ClassChannel, 10)(_.shortstr("")))
    expectMethod(readFrame(in), ClassChannel, 11) // Channel.OpenOk
  }

  /** Durable, non-exclusive, non-auto-delete — queues.rs:31-40's shape. */
  def declareQueue(name: String): Unit = synchronized {
    writeFrame(out, FrameMethod, 1, method(ClassQueue, 10)(
      _.u16(0).shortstr(name).u8(0x02).emptyTable())) // bit1 = durable
    expectMethod(readFrame(in), ClassQueue, 11)
    ()
  }

  /** Fire-and-forget persistent publish (queues.rs:44-64's
    * basic_publish): method + content-header + body frames. Bodies
    * larger than the Tune-negotiated frame-max are split into
    * (frame-max − 8)-byte chunks — the 8 bytes are the frame envelope
    * (type+channel+size+end), per the spec's framing rule. Synchronized:
    * the three-frame publish sequence must not interleave when tasks in
    * one JVM share a cached connection. */
  def publish(queue: String, body: Array[Byte]): Unit = synchronized {
    writeFrame(out, FrameMethod, 1, basicPublish(queue))
    writeFrame(out, FrameHeader, 1, contentHeader(body.length.toLong))
    val chunk =
      if (frameMaxBytes <= 8) body.length.max(1)
      else (frameMaxBytes - 8).toInt
    var off = 0
    while (off < body.length) {
      val n = math.min(chunk, body.length - off)
      writeFrame(out, FrameBody, 1, java.util.Arrays.copyOfRange(body, off, off + n))
      off += n
    }
  }

  def close(): Unit = synchronized { if (socket != null) {
    try {
      writeFrame(out, FrameMethod, 0, method(ClassConnection, 50)(
        _.u16(200).shortstr("OK").u16(0).u16(0)))
      expectMethod(readFrame(in), ClassConnection, 51) // CloseOk
      ()
    } finally { socket.close(); socket = null }
  } }
}

/** [[MessageQueue]] over [[AmqpClient]] — `amqp://[user:pass@]host:port/
  * queue`. Serializable by address; connections live in a PER-JVM cache
  * keyed by address (AmqpQueue.clientFor), so the thousands of task
  * closures a continuous streaming relay deserializes share one
  * connection per executor instead of dialing the broker per task —
  * Spark tasks never close what they open, and one socket per task per
  * micro-batch exhausts broker connection limits within hours. Publish
  * is serialized per connection inside [[AmqpClient]] (the reference
  * holds one connection in its single-process loop, queues.rs:17-29;
  * one per executor JVM is the distributed analogue). */
class AmqpQueue(val addr: String) extends MessageQueue {
  private val (_, _, _, _, queue) = AmqpQueue.parse(addr) // validate eagerly

  override def publish(data: Array[Byte]): Unit =
    AmqpQueue.clientFor(addr).publish(queue, data)
  def close(): Unit = AmqpQueue.closeClient(addr)
}

object AmqpQueue {
  private val Addr =
    raw"amqp://(?:([^:@/]+):([^:@/]+)@)?([^:@/]+):(\d+)/([^/]+)".r

  private val clients =
    scala.collection.mutable.Map.empty[String, AmqpClient]

  /** One connected, queue-declared client per address per JVM. */
  private def clientFor(addr: String): AmqpClient = clients.synchronized {
    clients.getOrElseUpdate(addr, {
      val (user, pass, host, port, queue) = parse(addr)
      val c = new AmqpClient(host, port, user, pass)
      c.connect()
      c.declareQueue(queue)
      c
    })
  }

  private def closeClient(addr: String): Unit = clients.synchronized {
    clients.remove(addr).foreach(_.close())
  }

  /** (user, pass, host, port, queue); credentials default to
    * guest/guest like every AMQP client. */
  def parse(addr: String): (String, String, String, Int, String) = addr match {
    case Addr(u, p, host, port, queue) =>
      (Option(u).getOrElse("guest"), Option(p).getOrElse("guest"),
        host, port.toInt, queue)
    case other => throw new IllegalArgumentException(
      s"bad AMQP address '$other' (want amqp://[user:pass@]host:port/queue)")
  }
}
