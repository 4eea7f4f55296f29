package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.Socket

/** Minimal gRPC-over-HTTP/2 unary client against [[GraftGrpcServer]] —
  * wire-level (no gRPC/HTTP2 library), used by GrpcServerSpec and by the
  * battery's gRPC round-trip query so the driver gate exercises the REAL
  * socket path, not a handler shortcut. Sends one HEADERS (END_HEADERS,
  * plain HPACK literals) + one DATA (END_STREAM) per call and reads until
  * the response trailers. */
final class GrpcWireClient(port: Int) {
  private val sock = new Socket("127.0.0.1", port)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private val out = new BufferedOutputStream(sock.getOutputStream)
  private var nextStream = 1
  private val decoder = new Http2.HpackDecoder

  out.write("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes("US-ASCII"))
  frame(0x4, 0, 0, settings(Seq((4, Int.MaxValue)))) // ample INITIAL_WINDOW_SIZE
  out.flush()

  private def settings(kvs: Seq[(Int, Int)]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(kvs.size * 6)
    kvs.foreach { case (k, v) => b.putShort(k.toShort).putInt(v) }
    b.array()
  }

  private def frame(tpe: Int, flags: Int, sid: Int, payload: Array[Byte]): Unit = {
    val len = payload.length
    out.write((len >>> 16) & 0xFF); out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
    out.write(tpe); out.write(flags)
    out.write((sid >>> 24) & 0x7F); out.write((sid >>> 16) & 0xFF)
    out.write((sid >>> 8) & 0xFF); out.write(sid & 0xFF)
    out.write(payload)
  }

  /** unary call: returns (first response message bytes, grpc-status). */
  def call(path: String, msg: Array[Byte]): (Array[Byte], Int) = {
    val (resps, status) = callMulti(path, Seq(msg))
    (resps.headOption.getOrElse(Array.emptyByteArray), status)
  }

  /** streaming-capable call: sends every request message on one stream
    * (client streaming = several length-prefixed messages before
    * END_STREAM) and returns ALL response messages (server streaming =
    * several length-prefixed messages before the trailers).
    *
    * Test knobs: `pad` > 0 sends HEADERS and DATA with the PADDED flag
    * (RFC 7540 §6.1/§6.2 — pad-length octet, then the block, then `pad`
    * zero octets of trailing padding); `compressedFlag` sets each gRPC
    * message's compressed-flag byte to 1 (we advertise no grpc-encoding,
    * so a conforming server must answer UNIMPLEMENTED, not misparse). */
  def callMulti(path: String, msgs: Seq[Array[Byte]],
      pad: Int = 0, compressedFlag: Boolean = false): (Seq[Array[Byte]], Int) = {
    val sid = nextStream; nextStream += 2
    val enc = new Http2.HpackEncoder
    val hdrBlock = enc.encode(Seq(
      (":method", "POST"), (":scheme", "http"), (":path", path),
      (":authority", "localhost"), ("content-type", "application/grpc"),
      ("te", "trailers")))
    def padded(block: Array[Byte]): Array[Byte] = {
      val b = new Array[Byte](1 + block.length + pad)
      b(0) = pad.toByte
      System.arraycopy(block, 0, b, 1, block.length)
      b // trailing pad bytes stay zero
    }
    if (pad > 0) frame(0x1, 0x4 | 0x8, sid, padded(hdrBlock))
    else frame(0x1, 0x4, sid, hdrBlock)
    val all = new java.io.ByteArrayOutputStream()
    msgs.foreach { msg =>
      all.write(if (compressedFlag) 1 else 0)
      all.write((msg.length >>> 24) & 0xFF); all.write((msg.length >>> 16) & 0xFF)
      all.write((msg.length >>> 8) & 0xFF); all.write(msg.length & 0xFF)
      all.write(msg)
    }
    val framed = all.toByteArray
    // chunk DATA to SETTINGS_MAX_FRAME_SIZE's default, like the server does
    if (framed.isEmpty) frame(0x0, 0x1, sid, Array.emptyByteArray)
    var off = 0
    while (off < framed.length) {
      val n = math.min(16384, framed.length - off)
      val last = off + n >= framed.length
      val chunk = java.util.Arrays.copyOfRange(framed, off, off + n)
      if (pad > 0) frame(0x0, (if (last) 0x1 else 0x0) | 0x8, sid, padded(chunk))
      else frame(0x0, if (last) 0x1 else 0x0, sid, chunk)
      off += n
    }
    out.flush()
    val body = new java.io.ByteArrayOutputStream()
    var status = -1
    var done = false
    while (!done) {
      val len = (in.readUnsignedByte() << 16) | (in.readUnsignedByte() << 8) |
        in.readUnsignedByte()
      val tpe = in.readUnsignedByte(); val flags = in.readUnsignedByte()
      val fsid = in.readInt() & 0x7FFFFFFF
      val payload = new Array[Byte](len)
      in.readFully(payload)
      tpe match {
        case 0x4 =>
          if ((flags & 0x1) == 0) { frame(0x4, 0x1, 0, Array.emptyByteArray); out.flush() }
        case 0x1 if fsid == sid =>
          decoder.decode(payload, 0, len).foreach {
            case ("grpc-status", v) => status = v.toInt
            case _                  => ()
          }
          if ((flags & 0x1) != 0) done = true
        case 0x0 if fsid == sid =>
          body.write(payload)
          if ((flags & 0x1) != 0) done = true
        case _ => ()
      }
    }
    val raw = body.toByteArray
    val resps = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos + 5 <= raw.length) {
      val n = ((raw(pos + 1) & 0xFF) << 24) | ((raw(pos + 2) & 0xFF) << 16) |
        ((raw(pos + 3) & 0xFF) << 8) | (raw(pos + 4) & 0xFF)
      resps += java.util.Arrays.copyOfRange(raw, pos + 5, pos + 5 + n)
      pos += 5 + n
    }
    (resps.toSeq, status)
  }

  def close(): Unit = sock.close()
}
