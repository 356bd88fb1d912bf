package graft.api

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** The reference's framed binary wire protocol
  * (`/root/reference/src/cli/protocol.zig`): every message is a 16-byte
  * header — `magic:u32 'KAUL' (0x4B41554C), version:u16 = 1,
  * message_type:u16, payload_size:u64` — followed by `payload_size`
  * bytes holding one fixed-layout request/response struct, transmitted
  * as raw struct memory (`server/cli_protocol.zig:586` `asBytes`).
  *
  * Layout canonicalization: all integers little-endian, fields in
  * DECLARED order with the reference's explicit `_padding` bytes.
  * For the structs the reference marks `extern` (`BlockInfo`,
  * `WorkspaceInfo`, `StatusResponse`) this is byte-identical to its
  * x86 wire bytes; for its plain Zig structs (whose in-memory layout
  * Zig leaves unspecified) declared order is the only portable
  * canonicalization, and the field sizes below reproduce the
  * reference's own `@sizeOf` checks where it states them
  * (`MessageHeader` == 16, `GraphEdge.SERIALIZED_SIZE` == 40 at
  * `core/types.zig:554`).
  *
  * Responses serialize the FULL fixed-capacity struct exactly like the
  * reference (`FindResponse` is always `4 + 1000*536` bytes, the unused
  * tail zeroed — `serialize_find_response` allocates `@sizeOf` and
  * memsets, `server/cli_protocol.zig:580-607`); decoding reads `count`
  * and ignores the tail, so a short (count-truncated) payload also
  * decodes, which the `payload_size` field makes unambiguous.
  *
  * Block ids: the reference's `BlockId` is 16 raw bytes rendered as 32
  * hex digits. Engine ids that are 32-char hex strings travel as their
  * raw 16 bytes; anything else (the fixture graph's `N3`-style ids)
  * travels as zero-padded UTF-8 truncated to 16 — [[blockIdText]]
  * inverts both.
  */
object BinaryProtocol {

  val Magic: Int = 0x4B41554C // 'KAUL' (protocol.zig:24)
  val Version: Int = 1

  // protocol.zig:27-33
  val MaxQueryLength = 2048
  val MaxPathLength = 4096
  val MaxNameLength = 128
  val MaxBlocksPerResponse = 1000
  val MaxEdgesPerResponse = 10000
  val MaxWorkspacesPerStatus = 10
  val MaxWorkspacePathLength = 256

  /** `MessageType` enum values (protocol.zig:113-131). */
  object MsgType {
    val FindRequest = 0x0001
    val ShowCallersRequest = 0x0002
    val ShowCalleesRequest = 0x0003
    val TraceRequest = 0x0004
    val LinkRequest = 0x0005
    val UnlinkRequest = 0x0006
    val SyncRequest = 0x0007
    val StatusRequest = 0x0008
    val PingRequest = 0x0009
    val ClearWorkspaceRequest = 0x000A
    val FindResponse = 0x8001
    val ShowResponse = 0x8002
    val TraceResponse = 0x8003
    val OperationResponse = 0x8004
    val StatusResponse = 0x8005
    val PongResponse = 0x8006
    val ErrorResponse = 0xFFFF
  }

  /** `ErrorCode` enum (protocol.zig:731-738). */
  object ErrorCode {
    val UnknownCommand = 1
    val InvalidRequest = 2
    val ServerError = 3
    val NotFound = 4
    val Timeout = 5
    val TooManyResults = 6
    val InvalidQuery = 7
    val PermissionDenied = 8
  }

  /** Reference `EdgeType` enum(u16) codes (`core/types.zig:107-118`);
    * edge-type names outside the reference vocabulary (the TPC-H
    * fixture's `placed_by` etc.) travel as `references` = 3, the
    * reference's own catch-all usage relation.
    */
  val EdgeTypeCodes: Map[String, Int] = Map(
    "imports" -> 1, "defined_in" -> 2, "references" -> 3, "contains" -> 4,
    "extends" -> 5, "implements" -> 6, "calls" -> 7, "depends_on" -> 8,
    "method_of" -> 9, "calls_method" -> 10, "calls_function" -> 11)
  def edgeTypeCode(name: String): Int = EdgeTypeCodes.getOrElse(name, 3)
  def edgeTypeName(code: Int): String =
    EdgeTypeCodes.collectFirst { case (n, c) if c == code => n }
      .getOrElse("references")

  val HeaderSize = 16

  final case class Header(msgType: Int, payloadSize: Long)

  final case class FindRequest(query: String, maxResults: Int,
                               includeMetadata: Boolean = true)
  final case class ShowRequest(target: String, maxDepth: Int,
                               maxResults: Int = 1000)
  final case class TraceRequest(source: String, target: String,
                                maxDepth: Int, includeAllPaths: Boolean = false)
  final case class LinkRequest(path: String, name: String)
  /** Also the unlink / clear_workspace payload — the reference reuses
    * the SyncRequest layout for all three (`server/cli_protocol.zig:473,497`).
    */
  final case class SyncRequest(name: String, force: Boolean = false)

  final case class BlockInfo(idBytes: Array[Byte], uri: String,
                             contentPreview: String, metadataSize: Int)
  final case class WireEdge(srcBytes: Array[Byte], dstBytes: Array[Byte],
                            edgeType: Int)
  final case class TracePath(nodes: Seq[Array[Byte]], totalDistance: Int)
  final case class OperationResponse(success: Boolean, message: String)
  final case class ErrorResponse(code: Int, message: String)
  final case class WorkspaceInfo(name: String, path: String, blockCount: Int,
                                 edgeCount: Int, lastSyncTimestamp: Long,
                                 syncStatus: Int, storageBytes: Long)
  final case class StatusResponse(blockCount: Long, edgeCount: Long,
                                  sstableCount: Int, memtableSize: Long,
                                  totalDiskUsage: Long, uptimeSeconds: Long,
                                  workspaces: Seq[WorkspaceInfo])

  // ---- struct sizes (sum of declared fields + padding) ----
  val FindRequestSize: Int = 2 + 2 + 1 + 3 + MaxQueryLength // 2056
  val ShowRequestSize: Int = MaxQueryLength + 2 + 2 + 4 // 2056
  val TraceRequestSize: Int = MaxQueryLength + 2 + MaxQueryLength + 2 + 2 + 1 + 1 // 4104
  val LinkRequestSize: Int = 2 + 2 + 4 + MaxPathLength + MaxNameLength // 4232
  val SyncRequestSize: Int = MaxNameLength + 2 + 1 + 5 // 136
  val BlockInfoSize: Int = 16 + 256 + 2 + 256 + 2 + 2 + 2 // 536
  val FindResponseSize: Int = 4 + MaxBlocksPerResponse * BlockInfoSize
  val EdgeSize: Int = 40 // GraphEdge.SERIALIZED_SIZE (types.zig:554)
  val ShowResponseSize: Int =
    4 + 4 + MaxBlocksPerResponse * BlockInfoSize + MaxEdgesPerResponse * EdgeSize
  val TracePathSize: Int = 256 * 16 + 2 + 2 // 4100
  val TraceResponseSize: Int = 2 + 100 * TracePathSize
  val OperationResponseSize: Int = 1 + 256 + 2 + 5 // 264
  val ErrorResponseSize: Int = 4 + 256 + 2 + 2 // 264
  val WorkspaceInfoSize: Int =
    MaxNameLength + MaxWorkspacePathLength + 4 + 4 + 8 + 1 + 7 + 8 // 416
  val StatusResponseSize: Int =
    8 + 8 + 4 + 4 + 8 + 8 + 8 + 4 + 4 + MaxWorkspacesPerStatus * WorkspaceInfoSize

  // ---- low-level helpers ----

  private def alloc(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Fixed-capacity UTF-8 field: write the (truncated) bytes, zero-pad. */
  private def putFixed(buf: ByteBuffer, s: String, cap: Int): Int = {
    var b = s.getBytes(UTF_8)
    if (b.length > cap) b = java.util.Arrays.copyOf(b, cap)
    val pos = buf.position()
    buf.put(b)
    buf.position(pos + cap)
    b.length
  }

  private def getFixed(buf: ByteBuffer, len: Int, cap: Int): String = {
    val b = new Array[Byte](cap)
    buf.get(b)
    new String(b, 0, math.min(math.max(len, 0), cap), UTF_8)
  }

  private def skip(buf: ByteBuffer, n: Int): Unit =
    buf.position(buf.position() + n)

  /** 16-byte id field for a string block id (see class doc). */
  def blockIdBytes(id: String): Array[Byte] =
    if (id.length == 32 && id.forall(c => Character.digit(c, 16) >= 0))
      id.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    else {
      var b = id.getBytes(UTF_8)
      if (b.length > 16) b = java.util.Arrays.copyOf(b, 16)
      java.util.Arrays.copyOf(b, 16)
    }

  /** Inverse of [[blockIdBytes]] for the ids this engine produces:
    * zero-PADDED printable bytes decode as the short text id; anything
    * else — including 16 printable bytes with NO padding, which is what
    * a 32-hex engine id whose raw bytes happen to be ASCII looks like —
    * renders as 32 hex digits, so engine-id string round-trips are
    * stable. (A genuine 16-char text id is the one shape that renders
    * as hex instead; the fixture vocabulary never reaches 16 chars.)
    */
  def blockIdText(bytes: Array[Byte]): String = {
    val printable = bytes.takeWhile(_ != 0)
    if (printable.nonEmpty && printable.length < 16 &&
        printable.forall(b => b >= 0x20 && b < 0x7f) &&
        bytes.drop(printable.length).forall(_ == 0))
      new String(printable, UTF_8)
    else bytes.map(b => f"${b & 0xff}%02x").mkString
  }

  // ---- header ----

  def encodeHeader(h: Header): Array[Byte] = {
    val buf = alloc(HeaderSize)
    buf.putInt(Magic).putShort(Version.toShort)
      .putShort(h.msgType.toShort).putLong(h.payloadSize)
    buf.array()
  }

  /** Validates magic + version like `MessageHeader.validate`
    * (protocol.zig:140-147).
    */
  def decodeHeader(bytes: Array[Byte]): Either[String, Header] = {
    if (bytes.length < HeaderSize) return Left("short header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    val version = buf.getShort() & 0xffff
    val t = buf.getShort() & 0xffff
    val size = buf.getLong()
    if (magic != Magic) Left("InvalidMagic")
    else if (version != Version) Left("VersionMismatch")
    else if (size < 0 || size > ShowResponseSize.toLong)
      Left(s"payload too large: $size")
    else Right(Header(t, size))
  }

  // ---- requests ----

  def encodeFindRequest(r: FindRequest): Array[Byte] = {
    val buf = alloc(FindRequestSize)
    val qlen = math.min(r.query.getBytes(UTF_8).length, MaxQueryLength)
    buf.putShort(qlen.toShort).putShort(r.maxResults.toShort)
      .put(if (r.includeMetadata) 1.toByte else 0.toByte)
    skip(buf, 3)
    putFixed(buf, r.query, MaxQueryLength)
    buf.array()
  }

  def decodeFindRequest(p: Array[Byte]): Either[String, FindRequest] = {
    if (p.length != FindRequestSize) return Left("Invalid find request size")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val qlen = buf.getShort() & 0xffff
    val maxResults = buf.getShort() & 0xffff
    val includeMeta = buf.get() != 0
    skip(buf, 3)
    Right(FindRequest(getFixed(buf, qlen, MaxQueryLength), maxResults, includeMeta))
  }

  def encodeShowRequest(r: ShowRequest): Array[Byte] = {
    val buf = alloc(ShowRequestSize)
    val tlen = math.min(r.target.getBytes(UTF_8).length, MaxQueryLength)
    putFixed(buf, r.target, MaxQueryLength)
    buf.putShort(tlen.toShort).putShort(r.maxDepth.toShort).putInt(r.maxResults)
    buf.array()
  }

  def decodeShowRequest(p: Array[Byte]): Either[String, ShowRequest] = {
    if (p.length != ShowRequestSize) return Left("Invalid show request size")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val target = new Array[Byte](MaxQueryLength); buf.get(target)
    val tlen = buf.getShort() & 0xffff
    val depth = buf.getShort() & 0xffff
    val maxResults = buf.getInt()
    Right(ShowRequest(new String(target, 0, math.min(tlen, MaxQueryLength), UTF_8),
      depth, maxResults))
  }

  def encodeTraceRequest(r: TraceRequest): Array[Byte] = {
    val buf = alloc(TraceRequestSize)
    val slen = math.min(r.source.getBytes(UTF_8).length, MaxQueryLength)
    val tlen = math.min(r.target.getBytes(UTF_8).length, MaxQueryLength)
    putFixed(buf, r.source, MaxQueryLength)
    buf.putShort(slen.toShort)
    putFixed(buf, r.target, MaxQueryLength)
    buf.putShort(tlen.toShort).putShort(r.maxDepth.toShort)
      .put(if (r.includeAllPaths) 1.toByte else 0.toByte)
    skip(buf, 1)
    buf.array()
  }

  def decodeTraceRequest(p: Array[Byte]): Either[String, TraceRequest] = {
    if (p.length != TraceRequestSize) return Left("Invalid trace request size")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val src = new Array[Byte](MaxQueryLength); buf.get(src)
    val slen = buf.getShort() & 0xffff
    val tgt = new Array[Byte](MaxQueryLength); buf.get(tgt)
    val tlen = buf.getShort() & 0xffff
    val depth = buf.getShort() & 0xffff
    val all = buf.get() != 0
    Right(TraceRequest(
      new String(src, 0, math.min(slen, MaxQueryLength), UTF_8),
      new String(tgt, 0, math.min(tlen, MaxQueryLength), UTF_8), depth, all))
  }

  def encodeLinkRequest(r: LinkRequest): Array[Byte] = {
    val buf = alloc(LinkRequestSize)
    val plen = math.min(r.path.getBytes(UTF_8).length, MaxPathLength)
    val nlen = math.min(r.name.getBytes(UTF_8).length, MaxNameLength)
    buf.putShort(plen.toShort).putShort(nlen.toShort)
    skip(buf, 4)
    putFixed(buf, r.path, MaxPathLength)
    putFixed(buf, r.name, MaxNameLength)
    buf.array()
  }

  def decodeLinkRequest(p: Array[Byte]): Either[String, LinkRequest] = {
    if (p.length != LinkRequestSize) return Left("Invalid link request size")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val plen = buf.getShort() & 0xffff
    val nlen = buf.getShort() & 0xffff
    skip(buf, 4)
    val path = getFixed(buf, plen, MaxPathLength)
    val name = getFixed(buf, nlen, MaxNameLength)
    Right(LinkRequest(path, name))
  }

  def encodeSyncRequest(r: SyncRequest): Array[Byte] = {
    val buf = alloc(SyncRequestSize)
    val nlen = math.min(r.name.getBytes(UTF_8).length, MaxNameLength)
    putFixed(buf, r.name, MaxNameLength)
    buf.putShort(nlen.toShort).put(if (r.force) 1.toByte else 0.toByte)
    skip(buf, 5)
    buf.array()
  }

  def decodeSyncRequest(p: Array[Byte]): Either[String, SyncRequest] = {
    if (p.length != SyncRequestSize) return Left("Invalid sync request size")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val name = new Array[Byte](MaxNameLength); buf.get(name)
    val nlen = buf.getShort() & 0xffff
    val force = buf.get() != 0
    Right(SyncRequest(new String(name, 0, math.min(nlen, MaxNameLength), UTF_8), force))
  }

  // ---- responses ----

  private def putBlockInfo(buf: ByteBuffer, b: BlockInfo): Unit = {
    buf.put(java.util.Arrays.copyOf(b.idBytes, 16))
    val ulen = math.min(b.uri.getBytes(UTF_8).length, 256)
    val clen = math.min(b.contentPreview.getBytes(UTF_8).length, 256)
    putFixed(buf, b.uri, 256)
    buf.putShort(ulen.toShort)
    putFixed(buf, b.contentPreview, 256)
    buf.putShort(clen.toShort)
    buf.putShort(math.min(b.metadataSize, 0xffff).toShort)
    skip(buf, 2)
  }

  private def getBlockInfo(buf: ByteBuffer): BlockInfo = {
    val id = new Array[Byte](16); buf.get(id)
    val uri = new Array[Byte](256); buf.get(uri)
    val ulen = buf.getShort() & 0xffff
    val preview = new Array[Byte](256); buf.get(preview)
    val clen = buf.getShort() & 0xffff
    val metaSize = buf.getShort() & 0xffff
    skip(buf, 2)
    BlockInfo(id, new String(uri, 0, math.min(ulen, 256), UTF_8),
      new String(preview, 0, math.min(clen, 256), UTF_8), metaSize)
  }

  def encodeFindResponse(blocks: Seq[BlockInfo]): Array[Byte] = {
    val buf = alloc(FindResponseSize)
    val take = blocks.take(MaxBlocksPerResponse)
    buf.putInt(take.length)
    take.foreach(putBlockInfo(buf, _))
    buf.array() // zeroed tail, like the reference's memset
  }

  def decodeFindResponse(p: Array[Byte]): Either[String, Seq[BlockInfo]] = {
    if (p.length < 4) return Left("short find response")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt()
    if (n < 0 || n > MaxBlocksPerResponse || p.length < 4L + n.toLong * BlockInfoSize)
      return Left("corrupt find response")
    Right(Seq.fill(n)(getBlockInfo(buf)))
  }

  def encodeShowResponse(blocks: Seq[BlockInfo], edges: Seq[WireEdge]): Array[Byte] = {
    val buf = alloc(ShowResponseSize)
    val tb = blocks.take(MaxBlocksPerResponse)
    val te = edges.take(MaxEdgesPerResponse)
    buf.putInt(tb.length).putInt(te.length)
    tb.foreach(putBlockInfo(buf, _))
    buf.position(8 + MaxBlocksPerResponse * BlockInfoSize)
    te.foreach { e =>
      buf.put(java.util.Arrays.copyOf(e.srcBytes, 16))
      buf.put(java.util.Arrays.copyOf(e.dstBytes, 16))
      buf.putShort(e.edgeType.toShort)
      skip(buf, 6) // reserved (types.zig:554)
    }
    buf.array()
  }

  def decodeShowResponse(p: Array[Byte]): Either[String, (Seq[BlockInfo], Seq[WireEdge])] = {
    if (p.length < ShowResponseSize) return Left("short show response")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val nb = buf.getInt(); val ne = buf.getInt()
    if (nb < 0 || nb > MaxBlocksPerResponse || ne < 0 || ne > MaxEdgesPerResponse)
      return Left("corrupt show response")
    val blocks = Seq.fill(nb)(getBlockInfo(buf))
    buf.position(8 + MaxBlocksPerResponse * BlockInfoSize)
    val edges = Seq.fill(ne) {
      val s = new Array[Byte](16); buf.get(s)
      val d = new Array[Byte](16); buf.get(d)
      val t = buf.getShort() & 0xffff
      skip(buf, 6)
      WireEdge(s, d, t)
    }
    Right((blocks, edges))
  }

  def encodeTraceResponse(paths: Seq[TracePath]): Array[Byte] = {
    val buf = alloc(TraceResponseSize)
    val tp = paths.take(100)
    buf.putShort(tp.length.toShort)
    tp.foreach { p =>
      val nodes = p.nodes.take(256)
      val start = buf.position()
      nodes.foreach(n => buf.put(java.util.Arrays.copyOf(n, 16)))
      buf.position(start + 256 * 16)
      buf.putShort(nodes.length.toShort).putShort(p.totalDistance.toShort)
    }
    buf.array()
  }

  def decodeTraceResponse(p: Array[Byte]): Either[String, Seq[TracePath]] = {
    if (p.length < TraceResponseSize) return Left("short trace response")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getShort() & 0xffff
    if (n > 100) return Left("corrupt trace response")
    Right(Seq.fill(n) {
      val start = buf.position()
      val raw = Seq.fill(256) { val b = new Array[Byte](16); buf.get(b); b }
      val count = buf.getShort() & 0xffff
      val dist = buf.getShort() & 0xffff
      val _ = start
      TracePath(raw.take(math.min(count, 256)), dist)
    })
  }

  def encodeOperationResponse(r: OperationResponse): Array[Byte] = {
    val buf = alloc(OperationResponseSize)
    buf.put(if (r.success) 1.toByte else 0.toByte)
    val mlen = math.min(r.message.getBytes(UTF_8).length, 256)
    putFixed(buf, r.message, 256)
    buf.putShort(mlen.toShort)
    skip(buf, 5)
    buf.array()
  }

  def decodeOperationResponse(p: Array[Byte]): Either[String, OperationResponse] = {
    if (p.length != OperationResponseSize) return Left("Invalid operation response size")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val ok = buf.get() != 0
    val msg = new Array[Byte](256); buf.get(msg)
    val mlen = buf.getShort() & 0xffff
    Right(OperationResponse(ok, new String(msg, 0, math.min(mlen, 256), UTF_8)))
  }

  def encodeErrorResponse(r: ErrorResponse): Array[Byte] = {
    val buf = alloc(ErrorResponseSize)
    buf.putInt(r.code)
    val mlen = math.min(r.message.getBytes(UTF_8).length, 256)
    putFixed(buf, r.message, 256)
    buf.putShort(mlen.toShort)
    skip(buf, 2)
    buf.array()
  }

  def decodeErrorResponse(p: Array[Byte]): Either[String, ErrorResponse] = {
    if (p.length != ErrorResponseSize) return Left("Invalid error response size")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val code = buf.getInt()
    val msg = new Array[Byte](256); buf.get(msg)
    val mlen = buf.getShort() & 0xffff
    Right(ErrorResponse(code, new String(msg, 0, math.min(mlen, 256), UTF_8)))
  }

  private def putWorkspaceInfo(buf: ByteBuffer, w: WorkspaceInfo): Unit = {
    // the reference caps at MAX-1 here (init_with_status keeps a NUL)
    putFixed(buf, w.name.take(MaxNameLength - 1), MaxNameLength)
    putFixed(buf, w.path.take(MaxWorkspacePathLength - 1), MaxWorkspacePathLength)
    buf.putInt(w.blockCount).putInt(w.edgeCount).putLong(w.lastSyncTimestamp)
      .put(w.syncStatus.toByte)
    skip(buf, 7)
    buf.putLong(w.storageBytes)
  }

  private def getWorkspaceInfo(buf: ByteBuffer): WorkspaceInfo = {
    // NUL-terminated fields (WorkspaceInfo.name_text scans for 0)
    val name = new Array[Byte](MaxNameLength); buf.get(name)
    val path = new Array[Byte](MaxWorkspacePathLength); buf.get(path)
    def z(b: Array[Byte]): String = {
      val i = b.indexOf(0.toByte)
      new String(b, 0, if (i < 0) b.length else i, UTF_8)
    }
    val bc = buf.getInt(); val ec = buf.getInt(); val ts = buf.getLong()
    val st = buf.get() & 0xff
    skip(buf, 7)
    val sb = buf.getLong()
    WorkspaceInfo(z(name), z(path), bc, ec, ts, st, sb)
  }

  def encodeStatusResponse(r: StatusResponse): Array[Byte] = {
    val buf = alloc(StatusResponseSize)
    buf.putLong(r.blockCount).putLong(r.edgeCount).putInt(r.sstableCount)
    skip(buf, 4)
    buf.putLong(r.memtableSize).putLong(r.totalDiskUsage).putLong(r.uptimeSeconds)
      .putInt(math.min(r.workspaces.length, MaxWorkspacesPerStatus))
    skip(buf, 4)
    r.workspaces.take(MaxWorkspacesPerStatus).foreach(putWorkspaceInfo(buf, _))
    buf.array()
  }

  def decodeStatusResponse(p: Array[Byte]): Either[String, StatusResponse] = {
    if (p.length < StatusResponseSize) return Left("short status response")
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val bc = buf.getLong(); val ec = buf.getLong(); val sst = buf.getInt()
    skip(buf, 4)
    val mem = buf.getLong(); val disk = buf.getLong(); val up = buf.getLong()
    val n = buf.getInt()
    skip(buf, 4)
    if (n < 0 || n > MaxWorkspacesPerStatus) return Left("corrupt status response")
    Right(StatusResponse(bc, ec, sst, mem, disk, up,
      Seq.fill(n)(getWorkspaceInfo(buf))))
  }

  // ---- framing I/O ----

  def writeMessage(out: OutputStream, msgType: Int, payload: Array[Byte]): Unit = {
    out.write(encodeHeader(Header(msgType, payload.length.toLong)))
    out.write(payload)
    out.flush()
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new EOFException(s"stream closed at $off/$n")
      off += r
    }
    b
  }

  /** Read one framed message; Left on a malformed header. EOF before
    * the first header byte returns Left("eof") (clean disconnect).
    */
  def readMessage(in: InputStream): Either[String, (Header, Array[Byte])] = {
    val first = in.read()
    if (first < 0) return Left("eof")
    val rest = readFully(in, HeaderSize - 1)
    val headerBytes = first.toByte +: rest
    decodeHeader(headerBytes).map { h =>
      (h, readFully(in, h.payloadSize.toInt))
    }
  }
}
