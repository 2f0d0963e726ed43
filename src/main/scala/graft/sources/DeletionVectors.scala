package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.RoaringBitmap

/** DELETION VECTORS — the Delta protocol's merge-on-read row-level
  * deletes (PROTOCOL.md "Deletion Vectors"), implemented against the
  * public spec: a DV is a 64-bit roaring bitmap of DELETED row indexes
  * for one data file, stored inline in the log (`storageType "i"`,
  * Z85-encoded) or in a sidecar `.bin` file (`"u"` relative by encoded
  * UUID / `"p"` absolute), and a file's logical rows are its physical
  * rows MINUS the bitmap. Modern Delta writers enable DVs by default,
  * so without this the most common real table a user brings would
  * fail-fast at the protocol gate (the r9 verdict's top item).
  *
  * Wire shapes (all public):
  *   - bitmap: magic `1681511377` as a little-endian int, then the
  *     64-bit roaring bitmap array — a little-endian long bitmap count,
  *     then per 32-bit bucket its key (little-endian int) followed by a
  *     standard portable `RoaringBitmap` serialization
  *     (`org.roaringbitmap` ships on Spark's own classpath);
  *   - sidecar file: a `1` format-version byte, then per stored DV (at
  *     the descriptor's `offset`) a BIG-endian data length, the bitmap
  *     bytes, and a big-endian CRC-32 of them;
  *   - Z85: the ZeroMQ base85 alphabet over big-endian 4-byte groups,
  *     zero-padded to a multiple of 4 (the descriptor's `sizeInBytes`
  *     recovers the real length).
  *
  * Scale shape: a DV is metadata-sized (bitmap of one file's deleted
  * rows, typically KBs); the read path resolves each live file's DV
  * driver-side — the same driver state the log fold already holds per
  * file — and applies it as a codegen'd anti-filter on the scan's
  * `_metadata.row_index` ([[DvKeep]]), so the snapshot stays ONE
  * parquet scan with no extra shuffle or join.
  */
object DeletionVectors {

  /** The protocol's deletion-vector descriptor (on add/remove actions). */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long) {
    /** Stable identity of one DV instance — what distinguishes two
      * versions of the same data file in a signed diff (the DV-delete
      * commit removes `(path, oldDv)` and adds `(path, newDv)`).
      */
    def id: String = s"$storageType:$pathOrInlineDv@${offset.getOrElse(0)}"
  }

  def parseDescriptor(n: JsonNode): Descriptor =
    Descriptor(
      n.get("storageType").asText,
      n.get("pathOrInlineDv").asText,
      Option(n.get("offset")).filterNot(_.isNull).map(_.asInt),
      n.get("sizeInBytes").asInt,
      n.get("cardinality").asLong)

  // ---- 64-bit roaring bitmap ---------------------------------------------

  private val Magic = 1681511377

  /** A 64-bit value set as 32-bit roaring bitmaps keyed by the high
    * word — the spec's RoaringBitmapArray. Serializable: it rides the
    * [[DvKeep]] expression to executors (once per task batch, like a
    * small broadcast — never as plan literals).
    */
  final class Bitmap64 extends Serializable {
    // sorted keys: the portable serialization requires ascending buckets
    private val buckets = new java.util.TreeMap[Integer, RoaringBitmap]()

    def add(v: Long): Unit = {
      require(v >= 0, s"row index must be non-negative, got $v")
      val key = (v >>> 32).toInt
      var bm = buckets.get(key)
      if (bm == null) { bm = new RoaringBitmap(); buckets.put(key, bm) }
      bm.add(v.toInt)
    }

    def contains(v: Long): Boolean = {
      val bm = buckets.get((v >>> 32).toInt)
      bm != null && bm.contains(v.toInt)
    }

    def cardinality: Long = {
      var n = 0L
      val it = buckets.values().iterator()
      while (it.hasNext) n += it.next().getLongCardinality
      n
    }

    /** All indexes, ascending (fixture-scale enumeration). */
    def toArray: Array[Long] = {
      import scala.jdk.CollectionConverters._
      buckets.asScala.iterator.flatMap { case (key, bm) =>
        val base = key.toLong << 32
        bm.toArray.iterator.map(i => base | (i.toLong & 0xFFFFFFFFL))
      }.toArray
    }

    /** Magic + bitmap count + per-bucket key + portable serialization. */
    def serialize(): Array[Byte] = {
      import scala.jdk.CollectionConverters._
      buckets.values.asScala.foreach(_.runOptimize())
      val size = 4 + 8 + buckets.asScala.map {
        case (_, bm) => 4 + bm.serializedSizeInBytes()
      }.sum
      val bb = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(Magic)
      bb.putLong(buckets.size().toLong)
      buckets.asScala.foreach { case (key, bm) =>
        bb.putInt(key)
        bm.serialize(bb)
      }
      bb.array()
    }
  }

  /** Inverse of [[Bitmap64.serialize]]; `data` may carry Z85 zero
    * padding past the real serialization (callers pass the descriptor's
    * exact `sizeInBytes` slice, but stray trailing bytes are ignored
    * regardless — the bitmap count bounds the read).
    */
  def deserialize(data: Array[Byte]): Bitmap64 = {
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic,
      s"deletion vector: bad magic $magic (expected $Magic)")
    val n = bb.getLong
    val out = new Bitmap64
    (0L until n).foreach { _ =>
      val key = bb.getInt
      val bm = new RoaringBitmap()
      bm.deserialize(bb)
      bb.position(bb.position() + bm.serializedSizeInBytes())
      val base = key.toLong << 32
      bm.forEach(new org.roaringbitmap.IntConsumer {
        override def accept(i: Int): Unit =
          out.add(base | (i.toLong & 0xFFFFFFFFL))
      })
    }
    out
  }

  // ---- Z85 ---------------------------------------------------------------

  private val Z85Alphabet =
    ("0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toCharArray
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode, zero-padding to a multiple of 4 (the caller records
    * the unpadded length out of band — `sizeInBytes` for DV data, the
    * fixed 16 for UUIDs).
    */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ Array.fill[Byte](4 - bytes.length % 4)(0)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      (0 until 4).foreach(j => v = (v << 8) | (padded(i + j) & 0xFFL))
      val group = new Array[Char](5)
      (4 to 0 by -1).foreach { j =>
        group(j) = Z85Alphabet((v % 85).toInt); v /= 85
      }
      sb.appendAll(group)
      i += 4
    }
    sb.toString
  }

  /** Z85-decode to `outputLength` bytes (dropping encode padding). */
  def z85Decode(s: String, outputLength: Int): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Z85 input length ${s.length} is not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      (0 until 5).foreach { j =>
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
      }
      // A 5-char group encodes exactly 4 bytes; groups above 2^32-1 are
      // spec-invalid and would silently wrap when truncated below.
      require(v <= 0xFFFFFFFFL,
        s"invalid Z85 group '${s.substring(i, i + 5)}': decodes above 2^32-1")
      (0 until 4).foreach(j =>
        out(i / 5 * 4 + j) = ((v >>> (8 * (3 - j))) & 0xFF).toByte)
      i += 5
    }
    require(outputLength <= out.length,
      s"Z85: requested $outputLength bytes from ${out.length} decoded")
    java.util.Arrays.copyOfRange(out, 0, outputLength)
  }

  // ---- descriptor resolution ---------------------------------------------

  /** The sidecar file a `u`-type descriptor names:
    * `<tableRoot>/<optional random prefix dirs><20-char Z85 uuid>` →
    * `deletion_vector_<canonical uuid>.bin`. The ONE home for this
    * rule — the reader, VACUUM's keep-set, and the shallow clone's
    * re-anchoring must all resolve identically or maintenance deletes
    * what reads reference.
    */
  def sidecarFile(tableRoot: String, enc: String): java.io.File = {
    require(enc.length >= 20,
      s"deletion vector path token too short: '$enc'")
    val prefix = enc.dropRight(20)
    val uuidBytes = z85Decode(enc.takeRight(20), 16)
    val bb = java.nio.ByteBuffer.wrap(uuidBytes)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    new java.io.File(new java.io.File(tableRoot, prefix),
      s"deletion_vector_$uuid.bin")
  }

  /** The on-disk sidecar a descriptor names by STORAGE TYPE — None for
    * inline descriptors (they live in the log). The shared dispatch for
    * every maintenance path (restore's existence guard, vacuum's
    * keep-set, truncateAfter's keep/drop sets): one copy, so a rule
    * change can never desynchronize what maintenance deletes from what
    * reads reference.
    */
  def sidecarOf(tableRoot: String, storageType: String,
      enc: String): Option[java.io.File] = storageType match {
    case "u" => Some(sidecarFile(tableRoot, enc))
    case "p" => Some(absoluteFile(enc))
    case _ => None
  }

  /** The file a `p`-type (absolute) descriptor names — plain absolute
    * paths and local `file:` URIs (percent-decoding, authority, scheme
    * case); any other scheme is unreadable here, loudly.
    */
  def absoluteFile(raw: String): java.io.File =
    if (raw.matches("(?i)^file:.*")) {
      val uri = new java.net.URI(raw)
      val auth = Option(uri.getAuthority).filter(_.nonEmpty)
      require(auth.forall(_.equalsIgnoreCase("localhost")),
        s"deletion vector URI with a non-local authority is " +
          s"not readable in this environment: $raw")
      new java.io.File(uri.getPath)
    } else if (raw.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*"))
      throw new UnsupportedOperationException(
        s"deletion vector at non-local URI '$raw' is not " +
          "readable in this environment")
    else new java.io.File(raw)

  /** Resolve a descriptor to its bitmap: inline decodes from the log
    * itself; `u`/`p` read the sidecar file at the descriptor's offset,
    * validating the format version, the stored length against
    * `sizeInBytes`, and the CRC-32 (a truncated or corrupted DV must
    * fail loudly — it UNDELETES rows silently otherwise). The resolved
    * cardinality is checked against the descriptor's.
    */
  def read(tableRoot: String, d: Descriptor): Bitmap64 = {
    val data: Array[Byte] = d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv, d.sizeInBytes)
      case "u" | "p" =>
        val file =
          if (d.storageType == "p") absoluteFile(d.pathOrInlineDv)
          else sidecarFile(tableRoot, d.pathOrInlineDv)
        require(file.exists(),
          s"deletion vector file missing on disk: $file (vacuumed past " +
            "this consumer's cut?)")
        val all = java.nio.file.Files.readAllBytes(file.toPath)
        require(all.nonEmpty && all(0) == 1,
          s"deletion vector file $file: unsupported format version " +
            s"${if (all.isEmpty) "<empty>" else all(0)}")
        val off = d.offset.getOrElse(1)
        val bb = java.nio.ByteBuffer.wrap(all) // lengths/CRC: big-endian
        bb.position(off)
        val len = bb.getInt
        require(len == d.sizeInBytes,
          s"deletion vector in $file at offset $off: stored length $len " +
            s"!= descriptor sizeInBytes ${d.sizeInBytes}")
        val payload = new Array[Byte](len)
        bb.get(payload)
        val storedCrc = bb.getInt
        val crc = new java.util.zip.CRC32
        crc.update(payload)
        require(storedCrc == crc.getValue.toInt,
          s"deletion vector in $file at offset $off: CRC mismatch")
        payload
      case other => throw new UnsupportedOperationException(
        s"deletion vector storageType '$other' is not supported")
    }
    val bm = deserialize(data)
    require(bm.cardinality == d.cardinality,
      s"deletion vector cardinality ${bm.cardinality} != descriptor's " +
        s"${d.cardinality}")
    bm
  }

  // ---- fixture writer ----------------------------------------------------

  /** Serialize `rowIndexes` and store per `inline`: an inline
    * descriptor, or a sidecar `deletion_vector_<uuid>.bin` under the
    * table root (version byte + BE length + data + BE CRC-32, offset 1)
    * with a `u`-type descriptor. Fixture machinery — real DVs are
    * written by the lakehouse writer; this speaks the same format.
    */
  def stage(tableRoot: String, rowIndexes: Seq[Long],
      inline: Boolean): Descriptor = {
    val bm = new Bitmap64
    rowIndexes.foreach(bm.add)
    stageBitmap(tableRoot, bm, inline)
  }

  /** [[stage]] from an already-built bitmap — the PUBLIC delete path
    * builds per-file bitmaps ON EXECUTORS (the deleted-row set never
    * rides to the driver as raw longs, only roaring-compressed bytes)
    * and the driver stores them from here.
    */
  def stageBitmap(tableRoot: String, bm: Bitmap64,
      inline: Boolean): Descriptor = {
    val data = bm.serialize()
    if (inline)
      Descriptor("i", z85Encode(data), None, data.length, bm.cardinality)
    else {
      val uuid = java.util.UUID.nameUUIDFromBytes(data)
      val file = new java.io.File(tableRoot,
        s"deletion_vector_$uuid.bin")
      val crc = new java.util.zip.CRC32
      crc.update(data)
      val bb = java.nio.ByteBuffer.allocate(1 + 4 + data.length + 4)
      bb.put(1.toByte)
      bb.putInt(data.length)
      bb.put(data)
      bb.putInt(crc.getValue.toInt)
      java.nio.file.Files.write(file.toPath, bb.array())
      val ub = java.nio.ByteBuffer.allocate(16)
      ub.putLong(uuid.getMostSignificantBits)
      ub.putLong(uuid.getLeastSignificantBits)
      Descriptor("u", z85Encode(ub.array()), Some(1), data.length,
        bm.cardinality)
    }
  }
}

/** Executor-side DV lookup: scheme-variant file-path keys (the
  * `_metadata.file_path` rendering is environment-dependent —
  * `file:/…`, `file:///…`, or bare) each mapped to the file's bitmap.
  * Keys are [[UTF8String]] so the per-row probe is a plain hash lookup
  * with zero string conversion.
  */
final class DvLookup(dvs: java.util.HashMap[UTF8String,
    DeletionVectors.Bitmap64]) extends Serializable {
  def deleted(path: UTF8String, rowIndex: Long): Boolean = {
    val bm = dvs.get(path)
    bm != null && bm.contains(rowIndex)
  }
}

object DvLookup {
  /** Build from (absolute path → bitmap), registering every rendering
    * Spark may surface as `_metadata.file_path`: the raw path AND its
    * Hadoop-Path URI form (`file_path` is the `PartitionedFile`'s
    * URL-ENCODED path — a partition dir with a space renders `%20`),
    * each bare and with `file:`/`file://` scheme prefixes. A missed
    * rendering would silently UNDELETE rows, so the probe set is
    * deliberately wide.
    */
  def apply(byPath: Map[String, DeletionVectors.Bitmap64]): DvLookup = {
    val m = new java.util.HashMap[UTF8String, DeletionVectors.Bitmap64]()
    byPath.foreach { case (p, bm) =>
      val enc = new org.apache.hadoop.fs.Path(p).toUri.toString
      Seq(p, enc).distinct.foreach { base =>
        Seq(base, s"file:$base", s"file://$base").foreach(k =>
          m.put(UTF8String.fromString(k), bm))
      }
    }
    new DvLookup(m)
  }
}

/** `NOT deleted(file_path, row_index)` — the codegen'd anti-filter that
  * applies deletion vectors on a snapshot scan. Sits directly on the
  * scan inside whole-stage codegen: per row one hash probe + bitmap
  * test against a reference object (`ctx.addReferenceObj`, the
  * mechanism Spark uses for oversized literals — the bitmaps ship once
  * per task batch, never through the plan as literals). Inputs must not
  * be null: a null `row_index` means the format didn't surface the
  * metadata column, and silently keeping (or dropping) every row would
  * corrupt the read — fail loudly instead.
  */
final case class DvKeep(filePath: Expression, rowIndex: Expression,
    lookup: DvLookup) extends Expression with Predicate {

  override def children: Seq[Expression] = Seq(filePath, rowIndex)
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType

  override def eval(input: InternalRow): Any = {
    val p = filePath.eval(input)
    val i = rowIndex.eval(input)
    if (p == null || i == null) throw new IllegalStateException(
      "DvKeep: null file_path/row_index metadata — the scan did not " +
        "surface per-row file metadata; deletion vectors cannot apply")
    !lookup.deleted(p.asInstanceOf[UTF8String], i.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup,
      classOf[DvLookup].getName)
    val pe = filePath.genCode(ctx)
    val ie = rowIndex.genCode(ctx)
    ev.copy(
      code = code"""
        ${pe.code}
        ${ie.code}
        if (${pe.isNull} || ${ie.isNull}) {
          throw new IllegalStateException(
            "DvKeep: null file_path/row_index metadata");
        }
        boolean ${ev.value} = !$ref.deleted(${pe.value}, ${ie.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(filePath = newChildren(0), rowIndex = newChildren(1))
}
