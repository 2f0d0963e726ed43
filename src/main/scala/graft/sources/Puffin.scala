package graft.sources

/** PUFFIN — the Iceberg auxiliary file format (public spec:
  * iceberg.apache.org/puffin-spec) as used by FORMAT-VERSION 3 tables
  * to store DELETION VECTORS. A v3 row-level delete is no longer a
  * parquet file of `(file_path, pos)` rows: it is one
  * `deletion-vector-v1` blob per data file — a 64-bit roaring bitmap
  * of deleted row positions — inside a Puffin file, referenced
  * straight from the delete manifest entry (`referenced_data_file`,
  * `content_offset`, `content_size_in_bytes`), so a reader never
  * parses the Puffin footer on the hot path.
  *
  * Wire shapes (all public):
  *   - file: magic `PFA1`, blobs back-to-back, then the footer —
  *     magic, UTF-8 JSON FileMetadata payload, its 4-byte
  *     little-endian size, 4 flag bytes (bit 0 of byte 0 = payload
  *     compressed), magic;
  *   - `deletion-vector-v1` blob: the combined length of magic +
  *     bitmap as 4 bytes BIG-endian, the 4-byte magic sequence
  *     `D1 D3 39 64`, the 64-bit roaring bitmap in the same portable
  *     layout the Delta protocol uses (deliberate cross-format
  *     compatibility — `D1 D3 39 64` IS little-endian `1681511377`,
  *     Delta's RoaringBitmapArray magic, so [[DeletionVectors]]'
  *     codec is shared verbatim), and a CRC-32 of magic + bitmap as
  *     4 bytes BIG-endian.
  *
  * Scale shape: identical to the Delta DV path — a DV is
  * metadata-sized, resolved driver-side per referenced file (the same
  * driver state the manifest fold already holds), and applied as the
  * codegen'd [[DvKeep]] anti-filter on `_metadata.row_index`; the
  * snapshot stays ONE parquet scan, and a delete no longer costs a
  * delete-file parquet scan + anti-join at all.
  */
object Puffin {

  /** A deletion-vector blob reference carried by a v3 delete manifest
    * entry: the data file it applies to, the blob's offset/length in
    * the Puffin file (`path` lives on the enclosing [[Iceberg.IceFile]]),
    * and the entry's `record_count` as the expected cardinality.
    */
  final case class DvRef(referenced: String, offset: Long, length: Long,
      cardinality: Option[Long])

  private val FileMagic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"

  /** Read one `deletion-vector-v1` blob. Validations are the loud
    * kind — a truncated or corrupt DV silently UNDELETES rows
    * otherwise: file magic, blob length prefix vs the manifest's
    * `content_size_in_bytes`, CRC-32, bitmap magic (inside
    * [[DeletionVectors.deserialize]]), and cardinality vs the entry's
    * `record_count`.
    */
  def readDv(file: String, offset: Long, length: Long,
      cardinality: Option[Long]): DeletionVectors.Bitmap64 = {
    val f = new java.io.File(file)
    require(f.exists(), s"Puffin deletion-vector file missing on disk: " +
      s"$file (snapshots expired past this consumer?)")
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      val head = new Array[Byte](4)
      raf.readFully(head)
      require(java.util.Arrays.equals(head, FileMagic),
        s"$file is not a Puffin file (bad magic)")
      require(offset >= 4 && length >= 8 && offset + length <= raf.length(),
        s"Puffin blob [$offset, +$length) out of bounds in $file " +
          s"(${raf.length()} bytes)")
      raf.seek(offset)
      val blob = new Array[Byte](length.toInt)
      raf.readFully(blob)
      val bb = java.nio.ByteBuffer.wrap(blob) // BIG-endian prefix/CRC
      val payloadLen = bb.getInt
      require(payloadLen == length - 8,
        s"Puffin DV blob in $file at $offset: stored length $payloadLen " +
          s"!= content_size_in_bytes - 8 (${length - 8})")
      val payload = new Array[Byte](payloadLen)
      bb.get(payload)
      val storedCrc = bb.getInt
      val crc = new java.util.zip.CRC32
      crc.update(payload)
      require(storedCrc == crc.getValue.toInt,
        s"Puffin DV blob in $file at $offset: CRC mismatch")
      val bm = DeletionVectors.deserialize(payload)
      cardinality.foreach(c => require(bm.cardinality == c,
        s"Puffin DV blob in $file at $offset: cardinality " +
          s"${bm.cardinality} != manifest record_count $c"))
      bm
    } finally raf.close()
  }

  /** Write a Puffin file holding one `deletion-vector-v1` blob per
    * `(referenced data file path, deleted positions)` pair, with a
    * spec-complete footer (uncompressed JSON FileMetadata — readers
    * that DO walk the footer, unlike [[readDv]], see every blob).
    * Returns one [[DvRef]] per blob, in input order. Fixture
    * machinery — real DVs are written by the lakehouse writer; this
    * speaks the same format.
    */
  def stage(file: java.io.File,
      dvs: Seq[(String, Seq[Long])]): Seq[DvRef] = {
    require(dvs.nonEmpty, "Puffin.stage: no deletion vectors to write")
    val out = new java.io.ByteArrayOutputStream()
    out.write(FileMagic)
    val refs = dvs.map { case (referenced, positions) =>
      val bm = new DeletionVectors.Bitmap64
      positions.foreach(bm.add)
      val payload = bm.serialize()
      val crc = new java.util.zip.CRC32
      crc.update(payload)
      val bb = java.nio.ByteBuffer.allocate(4 + payload.length + 4)
      bb.putInt(payload.length) // big-endian by default
      bb.put(payload)
      bb.putInt(crc.getValue.toInt)
      val offset = out.size().toLong
      out.write(bb.array())
      DvRef(referenced, offset, bb.capacity().toLong,
        Some(bm.cardinality))
    }
    // footer: magic + JSON payload + LE payload size + 4 zero flag
    // bytes (payload uncompressed) + magic
    val blobsJson = refs.map { r =>
      s"""{"type":"deletion-vector-v1","fields":[],""" +
        s""""offset":${r.offset},"length":${r.length},""" +
        s""""properties":{"referenced-data-file":"${r.referenced}",""" +
        s""""cardinality":"${r.cardinality.get}"}}"""
    }.mkString(",")
    val payload =
      s"""{"blobs":[$blobsJson],"properties":{"created-by":"graft"}}"""
        .getBytes("UTF-8")
    out.write(FileMagic)
    out.write(payload)
    val tail = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length)
    tail.putInt(0) // flags: uncompressed footer payload
    out.write(tail.array())
    out.write(FileMagic)
    java.nio.file.Files.write(file.toPath, out.toByteArray)
    refs
  }
}
