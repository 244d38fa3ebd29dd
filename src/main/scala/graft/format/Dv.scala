package graft.format

/** Position-delete vector ("DV") blob codec — the merge-on-read DELETE
  * sidecar. A DV names the 0-based row ordinals of ONE data file's table
  * (footer chunk order) that are logically deleted; readers subtract the
  * positions from their decode ranges, so a 10-row DELETE against a
  * 100 TB table writes kilobytes instead of rewriting gigabyte files
  * (the Iceberg/Delta deletion-vector idea, re-expressed over graft's
  * generation manifests).
  *
  * Layout (little-endian):
  * {{{
  *   magic  "GDV1"                      4 bytes
  *   count  u32                         number of positions
  *   body   delta-varint positions      first absolute, then gaps (>= 1)
  *   hash   xxhash64(magic..body) u64   verified BEFORE any position is
  *                                      trusted — a corrupt DV must fail
  *                                      loudly, never resurrect/drop rows
  * }}}
  *
  * Positions are strictly increasing; a blob that decodes out of order,
  * truncated, oversized, or checksum-broken is refused. Sparse deletes
  * (the common shape) cost ~1-2 bytes per position.
  */
object Dv {

  private val Magic: Array[Byte] = "GDV1".getBytes("UTF-8")

  /** Encode a STRICTLY increasing, non-negative position list. */
  def encode(positions: Array[Long]): Array[Byte] = {
    var i = 0
    while (i < positions.length) {
      require(positions(i) >= 0, s"negative delete position ${positions(i)}")
      require(i == 0 || positions(i) > positions(i - 1),
        s"delete positions must be strictly increasing: " +
          s"${positions(i - 1)} then ${positions(i)}")
      i += 1
    }
    val w = new Bytes(16 + positions.length * 2)
    w.putBytes(Magic)
    w.putInt(positions.length)
    var prev = -1L
    i = 0
    while (i < positions.length) {
      putVarint(w, positions(i) - prev) // first: pos+1; rest: gap >= 1
      prev = positions(i)
      i += 1
    }
    val body = w.toArray
    val out = new Bytes(body.length + 8)
    out.putBytes(body)
    out.putLong(Meta.xxh64(body, 0, body.length))
    out.toArray
  }

  /** Decode + validate a DV blob. `maxPos` (exclusive) bounds every
    * position when >= 0 — a DV claiming to delete row 10^9 of a 10^6-row
    * file is corruption, not a no-op. */
  def decode(bytes: Array[Byte], maxPos: Long = -1L): Array[Long] = {
    if (bytes.length < Magic.length + 4 + 8)
      fail(s"${bytes.length} bytes is too short for a DV blob")
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic(i)) fail("bad magic (not a GDV1 blob)")
      i += 1
    }
    val stored = Bytes.le(bytes).getLong(bytes.length - 8)
    val computed = Meta.xxh64(bytes, 0, bytes.length - 8)
    if (stored != computed)
      fail(f"checksum mismatch (stored $stored%016x, computed $computed%016x)")
    val r = new ByteCursor(bytes, Magic.length, bytes.length - 8)
    val count = r.getInt()
    if (count < 0) fail(s"negative position count $count")
    val out = new Array[Long](count)
    var prev = -1L
    i = 0
    while (i < count) {
      val gap = getVarint(r)
      if (gap <= 0) fail(s"non-positive position gap $gap at index $i")
      val pos = prev + gap
      if (pos < 0) fail(s"position overflow at index $i")
      if (maxPos >= 0 && pos >= maxPos)
        fail(s"position $pos beyond the file's $maxPos rows")
      out(i) = pos
      prev = pos
      i += 1
    }
    if (r.remaining != 0) fail(s"${r.remaining} trailing bytes after $count positions")
    out
  }

  /** Sorted-set union of two position lists (both strictly increasing). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c < 0) { out(k) = a(i); i += 1 }
      else if (c > 0) { out(k) = b(j); j += 1 }
      else { out(k) = a(i); i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  /** Subtract the deleted positions in [r0, r1) from that range: the
    * surviving CONTIGUOUS sub-ranges, in order. `deleted` is strictly
    * increasing; positions outside [r0, r1) are ignored. The common
    * no-deletes-here case returns the input range unchanged. */
  def liveRanges(r0: Long, r1: Long, deleted: Array[Long]): Seq[(Long, Long)] = {
    var lo = java.util.Arrays.binarySearch(deleted, r0)
    if (lo < 0) lo = -lo - 1
    if (lo >= deleted.length || deleted(lo) >= r1) return Seq((r0, r1))
    val out = Seq.newBuilder[(Long, Long)]
    var cur = r0
    var i = lo
    while (i < deleted.length && deleted(i) < r1) {
      if (deleted(i) > cur) out += ((cur, deleted(i)))
      cur = deleted(i) + 1
      i += 1
    }
    if (cur < r1) out += ((cur, r1))
    out.result()
  }

  private def putVarint(w: Bytes, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      w.putByte(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    w.putByte(v.toByte)
  }

  private def getVarint(r: ByteCursor): Long = {
    var v = 0L
    var shift = 0
    var b = 0
    do {
      if (shift > 63) fail("varint longer than 64 bits")
      b = r.getByte() & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  private def fail(msg: String): Nothing =
    throw new OliveFormatException(s"corrupt delete vector: $msg")
}
