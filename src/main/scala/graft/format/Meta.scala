package graft.format

import org.apache.spark.sql.types.{DataType, StructType}

/** Footer metadata tree for a graft file.
  *
  * The reference keeps its header purely in memory and leaves
  * serialization to the embedder (steelcake/olive `src/header.zig:146-150`,
  * see SURVEY.md §0) — this file IS that missing wire spec. Layout:
  *
  * {{{
  *   [magic "GRFT" ][ data section: pages ... ][ footer bytes ]
  *   [ footerLen: i64 LE ][ magic "OLV1" ]
  * }}}
  *
  * A file holds N chunks (the reference's unit of I/O, `src/chunk.zig:15-38`);
  * each chunk holds M named tables sharing two chunk-global dictionaries of
  * 20/32-byte binaries (`src/dict.zig:209-212`). All sizes are u32-bounded
  * like the reference (`src/header.zig:35-45`); scale comes from many
  * chunks/files, never bigger chunks.
  */
object Meta {
  val MagicHead: Array[Byte] = "GRFT".getBytes
  val MagicTail: Array[Byte] = "OLV1".getBytes
  /** v2: per-table blockStats (zone maps) + blooms appended to the v1
    * layout. v3: per-column chunk `sum` stat (SUM pushdown) appended to
    * every ColStats record. The footer is parsed positionally, so a
    * version mismatch must fail AS a version mismatch, not as garbled
    * trailing fields. */
  /** v5: DeltaMeta per-page running bases, NaN-accounted float stats,
    * page+footer checksums, truncated string bounds. v6: byte-layout
    * IDENTICAL to v5; the only change is a CONVENTION on string bounds —
    * a truncated (prefix) min or bumped-prefix max is always written at
    * exactly [[Stats.MaxStringStat]] bytes (bumps 0x00-pad back to the
    * cap), so any stored string bound SHORTER than the cap is provably
    * the exact extreme value and MIN/MAX aggregates may serve it.
    * v5 bounds stay proofs only (a v5 bump could shrink below the cap
    * by trailing-0xff stripping, indistinguishable from an exact value). */
  val Version = 6

  /** 10^0 .. 10^18 as LITERAL doubles (all exactly representable: 5^18
    * needs 42 mantissa bits). Shared by the scaled-float writer verify and
    * reader decode — `math.pow` is allowed 1-ulp error and may differ
    * across JVMs/platforms, which would silently break the bit-exact
    * guarantee between writing and reading machines. */
  val Pow10: Array[Double] = Array(
    1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9,
    1e10, 1e11, 1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18)

  /** One compressed page of a logical buffer. `rowEnd` = exclusive end
    * element index, enabling page-range skipping (the reference records
    * this but never exploits it — `src/header.zig:41-45`). `hash` (v5)
    * is the xxhash64 of the COMPRESSED page bytes, verified before
    * every decompress: a storage bit flip inside a page surfaces as a
    * loud checksum refusal instead of silently decoding to wrong data
    * whenever the flipped payload still inflates to the right size. */
  case class PageMeta(offset: Long, compSize: Int, rawSize: Int, rowEnd: Int,
      hash: Long = 0L)

  /** xxhash64 (seed 0) over a byte range — the page and footer checksum.
    * Spark's own XXH64 (public API, also behind SQL `xxhash64`). */
  def xxh64(b: Array[Byte], off: Int, len: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off, len, 0L)

  /** A logical byte buffer stored as ≥0 pages under one codec. */
  case class BufferMeta(codec: Byte, rawSize: Long, pages: Vector[PageMeta])

  /** Chunk-global dictionary of fixed-width binaries. */
  case class DictMeta(width: Int, numEntries: Int, data: BufferMeta)

  sealed trait ColMeta { def validity: Option[BufferMeta] }
  /** Fixed-width values (ints/floats/decimals/fixed-size binary), or a
    * bit-packed bitmap for booleans. */
  case class PrimitiveMeta(validity: Option[BufferMeta], values: BufferMeta) extends ColMeta
  /** u32 indices into the chunk dict (width 20 or 32). */
  case class DictIdxMeta(validity: Option[BufferMeta], width: Int, indices: BufferMeta) extends ColMeta
  /** Var-width binary/string: i32 offsets (len+1, rebased to 0) + data. */
  case class BinaryMeta(validity: Option[BufferMeta], offsets: BufferMeta, data: BufferMeta) extends ColMeta
  /** Per-column dictionary-encoded var-width values: distinct entries as
    * (offsets, data) + one `idxWidth`-byte unsigned row index per row
    * (narrowest width that addresses the dictionary — flag columns with
    * ≤256 distinct values pay 1 byte/row, not 4). Chosen by the writer
    * when the column's distinct ratio makes it pay (low-cardinality
    * strings — parquet's dictionary trick, applied per column per chunk;
    * distinct from the chunk-global 20/32 dicts). */
  case class BinDictMeta(validity: Option[BufferMeta], numEntries: Int, idxWidth: Byte,
      dictOffsets: BufferMeta, dictData: BufferMeta, indices: BufferMeta) extends ColMeta
  /** Frame-of-reference narrowed integers: values stored as unsigned
    * `width`-byte deltas from `base`. Chosen by the writer when the
    * chunk's value range fits a narrower width than the logical type. */
  case class ForMeta(validity: Option[BufferMeta], base: Long, width: Byte,
      values: BufferMeta) extends ColMeta
  /** Narrow unsigned/half storage for olive's u8/u16/u32/u64/f16 types
    * (ref `src/write.zig:128-132`, `src/read.zig:192-196`): Spark has no
    * unsigned or half types, so the query-facing column is widened
    * (Short/Int/Long/Decimal(20,0)/Float — the same convention Spark's
    * parquet reader uses for UINT logical types) while disk keeps the
    * original narrow width. `logical` ∈ [[Logical]] codes. */
  case class UnsignedMeta(validity: Option[BufferMeta], logical: Byte,
      values: BufferMeta) extends ColMeta
  /** Measured-encoding wrapper for olive's unsigned types: the u8..u64
    * values, widened to their numeric i64 form, stored under one of the
    * integral encodings (FOR/delta/dict/REE/bit-pack) — chosen only when
    * it beats the NARROW plain layout by the usual 25%, so sorted u64
    * timestamps delta-compress while random u8 streams stay [[UnsignedMeta]].
    * `inner` carries no validity (the wrapper owns it). */
  case class UnsignedPackedMeta(validity: Option[BufferMeta], logical: Byte,
      inner: ColMeta) extends ColMeta
  /** Run-end encoding (the reference's REE storage, `src/write.zig:405-421`,
    * `src/read.zig:431-448`): `ends` holds one exclusive i32 row end per
    * run, `values` one fixed-width value per run. Chosen by the writer
    * when runs at least halve the plain footprint (sorted keys, near-
    * constant flags, date columns). */
  case class ReeMeta(validity: Option[BufferMeta], ends: BufferMeta,
      values: BufferMeta) extends ColMeta
  /** Per-column dictionary for FIXED-width primitives (parquet's dict
    * trick applied beyond strings): `entries` holds the distinct values
    * in first-seen order, `indices` one `idxWidth`-byte unsigned index
    * per row. Chosen when distinct·width + n·idxWidth beats the
    * alternatives — low-cardinality measures (quantities, rates, status
    * codes) and clustered dates shrink 4–8×. */
  case class PrimDictMeta(validity: Option[BufferMeta], numEntries: Int,
      idxWidth: Byte, entries: BufferMeta, indices: BufferMeta) extends ColMeta
  /** Bit-packed frame-of-reference: values stored as `bits`-wide (1..56,
    * NOT byte-aligned) unsigned deltas from `base` in one LSB-first
    * little-endian bitstream, with 8 zero pad bytes at the end so the
    * reader can always unpack via whole-word loads. Extends [[ForMeta]]
    * to the widths parquet's bit-packing covers: a 20-bit key range pays
    * 2.5 bytes/value instead of FOR's 4, and 33..56-bit ranges (no FOR
    * width exists) pack instead of falling to plain. */
  case class BitPackMeta(validity: Option[BufferMeta], base: Long, bits: Byte,
      values: BufferMeta) extends ColMeta
  /** Delta encoding for integral columns whose CONSECUTIVE differences
    * are narrow (sorted/clustered keys, timestamps in arrival order):
    * `first` + n zigzag-encoded `width`-byte deltas (delta[0] == 0).
    * Prefix-decodable (cumulative sum). `pageBases` (footer v5) records
    * the running value at each page's LAST element, aligned with
    * `deltas.pages`, so a mid-range read resumes the sum at the first
    * overlapping page instead of replaying the stream from 0 — the
    * natural delta targets (sorted long keys) are exactly the columns
    * selective range reads hit. Empty = pre-v5 fallback (full replay). */
  case class DeltaMeta(validity: Option[BufferMeta], first: Long, width: Byte,
      deltas: BufferMeta, pageBases: Vector[Long] = Vector.empty) extends ColMeta
  /** ALP-style decimal scaling for float/double columns (the public
    * technique behind DuckDB's ALP: most "real" doubles are short
    * decimals): values verified bit-exact as `m / 10^exponent` store the
    * integer `m` stream under `inner` — one of the integral encodings
    * (FOR/delta/dict/REE), which is where the actual compression comes
    * from. `inner` carries no validity (the wrapper owns it). Chosen only
    * when EVERY value in the chunk round-trips bit-exactly; columns with
    * NaN/Inf/true-real values fall back to plain. */
  case class ScaledMeta(validity: Option[BufferMeta], exponent: Byte,
      inner: ColMeta) extends ColMeta
  case class ListMeta(validity: Option[BufferMeta], offsets: BufferMeta, child: ColMeta) extends ColMeta
  case class StructMeta(validity: Option[BufferMeta], children: Vector[ColMeta]) extends ColMeta
  case class MapMeta(validity: Option[BufferMeta], offsets: BufferMeta, key: ColMeta, value: ColMeta) extends ColMeta

  /** Zone-map granularity: block stats cover [i*BlockRows, (i+1)*BlockRows)
    * within a chunk (parquet's column-index / ClickHouse-granule idea). */
  val BlockRows = 8192

  /** `stats` is per top-level column, aligned with `columns` (chunk-level
    * min/max/null info for scan pruning — an extension over the
    * reference; see [[Stats]]). `blockStats` refines it per [[BlockRows]]
    * row block (outer: block index, inner: column) so selective filters
    * on clustered data decode blocks, not whole 128Ki-row chunks; empty
    * when the chunk spans <= 1 block. */
  /** `nestedStats` (footer v4): chunk-level zone maps for ONE level of
    * struct leaves, keyed by the dotted name Spark's filter translation
    * uses for nested references (`meta.source`) — a predicate into a
    * metadata struct prunes chunks exactly like a top-level column.
    * Optional and advisory: files written by older versions simply
    * don't prune on nested fields. */
  case class TableMeta(name: String, numRows: Int, schema: StructType,
      columns: Vector[ColMeta], stats: Vector[ColStats],
      blockStats: Vector[Vector[ColStats]] = Vector.empty,
      blooms: Map[String, Bloom.Bits] = Map.empty,
      nestedStats: Map[String, ColStats] = Map.empty,
      blockNestedStats: Vector[Map[String, ColStats]] = Vector.empty)
  case class ChunkMeta(dict20: DictMeta, dict32: DictMeta, tables: Vector[TableMeta])
  case class Footer(version: Int, dataSectionSize: Long, chunks: Vector[ChunkMeta])

  // ---- serialization ------------------------------------------------------

  def write(f: Footer): Array[Byte] = {
    val b = new Bytes(1024)
    b.putLong(0L) // footer checksum placeholder, filled below
    b.putInt(f.version)
    b.putLong(f.dataSectionSize)
    b.putInt(f.chunks.size)
    f.chunks.foreach { c =>
      writeDict(b, c.dict20)
      writeDict(b, c.dict32)
      b.putInt(c.tables.size)
      c.tables.foreach { t =>
        writeString(b, t.name)
        b.putInt(t.numRows)
        writeString(b, t.schema.json)
        b.putInt(t.columns.size)
        t.columns.foreach(writeCol(b, _))
        // the stats sections are POSITIONAL (read() consumes exactly
        // nCols per table/block with no count of their own): a
        // mis-sized TableMeta would serialize into a footer that fails
        // far downstream with a misleading error — refuse at the source
        if (t.stats.size != t.columns.size)
          throw new OliveFormatException(
            s"table ${t.name}: ${t.stats.size} chunk stats for ${t.columns.size} columns")
        t.blockStats.zipWithIndex.foreach { case (blk, i) =>
          if (blk.size != t.columns.size)
            throw new OliveFormatException(
              s"table ${t.name}: block $i has ${blk.size} stats for ${t.columns.size} columns")
        }
        t.stats.foreach(writeStats(b, _))
        b.putInt(t.blockStats.size)
        t.blockStats.foreach(_.foreach(writeStats(b, _)))
        b.putInt(t.blooms.size)
        // sorted for a deterministic footer byte-stream
        t.blooms.toSeq.sortBy(_._1).foreach { case (col, bits) =>
          writeString(b, col)
          b.putInt(bits.bytes.length)
          b.putBytes(bits.bytes)
        }
        b.putInt(t.nestedStats.size)
        t.nestedStats.toSeq.sortBy(_._1).foreach { case (attr, st) =>
          writeString(b, attr)
          writeStats(b, st)
        }
        // per-block refinement of the nested-leaf maps (empty when the
        // chunk fits one block, like blockStats)
        b.putInt(t.blockNestedStats.size)
        t.blockNestedStats.foreach { m =>
          b.putInt(m.size)
          m.toSeq.sortBy(_._1).foreach { case (attr, st) =>
            writeString(b, attr)
            writeStats(b, st)
          }
        }
      }
    }
    // footer checksum (v5): xxhash64 of everything after the 8-byte hash
    // slot — metadata corruption (a flipped stat byte would silently
    // prove wrong skips) refuses at parse like data-page corruption does
    val out = b.toArray
    Bytes.le(out).putLong(0, xxh64(out, 8, out.length - 8))
    out
  }

  private def writeStats(b: Bytes, st: ColStats): Unit = {
    b.putInt(st.nullCount)
    b.putInt(st.nanCount) // v5: float/double NaN accounting
    writeOptBytes(b, st.min)
    writeOptBytes(b, st.max)
    writeOptBytes(b, st.sum)
  }

  private def writeOptBytes(b: Bytes, v: Option[Array[Byte]]): Unit = v match {
    case Some(bytes) => b.putByte(1); b.putInt(bytes.length); b.putBytes(bytes)
    case None        => b.putByte(0)
  }

  private def writeString(b: Bytes, s: String): Unit = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    b.putInt(bytes.length); b.putBytes(bytes)
  }

  private def writeBuffer(b: Bytes, m: BufferMeta): Unit = {
    b.putByte(m.codec)
    b.putLong(m.rawSize)
    b.putInt(m.pages.size)
    m.pages.foreach { p =>
      b.putLong(p.offset); b.putInt(p.compSize); b.putInt(p.rawSize); b.putInt(p.rowEnd)
      b.putLong(p.hash)
    }
  }

  private def writeDict(b: Bytes, d: DictMeta): Unit = {
    b.putInt(d.width); b.putInt(d.numEntries); writeBuffer(b, d.data)
  }

  private def writeOptBuffer(b: Bytes, m: Option[BufferMeta]): Unit = m match {
    case Some(v) => b.putByte(1); writeBuffer(b, v)
    case None    => b.putByte(0)
  }

  private def writeCol(b: Bytes, c: ColMeta): Unit = c match {
    case PrimitiveMeta(v, values) =>
      b.putByte(0); writeOptBuffer(b, v); writeBuffer(b, values)
    case DictIdxMeta(v, w, idx) =>
      b.putByte(1); writeOptBuffer(b, v); b.putInt(w); writeBuffer(b, idx)
    case BinaryMeta(v, off, data) =>
      b.putByte(2); writeOptBuffer(b, v); writeBuffer(b, off); writeBuffer(b, data)
    case ListMeta(v, off, child) =>
      b.putByte(3); writeOptBuffer(b, v); writeBuffer(b, off); writeCol(b, child)
    case StructMeta(v, children) =>
      b.putByte(4); writeOptBuffer(b, v); b.putInt(children.size); children.foreach(writeCol(b, _))
    case MapMeta(v, off, k, vl) =>
      b.putByte(5); writeOptBuffer(b, v); writeBuffer(b, off); writeCol(b, k); writeCol(b, vl)
    case BinDictMeta(v, n, w, dOff, dData, idx) =>
      b.putByte(6); writeOptBuffer(b, v); b.putInt(n); b.putByte(w)
      writeBuffer(b, dOff); writeBuffer(b, dData); writeBuffer(b, idx)
    case ForMeta(v, base, width, values) =>
      b.putByte(7); writeOptBuffer(b, v); b.putLong(base); b.putByte(width)
      writeBuffer(b, values)
    case UnsignedMeta(v, logical, values) =>
      b.putByte(8); writeOptBuffer(b, v); b.putByte(logical); writeBuffer(b, values)
    case ReeMeta(v, ends, values) =>
      b.putByte(9); writeOptBuffer(b, v); writeBuffer(b, ends); writeBuffer(b, values)
    case PrimDictMeta(v, n, w, entries, indices) =>
      b.putByte(10); writeOptBuffer(b, v); b.putInt(n); b.putByte(w)
      writeBuffer(b, entries); writeBuffer(b, indices)
    case DeltaMeta(v, first, width, deltas, bases) =>
      b.putByte(11); writeOptBuffer(b, v); b.putLong(first); b.putByte(width)
      writeBuffer(b, deltas)
      b.putInt(bases.size); bases.foreach(b.putLong)
    case ScaledMeta(v, exponent, inner) =>
      b.putByte(12); writeOptBuffer(b, v); b.putByte(exponent); writeCol(b, inner)
    case BitPackMeta(v, base, bits, values) =>
      b.putByte(13); writeOptBuffer(b, v); b.putLong(base); b.putByte(bits)
      writeBuffer(b, values)
    case UnsignedPackedMeta(v, logical, inner) =>
      b.putByte(14); writeOptBuffer(b, v); b.putByte(logical); writeCol(b, inner)
  }

  // ---- parsing (untrusted input: every field bounds-checked) --------------

  private final val MaxCount = 1 << 24 // tables/columns/pages sanity cap

  def read(bytes: Array[Byte]): Footer = {
    if (bytes.length < 12)
      throw new OliveFormatException(s"footer too small: ${bytes.length} bytes")
    // READ compatibility: a v4 footer (written before this round) leads
    // with its version int — no checksum, 4-field pages, no NaN counts,
    // no delta bases. It parses with those fields defaulted and the
    // reader skips page verification (v4 pages carry no hash). Tables
    // written last month must not brick on upgrade.
    if (Bytes.le(bytes).getInt(0) == 4)
      return readBody(new ByteCursor(bytes), expect = 4)
    // v5+ footer checksum: leading 8 bytes hash the rest; verified
    // BEFORE any parse so corrupt metadata (a flipped stat would prove
    // wrong skips) refuses as corruption, not a confusing parse error
    if (Bytes.le(bytes).getLong(0) != xxh64(bytes, 8, bytes.length - 8))
      throw new OliveFormatException("footer checksum mismatch (corrupt metadata)")
    val c = new ByteCursor(bytes)
    c.getLong() // the verified checksum
    readBody(c, expect = Version)
  }

  private def readBody(c: ByteCursor, expect: Int): Footer = {
    val version = c.getInt()
    // v5 parses with the current (v6) layout — the two differ only in
    // the string-bound exactness convention, which consumers gate on
    // `footer.version` (v5 string bounds are never served as values)
    val ok = version == expect || (expect == Version && version == 5)
    if (!ok) throw new OliveFormatException(s"unsupported version $version")
    val dataSize = c.getLong()
    if (dataSize < 0) throw new OliveFormatException("negative data section size")
    val nChunks = checkedCount(c.getInt(), "chunks")
    val chunks = Vector.fill(nChunks) {
      val d20 = readDict(c, 20, version)
      val d32 = readDict(c, 32, version)
      val nTables = checkedCount(c.getInt(), "tables")
      val tables = Vector.fill(nTables) {
        val name = c.getString()
        val numRows = c.getInt()
        if (numRows < 0) throw new OliveFormatException("negative numRows")
        val schemaJson = c.getString()
        val schema = try DataType.fromJson(schemaJson) match {
          case s: StructType => s
          case other => throw new OliveFormatException(s"table schema is not a struct: $other")
        } catch {
          case e: OliveFormatException => throw e
          case e: Exception => throw new OliveFormatException(s"bad schema json", e)
        }
        val nCols = checkedCount(c.getInt(), "columns")
        if (nCols != schema.size)
          throw new OliveFormatException(s"column count $nCols != schema fields ${schema.size}")
        val cols = Vector.fill(nCols)(readCol(c, 0, version))
        // min/max widths are checked against the declared column type
        // HERE, not at compare time: a hostile 3-byte "min" on a long
        // column would otherwise crash the skip compare mid-scan instead
        // of refusing cleanly; sums are always written as 8 bytes
        def readNanCount(dt: DataType, nullCount: Int, maxRows: Int): Int = {
          if (version < 5) return 0 // v4 stats carry no NaN accounting
          val nanCount = c.getInt()
          if (nanCount < 0 || nanCount.toLong + nullCount > maxRows)
            throw new OliveFormatException(
              s"NaN count $nanCount + $nullCount nulls outside $maxRows rows")
          // only float/double columns can hold NaNs — a lying count on
          // any other type must refuse, not silently skew skip logic
          if (nanCount > 0 && dt != org.apache.spark.sql.types.FloatType &&
              dt != org.apache.spark.sql.types.DoubleType)
            throw new OliveFormatException(
              s"NaN count $nanCount on non-float ${dt.simpleString}")
          nanCount
        }
        def readStats(ci: Int, nullCount: Int, maxRows: Int): ColStats = {
          val dt = schema.fields(ci).dataType
          val nanCount = readNanCount(dt, nullCount, maxRows)
          val st = ColStats(nullCount, readOptBytes(c), readOptBytes(c),
            readOptBytes(c), nanCount)
          (st.min.toSeq ++ st.max.toSeq).foreach { b =>
            if (!Stats.statBytesOk(dt, b))
              throw new OliveFormatException(
                s"stat width ${b.length} illegal for ${dt.simpleString} column ${schema.fields(ci).name}")
          }
          st.sum.foreach { b =>
            if (b.length != 8)
              throw new OliveFormatException(s"sum stat width ${b.length} != 8")
          }
          st
        }
        val stats = Vector.tabulate(nCols) { ci =>
          val nullCount = c.getInt()
          if (nullCount < 0 || nullCount > numRows)
            throw new OliveFormatException(s"null count $nullCount outside $numRows rows")
          readStats(ci, nullCount, numRows)
        }
        val nBlocks = c.getInt()
        val expectBlocks = (numRows + BlockRows - 1) / BlockRows
        if (nBlocks != 0 && nBlocks != expectBlocks)
          throw new OliveFormatException(s"block stat count $nBlocks != $expectBlocks")
        val blockStats = Vector.fill(nBlocks) {
          Vector.tabulate(nCols) { ci =>
            val nullCount = c.getInt()
            if (nullCount < 0 || nullCount > BlockRows)
              throw new OliveFormatException(s"block null count $nullCount > $BlockRows")
            readStats(ci, nullCount, BlockRows)
          }
        }
        val nBlooms = c.getInt()
        if (nBlooms < 0 || nBlooms > nCols)
          throw new OliveFormatException(s"bad bloom count $nBlooms")
        val blooms = Vector.fill(nBlooms) {
          val col = c.getString()
          if (!schema.fieldNames.contains(col))
            throw new OliveFormatException(s"bloom for unknown column $col")
          val len = c.getInt()
          if (len < 0 || len > Bloom.MaxBytes)
            throw new OliveFormatException(s"bad bloom size $len")
          col -> Bloom.Bits(c.getBytes(len))
        }.toMap
        // v4 nested-leaf zone maps: every entry must resolve to a real
        // struct leaf and pass the same width checks as column stats —
        // the footer is untrusted, a lying width must refuse cleanly
        val nNested = checkedCount(c.getInt(), "nested stats")
        val nestedStats = Vector.fill(nNested) {
          val attr = c.getString()
          val dt = Stats.leafType(schema, attr).getOrElse(
            throw new OliveFormatException(s"nested stat for unknown leaf $attr"))
          val nullCount = c.getInt()
          if (nullCount < 0 || nullCount > numRows)
            throw new OliveFormatException(
              s"nested null count $nullCount outside $numRows rows")
          val nanCount = readNanCount(dt, nullCount, numRows)
          val st = ColStats(nullCount, readOptBytes(c), readOptBytes(c),
            readOptBytes(c), nanCount)
          (st.min.toSeq ++ st.max.toSeq).foreach { b =>
            if (!Stats.statBytesOk(dt, b))
              throw new OliveFormatException(
                s"nested stat width ${b.length} illegal for ${dt.simpleString} leaf $attr")
          }
          st.sum.foreach { b =>
            if (b.length != 8)
              throw new OliveFormatException(s"nested sum stat width ${b.length} != 8")
          }
          attr -> st
        }.toMap
        val nNestedBlocks = c.getInt()
        if (nNestedBlocks != 0 && nNestedBlocks != expectBlocks)
          throw new OliveFormatException(
            s"nested block stat count $nNestedBlocks != $expectBlocks")
        val blockNestedStats = Vector.fill(nNestedBlocks) {
          val m = checkedCount(c.getInt(), "nested block stats")
          Vector.fill(m) {
            val attr = c.getString()
            val dt = Stats.leafType(schema, attr).getOrElse(
              throw new OliveFormatException(s"nested block stat for unknown leaf $attr"))
            val nullCount = c.getInt()
            if (nullCount < 0 || nullCount > BlockRows)
              throw new OliveFormatException(
                s"nested block null count $nullCount > $BlockRows")
            val nanCount = readNanCount(dt, nullCount, BlockRows)
            val st = ColStats(nullCount, readOptBytes(c), readOptBytes(c),
              readOptBytes(c), nanCount)
            (st.min.toSeq ++ st.max.toSeq).foreach { b =>
              if (!Stats.statBytesOk(dt, b))
                throw new OliveFormatException(
                  s"nested block stat width ${b.length} illegal for ${dt.simpleString} leaf $attr")
            }
            st.sum.foreach { b =>
              if (b.length != 8)
                throw new OliveFormatException(s"nested sum stat width ${b.length} != 8")
            }
            attr -> st
          }.toMap
        }
        TableMeta(name, numRows, schema, cols, stats, blockStats, blooms,
          nestedStats, blockNestedStats)
      }
      ChunkMeta(d20, d32, tables)
    }
    if (c.remaining != 0) throw new OliveFormatException(s"${c.remaining} trailing footer bytes")
    Footer(version, dataSize, chunks)
  }

  private def checkedCount(n: Int, what: String): Int = {
    if (n < 0 || n > MaxCount) throw new OliveFormatException(s"bad $what count $n")
    n
  }

  private def readBuffer(c: ByteCursor, ver: Int): BufferMeta = {
    val codec = c.getByte()
    if (codec < 0 || codec > Codec.Zstd1) throw new OliveFormatException(s"bad codec $codec")
    val rawSize = c.getLong()
    if (rawSize < 0) throw new OliveFormatException("negative buffer size")
    val nPages = checkedCount(c.getInt(), "pages")
    var sum = 0L
    val pages = Vector.fill(nPages) {
      val p = PageMeta(c.getLong(), c.getInt(), c.getInt(), c.getInt(),
        if (ver >= 5) c.getLong() else 0L) // v4 pages carry no hash
      if (p.offset < 0 || p.compSize < 0 || p.rawSize < 0 || p.rowEnd < 0)
        throw new OliveFormatException("negative page field")
      sum += p.rawSize
      p
    }
    if (sum != rawSize) throw new OliveFormatException(s"page raw sizes $sum != buffer size $rawSize")
    BufferMeta(codec, rawSize, pages)
  }

  private def readDict(c: ByteCursor, expectWidth: Int, ver: Int): DictMeta = {
    val width = c.getInt()
    if (width != expectWidth) throw new OliveFormatException(s"dict width $width != $expectWidth")
    val n = c.getInt()
    if (n < 0) throw new OliveFormatException("negative dict entries")
    val data = readBuffer(c, ver)
    if (data.rawSize != n.toLong * width)
      throw new OliveFormatException(s"dict size ${data.rawSize} != $n * $width")
    DictMeta(width, n, data)
  }

  private def readOptBytes(c: ByteCursor): Option[Array[Byte]] = c.getByte() match {
    case 0 => None
    case 1 =>
      val n = c.getInt()
      if (n < 0 || n > (1 << 20)) throw new OliveFormatException(s"bad stat length $n")
      Some(c.getBytes(n))
    case other => throw new OliveFormatException(s"bad option tag $other")
  }

  private def readOptBuffer(c: ByteCursor, ver: Int): Option[BufferMeta] = c.getByte() match {
    case 0 => None
    case 1 => Some(readBuffer(c, ver))
    case other => throw new OliveFormatException(s"bad option tag $other")
  }

  /** Deepest column-meta nesting the reader accepts; the write side
    * ([[TableBuffer.schemaDepthOk]]) caps declared schemas one level
    * lower so a measured wrapper can never push a written file past it. */
  private[format] final val MaxDepth = 16

  private def readCol(c: ByteCursor, depth: Int, ver: Int): ColMeta = {
    if (depth > MaxDepth) throw new OliveFormatException("column nesting too deep")
    c.getByte() match {
      case 0 => PrimitiveMeta(readOptBuffer(c, ver), readBuffer(c, ver))
      case 1 =>
        val v = readOptBuffer(c, ver)
        val w = c.getInt()
        if (w != 20 && w != 32) throw new OliveFormatException(s"bad dict column width $w")
        DictIdxMeta(v, w, readBuffer(c, ver))
      case 2 => BinaryMeta(readOptBuffer(c, ver), readBuffer(c, ver), readBuffer(c, ver))
      case 3 => ListMeta(readOptBuffer(c, ver), readBuffer(c, ver), readCol(c, depth + 1, ver))
      case 4 =>
        val v = readOptBuffer(c, ver)
        val n = checkedCount(c.getInt(), "struct children")
        StructMeta(v, Vector.fill(n)(readCol(c, depth + 1, ver)))
      case 5 => MapMeta(readOptBuffer(c, ver), readBuffer(c, ver), readCol(c, depth + 1, ver), readCol(c, depth + 1, ver))
      case 6 =>
        val v = readOptBuffer(c, ver)
        val n = c.getInt()
        if (n < 0) throw new OliveFormatException(s"bad dict entry count $n")
        val w = c.getByte()
        if (w != 1 && w != 2 && w != 4)
          throw new OliveFormatException(s"bad dict index width $w")
        BinDictMeta(v, n, w, readBuffer(c, ver), readBuffer(c, ver), readBuffer(c, ver))
      case 7 =>
        val v = readOptBuffer(c, ver)
        val base = c.getLong()
        val width = c.getByte()
        if (width != 1 && width != 2 && width != 4)
          throw new OliveFormatException(s"bad FOR width $width")
        ForMeta(v, base, width, readBuffer(c, ver))
      case 8 =>
        val v = readOptBuffer(c, ver)
        val logical = c.getByte()
        if (logical < Logical.U8 || logical > Logical.F16)
          throw new OliveFormatException(s"bad unsigned logical code $logical")
        UnsignedMeta(v, logical, readBuffer(c, ver))
      case 9 =>
        val v = readOptBuffer(c, ver)
        ReeMeta(v, readBuffer(c, ver), readBuffer(c, ver))
      case 10 =>
        val v = readOptBuffer(c, ver)
        val n = c.getInt()
        if (n < 0) throw new OliveFormatException(s"bad prim dict entry count $n")
        val w = c.getByte()
        if (w != 1 && w != 2 && w != 4)
          throw new OliveFormatException(s"bad prim dict index width $w")
        PrimDictMeta(v, n, w, readBuffer(c, ver), readBuffer(c, ver))
      case 11 =>
        val v = readOptBuffer(c, ver)
        val first = c.getLong()
        val width = c.getByte()
        if (width != 1 && width != 2 && width != 4)
          throw new OliveFormatException(s"bad delta width $width")
        val deltas = readBuffer(c, ver)
        if (ver < 5) DeltaMeta(v, first, width, deltas) // v4: no bases
        else {
          val nBases = checkedCount(c.getInt(), "delta page bases")
          // bases align 1:1 with pages (or are wholly absent); a count that
          // disagrees is a malformed footer, not a degraded decode
          if (nBases != 0 && nBases != deltas.pages.size)
            throw new OliveFormatException(
              s"delta page bases $nBases != pages ${deltas.pages.size}")
          DeltaMeta(v, first, width, deltas, Vector.fill(nBases)(c.getLong()))
        }
      case 12 =>
        val v = readOptBuffer(c, ver)
        val exponent = c.getByte()
        if (exponent < 0 || exponent > 18)
          throw new OliveFormatException(s"bad scale exponent $exponent")
        ScaledMeta(v, exponent, readWrappedInner(c, depth, "scaled", ver))
      case 13 =>
        val v = readOptBuffer(c, ver)
        val base = c.getLong()
        val bits = c.getByte()
        if (bits < 1 || bits > 56)
          throw new OliveFormatException(s"bad bit-pack width $bits")
        BitPackMeta(v, base, bits, readBuffer(c, ver))
      case 14 =>
        val v = readOptBuffer(c, ver)
        val logical = c.getByte()
        if (logical < Logical.U8 || logical > Logical.U64)
          throw new OliveFormatException(s"bad packed unsigned code $logical")
        UnsignedPackedMeta(v, logical, readWrappedInner(c, depth, "packed unsigned", ver))
      case other => throw new OliveFormatException(s"bad column tag $other")
    }
  }

  /** The inner stream of a measured WRAPPER (ScaledMeta /
    * UnsignedPackedMeta): a validity-less flat integral encoding — the
    * one allowed-set definition both wrappers share, so the validation
    * can never drift between them. */
  private def readWrappedInner(c: ByteCursor, depth: Int, kind: String, ver: Int): ColMeta = {
    val inner = readCol(c, depth + 1, ver)
    val innerOk = inner match {
      case _: PrimitiveMeta | _: ForMeta | _: ReeMeta | _: PrimDictMeta |
           _: DeltaMeta | _: BitPackMeta => true
      case _ => false
    }
    if (!innerOk || inner.validity.nonEmpty)
      throw new OliveFormatException(s"bad $kind inner encoding")
    inner
  }
}
