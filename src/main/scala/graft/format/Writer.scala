package graft.format

import java.io.OutputStream

import org.apache.spark.sql.types.StructType

import Meta._

/** Serializes logical buffers into compressed pages appended to the data
  * section. Fixed-width buffers split at page-size byte boundaries
  * (reference `src/write.zig:919-960`); var-width data buffers split on
  * value boundaries so each page decompresses to whole values
  * (`src/write.zig:859-917`).
  */
final class PageSink(out: OutputStream, pageSize: Int, bias: String) {
  private var pos: Long = 0L
  def position: Long = pos

  private val dataCodec: Byte =
    if (bias == "read_optimized") Codec.Lz4Hc else Codec.Zstd1

  /** Codec for fixed-width value buffers. The reference pins these to
    * lz4 (`src/write.zig:774-779`) — kept for `balanced`/`read_optimized`;
    * the extra `compact` bias trades decode speed for zstd ratios on
    * cold data. */
  val valuesCodec: Byte = if (bias == "compact") Codec.Zstd1 else Codec.Lz4

  private def writePage(src: Array[Byte], off: Int, len: Int, codec: Byte, rowEnd: Int): PageMeta = {
    val comp = Codec.compress(codec, src, off, len)
    out.write(comp)
    val m = PageMeta(pos, comp.length, len, rowEnd)
    pos += comp.length
    m
  }

  /** Fixed-width buffer: ⌈len/pageSize⌉ pages; rowEnd = element index. */
  def writeBuffer(src: Array[Byte], len: Int, codec: Byte, elemSize: Int): BufferMeta = {
    val pages = Vector.newBuilder[PageMeta]
    var off = 0
    while (off < len || (off == 0 && len == 0)) {
      val n = math.min(pageSize, len - off)
      pages += writePage(src, off, n, codec, (off + n) / math.max(elemSize, 1))
      off += n
      if (len == 0) off = 1 // single empty page, then stop
    }
    BufferMeta(codec, len, if (len == 0) pages.result().take(1) else pages.result())
  }

  /** Var-width data buffer paged on value boundaries, bias-compressed.
    * Reads the builder's entries directly — width-agnostic (i32 and the
    * largeOffsets i64 dialect page identically), and no throwaway
    * serialization of the offsets on the hot write path. */
  def writeDataBuffer(src: Array[Byte], offsets: OffsetsBuilder): BufferMeta = {
    val numVals = offsets.size - 1
    val pages = Vector.newBuilder[PageMeta]
    var pageStart = 0
    var v = 0
    var total = 0
    var lastEnd = 0
    while (v < numVals) {
      val end = offsets.entry(v + 1)
      if (end - pageStart >= pageSize) {
        pages += writePage(src, pageStart, end - pageStart, dataCodec, v + 1)
        total += end - pageStart
        pageStart = end
      }
      lastEnd = end
      v += 1
    }
    if (lastEnd > pageStart || total == 0) {
      pages += writePage(src, pageStart, lastEnd - pageStart, dataCodec, numVals)
      total += lastEnd - pageStart
    }
    BufferMeta(dataCodec, total, pages.result())
  }

  /** Dict entries: raw uncompressed page(s), like the reference
    * (`src/write.zig:103-112`). */
  def writeDictData(src: Array[Byte]): BufferMeta =
    writeBuffer(src, src.length, Codec.None, 1)
}

/** One buffered table inside a chunk being assembled. `bloomCols` names
  * columns that collect a per-chunk Bloom filter (see [[Bloom]]);
  * unsupported types in the list are silently ignored. */
final class TableBuffer(val name: String, val schema: StructType,
    bloomCols: Set[String] = Set.empty) {
  val encoders: IndexedSeq[ColumnEncoder] =
    schema.fields.map(f => ColumnEncoder.forType(f.dataType, f.metadata)).toIndexedSeq
  // stats do NO per-row work: chunk and block zone maps are computed
  // columnar from the encoders' buffers at encode time
  // ([[ColumnEncoder.statsRange]]) — a tight per-column loop over
  // contiguous memory instead of two collector updates per cell
  // (ordinal, byte extractor, builder) per bloom'd column of a supported type
  private val bloomBuilders: IndexedSeq[(Int, org.apache.spark.sql.catalyst.InternalRow => Array[Byte], Bloom.Builder)] =
    schema.fields.zipWithIndex.collect {
      case (f, i) if bloomCols.contains(f.name) =>
        Bloom.collectorFor(f.dataType, i).map(get => (i, get, new Bloom.Builder))
    }.flatten.toIndexedSeq
  var numRows: Int = 0

  /** Buffered bytes after the last [[appendRow]] — maintained IN the
    * append loop (one extra virtual call per column), so flush decisions
    * can be exact per row. An adaptive "probe every N rows" scheme here
    * once let a narrow-rows→wide-blobs shift append up to 511 rows
    * unchecked — enough for a media column to blow the 2 GiB per-buffer
    * cap on data that per-row checking writes fine. */
  var currentByteSize: Long = 0L

  def appendRow(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
    var sz = 0L
    var i = 0
    while (i < encoders.length) {
      val e = encoders(i)
      e.appendFrom(row, i)
      sz += e.byteSize
      i += 1
    }
    currentByteSize = sz
    i = 0
    while (i < bloomBuilders.length) {
      val (ord, get, b) = bloomBuilders(i)
      if (!row.isNullAt(ord)) b.add(get(row))
      i += 1
    }
    numRows += 1
  }
  // each row range is scanned ONCE: block stats are computed, chunk
  // stats derived by a typed merge (Stats.mergeColStats)
  private var cachedBlocks: Vector[Vector[ColStats]] = null
  private def allBlocks: Vector[Vector[ColStats]] = {
    if (cachedBlocks == null) {
      val nb = math.max(1, (numRows + Meta.BlockRows - 1) / Meta.BlockRows)
      cachedBlocks = Vector.tabulate(nb) { b =>
        val from = b * Meta.BlockRows
        val to = math.min(from + Meta.BlockRows, numRows)
        encoders.map(_.statsRange(from, to)).toVector
      }
    }
    cachedBlocks
  }
  def chunkStats: Vector[ColStats] = {
    val blocks = allBlocks
    if (blocks.size == 1) blocks.head
    else {
      val rowsOf = blocks.indices.map(b =>
        math.min((b + 1) * Meta.BlockRows, numRows) - b * Meta.BlockRows)
      schema.fields.indices.map { c =>
        val parts = blocks.map(_(c))
        val hasValues = blocks.indices.map(b => rowsOf(b) - parts(b).nullCount > 0)
        Stats.mergeColStats(schema.fields(c).dataType, parts, hasValues)
      }.toVector
    }
  }
  /** Per-block stats for the footer; empty when the chunk fits one block
    * (the chunk stats already say everything). */
  def blockStats: Vector[Vector[ColStats]] =
    if (allBlocks.size <= 1) Vector.empty else allBlocks
  def blooms: Map[String, Bloom.Bits] =
    bloomBuilders.map { case (ord, _, b) =>
      schema.fields(ord).name -> Bloom.Bits(b.finish())
    }.toMap
  def byteSize: Long = encoders.map(_.byteSize).sum
  def reset(): Unit = {
    encoders.foreach(_.reset())
    bloomBuilders.foreach(_._3.reset()); numRows = 0; cachedBlocks = null
    currentByteSize = 0L
  }
}

/** Writes a graft file: magic, data section of chunk pages, footer, tail.
  *
  * Write order per chunk mirrors `src/write.zig:35-101`: global dicts
  * first, then every table's every column. The caller flushes chunks at
  * its own row/byte thresholds; u32 per-chunk limits are preserved from
  * the reference — a 100 TB dataset is many files × many chunks.
  */
final class GraftFileWriter(out: OutputStream,
    pageSize: Int = GraftFileWriter.DefaultPageSize,
    bias: String = "balanced") {

  out.write(MagicHead)
  private val sink = new PageSink(out, pageSize, bias)
  private val chunks = Vector.newBuilder[ChunkMeta]
  private var finished = false

  def writeChunk(tables: Seq[TableBuffer]): Unit = {
    require(!finished, "writer finished")
    val d20 = new DictBuild(20)
    val d32 = new DictBuild(32)
    tables.foreach(_.encoders.foreach(_.collectDict(d20, d32)))
    val dict20Bytes = d20.finish()
    val dict32Bytes = d32.finish()
    val d20Meta = DictMeta(20, d20.numEntries, sink.writeDictData(dict20Bytes))
    val d32Meta = DictMeta(32, d32.numEntries, sink.writeDictData(dict32Bytes))
    val tableMetas = tables.map { t =>
      TableMeta(t.name, t.numRows, t.schema,
        t.encoders.map(_.write(sink, d20, d32)).toVector, t.chunkStats, t.blockStats,
        t.blooms)
    }.toVector
    chunks += ChunkMeta(d20Meta, d32Meta, tableMetas)
  }

  def finish(): Unit = {
    require(!finished, "writer finished")
    finished = true
    val footerBytes = Meta.write(Footer(Version, sink.position, chunks.result()))
    out.write(footerBytes)
    val tail = new Bytes(12)
    tail.putLong(footerBytes.length.toLong)
    tail.putBytes(MagicTail)
    out.write(tail.toArray)
    out.flush()
  }
}

object GraftFileWriter {
  /** 1 MiB pages (the reference defaults to 1 GiB, `src/write.zig:63` —
    * far too coarse for selective reads; SURVEY.md §4.1 recommends
    * smaller). */
  val DefaultPageSize: Int = 1 << 20
}
