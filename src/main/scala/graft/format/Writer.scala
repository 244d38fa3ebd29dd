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
  // pageSize <= 0 would make writeBuffer's paging loop spin forever
  // writing empty pages (min(0, remaining) never advances) — and the
  // value is user-reachable through .option("pagesize", ...)
  require(pageSize > 0, s"pageSize must be positive, got $pageSize")
  // an unknown bias must refuse, not silently behave as `balanced` —
  // option("bias", "read-optimized") (dash typo) would otherwise write
  // the wrong codecs with no signal
  require(bias == "balanced" || bias == "read_optimized" || bias == "compact",
    s"bias must be balanced|read_optimized|compact, got '$bias'")

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
    // per-page checksum over the COMPRESSED bytes (v5): the reader
    // verifies before every decompress, so storage corruption refuses
    // loudly instead of silently inflating to wrong values
    val m = PageMeta(pos, comp.length, len, rowEnd,
      Meta.xxh64(comp, 0, comp.length))
    pos += comp.length
    m
  }

  /** Fixed-width buffer: ~⌈len/pageSize⌉ pages; rowEnd = element index.
    * Pages split at ELEMENT-aligned boundaries (the largest multiple of
    * elemSize within pageSize): a split mid-element would make rowEnd —
    * documented as "exclusive end element index" — mislabel the page
    * whose boundary straddles an element, and any rowEnd-based page
    * skipping would then drop or duplicate that element. */
  def writeBuffer(src: Array[Byte], len: Int, codec: Byte, elemSize: Int): BufferMeta = {
    if (len == 0)
      return BufferMeta(codec, 0, Vector(writePage(src, 0, 0, codec, 0)))
    val e = math.max(elemSize, 1)
    val step = math.max(e, pageSize - pageSize % e)
    val pages = Vector.newBuilder[PageMeta]
    var off = 0
    while (off < len) {
      val n = math.min(step, len - off)
      pages += writePage(src, off, n, codec, (off + n) / e)
      off += n
    }
    BufferMeta(codec, len, pages.result())
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

object TableBuffer {
  /** Per-chunk row bound: keeps every block-index product inside Int
    * (the reference's u32 per-chunk framing makes anything larger
    * unrepresentable anyway). */
  val MaxRows: Int = Int.MaxValue - 2 * Meta.BlockRows

  /** The deepest schema the READER accepts is [[Meta.MaxDepth]] levels
    * of column metas; measured wrappers (ALP decimal scaling, unsigned
    * packing) may add ONE level around a leaf, so the write side caps
    * declared nesting a level lower — a deeper schema would WRITE fine
    * and then be permanently unreadable. */
  def schemaDepthOk(schema: StructType): Unit = {
    import org.apache.spark.sql.types._
    def depth(dt: DataType): Int = dt match {
      case s: StructType => 1 + s.fields.map(f => depth(f.dataType)).foldLeft(0)(math.max)
      case a: ArrayType => 1 + depth(a.elementType)
      case m: MapType => 2 + math.max(depth(m.keyType), depth(m.valueType))
      case _ => 1
    }
    val d = schema.fields.map(f => depth(f.dataType)).foldLeft(0)(math.max)
    if (d + 1 > Meta.MaxDepth)
      throw new OliveFormatException(
        s"schema nests $d levels; the format reads at most ${Meta.MaxDepth} " +
          "(one reserved for measured encoding wrappers) — flatten the schema")
  }
}

/** One buffered table inside a chunk being assembled. `bloomCols` names
  * columns that collect a per-chunk Bloom filter (see [[Bloom]]);
  * unsupported types in the list are silently ignored. */
final class TableBuffer(val name: String, val schema: StructType,
    bloomCols: Set[String] = Set.empty) {
  TableBuffer.schemaDepthOk(schema)
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
    // the block-index arithmetic in allBlocks is Int; past this bound it
    // would wrap negative and silently compute ONE block's stats for
    // billions of rows (wrong zone maps → wrong pruning). The normal
    // writer flushes at 96 MB long before this; the bound protects
    // direct TableBuffer users.
    if (numRows >= TableBuffer.MaxRows)
      throw new OliveFormatException(
        s"chunk exceeds ${TableBuffer.MaxRows} rows; flush to a new chunk")
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
    // stats computed BEFORE this append are stale now — a caller probing
    // chunkStats mid-buffer then appending more would otherwise write a
    // footer whose zone maps exclude the later rows
    cachedBlocks = null
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
  /** Chunk-level zone maps for struct leaves at ANY depth, keyed by the
    * dotted path (`meta.inner.w`, footer v4). A struct-null row appends
    * a null slot to every child encoder — recursively, so an arbitrarily
    * deep leaf's own validity/stats already describe exactly the table's
    * rows, and the leaf stats fall out of the same columnar statsRange
    * pass as top-level columns. */
  def nestedStats: Map[String, ColStats] =
    nestedLeafStats(0, numRows)
  /** Per-block refinement of [[nestedStats]]; empty when the chunk fits
    * one block or has no statable struct leaf. Same dotted keys, same
    * columnar statsRange pass over each [[Meta.BlockRows]] window —
    * leaf-clustered struct data then decodes blocks, not whole chunks. */
  def blockNestedStats: Vector[Map[String, ColStats]] = {
    import org.apache.spark.sql.types.StructType
    val blocks = allBlocks
    def hasLeaf(st: StructType): Boolean = st.fields.exists(f => f.dataType match {
      case c: StructType => hasLeaf(c)
      case dt => nestedStatable(dt)
    })
    val anyLeaf = schema.fields.exists(_.dataType match {
      case st: StructType => hasLeaf(st)
      case _ => false
    })
    if (blocks.size <= 1 || !anyLeaf) Vector.empty
    else Vector.tabulate(blocks.size) { b =>
      val from = b * Meta.BlockRows
      nestedLeafStats(from, math.min(from + Meta.BlockRows, numRows))
    }
  }
  private def nestedLeafStats(from: Int, to: Int): Map[String, ColStats] = {
    import org.apache.spark.sql.types.StructType
    val out = Map.newBuilder[String, ColStats]
    def recurse(prefix: String, st: StructType, se: StructEncoder): Unit =
      st.fields.zipWithIndex.foreach { case (cf, ci) =>
        (cf.dataType, se.children(ci)) match {
          case (child: StructType, cse: StructEncoder) =>
            recurse(s"$prefix.${cf.name}", child, cse)
          case (dt, enc) if nestedStatable(dt) =>
            out += (s"$prefix.${cf.name}" -> enc.statsRange(from, to))
          case _ =>
        }
      }
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      (f.dataType, encoders(i)) match {
        case (st: StructType, se: StructEncoder) => recurse(f.name, st, se)
        case _ =>
      }
    }
    out.result()
  }
  private def nestedStatable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | FloatType | DoubleType |
           StringType | BooleanType => true
      case d: DecimalType => d.precision <= 38
      case _ => false
    }
  }
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
        t.blooms, t.nestedStats, t.blockNestedStats)
    }.toVector
    chunks += ChunkMeta(d20Meta, d32Meta, tableMetas)
  }

  def finish(): Unit = {
    require(!finished, "writer finished")
    finished = true
    val footer = Footer(Version, sink.position, chunks.result())
    writtenTables0 = footer.chunks.flatMap(_.tables)
    val footerBytes = Meta.write(footer)
    out.write(footerBytes)
    val tail = new Bytes(12)
    tail.putLong(footerBytes.length.toLong)
    tail.putBytes(MagicTail)
    out.write(tail.toArray)
    out.flush()
  }

  private var writtenTables0: Seq[TableMeta] = Seq.empty

  /** The finished file's per-chunk table metas (footer content) — lets
    * the WRITE TASK hand its stats to the driver through its commit
    * message, so publish-time manifest coverage never has to re-open
    * the footer it just produced. Empty before [[finish]]. */
  def writtenTables: Seq[TableMeta] = writtenTables0
}

object GraftFileWriter {
  /** 1 MiB pages (the reference defaults to 1 GiB, `src/write.zig:63` —
    * far too coarse for selective reads; SURVEY.md §4.1 recommends
    * smaller). */
  val DefaultPageSize: Int = 1 << 20
}
