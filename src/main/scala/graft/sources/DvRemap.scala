package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-on-read delete application as a zero-copy ordinal REMAP.
  *
  * A scattered delete vector shreds a chunk's contiguous decode range
  * into one tiny sub-range per surviving run — the r16 sf1 run measured
  * a second MoR DELETE (scanning under the first one's ~2M scattered
  * positions) at 16x the no-DV scan, all per-range/per-batch overhead.
  * Instead the reader now decodes the WHOLE kept range once
  * (vectorized, page-sequential) and wraps each decoded vector in this
  * view: logical row `i` reads physical row `map(i)`, where `map` lists
  * the surviving ordinals in order. One O(rows) int map per batch, no
  * value copies, consumers stay columnar. (The idea matches Iceberg's
  * `ColumnVectorWithFilter`; implementation is graft's own.)
  *
  * Struct/interval children are remapped recursively (Spark's final
  * `getStruct`/`getInterval` read children at the PARENT's row id);
  * array/map children are NOT (their offsets live in the parent, so
  * `getArray`/`getMap` delegate with the remapped parent ordinal and
  * return views into the raw child). `hasNull`/`numNulls` pass through
  * as over-estimates — both are advisory (a false `hasNull` only costs
  * a null check per access, never correctness).
  */
final class RemappedColumnVector(base: ColumnVector, map: Array[Int])
    extends ColumnVector(base.dataType) {
  override def close(): Unit = base.close()
  override def hasNull: Boolean = base.hasNull
  override def numNulls: Int = base.numNulls
  override def isNullAt(i: Int): Boolean = base.isNullAt(map(i))
  override def getBoolean(i: Int): Boolean = base.getBoolean(map(i))
  override def getByte(i: Int): Byte = base.getByte(map(i))
  override def getShort(i: Int): Short = base.getShort(map(i))
  override def getInt(i: Int): Int = base.getInt(map(i))
  override def getLong(i: Int): Long = base.getLong(map(i))
  override def getFloat(i: Int): Float = base.getFloat(map(i))
  override def getDouble(i: Int): Double = base.getDouble(map(i))
  override def getArray(i: Int): ColumnarArray = base.getArray(map(i))
  override def getMap(i: Int): ColumnarMap = base.getMap(map(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
    base.getDecimal(map(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String = base.getUTF8String(map(i))
  override def getBinary(i: Int): Array[Byte] = base.getBinary(map(i))
  override def getChild(ordinal: Int): ColumnVector = base.dataType match {
    // struct (and interval) children are addressed by the parent's row
    // id — remap them; array/map children are addressed by offsets the
    // remapped getArray/getMap already resolved against the raw child
    case _: ArrayType | _: MapType => base.getChild(ordinal)
    case _ => new RemappedColumnVector(base.getChild(ordinal), map)
  }
}

/** Process-wide decoded-DV cache. Every chunk-split task of a DV'd file
  * needs the same decoded position list; without this each task re-read
  * and re-decoded the blob (chunks x positions work per file — measured
  * super-linear at sf1). Keyed by (path, length, mtime): DV blobs are
  * immutable once written (commits write NEW blobs), so the key is an
  * identity; a stale entry is impossible, an evicted one only costs a
  * re-decode. Bounded by total retained positions, LRU. */
object DvCache {
  private val MaxPositions = 32L << 20 // ~256 MB of longs, process-wide
  private val cache = new java.util.LinkedHashMap[String, Array[Long]](16, 0.75f, true)
  private var held = 0L

  def get(fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path,
      totalRows: Long): Array[Long] = {
    val st = fs.getFileStatus(p)
    require(st.getLen <= (64 << 20),
      s"delete vector $p is ${st.getLen} bytes — refusing (cap 64 MiB)")
    val key = s"${p.toUri.getPath}@${st.getLen}:${st.getModificationTime}"
    val hit = cache.synchronized(cache.get(key))
    val dels = if (hit != null) hit else {
      val bytes = new Array[Byte](st.getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, bytes) finally in.close()
      // decode WITHOUT the row bound: the bound is per use (below), the
      // decoded array is shared across files' validations
      val d = graft.format.Dv.decode(bytes)
      cache.synchronized {
        if (!cache.containsKey(key)) {
          cache.put(key, d)
          held += d.length
          val it = cache.entrySet().iterator()
          while (held > MaxPositions && it.hasNext) {
            val e = it.next()
            if (e.getKey != key) { held -= e.getValue.length; it.remove() }
          }
        }
      }
      d
    }
    // positions are strictly increasing: the last one bounds them all
    if (dels.nonEmpty && dels(dels.length - 1) >= totalRows)
      throw new graft.format.OliveFormatException(
        s"delete vector $p claims position ${dels(dels.length - 1)} " +
          s"beyond the file's $totalRows rows")
    dels
  }
}
