package graft.sources

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Task-side column statistics for APPEND maintenance of the ANALYZE
  * sidecar. Row counts extrapolate under staleness, but NDV doesn't —
  * the only sound way to keep a distinct count fresh across appends is
  * to merge sketches of the appended values into the stored one. Each
  * writer task updates one HLL sketch per tracked column over the rows
  * it writes (plus null counts and integer min/max), ships the result in
  * its commit message, and the driver unions them into the sidecar.
  *
  * The value→hash mapping MIRRORS Spark's own `hll_sketch_agg`
  * aggregate (which ANALYZE uses), same lgK — a divergent mapping would
  * double-count every re-appended value at union time:
  * int → update(long), long → update(long), default-collation string →
  * update(utf8 bytes, empty skipped), binary → update(bytes).
  * Only ever instantiated for columns the sidecar already tracks a
  * sketch for; tables never ANALYZEd pay zero per-row cost. */
final class ColSketcher(schema: StructType, cols: Seq[String]) {
  import ColSketcher._

  private val targets: Array[(String, Int, DataType)] = cols.iterator
    .flatMap { c =>
      val i = schema.fieldNames.indexOf(c)
      if (i >= 0 && sketchable(schema.fields(i).dataType))
        Some((c, i, schema.fields(i).dataType))
      else None
    }.toArray
  private val sketches = Array.fill(targets.length)(new HllSketch(LgK))
  private val nulls = new Array[Long](targets.length)
  private val mins = Array.fill(targets.length)(Long.MaxValue)
  private val maxs = Array.fill(targets.length)(Long.MinValue)

  def isEmpty: Boolean = targets.isEmpty

  def update(row: InternalRow): Unit = {
    var i = 0
    while (i < targets.length) {
      val o = targets(i)._2
      if (row.isNullAt(o)) nulls(i) += 1
      else targets(i)._3 match {
        case IntegerType =>
          val v = row.getInt(o).toLong
          sketches(i).update(v)
          if (v < mins(i)) mins(i) = v
          if (v > maxs(i)) maxs(i) = v
        case LongType =>
          val v = row.getLong(o)
          sketches(i).update(v)
          if (v < mins(i)) mins(i) = v
          if (v > maxs(i)) maxs(i) = v
        case BinaryType => sketches(i).update(row.getBinary(o))
        case _ => // StringType (default collation, enforced by sketchable)
          val s = row.getUTF8String(o)
          if (s.numBytes > 0) sketches(i).update(s.getBytes)
      }
      i += 1
    }
  }

  /** Per column: (updatable sketch bytes, null count, min/max when the
    * column is integral — None for never-seen). */
  def result(): Map[String, ColDelta] = targets.iterator.zipWithIndex.map {
    case ((name, _, _), i) =>
      name -> ColDelta(sketches(i).toUpdatableByteArray, nulls(i),
        if (mins(i) <= maxs(i)) Some((mins(i), maxs(i))) else None)
  }.toMap
}

object ColSketcher {
  /** Same default as Spark's `hll_sketch_agg`. */
  val LgK = 12

  case class ColDelta(sketch: Array[Byte], nulls: Long,
      range: Option[(Long, Long)]) extends Serializable

  /** The types whose task-side mapping provably matches
    * `hll_sketch_agg` (non-default string collations hash through a
    * collation sort key — not worth mirroring; they just don't get
    * append-merged NDV). */
  def sketchable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | BinaryType => true
    case st: StringType => st == StringType
    case _ => false
  }

  /** Fold several writers' deltas (per-partition/per-bucket inner
    * writers of one task, or all tasks' messages at the driver) into
    * one delta per column. */
  def combine(ms: Seq[Map[String, ColDelta]]): Map[String, ColDelta] = {
    val names = ms.iterator.flatMap(_.keysIterator).toSeq.distinct
    names.map { n =>
      val ds = ms.flatMap(_.get(n))
      val u = new Union(LgK)
      ds.foreach(d => u.update(HllSketch.heapify(d.sketch)))
      val ranges = ds.flatMap(_.range)
      n -> ColDelta(u.getResult(TgtHllType.HLL_4).toUpdatableByteArray,
        ds.map(_.nulls).sum,
        if (ranges.isEmpty) None
        else Some((ranges.map(_._1).min, ranges.map(_._2).max)))
    }.toMap
  }

  /** Union the stored sidecar sketch with task deltas; returns the new
    * (estimate, updatable bytes). */
  def merge(stored: Array[Byte], deltas: Seq[Array[Byte]]): (Long, Array[Byte]) = {
    val u = new Union(LgK)
    u.update(HllSketch.heapify(stored))
    deltas.foreach(b => u.update(HllSketch.heapify(b)))
    val r = u.getResult(TgtHllType.HLL_4)
    (math.round(r.getEstimate), r.toUpdatableByteArray)
  }
}
