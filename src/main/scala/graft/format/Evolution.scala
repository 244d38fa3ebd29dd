package graft.format

import org.apache.spark.sql.types._

/** Schema-evolution bookkeeping shared by the catalog (which evolves the
  * declared-schema marker) and the reader (which maps evolved columns
  * back onto files written before the DDL).
  *
  * The declared schema is the source of truth; files are immutable and
  * never rewritten by DDL. Three evolutions ride the marker's FIELD
  * METADATA so every path that holds a StructField can resolve them:
  *
  *  - RENAME: the field keeps its prior spellings in [[PrevNamesKey]]
  *    (most recent first). Old files still store the column under an old
  *    name; [[fileFieldIndex]] maps the request through the rename
  *    chain. New files write the current name, so renames heal
  *    physically with every rewrite.
  *  - DROP: the field STAYS in the marker, hidden behind [[DroppedKey]]
  *    (a tombstone). Visible schemas filter it; re-adding the same name
  *    is refused while the tombstone exists, because old files still
  *    hold the dropped column's values and a fresh same-named column
  *    would silently resurrect them (the failure field-id systems like
  *    Iceberg's exist to prevent; the tombstone is the refusal-flavored
  *    equivalent).
  *  - WIDEN: the field's type changes along [[widens]] (the lossless
  *    promotions Spark itself allows); old files decode their narrower
  *    physical values into the widened vector.
  */
object Evolution {
  val PrevNamesKey = "graft.prevNames"
  val DroppedKey = "graft.dropped"

  def prevNames(f: StructField): Seq[String] =
    if (f.metadata.contains(PrevNamesKey)) f.metadata.getStringArray(PrevNamesKey).toSeq
    else Seq.empty

  def isDropped(f: StructField): Boolean =
    f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)

  /** The user-visible schema: tombstoned (dropped) fields filtered out,
    * at EVERY nesting level — a dropped struct leaf hides exactly like a
    * dropped top-level column. */
  def visible(s: StructType): StructType = StructType(
    s.fields.filterNot(isDropped).map(f => f.copy(dataType = visibleType(f.dataType))))

  private def visibleType(dt: DataType): DataType = dt match {
    case st: StructType => visible(st)
    case ArrayType(et, n) => ArrayType(visibleType(et), n)
    case MapType(k, v, n) => MapType(visibleType(k), visibleType(v), n)
    case other => other
  }

  /** Every name a field has ever answered to, current first. */
  def allNames(f: StructField): Seq[String] = f.name +: prevNames(f)

  /** True iff this field was touched by a rename (old files may store it
    * under another name). Stat-consuming paths resolve through the chain
    * ([[fileAttrName]], the prevNames carried in agg/top-k specs) rather
    * than declining. */
  def renamed(f: StructField): Boolean = prevNames(f).nonEmpty

  /** Lossless widenings `ALTER COLUMN ... TYPE` accepts — the same set
    * Spark's own `Cast.canUpCast` blesses: integral/float promotion plus
    * decimal widening (both integer digits and scale may only GROW, so
    * every stored unscaled value rescales exactly, never rounds). */
  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.precision - t.scale >= f.precision - f.scale && t.scale >= f.scale &&
        (t.precision > f.precision || t.scale > f.scale)
    case _ => false
  }

  /** Index of requested field `f` in a FILE's schema: exact name first,
    * then the rename chain. -1 = the file predates the column. */
  def fileFieldIndex(fileSchema: StructType, f: StructField): Int = {
    val names = fileSchema.fieldNames
    val exact = names.indexOf(f.name)
    if (exact >= 0) exact
    else prevNames(f).iterator.map(n => names.indexOf(n)).find(_ >= 0).getOrElse(-1)
  }

  /** A pushed filter attribute (dotted for nested leaves) in a FILE's
    * own spelling: each path level resolves by current name first, then
    * the rename chain — the filter-side mirror of [[fileFieldIndex]].
    * Returns None when the file predates the column (some level has no
    * spelling) — the caller may then skip on absence (null never
    * satisfies a comparison). Claimed-name discipline makes the chain
    * lookup unambiguous: no spelling is ever reused for a different
    * column at the same level. */
  def fileAttrName(declared: StructType, file: StructType,
      attr: String): Option[String] =
    // exact declared field first (names literally containing dots win,
    // exactly like Stats.leafType), then descend at the first dot
    declared.fields.find(_.name.equalsIgnoreCase(attr)) match {
      case Some(df) =>
        val idx = fileFieldIndex(file, df)
        if (idx >= 0) Some(file.fields(idx).name) else None
      case None =>
        val i = attr.indexOf('.')
        if (i <= 0 || i == attr.length - 1) None
        else declared.fields.find(_.name.equalsIgnoreCase(attr.substring(0, i)))
          .flatMap { df =>
            val idx = fileFieldIndex(file, df)
            if (idx < 0) None
            else (df.dataType, file.fields(idx).dataType) match {
              case (dn: StructType, fn: StructType) =>
                fileAttrName(dn, fn, attr.substring(i + 1))
                  .map(rest => s"${file.fields(idx).name}.$rest")
              case _ => None
            }
          }
    }

  /** Rewrite pushed filters' attribute names from DECLARED (current)
    * spellings into a FILE's spellings, and report which attributes the
    * file provably predates (read as all-null there). Only the filter
    * shapes the skip machinery consumes are rewritten; anything else
    * passes through untouched (it never proves a skip anyway). */
  def translateFilters(filters: Array[org.apache.spark.sql.sources.Filter],
      declared: StructType, file: StructType)
      : (Array[org.apache.spark.sql.sources.Filter], Set[String]) = {
    import org.apache.spark.sql.sources._
    val cache = scala.collection.mutable.HashMap.empty[String, Option[String]]
    val absent = scala.collection.mutable.HashSet.empty[String]
    def res(a: String): String = cache.getOrElseUpdate(a, {
      val r = fileAttrName(declared, file, a)
      if (r.isEmpty &&
          // absent ONLY when the declared schema actually has the leaf
          // (unknown attrs stay unknown, never "provably null")
          graft.format.Stats.leafType(declared, a).isDefined)
        absent += a
      r
    }).getOrElse(a)
    def tr(f: Filter): Filter = f match {
      case EqualTo(a, v) => EqualTo(res(a), v)
      case EqualNullSafe(a, v) => EqualNullSafe(res(a), v)
      case GreaterThan(a, v) => GreaterThan(res(a), v)
      case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(res(a), v)
      case LessThan(a, v) => LessThan(res(a), v)
      case LessThanOrEqual(a, v) => LessThanOrEqual(res(a), v)
      case In(a, vs) => In(res(a), vs)
      case IsNull(a) => IsNull(res(a))
      case IsNotNull(a) => IsNotNull(res(a))
      case StringStartsWith(a, v) => StringStartsWith(res(a), v)
      case And(l, r) => And(tr(l), tr(r))
      case Or(l, r) => Or(tr(l), tr(r))
      case Not(c) => Not(tr(c))
      case other => other
    }
    val out = filters.map(tr)
    (out, absent.toSet)
  }

  /** Reconcile a FILE's variant of a field's type with the DECLARED
    * one: equal types stand; lossless width differences resolve to the
    * wider side (a pre-widen file decodes narrower; drift-written wider
    * files widen the declared type, matching the top-level union rule);
    * struct sides merge RECURSIVELY — nested fields match through the
    * declared side's rename chains, spellings the declared side claims
    * (tombstones, prior names) never surface as separate leaves, and
    * genuinely new file-side leaves join as drift (same contract as
    * top-level evolution-on-read). Anything else is a loud disagreement. */
  def reconcileType(declared: DataType, file: DataType,
      where: String): DataType = (declared, file) match {
    case (d, f) if d == f => d
    case (d, f) if widens(f, d) => d
    case (d, f) if widens(d, f) => f
    case (d: StructType, f: StructType) =>
      val claimed = d.fields.flatMap(allNames).map(_.toLowerCase).toSet
      f.fields.foldLeft(d) { (s, ff) =>
        s.fields.indexWhere(df => allNames(df).exists(_.equalsIgnoreCase(ff.name))) match {
          case i if i >= 0 =>
            val df = s.fields(i)
            StructType(s.fields.updated(i, df.copy(dataType =
              reconcileType(df.dataType, ff.dataType, s"$where.${df.name}"))))
          case _ if claimed.contains(ff.name.toLowerCase) => s
          case _ => StructType(s.fields :+ ff) // nested drift: new leaf
        }
      }
    case (ArrayType(de, dn), ArrayType(fe, _)) =>
      ArrayType(reconcileType(de, fe, s"$where.element"), dn)
    case (MapType(dk, dv, dn), MapType(fk, fv, _)) =>
      MapType(reconcileType(dk, fk, s"$where.key"),
        reconcileType(dv, fv, s"$where.value"), dn)
    case (d, f) => throw new IllegalArgumentException(
      s"files disagree on $where: ${d.simpleString} vs ${f.simpleString}")
  }

  /** Stamp a rename onto a field: new name in front, old name joins the
    * prior-names chain. */
  def renameField(f: StructField, newName: String): StructField = {
    val chain = f.name +: prevNames(f)
    val md = new MetadataBuilder().withMetadata(f.metadata)
      .putStringArray(PrevNamesKey, chain.toArray).build()
    f.copy(name = newName, metadata = md)
  }

  /** Tombstone a dropped field (kept in the marker, hidden from view). */
  def dropField(f: StructField): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putBoolean(DroppedKey, true).build())
}
