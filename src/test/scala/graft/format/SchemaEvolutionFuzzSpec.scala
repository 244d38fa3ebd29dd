package graft.format

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Randomized additive schema evolution: interleaved `ALTER TABLE ADD
  * COLUMN` and appends written at whatever width the table had AT THAT
  * MOMENT. Every row must read back with its missing (later) columns as
  * nulls — the evolution-on-read contract — regardless of how the
  * widths interleave across files, and the declared marker must keep
  * every reader agreeing on one widest schema. */
class SchemaEvolutionFuzzSpec extends SparkSpec {

  for (seed <- Seq(3, 29)) {
    test(s"random ADD COLUMN + append sequences null-pad exactly (seed $seed)") {
      val r = new Random(seed)
      val cat = s"evofuzz$seed"
      val root = Files.createTempDirectory(s"graft-$cat").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, c0 BIGINT) USING graft")

      var width = 2 // id + c0
      var nextId = 0L
      // model: every appended row at its write-time width
      var model = Vector.empty[Vector[Any]]

      (1 to 12).foreach { step =>
        if (r.nextInt(3) == 0 && width < 8) {
          spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN c${width - 1} BIGINT")
          width += 1
        } else {
          val n = 1 + r.nextInt(30)
          val rows = (0 until n).map { _ =>
            val id = nextId
            nextId += 1
            Vector[Any](id) ++ (1 until width).map(c => id * 10 + c: Any)
          }
          model ++= rows
          val schema = StructType(
            StructField("id", LongType) +:
              (1 until width).map(c => StructField(s"c${c - 1}", LongType)))
          val df = spark.createDataFrame(
            java.util.Arrays.asList(rows.map(v => Row(v: _*)): _*), schema)
          df.writeTo(s"$cat.db.t").append()
        }
        // read after EVERY step: each row null-padded to the current width
        val got = spark.table(s"$cat.db.t").collect()
          .map(row => (0 until row.length).map(i =>
            if (row.isNullAt(i)) null else row.get(i)).toVector)
          .sortBy(_.head.asInstanceOf[Long]).toVector
        val want = model.map(v => v ++ Vector.fill(width - v.size)(null))
          .sortBy(_.head.asInstanceOf[Long])
        assert(got.length == want.length, s"seed $seed step $step: row count")
        assert(got == want, s"seed $seed step $step: rows diverged")
      }
    }
  }

  // Full-evolution fuzz: random interleavings of ADD, RENAME, DROP,
  // widening ALTER TYPE, and appends written at the table's shape AT
  // THAT MOMENT. The model tracks columns by IDENTITY (renames don't
  // move data); after every step the table must serve exactly the
  // model: rows appended before a column read null, renamed columns
  // keep serving pre-rename files, widened columns promote, dropped
  // columns vanish.
  for (seed <- Seq(5, 17)) {
    test(s"random RENAME/DROP/WIDEN/append interleavings (seed $seed)") {
      val r = new Random(seed)
      val cat = s"evofull$seed"
      val root = Files.createTempDirectory(s"graft-$cat").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, c0 INT) USING graft")

      // live columns in declared order: (identity, currentName, isLong)
      var cols = Vector((0, "c0", false))
      var nextIdent = 1
      var nextId = 0L
      // per appended row: id -> values by column identity (only columns
      // live at append time have entries)
      var rows = Vector.empty[(Long, Map[Int, Long])]

      (1 to 18).foreach { step =>
        r.nextInt(6) match {
          case 0 => // ADD (fresh name, INT)
            val ident = nextIdent; nextIdent += 1
            spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN c$ident INT")
            cols :+= ((ident, s"c$ident", false))
          case 1 if cols.size > 1 => // RENAME a random column to a fresh spelling
            val i = r.nextInt(cols.size)
            val (ident, old, isLong) = cols(i)
            spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN $old TO r${ident}_$step")
            cols = cols.updated(i, (ident, s"r${ident}_$step", isLong))
          case 2 if cols.size > 1 => // DROP a random column
            val i = r.nextInt(cols.size)
            spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN ${cols(i)._2}")
            cols = cols.patch(i, Nil, 1)
          case 3 if cols.exists(!_._3) => // WIDEN a random INT column
            val narrow = cols.zipWithIndex.filter(!_._1._3)
            val (c, i) = narrow(r.nextInt(narrow.size))
            spark.sql(s"ALTER TABLE $cat.db.t ALTER COLUMN ${c._2} TYPE BIGINT")
            cols = cols.updated(i, (c._1, c._2, true))
          case _ => // APPEND at the current shape
            val n = 1 + r.nextInt(20)
            val fresh = (0 until n).map { _ =>
              val id = nextId; nextId += 1
              id -> cols.map { case (ident, _, isLong) =>
                val v = if (isLong) (1L << 35) + id * 100 + ident
                        else (id * 100 + ident) % 100000
                ident -> v
              }.toMap
            }
            rows ++= fresh
            val schema = StructType(StructField("id", LongType) +:
              cols.map { case (_, nm, isLong) =>
                StructField(nm, if (isLong) LongType else IntegerType) })
            val df = spark.createDataFrame(
              java.util.Arrays.asList(fresh.map { case (id, vs) =>
                // branch types annotated: a bare if(long else int) gets
                // numerically WIDENED to Long, poisoning the Int slot
                Row.fromSeq((id: Any) +: cols.map { case (ident, _, isLong) =>
                  if (isLong) vs(ident): Any else vs(ident).toInt: Any })
              }: _*), schema)
            df.writeTo(s"$cat.db.t").append()
        }
        // verify after EVERY step
        val live = spark.table(s"$cat.db.t")
        assert(live.columns.toSeq == ("id" +: cols.map(_._2)),
          s"seed $seed step $step: schema diverged")
        val got = live.collect().map { row =>
          row.getLong(0) -> cols.zipWithIndex.map { case ((_, _, isLong), i) =>
            if (row.isNullAt(i + 1)) null
            else if (isLong) row.getLong(i + 1)
            else row.getInt(i + 1).toLong
          }.toVector
        }.sortBy(_._1).toVector
        val want = rows.map { case (id, vs) =>
          id -> cols.map { case (ident, _, _) =>
            vs.get(ident).map(v => v: Any).orNull
          }.toVector
        }.sortBy(_._1)
        assert(got.map(_._1) == want.map(_._1), s"seed $seed step $step: ids")
        got.zip(want).foreach { case ((id, g), (_, w)) =>
          val gn = g.map(x => if (x == null) null else x.asInstanceOf[Long])
          assert(gn == w, s"seed $seed step $step row $id: $gn != $w")
        }
        // FILTER probes over the evolved table: pushed filters drive
        // zone-map/absence skipping through rename chains — a WRONG skip
        // shows up here as a lost row, across random DDL interleavings
        if (cols.nonEmpty) {
          val (pIdent, pName, _) = cols(r.nextInt(cols.size))
          val probe = rows.collectFirst {
            case (_, vs) if vs.contains(pIdent) => vs(pIdent)
          }
          probe.foreach { v =>
            val wantN = rows.count(_._2.get(pIdent).contains(v)).toLong
            val gotN = spark.table(s"$cat.db.t")
              .filter(org.apache.spark.sql.functions.col(pName) === v).count()
            assert(gotN == wantN,
              s"seed $seed step $step: filter $pName=$v lost rows: $gotN != $wantN")
            val wantNull = rows.count(!_._2.contains(pIdent)).toLong
            val gotNull = spark.table(s"$cat.db.t")
              .filter(org.apache.spark.sql.functions.col(pName).isNull).count()
            assert(gotNull == wantNull,
              s"seed $seed step $step: IsNull($pName): $gotNull != $wantNull")
          }
        }
      }
    }
  }

  // NESTED-op fuzz: the same identity model, but every evolving column
  // is a LEAF of one struct `m`, and ADDs fuzz FIRST/AFTER positions.
  // After each step the table must serve exactly the model: per-leaf
  // null padding for rows appended before the leaf existed, renamed
  // leaves resolving pre-rename files through the chain, widened leaves
  // promoting, dropped leaves gone, and declared leaf ORDER matching
  // the positional adds.
  for (seed <- Seq(7, 23)) {
    test(s"random NESTED rename/drop/widen/positional-add interleavings (seed $seed)") {
      val r = new Random(seed)
      val cat = s"evonest$seed"
      val root = Files.createTempDirectory(s"graft-$cat").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, m STRUCT<c0: INT>) USING graft")

      var cols = Vector((0, "c0", false)) // struct leaves in declared order
      var nextIdent = 1
      var nextId = 0L
      var rows = Vector.empty[(Long, Map[Int, Long])]

      (1 to 18).foreach { step =>
        r.nextInt(6) match {
          case 0 => // ADD leaf at a random position
            val ident = nextIdent; nextIdent += 1
            val nm = s"c$ident"
            r.nextInt(3) match {
              case 0 =>
                spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN m.$nm INT FIRST")
                cols +:= ((ident, nm, false))
              case 1 =>
                val anchor = cols(r.nextInt(cols.size))
                spark.sql(
                  s"ALTER TABLE $cat.db.t ADD COLUMN m.$nm INT AFTER ${anchor._2}")
                val i = cols.indexWhere(_._1 == anchor._1)
                cols = cols.patch(i + 1, Seq((ident, nm, false)), 0)
              case _ =>
                spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN m.$nm INT")
                cols :+= ((ident, nm, false))
            }
          case 1 if cols.size > 1 => // RENAME a random leaf
            val i = r.nextInt(cols.size)
            val (ident, old, isLong) = cols(i)
            spark.sql(
              s"ALTER TABLE $cat.db.t RENAME COLUMN m.$old TO r${ident}_$step")
            cols = cols.updated(i, (ident, s"r${ident}_$step", isLong))
          case 2 if cols.size > 1 => // DROP a random leaf
            val i = r.nextInt(cols.size)
            spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN m.${cols(i)._2}")
            cols = cols.patch(i, Nil, 1)
          case 3 if cols.exists(!_._3) => // WIDEN a random INT leaf
            val narrow = cols.zipWithIndex.filter(!_._1._3)
            val (c, i) = narrow(r.nextInt(narrow.size))
            spark.sql(s"ALTER TABLE $cat.db.t ALTER COLUMN m.${c._2} TYPE BIGINT")
            cols = cols.updated(i, (c._1, c._2, true))
          case _ => // APPEND at the current struct shape
            val n = 1 + r.nextInt(20)
            val fresh = (0 until n).map { _ =>
              val id = nextId; nextId += 1
              id -> cols.map { case (ident, _, isLong) =>
                val v = if (isLong) (1L << 35) + id * 100 + ident
                        else (id * 100 + ident) % 100000
                ident -> v
              }.toMap
            }
            rows ++= fresh
            val mType = StructType(cols.map { case (_, nm, isLong) =>
              StructField(nm, if (isLong) LongType else IntegerType) })
            val schema = StructType(Seq(
              StructField("id", LongType), StructField("m", mType)))
            val df = spark.createDataFrame(
              java.util.Arrays.asList(fresh.map { case (id, vs) =>
                Row(id, Row.fromSeq(cols.map { case (ident, _, isLong) =>
                  if (isLong) vs(ident): Any else vs(ident).toInt: Any }))
              }: _*), schema)
            df.writeTo(s"$cat.db.t").append()
        }
        // verify after EVERY step: declared leaf order AND values
        val live = spark.table(s"$cat.db.t")
        val mFields = live.schema("m").dataType
          .asInstanceOf[StructType].fieldNames.toSeq
        assert(mFields == cols.map(_._2), s"seed $seed step $step: leaf order")
        val got = live.collect().map { row =>
          val st = row.getStruct(1)
          row.getLong(0) -> cols.zipWithIndex.map { case ((_, _, isLong), i) =>
            if (st.isNullAt(i)) null
            else if (isLong) st.getLong(i)
            else st.getInt(i).toLong
          }.toVector
        }.sortBy(_._1).toVector
        val want = rows.map { case (id, vs) =>
          id -> cols.map { case (ident, _, _) =>
            vs.get(ident).map(v => v: Any).orNull }.toVector
        }.sortBy(_._1)
        assert(got.map(_._1) == want.map(_._1), s"seed $seed step $step: ids")
        got.zip(want).foreach { case ((id, g), (_, w)) =>
          val gn = g.map(x => if (x == null) null else x.asInstanceOf[Long])
          assert(gn == w, s"seed $seed step $step row $id: $gn != $w")
        }
        // nested FILTER probe: dotted-leaf predicates drive nested
        // zone-map skipping through per-level rename chains — a wrong
        // skip surfaces as a lost row
        if (cols.nonEmpty) {
          val (pIdent, pName, _) = cols(r.nextInt(cols.size))
          rows.collectFirst { case (_, vs) if vs.contains(pIdent) => vs(pIdent) }
            .foreach { v =>
              val wantN = rows.count(_._2.get(pIdent).contains(v)).toLong
              val gotN = spark.table(s"$cat.db.t")
                .filter(org.apache.spark.sql.functions.col(s"m.$pName") === v)
                .count()
              assert(gotN == wantN,
                s"seed $seed step $step: filter m.$pName=$v: $gotN != $wantN")
            }
        }
      }
    }
  }
}
