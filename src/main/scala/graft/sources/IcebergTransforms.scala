package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg PARTITION TRANSFORMS (spec "Partition Transforms" +
  * Appendix B): `days`/`hours`/`month`/`year` bucket time into epoch
  * ordinals, `bucket[N]` hashes with murmur3-x86-32, `truncate[W]`
  * floors numbers / prefixes strings. A transformed partition value is
  * a DERIVED value, not a column value — the column itself stays in the
  * data files (hidden partitioning) — so the reader's job is FILE
  * PRUNING: from a file's transformed value, derive the bounds the
  * SOURCE column must lie in and decide pushed predicates against them.
  * `days(ts)` is the single most common production Iceberg layout; the
  * identity-only reader excluded those tables outright (the r9
  * verdict's item 4).
  *
  * All pruning here is conservative three-valued, same contract as
  * [[StatsSkip]]: `false` only when the file provably holds no matching
  * row; unsupported shapes, unparseable literals, and null partition
  * values keep the file, and callers re-apply the predicate as a normal
  * filter, so semantics never depend on it.
  */
object IcebergTransforms {

  sealed trait Transform
  case object Identity extends Transform
  case object Days extends Transform
  case object Hours extends Transform
  case object Month extends Transform
  case object Year extends Transform
  final case class Bucket(n: Int) extends Transform
  final case class Truncate(w: Int) extends Transform

  /** One partition-spec field: the spec's field name (the manifest
    * partition record's key), the resolved SOURCE column, its type, and
    * the transform.
    */
  final case class Field(fieldName: String, sourceName: String,
      sourceType: DataType, transform: Transform)

  /** Parse the spec's transform string (`identity`, `days`, `hours`,
    * `month`, `year`, `bucket[16]`, `truncate[4]`). Unknown transforms
    * (e.g. `void`) fail fast — treating a derived value as prunable
    * without knowing the derivation would be silently wrong.
    */
  def parseTransform(s: String): Transform = s match {
    case "identity" => Identity
    case "days" | "day" => Days
    case "hours" | "hour" => Hours
    case "months" | "month" => Month
    case "years" | "year" => Year
    case b if b.startsWith("bucket[") && b.endsWith("]") =>
      Bucket(b.stripPrefix("bucket[").stripSuffix("]").toInt)
    case t if t.startsWith("truncate[") && t.endsWith("]") =>
      Truncate(t.stripPrefix("truncate[").stripSuffix("]").toInt)
    case other => throw new UnsupportedOperationException(
      s"Iceberg: partition transform '$other' is not supported")
  }

  /** The writer-side spec-string syntax ([[Iceberg.stageAppend]]'s
    * `partitionBy` entries): `col`, `days(col)`, `hours(col)`,
    * `month(col)`, `year(col)`, `bucket(N, col)`, `truncate(W, col)`.
    */
  private val FnRe = "([a-z]+)\\(\\s*([^,)]+?)\\s*\\)".r
  private val FnArgRe = "([a-z]+)\\(\\s*(\\d+)\\s*,\\s*([^,)]+?)\\s*\\)".r

  final case class SpecField(fieldName: String, sourceName: String,
      transform: Transform)

  def parseSpec(s: String): SpecField = s.trim match {
    case FnArgRe("bucket", n, c) =>
      SpecField(s"${c}_bucket", c, Bucket(n.toInt))
    case FnArgRe("truncate", w, c) =>
      SpecField(s"${c}_trunc", c, Truncate(w.toInt))
    case FnRe(fn, c) =>
      val t = parseTransform(fn)
      val suffix = t match {
        case Days => "_day"
        case Hours => "_hour"
        case Month => "_month"
        case Year => "_year"
        case _ => throw new IllegalArgumentException(
          s"parseSpec: '$s' — $fn takes (width, col)")
      }
      SpecField(s"$c$suffix", c, t)
    case plain => SpecField(plain, plain, Identity)
  }

  /** Render a transform back to the metadata JSON string. */
  def transformJson(t: Transform): String = t match {
    case Identity => "identity"
    case Days => "days"
    case Hours => "hours"
    case Month => "month"
    case Year => "year"
    case Bucket(n) => s"bucket[$n]"
    case Truncate(w) => s"truncate[$w]"
  }

  /** Render a resolved field back to the writer spec-string syntax (so
    * DML fixtures can re-commit a table's existing spec verbatim).
    */
  def specString(f: Field): String = f.transform match {
    case Identity => f.sourceName
    case Days => s"days(${f.sourceName})"
    case Hours => s"hours(${f.sourceName})"
    case Month => s"month(${f.sourceName})"
    case Year => s"year(${f.sourceName})"
    case Bucket(n) => s"bucket($n, ${f.sourceName})"
    case Truncate(w) => s"truncate($w, ${f.sourceName})"
  }

  // ---- bucket hashing (spec Appendix B) ----------------------------------

  /** murmur3-x86-32, seed 0 — the spec's bucket hash. */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h = 0
    var i = 0
    while (i + 4 <= len) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    val tail = len & 3
    if (tail >= 3) k1 ^= (data(i + 2) & 0xff) << 16
    if (tail >= 2) k1 ^= (data(i + 1) & 0xff) << 8
    if (tail >= 1) {
      k1 ^= data(i) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h ^= k1
    }
    h ^= len
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
    h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  /** Bucket ordinal of a long (ints/longs/dates/timestamps hash as an
    * 8-byte little-endian long per the spec).
    */
  def bucketLong(v: Long, n: Int): Int = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v)
    (murmur3(b.array()) & Integer.MAX_VALUE) % n
  }

  /** Bucket ordinal of a string (UTF-8 bytes per the spec). */
  def bucketString(s: UTF8String, n: Int): Int =
    (murmur3(s.getBytes) & Integer.MAX_VALUE) % n

  // ---- pruning -----------------------------------------------------------

  private val DayUs = 86400000000L
  private val HourUs = 3600000000L

  /** The pushed literal as epoch MICROS (timestamp sources) — handles
    * the external value shapes Spark/Column predicates surface.
    */
  private def toMicros(v: Any): Option[Long] = v match {
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case d: java.time.LocalDateTime =>
      Some(d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        d.getNano / 1000L)
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
    case d: java.time.LocalDate => Some(d.toEpochDay * DayUs)
    case s: String =>
      try Some(java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
      catch {
        case _: Exception =>
          try Some(java.time.LocalDate.parse(s).toEpochDay * DayUs)
          catch { case _: Exception => None }
      }
    case _ => None
  }

  private def toEpochDay(v: Any): Option[Long] = v match {
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case s: String =>
      try Some(java.time.LocalDate.parse(s).toEpochDay)
      catch { case _: Exception => None }
    case _ => None
  }

  private def toLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case s: String => try Some(s.toLong)
      catch { case _: Exception => None }
    case _ => None
  }

  /** lo/hi decision — identical rules to min/max stats skipping. */
  private def decide(lo: Long, hi: Long, t: Long, op: String): Boolean =
    op match {
      case "EQ" => lo <= t && t <= hi
      case "GT" => hi > t
      case "GE" => hi >= t
      case "LT" => lo < t
      case "LE" => lo <= t
      case _ => true
    }

  /** May a file with transformed partition value `pv` (the protocol's
    * string rendering) hold a row where `source op literal`?
    */
  private def check(f: Field, pv: String, literal: Any,
      op: String): Boolean = {
    def timeBounds(mk: Long => (Long, Long)): Boolean =
      (try Some(pv.toLong) catch {
        case _: NumberFormatException => None
      }) match {
        case Some(ord) =>
          val (lo, hi) = mk(ord)
          f.sourceType match {
            case DateType =>
              // day-space compare for DATE sources
              toEpochDay(literal)
                .forall(t => decide(lo / DayUs, (hi + 1) / DayUs - 1, t, op))
            case _: TimestampType | _: TimestampNTZType =>
              toMicros(literal).forall(t => decide(lo, hi, t, op))
            case _ => true
          }
        case None => true
      }
    f.transform match {
      case Identity => true // handled by StatsSkip's exact partition path
      case Days => timeBounds(d => (d * DayUs, (d + 1) * DayUs - 1))
      case Hours => timeBounds(h => (h * HourUs, (h + 1) * HourUs - 1))
      case Month => timeBounds { m =>
        val start = java.time.LocalDate.of(1970, 1, 1).plusMonths(m)
        (start.toEpochDay * DayUs,
          start.plusMonths(1).toEpochDay * DayUs - 1)
      }
      case Year => timeBounds { y =>
        val start = java.time.LocalDate.of(1970, 1, 1).plusYears(y)
        (start.toEpochDay * DayUs,
          start.plusYears(1).toEpochDay * DayUs - 1)
      }
      case Bucket(n) if op == "EQ" =>
        val want = try pv.toInt catch {
          case _: NumberFormatException => return true
        }
        f.sourceType match {
          case _: LongType | _: IntegerType =>
            toLong(literal).forall(v => bucketLong(v, n) == want)
          case _: StringType => literal match {
            case s: String =>
              bucketString(UTF8String.fromString(s), n) == want
            case _ => true
          }
          case _ => true
        }
      case Bucket(_) => true // ranges don't constrain a hash bucket
      case Truncate(w) => f.sourceType match {
        case _: LongType | _: IntegerType =>
          (try Some(pv.toLong) catch {
            case _: NumberFormatException => None
          }).forall(lo => toLong(literal)
            .forall(t => decide(lo, lo + w - 1, t, op)))
        case _: StringType => literal match {
          case s: String => op match {
            // rows have prefix pv: min = pv itself, max unbounded above
            case "EQ" => StatsSkip.compareCodePoints(
              truncateString(s, w), pv) == 0
            case "LT" => StatsSkip.compareCodePoints(pv, s) < 0
            case "LE" => StatsSkip.compareCodePoints(pv, s) <= 0
            case _ => true
          }
          case _ => true
        }
        case _ => true
      }
    }
  }

  /** First `w` CODE POINTS (the spec's string truncate). */
  def truncateString(s: String, w: Int): String = {
    var i = 0
    var n = 0
    while (i < s.length && n < w) {
      i += Character.charCount(s.codePointAt(i))
      n += 1
    }
    s.substring(0, i)
  }

  /** Three-valued check of a lowered predicate against one file's
    * transformed partition values. Composes with [[StatsSkip]] (which
    * handles identity fields and per-file column bounds).
    */
  def mayMatch(n: org.apache.spark.sql.graft.GraftSql.PredNode,
      fields: Seq[Field], pv: Map[String, String]): Boolean = {
    import org.apache.spark.sql.graft.GraftSql._
    n match {
      case PredAnd(l, r) => mayMatch(l, fields, pv) && mayMatch(r, fields, pv)
      case PredOr(l, r) => mayMatch(l, fields, pv) || mayMatch(r, fields, pv)
      case PredCmp(name, v, op) =>
        fields.filter(f => f.sourceName == name &&
            f.transform != Identity).forall { f =>
          pv.get(f.fieldName).filter(_ != null)
            .forall(value => check(f, value, v, op))
        }
      // `column IN (members)`: the file may match only if SOME member
      // transforms to this file's partition value (per-member EQ
      // through the same transform check). An emptied (post-null-
      // drop) set proves no row matches; sets past the cap keep the
      // file — the per-file member sweep is O(|set|) transform evals
      // here, and StatsSkip's column-bounds binary search still
      // prunes on the untransformed values.
      case in: PredInSet =>
        if (in.values.isEmpty) false
        else if (in.values.size > 1000) true
        else fields.filter(f => f.sourceName == in.name &&
            f.transform != Identity).forall { f =>
          pv.get(f.fieldName).filter(_ != null).forall(value =>
            in.values.exists(v => check(f, value, v, "EQ")))
        }
      case PredUnknown => true
    }
  }

  /** Per-scan keep for the transform fields, memoizing the predicate
    * lowering (same shape as [[StatsSkip.memoKeep]]); identity-only
    * specs return a constant-true keep.
    */
  def memoKeep(fields: Seq[Field])
      : (Seq[org.apache.spark.sql.catalyst.expressions.Expression],
         LogFile) => Boolean = {
    val active = fields.filter(_.transform != Identity)
    if (active.isEmpty) (_, _) => true
    else {
      val lowered = new java.util.concurrent.ConcurrentHashMap[
        org.apache.spark.sql.catalyst.expressions.Expression,
        org.apache.spark.sql.graft.GraftSql.PredNode]()
      (filters, lf) =>
        filters.forall(e => mayMatch(
          lowered.computeIfAbsent(e,
            org.apache.spark.sql.graft.GraftSql.predicateTreeOf(_)),
          active, lf.partitionValues))
    }
  }
}

/** The spec's `bucket[N]` transform as a native codegen'd expression —
  * the writer derives partition ordinals with it (no UDF), and at scale
  * it doubles as the hash for bucket-aligned co-partitioning of reads
  * against a bucket-partitioned Iceberg table. Long/int sources hash as
  * 8-byte little-endian longs, strings as UTF-8 bytes (Appendix B).
  */
final case class IceBucket(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    child.dataType match {
      case _: LongType => IcebergTransforms.bucketLong(
        input.asInstanceOf[Long], n)
      case _: IntegerType => IcebergTransforms.bucketLong(
        input.asInstanceOf[Int].toLong, n)
      case _: StringType => IcebergTransforms.bucketString(
        input.asInstanceOf[UTF8String], n)
      case other => throw new UnsupportedOperationException(
        s"iceberg_bucket: unsupported source type $other")
    }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val helper = IcebergTransforms.getClass.getName.stripSuffix("$") + "$.MODULE$"
    child.dataType match {
      case _: LongType =>
        defineCodeGen(ctx, ev, c => s"$helper.bucketLong($c, $n)")
      case _: IntegerType =>
        defineCodeGen(ctx, ev, c => s"$helper.bucketLong((long) $c, $n)")
      case _: StringType =>
        defineCodeGen(ctx, ev, c => s"$helper.bucketString($c, $n)")
      case other => throw new UnsupportedOperationException(
        s"iceberg_bucket: unsupported source type $other")
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
