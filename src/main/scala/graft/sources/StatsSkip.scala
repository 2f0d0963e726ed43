package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** Conservative per-file min/max skipping, shared by the log-backed
  * formats: Delta supplies stats from `add.stats` JSON, Iceberg from
  * decoded manifest bounds (rendered to the same JSON shape). The
  * contract: `mayMatch` returns false ONLY when the file provably holds
  * no matching row — unsupported predicate shapes, missing stats, or
  * non-orderable columns keep the file, and callers re-apply the
  * predicate as a normal filter, so semantics never depend on skipping.
  */
object StatsSkip {

  private val M = new ObjectMapper()

  /** Parse a stats JSON once — callers on the per-file hot path (the
    * index's `listFiles` runs per query over every candidate file)
    * cache the parsed tree instead of re-parsing per predicate leaf.
    */
  def parse(stats: String): JsonNode = M.readTree(stats)

  /** Three-valued check of a lowered predicate tree against one file's
    * partition values (exact per the log) and min/max stats JSON
    * (`{"minValues":{...},"maxValues":{...}}`). Handles AND/OR and
    * binary comparisons between a column and a literal; anything else
    * keeps the file.
    */
  def mayMatch(n: org.apache.spark.sql.graft.GraftSql.PredNode,
      schema: StructType, partitionColumns: Seq[String],
      partitionValues: Map[String, String],
      fileStats: Option[String]): Boolean =
    mayMatchParsed(n, schema, partitionColumns, partitionValues,
      fileStats.map(parse))

  /** [[mayMatch]] over a pre-parsed stats tree. */
  def mayMatchParsed(n: org.apache.spark.sql.graft.GraftSql.PredNode,
      schema: StructType, partitionColumns: Seq[String],
      partitionValues: Map[String, String],
      fileStats: Option[JsonNode]): Boolean = {
    import org.apache.spark.sql.graft.GraftSql._

    // None = not comparable (keep the file): unsupported type, a
    // literal that doesn't parse as the column's type, or null
    def cmp(a: Any, b: Any, dt: DataType): Option[Int] =
      if (a == null || b == null) None
      else try dt match {
        case _: LongType | _: IntegerType | _: ShortType | _: ByteType =>
          Some(java.lang.Long.compare(a.toString.toLong, b.toString.toLong))
        case _: DoubleType | _: FloatType =>
          Some(java.lang.Double.compare(a.toString.toDouble,
            b.toString.toDouble))
        // exact compare: a double round-trip loses precision past ~15-16
        // significant digits, and a WRONG proof here silently drops a
        // file the re-applied filter can never recover
        case _: DecimalType =>
          Some(new java.math.BigDecimal(a.toString)
            .compareTo(new java.math.BigDecimal(b.toString)))
        // Spark orders strings by Unicode CODE POINT (UTF-8 byte order);
        // Java String.compareTo is UTF-16 code-UNIT order, which diverges
        // for supplementary characters (surrogates sort above U+E000)
        case _: StringType =>
          Some(StatsSkip.compareCodePoints(a.toString, b.toString))
        // DATE partition values and stats serialize as ISO yyyy-MM-dd,
        // and the literal (java.sql.Date / LocalDate) renders the same
        // — fixed-width ISO compares correctly as code points. Guarded
        // to the 10-char shape: pre-epoch/expanded-year renderings
        // ("+10000-…", "-0044-…") are not fixed-width, so they fall to
        // None (keep the file) instead of a wrong proof.
        case _: DateType
            if a.toString.length == 10 && b.toString.length == 10 =>
          Some(StatsSkip.compareCodePoints(a.toString, b.toString))
        case _ => None
      } catch { case _: NumberFormatException => None }

    // per-column stat access + TYPE-WIDENING-SOUND fp bound text —
    // ONE implementation for the comparison and the IN-set checks: a
    // file written before a float→double widening carries FLOAT stats
    // ("0.1" parses as double 0.1, but the reader widens the stored
    // float to 0.10000000149…), so trusting the parsed double as a
    // bound could PROVE a matching file away (silent row loss); the
    // stat is enveloped with its float-widened rendering — exact when
    // it really was a double, conservative when it was a float.
    def statOf(name: String, kind: String): Option[JsonNode] =
      fileStats.flatMap(stats => Option(stats.get(kind)))
        .flatMap(m => Option(m.get(name))).filterNot(_.isNull)
    def statText(j: JsonNode, dt: DataType, isMax: Boolean): String =
      dt match {
        case _: DoubleType | _: FloatType =>
          try {
            val raw = j.asText
            val d = raw.toDouble
            val f = raw.toFloat.toDouble
            (if (isMax) math.max(d, f) else math.min(d, f)).toString
          } catch { case _: NumberFormatException => j.asText }
        case _ => j.asText
      }

    // op with the column on the LEFT
    def check(name: String, v: Any, op: String): Boolean = {
      val dt = schema.find(_.name == name).map(_.dataType)
        .getOrElse(return true)
      // partition column: the log value is exact for every row
      if (partitionColumns.contains(name))
        return partitionValues.get(name) match {
          case Some(pv) if pv != null =>
            cmp(pv, v, dt).forall(c => op match {
              case "EQ" => c == 0
              case "GT" => c > 0
              case "GE" => c >= 0
              case "LT" => c < 0
              case "LE" => c <= 0
            })
          case _ => true
        }
      def cMin(j: JsonNode): Option[Int] =
        cmp(statText(j, dt, isMax = false), v, dt)
      def cMax(j: JsonNode): Option[Int] =
        cmp(statText(j, dt, isMax = true), v, dt)
      val (mn, mx) = (statOf(name, "minValues"), statOf(name, "maxValues"))
      op match {
        case "EQ" =>
          mn.flatMap(cMin).forall(_ <= 0) && mx.flatMap(cMax).forall(_ >= 0)
        case "GT" => mx.flatMap(cMax).forall(_ > 0)
        case "GE" => mx.flatMap(cMax).forall(_ >= 0)
        case "LT" => mn.flatMap(cMin).forall(_ < 0)
        case "LE" => mn.flatMap(cMin).forall(_ <= 0)
      }
    }

    // `column IN (non-null members)`: the file may match only if some
    // member can equal a row — for a partition column, a member EQUAL
    // to the exact partition value; for stats, a member inside
    // [min,max]. The sorted vector (when the value class has an
    // order) binary-searches for the first member >= min and checks
    // it against max — O(log |set|) per file; unsortable value
    // classes fall back to a linear scan with early exit. Any
    // incomparable pair (cmp → None) keeps the file (the contract:
    // prune only on proof).
    //
    // SOUNDNESS GUARD: `node.sorted` orders members by THEIR runtime
    // class, but the search probes with the dt-driven `cmp` — the two
    // comparators must agree or the binary search runs over a vector
    // it considers misordered and can wrongly PRUNE a matching file
    // (e.g. a bigint column with uncoerced string members '9','10':
    // code-point order ["10","9"], numeric probes). The fast path is
    // therefore taken only when the member class family matches the
    // column's DataType family (then class-order ≡ dt-order by
    // construction of both comparators); any other pairing degrades
    // to the linear scan, which is sound per-pair.
    def checkIn(node: org.apache.spark.sql.graft.GraftSql.PredInSet)
        : Boolean = {
      val name = node.name
      val dt = schema.find(_.name == name).map(_.dataType)
        .getOrElse(return true)
      // nulls were dropped at lowering: an empty set proves no match
      if (node.values.isEmpty) return false
      def classAgrees(h: Any): Boolean = dt match {
        case _: LongType | _: IntegerType | _: ShortType | _: ByteType =>
          h.isInstanceOf[java.lang.Long] || h.isInstanceOf[
            java.lang.Integer] || h.isInstanceOf[java.lang.Short] ||
            h.isInstanceOf[java.lang.Byte]
        case _: DoubleType | _: FloatType =>
          h.isInstanceOf[java.lang.Double] || h.isInstanceOf[
            java.lang.Float]
        case _: DecimalType =>
          h.isInstanceOf[java.math.BigDecimal] ||
            h.isInstanceOf[BigDecimal]
        case _: StringType => h.isInstanceOf[String]
        case _: DateType =>
          h.isInstanceOf[java.sql.Date] ||
            h.isInstanceOf[java.time.LocalDate]
        case _ => false
      }
      val sortedForDt: Option[Vector[Any]] =
        node.sorted.filter(_.headOption.forall(classAgrees))
      if (partitionColumns.contains(name))
        return partitionValues.get(name) match {
          case Some(pv) if pv != null =>
            sortedForDt match {
              case Some(arr) =>
                // binary search for equality under cmp; None → keep
                var lo = 0; var hi = arr.length - 1
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  cmp(pv, arr(mid), dt) match {
                    case None => return true
                    case Some(0) => return true
                    case Some(c) if c < 0 => hi = mid - 1
                    case Some(_) => lo = mid + 1
                  }
                }
                false
              case None =>
                node.values.exists(v => cmp(pv, v, dt).forall(_ == 0))
            }
          case _ => true
        }
      if (fileStats.isEmpty) return true
      val mn = statOf(name, "minValues")
        .map(statText(_, dt, isMax = false))
      val mx = statOf(name, "maxValues")
        .map(statText(_, dt, isMax = true))
      // member-vs-bound check, incomparable (None) keeps the file
      def okMin(v: Any): Boolean = mn.forall(m =>
        cmp(v, m, dt).forall(_ >= 0))
      def okMax(v: Any): Boolean = mx.forall(m =>
        cmp(v, m, dt).forall(_ <= 0))
      sortedForDt match {
        case Some(arr) if mn.isDefined =>
          // first member >= min (cmp-None keeps the file)
          var lo = 0; var hi = arr.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            cmp(arr(mid), mn.get, dt) match {
              case None => return true
              case Some(c) if c < 0 => lo = mid + 1
              case Some(_) => hi = mid
            }
          }
          lo < arr.length && okMax(arr(lo))
        case _ =>
          node.values.exists(v => okMin(v) && okMax(v))
      }
    }

    n match {
      case PredAnd(l, r) =>
        mayMatchParsed(l, schema, partitionColumns, partitionValues,
          fileStats) &&
          mayMatchParsed(r, schema, partitionColumns, partitionValues,
            fileStats)
      case PredOr(l, r) =>
        mayMatchParsed(l, schema, partitionColumns, partitionValues,
          fileStats) ||
          mayMatchParsed(r, schema, partitionColumns, partitionValues,
            fileStats)
      case PredCmp(name, v, op) => check(name, v, op)
      case in: org.apache.spark.sql.graft.GraftSql.PredInSet =>
        checkIn(in)
      case PredUnknown => true
    }
  }

  /** Code-point string comparison — matches Spark's binary (UTF-8 byte)
    * string ordering, which UTF-16 `String.compareTo` does not for
    * supplementary characters. ONE implementation, shared with the
    * PredInSet sort (the sort and this check must agree or the binary
    * search lies).
    */
  def compareCodePoints(x: String, y: String): Int =
    org.apache.spark.sql.graft.GraftSql.compareCodePoints(x, y)

  /** The per-scan `keep` function both lake readers hand to
    * [[LakeScan.scan]]: evaluates every pushed filter against a file's
    * partition values and cached parsed stats, with the predicate
    * LOWERING MEMOIZED per scan (`listFiles` hands the same expression
    * instances to every candidate file — re-lowering per file is a
    * files × filters Catalyst walk for nothing).
    */
  def memoKeep(schema: StructType, partitionColumns: Seq[String])
      : (Seq[org.apache.spark.sql.catalyst.expressions.Expression],
         LogFile) => Boolean = {
    val lowered = new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.sql.catalyst.expressions.Expression,
      org.apache.spark.sql.graft.GraftSql.PredNode]()
    (filters, lf) =>
      filters.forall(e => mayMatchParsed(
        lowered.computeIfAbsent(e,
          org.apache.spark.sql.graft.GraftSql.predicateTreeOf(_)),
        schema, partitionColumns, lf.partitionValues, lf.parsedStats))
  }

  /** Render a decoded (min, max) pair per column into the shared stats
    * JSON shape — what the Iceberg reader feeds from manifest bounds.
    */
  def statsJson(mins: Map[String, String],
      maxs: Map[String, String]): Option[String] = {
    if (mins.isEmpty && maxs.isEmpty) return None
    val o = M.createObjectNode()
    val mn = o.putObject("minValues")
    mins.foreach { case (k, v) => mn.put(k, v) }
    val mx = o.putObject("maxValues")
    maxs.foreach { case (k, v) => mx.put(k, v) }
    Some(M.writeValueAsString(o))
  }
}
