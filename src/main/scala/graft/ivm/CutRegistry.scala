package graft.ivm

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** INDEX-NATIVE VERSION CUT — the scale fix for the one structure of the
  * lake seam that did not survive unbounded growth: registering the cut
  * as a `_metadata.file_name NOT IN (<every file live at the cut>)`
  * literal put the snapshot's ENTIRE file list into the plan as
  * literals, so analysis/optimization walked an O(files) expression per
  * pass — tens of MB of plan on a million-file 100 TB table.
  *
  * The registered predicate is now `graft_post_cut('<token>',
  * _metadata.file_name)`: ONE function call node in the plan, resolved
  * through the session function registry into a [[PostCut]] expression
  * that carries the cut's file-name set as a single REFERENCE OBJECT
  * (the `ctx.addReferenceObj` mechanism Spark itself uses for oversized
  * literals). Plan size, analysis cost, and `.sql` rendering are all
  * O(1) in snapshot file count; the set ships to executors once per
  * task batch through closure serialization — the same order as a
  * broadcast of the file list, which is what a production engine does.
  *
  * Execution is unchanged from the NOT-IN shape: the predicate
  * references only the `file_name` metadata constant, so
  * [[graft.sources.LakeScan.fileNameEval]] evaluates it PER FILE inside
  * the log-backed index's `listFiles` and the δ arm plans only
  * post-cut files (plan-audited); rows never evaluate it on the
  * pruned scan.
  */
object CutRegistry {

  private val sets = TrieMap[String, java.util.HashSet[UTF8String]]()

  /** Install `token`'s cut file-name set and make sure the session can
    * resolve `graft_post_cut`. Call before registering a predicate that
    * names the token.
    */
  def put(spark: SparkSession, token: String, names: Seq[String]): Unit = {
    val set = new java.util.HashSet[UTF8String](names.size * 2)
    names.foreach(n => set.add(UTF8String.fromString(n)))
    sets.put(validated(token), set)
    ensureRegistered(spark)
  }

  def remove(token: String): Unit = { sets.remove(token); () }

  /** Whether a cut set is currently registered for `token` (spec probe —
    * a released set must not stay pinned).
    */
  def has(token: String): Boolean = sets.contains(token)

  /** Tokens embed the CALLER-SUPPLIED table name and are interpolated
    * into predicate SQL inside single quotes — a quote, backslash, or
    * control character would make the rendered SQL unparseable (or,
    * worse, parse to a DIFFERENT literal than the registry key, so the
    * builder would throw "no cut set registered" at analysis). Reject
    * loudly at registration instead.
    */
  private def validated(token: String): String = {
    require(token.nonEmpty &&
        !token.exists(c => c == '\'' || c == '\\' || c.isControl),
      s"CutRegistry: token ${token.flatMap(c => if (c.isControl) f"\\u${c.toInt}%04x" else c.toString)} " +
        "contains a quote, backslash, or control character — table names " +
        "embedded in cut tokens must not")
    token
  }

  /** The predicate SQL for a cut set: O(1) text regardless of set size. */
  def predicateSql(token: String): String =
    s"graft_post_cut('${validated(token)}', _metadata.file_name)"

  /** Register the `graft_post_cut` builder in the session's function
    * registry (idempotent). Resolution happens at ANALYSIS time on the
    * driver: the builder looks the token up and pins the CURRENT set
    * into the expression — a later [[put]] does not mutate plans already
    * analyzed, the same freeze semantics the literal predicate had.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("graft_post_cut"))) {
      registry.createOrReplaceTempFunction("graft_post_cut", { args =>
        args match {
          case Seq(Literal(token: UTF8String, StringType), child) =>
            val t = token.toString
            PostCut(child, t)(sets.getOrElse(t,
              throw new IllegalStateException(
                s"graft_post_cut: no cut set registered for token '$t' " +
                  "(advance/track must register before queries resolve)")))
          case other => throw new IllegalArgumentException(
            "graft_post_cut(token literal, file_name) expected, got " +
              other.mkString(", "))
        }
      }, "built-in")
    }
  }
}

/** `file_name ∉ <cut set>` — true iff the file is POST-cut (delta by
  * construction). The set is a reference object, never plan literals.
  * A null file name reads as post-cut: only the empty-relation stand-in
  * produces one, and a never-seen file is delta by definition.
  *
  * The set rides a SECOND parameter list so case-class equality and
  * hashCode never traverse it — Catalyst hashes/compares expressions
  * repeatedly (ExpressionSet, canonicalization), and an O(files)
  * HashSet.hashCode per comparison would re-introduce exactly the
  * O(snapshot) analysis cost this expression exists to eliminate.
  * Sets are additionally compared BY REFERENCE in equals, so two
  * registrations under one token never conflate.
  */
final case class PostCut(child: Expression, token: String)(
    val cutFiles: java.util.HashSet[UTF8String])
  extends UnaryExpression with Predicate {

  override def equals(other: Any): Boolean = other match {
    case p: PostCut =>
      p.child == child && p.token == token && (p.cutFiles eq cutFiles)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + token.hashCode) + 17

  // makeCopy/clone gather productIterator ++ otherCopyArgs and match a
  // constructor reflectively — the curried set must ride along (the
  // same pattern Spark's own Alias uses for its second parameter list)
  override def otherCopyArgs: Seq[AnyRef] = cutFiles :: Nil

  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  // O(1) rendering: the default would not print the set, but keep the
  // token visible for plan audits
  override def toString: String = s"graft_post_cut($token, $child)"
  override def sql: String = s"graft_post_cut('$token', ${child.sql})"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v == null || !cutFiles.contains(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cutFiles", cutFiles,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = ${c.isNull} || !$ref.contains(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)(cutFiles)
}
