package graft.ivm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The five reference plan-shape tests re-expressed in Catalyst (reference
  * `src/optimizer_rules/mod.rs:198-505`): build the plan, wrap it in the
  * [[PosDelta]] marker, run [[PosDeltaRule]], assert the rewritten tree
  * shape. Same fixture schemas as the reference (`users(id,name,address)`,
  * `homes(address,price)`, `mod.rs:213-217, 293-303`).
  */
class PlanShapeSpec extends AnyFunSuite with SparkFixture {

  private lazy val users: DataFrame = {
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "address")
    df.createOrReplaceTempView("users")
    spark.table("users")
  }
  private lazy val homes: DataFrame = {
    import spark.implicits._
    val df = Seq((10L, 100.0), (20L, 200.0)).toDF("address", "price")
    df.createOrReplaceTempView("homes")
    spark.table("homes")
  }

  private def rewrite(df: DataFrame): LogicalPlan =
    PosDeltaRule(Ivm.mark(df))

  /** Strip the alias wrapper a temp-view scan carries. */
  private def unalias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => unalias(c)
    case other => other
  }

  private def assertDeltaScan(p: LogicalPlan): Unit =
    assert(p.isInstanceOf[PosDeltaScan], s"expected PosDeltaScan, got:\n$p")

  private def assertBaseScan(p: LogicalPlan): Unit = unalias(p) match {
    case BaseScan(_) => ()
    case other => fail(s"expected BaseScan, got:\n$other")
  }

  // mod.rs:210-244 — select id, name from users → Projection(PosDeltaScan)
  test("projection rewrites to Project over PosDeltaScan") {
    rewrite(users.select("id", "name")) match {
      case Project(exprs, scan) =>
        assert(exprs.map(_.name) == Seq("id", "name"))
        assertDeltaScan(scan)
      case other => fail(s"expected Project, got:\n$other")
    }
  }

  // mod.rs:247-287 — where id = 1 → Projection(Filter(PosDeltaScan))
  test("filter rewrites to Filter over PosDeltaScan, predicate preserved") {
    rewrite(users.filter("id = 1").select("id", "name")) match {
      case Project(_, Filter(cond, scan)) =>
        assert(cond.sql.contains("id"), s"predicate lost: ${cond.sql}")
        assertDeltaScan(scan)
      case other => fail(s"expected Project(Filter(..)), got:\n$other")
    }
  }

  // mod.rs:290-367 — cross join → Union of 3 arms: (δ,δ), (base,δ), (δ,base)
  test("cross join rewrites to 3-arm union") {
    rewrite(users.crossJoin(homes).select("name", "price")) match {
      case Project(_, u: Union) =>
        assert(u.children.size == 3, s"expected 3 arms:\n$u")
        val Seq(a1, a2, a3) = u.children.map(_.asInstanceOf[Join])
        assertDeltaScan(a1.left); assertDeltaScan(a1.right)
        assertBaseScan(a2.left); assertDeltaScan(a2.right)
        assertDeltaScan(a3.left); assertBaseScan(a3.right)
      case other => fail(s"expected Project(Union(3)), got:\n$other")
    }
  }

  // mod.rs:370-447 — inner equi-join → same 3-arm union, condition cloned
  test("inner join rewrites to 3-arm union with condition in every arm") {
    val q = users.join(homes, users("address") === homes("address"), "inner")
      .select("name", "price")
    rewrite(q) match {
      case Project(_, u: Union) =>
        assert(u.children.size == 3)
        u.children.foreach { arm =>
          val j = arm.asInstanceOf[Join]
          assert(j.condition.isDefined, s"join condition lost:\n$j")
        }
        val Seq(a1, a2, a3) = u.children.map(_.asInstanceOf[Join])
        assertDeltaScan(a1.left); assertDeltaScan(a1.right)
        assertBaseScan(a2.left); assertDeltaScan(a2.right)
        assertDeltaScan(a3.left); assertBaseScan(a3.right)
      case other => fail(s"expected Project(Union(3)), got:\n$other")
    }
  }

  // mod.rs:450-504 — union all → Union of Projection(PosDeltaScan)s
  test("union all maps delta over every input") {
    val q = users.select("id").union(users.select("address"))
    rewrite(q) match {
      case u: Union =>
        assert(u.children.size == 2)
        u.children.foreach {
          case Project(_, scan) => assertDeltaScan(scan)
          case other => fail(s"expected Project(PosDeltaScan), got:\n$other")
        }
      case other => fail(s"expected Union, got:\n$other")
    }
  }

  // mod.rs:187 fall-through — we fail fast instead of leaving the marker
  test("unsupported operator under delta fails fast with the operator name") {
    val e = intercept[UnsupportedOperationException] {
      rewrite(users.groupBy("name").count())
    }
    assert(e.getMessage.contains("Aggregate"))
  }
}
