package graft.operators

import graft.LocalSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Scc]] on graphs whose SCC structure is known by hand —
  * the testdata-driven `llm_graph_scc` query can land on a single
  * giant component at some scales, so directional correctness
  * (cycles vs one-way bridges, nested DAG-of-SCCs shape) is proven
  * here on synthetic graphs.
  */
class SccSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def assign(edges: (String, String)*): Map[String, String] =
    Scc.components(edges.toDF("src", "dst"))
      .as[(String, String)].collect().toMap

  test("two cycles joined by a one-way bridge stay separate SCCs") {
    // a->b->c->a  -->bridge-->  d->e->d
    val m = assign(("a", "b"), ("b", "c"), ("c", "a"),
      ("c", "d"), ("d", "e"), ("e", "d"))
    assert(m("a") === "a" && m("b") === "a" && m("c") === "a")
    assert(m("d") === "d" && m("e") === "d")
  }

  test("a DAG is all singleton SCCs; adding the back edge merges the path") {
    val dag = assign(("a", "b"), ("b", "c"), ("c", "d"))
    assert(dag === Map("a" -> "a", "b" -> "b", "c" -> "c", "d" -> "d"))
    val cycled = assign(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    assert(cycled === Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  test("long cycle needs the path-doubling depth: 40-node ring is one SCC") {
    val ring = (0 until 40).map(i => (f"n$i%02d", f"n${(i + 1) % 40}%02d"))
    val m = assign(ring: _*)
    assert(m.values.toSet === Set("n00"))
    assert(m.size === 40)
  }

  test("self-loop is a cycle of one; opposite arcs are a cycle of two") {
    val m = assign(("a", "a"), ("b", "c"), ("c", "b"), ("c", "z"))
    assert(m("a") === "a")
    assert(m("b") === "b" && m("c") === "b")
    assert(m("z") === "z")
  }

  test("node domains beyond 2^rounds resolve exactly: rounds auto-derive from |V|") {
    // 70 > 2^6: the old fixed default would stop the closure short and
    // split the ring into several wrong components.
    val ring = (0 until 70).map(i => (f"n$i%02d", f"n${(i + 1) % 70}%02d"))
    val m = assign(ring: _*)
    assert(m.size === 70)
    assert(m.values.toSet === Set("n00"))
  }
}
