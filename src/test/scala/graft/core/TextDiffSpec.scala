package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TextDiffSpec extends AnyFunSuite {

  test("marks changed lines and collapses distant unchanged runs") {
    val a = (1 to 20).map(i => s"line$i").mkString("\n")
    val b = (1 to 20).map(i => if (i == 10) "CHANGED" else s"line$i").mkString("\n")
    val d = TextDiff.unified(a, b, context = 2)
    assert(d.contains("- line10"))
    assert(d.contains("+ CHANGED"))
    assert(d.contains("  line8") && d.contains("  line12")) // context kept
    assert(!d.contains("line5")) // far lines collapsed
    assert(d.contains("…"))
  }

  test("pure insertion and deletion") {
    assert(TextDiff.unified("a\nb", "a\nx\nb").contains("+ x"))
    assert(TextDiff.unified("a\nx\nb", "a\nb").contains("- x"))
  }

  test("identical input yields no +/- lines") {
    val d = TextDiff.unified("a\nb\nc", "a\nb\nc")
    assert(!d.split("\n").exists(l => l.startsWith("+") || l.startsWith("-")))
  }
}
