package graft

import graft.llm.Normalize
import org.apache.spark.sql.functions._

/** Text normalization: typography mapping, control strip, whitespace
  * collapse — the C4-style cleanup pass (llm/Normalize).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(Normalize.normalize(col("t")))
      .as[String].head()

  test("curly quotes and dashes map to ASCII, NBSP to space") {
    assert(norm("‘a’ “b” c–d e—f") ===
      "'a' \"b\" c-d e-f")
    assert(norm("g  h") === "g h")
  }

  test("control chars become spaces and runs collapse") {
    assert(norm("a b\tc\r\nd") === "a b c d")
    assert(norm("  a   b  ") === "a b")
    // U+000B is caught by the control-char class (it is 0x0B), NOT by
    // the whitespace class — the explicit [ \t\n\r\f] dodges the
    // Java-\s vs RE2-\s disagreement on exactly this char
    assert(norm("ab") === "a b")
  }

  test("already-clean text is a fixpoint; null propagates") {
    assert(norm("plain single spaced text") === "plain single spaced text")
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(Normalize.normalize(col("t"))).as[String].collect()
    assert(r === Seq(null))
  }

  test("planted q120 perturbation restores exactly") {
    val text = "key agg row scan"
    val dirty = "  " + text.replace(" ", "  ") + " "
    assert(norm(dirty) === text)
  }
}
