package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static oracle-cost gate (VERDICT r11 #2).
  *
  * Round 11 shipped with an EMPTY driver correctness file because one
  * oracle (s_mmr) was a DuckDB plan bomb: its 8-step chained-CTE
  * greedy referenced each prior step 3×, DuckDB inlines
  * non-materialized CTEs by default, and the plan expanded ~3⁷-fold —
  * ~20 minutes then OOM at an 8 GiB memory limit, which stalled the
  * driver's whole 151-query DuckDB compare. The engine was fine; the
  * GATE was the casualty.
  *
  * This spec makes that failure class impossible to re-ship by
  * bounding the *static inline-expansion factor* of every oracle:
  * for each non-materialized CTE, the number of times its body would
  * be evaluated if DuckDB inlined every non-materialized reference.
  * Computed bottom-up over the CTE reference DAG:
  *
  *   expansion(X) = refs(final → X)
  *                + Σ over later CTEs Y: refs(Y → X) ·
  *                    (1 if Y materialized else expansion(Y))
  *
  * A materialized CTE is evaluated once, so it contributes 1 per
  * reference and resets the chain. The old s_mmr scored 3⁷ ≈ 2187;
  * the pre-fix k-means chains 2⁸ = 256; every legitimate oracle in
  * the suite stays ≤ 64 (measured over all 151 — the worst clean
  * value is x_bm25 at 60). Threshold 64 therefore separates "a hub
  * CTE read a few dozen times" (linear, fine) from "a chain that
  * multiplies" (exponential, the bomb).
  *
  * The parse is deliberately the same flat scan tools/check.py's
  * budget prototype used: every `name AS [MATERIALIZED] (` with a
  * paren-matched body, nested WITHs included, references counted by
  * whole-word match. Overcounting across nested scopes is possible
  * (same-named CTEs in sibling nested bodies) — that only makes the
  * gate stricter, and the fix (materialize the shadowed name) is
  * always cheap and semantics-preserving.
  */
class OracleBudgetSpec extends AnyFunSuite {

  /** Max tolerated static inline-expansion factor for any
    * non-materialized CTE (see class doc for calibration). */
  private val MaxExpansion = 64L

  private case class Cte(name: String, materialized: Boolean,
                         body: String, endPos: Int)

  /** Flat scan: every `ident AS [MATERIALIZED] (` with its
    * paren-matched body; returns the CTEs in definition order plus
    * the text after the last body (the final SELECT). */
  private def parse(sql: String): (Vector[Cte], String) = {
    val re = """(?i)\b(\w+)\s+AS\s+(MATERIALIZED\s+)?\(""".r
    val ctes = re.findAllMatchIn(sql).map { m =>
      var depth = 1
      var i = m.end
      while (i < sql.length && depth > 0) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _   =>
        }
        i += 1
      }
      Cte(m.group(1), m.group(2) != null, sql.substring(m.end, i - 1), i)
    }.toVector
    val finalStart = if (ctes.isEmpty) 0 else ctes.last.endPos
    (ctes, sql.substring(finalStart))
  }

  private def wordRefs(name: String, text: String): Int =
    ("""\b""" + java.util.regex.Pattern.quote(name) + """\b""").r
      .findAllMatchIn(text).size

  /** (cteName, expansion) for every non-materialized CTE whose body
    * would be evaluated more than MaxExpansion times under full
    * inlining. */
  private def bombs(sql: String): Seq[(String, Long)] = {
    val (ctes, finalText) = parse(sql)
    val expansion = scala.collection.mutable.Map.empty[String, Long]
    val flagged = Vector.newBuilder[(String, Long)]
    for (idx <- ctes.indices.reverse) {
      val c = ctes(idx)
      var e: Long = wordRefs(c.name, finalText).toLong
      for (jdx <- (idx + 1) until ctes.length) {
        val later = ctes(jdx)
        val r = wordRefs(c.name, later.body)
        if (r > 0) {
          val mult = if (later.materialized) 1L
                     else expansion.getOrElse(later.name, 1L)
          // saturate the PRODUCT before accumulating: mult is itself
          // clamped at Long.MaxValue/4, so r >= 5 references to an
          // already-huge chain would overflow r * mult and wrap
          // negative, letting an extreme plan bomb pass unflagged
          // (ADVICE r12 #2). Only the threshold comparison matters,
          // so every intermediate caps at the clamp value.
          val cap = Long.MaxValue / 4
          val prod = if (mult != 0L && r > cap / mult) cap else r * mult
          e = math.min(e + prod, cap) // e,prod <= cap => sum can't overflow
        }
      }
      expansion(c.name) = e
      if (!c.materialized && e > MaxExpansion) flagged += ((c.name, e))
    }
    flagged.result()
  }

  test("no oracle has a CTE-inlining plan bomb (expansion factor ≤ 64)") {
    val bad = SparkEntry.oracleSql.toSeq.flatMap { case (qname, sql) =>
      bombs(sql).map { case (cte, e) => s"$qname: CTE '$cte' ×$e" }
    }
    assert(bad.isEmpty,
      s"\nOracles whose non-materialized CTEs would be re-evaluated > " +
      s"$MaxExpansion× under DuckDB's default CTE inlining — add AS " +
      s"MATERIALIZED (the r11 s_mmr bomb class):\n  ${bad.mkString("\n  ")}")
  }

  test("the analyzer itself still catches the r11 s_mmr bomb shape") {
    // Regression-proof the gate: a 7-step chain where each step
    // references its predecessor 3× must blow past the threshold.
    val chain = (2 to 8).map { t =>
      s"""s$t AS (SELECT * FROM s${t - 1}
         | UNION ALL SELECT a.x FROM s${t - 1} a
         | WHERE NOT EXISTS (SELECT 1 FROM s${t - 1} d WHERE d.x = a.x))"""
        .stripMargin
    }.mkString(",\n")
    val sql = s"WITH s1 AS (SELECT 1 AS x),\n$chain\nSELECT * FROM s8"
    val hit = bombs(sql)
    assert(hit.exists { case (n, e) => n == "s1" && e >= 2187 },
      s"analyzer failed to flag the synthetic 3^7 chain: $hit")
    // ...and that materializing each step defuses it.
    val fixed = sql.replaceAll("""\b(s\d+) AS \(""", "$1 AS MATERIALIZED (")
    assert(bombs(fixed).isEmpty, "materialized chain should be clean")
  }

  test("saturation: a 5-ref-per-step chain cannot wrap Long past the gate") {
    // 5 references per step × 31 steps is 5^31 ≈ 4.7e21; before the
    // saturating multiply the product overflowed Long, wrapped
    // negative, and the bomb passed unflagged (ADVICE r12 #2).
    val chain = (2 to 32).map { t =>
      val refs = (1 to 5).map(_ => s"SELECT x FROM s${t - 1}")
        .mkString(" UNION ALL ")
      s"s$t AS ($refs)"
    }.mkString(",\n")
    val sql = s"WITH s1 AS (SELECT 1 AS x),\n$chain\nSELECT * FROM s32"
    val hit = bombs(sql)
    assert(hit.exists { case (n, e) => n == "s1" && e > MaxExpansion && e > 0 },
      s"saturating analyzer failed to flag the 5^31 chain: $hit")
  }
}
