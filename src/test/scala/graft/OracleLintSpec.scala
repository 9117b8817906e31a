package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every DuckDB oracle in [[SparkEntry.oracleSql]] for the
  * recurring HUGEINT failure class (q_pack r5, q_source_stats r6): DuckDB's
  * `sum` over an integer column returns HUGEINT, which the driver's
  * comparator serializes as float64 while Spark emits LongType — a hash
  * mismatch on numerically identical values. Rule pinned by the r6 verdict:
  * any integer aggregate whose value reaches the comparator (i.e. appears
  * raw in the final SELECT list) must be wrapped in `CAST(... AS BIGINT)`.
  *
  * The lint flags every un-CAST `sum(...) AS alias` whose alias (or the sum
  * itself) surfaces in the final top-level SELECT list without a CAST.
  * Double-typed sums (weights, scores) are HUGEINT-safe; they are listed in
  * the allowlist below with the reason, so a *new* raw integer sum fails
  * this suite before it can red a driver round.
  */
class OracleLintSpec extends AnyFunSuite {

  /** (query, alias) pairs verified to aggregate DOUBLE (or otherwise
    * non-integer) expressions — DuckDB returns DOUBLE, no dtype skew. */
  private val allow: Set[(String, String)] = Set(
    // sum(delta): delta = (1 + delta) / sigma chain → DOUBLE.
    ("q_betweenness_endpoints", "raw"),
    // sum(e.weight): supp_edges weight is CAST(count(*) AS DOUBLE).
    ("q_coarsen", "weight"),
    // in_w consumed only inside round(sum(... / m2 ...), 6) → DOUBLE.
    ("q_modularity", "in_w"),
    // sum(weight) over DOUBLE fixture weights.
    ("q_overlap_weighted", "d"),
    // sum(CAST(l_quantity AS DOUBLE)) → DOUBLE.
    ("q_stream_vertex_summary", "weight_sum"),
  )

  /** Index of the last `SELECT` keyword at paren depth 0. */
  private def finalSelectStart(sql: String): Int = {
    val upper = sql.toUpperCase
    var depth = 0
    var last = -1
    var i = 0
    while (i < upper.length) {
      upper.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'S' if depth == 0 && upper.startsWith("SELECT", i) &&
          (i == 0 || !Character.isLetterOrDigit(upper.charAt(i - 1))) =>
          last = i
        case _ =>
      }
      i += 1
    }
    last
  }

  /** Text of the final top-level SELECT list (between SELECT and its FROM
    * at depth 0, or end of string). */
  private def finalSelectList(sql: String): String = {
    val start = finalSelectStart(sql)
    if (start < 0) return ""
    val tail  = sql.substring(start + "SELECT".length)
    val upper = tail.toUpperCase
    var depth = 0
    var i = 0
    while (i < upper.length) {
      upper.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'F' if depth == 0 && upper.startsWith("FROM", i) &&
          (i == 0 || !Character.isLetterOrDigit(upper.charAt(i - 1))) =>
          return tail.substring(0, i)
        case _ =>
      }
      i += 1
    }
    tail
  }

  /** All `sum(` occurrences (incl. window sums) with their alias, where the
    * select item containing the sum has no `CAST(` before the sum — i.e.
    * the sum's value is not cast on its way out of that item. */
  private def uncastSums(region: String): Seq[(String, String)] = {
    val sumRx = "(?i)\\bsum\\s*\\(".r
    sumRx.findAllMatchIn(region).toSeq.flatMap { m =>
      // Item start: last top-level-ish boundary before the sum.
      val before    = region.substring(0, m.start)
      val boundary  = math.max(math.max(before.lastIndexOf(','),
        before.toUpperCase.lastIndexOf("SELECT")), 0)
      val item      = before.substring(boundary)
      val hasCast   = "(?i)\\bcast\\s*\\(".r.findFirstIn(item).isDefined
      if (hasCast) None
      else {
        // Find the matching close paren of sum( then an optional
        // `OVER (...)` and the ` AS alias`.
        var depth = 1
        var i = m.end
        while (i < region.length && depth > 0) {
          region.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        var rest = region.substring(math.min(i, region.length))
        val over = "(?is)^\\s*OVER\\s*\\(".r.findFirstMatchIn(rest)
        over.foreach { o =>
          var d = 1; var j = o.end
          while (j < rest.length && d > 0) {
            rest.charAt(j) match {
              case '(' => d += 1
              case ')' => d -= 1
              case _ =>
            }
            j += 1
          }
          rest = rest.substring(j)
        }
        "(?is)^\\s*AS\\s+([A-Za-z_][A-Za-z_0-9]*)".r
          .findFirstMatchIn(rest).map(am => (am.group(1), item.trim.take(60)))
      }
    }
  }

  test("no un-CAST integer-capable sum reaches a final SELECT list") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val sums  = uncastSums(sql)
        val fin   = finalSelectList(sql)
        // A sum is comparator-visible if its alias appears raw in the final
        // select list (bare or table-qualified, not wrapped in CAST within
        // its item), or the sum itself sits in the final select list.
        val finSums = uncastSums(fin).map { case (a, ctx) => (a, ctx) }
        val aliasHits = sums.filter { case (alias, _) =>
          val rx = ("(?i)(^|[\\s,(])((\\w+\\.)?" + alias +
            ")\\s*(,|$|\\s+AS\\s+\\w+)").r
          rx.findFirstMatchIn(fin).exists { hit =>
            val boundary = math.max(math.max(
              fin.substring(0, hit.start).lastIndexOf(','), 0),
              fin.substring(0, hit.start).toUpperCase.lastIndexOf("SELECT"))
            val item = fin.substring(boundary, math.min(hit.start + 1, fin.length))
            !"(?i)\\bcast\\s*\\(".r.findFirstIn(item).isDefined
          }
        }
        (finSums ++ aliasHits).distinct.collect {
          case (alias, ctx) if !allow.contains((name, alias)) =>
            s"$name: sum(...) AS $alias reaches the comparator un-CAST " +
              s"(item: `$ctx`)"
        }
    }
    assert(offenders.isEmpty,
      "\nHUGEINT hazard (wrap in CAST(... AS BIGINT) or allowlist with a " +
        "verified-double reason):\n" + offenders.mkString("\n"))
  }
}
