package graft

import org.scalatest.funsuite.AnyFunSuite

/** The at-least-once emission CLASS audit (r12 verdict #4): Spark's
  * foreachBatch may REDELIVER a batch id after a failure, so every
  * streaming flavor in Streams.scala must fall in exactly one of two
  * redelivery-safe classes:
  *
  *   - STATEFUL (captures driver-side `var` state and/or writes an
  *     index artifact): the lambda must bind the batch id and wrap
  *     fold + emission in the `bid > lastApplied` guard — a
  *     redelivered batch folds nothing and re-emits nothing.
  *   - STATELESS (derive-and-emit over the batch + static artifacts,
  *     or over Spark's own checkpointed aggregation state): no
  *     driver-side mutation exists to double-apply; re-emission of
  *     the same frame is the documented at-least-once sink contract.
  *     Such a flavor must NOT write artifacts from inside the lambda.
  *
  * The audit is anchored on an EXPLICIT per-flavor annotation
  * (r13 ADVICE fix): every foreachBatch flavor must carry an
  * `// emission-class: stateful|stateless` marker line, which is the
  * declared class the guard checks key off. The older structural
  * heuristic (var capture / artifact writes) is kept as a tripwire
  * and CROSS-CHECKED against the annotation — a missing annotation,
  * a double annotation, or a disagreement between declaration and
  * structure all fail loudly naming the flavor, instead of a benign
  * refactor silently flipping a classification.
  */
class StreamGuardAuditSpec extends AnyFunSuite {

  private val src = {
    val s = scala.io.Source.fromFile(
      "src/main/scala/graft/streaming/Streams.scala", "UTF-8")
    try s.mkString finally s.close()
  }

  // top-level members of object Streams sit at 2-space indent
  private val defs: Seq[(String, String)] =
    src.split("\n(?=  (?:def|case class|final case class|val) )").toSeq
      .flatMap { chunk =>
        "^  def (\\w+)".r.findFirstMatchIn(chunk)
          .filter(_ => chunk.contains(".foreachBatch"))
          .map(m => m.group(1) -> chunk)
      }

  /** The DECLARED class: the explicit annotation the flavor carries. */
  private def declared(name: String, body: String): String = {
    val anns = "// emission-class: (stateful|stateless)".r
      .findAllMatchIn(body).map(_.group(1)).toList
    assert(anns.size === 1,
      s"$name: expected exactly one '// emission-class:' annotation, " +
        s"found ${anns.size} — every foreachBatch flavor must declare " +
        "its redelivery class explicitly")
    anns.head
  }

  /** The STRUCTURAL heuristic, kept as a cross-check tripwire. */
  private def looksStateful(body: String): Boolean =
    body.contains("\n    var ") || body.contains(".write.") ||
      body.contains("Dir(")

  test("declared emission class matches the structural heuristic — " +
      "a disagreement is a classification decision, not a refactor") {
    val disagreements = defs.flatMap { case (name, body) =>
      val d = declared(name, body)
      val h = if (looksStateful(body)) "stateful" else "stateless"
      if (d == h) None
      else Some(s"$name: annotated $d but structure looks $h")
    }
    assert(disagreements.isEmpty, disagreements.mkString("\n"))
  }

  test("every stateful foreachBatch flavor binds bid and guards on " +
      "bid > lastApplied; stateless flavors never mutate artifacts") {
    val violations = defs.flatMap { case (name, body) =>
      if (declared(name, body) == "stateful") {
        val bindsBid = "foreachBatch \\{ \\(\\w+: DataFrame, bid: Long\\)"
          .r.findFirstIn(body).isDefined
        val hasGuard = body.contains("bid > lastApplied") ||
          body.contains("bid <= lastApplied")
        if (bindsBid && hasGuard) None
        else Some(s"$name: stateful but bindsBid=$bindsBid guard=$hasGuard")
      } else {
        // stateless: must ignore the batch id (the _: Long shape) —
        // binding bid without state is a smell that the guard was
        // meant and forgotten
        val ignoresBid = "foreachBatch \\{ \\(\\w+: DataFrame, _: Long\\)"
          .r.findFirstIn(body).isDefined
        if (ignoresBid) None
        else Some(s"$name: stateless but binds/uses the batch id")
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("classification counts pinned — a new flavor must be placed " +
      "in a redelivery-safe class explicitly") {
    val (st, sl) = defs.partition { case (n, b) =>
      declared(n, b) == "stateful" }
    // 21 → 22 in r15: postingsIngestStreaming (d55, the live BM25
    // postings ingest — gate-then-fold state = the known-token set,
    // bid-guarded like its printAppendStreaming template)
    assert(st.size === 22,
      s"stateful flavors changed: ${st.map(_._1).sorted}")
    assert(sl.size === 26,
      s"stateless flavors changed: ${sl.map(_._1).sorted}")
  }
}
