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
  * This is a source-scan over graft/streaming/Streams.scala — the
  * audit fails when someone adds a foreachBatch that captures state
  * without the guard (the r12 sketchFold/ksDrift bug, as a class),
  * and the pinned counts flag any new flavor for classification.
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

  private def stateful(body: String): Boolean =
    body.contains("\n    var ") || body.contains(".write.") ||
      body.contains("Dir(")

  test("every stateful foreachBatch flavor binds bid and guards on " +
      "bid > lastApplied; stateless flavors never mutate artifacts") {
    val violations = defs.flatMap { case (name, body) =>
      if (stateful(body)) {
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
    val (st, sl) = defs.partition { case (_, b) => stateful(b) }
    assert(st.size === 21,
      s"stateful flavors changed: ${st.map(_._1).sorted}")
    assert(sl.size === 26,
      s"stateless flavors changed: ${sl.map(_._1).sorted}")
  }
}
