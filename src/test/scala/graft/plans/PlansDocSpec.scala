package graft.plans

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** PLANS.md is the committed plan-audit evidence for the whole query
  * surface; r10 shipped it 9 queries stale. This pins the document to
  * the registry: one `## name` section per declared query, no extras,
  * no FAILED sections — so adding a query without regenerating
  * (`sbt "runMain graft.tools.DumpPlans"`) fails CI instead of
  * rotting silently. */
class PlansDocSpec extends AnyFunSuite {

  test("PLANS.md sections equal SparkEntry.queries.keySet, none FAILED") {
    val path = Paths.get("PLANS.md")
    assert(Files.exists(path),
      "PLANS.md missing — regenerate: sbt \"runMain graft.tools.DumpPlans\"")
    val lines = Files.readAllLines(path)
    import scala.jdk.CollectionConverters._
    val sections = lines.asScala.collect {
      case l if l.startsWith("## ") => l.stripPrefix("## ").trim
    }.toSeq
    assert(sections.distinct.size == sections.size,
      s"duplicate sections: ${sections.diff(sections.distinct).distinct}")
    val have = sections.toSet
    val want = SparkEntry.queries.keySet
    val missing = (want -- have).toSeq.sorted
    val extra = (have -- want).toSeq.sorted
    assert(missing.isEmpty && extra.isEmpty,
      s"PLANS.md is stale (regenerate with DumpPlans) — " +
        s"missing: ${missing.mkString(",")}; no-longer-declared: ${extra.mkString(",")}")
    val failed = lines.asScala.count(_.startsWith("FAILED:"))
    assert(failed == 0, s"$failed FAILED sections in PLANS.md")
  }
}
