package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the bench's pure contract helpers — the
  * pieces whose edge cases have burned recorded rounds (r9's
  * parsed:null came from a contract line a few chars over the
  * window). */
object BenchProps extends Properties("Bench") {
  import Prop.forAll

  private val resultsGen: Gen[List[(String, Double)]] =
    Gen.listOf(for {
      n <- Gen.chooseNum(1, 40)
      name <- Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)
      sec <- Gen.chooseNum(0.0, 5000.0)
    } yield (name, sec)).map(_.distinctBy(_._1))

  property("compactLine never exceeds max(budget, zero-shown floor)") =
    forAll(resultsGen, Gen.chooseNum(100, 2500)) { (results, budget) =>
      val floor = Bench.compactLine(results, 0, 1.0, 1.0, "/sf").length min
        Bench.compactLine(results, 0, 1.0, 1.0, "/sf", budget = 0).length
      val line = Bench.compactLine(results, 0, 1.0, 1.0, "/sf", budget = budget)
      line.length <= (budget max floor) && !line.contains("\n")
    }

  property("compactLine is parseable JSON carrying the full total") =
    forAll(resultsGen, Gen.chooseNum(300, 2000)) { (results, budget) =>
      val line = Bench.compactLine(results, 0, 1.0, 1.0, "/sf", budget = budget)
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      math.abs(node.get("value").asDouble - results.map(_._2).sum) < 1.0 &&
        node.get("n_queries").asInt == results.size
    }

  property("compactLine publishes contended exactly when ratio < floor (no ext signal)") =
    forAll(resultsGen, Gen.chooseNum(0.5, 5.0)) { (results, ratio) =>
      val line = Bench.compactLine(results, 0, 1.0, ratio, "/sf")
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      node.get("contended").asBoolean == (ratio < Bench.ContendedRatioFloor) &&
        node.get("ext_cpu_cores") == null
    }

  property("ext-CPU signal overrides the ratio heuristic when present") =
    forAll(resultsGen, Gen.chooseNum(0.5, 5.0), Gen.chooseNum(0.0, 8.0)) {
      (results, ratio, ext) =>
        val line = Bench.compactLine(results, 0, 1.0, ratio, "/sf",
          extCpuCores = Some(ext))
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
        node.get("contended").asBoolean == (ext > Bench.ExtCpuCoresFloor) &&
          math.abs(node.get("ext_cpu_cores").asDouble - ext) <= 0.005 + 1e-9
    }

  property("fmt2 round-trips within a cent and never uses locale separators") =
    forAll(Gen.chooseNum(0.0, 99999.0)) { d =>
      val s = Bench.fmt2(d)
      !s.contains(",") && math.abs(s.toDouble - d) <= 0.005 + 1e-9
    }

  property("mergePasses: clean p2 redeems, p2 error is fatal, min-of-2 otherwise") =
    forAll(Gen.chooseNum(0.01, 5.0), Gen.chooseNum(0.01, 5.0),
      Gen.oneOf(true, false), Gen.oneOf(true, false)) { (t1, t2, e1, e2) =>
      import Bench.Timing
      val p1 = Map("q" -> Timing(t1, if (e1) Some("boom1") else None))
      val p2 = Map("q" -> Timing(t2, if (e2) Some("boom2") else None))
      val (results, errors) = Bench.mergePasses(Seq("q"), p1, p2)
      if (e2) errors.nonEmpty && results.isEmpty
      else if (e1) errors.isEmpty && results == Seq("q" -> t2)
      else errors.isEmpty && results == Seq("q" -> math.min(t1, t2))
    }
}
