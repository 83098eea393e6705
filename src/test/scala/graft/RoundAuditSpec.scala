package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-exactness gate for float rounding (SURVEY §2.18): every
  * `round(` site in src/main/scala must be listed in
  * tools/round_whitelist.txt, whose header documents the deterministic-
  * input classes (C1–C4) under which rounding is cross-engine-stable.
  * A NEW site on a non-deterministic double (double-ordered SUM/AVG,
  * window sums over doubles) is the r9 embed_jl_project red-row class —
  * this spec forces it through a conscious classification (or a
  * migration to Similarity.gridQuantize + bucket4 / exact BIGINT /
  * DECIMAL accumulation) before it can land.
  */
class RoundAuditSpec extends AnyFunSuite {

  private def repoRoot = {
    var p = Paths.get(".").toAbsolutePath.normalize
    while (!Files.exists(p.resolve("build.sbt"))) p = p.getParent
    p
  }

  test("every round( site in src/main is whitelisted with a safety class") {
    val root = repoRoot
    val src = root.resolve("src/main/scala")
    val wlPath = root.resolve("tools/round_whitelist.txt")
    assert(Files.exists(wlPath), s"missing $wlPath")
    val wl = Files.readAllLines(wlPath).asScala
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .toSet

    val found = Files.walk(src).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val rel = src.relativize(p).toString
        Files.readAllLines(p).asScala.flatMap { line =>
          val t = line.trim
          val isComment =
            t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
          if (!isComment && t.contains("round(") && !t.contains("math.round"))
            Some(s"$rel|$t")
          else None
        }
      }
      .toSet

    val unlisted = found.diff(wl)
    assert(unlisted.isEmpty,
      "un-whitelisted round( sites (classify in tools/round_whitelist.txt " +
        "per its header, or migrate to gridQuantize+bucket4 / BIGINT / " +
        "DECIMAL):\n" + unlisted.toSeq.sorted.mkString("\n"))

    // stale entries are noise that hides real drift — keep the file tight
    val stale = wl.diff(found)
    assert(stale.isEmpty,
      "stale whitelist entries (regenerate: python3 " +
        "tools/gen_round_whitelist.py):\n" +
        stale.toSeq.sorted.mkString("\n"))
  }
}
