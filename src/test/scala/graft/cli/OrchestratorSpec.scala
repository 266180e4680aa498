package graft.cli

import java.nio.file.Files
import graft.SparkSpec
import Orchestrator._

class OrchestratorSpec extends SparkSpec {

  private def task(name: String, deps: Seq[String] = Nil,
      fn: () => Unit = () => (), retries: Int = 2): TaskDef =
    TaskDef(name, deps, fn, retries)

  test("topoOrder respects dependencies, declaration order, and rejects bad graphs") {
    val order = topoOrder(Seq(
      task("export", Seq("gold")), task("gold", Seq("silver")),
      task("validate", Seq("gold")), task("silver", Seq("bronze")),
      task("bronze"))).map(_.name)
    assert(order === Seq("bronze", "silver", "gold", "export", "validate"))
    intercept[IllegalArgumentException] {
      topoOrder(Seq(task("a", Seq("b")), task("b", Seq("a"))))
    }
    intercept[IllegalArgumentException] {
      topoOrder(Seq(task("a", Seq("ghost"))))
    }
    intercept[IllegalArgumentException] {
      topoOrder(Seq(task("a"), task("a")))
    }
  }

  test("flaky task retries with delay, then succeeds") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val runs = runDag(Seq(
      TaskDef("flaky", Nil, () => {
        calls += 1
        if (calls < 3) sys.error(s"transient #$calls")
      }, retries = 2, retryDelayMs = 50L)), sleep = slept += _)
    assert(runs === Seq(TaskRun("flaky", Succeeded, 3, None)))
    assert(slept.toSeq === Seq(50L, 50L), "delay before each retry, not the first try")
  }

  test("permanent failure skips transitive downstream, independent branch runs") {
    var ran = List.empty[String]
    val runs = runDag(Seq(
      task("a", fn = () => ran ::= "a"),
      task("bad", fn = () => sys.error("boom"), retries = 1),
      task("b", Seq("bad"), () => ran ::= "b"),
      task("c", Seq("b"), () => ran ::= "c"),
      task("d", Seq("a"), () => ran ::= "d")))
    val byName = runs.map(r => r.name -> r).toMap
    assert(byName("a").status === Succeeded)
    assert(byName("bad").status === Failed)
    assert(byName("bad").attempts === 2) // 1 try + 1 retry
    assert(byName("bad").error.exists(_.contains("boom")))
    assert(byName("b").status === UpstreamFailed)
    assert(byName("c").status === UpstreamFailed) // transitive
    assert(byName("d").status === Succeeded)
    assert(ran.reverse === List("a", "d"))
    assert(byName("b").attempts === 0, "skipped tasks never run")
  }

  test("monthly DAG drives the real pipeline end-to-end") {
    val wh = Files.createTempDirectory("graft-dag").toString
    val runs = runDag(monthlyDag(spark, fixture("flights.csv"),
      fixture("L_AIRPORT_ID.csv"), fixture("L_UNIQUE_CARRIERS.csv"),
      wh, incremental = false))
    val byName = runs.map(r => r.name -> r.status).toMap
    // the 13-row fixture intentionally trips two silver `mostly`
    // thresholds (see IncrementalPipelineSpec), so the validate task
    // fails — and ONLY it; the build+export chain must succeed
    assert(byName === Map("bronze" -> Succeeded, "silver" -> Succeeded,
      "gold" -> Succeeded, "export" -> Succeeded, "validate" -> Failed))
  }
}
