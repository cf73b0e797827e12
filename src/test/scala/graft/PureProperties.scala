package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.cdc.Cdc
import graft.streaming.DynamicBatchSizeWait

/** ScalaCheck properties of graft's pure (non-Spark) functions — picked up
  * directly by sbt's test framework. */
object PureProperties extends Properties("graft.pure") {

  private val destGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('.'), Gen.const('_')))
      .map(_.mkString)

  property("routeDestination never emits dots") =
    Prop.forAll(destGen) { dest =>
      !Cdc.routeDestination(dest).contains(".")
    }

  property("routeDestination is idempotent") =
    Prop.forAll(destGen) { dest =>
      val once = Cdc.routeDestination(dest)
      Cdc.routeDestination(once) == once
    }

  property("routeDestination without regexp never injects the replacement") =
    Prop.forAll(destGen) { dest =>
      Cdc.routeDestination(dest, None, Some("XX")) ==
        dest.replace(".", "_")
    }

  property("DynamicBatchSizeWait sleeps stay in [100ms, maxWaitMs] over any history") =
    Prop.forAll(Gen.chooseNum(1, 100000), Gen.chooseNum(100L, 60000L),
      Gen.listOfN(8, Gen.chooseNum(1L, 200000L))) { (maxBatch, maxWait, sizes) =>
      val w = new DynamicBatchSizeWait(maxBatch, maxWait)
      sizes.forall { s =>
        val ms = w.nextWaitMs(s)
        ms >= 100L && ms <= maxWait
      }
    }

  property("op priority is total and matches the reference order c<r<u<d") =
    Prop.forAll(Gen.oneOf("c", "r", "u", "d"), Gen.oneOf("c", "r", "u", "d")) {
      (a, b) =>
        val order = Seq("c", "r", "u", "d")
        (Cdc.OpPriority(a) < Cdc.OpPriority(b)) ==
          (order.indexOf(a) < order.indexOf(b))
    }
}
