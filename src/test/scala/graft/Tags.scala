package graft

import org.scalatest.Tag

/** Exhaustive protocol sweeps (every crash window × every store
  * semantics) that do not fit a CI window: `sbt test` excludes this
  * tag by default (build.sbt) so the default lane finishes quickly;
  * the full batteries stay runnable explicitly with
  * `GRAFT_SLOW_TESTS=1 sbt test` or `sbt "testOnly graft.CrashWindowSpec"`.
  * A strided fast smoke of each protocol family stays in the default
  * lane so a protocol regression still fails fast.
  */
object Slow extends Tag("graft.Slow")
