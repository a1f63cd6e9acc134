package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.SessionDefaults

/** The session-sizing rules (r16) are pure functions — pin the
  * boundaries so a refactor can't silently change what the bench (and
  * the documented library guidance) configures.
  */
class SessionDefaultsSpec extends AnyFunSuite {

  test("codegen cache scales with the query population, floored at 1024") {
    // the 240-query registry at the default units/query
    assert(SessionDefaults.codegenCacheEntries(240) == 240 * 16)
    // small registries never drop below the floor
    assert(SessionDefaults.codegenCacheEntries(0) == 1024)
    assert(SessionDefaults.codegenCacheEntries(10) == 1024)
    assert(SessionDefaults.codegenCacheEntries(64, unitsPerQuery = 16) == 1024)
    assert(SessionDefaults.codegenCacheEntries(65, unitsPerQuery = 16) == 1040)
    intercept[IllegalArgumentException] {
      SessionDefaults.codegenCacheEntries(-1)
    }
    intercept[IllegalArgumentException] {
      SessionDefaults.codegenCacheEntries(10, unitsPerQuery = 0)
    }
  }

  test("advisory partition bytes = typical-shuffle/cores, clamped to [1 MiB, 64 MiB]") {
    val MiB = 1024L * 1024
    // the r15 local[32] rule, now derived: 128 MiB / 32 = 4 MiB
    assert(SessionDefaults.advisoryPartitionBytes(32) == 4 * MiB)
    // a cluster with huge typical shuffles hits Spark's own 64 MiB
    // default — i.e. the advisory is unchanged at cluster scale
    assert(SessionDefaults.advisoryPartitionBytes(
      200, typicalShuffleBytes = 100L * 1024 * MiB) == 64 * MiB)
    // tiny shuffles never push the advisory below 1 MiB of partition
    assert(SessionDefaults.advisoryPartitionBytes(
      1024, typicalShuffleBytes = 8 * MiB) == 1 * MiB)
    intercept[IllegalArgumentException] {
      SessionDefaults.advisoryPartitionBytes(0)
    }
  }
}
