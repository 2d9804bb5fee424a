package graft.index

import org.scalatest.funsuite.AnyFunSuite

class SnapshotMetaSpec extends AnyFunSuite {

  test("manifest round-trips the analyzer; legacy default = standard") {
    val meta = SnapshotMeta(3, 10L, 5.0, 16, 1000L, 16, 1.2, 0.0, 42L,
      Map("def" -> 2), analyzer = "whitespace")
    assert(Snapshot.parse(meta.toJson) == meta)
    // a pre-analyzer-field manifest parses with the analyzer it was
    // actually built with
    val legacy = meta.toJson.replace("\"analyzer\":\"whitespace\",", "")
    assert(Snapshot.parse(legacy).analyzer == "standard")
  }
}
