package graft.surface

import org.scalatest.funsuite.AnyFunSuite

import graft.surface.TextSurface.{Detection, VariantHit}

/** Mirror of the reference's mocked-datastore text detection tests
  * (ner_v2/detectors/textual/tests/test_text_detection.py): the candidate
  * variant→value maps the ES mock returns are fed straight into the
  * client-side assembly (postProcess ≡ _process_es_result), pinning the
  * greedy exact-then-fuzzy assignment, last-wins variant mapping, and
  * per-entity span consumption on the reference's own examples. The
  * reference test passes 'Mmsbai' unlowered to the substring helper; the
  * pipeline lowercases first, so the lowered twin is asserted here.
  */
class TextDetectionSpec extends AnyFunSuite {

  private def hits1 = Seq(
    VariantHit("restaurant", "Domino's Pizza", "Domino", 4.0),
    VariantHit("restaurant", "Domino's Pizza", "Dominos", 3.0),
    VariantHit("restaurant", "TMOS", "TMOS", 2.0),
    VariantHit("restaurant", "G  Pulla Reddy Sweets", "G.", 1.0),
    VariantHit("city", "Wani", "Wani", 4.0),
    VariantHit("city", "mumbai", "mumbai", 3.0),
    VariantHit("city", "Mumbai", "Mumbai", 2.0),
    VariantHit("city", "goa", "goa", 1.0))

  test("detect single message: fuzzy variant and last-wins value") {
    val msg = "i want to go to mumbai to order dominoes"
    val r = TextSurface.postProcess(hits1, msg, Seq("city", "restaurant"),
      "en", 4, 7, 4)
    // duplicate variant 'mumbai' takes the LAST value ('Mumbai', dict
    // re-assignment, text_detection.py:291-296)
    assert(r("city") == Seq(Detection("city", "Mumbai", "mumbai", "message", "en")))
    // 'dominoes' is 1 edit from variant 'dominos' (len 7 → 2 edits allowed)
    assert(r("restaurant") ==
      Seq(Detection("restaurant", "Domino's Pizza", "dominoes", "message", "en")))
  }

  test("detect bulk second message: both entities consume the same span") {
    val hits2 = Seq(
      VariantHit("restaurant", "TMOS", "TMOS", 3.0),
      VariantHit("restaurant", "Deli", "Deli", 2.0),
      VariantHit("restaurant", "G  Pulla Reddy Sweets", "G.", 1.0),
      VariantHit("city", "New Delhi", "Delhi", 3.0),
      VariantHit("city", "Wani", "Wani", 2.0),
      VariantHit("city", "goa", "goa", 1.0))
    val msg = "i want to go to delhi"
    val r = TextSurface.postProcess(hits2, msg, Seq("city", "restaurant"),
      "en", 4, 7, 4)
    assert(r("city") == Seq(Detection("city", "New Delhi", "delhi", "message", "en")))
    // consumption is per-entity: restaurant 'deli' still fuzzy-matches
    // the same 'delhi' span (len 4 → 1 edit allowed)
    assert(r("restaurant") == Seq(Detection("restaurant", "Deli", "delhi", "message", "en")))
  }

  test("entity substring with fuzziness 2,4") {
    assert(Alignment.entitySubstring("mmsbai", "mumbai", 2, 4, 4)
      .contains("mmsbai"))
  }

  test("combine envelope: datastore hits are datastore_verified only") {
    val ds = Seq(Detection("city", "Mumbai", "mumbai", "message", "en"))
    val out = TextSurface.combineResults(ds, Seq.empty, "city")
    assert(out.map(v => (v.value, v.datastoreVerified, v.modelVerified)) ==
      Seq(("Mumbai", true, false)))
  }

  test("combine: exact predetected match upgrades to model_verified") {
    // reference combine_results (text_detection.py:537-546): a predetected
    // value equal (lowercased) to a datastore original marks THAT entry
    // model_verified — no extra entry appended
    val ds = Seq(Detection("city", "Mumbai", "mumbai", "message", "en"))
    val out = TextSurface.combineResults(ds, Seq("Mumbai"), "city")
    assert(out == Seq(TextSurface.VerifiedDetection("city", "Mumbai",
      "mumbai", "message", "en", datastoreVerified = true,
      modelVerified = true)))
  }

  test("combine: survivors take the caller's detection method") {
    // the reference stamps ONE method across the combined list
    // (text_detection.py:653-668) — a model-only survivor under the
    // structured path reads structure_value_verified, as in the
    // utils.py:131-158 docstring example
    val out = TextSurface.combineResults(Seq.empty, Seq("Mumbai"), "city",
      "en", Priority.FromStructureValueVerified)
    assert(out == Seq(TextSurface.VerifiedDetection("city", "Mumbai",
      "Mumbai", "structure_value_verified", "en",
      datastoreVerified = false, modelVerified = true)))
  }

  test("fallback outputs: value passes through unverified; null is empty") {
    // mirror of test_get_output_for_fallback_entities (test_utils.py:20-33)
    val out = TextSurface.fallbackOutputs(Seq(
      "city" -> TextSurface.EntitySpec(fallbackValue = Some("Mumbai"),
        ignoreMessage = true),
      "restaurant" -> TextSurface.EntitySpec(ignoreMessage = true)))
    assert(out("city") == Seq(TextSurface.VerifiedDetection("city", "Mumbai",
      "Mumbai", "fallback_value", "en", datastoreVerified = false,
      modelVerified = false)))
    assert(out("restaurant").isEmpty)
  }

  test("request validation mirrors validate_text_request") {
    // test_validate_text_request_exceptions (test_utils.py:42-59)
    val spark = null: org.apache.spark.sql.SparkSession // validation fires first
    val spec = Seq("city" -> TextSurface.EntitySpec())
    intercept[IllegalArgumentException] {
      TextSurface.detectRequest(spark, "/tmp/none", Seq.empty, spec)
    }
    intercept[IllegalArgumentException] {
      TextSurface.detectRequest(spark, "/tmp/none", Seq("something"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextSurface.detectRequest(spark, "/tmp/none",
        Seq.fill(TextSurface.MaxBulkMessages + 1)("m"), spec)
    }
    intercept[IllegalArgumentException] {
      TextSurface.detectRequest(spark, "/tmp/none", Seq("m"),
        (1 to TextSurface.MaxEntities + 1).map(i => s"e$i" -> TextSurface.EntitySpec()))
    }
  }
}
