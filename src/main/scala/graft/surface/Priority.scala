package graft.surface

/** R4 — detection-source priority resolution (reference
  * ner_v2/detectors/base_detector.py:74-159 + constants ner_constants.py:1-14):
  * structured_value wins over message wins over fallback_value;
  * a structured value that fails detection passes through UNVERIFIED
  * (value = None, original = the raw structured string).
  *
  * Detector-agnostic: plug any `text => Seq[(value, original)]` function.
  */
object Priority {

  // reference detection-method constants
  val FromStructureValueVerified = "structure_value_verified"
  val FromStructureValueNotVerified = "structure_value_not_verified"
  val FromMessage = "message"
  val FromFallbackValue = "fallback_value"

  final case class Resolved[V](value: Option[V], originalText: String,
      detection: String, language: String)

  def resolve[V](
      detectFn: String => Seq[(V, String)],
      message: Option[String],
      structuredValue: Option[String] = None,
      fallbackValue: Option[V] = None,
      language: String = "en"): Seq[Resolved[V]] = {
    val text = structuredValue.orElse(message)
    val detected: Seq[(V, String)] = text.map(detectFn).getOrElse(Seq.empty)

    structuredValue match {
      case Some(sv) =>
        if (detected.nonEmpty)
          detected.map { case (v, o) =>
            Resolved(Some(v), o, FromStructureValueVerified, language) }
        else Seq(Resolved(None, sv, FromStructureValueNotVerified, language))
      case None =>
        if (detected.nonEmpty)
          detected.map { case (v, o) => Resolved(Some(v), o, FromMessage, language) }
        else fallbackValue match {
          case Some(fv) =>
            Seq(Resolved(Some(fv), fv.toString, FromFallbackValue, language))
          case None => Seq.empty
        }
    }
  }
}
