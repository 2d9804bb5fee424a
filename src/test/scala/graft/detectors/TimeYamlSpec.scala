package graft.detectors

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors ALL 62 en cases of the reference's own time test matrix
  * (ner_v2/tests/temporal/time/time_ner_tests.yaml) as executed goldens.
  * The reference runner compares (hh, mm, nn, tz, range, time_type) plus
  * the lowercased original and drops all-null outputs (→ expect empty);
  * order is compared as a set — mirrored here as sorted multisets.
  * Plain cases (range_enabled false, plus the range_enabled cases whose
  * outputs are plain df/ev rows) run through TimeDetector; range cases
  * (en_48-54) run through TimeRangeDetector, each range mapping to a
  * ('start') and ('end') row sharing the original, `normal` rows mapping
  * to a single range=None row. The deterministic reference clock is noon
  * (TimeDetector.DefaultReference), which fixes the within-12h meridiem
  * cases the same way the reference's datetime.now() did at golden time.
  */
class TimeYamlSpec extends AnyFunSuite {

  // (hh, mm, nn, tz, original)
  type Out = (Int, Int, String, String, String)
  private def times(msg: String): Seq[Out] =
    new TimeDetector().detect(msg).map(t => (t.hh, t.mm, t.nn, t.tz, t.original)).sorted
  private def t(hh: Int, mm: Int, nn: String, o: String,
      tz: String = "UTC"): Out = (hh, mm, nn, tz, o)

  test("reference time YAML: plain en cases") {
    val cases: Seq[(String, String, Seq[Out])] = Seq(
      ("en_1", "the time is 12:35 am est",
        Seq(t(12, 35, "am", "12:35 am est", "America/New_York"))),
      ("en_2", "meet me at 10:33 pm AKST at the cafe",
        Seq(t(10, 33, "pm", "10:33 pm akst", "America/Anchorage"))),
      ("en_3", "meet me at 02 33 p.m IST at the cafe",
        Seq(t(2, 33, "pm", "02 33 p.m ist", "Asia/Kolkata"))),
      ("en_4", "the lecture starts at 12 am", Seq(t(12, 0, "am", "12 am"))),
      ("en_5", "the lecture starts at 12-pm", Seq(t(12, 0, "pm", "12-pm"))),
      ("en_6", "the lecture ends at 1 am", Seq(t(1, 0, "am", "1 am"))),
      ("en_7", "the time is 16:62 am", Seq.empty),
      ("en_8", "meet me at 10:99 pm at the cafe", Seq.empty),
      ("en_9", "the lecture ends at 0 am", Seq.empty),
      ("en_10", "the lecture starts at 15 am", Seq.empty),
      ("en_11", "lets all meet in 15mins and decide what to eat",
        Seq(t(0, 15, "df", "in 15mins"))),
      ("en_12", "lets all meet about 25 minutes and decide what to eat",
        Seq(t(0, 25, "df", "about 25 minutes"))),
      ("en_13", "lets all meet after 5 hrs and decide what to eat",
        Seq(t(5, 0, "df", "after 5 hrs"))),
      ("en_14", "lets all meet in around 13 hours and decide what to eat",
        Seq(t(13, 0, "df", "in around 13 hours"))),
      ("en_15", "the train will depart 20 minutes later",
        Seq(t(0, 20, "df", "20 minutes later"))),
      ("en_16", "the train will depart 5mins latr",
        Seq(t(0, 5, "df", "5mins latr"))),
      ("en_17", "the train will depart 1 hour ltr",
        Seq(t(1, 0, "df", "1 hour ltr"))),
      ("en_18", "the train will depart 3 hrs later",
        Seq(t(3, 0, "df", "3 hrs later"))),
      ("en_19", "the earth finishes a rotation every 1440 minutes",
        Seq(t(0, 1440, "ev", "every 1440 minutes"))),
      ("en_20", "the earth finishes a rotation evry 24 hrs",
        Seq(t(24, 0, "ev", "evry 24 hrs"))),
      ("en_21", "you should reboot your computer once in 3 days",
        Seq(t(72, 0, "ev", "once in 3 days"))),
      ("en_22", "you are supposed to take your medication once in 1 day",
        Seq(t(24, 0, "ev", "once in 1 day"))),
      ("en_23", "the time is 00:35", Seq(t(0, 35, "hrs", "00:35"))),
      ("en_24", "meet me at 22:33 hours at the cafe",
        Seq(t(22, 33, "hrs", "22:33"))),
      ("en_25", "meet me at 14 33 at the cafe", Seq(t(14, 33, "hrs", "14 33"))),
      ("en_26", "the lecture starts at 12 hrs", Seq(t(12, 0, "hrs", "12 hrs"))),
      ("en_27", "the lecture starts at 0 hours", Seq(t(0, 0, "hrs", "0 hours"))),
      ("en_28", "the time is 16:62", Seq.empty),
      ("en_29", "meet me at 22:33 am at the cafe", Seq.empty),
      ("en_30", "meet me at 14 33 p.m. at the cafe", Seq.empty),
      ("en_31", "my flight is 12:30 early in the morning",
        Seq(t(12, 30, "am", "12:30"))),
      ("en_32", "my flight is 11:30 in the morning", Seq(t(11, 30, "am", "11:30"))),
      ("en_33", "my flight is 11:30 tonight", Seq(t(11, 30, "pm", "11:30"))),
      ("en_34", "my flight is 12:00 tonight", Seq(t(12, 0, "am", "12:00"))),
      ("en_35", "my flight is 5:29 this evening", Seq(t(5, 29, "pm", "5:29"))),
      ("en_36", "my flight departs at 3:11 post noon", Seq(t(3, 11, "pm", "3:11"))),
      ("en_37", "my flight departs exactly at 12:22 noon",
        Seq(t(12, 22, "pm", "12:22"))),
      ("en_38", "my flight departs at 3:33 tonight", Seq(t(3, 33, "am", "3:33"))),
      ("en_39", "my flight departs by 4:44 in the night",
        Seq(t(4, 44, "am", "4:44"))),
      ("en_40", "my flight departs before 5:55 tonight",
        Seq(t(5, 55, "pm", "5:55"))),
      ("en_41", "my flight departs at exact 6:00 tonight",
        Seq(t(6, 0, "pm", "6:00"))),
      ("en_42", "my flight departs at 3 post noon", Seq(t(3, 0, "pm", "at 3"))),
      ("en_43", "my flight departs exactly at 12 noon",
        Seq(t(12, 0, "pm", "at 12"))),
      ("en_44", "my flight departs after 3 tonight", Seq(t(3, 0, "am", "after 3"))),
      ("en_45", "my flight departs by 4 in the night", Seq(t(4, 0, "am", "by 4"))),
      ("en_46", "my flight departs before 5 tonight",
        Seq(t(5, 0, "pm", "before 5"))),
      ("en_47", "my flight departs at exact 6 tonight",
        Seq(t(6, 0, "pm", "exact 6"))),
      ("en_62", "your three digit code is 145 and 4 digit code is 1230. " +
        "Please enter this on the app. 12 is the two digit code", Seq.empty))
    for ((id, msg, expected) <- cases)
      assert(times(msg) == expected.sorted, id)
  }

  // (hh, mm, nn, range, original) — range = "start" | "end" | null
  type ROut = (Int, Int, String, String, String)
  private def ranges(msg: String): Seq[ROut] =
    new TimeRangeDetector().detect(msg).flatMap { r =>
      if (r.rangeType == "normal")
        r.start.map(s => (s.hh, s.mm, s.nn, "-", r.original)).toSeq
      else
        r.start.map(s => (s.hh, s.mm, s.nn, "start", r.original)).toSeq ++
          r.end.map(e => (e.hh, e.mm, e.nn, "end", r.original)).toSeq
    }.sorted
  private def rt(hh: Int, mm: Int, nn: String, range: String, o: String): ROut =
    (hh, mm, nn, range, o)

  test("reference time YAML: range_enabled en cases") {
    val cases: Seq[(String, String, Seq[ROut])] = Seq(
      ("en_48", "this show is from 12:30 am to 2:30 pm", Seq(
        rt(12, 30, "am", "start", "from 12:30 am to 2:30 pm"),
        rt(2, 30, "pm", "end", "from 12:30 am to 2:30 pm"))),
      ("en_49", "Sessions begin at noon", Seq(
        rt(11, 0, "am", "start", "noon"), rt(5, 0, "pm", "end", "noon"))),
      ("en_50", "Sessions begin at morning", Seq(
        rt(12, 0, "am", "start", "morning"), rt(11, 0, "am", "end", "morning"))),
      ("en_51", "Sessions begin at evening", Seq(
        rt(5, 0, "pm", "start", "evening"), rt(9, 0, "pm", "end", "evening"))),
      ("en_52", "Sessions begin at night", Seq(
        rt(9, 0, "pm", "start", "night"), rt(12, 0, "am", "end", "night"))),
      ("en_53", "Sessions begin at no particular preference", Seq(
        rt(12, 0, "am", "start", "no particular preference"),
        rt(11, 59, "pm", "end", "no particular preference"))),
      ("en_54", "10:00 to 14:00", Seq(
        rt(10, 0, "hrs", "start", "10:00 to 14:00"),
        rt(14, 0, "hrs", "end", "10:00 to 14:00"))),
      ("en_55", "check back in 5 mins", Seq(rt(0, 5, "df", "-", "in 5 mins"))),
      ("en_56", "check back in 5 hrs", Seq(rt(5, 0, "df", "-", "in 5 hrs"))),
      ("en_57", "try 4 minutes later", Seq(rt(0, 4, "df", "-", "4 minutes later"))),
      ("en_58", "try 10 hours later", Seq(rt(10, 0, "df", "-", "10 hours later"))),
      ("en_59", "repeat every 16 minutes", Seq(rt(0, 16, "ev", "-", "every 16 minutes"))),
      ("en_60", "repeat evry 21 hrs", Seq(rt(21, 0, "ev", "-", "evry 21 hrs"))),
      ("en_61", "set it for once in 3 days", Seq(rt(72, 0, "ev", "-", "once in 3 days"))))
    for ((id, msg, expected) <- cases)
      assert(ranges(msg) == expected.sorted, id)
  }
}
