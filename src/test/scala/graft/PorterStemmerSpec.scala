package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.search.PorterStemmer

/** Porter stemmer vs the published example outputs of the algorithm
  * (M.F. Porter 1980, the step-rule examples), plus crawl-domain words
  * the search-parity tests depend on. */
class PorterStemmerSpec extends AnyFunSuite {

  /** Deterministic ScalaCheck sampling (no scalatestplus bridge in the
    * offline cache — we drive Gen directly, as UrlCanonSpec does). */
  private def forAll[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val vectors = Seq(
    // step 1a/1b examples from the paper
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti", "caress" -> "caress",
    "cats" -> "cat", "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
    "troubled" -> "troubl", "sized" -> "size", "hopping" -> "hop", "tanned" -> "tan",
    "falling" -> "fall", "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "operator" -> "oper", "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "communism" -> "commun", "activate" -> "activ", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controlling" -> "control", "rolling" -> "roll",
    // crawl/search domain words (the parity tests rely on these)
    "joins" -> "join", "joining" -> "join", "joined" -> "join",
    "crawling" -> "crawl", "crawler" -> "crawler", "indexes" -> "index",
    "queries" -> "queri", "searching" -> "search")

  test("published Porter example vectors") {
    val bad = vectors.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in: got=${PorterStemmer.stem(in)} want=$want"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("stemming is idempotent over the fixed corpus vocabulary") {
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line", "merge",
      "order", "part", "query", "row", "scan", "slow", "small", "sort", "spark",
      "stream", "table", "the", "value", "vector", "window")
    vocab.foreach { w =>
      val s1 = PorterStemmer.stem(w)
      assert(PorterStemmer.stem(s1) == s1, s"stem not idempotent for $w -> $s1")
    }
  }

  test("never throws and never lengthens (property)") {
    forAll(Gen.listOf(Gen.alphaLowerChar).map(_.mkString)) { w =>
      val out = PorterStemmer.stem(w)
      assert(out != null && out.length <= math.max(w.length, 2))
    }
  }
}
