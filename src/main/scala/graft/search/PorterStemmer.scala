package graft.search

/**
 * Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
 * stripping", Program 14(3) 1980) — the classic 5-step rule cascade,
 * implemented from the published algorithm description. This matches
 * the analyzer the reference indexes and searches through (Whoosh
 * `StemmingAnalyzer`, `indexer/indexer_node.py:63-67`): without it,
 * search("joins") misses documents containing "join".
 *
 * Pure function of the token; used both at posting-build time and at
 * query-parse time so the two sides agree.
 */
object PorterStemmer {

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    var b = word.toCharArray
    var k = b.length - 1

    def isCons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !isCons(i - 1)
      case _ => true
    }

    /** m() = number of VC sequences in b[0..j]. */
    def m(j: Int): Int = {
      var n = 0
      var i = 0
      var break = false
      while (!break) { if (i > j) return n; if (!isCons(i)) break = true else i += 1 }
      i += 1
      while (true) {
        var br = false
        while (!br) { if (i > j) return n; if (isCons(i)) br = true else i += 1 }
        i += 1; n += 1
        br = false
        while (!br) { if (i > j) return n; if (!isCons(i)) br = true else i += 1 }
        i += 1
      }
      n
    }

    def vowelInStem(j: Int): Boolean = (0 to j).exists(!isCons(_))
    def doubleCons(j: Int): Boolean = j >= 1 && b(j) == b(j - 1) && isCons(j)
    /** consonant-vowel-consonant ending where final cons != w,x,y. */
    def cvc(i: Int): Boolean =
      i >= 2 && isCons(i) && !isCons(i - 1) && isCons(i - 2) &&
        b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

    def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) { if (b(k - l + 1 + i) != s.charAt(i)) return false; i += 1 }
      true
    }
    /** stem length (index of last char) if `s` were removed. */
    def stemEnd(s: String): Int = k - s.length
    def setTo(s: String, from: String): Unit = {
      val j = stemEnd(from)
      val nb = new Array[Char](j + 1 + s.length)
      Array.copy(b, 0, nb, 0, j + 1)
      s.getChars(0, s.length, nb, j + 1)
      b = nb
      k = nb.length - 1
    }
    def r(s: String, from: String): Unit = if (m(stemEnd(from)) > 0) setTo(s, from)

    // Step 1a: plurals
    if (ends("sses")) setTo("ss", "sses")
    else if (ends("ies")) setTo("i", "ies")
    else if (ends("ss")) ()
    else if (ends("s")) setTo("", "s")

    // Step 1b: -ed / -ing
    if (ends("eed")) { if (m(stemEnd("eed")) > 0) setTo("ee", "eed") }
    else {
      val hadEd = ends("ed") && vowelInStem(stemEnd("ed"))
      val hadIng = !hadEd && ends("ing") && vowelInStem(stemEnd("ing"))
      if (hadEd || hadIng) {
        setTo("", if (hadEd) "ed" else "ing")
        if (ends("at")) setTo("ate", "at")
        else if (ends("bl")) setTo("ble", "bl")
        else if (ends("iz")) setTo("ize", "iz")
        else if (doubleCons(k)) { if (!"lsz".contains(b(k))) { b = b.dropRight(1); k -= 1 } }
        else if (m(k) == 1 && cvc(k)) setTo("e", "")
      }
    }

    // Step 1c: y -> i when stem has a vowel
    if (ends("y") && vowelInStem(stemEnd("y"))) b(k) = 'i'

    // Step 2 (m > 0 suffix mappings)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.find(p => ends(p._1)).foreach { case (suf, rep) => r(rep, suf) }

    // Step 3
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find(p => ends(p._1)).foreach { case (suf, rep) => r(rep, suf) }

    // Step 4 (m > 1 suffix removal)
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find(ends).foreach { suf =>
      val j = stemEnd(suf)
      val ok = if (suf == "ion") j >= 0 && (b(j) == 's' || b(j) == 't') else true
      if (ok && m(j) > 1) setTo("", suf)
    }

    // Step 5a: remove final e
    if (ends("e")) {
      val a = m(k - 1)
      if (a > 1 || (a == 1 && !cvc(k - 1))) { b = b.dropRight(1); k -= 1 }
    }
    // Step 5b: ll -> l when m > 1
    if (k >= 1 && b(k) == 'l' && doubleCons(k) && m(k) > 1) { b = b.dropRight(1); k -= 1 }

    new String(b, 0, k + 1)
  }
}
