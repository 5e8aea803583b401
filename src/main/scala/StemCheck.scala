object StemCheck {
  def main(args: Array[String]): Unit = {
    val vectors = Seq(
      "caresses"->"caress", "ponies"->"poni", "ties"->"ti", "caress"->"caress",
      "cats"->"cat", "feed"->"feed", "agreed"->"agre", "plastered"->"plaster",
      "bled"->"bled", "motoring"->"motor", "sing"->"sing", "conflated"->"conflat",
      "troubled"->"troubl", "sized"->"size", "hopping"->"hop", "tanned"->"tan",
      "falling"->"fall", "hissing"->"hiss", "fizzed"->"fizz", "failing"->"fail",
      "filing"->"file", "happy"->"happi", "sky"->"sky",
      "relational"->"relat", "conditional"->"condit", "rational"->"ration",
      "valenci"->"valenc", "hesitanci"->"hesit", "digitizer"->"digit",
      "operator"->"oper", "feudalism"->"feudal", "decisiveness"->"decis",
      "hopefulness"->"hope", "callousness"->"callous", "formaliti"->"formal",
      "sensitiviti"->"sensit", "sensibiliti"->"sensibl",
      "triplicate"->"triplic", "formative"->"form", "formalize"->"formal",
      "electriciti"->"electr", "electrical"->"electr", "hopeful"->"hope",
      "goodness"->"good", "revival"->"reviv", "allowance"->"allow",
      "inference"->"infer", "airliner"->"airlin", "gyroscopic"->"gyroscop",
      "adjustable"->"adjust", "defensible"->"defens", "irritant"->"irrit",
      "replacement"->"replac", "adjustment"->"adjust", "dependent"->"depend",
      "adoption"->"adopt", "communism"->"commun", "activate"->"activ",
      "effective"->"effect", "bowdlerize"->"bowdler",
      "probate"->"probat", "rate"->"rate", "cease"->"ceas",
      "controlling"->"control", "rolling"->"roll",
      "joins"->"join", "joining"->"join", "joined"->"join",
      "crawling"->"crawl", "crawler"->"crawler", "indexes"->"index",
      "queries"->"queri", "searching"->"search")
    var bad = 0
    vectors.foreach { case (in, want) =>
      val got = graft.search.PorterStemmer.stem(in)
      if (got != want) { println(s"MISMATCH $in: got=$got want=$want"); bad += 1 }
    }
    println(s"STEMCHECK ${vectors.size - bad}/${vectors.size} ok")
  }
}
