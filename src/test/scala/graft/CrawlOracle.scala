package graft

import scala.collection.mutable
import graft.corpus.SyntheticWeb
import graft.urlnorm.UrlCanon

/**
 * Sequential reference implementation of the crawl spec — a direct
 * reimplementation of the v1 master's FIFO queue + seen-set semantics
 * (`archive/master_node.py:16,39-54,73-78`) extended with the wave/
 * politeness budget (`crawler/crawler_node.py:297`,
 * `archive/crawler_node.py:29-34`) and robots rules, used as the test
 * oracle for the Spark pipeline (SURVEY.md §5 item a/b).
 */
object CrawlOracle {

  case class Entry(url: String, host: String, depth: Int, seq: Long, parent: String, wave: Int)
  case class Fetch(url: String, wave: Int, status: Int, success: Boolean)
  case class Result(frontier: Map[String, Entry], fetches: Map[String, Fetch], waves: Int)

  def run(web: SyntheticWeb.Web, waveSeconds: Double, defaultDelay: Double,
          maxWaves: Int): Result = {
    val pagesByUrl = web.pages.map(p => p.url -> p).toMap
    val robotsByHost = web.robots.map(r => r.host -> r).toMap

    val frontier = mutable.LinkedHashMap[String, Entry]()
    var nextSeq = 1L
    web.seeds.map(UrlCanon.canonicalize).filter(UrlCanon.isHttpUrl).foreach { u =>
      if (!frontier.contains(u)) {
        frontier(u) = Entry(u, UrlCanon.host(u), 0, nextSeq, "", 0)
        nextSeq += 1
      }
    }
    val fetched = mutable.Map[String, Fetch]()

    var wave = 1
    var done = false
    while (!done && wave <= maxWaves) {
      val pending = frontier.values.filterNot(e => fetched.contains(e.url)).toVector
        .sortBy(e => (e.depth, e.seq))
      if (pending.isEmpty) done = true
      else {
        val (denied, allowed) = pending.partition { e =>
          // ordered first-match-wins (RobotFileParser; Allow lines exact)
          // — identical to the prefix form on pure-Disallow rule sets
          robotsByHost.get(e.host).exists(r =>
            r.effectiveRules
              .find(l => l.path.isEmpty || UrlCanon.pathOf(e.url).startsWith(l.path))
              .exists(!_.allow))
        }
        denied.foreach(e => fetched(e.url) = Fetch(e.url, wave, -1, success = false))

        val selected = allowed.groupBy(_.host).toVector.flatMap { case (h, es) =>
          // v1 conservative stance: a failed robots FETCH throttles the
          // host via the 3 s the rule row itself carries
          // (`archive/crawler_node.py:68-75`) — same single source of
          // truth as the pipeline's budget expression
          val delay = robotsByHost.get(h)
            .map(_.crawlDelay)
            .getOrElse(defaultDelay)
          val budget = math.max(1L, math.floor(waveSeconds / delay).toLong)
          es.sortBy(e => (e.depth, e.seq)).take(budget.toInt)
        }.sortBy(e => (e.depth, e.seq))

        if (selected.isEmpty && denied.isEmpty) done = true
        else {
          val discovered = mutable.LinkedHashMap[String, (Int, String)]()
          selected.foreach { e =>
            pagesByUrl.get(e.url) match {
              case None =>
                fetched(e.url) = Fetch(e.url, wave, 404, success = false)
              case Some(p) if p.httpStatus != 200 =>
                fetched(e.url) = Fetch(e.url, wave, p.httpStatus, success = false)
              case Some(p) =>
                fetched(e.url) = Fetch(e.url, wave, 200, success = true)
                p.outLinks.foreach { href =>
                  val r = UrlCanon.resolve(e.url, href)
                  if (r != null && UrlCanon.isHttpUrl(r)) {
                    val c = UrlCanon.canonicalize(r)
                    if (!frontier.contains(c) && !discovered.contains(c))
                      discovered(c) = (e.depth + 1, e.url)
                  }
                }
            }
          }
          discovered.foreach { case (u, (d, parent)) =>
            frontier(u) = Entry(u, UrlCanon.host(u), d, nextSeq, parent, wave)
            nextSeq += 1
          }
          wave += 1
        }
      }
    }
    Result(frontier.toMap, fetched.toMap, wave - 1)
  }

  /** Pure v1 FIFO/BFS oracle (no waves, no politeness): queue drained in
    * enqueue order — `archive/master_node.py:46-54`. Returns urls in
    * discovery (= seq) order. */
  def fifoOrder(web: SyntheticWeb.Web): Vector[String] = {
    val pagesByUrl = web.pages.map(p => p.url -> p).toMap
    val queue = mutable.Queue[String]()
    val seen = mutable.LinkedHashSet[String]()
    web.seeds.map(UrlCanon.canonicalize).filter(UrlCanon.isHttpUrl).foreach { u =>
      if (seen.add(u)) queue.enqueue(u)
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      pagesByUrl.get(u).filter(_.httpStatus == 200).foreach { p =>
        p.outLinks.foreach { href =>
          val r = UrlCanon.resolve(u, href)
          if (r != null && UrlCanon.isHttpUrl(r)) {
            val c = UrlCanon.canonicalize(r)
            if (seen.add(c)) queue.enqueue(c)
          }
        }
      }
    }
    seen.toVector
  }
}
