package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.search._

/** Percolation — the MemoryIndex use case (`lucene/memory/.../MemoryIndex
  * .java:76-101`: "a pure main memory index … for prospective search":
  * index ONE document, run many stored queries against it). Spark shape:
  * the (small by definition) registered query set broadcasts with the
  * UDF closure; each document builds its per-doc term→positions map once
  * (the MemoryIndex) and evaluates every query against it — one
  * distributed pass over the stream, no shuffle at all, output =
  * (doc, query) match pairs.
  *
  * Supported query shapes mirror what the per-doc index answers without
  * corpus stats: Term, Prefix, Wildcard, exact/sloppy ordered Phrase
  * (leapfrog over the positions map), and Bool (must/should/mustNot/
  * minShouldMatch) over those.
  */
object Percolator {

  final case class PQuery(id: Long, q: Query)

  /** (doc_id, query_id) pairs, one row per matching stored query. */
  def percolate(docs: DataFrame, contentCol: String, idCol: String,
      queries: Seq[PQuery], tokenizer: String = "simple"): DataFrame = {
    queries.foreach(pq => validate(pq.q))
    val tok = graft.index.IndexBuilder.tokenizerFn(tokenizer)
    // compile each registered query ONCE (wildcards build their regex
    // here, not once per document inside the match loop); the compiled
    // closures ride the UDF closure to every task
    val compiled = queries.map(pq => pq.id -> compileQ(pq.q))
    val matchUdf = udf { (content: String) =>
      val toks = tok(if (content == null) "" else content)
      val mem = buildMem(toks)
      compiled.collect { case (id, m) if m(mem) => id }
    }
    docs.select(col(idCol).as("doc_id"),
        explode(matchUdf(col(contentCol))).as("query_id"))
  }

  /** The per-doc "MemoryIndex": term → ascending positions. */
  private[graft] def buildMem(toks: Array[String]): Map[String, Array[Int]] = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuilder.ofInt]()
    var i = 0
    while (i < toks.length) {
      var b = m.get(toks(i))
      if (b == null) { b = new scala.collection.mutable.ArrayBuilder.ofInt(); m.put(toks(i), b) }
      b += i
      i += 1
    }
    val out = Map.newBuilder[String, Array[Int]]
    m.forEach((k, v) => out += k -> v.result())
    out.result()
  }

  private def validate(q: Query): Unit = q match {
    case TermQ(_) | PrefixQ(_) | WildcardQ(_) =>
    case PhraseQ(_, _) =>
    case BoolQ(m, s, n, f, _) => (m ++ s ++ n ++ f).foreach(validate)
    case other => throw new IllegalArgumentException(
      s"percolator supports term/prefix/wildcard/phrase/bool queries: $other")
  }

  /** One-time query compilation: per-query constants (wildcard regexes,
    * bool sub-matchers, the msm threshold) are built here, and the
    * returned closure evaluates one doc's MemoryIndex.
    */
  private[graft] def compileQ(q: Query): Map[String, Array[Int]] => Boolean =
    q match {
      case TermQ(t) => mem => mem.contains(t)
      case PrefixQ(p) => mem => mem.keysIterator.exists(_.startsWith(p))
      case WildcardQ(w) =>
        val re = ("^(?:" + w.flatMap {
          case '*' => "[a-z0-9]*"
          case '?' => "[a-z0-9]"
          case c if "\\.[]{}()<>+-=!$^|".indexOf(c) >= 0 => "\\" + c
          case c => c.toString
        } + ")$").r
        mem => mem.keysIterator.exists(t => re.findFirstIn(t).isDefined)
      case PhraseQ(terms, slop) => mem => {
        val lists = terms.map(mem.getOrElse(_, null))
        if (lists.exists(_ eq null)) false
        else if (slop == 0) exactPhrase(lists)
        else sloppyOrdered(lists, slop)
      }
      case BoolQ(must, should, mustNot, filter, msm) =>
        val cReq = (must ++ filter).map(compileQ)
        val cNot = mustNot.map(compileQ)
        val cShould = should.map(compileQ)
        val needed =
          if (should.isEmpty) 0
          else if (msm > 0) msm
          else if (must.isEmpty && filter.isEmpty) 1
          else 0
        mem => cReq.forall(_(mem)) && !cNot.exists(_(mem)) &&
          cShould.count(_(mem)) >= needed
      case other => throw new IllegalArgumentException(other.toString)
    }

  private[graft] def matches(mem: Map[String, Array[Int]], q: Query): Boolean =
    compileQ(q)(mem)

  /** Adjacent run: position p in list0 with p+i in each list i. */
  private def exactPhrase(lists: Seq[Array[Int]]): Boolean =
    lists.head.exists(p =>
      lists.zipWithIndex.tail.forall { case (l, i) =>
        java.util.Arrays.binarySearch(l, p + i) >= 0
      })

  /** Ordered sloppy match: chain-of-minimums walk, total gap ≤ slop. */
  private def sloppyOrdered(lists: Seq[Array[Int]], slop: Int): Boolean =
    lists.head.exists { p0 =>
      var prev = p0
      var gaps = 0
      var ok = true
      lists.tail.foreach { l =>
        if (ok) {
          val idx = {
            val i = java.util.Arrays.binarySearch(l, prev + 1)
            if (i >= 0) i else -i - 1
          }
          if (idx >= l.length) ok = false
          else { gaps += l(idx) - prev - 1; prev = l(idx) }
        }
      }
      ok && gaps <= slop
    }
}
