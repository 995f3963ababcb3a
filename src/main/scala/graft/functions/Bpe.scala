package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level byte-pair-encoding tokenizer (VERDICT r11 Next #4): the
  * published GPT-2 algorithm (Radford et al. 2019's public encoder:
  * bytes→printable-unicode symbol table, regex pre-tokenization, greedy
  * lowest-rank pair merging) over a VENDORED merges table.
  *
  * Why a real subword rung: every whitespace token count (q_token_stats,
  * q_pack_sequences, the payoff readouts) misstates a real training-token
  * budget — BPE emits more units than words (measured 1.46–2.58× per doc
  * on this corpus) and is what production pipelines budget in.
  *
  * The merges table (src/main/resources/graft/bpe_merges.txt) is TRAINED
  * offline by tools/train_bpe.py — the real 50k GPT-2 merges file is not
  * redistributable into this offline build — on the sf0.01 documents
  * corpus with deterministic tie-breaks (Sennrich et al. 2016 counting),
  * capped at 80 merges, deliberately below the tiny synthetic
  * vocabulary's saturation point so both the merged-word fast path and
  * the out-of-vocab subword split path stay exercised. The table is
  * PLUGGABLE: production swaps the resource for its own merges file; the
  * algorithm is merges-file-agnostic (BpeSpec's goldens came from an
  * independent Python implementation of the same published algorithm —
  * the CanonicalSpec-vs-CPython pattern).
  *
  * Scale shape: pure per-row CPU, no state beyond the JVM-static ranks
  * map (loaded once per executor from the classpath) and a bounded
  * pre-token result cache (natural text is Zipfian, so the cache turns
  * the common-word path into a hash lookup; it clears itself at 128k
  * entries rather than growing with corpus size). No shuffle, no
  * broadcast — the 100 TB cost is exactly linear scan CPU. */
object Bpe {

  /** The public GPT-2 byte→unicode table: printable bytes map to
    * themselves, the rest to 256+n, so merges files stay readable text
    * and every byte sequence round-trips. */
  private val byteToChar: Array[Char] = {
    val self = (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)).toSet
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (self(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  private lazy val charToByte: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte]()
    var b = 0
    while (b < 256) { m.put(byteToChar(b), b.toByte); b += 1 }
    m
  }

  /** Inverse of [[tokens]]: symbols → bytes → text. Tokenization is
    * lossless by construction (merges only concatenate symbols); the
    * round-trip property in BpeSpec pins it. */
  def detokenize(toks: Iterable[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    for (t <- toks; c <- t) {
      val b = charToByte.get(c)
      require(b != null, s"not a BPE symbol char: U+${c.toInt.toHexString}")
      bos.write(b.toInt)
    }
    new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** GPT-2's published pre-tokenizer. UNICODE_CHARACTER_CLASS so \s
    * matches unicode whitespace like Python's regex module does. */
  private val pretok = Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    Pattern.UNICODE_CHARACTER_CLASS)

  /** The vendored default merges table — `source = ""`. A non-empty
    * source is a FILESYSTEM path to a merges file (the format `Cli
    * train-bpe` writes), opened through the Hadoop FileSystem API so a
    * cluster path (HDFS/S3) resolves on executors exactly like the
    * ingest readers' executor-opened files. This closes the r17 seam:
    * a table trained by [[trainMerges]] at runtime is consumable by
    * `bpe_tokens(text, path)` without rebuilding the jar — the
    * `1__1__5.zip` vendoring pattern (vendored default, pluggable
    * override). */
  val DefaultSource: String = ""

  /** rank of each mergeable symbol pair, keyed "a b" (the merges-file
    * line format itself — zero-allocation lookups would key differently,
    * but the pair strings here are tiny and interned by the cache).
    * One table per merges SOURCE, loaded once per executor JVM and
    * cached by path (the Zipf-cache discipline applied to the model
    * artifact: a stream of rows tokenizing against the same trained
    * file parses it exactly once). */
  private val ranksBySource =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashMap[String, Integer]]()

  private def ranksFor(source: String): java.util.HashMap[String, Integer] =
    ranksBySource.computeIfAbsent(source, loadRanks(_))

  private def loadRanks(source: String): java.util.HashMap[String, Integer] = {
    val in: java.io.InputStream =
      if (source.isEmpty) {
        val s = getClass.getResourceAsStream("/graft/bpe_merges.txt")
        require(s != null, "bpe_merges.txt missing from classpath")
        s
      } else {
        val p = new org.apache.hadoop.fs.Path(source)
        p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
      }
    val m = new java.util.HashMap[String, Integer]()
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      var i = 0
      for (line <- src.getLines() if !line.startsWith("#") && line.nonEmpty) {
        m.put(line, i); i += 1
      }
    } finally in.close()
    require(!m.isEmpty,
      s"merges source '$source' holds no merge lines — not a BPE merges file")
    m
  }

  /** Zipf cache: pre-token string → its merged symbols, one cache per
    * merges source (entries from different tables must never collide).
    * Bounded so a high-cardinality corpus (ids, numbers) can't grow it
    * with data volume; clearing beats LRU bookkeeping at this entry
    * cost. */
  private val cacheBySource =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentHashMap[String, Array[String]]]()
  private val CacheCap = 128 * 1024

  private def bpeWord(
      sym0: Array[String],
      ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var w = sym0
    var done = false
    while (!done && w.length > 1) {
      // lowest-rank adjacent pair VALUE present in this word
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < w.length - 1) {
        val r = ranks.get(w(i) + " " + w(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val first = w(bestIdx); val second = w(bestIdx + 1)
        val merged = first + second
        val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
        var j = 0
        while (j < w.length) {
          if (j < w.length - 1 && w(j) == first && w(j + 1) == second) {
            out += merged; j += 2
          } else { out += w(j); j += 1 }
        }
        w = out.toArray
      }
    }
    w
  }

  /** Tokenize to the merge-unit strings (unicode-mapped symbols — what a
    * merges-file row contains; counting them IS the token budget),
    * against the vendored default table or a runtime-loaded one. */
  def tokens(text: String, source: String = DefaultSource): Array[String] = {
    val ranks = ranksFor(source)
    val cache = cacheBySource.computeIfAbsent(source,
      _ => new java.util.concurrent.ConcurrentHashMap[String, Array[String]]())
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val m = pretok.matcher(text)
    while (m.find()) {
      val piece = m.group()
      var toks = cache.get(piece)
      if (toks == null) {
        val bytes = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val syms = new Array[String](bytes.length)
        var i = 0
        while (i < bytes.length) {
          syms(i) = String.valueOf(byteToChar(bytes(i) & 0xFF)); i += 1
        }
        toks = bpeWord(syms, ranks)
        if (cache.size() >= CacheCap) cache.clear()
        cache.put(piece, toks)
      }
      out ++= toks
    }
    out.toArray
  }

  /** The raw pre-token pieces of a text (the GPT-2 regex, no merging) —
    * the training-side counterpart of [[tokens]]'s first stage. */
  private[graft] def pretokenize(text: String): Seq[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val m = pretok.matcher(text)
    while (m.find()) out += m.group()
    out.toSeq
  }

  /** BPE merge TRAINING as the engine's own operation — closing the
    * "trained offline by a python tool" seam: the Sennrich et al. 2016
    * counting loop over the GPT-2 byte-level symbol space, spelled the
    * way every production BPE trainer is: the DISTRIBUTED part is one
    * corpus scan collapsing to the pre-token VOCABULARY with counts (a
    * map-side-combined aggregation — vocabulary-bounded output no matter
    * the corpus size), and the merge loop then runs DRIVER-side over
    * that bounded frequency table (each iteration touches words, never
    * the corpus). Deterministic: exact integer counts, tie-break = max
    * count then lexicographic min pair — the same tie-break as
    * tools/train_bpe.py, and BpeSpec pins that this trainer reproduces
    * the vendored python-trained merges file BYTE-FOR-BYTE on the same
    * corpus (the CPython-golden discipline applied to training, not
    * just encoding). `Cli train-bpe` writes the result in the merges
    * file format [[ranks]] loads, so a trained table is directly
    * pluggable. */
  private[graft] def trainMerges(
      docs: org.apache.spark.sql.DataFrame, nMerges: Int): Seq[(String, String)] = {
    val s = docs.sparkSession
    import s.implicits._
    val vocab: Array[(String, Long)] = docs
      .select(org.apache.spark.sql.functions.col("text")).as[String]
      .flatMap(t => pretokenize(if (t == null) "" else t))
      .groupByKey(identity).count().collect()
    var words: Map[Vector[String], Long] = vocab.map { case (piece, f) =>
      val bytes = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (bytes.map(b => String.valueOf(byteToChar(b & 0xFF))).toVector, f)
    }.toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var dry = false
    while (i < nMerges && !dry) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (w, f) =>
        var j = 0
        while (j < w.length - 1) {
          val p = (w(j), w(j + 1))
          pairs(p) = pairs.getOrElse(p, 0L) + f
          j += 1
        }
      }
      if (pairs.isEmpty) dry = true
      else {
        val top = pairs.values.max
        // iterator, NOT Map.collect: collecting tuples out of a Map
        // rebuilds a MAP, silently deduplicating tied pairs that share
        // a first element (("o","lumn") vanished behind ("o","mer")
        // and the lexicographic tie-break picked the wrong merge)
        val best = pairs.iterator
          .collect { case (p, c) if c == top => p }.min
        merges += best
        val mergedSym = best._1 + best._2
        val nw = scala.collection.mutable.HashMap.empty[Vector[String], Long]
        words.foreach { case (w, f) =>
          val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
          var j = 0
          while (j < w.length) {
            if (j < w.length - 1 && w(j) == best._1 && w(j + 1) == best._2) {
              out += mergedSym; j += 2
            } else { out += w(j); j += 1 }
          }
          val v = out.toVector
          nw(v) = nw.getOrElse(v, 0L) + f
        }
        words = nw.toMap
        i += 1
      }
    }
    merges.toSeq
  }
}

/** `bpe_tokens(text[, mergesPath])` → `array<string>` of byte-level BPE
  * merge units — (b)-tier custom operator (SURVEY §7.3): the generated
  * code is one static call, so the expression stays inside the
  * whole-stage-codegen span instead of forcing a UDF evaluation
  * boundary. NULL in → NULL out; empty string → empty array (the
  * pre-tokenizer finds no pieces). `source` is a STATIC query-time
  * parameter (a foldable string at registration), not a per-row child:
  * the merges table is a model artifact, one per plan, carried into the
  * generated code as a reference object so paths with any characters
  * survive codegen. Empty source = the vendored classpath default. */
case class BpeTokens(child: Expression, source: String = Bpe.DefaultSource)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(input: Any): Any =
    BpeFns.compute(input.asInstanceOf[UTF8String], source)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val srcRef = ctx.addReferenceObj("mergesSource", source, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeFns.compute($c, $srcRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** Static target for both evaluation paths (Scala object methods get
  * static forwarders, so generated Java calls this directly). */
object BpeFns {
  def compute(s: UTF8String, source: String): ArrayData = {
    val toks = Bpe.tokens(s.toString, source)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}
