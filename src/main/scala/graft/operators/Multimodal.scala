package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed
  * metadata, with partition-wise feature extraction behind a
  * pluggable codec boundary.
  *
  * The Spark-side shape is real — binary column, metadata struct,
  * mapPartitions batching (the one place a JNI codec or model batch
  * would sit), schema of the extracted features — and the RAW-format
  * paths (PCM audio framing, raw-byte features) are fully implemented
  * JVM-side. Only COMPRESSED-format decoding is a declared stub
  * ([[ChecksumCodec]] stands in where libjpeg/ffmpeg would be —
  * this container ships no media codecs): swap in a [[BlobCodec]]
  * that calls the real decoder; nothing else changes.
  */
object Multimodal {

  /** Decode boundary: turns one blob + its metadata into fixed-width
    * integer features. Implementations must be Serializable — they
    * ship to executors inside the mapPartitions closure. */
  trait BlobCodec extends Serializable {
    def name: String
    def featureNames: Seq[String]
    def features(bytes: Array[Byte], width: Int, height: Int): Array[Long]
  }

  /** STUB codec for compressed formats: deterministic fake features
    * (length + rolling checksum + claimed pixel count) where a real
    * pipeline would decode the payload. Clearly a stand-in — a real
    * image path implements BlobCodec over the actual decoder. */
  object ChecksumCodec extends BlobCodec {
    val name = "checksum-stub"
    val featureNames = Seq("byte_len", "checksum", "pixels")
    def features(bytes: Array[Byte], width: Int, height: Int): Array[Long] = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      Array(bytes.length.toLong, sum % 256, width.toLong * height)
    }
  }

  /** REAL raw-format codec: treats the payload as an 8-bit buffer and
    * extracts a 4-bin intensity histogram + mean — the whole decode
    * path is implemented (raw buffers need no external codec). */
  object RawGray8Codec extends BlobCodec {
    val name = "raw-gray8"
    val featureNames = Seq("bin0", "bin1", "bin2", "bin3", "mean_x100")
    def features(bytes: Array[Byte], width: Int, height: Int): Array[Long] = {
      val bins = new Array[Long](4)
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        val v = bytes(i) & 0xff
        bins(v / 64) += 1
        sum += v
        i += 1
      }
      val mean100 = if (bytes.isEmpty) 0L else sum * 100 / bytes.length
      Array(bins(0), bins(1), bins(2), bins(3), mean100)
    }
  }

  /** REAL container codec: parses RIFF/WAVE (PCM) — chunk walk over
    * "fmt " and "data", 16-bit little-endian samples — and returns
    * (sample_rate, channels, n_samples, energy, zero crossings).
    * Fully implemented: WAV is a header + raw PCM, no entropy coding,
    * so no external library is needed. Returns all-(-1) features for
    * payloads that don't parse as RIFF/WAVE (decode failure is data,
    * not an exception — a 100 TB scan must not die on one bad blob). */
  object WavPcm16Codec extends BlobCodec {
    val name = "wav-pcm16"
    val featureNames =
      Seq("sample_rate", "channels", "n_samples", "sum_sq", "zero_crossings")
    private def le32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], off: Int, t: String): Boolean =
      b.length >= off + 4 && new String(b, off, 4, "US-ASCII") == t
    def features(bytes: Array[Byte], width: Int, height: Int): Array[Long] = {
      val bad = Array(-1L, -1L, -1L, -1L, -1L)
      if (bytes.length < 12 || !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE"))
        return bad
      var off = 12
      var rate = -1L
      var channels = -1L
      var bits = -1
      var dataOff = -1
      var dataLen = -1
      while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
        val len = le32(bytes, off + 4).toInt
        if (len < 0) return bad // malformed length must not stall the walk
        if (tag(bytes, off, "fmt ") && off + 8 + 16 <= bytes.length) {
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
        } else if (tag(bytes, off, "data")) {
          dataOff = off + 8
          dataLen = math.min(len, bytes.length - dataOff)
        }
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (rate < 0 || dataOff < 0 || bits != 16) return bad
      val n = dataLen / 2
      var sumSq = 0L
      var zc = 0L
      var prev = 0
      var i = 0
      while (i < n) {
        val v = (bytes(dataOff + 2 * i) & 0xff) |
          (bytes(dataOff + 2 * i + 1) << 8) // sign-extends via Byte
        sumSq += v.toLong * v
        if (i > 0 && prev.toLong * v < 0) zc += 1
        prev = v
        i += 1
      }
      Array(rate, channels, n.toLong, sumSq, zc)
    }
  }

  /** Wrap documents as a blob table: payload bytes + typed metadata
    * (as an image-ish width/height/channels struct derived from the
    * doc — deterministic stand-ins for real media headers). */
  def asBlobTable(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id),
      encode(col(text), "UTF-8").as("blob"),
      struct(
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") * 7 % 480 + 1).cast("int").as("height"),
        lit(3).as("channels")).as("meta"))

  /** Partition-wise decode through a [[BlobCodec]]: one task per
    * partition iterates its rows once — the batch shape a real codec
    * (or model forward pass) needs. Feature columns are named by the
    * codec. */
  def decode(blobs: DataFrame, codec: BlobCodec): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val names = codec.featureNames
    blobs
      .select(col("doc_id"), col("blob"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, w, h) => (id, codec.features(bytes, w, h)) }
      }
      .select(col("_1").as("doc_id") +:
        names.zipWithIndex.map { case (n, i) => col("_2")(i).as(n) }: _*)
  }

  /** Back-compat alias for the c12 oracle entry: the stub codec. */
  def decodeStub(blobs: DataFrame): DataFrame = decode(blobs, ChecksumCodec)

  /** 64-bit BLOCK-MEAN perceptual hash per blob — the image-dedup
    * primitive (pHash/blockhash family): split the payload into 64
    * equal-ish byte blocks (block k covers positions
    * [k·n/64, (k+1)·n/64)), bit k = 1 iff block k's mean exceeds the
    * whole-payload mean, folded MSB-first into one BIGINT. The
    * compare is EXACT integer cross-multiplication
    * (sum_block·n ≥ total·n_block — no float mean), so the hash is
    * engine-portable. Near-identical payloads (a re-encode, a few
    * changed bytes) flip few bits → small Hamming distance; the hash
    * is computed ENTIRELY per-row with higher-order array functions —
    * map-only, no shuffle, no UDF. Payloads shorter than 64 bytes
    * populate only their leading blocks (documented; empty payloads
    * hash to 0). The 64 bits are carried as TWO 32-bit halves
    * (`hi` = blocks 0-31 MSB-first, `lo` = blocks 32-63): a single
    * 64-bit positive fold would overflow the signed long whenever
    * block 0's bit is set (ANSI mode makes that an error, and the
    * two-halves form keeps every intermediate exactly representable
    * in BOTH engines). For this container's ascii corpus the blob
    * bytes ARE the text's ascii codes, so the oracle recomputes the
    * identical hash from the text — a real image path feeds decoded
    * pixel buffers through the same column. */
  def blockMeanHash(docs: DataFrame, id: String, text: String): DataFrame =
    docs
      // split-based byte extraction is O(n) (substr(text, i, 1) in a
      // lambda re-navigates the string per position -> O(n^2) on long
      // docs); the slice drops split's trailing "" (Java split -1)
      .select(col(id).as("did"), expr(
        s"transform(slice(split($text, ''), 1, length($text)), " +
          "ch -> cast(ascii(ch) as bigint))").as("bs"))
      .select(col("did"), col("bs"), size(col("bs")).cast("long").as("n"),
        expr("aggregate(bs, cast(0 as bigint), (a, x) -> a + x)")
          .as("tot"))
      .select(col("did"), expr("""
        transform(sequence(0, 63), k -> CASE
          WHEN ((k + 1) * n) div 64 > (k * n) div 64
           AND aggregate(
                 slice(bs, cast((k * n) div 64 + 1 as int),
                   cast(((k + 1) * n) div 64 - (k * n) div 64 as int)),
                 cast(0 as bigint), (a, x) -> a + x) * n
               >= tot * (((k + 1) * n) div 64 - (k * n) div 64)
          THEN cast(1 as bigint) ELSE cast(0 as bigint) END)""")
        .as("bits"))
      .select(col("did"),
        expr("""aggregate(slice(bits, 1, 32), cast(0 as bigint),
          (a, b) -> a * 2 + b)""").as("hi"),
        expr("""aggregate(slice(bits, 33, 32), cast(0 as bigint),
          (a, b) -> a * 2 + b)""").as("lo"))

  /** Near-duplicate blob pairs by block-mean hash — c4's
    * band-and-verify applied to the MULTIMODAL column (the image
    * near-dup production shape): the 64-bit [[blockMeanHash]] splits
    * into 8 byte-bands, candidates share at least one band value
    * (equi-join on (band, value) — banded by construction, never
    * all-pairs), verification is bit_count(xor) ≤ `tau` on the two
    * hashes alone (no payload rescan). Emits (id_a, id_b, hamming).
    * A same-band hot value (e.g. the all-zero band of short blobs)
    * is the same hot-bucket trade every banded family documents. */
  def blobNearDup(docs: DataFrame, id: String, text: String,
                  tau: Int): DataFrame = {
    import graft.util.Barriers.BarrierOps
    // barrier the per-doc hash table (3 longs/doc): both sides of the
    // band self-join and the hamming verify read it, and without the
    // barrier Catalyst collapses the hash expression into every
    // candidate-pair evaluation — measured 449 s vs 1.3 s at sf0.001
    // (the LSH-family two-step materialization argument)
    val hashed = blockMeanHash(docs, id, text).barrier(true)
    val bands = bandRows(hashed)
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.did") < col("b.did"))
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"),
        col("a.hi").as("hia"), col("a.lo").as("loa"),
        col("b.hi").as("hib"), col("b.lo").as("lob"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        expr("cast(bit_count(hia ^ hib) + bit_count(loa ^ lob)" +
          " as bigint)").as("hamming"))
      .where(col("hamming") <= tau)
  }

  /** Byte-band rows of a hash table — the shared banding of
    * [[blobNearDup]]/[[blobNearDupAgainst]]. Input must carry
    * (did, hi, lo). */
  private def bandRows(hashed: DataFrame): DataFrame =
    hashed.select(col("did"), col("hi"), col("lo"),
      explode(array((0 until 8).map { b =>
        val half = if (b < 4) "hi" else "lo"
        struct(lit(b).as("band"),
          pmod(expr(s"$half div ${1L << (8 * (3 - b % 4))}"), lit(256L))
            .as("bv"))
      }: _*)).as("s"))
      .select(col("did"), col("hi"), col("lo"),
        col("s.band").as("band"), col("s.bv").as("bv"))

  /** Near-dup matches of `docs` AGAINST a static hash index (the
    * incremental / streaming flavor of [[blobNearDup]] — c25's
    * batch-vs-persisted-index shape for blobs): `index` is a
    * [[blockMeanHash]] table built once on the corpus and barriered;
    * arriving docs hash map-side, candidates share a byte-band value
    * with an index row, verification reads only the two hashes.
    * Per-doc independent given the index, so the same call filters an
    * arriving micro-batch. Emits ($id, match_id, hamming). */
  def blobNearDupAgainst(index: DataFrame, docs: DataFrame, id: String,
                         text: String, tau: Int): DataFrame = {
    import graft.util.Barriers.BarrierOps
    val q = blockMeanHash(docs, id, text).barrier(true)
    val qb = bandRows(q).alias("q")
    val ib = bandRows(index).alias("i")
    qb.join(ib, col("q.band") === col("i.band") &&
        col("q.bv") === col("i.bv"))
      .select(col("q.did").as(id), col("i.did").as("match_id"),
        col("q.hi").as("hiq"), col("q.lo").as("loq"),
        col("i.hi").as("hii"), col("i.lo").as("loi"))
      .distinct()
      .select(col(id), col("match_id"),
        expr("cast(bit_count(hiq ^ hii) + bit_count(loq ^ loi)" +
          " as bigint)").as("hamming"))
      .where(col("hamming") <= tau)
  }

  /** The [[blockMeanHash]] + banding CTE chain with every CTE name
    * prefixed, ending at `<p>bands` = ($id, hi, lo, b, bv) — shared
    * by the c58 self-join oracle and the d23 split-sides oracle. */
  private def hashBandCtes(p: String, id: String, text: String,
                           where: String): String =
    s"""${p}bs AS (
        SELECT $id, list_transform(range(1, length($text) + 1),
                 i -> CAST(ascii($text[i]) AS BIGINT)) AS bs
        FROM documents WHERE $where),
      ${p}pre AS (
        -- every list_reduce input is list_prepend(0, ...)-guarded:
        -- DuckDB may evaluate a CASE arm on rows its condition
        -- rejects, and list_reduce errors on an empty list (an empty
        -- doc at sf0.1 trips it); the prepended 0 is sum-neutral
        SELECT $id, bs, CAST(len(bs) AS BIGINT) AS n,
               list_reduce(list_prepend(CAST(0 AS BIGINT), bs),
                 (a, x) -> a + x) AS tot
        FROM ${p}bs),
      ${p}bits AS (
        SELECT $id,
               list_transform(range(0, 64), k -> CASE
                 WHEN ((k + 1) * n) // 64 > (k * n) // 64
                  AND list_reduce(list_prepend(CAST(0 AS BIGINT),
                        bs[CAST((k * n) // 64 + 1 AS BIGINT) :
                           CAST(((k + 1) * n) // 64 AS BIGINT)]),
                        (a, x) -> a + x) * n
                      >= tot * (((k + 1) * n) // 64 - (k * n) // 64)
                 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
                 AS bits
        FROM ${p}pre),
      ${p}h AS (
        SELECT $id,
               list_reduce(bits[1:32], (a, b) -> a * 2 + b) AS hi,
               list_reduce(bits[33:64], (a, b) -> a * 2 + b) AS lo
        FROM ${p}bits),
      ${p}bands AS (
        SELECT $id, hi, lo, b,
               (CASE WHEN b < 4 THEN hi ELSE lo END
                 >> CAST((3 - b % 4) * 8 AS INTEGER)) & 255 AS bv
        FROM (SELECT *, unnest(range(0, 8)) AS b FROM ${p}h))"""

  /** DuckDB mirror of [[blobNearDup]] (same integer block-mean hash
    * recomputed from the ascii text — see [[blockMeanHash]]). */
  def blobNearDupSql(id: String, text: String, tau: Int): String =
    s"""
      WITH ${hashBandCtes("", id, text, "TRUE")},
      cand AS (
        SELECT DISTINCT a.$id AS id_a, b.$id AS id_b,
               a.hi AS hia, a.lo AS loa, b.hi AS hib, b.lo AS lob
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bv = b.bv AND a.$id < b.$id)
      SELECT id_a, id_b,
             CAST(bit_count(xor(hia, hib)) +
                  bit_count(xor(loa, lob)) AS BIGINT) AS hamming
      FROM cand
      WHERE CAST(bit_count(xor(hia, hib)) +
                 bit_count(xor(loa, lob)) AS BIGINT) <= $tau
      ORDER BY id_a, id_b"""

  /** DuckDB mirror of [[blobNearDupAgainst]] over a split corpus. */
  def blobNearDupAgainstSql(id: String, text: String,
                            indexWhere: String, queryWhere: String,
                            tau: Int): String =
    s"""
      WITH ${hashBandCtes("i_", id, text, indexWhere)},
      ${hashBandCtes("q_", id, text, queryWhere)},
      cand AS (
        SELECT DISTINCT q.$id AS $id, i.$id AS match_id,
               q.hi AS hiq, q.lo AS loq, i.hi AS hii, i.lo AS loi
        FROM q_bands q JOIN i_bands i
          ON q.b = i.b AND q.bv = i.bv)
      SELECT $id, match_id,
             CAST(bit_count(xor(hiq, hii)) +
                  bit_count(xor(loq, loi)) AS BIGINT) AS hamming
      FROM cand
      WHERE CAST(bit_count(xor(hiq, hii)) +
                 bit_count(xor(loq, loi)) AS BIGINT) <= $tau
      ORDER BY $id, match_id"""

  /** Audio-frame windowing over raw PCM-style payloads — REAL DSP,
    * fully implemented: 16-bit little-endian offset-binary samples,
    * framed at (frameSize, hop), per-frame energy (sum of squares,
    * exact integer) and zero-crossing count. RMS is derived OUTSIDE
    * the JVM loop with the engine's own round(sqrt(...)), keeping the
    * float step inside the established Spark↔DuckDB round parity.
    * Full frames only; a payload shorter than one frame emits none. */
  def audioFrames(blobs: DataFrame, frameSize: Int, hop: Int): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val n = bytes.length / 2
          val s = new Array[Int](n)
          var i = 0
          while (i < n) {
            s(i) = (bytes(2 * i) & 0xff) + 256 * (bytes(2 * i + 1) & 0xff) - 16384
            i += 1
          }
          val nFrames = if (n >= frameSize) (n - frameSize) / hop + 1 else 0
          (0 until nFrames).iterator.map { f =>
            val off = f * hop
            var sumSq = 0L
            var zc = 0L
            var j = 0
            while (j < frameSize) {
              val v = s(off + j).toLong
              sumSq += v * v
              if (j > 0 && s(off + j - 1).toLong * v < 0) zc += 1
              j += 1
            }
            (id, f.toLong, sumSq, zc)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "sum_sq", "zero_crossings")
      .withColumn("rms",
        round(sqrt(col("sum_sq").cast("double") / frameSize), 6))
  }

  /** Block-mean RESIZE of a gray8 raster to an `ow`×`oh` thumbnail —
    * the image-preprocessing step a multimodal training pipeline runs
    * before feature extraction. The payload is read as a row-major
    * w×h raster (w = the blob table's metadata width, h = ⌈n/w⌉ with
    * a ragged last row); output pixel (r, c) is the FLOOR-MEAN of
    * the source block rows [r·h div oh, (r+1)·h div oh) × cols
    * [c·w div ow, (c+1)·w div ow) — integer arithmetic only (sum div
    * count, no float), so the DuckDB oracle reproduces every pixel
    * exactly. Degenerate blocks (dims smaller than the grid, or a
    * block entirely inside the ragged tail) emit -1 — decode
    * shortfall is data, not an exception. Output is one SCALAR row
    * per pixel — (id, in_w, in_h, k, px) with k the row-major pixel
    * index — because the driver's correctness comparator hashes
    * column-wise scalars and cannot sort an array-typed column
    * (the round-11 c93 lesson: list columns are unhashable in a
    * pandas sort).
    *
    * Execution shape: NOT a per-row array program. Interpreted
    * higher-order-function folds cost ~1 µs per element (the nested
    * slice-sum formulation measured 34 s for 5,000 × ~5 KB payloads
    * once the explode forced it to actually materialize — r11's
    * 1.4 s bench number was ColumnPruning reading nothing), so the
    * raster instead EXPLODES to one codegen'd row per byte and the
    * block means come from one map-side-combinable hash aggregate:
    * the pixel index has a closed-form inverse (a byte at raster row
    * r belongs to pixel row (oh·r + oh−1) div h — the exact inverse
    * of the block lower-bound r0(rk) = (rk·h) div oh, incl. the
    * degenerate h < oh case where early pixel rows own no source
    * rows), so no per-doc state exists at all. Empty blocks arrive
    * via a left join from the 64-cell grid and emit -1. split /
    * posexplode / ascii / the divides / the hash agg are all
    * whole-stage-codegen — ~25× faster than the HOF fold at sf0.1
    * and the shape that survives 100 KB payloads at 100 TB (bytes
    * fan out map-side and combine to ow·oh rows per doc before the
    * exchange). */
  def resizeGray8(docs: DataFrame, id: String, text: String,
                  ow: Int = 8, oh: Int = 8): DataFrame = {
    val base = docs.select(col(id).as("did"),
      (col("n_chars") % 640 + 1).cast("long").as("w"),
      length(col(text)).cast("long").as("n"),
      col(text).as("__t"))
      .withColumn("h", expr("(n + w - 1) div w"))
    val grid = base.select(col("did"), col("w").as("in_w"),
        col("h").as("in_h"),
        explode(sequence(lit(0L), lit(ow * oh - 1L))).as("k"))
    val sums = base
      .select(col("did"), col("w"), col("h"), col("n"),
        posexplode(split(col("__t"), "")).as(Seq("p", "ch")))
      .where(col("p") < col("n"))
      .select(col("did"),
        (expr(s"(($oh * (p div w) + ${oh - 1}) div h) * $ow") +
          expr(s"($ow * (p % w) + ${ow - 1}) div w")).as("k"),
        ascii(col("ch")).cast("long").as("v"))
      .groupBy(col("did"), col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
    grid.join(sums, Seq("did", "k"), "left")
      .select(col("did").as(id), col("in_w"), col("in_h"), col("k"),
        coalesce(expr("s div c"), lit(-1L)).as("px"))
  }

  /** DuckDB mirror of [[resizeGray8]] over the `documents` view —
    * one scalar row per output pixel (cross join against the pixel
    * grid instead of building a list then unnesting). */
  def resizeGray8Sql(id: String, text: String,
                     ow: Int = 8, oh: Int = 8): String = {
    val r0 = s"((k // $ow) * h) // $oh"
    val r1 = s"(((k // $ow) + 1) * h) // $oh"
    val c0 = s"((k % $ow) * w) // $ow"
    val c1 = s"(((k % $ow) + 1) * w) // $ow"
    val poss = s"list_filter(flatten(list_transform(range($r0, $r1), " +
      s"i -> list_transform(range($c0, $c1), j -> i * w + j))), " +
      "p -> p < n)"
    s"""
      WITH bs AS (
        SELECT $id, list_transform(range(1, length($text) + 1),
                 i -> CAST(ascii($text[i]) AS BIGINT)) AS bs,
               CAST(n_chars % 640 + 1 AS BIGINT) AS w
        FROM documents),
      pre AS (
        SELECT $id, bs, w, CAST(len(bs) AS BIGINT) AS n,
               CAST((len(bs) + w - 1) // w AS BIGINT) AS h
        FROM bs)
      SELECT $id, w AS in_w, h AS in_h, CAST(k AS BIGINT) AS k,
             CASE
               WHEN ($r1) > ($r0) AND ($c1) > ($c0) AND len($poss) > 0
               THEN list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform($poss,
                        p -> bs[CAST(p + 1 AS BIGINT)])),
                      (a, x) -> a + x) // len($poss)
               ELSE CAST(-1 AS BIGINT) END AS px
      FROM pre, range(0, ${ow * oh}) AS grid(k)
      ORDER BY $id, k"""
  }

  /** Stride frame-sampling over a video-shaped payload — the
    * frame-subsample step a video training pipeline runs instead of
    * decoding every frame. The payload splits into `frameSize`-byte
    * frames (full frames only, the [[audioFrames]] convention); the
    * sampler keeps every `stride`-th frame and emits per kept frame
    * its timestamp under `fps` (integer ms), the floor-mean luma
    * ×100, and a rolling content hash (the dedup/alignment key) —
    * all exact integers, map-only per row, no UDF. A real video path
    * swaps the byte-split for the container's frame index and feeds
    * decoded frames through the same columns. */
  def frameSample(docs: DataFrame, id: String, text: String,
                  frameSize: Int = 256, fps: Int = 25,
                  stride: Int = 4): DataFrame =
    docs
      .select(col(id).as("did"),
        expr(s"transform(slice(split($text, ''), 1, length($text)), " +
          "ch -> cast(ascii(ch) as bigint))").as("bs"))
      .withColumn("nf", expr(s"size(bs) div $frameSize"))
      .select(col("did"), explode(expr(
        s"""transform(
          filter(sequence(0, greatest(nf, 1) - 1),
            f -> f < nf AND f % $stride = 0),
          f -> struct(
            cast(f as bigint) as frame_idx,
            cast((f * 1000) div $fps as bigint) as ts_ms,
            (aggregate(slice(bs, f * $frameSize + 1, $frameSize),
               cast(0 as bigint), (a, x) -> a + x) * 100)
              div $frameSize as mean_x100,
            aggregate(slice(bs, f * $frameSize + 1, $frameSize),
              cast(0 as bigint),
              (a, x) -> (a * 31 + x) % 1000003) as fhash))"""))
        .as("fr"))
      .select(col("did").as(id), col("fr.frame_idx"), col("fr.ts_ms"),
        col("fr.mean_x100"), col("fr.fhash"))

  /** DuckDB mirror of [[frameSample]] over the `documents` view. */
  def frameSampleSql(id: String, text: String, frameSize: Int = 256,
                     fps: Int = 25, stride: Int = 4): String =
    s"""
      WITH bs AS (
        SELECT $id, list_transform(range(1, length($text) + 1),
                 i -> CAST(ascii($text[i]) AS BIGINT)) AS bs
        FROM documents),
      fr AS (
        SELECT $id, f, bs[f * $frameSize + 1 : (f + 1) * $frameSize] AS fb
        FROM (SELECT $id, bs,
                unnest(generate_series(0, len(bs) // $frameSize)) AS f
              FROM bs) t
        WHERE (f + 1) * $frameSize <= len(bs) AND f % $stride = 0)
      SELECT $id, CAST(f AS BIGINT) AS frame_idx,
             CAST((f * 1000) // $fps AS BIGINT) AS ts_ms,
             CAST((list_reduce(list_prepend(CAST(0 AS BIGINT), fb),
                (a, x) -> a + x) * 100) // $frameSize AS BIGINT)
               AS mean_x100,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), fb),
                (a, x) -> (a * 31 + x) % 1000003) AS BIGINT) AS fhash
      FROM fr
      ORDER BY $id, frame_idx"""
}
