package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (driver-contract extension surface):
  * image/audio/video as opaque binary columns with typed metadata, and
  * partition-wise batched "decode" — the Scala/Dataset analog of a
  * Pandas-UDF `mapInPandas` decode stage.
  *
  * The container has no image/audio codecs, so [[ImageDecodeStub]] is a
  * STUB: it computes deterministic fake features (byte histogram + a
  * size-derived "resolution") with the real decode path clearly marked.
  * Everything around it — the binary schema, the per-partition batch
  * shape, the partitioning, the feature schema — is real and tested.
  */
object Multimodal {

  case class BinaryDoc(doc_id: Long, payload: Array[Byte], fmt: String)
  case class ImageFeatures(doc_id: Long, n_bytes: Int, fmt: String,
      width: Int, height: Int, hist: Array[Long])

  /** Deterministic fake "image decoder".
    *
    * REAL IMPLEMENTATION WOULD: decode payload with an image codec
    * (e.g. javax.imageio / libjpeg bindings), extract true dimensions,
    * resize, and emit pixel statistics. Not available in this
    * container, so dimensions derive from the payload length and the
    * "histogram" is a 4-bucket byte histogram — deterministic, so tests
    * can pin exact values.
    */
  object ImageDecodeStub {
    def decode(d: BinaryDoc): ImageFeatures = {
      val n = d.payload.length
      val hist = new Array[Long](4)
      var i = 0
      while (i < n) { hist((d.payload(i) & 0xff) / 64) += 1; i += 1 }
      ImageFeatures(d.doc_id, n, d.fmt, width = (n % 640) + 1, height = (n % 480) + 1, hist)
    }
  }

  /** documents → opaque binary payloads with typed metadata (in a real
    * lake these bytes come from the storage layer, not from text).
    */
  def binaryTable(spark: SparkSession, d: String): Dataset[BinaryDoc] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        concat(lit("img/"), element_at(lit(Array("png", "jpg", "webp")),
          (col("doc_id") % 3 + 1).cast("int"))).as("fmt"))
      // decode contract: a payload exists and is non-empty. A lake row
      // with a missing/empty blob is skipped here — the oracle's inner
      // join on the per-byte aggregate drops exactly the same rows, and
      // the stub (like any real codec) has nothing to decode.
      .filter(col("payload").isNotNull && octet_length(col("payload")) > 0)
      .as[BinaryDoc]
  }

  /** Partition-wise batched decode — mapPartitions so a real decoder
    * could amortize per-batch setup (codec init, model load), exactly
    * like the arrow-batch shape of mapInPandas. Stays a narrow
    * transformation: no shuffle, scales with input splits.
    */
  def decodeFeatures(spark: SparkSession, d: String): Dataset[ImageFeatures] = {
    import spark.implicits._
    binaryTable(spark, d).mapPartitions { batch =>
      // per-partition setup would go here (decoder/codec init)
      batch.map(ImageDecodeStub.decode)
    }
  }

  /** Queryable view: decoded features flattened to columns. */
  def multimodalDecode(spark: SparkSession, d: String): DataFrame =
    decodeFeatures(spark, d).toDF()
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"), col("fmt"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        element_at(col("hist"), 1).as("h0"), element_at(col("hist"), 2).as("h1"),
        element_at(col("hist"), 3).as("h2"), element_at(col("hist"), 4).as("h3"))
      .orderBy(col("doc_id"))

  case class ResizedImage(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, thumb_sum: Long)

  /** Deterministic fake "resize": target dims = fit into a 64×64 box
    * preserving aspect ratio (all-integer: scale by 64 then DIV by the
    * longer side, floor at 1), and a 64-point "thumbnail" descriptor —
    * the byte-value sum of an even stride sample over the payload.
    *
    * REAL IMPLEMENTATION WOULD: bilinear/area-resample decoded pixels
    * to (out_w, out_h) and emit the thumbnail bytes. The stride-sample
    * sum stands in for the resample so the whole path stays
    * deterministic and DuckDB-checkable; the geometry math is the real
    * thing.
    */
  object ResizeStub {
    val Box = 64
    def resize(d: BinaryDoc): ResizedImage = {
      val n = d.payload.length
      val w = (n % 640) + 1
      val h = (n % 480) + 1
      val m = math.max(w, h)
      val outW = math.max(1, w * Box / m)
      val outH = math.max(1, h * Box / m)
      val step = math.max(1, n / Box)
      var sum = 0L
      var k = 0
      while (k < Box && k * step < n) {
        sum += (d.payload(k * step) & 0xff).toLong
        k += 1
      }
      ResizedImage(d.doc_id, w, h, outW, outH, sum)
    }
  }

  /** c17: the resize stage — same partition-wise batched shape as c9
    * (narrow mapPartitions; a real codec would amortize init per
    * batch). No shuffle; the output orderBy is cosmetic.
    */
  def multimodalResize(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    binaryTable(spark, d).mapPartitions(_.map(ResizeStub.resize)).toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("out_w").cast("long").as("out_w"),
        col("out_h").cast("long").as("out_h"),
        col("thumb_sum"))
      .orderBy(col("doc_id"))
  }

  case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Long, frame_sum: Long)

  /** Fixed "video" framing: 256-byte frames, every 4th sampled. */
  object FrameSampleStub {
    val FrameBytes = 256
    val Every = 4
    def frames(d: BinaryDoc): Iterator[Frame] = {
      val n = d.payload.length
      val nFrames = (n + FrameBytes - 1) / FrameBytes
      Iterator.range(0, nFrames, Every).map { j =>
        val from = j * FrameBytes
        val until = math.min(from + FrameBytes, n)
        var sum = 0L
        var i = from
        while (i < until) { sum += (d.payload(i) & 0xff).toLong; i += 1 }
        Frame(d.doc_id, j.toLong, (until - from).toLong, sum)
      }
    }
  }

  /** c18: frame sampling — the video analog of c9's decode: treat the
    * payload as fixed-size frames, emit every 4th (the keyframe-stride
    * pattern training pipelines use to cut decode cost). flatMap inside
    * ONE mapPartitions pass: rows fan out per frame but stay narrow —
    * no shuffle, and frame extraction cost scales with sampled frames
    * only.
    *
    * REAL IMPLEMENTATION WOULD: demux containers and decode only the
    * sampled frames (codecs seek to keyframes for exactly this
    * reason); per-frame byte count + sum stand in for pixel features.
    */
  def multimodalFrameSample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    binaryTable(spark, d).mapPartitions(_.flatMap(FrameSampleStub.frames)).toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** The decode stub is JVM-side logic, but its fake feature definition
    * is simple enough to oracle: byte-bucket counts over the UTF-8
    * payload, dimensions from byte length. This pins the whole
    * mapPartitions path to a cross-engine check.
    */
  val oracles: Map[String, String] = Map(
    // exact because the fixture text is pure ASCII [a-z ]: UTF-8 bytes
    // == character ordinals, so the stub's byte buckets are char buckets
    "c9_multimodal_decode" ->
      """WITH ch AS (
        |  SELECT doc_id, ord(substr(text, i, 1)) AS o
        |  FROM documents, unnest(range(1, length(text) + 1)) AS r(i)),
        |agg AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN o < 64 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
        |    CAST(SUM(CASE WHEN o >= 64 AND o < 128 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        |    CAST(0 AS BIGINT) AS h2,
        |    CAST(0 AS BIGINT) AS h3
        |  FROM ch GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(length(d.text) AS BIGINT) AS n_bytes,
        |  'img/' || CASE d.doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS fmt,
        |  CAST(length(d.text) % 640 + 1 AS BIGINT) AS width,
        |  CAST(length(d.text) % 480 + 1 AS BIGINT) AS height,
        |  a.h0, a.h1, a.h2, a.h3
        |FROM documents d JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // same ASCII-payload identity as c9; geometry and stride sampling
    // are pure integer math, so the resize stub is exactly expressible
    "c17_multimodal_resize" ->
      s"""WITH b AS (
         |  SELECT doc_id, length(text) AS n,
         |    length(text) % 640 + 1 AS w, length(text) % 480 + 1 AS h
         |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
         |s AS (
         |  SELECT doc_id,
         |    CAST(sum(ord(substr(text, k * greatest(1, length(text) // ${ResizeStub.Box}) + 1, 1))) AS BIGINT) AS thumb_sum
         |  FROM documents, unnest(range(0, ${ResizeStub.Box})) r(k)
         |  WHERE text IS NOT NULL AND length(text) > 0
         |    AND k * greatest(1, length(text) // ${ResizeStub.Box}) < length(text)
         |  GROUP BY doc_id)
         |SELECT b.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  CAST(greatest(1, w * ${ResizeStub.Box} // greatest(w, h)) AS BIGINT) AS out_w,
         |  CAST(greatest(1, h * ${ResizeStub.Box} // greatest(w, h)) AS BIGINT) AS out_h,
         |  s.thumb_sum
         |FROM b JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,
    "c18_frame_sample" ->
      s"""WITH ch AS (
         |  SELECT doc_id, (i - 1) // ${FrameSampleStub.FrameBytes} AS j,
         |    ord(substr(text, i, 1)) AS o
         |  FROM documents, unnest(range(1, length(text) + 1)) r(i)
         |  WHERE text IS NOT NULL AND length(text) > 0)
         |SELECT doc_id, CAST(j AS BIGINT) AS frame_idx,
         |  CAST(count(*) AS BIGINT) AS frame_bytes,
         |  CAST(sum(o) AS BIGINT) AS frame_sum
         |FROM ch WHERE j % ${FrameSampleStub.Every} = 0
         |GROUP BY doc_id, j ORDER BY doc_id, frame_idx""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c9_multimodal_decode"   -> multimodalDecode _,
    "c17_multimodal_resize"  -> multimodalResize _,
    "c18_frame_sample"       -> multimodalFrameSample _,
  )
}
