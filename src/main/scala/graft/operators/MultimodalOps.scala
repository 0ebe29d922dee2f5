package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.11): media payloads are opaque
  * BINARY columns with typed metadata; decode / feature-extract / frame-
  * sample run as distributed per-partition transforms over the binary
  * payloads.
  *
  * The image/audio codec libraries are not in this container, so the
  * *decode* step is a clearly-marked deterministic STUB
  * ([[StubImageDecoder]]); everything Spark-side — the binary column,
  * schema, partition-iterator batch shape, and downstream aggregation — is
  * real and oracle-checked. Payloads here are the UTF-8 bytes of
  * `documents.text`, standing in for image/audio blobs.
  *
  * Scale notes (100 TB): all three ops are map-side per-row/per-partition
  * work followed by a keyed aggregation — no shuffle of the binary payloads
  * beyond the initial scan, which is how a real media pipeline must behave
  * (never shuffle the blobs; extract features first).
  */
object MultimodalOps {

  /** STUB decoder — deterministic fake standing in for a real image codec.
    * Real implementation would decode the payload with an imaging library;
    * the container has none, so features derive from the raw bytes. The
    * signature (bytes in, fixed-schema features out, called once per row
    * inside a partition iterator) is the real contract.
    */
  object StubImageDecoder {
    final case class ImageMeta(doc_id: Long, width: Int, height: Int,
        brightness: Double)

    def decode(docId: Long, payload: Array[Byte]): ImageMeta = {
      val b0 = if (payload.length > 0) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      val n = math.min(32, payload.length)
      var sum = 0L
      var i = 0
      while (i < n) { sum += (payload(i) & 0xff); i += 1 }
      ImageMeta(docId,
        width = 64 * (1 + b0 % 16),
        height = 64 * (1 + b1 % 16),
        brightness = sum.toDouble / n)
    }

    /** Block-brightness perceptual hash over the first 32 payload bytes:
      * 8 blocks of 4, bit b set iff the block is brighter than average.
      * INTEGER comparison (8·blockSum > totalSum ⟺ blockMean > mean)
      * so the SQL mirror is bit-exact with no float boundary. A real
      * pHash DCTs the decoded image; the stub derives from raw bytes
      * like the rest of the decoder, and the CONTRACT is the real one:
      * sign-quantized per-block energy → small int hash → bucket join.
      */
    def phash8(payload: Array[Byte]): Int = {
      if (payload.length < 32) return 0
      var total = 0L
      var i = 0
      while (i < 32) { total += (payload(i) & 0xff); i += 1 }
      var h = 0
      var b = 0
      while (b < 8) {
        var bs = 0L
        var j = 4 * b
        while (j < 4 * b + 4) { bs += (payload(j) & 0xff); j += 1 }
        if (8L * bs > total) h |= (1 << b)
        b += 1
      }
      h
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary column + typed metadata: payload size, lead byte, chunk count.
    "mm_binary_meta" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          encode($"text", "utf-8").as("payload"),
          $"text")
        .select($"doc_id",
          octet_length($"payload").as("n_bytes"),
          ascii(substring($"text", 1, 1)).as("first_byte"),
          expr("cast(ceil(octet_length(payload) / 1024.0) as int)")
            .as("n_chunks"))
        .orderBy($"doc_id")
    }),

    // Multimodal exact dedup: digest over the OPAQUE binary payload —
    // the first pass of any media pipeline (identical bytes collapse
    // before any decode/feature work is spent). Payloads never shuffle:
    // the digest is map-side projection, the groupBy carries 16-byte
    // hashes + ids only.
    "mm_payload_dedup" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", encode($"text", "utf-8").as("payload"))
        .groupBy(md5($"payload").as("h"))
        .agg(min($"doc_id").as("keeper"),
          count(lit(1)).as("n_copies"),
          sum(octet_length($"payload")).as("total_bytes"))
        .orderBy($"keeper")
    }),

    // Content-addressed shard layout for the payload store: every
    // payload routes to shard = first byte of its md5 digest mod 64 —
    // the digest-prefix layout object stores use so (a) identical
    // payloads land on one shard (dedup stays shard-local), (b) load
    // spreads uniformly regardless of ingest order or source skew. The
    // report is the per-shard manifest (objects, distinct objects,
    // bytes) a storage planner reads; map-side digest + one tiny
    // 64-group aggregation — payload bytes never shuffle.
    "mm_payload_shard" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", encode($"text", "utf-8").as("payload"))
        .withColumn("h", md5($"payload"))
        .withColumn("shard",
          (conv(substring($"h", 1, 2), 16, 10).cast("long") % 64)
            .cast("int"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_objects"),
          countDistinct($"h").as("n_distinct"),
          sum(octet_length($"payload")).as("bytes"))
        .orderBy($"shard")
    }),

    // Perceptual near-dedup: quantized block-brightness hash buckets —
    // the SECOND pass after mm_payload_dedup's exact digests (identical
    // bytes collapse there; perceptually-similar-but-byte-different
    // payloads collapse HERE, the re-encoded/re-compressed duplicate
    // every media pipeline meets). n_distinct_payloads > 1 in a bucket
    // is the proof the hash collapses beyond exact equality (55 of 79
    // buckets at sf0.01 hold several byte-distinct payloads).
    // Map-side hash → tiny groupBy; payloads never shuffle. At scale
    // the hash widens (64-bit DCT pHash) and pairs form per bucket —
    // the same Σ bucket² discipline as every other near-dup family.
    "mm_perceptual_dedup" -> ((s, dir) => {
      import s.implicits._
      import StubImageDecoder._
      Tables.documents(s, dir)
        .select($"doc_id", encode($"text", "utf-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, payload) =>
          (id, phash8(payload),
            java.security.MessageDigest.getInstance("MD5").digest(payload)
              .map("%02x".format(_)).mkString) })
        .toDF("doc_id", "phash", "payload_md5")
        .groupBy($"phash")
        .agg(min($"doc_id").as("keeper"),
          count(lit(1)).as("n_payloads"),
          countDistinct($"payload_md5").as("n_distinct_payloads"))
        .orderBy($"keeper")
    }),

    // Feature extraction via the stubbed decoder, run as a partition-wise
    // typed transform (the mapInPandas/batch-UDF analog in Scala Spark).
    "mm_image_features" -> ((s, dir) => {
      import s.implicits._
      import StubImageDecoder._
      Tables.documents(s, dir)
        .select($"doc_id", encode($"text", "utf-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, payload) => decode(id, payload) })
        .toDF()
        .orderBy($"doc_id")
    }),

    // Resize planning: the decode → aspect-preserving fit → re-encode
    // step of every image pipeline. The decoder stays stubbed (no
    // codecs in the container) but the resize math is the real
    // contract: scale = min(target/w, target/h) without upscaling,
    // output dims floor(dim·scale), RGB buffer size out_w·out_h·3.
    // Division order is mirrored exactly in the oracle, floor is exact,
    // and the whole stage is map-side projection (payloads never
    // shuffle).
    "mm_image_resize" -> ((s, dir) => {
      import s.implicits._
      import StubImageDecoder._
      val target = 224.0
      Tables.documents(s, dir)
        .select($"doc_id", encode($"text", "utf-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, payload) => decode(id, payload) })
        .toDF()
        .withColumn("scale",
          least(lit(target) / $"width", lit(target) / $"height", lit(1.0)))
        .withColumn("out_w", floor($"width" * $"scale").cast("int"))
        .withColumn("out_h", floor($"height" * $"scale").cast("int"))
        .select($"doc_id", $"width", $"height", $"scale", $"out_w", $"out_h",
          ($"out_w".cast("long") * $"out_h" * 3L).as("out_bytes"))
        .orderBy($"doc_id")
    }),

    // Audio-column plumbing: PCM-shaped binary + typed audio metadata
    // (sample rate, channel count), windowed into 20 ms analysis frames.
    // All metadata math is exact integer arithmetic; the sample decode
    // itself stays behind the stub contract like the image path.
    "mm_audio_windows" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", encode($"text", "utf-8").as("payload"))
        .withColumn("sample_rate",
          (lit(8000) + ($"doc_id" % 3) * 4000).cast("int"))
        .withColumn("channels", (lit(1) + ($"doc_id" % 2)).cast("int"))
        // 16-bit samples: n_samples = bytes div (2 * channels)
        .withColumn("n_samples",
          expr("cast(octet_length(payload) div (2 * channels) as int)"))
        .withColumn("spw", expr("cast(sample_rate div 50 as int)")) // 20 ms
        .withColumn("n_windows",
          expr("cast((n_samples + spw - 1) div spw as int)"))
        .withColumn("duration_ms",
          expr("n_samples * 1000 div sample_rate"))
        .select($"doc_id", $"sample_rate", $"channels", $"n_samples",
          $"n_windows", $"duration_ms")
        .orderBy($"doc_id")
    }),

    // Scene-cut detection: the temporal segmentation step of a video
    // curation pipeline — slice the payload into fixed frames, extract
    // a per-frame feature (mean of the frame's first 8 bytes, via the
    // same bytes-as-text contract as the stub decoder), and mark a cut
    // wherever the feature jumps more than a threshold between
    // consecutive frames (lag over a doc-keyed window). Scenes = cuts
    // + 1 — the unit a frame-sampler or clip-embedder consumes.
    // Payloads never shuffle: the per-frame feature is extracted
    // map-side, only (doc, pos, feature) rows enter the window.
    "mm_scene_cuts" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val K = 8          // feature bytes per frame
      val THR = 10.0     // brightness-jump threshold
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      Tables.documents(s, dir)
        .filter(length($"text") >= 1)
        .withColumn("n_frames",
          expr("cast(ceil(length(text) / 256.0) as int)"))
        .select($"doc_id", $"n_frames", posexplode_outer(expr(
          "transform(sequence(0, n_frames - 1), i -> substring(text, i*256 + 1, 256))"))
          .as(Seq("pos", "frame")))
        .withColumn("fb",
          expr(s"aggregate(transform(sequence(1, least($K, length(frame))), " +
            "j -> ascii(substring(frame, j, 1))), 0, (a, x) -> a + x)")
            .cast("double") / least(lit(K), length($"frame")))
        .withColumn("prev_fb", lag($"fb", 1).over(w))
        .withColumn("cut",
          when($"prev_fb".isNotNull && abs($"fb" - $"prev_fb") > THR, 1)
            .otherwise(0))
        .groupBy($"doc_id", $"n_frames")
        .agg(sum($"cut").as("n_cuts"))
        .select($"doc_id", $"n_frames", $"n_cuts",
          ($"n_cuts" + 1).as("n_scenes"))
        .orderBy($"doc_id")
    }),

    // Cross-VIDEO near-dup via shared keyframe fingerprints — the
    // clip-overlap detector of a video curation pipeline (re-posted
    // clips, intro/outro reuse, same footage re-encoded): sample every
    // 2nd fixed-size frame, fingerprint each with a 16-block sign-
    // quantized energy hash (the StubImageDecoder.phash8 contract
    // widened to 16 bits over the whole frame), collapse to the
    // per-video DISTINCT fingerprint set, and pair videos sharing ≥ 2
    // keyframe fingerprints with the set-overlap ratio. All integer
    // math (16·blockSum > totalSum ⟺ blockMean > mean) — the SQL
    // mirror is bit-exact.
    //
    // 100 TB: frames never shuffle — fingerprints are extracted
    // map-side and only (video, 16-bit fp) pairs enter the distinct +
    // join; the candidate join is keyed on the fingerprint (the
    // Σ bucket² discipline of every near-dup family — at production
    // scale the hash widens to a 64-bit DCT pHash so buckets stay
    // small), and the ≥ 2-shared-keyframes gate is applied on the
    // pair aggregate, never as a post-hoc all-pairs scan.
    "mm_video_neardup" -> ((s, dir) => {
      import s.implicits._
      val F = 64 // frame bytes (the synthetic payloads are short docs)
      // stride-2 sampling happens in the sequence step (0, 2, 4, ...)
      // instead of a post-explode pos % 2 filter: half the exploded
      // rows never materialize (nothing downstream reads pos)
      val frames = Tables.documents(s, dir)
        // empty docs are a considered input (mm_frame_sample guards the
        // same way): n_frames = 0 would make the stride-2
        // sequence(0, -1, 2) throw 'Illegal sequence boundaries' at
        // runtime — an explicit positive step with start > stop is an
        // error, unlike the step-less form the pre-stride shape used
        .filter(length($"text") >= 1)
        .withColumn("n_frames",
          expr(s"cast(ceil(length(text) / $F.0) as int)"))
        .select($"doc_id", explode(expr(
          s"transform(sequence(0, n_frames - 1, 2), " +
            s"i -> substring(text, i*$F + 1, $F))"))
          .as("frame"))
        .filter(length($"frame") === F)
      // One split('') pass per frame to char codes, then O(1) array
      // reads for the block sums. The original per-char
      // ascii(substring(frame, i, 1)) form re-walked the frame per
      // character AND re-inlined the 64-term `tot` aggregate into all
      // 16 CASE branches when the projections collapsed — measured
      // 4.8 s vs 0.85 s for this shape on the sf0.1 bench host
      // (DevOpt "video" probe), identical integer results.
      val fp = frames
        .withColumn("cs", expr("transform(split(frame, ''), c -> ascii(c))"))
        .withColumn("blk", expr("transform(sequence(0, 15), " +
          "b -> cs[4*b] + cs[4*b+1] + cs[4*b+2] + cs[4*b+3])"))
        .withColumn("tot", expr("aggregate(blk, 0, (a, x) -> a + x)"))
        .withColumn("fp", expr(
          "aggregate(transform(sequence(0, 15), " +
            "b -> CASE WHEN 16 * blk[b] > tot " +
            "THEN shiftleft(1, b) ELSE 0 END), 0, (a, x) -> a + x)"))
        .select($"doc_id", $"fp").distinct()
        .localCheckpoint() // consumed 3x: two join sides + set sizes
      val sizes = fp.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("n_common"))
        .filter($"n_common" >= 2)
        .join(sizes.select($"doc_id".as("a_id"), $"n".as("n_a")), "a_id")
        .join(sizes.select($"doc_id".as("b_id"), $"n".as("n_b")), "b_id")
        .withColumn("overlap_x1000",
          expr("(1000 * n_common) div least(n_a, n_b)"))
        .select($"a_id", $"b_id", $"n_common", $"n_a", $"n_b",
          $"overlap_x1000")
        .orderBy($"a_id", $"b_id")
    }),

    // Frame sampling: slice payload into 256-byte frames, keep every 4th,
    // aggregate sampled sizes — pos/explode over computed binary slices.
    "mm_frame_sample" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", encode($"text", "utf-8").as("payload"))
        .withColumn("n_frames",
          expr("cast(ceil(octet_length(payload) / 256.0) as int)"))
        .select($"doc_id", $"n_frames", posexplode_outer(expr(
          "transform(sequence(0, n_frames - 1), i -> substring(payload, i*256 + 1, 256))"))
          .as(Seq("pos", "frame")))
        .filter($"pos" % 4 === 0)
        .groupBy($"doc_id", $"n_frames")
        .agg(count(lit(1)).cast("int").as("n_sampled"),
          sum(octet_length($"frame")).as("sampled_bytes"))
        .select($"doc_id", $"n_frames", $"n_sampled", $"sampled_bytes")
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // md5(VARCHAR) hashes the string's UTF-8 bytes — identical to the
    // engine's md5 over the encoded payload.
    "mm_payload_shard" ->
      """WITH s AS (
        |  SELECT doc_id, md5(text) AS h,
        |   CAST(CAST('0x' || substr(md5(text), 1, 2) AS INTEGER) % 64
        |        AS INTEGER) AS shard,
        |   CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents)
        |SELECT shard, count(*) AS n_objects,
        | count(DISTINCT h) AS n_distinct,
        | CAST(sum(nb) AS BIGINT) AS bytes
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin,

    "mm_payload_dedup" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper,
        | count(*) AS n_copies,
        | CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT)
        |   AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
        | CAST((octet_length(encode(text)) + 1023) // 1024 AS INTEGER) AS n_chunks
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors StubImageDecoder byte math via ascii() (payload is UTF-8 of
    // ASCII text, so byte i == codepoint of char i).
    "mm_perceptual_dedup" ->
      """WITH hashed AS (
        |  SELECT doc_id, md5(text) AS payload_md5,
        |   CASE WHEN length(text) < 32 THEN 0 ELSE (
        |     SELECT CAST(sum(CASE WHEN
        |        8 * (ascii(substr(text, 4*b + 1, 1))
        |           + ascii(substr(text, 4*b + 2, 1))
        |           + ascii(substr(text, 4*b + 3, 1))
        |           + ascii(substr(text, 4*b + 4, 1)))
        |        > (SELECT sum(ascii(substr(text, i, 1)))
        |           FROM range(1, 33) AS r(i))
        |       THEN power(2, b) ELSE 0 END) AS INTEGER)
        |     FROM range(0, 8) AS t(b)) END AS phash
        |  FROM documents)
        |SELECT phash, min(doc_id) AS keeper,
        | count(*) AS n_payloads,
        | count(DISTINCT payload_md5) AS n_distinct_payloads
        |FROM hashed GROUP BY phash ORDER BY keeper""".stripMargin,

    "mm_image_features" ->
      """SELECT doc_id,
        | CAST(64 * (1 + ascii(substr(text, 1, 1)) % 16) AS INTEGER) AS width,
        | CAST(64 * (1 + ascii(substr(text, 2, 1)) % 16) AS INTEGER) AS height,
        | CAST(list_sum(list_transform(range(1, least(length(text), 32) + 1),
        |        i -> ascii(substr(text, i, 1)))) AS DOUBLE)
        |   / least(length(text), 32) AS brightness
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_image_resize" ->
      """SELECT doc_id, width, height, scale,
        | CAST(floor(width * scale) AS INTEGER) AS out_w,
        | CAST(floor(height * scale) AS INTEGER) AS out_h,
        | CAST(floor(width * scale) AS BIGINT)
        |   * CAST(floor(height * scale) AS INTEGER) * 3 AS out_bytes
        |FROM (
        |  SELECT doc_id, width, height,
        |   least(224.0 / width, 224.0 / height, 1.0) AS scale
        |  FROM (
        |    SELECT doc_id,
        |     CAST(64 * (1 + ascii(substr(text, 1, 1)) % 16) AS INTEGER) AS width,
        |     CAST(64 * (1 + ascii(substr(text, 2, 1)) % 16) AS INTEGER) AS height
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "mm_audio_windows" ->
      """SELECT doc_id, sample_rate, channels, n_samples,
        | CAST((n_samples + spw - 1) // spw AS INTEGER) AS n_windows,
        | CAST(n_samples * 1000 // sample_rate AS BIGINT) AS duration_ms
        |FROM (
        |  SELECT doc_id, sample_rate, channels,
        |   CAST(octet_length(encode(text)) // (2 * channels) AS INTEGER) AS n_samples,
        |   CAST(sample_rate // 50 AS INTEGER) AS spw
        |  FROM (
        |    SELECT doc_id, text,
        |     CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        |     CAST(1 + (doc_id % 2) AS INTEGER) AS channels
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin,

    // same frame slicing, same first-8-byte mean, same lag/threshold
    "mm_scene_cuts" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |   CAST((length(text) + 255) // 256 AS INTEGER) AS n_frames
        |  FROM documents WHERE length(text) >= 1),
        |f0 AS (
        |  SELECT doc_id, n_frames, text,
        |   unnest(range(0, n_frames)) AS pos FROM base),
        |f AS (
        |  SELECT doc_id, n_frames, pos,
        |   substr(text, CAST(pos*256 + 1 AS INTEGER), 256) AS frame
        |  FROM f0),
        |feat AS (
        |  SELECT doc_id, n_frames, pos,
        |   CAST(list_sum(list_transform(
        |          range(1, least(8, length(frame)) + 1),
        |          j -> ascii(substr(frame, CAST(j AS INTEGER), 1)))) AS DOUBLE)
        |     / least(8, length(frame)) AS fb
        |  FROM f),
        |cuts AS (
        |  SELECT doc_id, n_frames,
        |   CASE WHEN prev_fb IS NOT NULL AND abs(fb - prev_fb) > 10.0
        |        THEN 1 ELSE 0 END AS cut
        |  FROM (SELECT doc_id, n_frames, fb,
        |         lag(fb) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_fb
        |        FROM feat))
        |SELECT doc_id, n_frames, CAST(sum(cut) AS BIGINT) AS n_cuts,
        | CAST(sum(cut) + 1 AS BIGINT) AS n_scenes
        |FROM cuts GROUP BY doc_id, n_frames
        |ORDER BY doc_id""".stripMargin,

    // same 64-byte frame slicing, stride-2 sample, 16-block integer
    // hash; power(2, b) sums to the same value shiftleft builds
    "mm_video_neardup" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |   CAST((length(text) + 63) // 64 AS INTEGER) AS n_frames
        |  FROM documents),
        |f0 AS (SELECT doc_id, unnest(range(0, n_frames)) AS pos FROM base),
        |f AS (
        |  SELECT b.doc_id,
        |   substr(b.text, CAST(f0.pos*64 + 1 AS INTEGER), 64) AS frame
        |  FROM f0 JOIN base b ON b.doc_id = f0.doc_id WHERE f0.pos % 2 = 0),
        |fps AS (
        |  SELECT doc_id,
        |   (SELECT CAST(sum(CASE WHEN 16 * (
        |        ascii(substr(frame, CAST(4*b + 1 AS INTEGER), 1))
        |      + ascii(substr(frame, CAST(4*b + 2 AS INTEGER), 1))
        |      + ascii(substr(frame, CAST(4*b + 3 AS INTEGER), 1))
        |      + ascii(substr(frame, CAST(4*b + 4 AS INTEGER), 1)))
        |      > (SELECT sum(ascii(substr(frame, CAST(i AS INTEGER), 1)))
        |         FROM range(1, 65) AS r(i))
        |     THEN power(2, b) ELSE 0 END) AS INTEGER)
        |    FROM range(0, 16) AS t(b)) AS fp
        |  FROM f WHERE length(frame) = 64),
        |sets AS (SELECT DISTINCT doc_id, fp FROM fps),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |   count(*) AS n_common
        |  FROM sets a JOIN sets b
        |    ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.a_id, p.b_id, p.n_common, sa.n AS n_a, sb.n AS n_b,
        | (1000 * p.n_common) // least(sa.n, sb.n) AS overlap_x1000
        |FROM pairs p
        |JOIN sizes sa ON sa.doc_id = p.a_id
        |JOIN sizes sb ON sb.doc_id = p.b_id
        |WHERE p.n_common >= 2
        |ORDER BY p.a_id, p.b_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id,
        | CAST(nf AS INTEGER) AS n_frames,
        | CAST((nf + 3) // 4 AS INTEGER) AS n_sampled,
        | CAST(list_sum(list_transform(
        |        list_filter(range(0, nf), i -> i % 4 = 0),
        |        i -> least(256, n_bytes - i*256))) AS BIGINT) AS sampled_bytes
        |FROM (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       (octet_length(encode(text)) + 255) // 256 AS nf
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
