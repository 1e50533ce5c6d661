"""Multimodal column plumbing (north star).

Images / audio / video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, partition-parallel
``mapInPandas`` — is real and tested. The codec tier (round 7) is now
REAL for five formats via pure-stdlib decoders (operators/codecs.py):
uncompressed 24-bit BMP, 8-bit RGB/RGBA PNG (round 8 — zlib inflate +
full scanline unfiltering), baseline + progressive huffman JPEG
(rounds 9/10 — the formats real image corpora are actually made of),
PCM WAV, and Motion-JPEG AVI video (round 10 — RIFF demux + per-frame
JPEG decode), to genuine pixel/sample/frame statistics in-sandbox;
richer codecs (PIL/av — WebP, inter-frame video) slot in behind the
same sniff/decode interface with try-import gating (the same stance as
the protobuf-gated streaming twin), and only blobs NO available codec
can decode fall back to the clearly-tagged deterministic stub.

Scale note: ``mapInPandas`` streams Arrow batches per partition, so blob
decode parallelizes with the scan and never materializes a partition in
one Python object. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
batch memory for fat blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("content", T.BinaryType()),      # opaque encoded bytes
    T.StructField("meta_width", T.IntegerType()),
    T.StructField("meta_height", T.IntegerType()),
    T.StructField("meta_sample_rate", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_md5", T.StringType()),
    T.StructField("codec", T.StringType()),       # bmp | png | jpeg | webp | wav | wav-adpcm | avi | pil | stub-md5
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: wrap the documents fixture as a media table (utf-8 bytes as
    the opaque blob) so the binary plumbing is exercised by real data."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_sample_rate"),
    )


def _decode_stub(media_type: str, content: bytes) -> list[float]:
    """Deterministic fake feature vector (real codecs not in container).

    Real implementation would be:
        if media_type == "image": PIL.Image.open(io.BytesIO(content)) ...
    """
    import hashlib

    digest = hashlib.md5(content or b"").digest()
    return [b / 255.0 for b in digest[:8]]


try:  # richer codecs, if the environment has them (not in this sandbox)
    from PIL import Image as _PIL_Image  # noqa: N813
except ImportError:
    _PIL_Image = None


def decode_media(media_type: str, content: bytes):
    """The REAL decode path. Routes by magic bytes (the blob is the
    truth, not the declared media_type): uncompressed 24-bit BMP,
    8-bit RGB/RGBA PNG (round 8), baseline+progressive huffman JPEG
    (rounds 9/10), GIF87a/89a incl. LZW + animation compositing
    (round 11), lossless WebP / VP8L incl. all four transforms, color
    cache and LZ77 (round 12), PCM + IMA-ADPCM WAV (round 13), and
    Motion-JPEG AVI video
    (round 10 — RIFF demux + per-frame JPEG decode) with the
    pure-stdlib codecs; other formats (lossy VP8, inter-frame
    video, ...) go to PIL when installed; anything else raises
    ``NotImplementedError`` (the honest boundary — callers wanting a
    total function use :func:`extract_features`, which falls back to
    the tagged stub).

    Returns ('bmp', (h, w, 3) uint8 RGB array),
    ('png', (h, w, 3|4) uint8 array),
    ('webp', (h, w, 3) uint8 RGB array),
    ('jpeg', (h, w, 3) uint8 RGB array),
    ('wav' | 'wav-adpcm' | 'wav-ms-adpcm' | 'wav-ulaw' | 'wav-alaw',
    (sample_rate, (n, ch) float array)),
    ('avi' | 'gif', (fps, [(h, w, 3) uint8 RGB frame arrays])), or
    ('pil', PIL.Image)."""
    from . import codecs

    kind = codecs.sniff(content)
    if kind == "bmp":
        return "bmp", codecs.decode_bmp(content)
    if kind == "png":
        return "png", codecs.decode_png(content)
    if kind == "gif":
        # (fps, frames) like AVI: a GIF is a 1..n-frame animation; a
        # single-frame GIF is the n=1 case of the same composited decode
        return "gif", codecs.decode_gif_frames(content)
    if kind == "jpeg":
        return "jpeg", codecs.decode_jpeg(content)
    if kind == "wav":
        # distinct tag for the compressed family (round 14): the blob
        # is the truth — a header-only fmt-chunk read splits IMA ADPCM
        # (0x0011) from PCM so count-per-codec profiles can hash-check
        # that ADPCM blobs decoded through the ADPCM path natively
        decoded = codecs.decode_wav(content)
        afmt = codecs.wav_audio_format(content)
        if afmt == 17:
            return "wav-adpcm", decoded
        if afmt == 2:  # round 14: Microsoft ADPCM joins the boundary
            return "wav-ms-adpcm", decoded
        if afmt == 7:  # round 15: G.711 telephony companding family
            return "wav-ulaw", decoded
        if afmt == 6:
            return "wav-alaw", decoded
        return "wav", decoded
    if kind == "avi":
        return "avi", codecs.decode_avi_frames(content)
    if kind == "webp":
        # lossless VP8L decodes natively; lossy VP8 raises
        # NotImplementedError inside and falls to PIL/stub below
        try:
            return "webp", codecs.decode_webp(content)
        except NotImplementedError:
            if _PIL_Image is None or media_type != "image":
                raise
            # fall through to the PIL path for lossy VP8
    if _PIL_Image is not None and media_type == "image" and content:
        import io

        try:
            return "pil", _PIL_Image.open(io.BytesIO(content))
        except Exception as exc:  # PIL's open raises format-specific types
            raise ValueError(f"PIL could not decode blob: {exc}") from exc
    raise NotImplementedError(
        f"no available codec for this blob (media_type={media_type!r}; "
        "in-sandbox codecs: uncompressed 24-bit BMP, 8-bit PNG, "
        "baseline+progressive huffman JPEG, GIF87a/89a, lossless "
        "WebP/VP8L, PCM WAV, MJPEG AVI; install PIL/librosa/av for more)"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Partition-parallel feature extraction over binary media columns.

    Arrow-batched ``mapInPandas`` — the production shape for codec work:
    per-batch pandas in/out, no row-at-a-time serde. Blobs an available
    codec can decode get REAL features (pixel statistics for BMP,
    sample statistics for WAV — operators/codecs.py) tagged with the
    codec name; everything else falls back to the deterministic md5
    stub tagged ``stub-md5``, so a consumer can always tell real
    features from placeholders.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from . import codecs

        def featurize(media_type, blob):
            # ONE dispatch: decode_media owns the magic-byte routing; this
            # only maps each decode kind to its feature function, falling
            # back to the tagged stub for anything no codec can decode
            try:
                # feature computation stays INSIDE the try: a decodable
                # but feature-hostile stream (e.g. an MJPEG whose frames
                # change size mid-stream — legal, every JPEG carries its
                # own SOF) must land on the stub, not fail the task
                kind, decoded = decode_media(media_type, blob)
                if kind in ("bmp", "png", "jpeg", "webp"):
                    return kind, codecs.image_features(decoded)
                if kind in ("wav", "wav-adpcm", "wav-ms-adpcm",
                            "wav-ulaw", "wav-alaw"):
                    return kind, codecs.audio_features(*decoded)
                if kind in ("avi", "gif"):
                    # GIF shares the video descriptor: a single-frame
                    # GIF is the n_frames=1 case (motion/temporal 0)
                    return kind, codecs.video_features(*decoded)
                if kind == "pil":  # gated path — PIL absent in this sandbox
                    return kind, codecs.image_features(
                        np.asarray(decoded.convert("RGB"), dtype=np.uint8)
                    )
            except (ValueError, NotImplementedError):
                pass
            return "stub-md5", _decode_stub(media_type, blob)

        for pdf in batches:
            tags, feats = [], []
            for mt, blob in zip(pdf["media_type"], pdf["content"]):
                tag, vec = featurize(mt, blob)
                tags.append(tag)
                feats.append(vec)
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(lambda b: len(b or b"")).astype("int64"),
                "content_md5": pdf["content"].map(
                    lambda b: hashlib.md5(b or b"").hexdigest()
                ),
                "codec": tags,
                "feature": feats,
            })
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta_width", T.IntegerType()),
    T.StructField("meta_height", T.IntegerType()),
    T.StructField("codec", T.StringType()),  # png | avi | stub
])


def resize_images(
    df: DataFrame,
    width: int = 256,
    height: int = 256,
    method: str = "bilinear",
) -> DataFrame:
    """REAL resize over binary media columns (round 10) — Arrow-batched
    mapInPandas. Blobs an available codec can decode are resampled with
    the vectorized kernel (codecs.resize_pixels — half-pixel-center
    bilinear, or exact integer-map nearest): images re-encode as
    lossless PNG (alpha preserved), MJPEG-AVI videos resize EVERY frame
    and re-mux at the original fps. The output ``codec`` column tags
    provenance; blobs that aren't decodable visual media (undecodable
    bytes, audio) keep the prior deterministic stub (truncate/pad to
    w*h/64, tag 'stub') so the function stays total over a dirty
    corpus — the extract_features fallback stance.
    """
    fake_len = max(1, width * height // 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        def resize_one(blob: bytes) -> tuple[bytes, str]:
            # magic-byte gate BEFORE decoding: a WAV (or unknown) blob
            # can never resize, so paying its full sample decode just
            # to fall through to the stub wastes the per-blob hot path
            # (round-10 review finding)
            if codecs.sniff(blob) not in ("bmp", "png", "gif", "jpeg",
                                          "avi", "webp"):
                kind = None
            else:
                try:
                    kind, decoded = decode_media("image", blob)
                except (ValueError, NotImplementedError):
                    kind = None
            if kind == "gif":
                # single frame → lossless PNG like the other stills;
                # animation → MJPEG-AVI at the GIF's fps (re-encoding
                # resampled frames as GIF would need palette
                # quantization — the encoder's documented boundary)
                fps, frames = decoded
                if len(frames) == 1:
                    kind, decoded = "png", frames[0]
                else:
                    return (
                        codecs.encode_avi_mjpeg(
                            [codecs.resize_pixels(f, width, height, method)
                             for f in frames],
                            fps=fps or 10.0,
                        ),
                        "avi",
                    )
            if kind in ("bmp", "png", "jpeg", "webp"):
                return (
                    codecs.encode_png(
                        codecs.resize_pixels(decoded, width, height, method)
                    ),
                    "png",
                )
            if kind == "avi":
                fps, frames = decoded
                # re-mux with the source's RATIONAL (rate, scale) pair:
                # round-tripping NTSC 30000/1001 through the float fps
                # would re-mux as 29970/1000 — a rate drift every
                # independent probe reports
                return (
                    codecs.encode_avi_mjpeg(
                        [codecs.resize_pixels(f, width, height, method)
                         for f in frames],
                        fps=fps or 30.0,
                        rate_scale=codecs.avi_stream_timing(blob),
                    ),
                    "avi",
                )
            return (blob or b"\x00").ljust(fake_len, b"\x00")[:fake_len], "stub"

        for pdf in batches:
            blobs, tags = [], []
            for b in pdf["content"]:
                blob, tag = resize_one(bytes(b) if b is not None else b"")
                blobs.append(blob)
                tags.append(tag)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "content": pd.Series(blobs, dtype="object"),
                "meta_width": pd.Series([width] * len(pdf), dtype="int32"),
                "meta_height": pd.Series([height] * len(pdf), dtype="int32"),
                "codec": tags,
            })

    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    # provenance: 'mjpeg-avi' = a real demuxed frame payload,
    # 'stub-slice' = the deterministic fallback for non-AVI blobs —
    # without the tag a consumer can't tell garbage slices from frames
    T.StructField("source", T.StringType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(df: DataFrame, every_nth: int = 10, max_frames: int = 8) -> DataFrame:
    """Frame sampling: one input video row fans out to ≤max_frames frame
    rows (1:N via mapInPandas — the output batch need not align 1:1 with
    the input batch, which is exactly how a demuxer streams frames).

    Round 10: REAL for Motion-JPEG AVI blobs — the RIFF container walk
    (codecs.avi_frame_payloads) yields each frame's encoded JPEG bytes
    and every ``every_nth``-th is kept, without decoding pixels (a
    sampler that decodes frames it then drops wastes the bulk of the
    work at corpus scale; consumers decode only the kept frames).
    Blobs that aren't a parseable MJPEG AVI keep the prior deterministic
    stub (fixed-size blob slices) so the function stays total — same
    tagged-fallback stance as extract_features. Inter-frame codecs
    (H.264/...) would slot in via the av-gated path; GIF is excluded
    here BY that same boundary — its frames composite onto the prior
    canvas (disposal methods), so sampling the nth frame requires
    decoding every frame before it, the opposite of MJPEG's
    demux-without-decode economy (decode_gif_frames does the full
    composited decode when a consumer wants GIF frames).
    """
    chunk = 16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            ids, idxs, srcs, frames = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = blob or b""
                payloads = None
                if codecs.sniff(blob) == "avi":
                    try:
                        _fps, payloads = codecs.avi_frame_payloads(blob)
                    except (ValueError, NotImplementedError):
                        payloads = None  # undecodable container → stub slices
                if payloads is not None:
                    for fi, pos in enumerate(range(0, len(payloads), every_nth)):
                        if fi >= max_frames:
                            break
                        ids.append(mid)
                        # SOURCE frame number, not the sample ordinal:
                        # a consumer's timestamp = frame_index / fps is
                        # off by every_nth otherwise (ffmpeg's select
                        # filter keeps the real PTS the same way)
                        idxs.append(pos)
                        srcs.append("mjpeg-avi")
                        frames.append(payloads[pos])
                    continue
                n_chunks = max(1, len(blob) // chunk)
                for fi, pos in enumerate(range(0, n_chunks, every_nth)):
                    if fi >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(pos)
                    srcs.append("stub-slice")
                    frames.append(blob[pos * chunk:(pos + 1) * chunk])
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_index": pd.Series(idxs, dtype="int32"),
                "source": srcs,
                "frame": pd.Series(frames, dtype="object"),
            })

    return df.mapInPandas(run, FRAME_SCHEMA)


def image_phash(df: DataFrame, hash_size: int = 8) -> DataFrame:
    """Perceptual aHash per image blob (codecs.average_hash over the
    REAL decoded pixels) — cross-codec visual dedup: the same picture
    re-encoded BMP vs PNG (or re-saved) hashes identical, which byte-
    level fingerprints can never see. Arrow-batched mapInPandas like
    extract_features; undecodable or non-image blobs are dropped (the
    dedup pass only speaks for pixels it actually decoded). Returns
    (media_id, codec, phash) with the hash as fixed-width hex — 64
    packed bits overflow a signed BIGINT, strings don't.
    """
    from collections.abc import Iterator

    import pandas as pd

    from . import codecs

    width = (hash_size * hash_size + 3) // 4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cods, hashes = [], [], []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue
                kind = codecs.sniff(bytes(blob))
                try:
                    if kind == "bmp":
                        px = codecs.decode_bmp(bytes(blob))
                    elif kind == "png":
                        px = codecs.decode_png(bytes(blob))
                    elif kind == "gif":
                        # first composited frame — the thumbnail a viewer
                        # shows, so cross-codec dedup sees GIF stills
                        px = codecs.decode_gif(bytes(blob))
                    elif kind == "jpeg":
                        px = codecs.decode_jpeg(bytes(blob))
                    elif kind == "webp":
                        px = codecs.decode_webp(bytes(blob))
                    else:
                        continue
                except (ValueError, NotImplementedError):
                    continue
                ids.append(media_id)
                cods.append(kind)
                hashes.append(
                    format(codecs.average_hash(px, hash_size), f"0{width}x")
                )
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "codec": cods,
                "phash": hashes,
            })

    return df.select("media_id", "content").mapInPandas(
        run, "media_id long, codec string, phash string"
    )


def phash_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_distance: int = 10,
    n_blocks: int = 4,
    hash_size: int = 8,
) -> DataFrame:
    """NEAR-duplicate image pairs by Hamming distance over
    ``hash_size²``-bit perceptual hashes — catches re-encodes plus
    small edits (crops, banners, watermarks) that flip a few aHash
    bits, where exact-hash grouping only sees bit-identical pictures.
    Same pigeonhole shape as the SimHash text pairs: split the hex hash
    into ``n_blocks`` equal substrings, equi-join per (block index,
    block value) — by pigeonhole agreement is GUARANTEED for distance
    < n_blocks (exact below that; recall-bounded candidates above,
    like every LSH here). Refine = exact popcount distance in 32-bit
    hex chunks (the full packed hash would overflow signed BIGINT past
    63 bits; 8-hex chunks never do), keep <= ``max_distance``. No
    corpus cross join — candidate fan-out follows block collisions.

    ``hash_size`` must match the :func:`image_phash` that produced the
    column (round-9 ADVICE fix: block and chunk widths were hard-coded
    to the 64-bit/16-hex layout — a 16×16 hash silently had its last
    192 bits ignored). Every hash is length-checked IN the expression
    feeding the blocks (``when``/``raise_error``, not a droppable
    assert column Catalyst would prune) — fail loud, not wrong pairs."""
    n_bits = hash_size * hash_size
    # ceil, matching image_phash's (n_bits + 3) // 4 formatting width —
    # floor disagreed for odd hash_size and tripped the length check on
    # every row (round-9 ADVICE fix).
    hex_len = (n_bits + 3) // 4
    if hex_len % n_blocks:
        raise ValueError(
            f"hex length {hex_len} (hash_size={hash_size}) is not "
            f"divisible into {n_blocks} equal blocks"
        )
    width = hex_len // n_blocks
    h_checked = F.when(
        F.length(F.col(hash_col)) == hex_len, F.col(hash_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"phash_near_dup_pairs: expected {hex_len}-hex hash "
                    f"(hash_size={hash_size}), got length "
                ),
                F.length(F.col(hash_col)).cast("string"),
            )
        )
    )
    blocks = hashes.select(
        F.col(id_col).alias("doc"),
        h_checked.alias("h"),
    ).select(
        "doc", "h",
        F.posexplode(
            F.array(*[
                F.substring("h", j * width + 1, width)
                for j in range(n_blocks)
            ])
        ).alias("j", "block"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"),
            F.col("a.h").alias("ha"), F.col("b.h").alias("hb"),
        )
        .distinct()
    )

    def chunk(col, start):
        return F.conv(F.substring(col, start, 8), 16, 10).cast("bigint")

    starts = range(1, hex_len + 1, 8)
    dist = sum(
        (
            F.bit_count(chunk(F.col("ha"), s).bitwiseXOR(chunk(F.col("hb"), s)))
            for s in starts
        ),
        F.lit(0),
    )
    return (
        cand.withColumn("distance", dist.cast("bigint"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )
