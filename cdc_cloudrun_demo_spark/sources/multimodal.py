"""Multimodal columns: opaque binary payloads + typed metadata.

Design for 100 TB of images/audio/video: the DataFrame carries
(a) a `binary` payload column (or a pointer-to-blob for objects too large
to inline), (b) a typed metadata struct, and (c) feature columns produced
by `mapInPandas` decode UDFs that process Arrow batches — so the expensive
Python work is amortized per-batch and the Spark-side schema/partitioning
stays fully declarative.

`decode_image` is a REAL pure-Python decoder for the public netpbm
formats (binary PPM `P6` / PGM `P5` — header + raw samples, no
compression, decodable with no imaging library); other formats fall back
to PIL when the runtime ships it. The stand-in `_fake_decode_batch`
remains for the generic binary plumbing ops (binary column in, Arrow
batches through mapInPandas, fixed output schema out), and
`multimodal_image_decode` runs the full encode→decode→features path
through the real decoder with an exact oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_for_compute, load_table

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, n_chunks bigint, header_hex string"
)


def _parse_netpbm(payload: bytes) -> dict:
    """Pure-Python decode of binary netpbm (PPM `P6` = RGB, PGM `P5` =
    gray): magic, whitespace/comment-separated width/height/maxval, one
    whitespace byte, then width·height·channels raw samples. The spec is
    public and trivially parseable, which is exactly why it serves as the
    no-dependency decode path."""
    magic = payload[:2]
    channels = {b"P6": 3, b"P5": 1}[magic]
    # header tokens: width, height, maxval — '#' comments run to newline
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm samples not supported")
    n = width * height * channels
    pixels = payload[pos : pos + n]
    if len(pixels) != n:
        raise ValueError(f"truncated netpbm payload: {len(pixels)} < {n}")
    sums = [0, 0, 0]
    for c in range(channels):
        sums[c] = sum(pixels[c::channels])
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "channels": channels,
        "r_sum": sums[0],
        "g_sum": sums[1] if channels == 3 else sums[0],
        "b_sum": sums[2] if channels == 3 else sums[0],
    }


def decode_image(payload: bytes) -> dict:
    """Real image decode (dims + per-channel sums): netpbm (P6/P5) is
    decoded in pure Python — no imaging library needed — and any other
    format falls back to PIL when the runtime ships it (the dependency
    seam, now a fallback rather than the only path)."""
    if payload[:2] in (b"P6", b"P5"):
        return _parse_netpbm(payload)
    try:
        from io import BytesIO

        from PIL import Image  # noqa: F401 — optional runtime dependency
    except ImportError as e:
        raise ValueError(
            f"unsupported image format {payload[:4]!r}: not netpbm and PIL "
            "is not installed in this runtime"
        ) from e
    img = Image.open(BytesIO(payload)).convert("RGB")
    width, height = img.size
    sums = [0, 0, 0]
    for px in img.getdata():
        for c in range(3):
            sums[c] += px[c]
    return {
        "width": width,
        "height": height,
        "maxval": 255,
        "channels": 3,
        "r_sum": sums[0],
        "g_sum": sums[1],
        "b_sum": sums[2],
    }


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder: byte length, 256-byte chunk count,
    first-4-bytes hex (the 'magic number' a real decoder would sniff)."""
    for pdf in batches:
        payload = pdf["payload"]
        byte_len = payload.map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": byte_len,
                "n_chunks": -(-byte_len // 256),  # ceil div
                "header_hex": payload.map(lambda b: bytes(b[:4]).hex()),
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload + metadata struct. In production the
    payload comes off the object store; here we materialize the document
    text as utf-8 bytes so the column is real."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
            F.octet_length(F.col("text")).cast("long").alias("content_length"),
        ).alias("meta"),
    )



def _decodable(payloads: DataFrame) -> DataFrame:
    """Decode-boundary guard: a NULL payload (missing/corrupt blob, a
    fact of life in any object-store-backed corpus) is SKIPPED before
    the Arrow UDF rather than crashing the whole batch — the metadata
    scan still surfaces such rows for triage (`multimodal_metadata`
    keeps them; length(NULL) is NULL there, not an error)."""
    return payloads.filter(F.col("payload").isNotNull())

def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal path: binary column → mapInPandas decode →
    typed feature columns. Oracle-checkable because the fake decoder's
    outputs are pure functions of the payload bytes."""
    d = load_table(spark, sf_dir, "documents")
    payloads = _decodable(with_binary_payload(d).select("doc_id", "payload"))
    return payloads.mapInPandas(_fake_decode_batch, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_len bigint, frame_hash string"


def _frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic frame sampler: treat the payload as fixed-size 256-byte
    'frames' and keep every 4th (what a video pipeline does with ffmpeg's
    select filter — STUB per module docstring; swapping in a real decoder
    changes only the bytes-to-frames step)."""
    import hashlib

    frame_size, stride = 256, 4
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_hash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            n_frames = -(-len(data) // frame_size)
            for idx in range(0, n_frames, stride):
                chunk = data[idx * frame_size : (idx + 1) * frame_size]
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(idx)
                out["frame_len"].append(len(chunk))
                out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(out)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: mapInPandas expands each blob
    into its sampled frames (row-expanding Arrow UDF — the shape a video
    frame-extraction stage has). Oracle-checkable because the sampler is a
    pure function of the payload bytes (DuckDB: generate_series over
    substrings)."""
    d = load_for_compute(spark, sf_dir, "documents")
    payloads = _decodable(with_binary_payload(d).select("doc_id", "payload"))
    return payloads.mapInPandas(_frame_sample_batch, schema=FRAME_SCHEMA)


_AUDIO_SCHEMA = (
    "doc_id long, win_idx long, n_samples long, sum_sq long, peak long"
)


def _audio_energy_batch(
    batches: Iterator[pd.DataFrame], win: int = 256
) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in audio feature extractor: treat the payload
    as unsigned-8-bit PCM (center 128), window into ``win``-sample frames
    and emit per-window energy (Σ(s−128)², exact int64) and peak |s−128| —
    the bytes→samples→windowed-DSP shape a real audio stage has, with
    numpy vectorized over the whole Arrow batch (no per-sample Python).
    A real codec replaces only np.frombuffer (STUB per module docstring)."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "win_idx": [], "n_samples": [], "sum_sq": [], "peak": []
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
            if samples.size == 0:
                continue
            centered = samples - 128
            for w0 in range(0, samples.size, win):
                chunk = centered[w0 : w0 + win]
                out["doc_id"].append(int(doc_id))
                out["win_idx"].append(w0 // win)
                out["n_samples"].append(int(chunk.size))
                out["sum_sq"].append(int(np.dot(chunk, chunk)))
                out["peak"].append(int(np.abs(chunk).max()))
        yield pd.DataFrame(out)


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy over binary payloads: mapInPandas expands
    each blob into per-window (energy, peak) rows — the feature-extract
    stage of an audio dedup/quality pipeline. All-integer outputs make
    the oracle exact (DuckDB recomputes the same Σ(code−128)² from the
    character codes); at 100 TB the payload bytes stream through the
    Arrow batches once and are never shuffled."""
    d = load_for_compute(spark, sf_dir, "documents")
    payloads = _decodable(with_binary_payload(d).select("doc_id", "payload"))
    return payloads.mapInPandas(_audio_energy_batch, schema=_AUDIO_SCHEMA)


_VAD_WIN = 64  # samples per VAD frame (finer than the energy report)
_VAD_MEAN_ENERGY = 2000  # active ⟺ sum_sq ≥ threshold · n_samples


def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation: maximal runs of consecutive
    active frames (mean energy ≥ threshold) per audio blob — the
    silence-trimming / utterance-splitting stage of a speech corpus
    pipeline. The frame energies come from the same Arrow batch
    extractor as `multimodal_audio_energy` at a finer 64-sample frame;
    activity is the exact-integer predicate sum_sq ≥ T·n (no float
    mean), and run detection is the gaps-and-islands identity
    (win_idx − row_number() is constant within a run), so segments are
    a pure function of the bytes and the whole output hash-matches the
    DuckDB oracle recomputing frames from the characters.

    Plan at 100 TB: bytes stream through one mapInPandas pass (never
    shuffled); only the frame FEATURE rows (blob_bytes/64 per blob)
    shuffle once on doc_id for the per-blob run window, and the output
    is segment-sized. A real decoder swaps np.frombuffer only."""
    d = load_for_compute(spark, sf_dir, "documents")
    payloads = _decodable(with_binary_payload(d).select("doc_id", "payload"))
    frames = payloads.mapInPandas(
        lambda it: _audio_energy_batch(it, win=_VAD_WIN), schema=_AUDIO_SCHEMA
    )
    active = frames.filter(
        F.col("sum_sq") >= F.lit(_VAD_MEAN_ENERGY) * F.col("n_samples")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("win_idx")
    return (
        active.withColumn(
            "island", F.col("win_idx") - F.row_number().over(w)
        )
        .groupBy("doc_id", "island")
        .agg(
            F.min("win_idx").alias("start_win"),
            F.max("win_idx").alias("end_win"),
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("sum_sq").alias("energy"),
        )
        .select("doc_id", "start_win", "end_win", "n_windows", "energy")
    )


AUDIO_VAD_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, text, LENGTH(text) AS n FROM documents
    ), w AS (
        SELECT doc_id, text,
               UNNEST(generate_series(0, (n - 1) // {_VAD_WIN})) AS win_idx
        FROM d WHERE n > 0
    ), c AS (
        SELECT doc_id, win_idx,
               list_transform(
                   regexp_extract_all(
                       substring(text, win_idx * {_VAD_WIN} + 1, {_VAD_WIN}),
                       '(?s).'),
                   ch -> unicode(ch) - 128) AS codes
        FROM w
    ), e AS (
        SELECT doc_id, win_idx, len(codes) AS n_samples,
               list_sum(list_transform(codes, x -> x * x)) AS sum_sq
        FROM c
    ), active AS (
        SELECT doc_id, win_idx, sum_sq,
               win_idx - ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY win_idx) AS island
        FROM e WHERE sum_sq >= {_VAD_MEAN_ENERGY} * n_samples
    )
    SELECT doc_id,
           CAST(MIN(win_idx) AS BIGINT) AS start_win,
           CAST(MAX(win_idx) AS BIGINT) AS end_win,
           COUNT(*) AS n_windows,
           CAST(SUM(sum_sq) AS BIGINT) AS energy
    FROM active GROUP BY doc_id, island
"""


_IMG_W, _IMG_H = 8, 8
IMAGE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, maxval bigint, "
    "r_sum bigint, g_sum bigint, b_sum bigint"
)


def _encode_ppm_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Synthesize a real binary PPM (P6) blob per document: 8×8 RGB with
    pixel byte i = (doc_id·31 + i) mod 256 — deterministic from the key
    alone, so the decode oracle can recompute every channel sum exactly
    in SQL. This is the fixture-blob generator; in production the blob
    column comes off the object store already encoded."""
    header = f"P6\n{_IMG_W} {_IMG_H}\n255\n".encode()
    n = _IMG_W * _IMG_H * 3
    for pdf in batches:
        ids = pdf["doc_id"].astype("int64")
        payloads = [
            header + bytes((int(d) * 31 + i) % 256 for i in range(n)) for d in ids
        ]
        yield pd.DataFrame({"doc_id": ids, "payload": payloads})


def _decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [decode_image(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": [r["width"] for r in rows],
                "height": [r["height"] for r in rows],
                "maxval": [r["maxval"] for r in rows],
                "r_sum": [r["r_sum"] for r in rows],
                "g_sum": [r["g_sum"] for r in rows],
                "b_sum": [r["b_sum"] for r in rows],
            }
        )


def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full image path through the REAL decoder: synthesize binary
    PPM blobs (one Arrow pass), decode them with `decode_image` — an
    actual netpbm parse of magic/dims/maxval/raw samples, not a length
    stand-in — and emit dims + exact per-channel sums. Hash-oracled: the
    pixel bytes are a pure function of doc_id, so DuckDB recomputes each
    channel sum from the same congruence. At 100 TB the blobs stream
    through the Arrow batches once (encode and decode fuse into one
    Python-worker stage, no exchange) and are never shuffled."""
    d = load_for_compute(spark, sf_dir, "documents")
    blobs = d.select("doc_id").mapInPandas(
        _encode_ppm_batch, schema="doc_id bigint, payload binary"
    )
    return blobs.mapInPandas(_decode_image_batch, schema=IMAGE_SCHEMA)


SCENE_SCHEMA = "doc_id bigint, frame_idx bigint, byte_sum bigint"


def _frame_sums_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-frame byte sums over EVERY 256-byte frame (the gradual signal
    scene detection needs — a hash changes completely on any edit, a
    byte sum moves proportionally). numpy reduces each payload in one
    vectorized pass; a real video stage swaps bytes→luma here."""
    import numpy as np

    frame = 256
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "byte_sum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
            n = -(-data.size // frame)
            for i in range(n):
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(i)
                out["byte_sum"].append(int(data[i * frame : (i + 1) * frame].sum()))
        yield pd.DataFrame(out)


def multimodal_scene_cuts(
    spark: SparkSession, sf_dir: str, threshold: int = 1000
) -> DataFrame:
    """Scene-cut detection — the shot-boundary stage of a video pipeline:
    per-frame features from one Arrow pass over the blobs (read once,
    never shuffled), then a lag window PER DOCUMENT flags frames whose
    feature delta exceeds the threshold, and a per-doc rollup reports
    cut count and first cut. The window shuffles only the skinny
    (doc_id, frame_idx, byte_sum) feature rows — at 100 TB of video the
    payload bytes stay in the feature-extraction stage and the state
    that moves is 24 bytes per frame. All-integer features make the
    oracle exact (DuckDB recomputes the same sums from character
    codes)."""
    from pyspark.sql.window import Window

    d = load_for_compute(spark, sf_dir, "documents")
    payloads = _decodable(with_binary_payload(d).select("doc_id", "payload"))
    frames = payloads.mapInPandas(_frame_sums_batch, schema=SCENE_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    deltas = frames.withColumn("prev_sum", F.lag("byte_sum").over(w)).withColumn(
        "is_cut",
        (
            F.col("prev_sum").isNotNull()
            & (F.abs(F.col("byte_sum") - F.col("prev_sum")) > threshold)
        ).cast("int"),
    )
    return deltas.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("is_cut").cast("long").alias("n_cuts"),
        F.min(F.when(F.col("is_cut") == 1, F.col("frame_idx"))).alias("first_cut_idx"),
    )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan (no payload decode) — the cheap pre-filter pass
    a real pipeline runs first; column pruning keeps payload bytes unread."""
    d = load_table(spark, sf_dir, "documents")
    return with_binary_payload(d).select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.lang").alias("lang"),
        F.col("meta.content_length").alias("content_length"),
    )


RESIZE_SCHEMA = (
    "doc_id bigint, orig_len bigint, resized_len bigint, resized_md5 string"
)


def _fake_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in resize: crop the payload to its first 1024
    bytes (a real image resize keeps the same binary-in/binary-derived-out
    contract; only the PIL call differs — STUB per module docstring)."""
    import hashlib

    target = 1024
    for pdf in batches:
        data = pdf["payload"].map(bytes)
        resized = data.map(lambda b: b[:target])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "orig_len": data.map(len).astype("int64"),
                "resized_len": resized.map(len).astype("int64"),
                "resized_md5": resized.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/transcode stage: binary payload → mapInPandas → new derived
    payload (summarized here by length + md5 so the oracle can check the
    exact bytes without shipping them twice)."""
    d = load_for_compute(spark, sf_dir, "documents")
    payloads = _decodable(with_binary_payload(d).select("doc_id", "payload"))
    return payloads.mapInPandas(_fake_resize_batch, schema=RESIZE_SCHEMA)


PHASH_SCHEMA = "doc_id bigint, phash bigint"


def _phash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in perceptual hash: 64-bit sketch where bit i
    is the parity of the byte-sum over the strided block payload[i::64] —
    a single changed byte flips exactly one bit, so near-identical
    payloads land at small hamming distance (the property a real
    DCT-based pHash provides for re-encoded images; only the
    decode+DCT step differs — STUB per module docstring)."""
    import numpy as np

    for pdf in batches:
        ids: list[int] = []
        hashes: list[int] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            v = 0
            for i in range(64):
                if int(arr[i::64].sum()) & 1:
                    v |= 1 << i
            if v >= 1 << 63:  # two's-complement into int64
                v -= 1 << 64
            ids.append(int(doc_id))
            hashes.append(v)
        yield pd.DataFrame({"doc_id": ids, "phash": pd.array(hashes, dtype="int64")})


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup detection over binary payloads: Arrow-
    batched pHash sketch per blob, then the SAME 4×16-bit hamming-banded
    self-join the text SimHash dedup uses (`hamming_banded_pairs`) —
    candidates are O(band collisions), never all-pairs, and the ≤3-bit
    radius is lossless by pigeonhole. This is the image-dedup shape for a
    100 TB multimodal corpus: sketches are 8 bytes/blob, so the join
    input is ~10⁻⁶ of the payload bytes; the blobs themselves are read
    once in the sketch pass and never shuffled. Fully HASH-ORACLED
    (round-7): the stand-in sketch is a pure function of the payload
    bytes, so the DuckDB oracle recomputes every sketch from the utf-8
    text and re-derives the banded pairs; exact-dup-recall and
    single-byte-perturbation properties in tests/test_llm_ops.py."""
    from ..functions.dedup import hamming_banded_pairs

    d = load_for_compute(spark, sf_dir, "documents")
    payloads = _decodable(with_binary_payload(d).select("doc_id", "payload"))
    sk = payloads.mapInPandas(_phash_batch, schema=PHASH_SCHEMA)
    return hamming_banded_pairs(sk, "phash", max_hamming=3)


QUERIES = {
    "multimodal_scene_cuts": multimodal_scene_cuts,
    "multimodal_image_decode": multimodal_image_decode,
    "multimodal_phash_dedup": multimodal_phash_dedup,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_metadata": multimodal_metadata,
    "multimodal_resize": multimodal_resize,
    "multimodal_audio_energy": multimodal_audio_energy,
    "multimodal_audio_vad": multimodal_audio_vad,
}

ORACLES = {
    "multimodal_audio_vad": AUDIO_VAD_ORACLE,
    # pixel byte i of doc d is (d*31 + i) mod 256 (see _encode_ppm_batch);
    # channel c's samples sit at i = 3p + c for p in [0, 64)
    "multimodal_image_decode": """
        SELECT doc_id,
               CAST(8 AS BIGINT) AS width,
               CAST(8 AS BIGINT) AS height,
               CAST(255 AS BIGINT) AS maxval,
               CAST(list_sum(list_transform(range(0, 64),
                     p -> (doc_id * 31 + 3 * p) % 256)) AS BIGINT) AS r_sum,
               CAST(list_sum(list_transform(range(0, 64),
                     p -> (doc_id * 31 + 3 * p + 1) % 256)) AS BIGINT) AS g_sum,
               CAST(list_sum(list_transform(range(0, 64),
                     p -> (doc_id * 31 + 3 * p + 2) % 256)) AS BIGINT) AS b_sum
        FROM documents
    """,
    # frame byte sums recompute exactly from character codes (ASCII
    # corpus: byte == char, the audio-energy premise); the lag/threshold
    # logic is the identical window in both engines
    "multimodal_scene_cuts": """
        WITH d AS (
            SELECT doc_id, text, LENGTH(text) AS n FROM documents
        ), fr AS (
            SELECT doc_id, text,
                   UNNEST(generate_series(0, (n - 1) // 256)) AS frame_idx
            FROM d WHERE n > 0
        ), sums AS (
            SELECT doc_id, frame_idx,
                   CAST(list_sum(list_transform(
                       regexp_extract_all(
                           substring(text, frame_idx * 256 + 1, 256), '(?s).'),
                       ch -> unicode(ch))) AS BIGINT) AS byte_sum
            FROM fr
        ), deltas AS (
            SELECT doc_id, frame_idx, byte_sum,
                   LAG(byte_sum) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                     AS prev_sum
            FROM sums
        ), cuts AS (
            SELECT doc_id, frame_idx,
                   CASE WHEN prev_sum IS NOT NULL
                             AND ABS(byte_sum - prev_sum) > 1000
                        THEN 1 ELSE 0 END AS is_cut
            FROM deltas
        )
        SELECT doc_id,
               COUNT(*) AS n_frames,
               CAST(SUM(is_cut) AS BIGINT) AS n_cuts,
               MIN(CASE WHEN is_cut = 1 THEN frame_idx END) AS first_cut_idx
        FROM cuts GROUP BY doc_id
    """,
    # payloads are utf-8 of ASCII-only text, so byte codes == character
    # codes and the windowed energy recomputes exactly from substrings.
    # (?s) makes '.' match newlines too — without it a '\\n' in any text
    # would silently shorten the oracle's code list vs Spark's byte
    # windows. Non-ASCII would still break the byte==char premise; the
    # ASCII-ness of the corpus is what the premise comment above states.
    "multimodal_audio_energy": """
        WITH d AS (
            SELECT doc_id, text, LENGTH(text) AS n FROM documents
        ), w AS (
            SELECT doc_id, text,
                   UNNEST(generate_series(0, (n - 1) // 256)) AS win_idx
            FROM d WHERE n > 0
        ), c AS (
            SELECT doc_id, win_idx,
                   list_transform(
                       regexp_extract_all(
                           substring(text, win_idx * 256 + 1, 256), '(?s).'),
                       ch -> unicode(ch) - 128) AS codes
            FROM w
        )
        SELECT doc_id,
               CAST(win_idx AS BIGINT) AS win_idx,
               CAST(len(codes) AS BIGINT) AS n_samples,
               CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT)
                 AS sum_sq,
               CAST(list_max(list_transform(codes, x -> ABS(x))) AS BIGINT)
                 AS peak
        FROM c
    """,
    "multimodal_resize": """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS orig_len,
               CAST(LEAST(length(text), 1024) AS BIGINT) AS resized_len,
               md5(substring(text, 1, 1024)) AS resized_md5
        FROM documents
    """,
    "multimodal_features": """
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
               CAST(CEIL(octet_length(CAST(text AS BLOB)) / 256.0) AS BIGINT)
                 AS n_chunks,
               SUBSTRING(LOWER(HEX(CAST(text AS BLOB))), 1, 8) AS header_hex
        FROM documents
    """,
    # payloads are utf-8 of ASCII-only text (verified), so character
    # chunking equals byte chunking and md5(varchar) hashes the same bytes
    "multimodal_frame_sample": """
        WITH fr AS (
            SELECT doc_id, text,
                   CAST(CEIL(length(text) / 256.0) AS BIGINT) AS n_frames
            FROM documents
        ),
        ex AS (
            SELECT doc_id, text, UNNEST(range(0, n_frames, 4)) AS frame_idx
            FROM fr
        )
        SELECT doc_id, frame_idx,
               CAST(length(substring(text, CAST(frame_idx * 256 + 1 AS BIGINT), 256))
                 AS BIGINT) AS frame_len,
               md5(substring(text, CAST(frame_idx * 256 + 1 AS BIGINT), 256))
                 AS frame_hash
        FROM ex
    """,
    "multimodal_metadata": """
        SELECT doc_id,
               'text/plain' AS mime,
               lang,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS content_length
        FROM documents
    """,
}

# Round-7 upgrade: the stand-in pHash is a pure function of the payload
# bytes (strided byte-sum parities), so DuckDB can recompute every
# sketch from the utf-8 text and re-derive the banded-hamming pairs —
# the last multimodal rows-only entry becomes a full hash oracle. Byte
# extraction parses hex(encode(text)) two chars at a time; band keys
# are rebuilt from the parities directly (no signed-shift pitfalls);
# two's-complement bit 63 maps to the int64 minimum. Every CTE is
# MATERIALIZED (DuckDB inlines by default; the bands CTE is referenced
# twice).
ORACLES["multimodal_phash_dedup"] = """
    WITH docs AS MATERIALIZED (
        SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        FROM documents WHERE text IS NOT NULL
    ), bytes AS MATERIALIZED (
        SELECT doc_id, p,
               strpos('0123456789ABCDEF', substr(h, 2 * p + 1, 1)) * 16
             + strpos('0123456789ABCDEF', substr(h, 2 * p + 2, 1)) - 17 AS byte
        FROM (SELECT doc_id, h, unnest(range(0, n)) AS p FROM docs)
    ), parities AS MATERIALIZED (
        SELECT doc_id, p % 64 AS bit, SUM(byte) % 2 AS par
        FROM bytes GROUP BY doc_id, p % 64
    ), sk AS MATERIALIZED (
        SELECT d.doc_id,
               COALESCE(SUM(CASE WHEN s.par = 1 THEN
                   CASE WHEN s.bit = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                        ELSE (CAST(1 AS BIGINT) << CAST(s.bit AS INT)) END
                   ELSE 0 END), 0) AS phash
        FROM docs d LEFT JOIN parities s ON d.doc_id = s.doc_id
        GROUP BY d.doc_id
    ), bandkeys AS MATERIALIZED (
        SELECT d.doc_id, b.band,
               COALESCE(SUM(CASE WHEN s.par = 1
                   THEN (CAST(1 AS BIGINT) << CAST(s.bit % 16 AS INT))
                   ELSE 0 END), 0) AS key
        FROM docs d
        CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b
        LEFT JOIN parities s
               ON d.doc_id = s.doc_id AND s.bit // 16 = b.band
        GROUP BY d.doc_id, b.band
    ), cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bandkeys a JOIN bandkeys b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           bit_count(xor(sa.phash, sb.phash)) AS hamming
    FROM cand c
    JOIN sk sa ON sa.doc_id = c.id_a
    JOIN sk sb ON sb.doc_id = c.id_b
    WHERE bit_count(xor(sa.phash, sb.phash)) <= 3
"""
