"""Multimodal (opaque-binary) column plumbing for training-data pipelines.

Image/audio/video payloads are carried as `binary` columns plus typed
metadata, and decode / feature-extraction runs as Arrow-batched mapInPandas
kernels — the Spark-side plumbing (schema, batch shape, partitioning) is
real and tested; the codec itself is STUBBED because no image/audio
libraries exist in this container:

  * `decode_media` uses DETERMINISTIC FAKE decode properties derived from
    md5(payload) — portable, so the whole pipeline is oracle-checkable.
  * `decode_media_real` is the integration point for a real codec (PIL
    etc.); it raises NotImplementedError unless the library import
    succeeds, exactly as the task brief asks.

No counterpart exists in the reference: binary columns are outside its type
matrix entirely (README.md:41 lists boolean/long/double/string/timestamp/
json only); this is new surface mandated by the task brief.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), nullable=False),
    T.StructField("kind", T.StringType(), nullable=False),     # image|audio|video
    T.StructField("payload", T.BinaryType(), nullable=True),   # opaque bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), nullable=True),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])

_KINDS = ["image", "audio", "video"]


def media_from_docs(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from a text table: payload is the
    utf-8 bytes of the text (an opaque stand-in), kind round-robins by id.
    Keeps the multimodal pipeline runnable on the driver's parquet tables."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.pmod(F.col(id_col), F.lit(len(_KINDS))) + F.lit(1)).cast("int"),
    )
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("origin"), F.lit("synthetic")).alias("meta"),
    )


def _fake_props(payload: bytes) -> tuple[int, int, int]:
    """STUB decode: width/height/frame-count derived from md5(payload).
    Deterministic and portable (the DuckDB oracle recomputes the same
    values from md5(text)); replace with a real codec via decode_media_real."""
    h = hashlib.md5(payload).hexdigest()
    width = 16 + int(h[0:4], 16) % 2032
    height = 16 + int(h[4:8], 16) % 2032
    n_frames = 1 + int(h[8:10], 16) % 64
    return width, height, n_frames


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads. The batch
    shape, output schema and null handling are the production plumbing; only
    `_fake_props` is a stand-in for the codec. Null payloads yield null
    dimensions (decode failure semantics)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            props = [(None, None, None) if p is None else _fake_props(bytes(p))
                     for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pd.array(
                    [None if p is None else len(bytes(p)) for p in pdf["payload"]],
                    dtype="Int64"),
                "width": pd.array([p[0] for p in props], dtype="Int32"),
                "height": pd.array([p[1] for p in props], dtype="Int32"),
                "n_frames": pd.array([p[2] for p in props], dtype="Int32"),
            })

    return media.select("media_id", "kind", "payload").mapInPandas(gen, DECODED_SCHEMA)


def _parse_png(b: bytes):
    """PNG IHDR header: width/height as big-endian uint32 at bytes 16-24
    (the first chunk after the 8-byte signature is IHDR by spec)."""
    import struct

    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return w, h, 1


def _parse_gif(b: bytes):
    """GIF logical-screen descriptor: width/height little-endian uint16 at
    bytes 6-10. Frame count is reported as 1 (presence): a correct count
    requires walking the block structure (0x2C bytes also occur in
    dimension fields and palette entries, so counting separators is wrong
    for most real GIFs). When Pillow is present it runs BEFORE this
    parser (see _real_props) and reports true n_frames."""
    import struct

    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return w, h, 1


def _parse_wav(b: bytes):
    """RIFF/WAVE via the stdlib wave module: (channels, bits-per-sample,
    frame count) mapped onto the (width, height, n_frames) envelope."""
    import io
    import wave

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(b)) as w:
            return w.getnchannels(), w.getsampwidth() * 8, w.getnframes()
    except Exception:
        return None


# Pillow resolved ONCE at import: a per-row failed `from PIL import ...`
# inside the Arrow hot loop would pay full import machinery (sys.path
# probing) for every non-PNG/WAV payload when the library is absent.
try:  # pragma: no cover - Pillow absent in the CI container
    from PIL import Image as _PIL_IMAGE
except Exception:
    _PIL_IMAGE = None


def _parse_pillow(b: bytes):  # pragma: no cover - Pillow absent in CI
    if _PIL_IMAGE is None:
        return None
    try:
        import io

        with _PIL_IMAGE.open(io.BytesIO(b)) as img:
            return img.width, img.height, getattr(img, "n_frames", 1)
    except Exception:
        return None


# Parser order resolved once: with Pillow present it goes FIRST for image
# formats — the stdlib PNG/GIF header parses are exact for dims but report
# n_frames=1 for animated containers (APNG, multi-frame GIF), which Pillow
# counts truly. WAV stays stdlib either way (Pillow is image-only). Without
# Pillow the dependency-free header parsers are the whole image path.
_PARSERS = ((_parse_wav, _parse_pillow, _parse_png, _parse_gif)
            if _PIL_IMAGE is not None
            else (_parse_png, _parse_wav, _parse_gif))


def _real_props(b: bytes):
    """Real decode: Pillow first for images when present (true dims AND
    frame counts for APNG, GIF, JPEG, BMP, ...), dependency-free stdlib
    parsers otherwise (PNG/GIF headers: exact dims, frame count capped to
    presence; RIFF/WAVE via wave). Returns None for undecodable payloads —
    the caller maps that to null dimensions (decode-failure semantics),
    matching decode_media's null handling."""
    for parser in _PARSERS:
        out = parser(b)
        if out is not None:
            # DECODED_SCHEMA carries Int32 fields; a legal-but-degenerate
            # container (e.g. a >2 GiB mono 8-bit WAV whose uint32 sizes
            # imply > 2^31-1 frames) must degrade to null dims like any
            # other undecodable payload — never raise inside the Arrow
            # batch (quarantine-not-crash)
            if any(v is None or v < 0 or v > 0x7FFFFFFF for v in out):
                return None
            return out
    return None


def decode_media_real(media: DataFrame) -> DataFrame:
    """Real-codec decode: same Arrow batch shape, output schema and null
    handling as decode_media, but `_real_props` extracts TRUE properties
    from the payload bytes (PNG/GIF/WAV header parsers run dependency-free;
    other formats need Pillow). Payloads no parser understands decode to
    null dimensions rather than failing the batch — at 100 TB a corrupt
    blob must quarantine, not kill the job. The deterministic stub
    (decode_media) remains the oracle path: real payload bytes are not
    reproducible from the driver's parquet fixtures."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            props = [None if p is None else _real_props(bytes(p))
                     for p in pdf["payload"]]
            props = [(None, None, None) if p is None else p for p in props]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pd.array(
                    [None if p is None else len(bytes(p)) for p in pdf["payload"]],
                    dtype="Int64"),
                "width": pd.array([p[0] for p in props], dtype="Int32"),
                "height": pd.array([p[1] for p in props], dtype="Int32"),
                "n_frames": pd.array([p[2] for p in props], dtype="Int32"),
            })

    return media.select("media_id", "kind", "payload").mapInPandas(gen, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("out_w", T.IntegerType()),
    T.StructField("out_h", T.IntegerType()),
    T.StructField("resized_md5", T.StringType()),
])


def _resize_dims(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Fit-within-box resize in pure integer arithmetic (portable: the
    DuckDB oracle recomputes the identical dims with // division).
    Aspect ratio is preserved up to integer floor; never upscales."""
    mx = max(w, h)
    if mx <= max_dim:
        return w, h
    return max(1, (w * max_dim) // mx), max(1, (h * max_dim) // mx)


def resize_media(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Image-resize kernel: decode props + resample in ONE Arrow-batched
    mapInPandas pass over image rows (fusing decode and resize avoids a
    second binary-payload scan — at 100 TB the payload bytes dominate IO,
    so every kernel that re-reads them is a full-table cost).

    The resample itself is STUBBED deterministically (like `_fake_props`):
    the "resized payload" is md5(payload + b":{out_w}x{out_h}"), reported
    as `resized_md5` so the DuckDB oracle can recompute it. A real codec
    drops into the same loop (PIL `Image.resize` over `payload`)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, kinds, ws, hs, ows, ohs, digests = [], [], [], [], [], [], []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if p is None:
                    continue  # decode failure: no resized output row
                payload = bytes(p)
                w, h, _ = _fake_props(payload)
                ow, oh = _resize_dims(w, h, max_dim)
                mids.append(mid)
                kinds.append(kind)
                ws.append(w)
                hs.append(h)
                ows.append(ow)
                ohs.append(oh)
                digests.append(
                    hashlib.md5(payload + f":{ow}x{oh}".encode()).hexdigest())
            yield pd.DataFrame({
                "media_id": pd.array(mids, dtype="Int64"),
                "kind": pd.array(kinds, dtype="object"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "out_w": pd.array(ows, dtype="Int32"),
                "out_h": pd.array(ohs, dtype="Int32"),
                "resized_md5": pd.array(digests, dtype="object"),
            })

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "kind", "payload")
        .mapInPandas(gen, RESIZED_SCHEMA)
    )


def frame_sample(decoded: DataFrame, every: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled frame
    index — pure JVM explode over the frame range (the decode of each frame
    would be another mapInPandas kernel downstream)."""
    return (
        decoded.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
        )
    )


EMBED_DIM = 8

EMBED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("emb", T.ArrayType(T.IntegerType())),
])


def _fake_embed(payload: bytes, dim: int) -> list[int]:
    """STUB encoder: a dim-wide signature vector from md5(payload) — one
    byte (0..255) per component. Deterministic and portable (the DuckDB
    oracle recomputes it from md5(text)); the real integration point
    (CLIP/wav2vec/...) replaces exactly this function, the Arrow batch
    plumbing around it is production-real."""
    h = hashlib.md5(payload).hexdigest()
    return [int(h[2 * i:2 * i + 2], 16) for i in range(dim)]


def embed_media(media: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Feature extraction over binary payloads — the embed leg of the
    multimodal pipeline (decode -> features -> ANN/dedup downstream).
    Arrow-batched mapInPandas like decode_media; NULL payloads yield NULL
    vectors (encoder-failure semantics). The output array feeds the
    similarity operators (ann_*/emb_neardup) unchanged."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "emb": [None if p is None else _fake_embed(bytes(p), dim)
                        for p in pdf["payload"]],
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, EMBED_SCHEMA)
