"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, partition-friendly batch shapes,
Arrow-batched mapInPandas UDF signatures — is real and tested, and so is
the default decode path for the formats the standard library can decode:

* image: a from-scratch PNG decoder (zlib + struct + numpy — the mirror
  of plans/render.py's from-scratch PNG encoder): 8-bit gray / gray+alpha
  / RGB / RGBA, non-interlaced, all five scanline filters. When PIL is
  importable it is preferred (covers JPEG etc.) — the same
  optional-backend pattern as sources/granule.py's xarray fallback.
* audio: WAV/PCM via the stdlib ``wave`` module (8/16-bit).
* video: no stdlib container/codec exists, so features come from the raw
  payload byte distribution (documented — NOT a frame decode; plug a real
  codec into ``decode_video`` when the environment has one).

``fake=True`` keeps the old md5-seeded pseudo-decode for plumbing tests.

At 100 TB: binary payloads ride in parquet alongside metadata; decode/
feature-extract is a mapInPandas pass (Arrow batches, no JVM<->Python
per-row cost); frame sampling happens before feature extraction to bound
memory per batch.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("payload", BinaryType(), True),       # opaque encoded bytes
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("payload_len", LongType(), True),
    StructField("feat_mean", DoubleType(), True),
    StructField("feat_std", DoubleType(), True),
    StructField("feat_dim", IntegerType(), True),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture (text bytes stand in
    for an encoded payload) — gives the binary-column plumbing a real
    DataFrame to run against."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
         .when(F.col("doc_id") % 3 == 1, "audio")
         .otherwise("video").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _make_encoders():
    """Real PNG/WAV encoders (zlib/struct/wave only) + the deterministic
    doc_id->media generators. Nested for the same pickle-by-value reason
    as _make_decoders. The generator FORMULAS are a shared contract with
    the SQL oracle in __spark_entry__ (closed-form pixel/sample values),
    so the whole encode->decode->feature pipeline is cross-checkable:
      image (doc_id%3==0): w=4+(d//3)%5, h=4+(d//3)%4, RGB;
                           flat pixel i = (d + 13*i) % 256
      audio (doc_id%3==1): n=64+d%32 samples, 16-bit PCM mono 8kHz;
                           sample i = (31*d + 17*i) % 2001 - 1000
      video (doc_id%3==2): len=128+d%64 raw bytes; byte i = (3*d+7*i)%256
    """
    import io as _io
    import struct as _struct
    import wave as _wave
    import zlib as _zlib

    import numpy as _np

    def _chunk(tag, data):
        return (_struct.pack(">I", len(data)) + tag + data
                + _struct.pack(">I", _zlib.crc32(tag + data) & 0xFFFFFFFF))

    def encode_png(arr):
        """(H, W, C) uint8 -> PNG bytes; C in {1,2,3,4}; filter 0 rows."""
        h, w, c = arr.shape
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
        return (b"\x89PNG\r\n\x1a\n"
                + _chunk(b"IHDR",
                         _struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
                + _chunk(b"IDAT", _zlib.compress(raw, 9))
                + _chunk(b"IEND", b""))

    def encode_wav(samples_i16, framerate=8000):
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(framerate)
            wf.writeframes(_np.asarray(samples_i16,
                                       dtype="<i2").tobytes())
        return buf.getvalue()

    def gen_media(d):
        """doc_id -> (media_type, payload, width, height, duration_ms)."""
        m = d % 3
        if m == 0:
            w, h = 4 + (d // 3) % 5, 4 + (d // 3) % 4
            i = _np.arange(w * h * 3, dtype=_np.int64)
            px = ((d + 13 * i) % 256).astype(_np.uint8).reshape(h, w, 3)
            return "image", encode_png(px), w, h, None
        if m == 1:
            n = 64 + d % 32
            i = _np.arange(n, dtype=_np.int64)
            s = (31 * d + 17 * i) % 2001 - 1000
            return "audio", encode_wav(s), None, None, (n * 1000) // 8000
        n = 128 + d % 64
        i = _np.arange(n, dtype=_np.int64)
        return ("video", ((3 * d + 7 * i) % 256).astype(_np.uint8)
                .tobytes(), None, None, n)

    return encode_png, encode_wav, gen_media


encode_png, encode_wav, _gen_media = _make_encoders()


def synthetic_media(docs: DataFrame) -> DataFrame:
    """Media table with REAL encoded payloads (PNG / WAV / raw bytes)
    deterministically derived from doc_id — see _make_encoders for the
    closed-form pixel/sample formulas the oracle recomputes. Built
    distributed (mapInPandas over the documents scan): at corpus scale
    each task encodes only its own batch."""
    _, _, gen = _make_encoders()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "media_type": [], "payload": [],
                    "width": [], "height": [], "duration_ms": []}
            for d in pdf["doc_id"]:
                mtype, payload, w, h, dur = gen(int(d))
                rows["media_id"].append(int(d))
                rows["media_type"].append(mtype)
                rows["payload"].append(payload)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_ms"].append(dur)
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(run, schema=MEDIA_SCHEMA)


def _make_decoders():
    """Factory for the pure decode functions. Nested (not module-level)
    definitions so cloudpickle serializes them BY VALUE into mapInPandas
    closures — Python workers unpickle them without this package on their
    sys.path (the same self-containment contract the old stub kept)."""
    import io as _io
    import struct as _struct
    import wave as _wave
    import zlib as _zlib

    import numpy as _np

    def _unfilter(f, line, prev, bpp):
        """Undo one PNG scanline filter (spec §6: None/Sub/Up/Average/
        Paeth). Up is vectorized; Sub/Average/Paeth carry a left-neighbor
        recurrence, hence the byte loop."""
        if f == 0:
            return line.astype(_np.uint8)
        if f == 2:
            return ((line.astype(_np.int32) + prev.astype(_np.int32))
                    & 0xFF).astype(_np.uint8)
        cur = line.astype(_np.int32)
        pr = prev.astype(_np.int32)
        out = _np.zeros_like(cur)
        for i in range(len(cur)):
            a = int(out[i - bpp]) if i >= bpp else 0
            b = int(pr[i])
            if f == 1:
                v = cur[i] + a
            elif f == 3:
                v = cur[i] + (a + b) // 2
            elif f == 4:
                c = int(pr[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                         else c)
                v = cur[i] + pred
            else:
                raise ValueError(f"bad PNG filter type {f}")
            out[i] = v & 0xFF
        return out.astype(_np.uint8)

    def decode_png(payload):
        """From-scratch PNG decode (public spec, zlib+struct only): 8-bit
        gray / gray+alpha / RGB / RGBA, non-interlaced, all five scanline
        filters. Returns an (H, W, C) uint8 array."""
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG payload")
        pos, idat = 8, b""
        w = h = channels = None
        while pos + 8 <= len(payload):
            (length,) = _struct.unpack(">I", payload[pos:pos + 4])
            tag = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                w, h, depth, ctype, _comp, _filt, interlace = \
                    _struct.unpack(">IIBBBBB", data)
                if depth != 8:
                    raise NotImplementedError(f"PNG bit depth {depth}")
                if interlace != 0:
                    raise NotImplementedError("interlaced PNG")
                channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
                if channels is None:
                    raise NotImplementedError(f"PNG color type {ctype}")
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
        if w is None:
            raise ValueError("PNG missing IHDR")
        raw = _zlib.decompress(idat)
        stride = w * channels
        out = _np.empty((h, stride), dtype=_np.uint8)
        prev = _np.zeros(stride, dtype=_np.uint8)
        p = 0
        for y in range(h):
            f = raw[p]
            p += 1
            line = _np.frombuffer(raw, dtype=_np.uint8, count=stride,
                                  offset=p)
            p += stride
            prev = _unfilter(f, line, prev, channels)
            out[y] = prev
        return out.reshape(h, w, channels)

    def decode_wav(payload):
        """WAV/PCM decode via the stdlib wave module. Returns float64
        samples scaled to [-1, 1) (16-bit: /32768; 8-bit: (v-128)/128)."""
        with _wave.open(_io.BytesIO(payload)) as wf:
            sw = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
        if sw == 2:
            return _np.frombuffer(frames, dtype="<i2").astype(
                _np.float64) / 32768.0
        if sw == 1:
            return (_np.frombuffer(frames, dtype=_np.uint8).astype(
                _np.float64) - 128.0) / 128.0
        raise NotImplementedError(f"{sw * 8}-bit WAV")

    return decode_png, decode_wav


decode_png, decode_wav = _make_decoders()


def decode_image(payload: bytes, *, fake: bool = False) -> list[float]:
    """Decode an encoded image payload to a flat [0,1] float vector.

    Backend order (the granule.py optional-import pattern): PIL when
    importable (JPEG & friends), else the from-scratch PNG decoder for
    PNG payloads; other formats raise NotImplementedError. fake=True
    keeps the old deterministic md5-seeded pseudo-decode for plumbing
    tests."""
    if fake:
        digest = hashlib.md5(payload or b"").digest()
        return [b / 255.0 for b in digest]
    try:
        from PIL import Image  # pragma: no cover - not in this container

        arr = np.asarray(Image.open(io.BytesIO(payload)))
        return (arr.astype(np.float64) / 255.0).ravel().tolist()
    except ImportError:
        pass
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return (decode_png(payload).astype(np.float64) / 255.0) \
            .ravel().tolist()
    raise NotImplementedError(
        "no codec for this image format in this environment (stdlib "
        "decodes PNG only; install PIL for JPEG etc.)")


def extract_features(media: DataFrame, *,
                     fake_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    mapInPandas: each Arrow batch is decoded in Python; output is a
    narrow typed frame. Per media_type:
      * image — PNG decode (stdlib from-scratch decoder; PIL when
        importable), features over pixels/255
      * audio — WAV/PCM decode, features over [-1,1) samples
      * video — features over the raw payload BYTE distribution (no
        stdlib video codec exists; documented fallback, not a frame
        decode)
    fake_decode=True restores the old md5-seeded pseudo-decode.
    """
    fake = fake_decode
    png, wav_ = _make_decoders()  # nested fns -> pickled by value

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as np_

        def _vals(mtype, payload):
            if fake:
                digest = _hashlib.md5(payload or b"").digest()
                return np_.array([b / 255.0 for b in digest])
            if mtype == "image":
                try:
                    from PIL import Image  # pragma: no cover
                    import io as _io2

                    arr = np_.asarray(Image.open(_io2.BytesIO(payload)))
                except ImportError:
                    arr = png(payload)
                return arr.astype(np_.float64).ravel() / 255.0
            if mtype == "audio":
                return wav_(payload)
            return np_.frombuffer(payload, dtype=np_.uint8).astype(
                np_.float64) / 255.0

        for pdf in batches:
            out = {"media_id": [], "media_type": [], "payload_len": [],
                   "feat_mean": [], "feat_std": [], "feat_dim": []}
            for mid, mtype, payload in zip(pdf["media_id"],
                                           pdf["media_type"],
                                           pdf["payload"]):
                v = _vals(mtype, payload)
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["payload_len"].append(
                    len(payload) if payload is not None else None)
                out["feat_mean"].append(float(v.mean()))
                out["feat_std"].append(float(v.std()))
                out["feat_dim"].append(int(v.size))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real image resize over the media table: decode PNG payloads,
    nearest-neighbor resample to (out_h, out_w), re-encode. Non-image
    rows pass through untouched.

    Resampling contract (shared with the SQL oracle): output pixel
    (i, j) = input pixel (i*h // out_h, j*w // out_w) — pure integer
    floor mapping, so a closed-form source image stays closed-form after
    resizing. Arrow-batched mapInPandas; decode+resize+encode are numpy
    on the executor, nothing row-at-a-time.
    """
    png_decode, _ = _make_decoders()
    png_encode, _, _ = _make_encoders()
    ow, oh = int(out_w), int(out_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np_

        for pdf in batches:
            payloads, widths, heights = [], [], []
            for mtype, payload, w0, h0 in zip(
                    pdf["media_type"], pdf["payload"], pdf["width"],
                    pdf["height"]):
                if mtype != "image" or payload is None:
                    payloads.append(payload)
                    widths.append(w0)
                    heights.append(h0)
                    continue
                arr = png_decode(bytes(payload))
                h, w = arr.shape[:2]
                ys = (np_.arange(oh) * h) // oh
                xs = (np_.arange(ow) * w) // ow
                out = arr[ys][:, xs]
                payloads.append(png_encode(out))
                widths.append(ow)
                heights.append(oh)
            out_pdf = pdf.copy()
            out_pdf["payload"] = payloads
            out_pdf["width"] = pd.array(widths, dtype="Int32")
            out_pdf["height"] = pd.array(heights, dtype="Int32")
            yield out_pdf

    return media.mapInPandas(run, MEDIA_SCHEMA)


def resample_audio(media: DataFrame, out_n: int,
                   framerate: int = 8000) -> DataFrame:
    """Audio-side twin of resize_images: decode WAV payloads, resample
    to exactly `out_n` samples by nearest-index pick
    (out[i] = in[i*n // out_n] — the same integer-floor contract, so
    closed-form sources stay closed-form), re-encode 16-bit PCM.
    Non-audio rows pass through untouched."""
    _, wav_decode = _make_decoders()
    _, wav_encode, _ = _make_encoders()
    on = int(out_n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np_

        for pdf in batches:
            payloads, durs = [], []
            for mtype, payload, dur in zip(pdf["media_type"],
                                           pdf["payload"],
                                           pdf["duration_ms"]):
                if mtype != "audio" or payload is None:
                    payloads.append(payload)
                    durs.append(dur)
                    continue
                s = wav_decode(bytes(payload))
                idx = (np_.arange(on) * len(s)) // on
                out = np_.clip(np_.round(s[idx] * 32768.0), -32768,
                               32767).astype("<i2")
                payloads.append(wav_encode(out, framerate))
                durs.append((on * 1000) // framerate)
            out_pdf = pdf.copy()
            out_pdf["payload"] = payloads
            out_pdf["duration_ms"] = pd.array(durs, dtype="Int64")
            yield out_pdf

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    offset (the decode of the actual frame is the stub). Pure relational
    explode — the frame-offset fan-out happens in the engine, so a video's
    frames parallelize across tasks."""
    with_duration = media.withColumn(
        "dur", F.coalesce(F.col("duration_ms"),
                          F.length("payload").cast("long")))
    return (
        with_duration
        .withColumn("frame_ms", F.explode(
            F.sequence(F.lit(0), F.col("dur") - 1, F.lit(every_ms))))
        .select("media_id", "media_type", "frame_ms")
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata projection incl. content digest — pure JVM columns
    (sha2 over binary), no decode needed. Oracle-able."""
    return media.select(
        "media_id", "media_type",
        F.length("payload").cast("long").alias("payload_len"),
        F.sha2(F.col("payload"), 256).alias("digest"),
        (F.ceil(F.length("payload") / F.lit(256.0))).cast("long").alias("n_chunks"),
    )
