"""Multimodal columns: binary media payloads with typed metadata.

Design (the part that must be right at 100 TB):

- media are **opaque binary columns** + a typed metadata struct — never
  driver-side bytes, never Python round trips per row.
- decode / feature-extract / resize / frame-sample run as **Arrow-batched
  ``mapInPandas``**: the schema, batch shape, partitioning, and UDF
  signatures here are real and tested; only the codec call itself is
  stubbed (no image/audio libs in this container) behind
  ``decoder="fake"`` (deterministic header parse, used by tests) or
  ``decoder="pil"``-style hooks that raise ``NotImplementedError`` until a
  real library is wired in.
- batch size is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — large payloads want a small cap (e.g. 64) so a batch of 100 MB videos
  doesn't OOM an executor; set it before calling these.

Fake payload format (for tests and plumbing verification):
``b"FAKE" + width:4 bytes BE + height:4 BE + channels:1 + raw``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def make_fake_payload(width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake media payload (see module docstring)."""
    body = bytes((width * 31 + height * 7 + i) % 256 for i in range(min(width * height, 256)))
    return (
        b"FAKE"
        + width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([channels])
        + body
    )


def _parse_fake(payload: bytes) -> tuple[int, int, int]:
    if payload is None or len(payload) < 13 or payload[:4] != b"FAKE":
        raise ValueError("not a FAKE payload")
    return (
        int.from_bytes(payload[4:8], "big"),
        int.from_bytes(payload[8:12], "big"),
        payload[12],
    )


def decode_media_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """Attach a typed ``meta`` struct decoded from the binary payload.

    ``mapInPandas`` — Arrow batches of (id cols + payload) in, same rows +
    ``meta`` struct out; executors never ship bytes to the driver. The
    ``fake`` decoder parses the FAKE header; ``decoder="pil"`` decodes
    real image bytes via Pillow behind the SAME signature/schema (gated on
    the import — environments without Pillow get NotImplementedError, and
    the pil smoke test skips itself).
    """
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "decoder 'pil' requires Pillow on driver and workers; "
                "use decoder='fake' for codec-free plumbing tests"
            ) from exc
    elif decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r}: supported decoders are 'fake' (header "
            "parse, codec-free) and 'pil' (real image decode, needs Pillow)"
        )
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField("meta", MEDIA_META_SCHEMA)])

    # nested copy of the header parser: the closure must be SELF-CONTAINED
    # so cloudpickle ships it by value — a module-global reference would
    # require this package to be importable on every Python worker, which
    # fails when the contract is loaded by file path from a foreign cwd
    def parse_fake(payload: bytes) -> tuple[int, int, int]:
        if payload is None or len(payload) < 13 or payload[:4] != b"FAKE":
            raise ValueError("not a FAKE payload")
        return (
            int.from_bytes(payload[4:8], "big"),
            int.from_bytes(payload[8:12], "big"),
            payload[12],
        )

    def parse_pil(payload: bytes) -> dict:
        import io

        from PIL import Image  # worker-side import, gated at plan time

        img = Image.open(io.BytesIO(payload))
        return {
            "media_type": "image",
            "width": img.width,
            "height": img.height,
            "channels": len(img.getbands()),
            "n_bytes": len(payload),
            "format": (img.format or "unknown").lower(),
        }

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload in pdf[payload_col]:
                try:
                    if decoder == "pil":
                        metas.append(parse_pil(bytes(payload)))
                    else:
                        w, h, c = parse_fake(bytes(payload))
                        metas.append(
                            {
                                "media_type": "image",
                                "width": w,
                                "height": h,
                                "channels": c,
                                "n_bytes": len(payload),
                                "format": "fake",
                            }
                        )
                except Exception:  # noqa: BLE001 - undecodable payload row
                    metas.append(
                        {
                            "media_type": "unknown",
                            "width": None,
                            "height": None,
                            "channels": None,
                            "n_bytes": len(payload) if payload is not None else None,
                            "format": None,
                        }
                    )
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    dim: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """Media → feature vector (array<float>), Arrow-batched.

    Fake path: deterministic byte-histogram features so downstream ANN /
    dedup plumbing can run end-to-end. A real model swaps in behind the
    same ``mapInPandas`` contract (load model once per worker in the
    generator body, batch through it).
    """
    if decoder != "fake":
        raise NotImplementedError("real feature extractors not available here")
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a real extractor would lazily load its model HERE, once per worker
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                b = bytes(payload) if payload is not None else b""
                hist = [0.0] * dim
                for byte in b:
                    hist[byte % dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(featurize, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 10,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video → sampled frame rows (plumbing: one input row fans out to
    ceil(n_frames / every_n) rows). Fake decoder treats each 16-byte body
    chunk as a 'frame'."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    stride = 16 * every_n

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # column-wise zip, not iterrows: no per-row pandas Series
        # construction, and only the SAMPLED frames are sliced (offsets
        # jump straight to every_n-th frame instead of materializing all
        # 16-byte chunks first). A real decoder needs its per-payload
        # loop; this fake path stays proportional to output size.
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                body = b[13:] if b[:4] == b"FAKE" else b
                for off in range(0, len(body), stride):
                    out_ids.append(doc)
                    out_idx.append(off // 16)
                    out_frames.append(body[off : off + 16])
            yield pd.DataFrame(
                {id_col: out_ids, "frame_index": out_idx, "frame": out_frames}
            )

    return df.select(id_col, payload_col).mapInPandas(sample, schema=out_schema)


def resize_media(
    df: DataFrame,
    target_width: int,
    target_height: int,
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """Resize media payloads in place (same column name, new bytes),
    Arrow-batched.

    The fake path rewrites the FAKE header to the target dimensions and
    nearest-neighbor-samples the body to ``min(target pixels, body len)``
    bytes — deterministic, so tests can assert exact output. A real
    implementation (PIL/libvips) swaps in behind the same signature; the
    batch-size note in the module docstring matters most here, since input
    AND output payloads coexist in one Arrow batch.
    """
    if decoder != "fake":
        raise NotImplementedError("real codecs not available here")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                b = bytes(payload) if payload is not None else None
                if b is None or len(b) < 13 or b[:4] != b"FAKE":
                    out.append(b)  # pass through undecodable payloads
                    continue
                channels = b[12]
                body = b[13:]
                n_out = min(target_width * target_height, len(body))
                if n_out and len(body):
                    # nearest-neighbor index mapping, exact integer math
                    sampled = bytes(
                        body[(i * len(body)) // n_out] for i in range(n_out)
                    )
                else:
                    sampled = b""
                out.append(
                    b"FAKE"
                    + target_width.to_bytes(4, "big")
                    + target_height.to_bytes(4, "big")
                    + bytes([channels])
                    + sampled
                )
            pdf = pdf.copy()
            pdf[payload_col] = out
            yield pdf

    return df.mapInPandas(resize, schema=df.schema)


def with_media_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata helper: synthesize a binary media column from text so the
    multimodal plumbing can run against the documents table."""
    return df.withColumn(
        "payload",
        F.concat(
            F.lit(b"FAKE"),
            # width = n_chars % 256 packed big-endian in 4 bytes
            F.unhex(F.lpad(F.hex(F.length(text_col) % 256), 8, "0")),
            F.unhex(F.lpad(F.hex(F.lit(32)), 8, "0")),
            F.unhex(F.lit("03")),
            F.encode(F.col(text_col), "UTF-8"),
        ),
    )


def extract_features_arrow(
    df: DataFrame,
    payload_col: str = "payload",
    dim: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """`extract_features`' ``mapInArrow`` twin — bit-identical output,
    zero pandas materialization: batches arrive as raw Arrow
    RecordBatches and the byte histograms are computed with ONE segmented
    ``np.bincount`` over the binary column's value buffer (byte%dim +
    row·dim composite keys), so there is no per-row Python at all. The
    shape a real fleet uses when payload batches are large enough that
    even the pandas conversion overhead matters.
    """
    if decoder != "fake":
        raise NotImplementedError("real feature extractors not available here")
    import numpy as np
    import pyarrow as pa

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def featurize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            col = batch.column(batch.schema.get_field_index(payload_col))
            # normalize to large_binary for a single (offsets, data) view
            arr = pa.chunked_array([col]).combine_chunks().cast(pa.large_binary())
            offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + n + 1
            ]
            data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
            lengths = np.diff(offsets)
            if arr.null_count:
                valid = np.asarray(arr.is_valid())
                lengths = np.where(valid, lengths, 0)
            row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lengths)
            byte_vals = np.concatenate(
                [
                    data[offsets[i] : offsets[i] + lengths[i]]
                    for i in range(n)
                ]
            ) if arr.null_count else data[offsets[0] : offsets[-1]]
            keys = row_of_byte * dim + (byte_vals.astype(np.int64) % dim)
            hist = np.bincount(keys, minlength=n * dim).reshape(n, dim)
            totals = hist.sum(axis=1, keepdims=True).astype(np.float64)
            totals[totals == 0.0] = 1.0
            feats = (hist.astype(np.float64) / totals).astype(np.float32)
            feat_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
                pa.array(feats.reshape(-1)),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)] + [feat_arr],
                names=list(batch.schema.names) + ["features"],
            )

    return df.mapInArrow(featurize, schema=out_schema)
