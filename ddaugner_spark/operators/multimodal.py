"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB crawl carries images/audio/video as binary columns.  The decode
libraries are not in this container, so the decode kernel is a
deterministic fake behind ``fake=True`` (and ``NotImplementedError``
otherwise) — but the Spark-side plumbing is real and tested: schema,
Arrow batch iteration (``mapInPandas``), partition sizing, and the
metadata join shape are exactly what a real decoder drops into.

Design: an iterator-of-batches pandas UDF so per-executor setup (a model,
a codec context) happens once per task, not per row — the same pattern
the batched BIO tagger (reference predict.py:15-138) uses.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 4


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for an image/audio decode + featurize step:
    feature = normalized leading bytes of the payload."""
    import hashlib

    out = {"url": [], "n_bytes": [], "payload_sha": [], "feature": []}
    for url, payload in zip(pdf["url"], pdf["html"]):
        out["url"].append(url)
        if payload is None:
            # NULL payload decodes to NULL metadata/features — the same
            # rendering as SQL's length(NULL)/sha256(NULL), pinned by
            # test_decode_null_payload so engine and oracle can't drift
            out["n_bytes"].append(None)
            out["payload_sha"].append(None)
            out["feature"].append(None)
            continue
        b = bytes(payload)
        out["n_bytes"].append(len(b))
        out["payload_sha"].append(hashlib.sha256(b).hexdigest())
        head = (b[:FEATURE_DIM] + b"\x00" * FEATURE_DIM)[:FEATURE_DIM]
        out["feature"].append([x / 255.0 for x in head])
    return pd.DataFrame(out)


def decode_features(pages: DataFrame, fake: bool = True) -> DataFrame:
    """binary payload → (url, n_bytes, payload_sha, feature array<float>).

    ``mapInPandas`` streams Arrow batches; no per-row Python.  Real codecs
    (PIL/ffmpeg/torchaudio) are not installed in this sandbox —
    ``fake=False`` raises until they are."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present "
            "in this container; the Spark plumbing below is production-shaped"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one-time per-task setup would go here (codec ctx / model load)
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return pages.select("url", "html").mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def resize_features(
    features: DataFrame, target_dim: int = 2, fake: bool = True
) -> DataFrame:
    """Feature 'resize' plumbing: (url, feature[d]) → (url, feature[t]).

    The fake kernel mean-pools equal blocks (deterministic); a real
    image resize (PIL/opencv bilinear over pixel arrays) drops into the
    same batch signature.  Arrow batches end-to-end, no per-row Python."""
    if not fake:
        raise NotImplementedError(
            "real resize requires image libraries not present in this container"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "feature": []}
            for url, feat in zip(pdf["url"], pdf["feature"]):
                v = list(feat)
                block = max(1, len(v) // target_dim)
                pooled = [
                    sum(v[i * block : (i + 1) * block])
                    / max(len(v[i * block : (i + 1) * block]), 1)
                    for i in range(target_dim)
                ]
                out["url"].append(url)
                out["feature"].append(pooled)
            yield pd.DataFrame(out)

    return features.select("url", "feature").mapInPandas(run, RESIZE_SCHEMA)


def with_media_metadata(pages: DataFrame) -> DataFrame:
    """Typed metadata for opaque payloads: struct(modality, width,
    height, duration_ms) derived deterministically from the payload
    bytes (a real pipeline reads container headers; the TYPES and the
    dimension-join shape are what the engine exercises)."""
    n = F.length(F.col("html"))
    modality = (
        F.when(F.pmod(n, F.lit(3)) == 0, F.lit("image"))
        .when(F.pmod(n, F.lit(3)) == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    meta = F.struct(
        modality.alias("modality"),
        (F.pmod(n, F.lit(640)) + 16).cast("int").alias("width"),
        (F.pmod(n, F.lit(480)) + 16).cast("int").alias("height"),
        (n * 10).cast("long").alias("duration_ms"),
    )
    return pages.withColumn("media_meta", meta)


def frame_sample_plan(pages: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' shape demo on opaque payloads: emit one row per
    sampled offset — pure column expressions (sequence + explode), the
    real sampler swaps the offset arithmetic for codec timestamps."""
    n = F.length(F.col("html"))
    offs = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n_bytes))
    ).otherwise(F.array().cast("array<int>"))
    return pages.select("url", F.explode(offs).alias("frame_offset"))


# (magic-bytes hex prefix, mime) — longest matching prefix wins; the
# openxml entry deliberately extends the zip entry so the sniffer's
# longest-match rule is load-bearing, and the riff entry matches nothing
# in the synthetic corpus (dimension entries without hits must be inert)
MAGIC_MIMES = [
    ("FFD8FF", "image/jpeg"),
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),
    ("25504446", "application/pdf"),
    ("504B0304", "application/zip"),
    ("504B030414000600", "application/vnd.openxmlformats"),
    ("52494646", "audio/x-riff"),
]

DEFAULT_MIME = "application/octet-stream"


def synthesize_media(docs: DataFrame) -> DataFrame:
    """(doc_id, payload BINARY) — deterministic opaque payloads for the
    sniffing tests: doc_id % 7 picks a magic prefix (slot 6 = bare body,
    no magic), body = the document text bytes.  NULL/empty text docs
    carry no payload row (a crawl's media table only has rows for
    fetched blobs)."""
    magic_hex = F.element_at(
        F.array(*[F.lit(h) for h, _ in MAGIC_MIMES[:6]], F.lit("")),
        (F.col("doc_id") % 7 + 1).cast("int"),
    )
    return docs.filter(F.col("text").isNotNull() & (F.col("text") != "")).select(
        "doc_id",
        F.concat(F.unhex(magic_hex), F.col("text").cast("binary")).alias("payload"),
    )


def sniff_mime(media: DataFrame, magics: list[tuple[str, str]] | None = None) -> DataFrame:
    """(mime, n_docs, sum_bytes) — container-format detection from
    binary magic bytes (the `file(1)` / HTTP MIME-sniffing step a crawl
    pipeline runs before routing payloads to typed decoders).

    Longest-match semantics over a magic-prefix dictionary.  Scale
    shape: the payload is touched ONCE per row to slice max-magic-bytes
    and hex them (map-only — the blob itself never shuffles); each
    distinct magic LENGTH contributes one fixed-width prefix key,
    exploded map-side (≤ distinct-length rows per payload, the bigdict
    per-length prefilter idiom), equi-joined against the broadcast
    magic dimension; the longest hit per doc is an argmax INSIDE the
    hash aggregate.  Unmatched payloads fall to application/octet-stream
    via the final left join.
    """
    magics = MAGIC_MIMES if magics is None else magics
    lengths = sorted({len(h) // 2 for h, _ in magics})
    max_b = max(lengths)
    head = F.hex(F.expr(f"substring(payload, 1, {max_b})"))
    cands = media.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"),
                        F.substring(head, 1, 2 * n).alias("p"),
                    )
                    for n in lengths
                ]
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.n").alias("n"), F.col("c.p").alias("p"))
    dim = media.sparkSession.createDataFrame(
        [(h, m, len(h) // 2) for h, m in magics], "p string, mime string, n int"
    )
    hits = (
        cands.join(F.broadcast(dim), ["p", "n"])
        .groupBy("doc_id")
        .agg(
            F.substring(
                F.max(F.concat(F.lpad(F.col("n").cast("string"), 2, "0"), "mime")),
                3,
                64,
            ).alias("mime")
        )
    )
    return (
        media.select("doc_id", F.length("payload").cast("long").alias("n_bytes"))
        .join(hits, "doc_id", "left")
        .groupBy(F.coalesce("mime", F.lit(DEFAULT_MIME)).alias("mime"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("sum_bytes"),
        )
    )
