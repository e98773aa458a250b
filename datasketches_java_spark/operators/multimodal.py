"""Multimodal column processing: decode / feature-extract / resize over
opaque binary image columns, as Arrow-batched mapInPandas stages.

The Spark-side plumbing (schemas, batch shapes, partitioning) is fully
real and tested against the in-repo TIMG codec; foreign formats
(JPEG/PNG/WebP via PIL/libjpeg, audio/video frame sampling) raise
NotImplementedError inside `corpus.codec.decode` because those
libraries are not in this container (driver instruction: stub the
decode step, make the plumbing real).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import codec

DECODE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, stddev double, phash_check bigint, decode_ok boolean"
)


def decode_features(df: DataFrame, batch_check_phash: bool = True) -> DataFrame:
    """Decode every image; emit per-image pixel statistics + recomputed
    pHash (lets audits verify the stored phash column end-to-end)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b",
                "stddev", "phash_check", "decode_ok")}
            for iid, buf in zip(pdf["image_id"], pdf["bytes"]):
                out["image_id"].append(iid)
                try:
                    img, meta = codec.decode(bytes(buf))
                    m = img.reshape(-1, 3).mean(axis=0)
                    out["w"].append(meta["w"])
                    out["h"].append(meta["h"])
                    out["fmt"].append(meta["fmt"])
                    out["mean_r"].append(float(m[0]))
                    out["mean_g"].append(float(m[1]))
                    out["mean_b"].append(float(m[2]))
                    out["stddev"].append(float(img.std()))
                    out["phash_check"].append(
                        int(codec.phash64(img)) if batch_check_phash else 0
                    )
                    out["decode_ok"].append(True)
                except NotImplementedError:
                    out["w"].append(0)
                    out["h"].append(0)
                    out["fmt"].append("unknown")
                    out["mean_r"].append(0.0)
                    out["mean_g"].append(0.0)
                    out["mean_b"].append(0.0)
                    out["stddev"].append(0.0)
                    out["phash_check"].append(0)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes").mapInPandas(gen, DECODE_FEATURES_SCHEMA)


RESIZE_SCHEMA = "image_id string, thumb binary, tw int, th int"


def resize_thumbnails(df: DataFrame, max_side: int = 16) -> DataFrame:
    """Decode → nearest-neighbor downscale → re-encode (lossless TIMG).
    The shape every multimodal preprocab stage takes: binary in, binary
    out, bounded batch memory via Arrow batch size."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs, tws, ths = [], [], [], []
            for iid, buf in zip(pdf["image_id"], pdf["bytes"]):
                img, _ = codec.decode(bytes(buf))
                h, w = img.shape[:2]
                scale = max(1, max(h, w) // max_side)
                thumb = img[::scale, ::scale]
                ids.append(iid)
                thumbs.append(codec.encode(thumb, "png"))
                ths.append(thumb.shape[0])
                tws.append(thumb.shape[1])
            yield pd.DataFrame(
                {"image_id": ids, "thumb": thumbs, "tw": tws, "th": ths}
            )

    return df.select("image_id", "bytes").mapInPandas(gen, RESIZE_SCHEMA)


def psnr_pairs(df_pairs: DataFrame, corpus: DataFrame) -> DataFrame:
    """PSNR between decoded pixels of paired images (same dims only) —
    the per-row invariant check (BASELINE.json:16) as a distributed op."""
    a = corpus.select(F.col("image_id").alias("id_a"), F.col("bytes").alias("bytes_a"))
    b = corpus.select(F.col("image_id").alias("id_b"), F.col("bytes").alias("bytes_b"))
    j = df_pairs.join(a, "id_a").join(b, "id_b")

    schema = "id_a string, id_b string, psnr double, same_dims boolean"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ia, ib, ba, bb in zip(
                pdf["id_a"], pdf["id_b"], pdf["bytes_a"], pdf["bytes_b"]
            ):
                im_a, _ = codec.decode(bytes(ba))
                im_b, _ = codec.decode(bytes(bb))
                if im_a.shape == im_b.shape:
                    rows.append((ia, ib, codec.psnr(im_a, im_b), True))
                else:
                    rows.append((ia, ib, float("nan"), False))
            yield pd.DataFrame(rows, columns=["id_a", "id_b", "psnr", "same_dims"])

    return j.mapInPandas(gen, schema)
