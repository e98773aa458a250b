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
            n = len(pdf)
            # decode is inherently per-image (codec boundary); ALL
            # pixel math after it batches over same-dimension stacks
            imgs: list = [None] * n
            w = np.zeros(n, np.int32)
            h = np.zeros(n, np.int32)
            fmt = np.full(n, "unknown", dtype=object)
            ok = np.zeros(n, bool)
            for i, buf in enumerate(pdf["bytes"]):
                try:
                    img, meta = codec.decode(bytes(buf))
                    imgs[i] = img
                    w[i], h[i], fmt[i] = meta["w"], meta["h"], meta["fmt"]
                    ok[i] = True
                except Exception:
                    # foreign format (NotImplementedError stub) OR a
                    # corrupt buffer (zlib.error / ValueError from a
                    # truncated TIMG payload): decode_ok=False per row,
                    # never a failed task
                    pass
            mean_rgb = np.zeros((n, 3))
            std = np.zeros(n)
            ph = np.zeros(n, np.int64)
            by_shape: dict = {}
            for i in np.nonzero(ok)[0]:
                by_shape.setdefault(imgs[i].shape, []).append(int(i))
            for idxs in by_shape.values():
                S = np.stack([imgs[i] for i in idxs])  # one stack/group
                A = S.astype(np.float64)
                mean_rgb[idxs] = A.mean(axis=(1, 2))
                std[idxs] = A.reshape(len(idxs), -1).std(axis=1)
                if batch_check_phash:
                    ph[idxs] = codec.phash64_batch_pixels(S)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "w": w, "h": h, "fmt": fmt,
                    "mean_r": mean_rgb[:, 0],
                    "mean_g": mean_rgb[:, 1],
                    "mean_b": mean_rgb[:, 2],
                    "stddev": std,
                    "phash_check": ph,
                    "decode_ok": ok,
                }
            )

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
                try:
                    img, _ = codec.decode(bytes(buf))
                except Exception:
                    continue  # foreign/corrupt: surfaced via row absence
                h, w = img.shape[:2]
                # ceil division: floor gave ceil(dim/scale) > max_side
                # (100x100 @ max_side=16 -> stride 6 -> 17 rows)
                scale = max(1, -(-max(h, w) // max_side))
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
                try:
                    im_a, _ = codec.decode(bytes(ba))
                    im_b, _ = codec.decode(bytes(bb))
                except Exception:
                    rows.append((ia, ib, float("nan"), False))
                    continue
                if im_a.shape == im_b.shape:
                    rows.append((ia, ib, codec.psnr(im_a, im_b), True))
                else:
                    rows.append((ia, ib, float("nan"), False))
            yield pd.DataFrame(rows, columns=["id_a", "id_b", "psnr", "same_dims"])

    return j.mapInPandas(gen, schema)


FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx int, n_frames int, fps int, "
    "frame binary, w int, h int, frame_phash bigint"
)


def sample_frames(
    df: DataFrame,
    n_samples: int = 4,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
    with_phash: bool = True,
) -> DataFrame:
    """Uniform-stride frame sampling over an opaque video binary column
    → one row per sampled frame (re-encoded standalone TIMG + pHash),
    the decode→frame-sample→feature stage of a video dedup pipeline.

    Deterministic: sampled indices are round(j * (n-1) / (k-1)) for
    j in 0..k-1 (first and last frame always included; k=1 → middle
    frame), so the same video always yields the same frames.

    Scale shape: the container's length index makes each sampled frame
    a seek + O(frame) decode — a 10k-frame video sampled at k=4 pays 4
    frame decodes, not 10k (video_meta is a header-only parse). Rows
    stay inside one Arrow batch pass (mapInPandas); output carries the
    re-encoded frame so downstream image ops (decode_features, the
    pHash dedup channel) run unchanged on frames. Sampled-frame pHash
    feeds the same banded Hamming candidate lane as still images —
    near-dup VIDEOS become near-dup frame sets.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, idxs, nfs, fpss, frames, ws, hs, phs = (
                [], [], [], [], [], [], [], []
            )
            for vid, buf in zip(pdf[id_col], pdf[bytes_col]):
                buf = bytes(buf)
                try:
                    meta = codec.video_meta(buf)
                except NotImplementedError:
                    continue  # foreign container: surfaced via row absence
                n = meta["n_frames"]
                if n == 0:
                    continue
                k = min(n_samples, n)
                if k == 1:
                    picks = np.array([n // 2])
                else:
                    picks = np.unique(
                        np.round(np.arange(k) * (n - 1) / (k - 1)).astype(int)
                    )
                for i in picks:
                    img, fmeta = codec.decode_video_frame(buf, int(i), meta)
                    vids.append(vid)
                    idxs.append(int(i))
                    nfs.append(n)
                    fpss.append(meta["fps"])
                    frames.append(codec.encode(img, "png"))
                    ws.append(fmeta["w"])
                    hs.append(fmeta["h"])
                    phs.append(int(codec.phash64(img)) if with_phash else 0)
            yield pd.DataFrame(
                {
                    "video_id": vids, "frame_idx": idxs, "n_frames": nfs,
                    "fps": fpss, "frame": frames, "w": ws, "h": hs,
                    "frame_phash": phs,
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(gen, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "audio_id string, sample_rate int, n_samples bigint, duration_sec double, "
    "rms double, peak int, zero_crossings bigint, decode_ok boolean"
)


def audio_features(
    df: DataFrame, id_col: str = "audio_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Per-clip PCM features (duration, RMS, peak, zero-crossing count)
    over an opaque audio binary column — the audio leg of the
    multimodal table. All sample math is vectorized NumPy per clip;
    foreign formats surface as decode_ok=false rows (the image lane's
    convention, decode_features)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            rate = np.zeros(n, np.int32)
            cnt = np.zeros(n, np.int64)
            dur = np.zeros(n)
            rms = np.zeros(n)
            peak = np.zeros(n, np.int32)
            zc = np.zeros(n, np.int64)
            ok = np.zeros(n, bool)
            for i, buf in enumerate(pdf[bytes_col]):
                try:
                    s, meta = codec.decode_audio(bytes(buf))
                except NotImplementedError:
                    continue
                rate[i], cnt[i] = meta["sample_rate"], meta["n_samples"]
                dur[i] = cnt[i] / max(rate[i], 1)
                x = s.astype(np.float64)
                rms[i] = float(np.sqrt(np.mean(x * x))) if s.size else 0.0
                # abs in int32: np.abs(int16 -32768) wraps to -32768
                peak[i] = int(np.abs(s.astype(np.int32)).max()) if s.size else 0
                zc[i] = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                ok[i] = True
            yield pd.DataFrame(
                {
                    "audio_id": pdf[id_col], "sample_rate": rate,
                    "n_samples": cnt, "duration_sec": dur, "rms": rms,
                    "peak": peak, "zero_crossings": zc, "decode_ok": ok,
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(gen, AUDIO_FEATURES_SCHEMA)
