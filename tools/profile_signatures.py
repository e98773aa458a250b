"""Offline profiler for the signature kernel (no Spark).

Feeds cached corpus batches straight through the sub-kernels that
operators/signatures.py:_signature_batches composes, timing each, so
the Arrow/JVM layer is excluded and the pure-Python cost per million
rows is attributable kernel by kernel.

Usage: python tools/profile_signatures.py [n_rows=200000] [batch=10000]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483648")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483648")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from datasketches_java_spark.config import FROZEN as cfg
    from datasketches_java_spark.corpus.loader import corpus_dir
    from datasketches_java_spark.kernels import kmv
    from datasketches_java_spark.kernels.minhash import (
        band_hashes,
        oph_signature_matrix,
    )
    from datasketches_java_spark.kernels.shingle import (
        char_shingle_hashes,
        normalize_captions,
        token_hashes,
    )
    from datasketches_java_spark.kernels.simhash import simhash_batch
    from datasketches_java_spark.operators.signatures import phash_band_keys

    cdir = os.path.join(corpus_dir(n_rows), "corpus.parquet")
    tbl = pq.read_table(cdir, columns=["image_id", "caption", "phash"])
    print(f"rows={tbl.num_rows} batch={batch}", flush=True)

    acc: dict[str, float] = {}

    def t(name: str, fn):
        t0 = time.time()
        out = fn()
        acc[name] = acc.get(name, 0.0) + time.time() - t0
        return out

    for pdf in tbl.to_batches(max_chunksize=batch):
        pdf = pdf.to_pandas()
        n = len(pdf)
        norm = t("normalize", lambda: normalize_captions(pdf["caption"]))
        h, rows = t("shingle_hash", lambda: char_shingle_hashes(
            norm, cfg.shingle_k, cfg.seed, bits=31))
        kmv_sigs, _ = t("bottom_k", lambda: kmv.bottom_k_batch(
            h, rows, n, cfg.kmv_k, return_counts=True))

        def pack():
            lens = np.fromiter((len(s) for s in kmv_sigs), np.int64, count=n)
            flat = (np.concatenate(kmv_sigs) if lens.sum()
                    else np.empty(0, np.int32))
            buf = flat.astype("<i4", copy=False).tobytes()
            ends = 4 * np.cumsum(lens)
            starts = ends - 4 * lens
            return [buf[a:b] for a, b in zip(starts.tolist(), ends.tolist())]

        t("sig_pack", pack)
        mat, _ = t("oph", lambda: oph_signature_matrix(
            h, rows, n, cfg.minhash_n, cfg.seed))
        t("band_hash", lambda: band_hashes(
            mat, cfg.lsh_bands, cfg.lsh_rows, cfg.seed))
        t("phash_bands", lambda: phash_band_keys(
            pdf["phash"].to_numpy(np.int64), cfg.phash_bands, cfg.seed))
        th, trows = t("token_hash", lambda: token_hashes(norm, cfg.seed))
        t("simhash", lambda: simhash_batch(th, trows, n))

    total = sum(acc.values())
    for k, v in sorted(acc.items(), key=lambda kv: -kv[1]):
        print(f"{k:14s} {v:7.2f}s  {100 * v / total:5.1f}%")
    print(f"{'TOTAL':14s} {total:7.2f}s  (pure kernel, single thread)")


if __name__ == "__main__":
    main()
