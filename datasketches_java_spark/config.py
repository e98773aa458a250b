"""Frozen shingle/signature configuration.

The north rule defines dup-pair recall *at a fixed shingle/signature
config*; this module freezes that config and hashes it so every metrics
table and checkpoint records exactly which config produced it
(BASELINE.json:14, FIXTURES.md F2).

Defaults mirror the reference where one exists:
 - DEFAULT_UPDATE_SEED = 9001  (reference common/Util.java:99)
 - KMV nominal k behaves like theta nominal entries
   (reference thetacommon/ThetaUtil.java:55 uses 4096 as library default;
   we freeze k=256 for signatures per FIXTURES.md F2).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

DEFAULT_UPDATE_SEED = 9001  # reference common/Util.java:99


@dataclass(frozen=True)
class DedupConfig:
    """The frozen signature/LSH config (FIXTURES.md F2)."""

    # caption shingling
    shingle_k: int = 5            # char-5 shingles
    seed: int = DEFAULT_UPDATE_SEED

    # KMV / bottom-k signature (reference theta/UpdatableThetaSketch.java T1)
    kmv_k: int = 256

    # one-permutation MinHash for LSH banding (Li/Owen/Zhang 2012 OPH +
    # Shrivastava/Li 2014 rotation densification)
    minhash_n: int = 256
    lsh_bands: int = 32           # b=32
    lsh_rows: int = 8             # r=8  (b*r == minhash_n)

    # verification thresholds
    jaccard_golden: float = 0.8   # golden pairs: exact shingle Jaccard >= this
    jaccard_verify: float = 0.72  # KMV-estimate threshold (margin for est. noise)
    simhash_bits: int = 64
    simhash_max_hamming: int = 3
    phash_max_hamming: int = 8
    # 4 x 16-bit pHash blocks. Bucket space 65536 per block keeps random
    # collisions ~n²/65536 (linear-ish at our tiers) where 8-bit blocks
    # measured 3.7M candidates on a 20k corpus (quadratic death at web
    # scale). Detection: guaranteed for error patterns confined to <=2
    # of the 4 blocks (covers all Hamming<=2; 3 errors can hit 3 blocks),
    # probabilistic above — the image channel targets near-exact pixel
    # dups; cropped
    # variants land at ham 12-18 and are owned by the caption channel.
    # Full ham<=8 image-only search = multi-index hashing with 1-bit
    # flip enumeration (Norouzi et al. 2012), a follow-up operator.
    phash_bands: int = 4
    # multi-index hashing for the image channel (Norouzi et al. 2012):
    # per 16-bit block, emit the block value AND its 16 one-bit flips
    # as extra band keys — flip-meets-flip means any pair with per-block
    # Hamming <= 2 in SOME block collides (pigeonhole: every
    # total-Hamming <= 11 pattern is GUARANTEED a candidate, see
    # phash_mih_keys), extending the block-pair guarantee (<= 2-of-4-
    # block error patterns). Off by default: 68 extra keys/row grow the band
    # shuffle ~2.7x — the scale-path option for image-only dedup jobs
    # where pHash recall at Hamming 3-7 matters more than throughput.
    phash_mih: bool = False

    # skew control: band groups larger than the cap fall back to
    # min-member star pairing (connectivity preserved, O(g) pairs,
    # graph diameter 2 so clustering converges in O(1) rounds)
    band_group_cap: int = 2000    # caption MinHash bands
    phash_band_cap: int = 128     # pHash blocks are coarser → tighter cap

    extra: dict = field(default_factory=dict)

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


FROZEN = DedupConfig()
