"""Frame-sample and audio-feature multimodal operators: the TVID/TAUD
container plumbing (schema, batch shape, seek-decode contract) plus the
deterministic sampling rule. Foreign containers follow the stubbed
decode convention (corpus/codec.py)."""

import numpy as np
import pytest

from datasketches_java_spark.corpus import codec
from datasketches_java_spark.operators.multimodal import (
    audio_features,
    sample_frames,
)


def _video(rng, n_frames, w=16, h=12, fps=8):
    frames = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)
    ]
    return frames, codec.encode_video(frames, fps=fps)


def test_video_container_seek_decode():
    rng = np.random.default_rng(11)
    frames, buf = _video(rng, 7)
    meta = codec.video_meta(buf)
    assert meta["n_frames"] == 7 and meta["fps"] == 8
    for i in (0, 3, 6):
        img, fmeta = codec.decode_video_frame(buf, i, meta)
        assert (img == frames[i]).all()
        assert (fmeta["w"], fmeta["h"]) == (16, 12)
    with pytest.raises(IndexError):
        codec.decode_video_frame(buf, 7, meta)
    with pytest.raises(NotImplementedError):
        codec.video_meta(b"RIFFxxxx")  # foreign container stays stubbed


def test_sample_frames_deterministic_stride(spark):
    rng = np.random.default_rng(23)
    frames_a, buf_a = _video(rng, 10)
    frames_b, buf_b = _video(rng, 2)
    _, buf_c = _video(rng, 1)
    df = spark.createDataFrame(
        [("va", bytearray(buf_a)), ("vb", bytearray(buf_b)),
         ("vc", bytearray(buf_c)), ("bad", bytearray(b"RIFFxxxx"))],
        "video_id string, bytes binary",
    )
    out = sample_frames(df, n_samples=4).toPandas()
    # va: 10 frames, k=4 -> indices round(j*9/3) = 0,3,6,9
    a = out[out.video_id == "va"].sort_values("frame_idx")
    assert list(a.frame_idx) == [0, 3, 6, 9]
    assert set(a.n_frames) == {10}
    # sampled frame re-encodes decode back to the original pixels
    img5, _ = codec.decode(bytes(a.iloc[1]["frame"]))
    assert (img5 == frames_a[3]).all()
    # pHash matches a direct recompute on the source frame
    assert int(a.iloc[1]["frame_phash"]) == int(codec.phash64(frames_a[3]))
    # vb: 2 frames, k capped at n -> 0,1 ; vc: single frame -> middle
    assert list(out[out.video_id == "vb"].sort_values("frame_idx").frame_idx) == [0, 1]
    assert list(out[out.video_id == "vc"].frame_idx) == [0]
    # foreign container yields no rows (absence convention)
    assert len(out[out.video_id == "bad"]) == 0


def test_audio_features(spark):
    t = np.arange(8000)
    tone = (np.sin(2 * np.pi * 440 * t / 8000) * 1000).astype(np.int16)
    silence = np.zeros(4000, np.int16)
    rows = [
        ("tone", bytearray(codec.encode_audio(tone, 8000))),
        ("quiet", bytearray(codec.encode_audio(silence, 16000))),
        ("bad", bytearray(b"OggSxxxx")),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    out = {r["audio_id"]: r for r in audio_features(df).collect()}
    tr = out["tone"]
    assert tr["decode_ok"] and tr["sample_rate"] == 8000
    assert tr["duration_sec"] == pytest.approx(1.0)
    assert tr["rms"] == pytest.approx(1000 / np.sqrt(2), rel=0.01)
    # 440 Hz over 1s crosses zero ~880 times
    assert 850 <= tr["zero_crossings"] <= 910
    q = out["quiet"]
    assert q["decode_ok"] and q["rms"] == 0.0 and q["duration_sec"] == pytest.approx(0.25)
    assert not out["bad"]["decode_ok"]


def test_bpe_token_count(spark):
    """BPE-ish pre-tokenizer counts: letter runs, digit runs, single
    symbols; whitespace never counts (functions/text.py)."""
    from datasketches_java_spark.functions.text import bpe_token_count
    from pyspark.sql import functions as F

    rows = [("a", "hello, world!  it's 42C"), ("b", ""), ("c", "   "),
            ("d", "a1b2"), ("e", "x--y__z"), ("f", "tab\tsep\nline")]
    expect = {"a": 9, "b": 0, "c": 0, "d": 4, "e": 7, "f": 3}
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    assert out == expect
