"""Property-based tests (hypothesis) for the determinism-critical pure
kernels: codec roundtrips, minhash lane extraction, rolling-hash
polynomial identity. These run without Spark — the Spark-side
equivalence of each kernel is covered by the operator tests; here the
kernels themselves face randomized adversarial inputs.
"""

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_pipeline_spark.operators.dedup import _py_lane_minhashes
from duckdb_pipeline_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    sample_frames,
)
from duckdb_pipeline_spark.operators.text import RK_B, RK_K, RK_M, RK_POWS


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 41),  # exercises every row-padding residue
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_any_shape(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(px))
    assert out.shape == px.shape and (out == px).all()


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 4000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_bounded_error(n, rate, seed):
    s = np.random.default_rng(seed).uniform(-1, 1, size=n)
    dec, r = decode_wav(encode_wav(s, rate))
    assert r == rate and len(dec) == n
    assert np.abs(dec - s).max() <= 1.0 / 32767 + 1e-12  # one quantization step
    if n >= 400:
        fr = sample_frames(dec, 400, 160)
        assert fr.shape == (1 + (n - 400) // 160, 400)


@settings(max_examples=40, deadline=None)
@given(
    shingles=st.sets(st.text(min_size=1, max_size=12), min_size=1, max_size=60),
)
def test_lane_minhashes_match_bytewise_reference(shingles):
    """The numpy u32-lane min must equal the naive per-lane bytewise
    min (the equivalence the oracle SQL relies on)."""
    got = _py_lane_minhashes(shingles, 16)
    want = []
    for p in range(4):
        digs = [hashlib.md5(f"{p}:".encode() + s.encode()).digest() for s in shingles]
        for j in range(4):
            want.append(min(d[4 * j : 4 * j + 4] for d in digs).hex())
    assert got == want


@settings(max_examples=40, deadline=None)
@given(text=st.text(min_size=RK_K, max_size=300))
def test_rolling_hash_identity_on_arbitrary_text(text):
    """Every adjacent k-gram hash pair satisfies the Rabin-Karp rolling
    update — for arbitrary unicode text, not just ASCII."""
    codes = [ord(c) for c in text]
    hashes = [
        sum(codes[i + j] * RK_POWS[j] for j in range(RK_K)) % RK_M
        for i in range(len(codes) - RK_K + 1)
    ]
    for i in range(len(hashes) - 1):
        rolled = ((hashes[i] - codes[i] * RK_POWS[0]) * RK_B + codes[i + RK_K]) % RK_M
        assert rolled == hashes[i + 1]
    # and the vectorized kernel's windowed matmul agrees
    cs = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype("int64")
    wins = np.lib.stride_tricks.sliding_window_view(cs, RK_K)
    vec = (wins @ np.array(RK_POWS, dtype="int64")) % RK_M
    assert vec.tolist() == hashes


@settings(max_examples=30, deadline=None)
@given(
    batch=st.lists(
        st.sets(st.text(min_size=1, max_size=10), min_size=1, max_size=25),
        min_size=0,
        max_size=12,
    ),
)
def test_batch_lane_minhashes_match_per_doc_kernel(batch):
    """The vocabulary-deduped batch kernel must equal the per-doc
    kernel row for row (same digests, same u32 lane minima)."""
    from duckdb_pipeline_spark.operators.dedup import _batch_lane_minhashes

    mins = _batch_lane_minhashes(batch, 16)
    assert mins.shape == (len(batch), 16)
    for i, sh in enumerate(batch):
        assert [f"{v:08x}" for v in mins[i]] == _py_lane_minhashes(sh, 16)
