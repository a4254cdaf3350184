"""Property-based tests (hypothesis) for the session-3 pure-Python
kernels: aHash, Morton interleave, the BPE run-parity rule, and the
profiler's canonical casts. All run WITHOUT Spark (driver-side refs of
the distributed operators), so hundreds of cases cost milliseconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ndr_import_spark.operators.multimodal import ahash64


# --------------------------------------------------------------- aHash


@settings(max_examples=150, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    data=st.data(),
)
def test_ahash_matches_brute_force(w, h, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    got = ahash64(w, h, 3, px) & ((1 << 64) - 1)
    # brute-force reference
    lum = []
    for i in range(8):
        sy = min(i * h // 8, h - 1)
        for j in range(8):
            sx = min(j * w // 8, w - 1)
            b = (sy * w + sx) * 3
            lum.append(299 * px[b] + 587 * px[b + 1] + 114 * px[b + 2])
    total = sum(lum)
    exp = 0
    for idx, v in enumerate(lum):
        if v * 64 > total:
            exp |= 1 << (63 - idx)
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 255), st.integers(1, 10), st.integers(1, 10))
def test_ahash_solid_is_zero(v, w, h):
    assert ahash64(w, h, 1, bytes([v] * (w * h))) == 0


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 8), st.integers(1, 8), st.integers(1, 4))
def test_ahash_invariant_under_pixel_doubling(w, h, k):
    """NN-sampling a k×-replicated image lands on identically-valued
    pixels, so the hash is resize-invariant for exact upscales."""
    import hashlib

    base = hashlib.md5(f"{w}x{h}x{k}".encode()).digest() * 16
    px = bytes(base[: w * h])
    big = bytearray()
    for y in range(h * k):
        for x in range(w * k):
            big.append(px[(y // k) * w + (x // k)])
    assert ahash64(w, h, 1, px) == ahash64(w * k, h * k, 1, bytes(big))


# --------------------------------------------------------------- Morton


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 65535), st.integers(0, 65535))
def test_morton_roundtrip(x, y):
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    # de-interleave recovers both coordinates
    xr = sum((((z >> (2 * b + 1)) & 1) << b) for b in range(16))
    yr = sum((((z >> (2 * b)) & 1) << b) for b in range(16))
    assert (xr, yr) == (x, y)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 65534), st.integers(0, 65535))
def test_morton_monotone_in_each_dim(x, y):
    def m(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b + 1)
            z |= ((y >> b) & 1) << (2 * b)
        return z

    assert m(x + 1, y) > m(x, y)
    assert m(y, x + 1) > m(y, x)


# ------------------------------------------------- BPE run-parity rule


def _greedy_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _run_parity_merge(syms, a, b):
    """The SQL form: pm flags, gaps-and-islands runs, merge at even
    offsets within each run, drop the following symbol."""
    n = len(syms)
    pm = [
        i + 1 < n and syms[i] == a and syms[i + 1] == b for i in range(n)
    ]
    ms = [False] * n
    i = 0
    while i < n:
        if pm[i]:
            start = i
            while i < n and pm[i]:
                if (i - start) % 2 == 0:
                    ms[i] = True
                i += 1
        else:
            i += 1
    out = []
    skip = False
    for i in range(n):
        if skip:
            skip = False
            continue
        if ms[i]:
            out.append(a + b)
            skip = True
        else:
            out.append(syms[i])
    return out


@settings(max_examples=300, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14),
    a=st.sampled_from(["a", "b", "c"]),
    b=st.sampled_from(["a", "b", "c"]),
)
def test_run_parity_equals_greedy(syms, a, b):
    assert _run_parity_merge(syms, a, b) == _greedy_merge(syms, a, b)
