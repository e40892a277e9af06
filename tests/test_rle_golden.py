"""Golden-vector certification of the RLE codec against the canonical COCO format.

The reference vendors the canonical C codec (it is the battle-tested pycocotools
maskApi: /root/reference/mdqe/data/pycocotools/_mask.pyx:30-40, mask.py:80-102);
neither pycocotools nor the maskApi.c source is available in this environment
(the vendored fork ships only the generated _mask.c, which #includes a
../common/maskApi.c that is not in the repo). So the vectors below are derived
BY HAND from the canonical rleToString/rleFrString algorithm — published in
pycocotools' maskApi.c and restated in _mask.pyx's comments:

    rleToString:  for i in runs: x = cnts[i]; if i > 2: x -= cnts[i-2]
                  repeat: c = x & 0x1f; x >>= 5 (arithmetic);
                          more = (x != -1) if (c & 0x10) else (x != 0);
                          if more: c |= 0x20;  emit chr(c + 48)
    rleFrString:  inverse, with sign extension when the final chunk has bit 0x10.

Every expected string's arithmetic is written out in the comments, so the test is
an independent spec-check of data/rle.py and native/rle_codec.cc — NOT a
roundtrip of the implementation against itself. Both the C++ fast path and the
pure-Python fallback are exercised.

Caveat recorded in PARITY.md: byte-level comparison against a *binary* of
canonical pycocotools remains impossible offline; these vectors cover every
branch of the canonical algorithm (multi-chunk, difference coding, negative
difference single- and multi-chunk sign extension, zero-length leading run).
"""
import numpy as np
import pytest

from mdqe_cvpr2023_tpu.data import rle as R


def _backends():
    yield "python"
    if R._load_native():
        yield "native"


@pytest.fixture(params=list(_backends()))
def backend(request, monkeypatch):
    if request.param == "python":
        monkeypatch.setattr(R, "_LIB", False)  # force pure-Python codec
    return request.param


# ---------------------------------------------------------------------------
# counts <-> string vectors (hand-derived, derivation in comments)
# ---------------------------------------------------------------------------

COUNTS_VECTORS = [
    # counts=[6]: x=6 -> c=6&31=6, x>>=5 -> 0, c&0x10=0 so more=(x!=0)=False,
    # emit chr(6+48)='6'
    ([6], "6"),
    # counts=[0,100]: x=0 -> '0'.
    # x=100: c=100&31=4, x=3, more=(x!=0)=True -> c|=0x20 -> 36 -> chr(84)='T';
    #        c=3, x=0, more=False -> '3'
    ([0, 100], "0T3"),
    # counts=[0,1,15]: '0'; '1'; x=15: c=15, x=0, c&0x10=0 -> more=False,
    # chr(63)='?'
    ([0, 1, 15], "01?"),
    # difference coding from i=3 on, including a -1 difference:
    # counts=[2,2,1,1,3]: '2','2','1';
    # i=3: x=1-counts[1]=-1: c=-1&31=31, x>>=5 -> -1, c&0x10 -> more=(x!=-1)=False,
    #      chr(31+48)=chr(79)='O';
    # i=4: x=3-counts[2]=2 -> '2'
    ([2, 2, 1, 1, 3], "221O2"),
    # multi-chunk negative with sign extension:
    # counts=[5,50,2,10,3]:
    # '5'; 50: c=50&31=18, x=1, more -> c|=0x20=50 -> chr(98)='b'; c=1 -> '1';
    # '2';
    # i=3: x=10-50=-40: c=-40&31=24, x>>=5 -> -2 (arithmetic), c&0x10 ->
    #      more=(x!=-1)=True -> c|=0x20 -> 56 -> chr(104)='h';
    #      c=-2&31=30, x>>=5 -> -1, c&0x10 -> more=False -> chr(78)='N';
    # i=4: x=3-2=1 -> '1'
    ([5, 50, 2, 10, 3], "5b12hN1"),
    # positive multi-chunk where bit 0x10 of an intermediate chunk is set:
    # counts=[0,1000]: '0';
    # 1000 = 0b1111101000: c=1000&31=8, x=31, more -> c|=0x20=40 -> chr(88)='X';
    #        c=31&31=31, x=0, c&0x10 -> more=(x!=-1)=True -> c|=0x20=63 ->
    #        chr(111)='o'; c=0, x=0, c&0x10=0 -> more=(x!=0)=False -> chr(48)='0'
    ([0, 1000], "0Xo0"),
]


def test_counts_to_string_golden(backend):
    for counts, expected in COUNTS_VECTORS:
        got = R.counts_to_string(counts)
        assert got == expected, (backend, counts, got, expected)


def test_string_to_counts_golden(backend):
    for counts, s in COUNTS_VECTORS:
        got = R.string_to_counts(s)
        np.testing.assert_array_equal(got, counts, err_msg=f"{backend} {s}")


# ---------------------------------------------------------------------------
# full mask -> canonical RLE dict vectors (column-major runs + string)
# ---------------------------------------------------------------------------

def test_encode_all_ones_10x10_golden(backend):
    # canonical pycocotools: encode(np.ones((10,10), order='F')) has
    # counts=[0,100] -> "0T3" (derivation above)
    out = R.encode(np.ones((10, 10), bool))
    assert out == {"size": [10, 10], "counts": "0T3"}


def test_encode_single_pixel_golden(backend):
    # 4x4, pixel (0,0): column-major flat = [1,0,...,0] -> counts=[0,1,15] -> "01?"
    m = np.zeros((4, 4), bool)
    m[0, 0] = True
    assert R.encode(m) == {"size": [4, 4], "counts": "01?"}


def test_encode_column_major_order_golden(backend):
    # 3x2 mask, True at rows 0-1 of column 1 only. Column-major flat scan:
    # col0 = [0,0,0], col1 = [1,1,0] -> flat = 0,0,0,1,1,0 -> counts=[3,2,1]
    # encode: '3','2','1' (all single-chunk, no differences yet)
    m = np.zeros((3, 2), bool)
    m[0:2, 1] = True
    assert R.encode(m) == {"size": [3, 2], "counts": "321"}


def test_decode_golden_vector(backend):
    # decode "221O2" with size (3,3): counts=[2,2,1,1,3] ->
    # flat = [0,0,1,1,0,1,0,0,0] column-major
    m = R.decode({"size": [3, 3], "counts": "221O2"})
    flat = m.reshape(-1, order="F")
    np.testing.assert_array_equal(flat, [0, 0, 1, 1, 0, 1, 0, 0, 0])


def test_decode_realistic_annotation_shape(backend):
    # A YTVIS/OVIS-style annotation dict (string counts, [H, W] size) decodes,
    # re-encodes byte-identically, and area matches the odd-run sum.
    ann = {"size": [3, 3], "counts": "221O2"}
    m = R.decode(ann)
    assert R.encode(m.astype(bool)) == ann
    assert R.area(ann) == 2 + 1  # odd-index runs are foreground: counts[1], counts[3]


def test_roundtrip_random_matches_golden_codec_properties(backend):
    # randomized: every encode must decode back AND the string must re-decode to
    # the exact column-major run-length sequence computed independently here
    rng = np.random.default_rng(0)
    for _ in range(10):
        H, W = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        m = rng.random((H, W)) < 0.3
        out = R.encode(m)
        counts = R.string_to_counts(out["counts"])
        # independent run-length computation (plain Python scan)
        flat = m.reshape(-1, order="F")
        runs, cur, val = [], 0, False
        for px in flat:
            if bool(px) == val:
                cur += 1
            else:
                runs.append(cur)
                cur, val = 1, bool(px)
        runs.append(cur)
        np.testing.assert_array_equal(counts, runs)
        np.testing.assert_array_equal(R.decode(out), m.astype(np.uint8))
