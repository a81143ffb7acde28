"""Property-based tests (SURVEY §5.4): parser/normalizer invariants under
hypothesis-generated inputs. These run pure Python (extract_tables) and a
driver-side re-implementation of the normalize regex chain — no Spark jobs
per example, so hundreds of cases stay fast."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from querysight_spark.functions.sqlextract import extract_tables

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.lower()
    not in {
        "select", "from", "join", "where", "with", "as", "on", "group",
        "order", "having", "limit", "union", "lateral", "unnest", "values",
        "inner", "left", "right", "full", "cross", "by", "and", "or", "not",
        "except", "intersect", "window", "qualify", "using", "only", "dual",
    }
)


# --- extract_tables ---------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_extractor_total_and_canonical(s):
    """Never raises on arbitrary text; output is sorted, lowercase,
    deduplicated, and deterministic."""
    out = extract_tables(s)
    assert out == sorted(set(out))
    assert all(t == t.lower() for t in out)
    assert extract_tables(s) == out


@settings(max_examples=100, deadline=None)
@given(_ident, _ident, st.integers(0, 10**6))
def test_extractor_finds_from_and_join(t1, t2, n):
    sql = f"SELECT a FROM {t1} JOIN {t2} ON {t1}.id = {t2}.id WHERE x = {n}"
    out = extract_tables(sql)
    assert set(out) >= {t1.lower(), t2.lower()}


@settings(max_examples=100, deadline=None)
@given(_ident, _ident)
def test_cte_names_never_reported(cte, tbl):
    """Mirrors utils/sql_parser.py:91-110 — CTE names are not tables."""
    if cte.lower() == tbl.lower():
        return
    sql = f"WITH {cte} AS (SELECT 1 FROM {tbl}) SELECT * FROM {cte}"
    out = extract_tables(sql)
    assert cte.lower() not in out
    assert tbl.lower() in out


@settings(max_examples=100, deadline=None)
@given(_ident, _ident, _ident)
def test_schema_normalization_keeps_last_two_parts(catalog, schema, tbl):
    sql = f"SELECT 1 FROM {catalog}.{schema}.{tbl}"
    assert extract_tables(sql) == [f"{schema.lower()}.{tbl.lower()}"]


@settings(max_examples=100, deadline=None)
@given(_ident, st.text(alphabet=st.characters(blacklist_characters="'"), max_size=40))
def test_string_literals_never_leak_tables(tbl, lit):
    sql = f"SELECT 1 FROM {tbl} WHERE x = '{lit}'"
    out = extract_tables(sql)
    assert tbl.lower() in out
    # nothing from inside the literal can appear as a table
    for t in out:
        assert t == tbl.lower()


# --- normalize_query (same regex chain, applied via Python re) --------------

_PATTERNS = [
    (re.compile(r"/\*.*?\*/", re.S), " "),
    (re.compile(r"--[^\n]*"), " "),
    (re.compile(r"'(?:[^']|'')*'"), "?"),
    (re.compile(r"\b\d+(?:\.\d+)?\b"), "?"),
    (re.compile(r"\s+"), " "),
]


def _normalize(s: str) -> str:
    for pat, repl in _PATTERNS:
        s = pat.sub(repl, s)
    return s.strip().lower()


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_normalize_idempotent(s):
    once = _normalize(s)
    assert _normalize(once) == once


@settings(max_examples=100, deadline=None)
@given(_ident, st.integers(0, 10**9), st.integers(0, 10**9))
def test_normalize_groups_literal_variants(tbl, a, b):
    """Two queries differing only in literals normalize identically —
    the property pattern grouping (D1) relies on."""
    q1 = f"SELECT * FROM {tbl} WHERE k = {a} AND s = 'x{a}'"
    q2 = f"SELECT * FROM {tbl}  WHERE k = {b} AND s = 'y{b}'"
    assert _normalize(q1) == _normalize(q2)


def test_normalize_python_matches_spark(spark):
    """The Python mirror above must agree with the Spark expression chain —
    one Spark job pinning the contract for the property tests."""
    from pyspark.sql import functions as F

    from querysight_spark.functions.normalize import normalize_query

    qs = [
        "SELECT * FROM t WHERE k = 42 AND s = 'hi''there'",
        "select  1,2.5 /* c */ from x -- tail",
        "",
        "WITH c AS (SELECT 9) SELECT * FROM c WHERE d = '2024-01-01'",
    ]
    df = spark.createDataFrame([(q,) for q in qs], "q string")
    got = [r.n for r in df.select(normalize_query(F.col("q")).alias("n")).collect()]
    assert got == [_normalize(q) for q in qs]


# --- PNG codec (pure Python — no Spark session, so hypothesis is cheap) ----


@settings(max_examples=100, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 16),
    st.sampled_from([1, 3]),
    st.integers(0, 2**32 - 1),
)
def test_png_round_trip_property(w, h, channels, seed):
    """decode(encode(raster)) is the identity for every size/channel
    combo, including 1x1 and single-row/column rasters."""
    import numpy as np

    from querysight_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * channels, dtype=np.uint8)
    W, H, C, arr = decode_png(encode_png(w, h, px.tobytes(), channels=channels))
    assert (W, H, C) == (w, h, channels)
    assert arr.ravel().tobytes() == px.tobytes()


@settings(max_examples=100, deadline=None)
@given(
    st.integers(2, 12),
    st.integers(2, 8),
    st.sampled_from([1, 3]),
    st.lists(st.integers(0, 4), min_size=1, max_size=8),
    st.integers(0, 2**32 - 1),
)
def test_png_unfilter_inverts_any_filter_sequence(w, h, channels, ftypes, seed):
    """_png_unfilter must invert EVERY per-row filter choice an external
    encoder could make — filters applied here by an independent
    spec-derived implementation."""
    import numpy as np

    from querysight_spark.operators.multimodal import _png_unfilter

    rng = np.random.default_rng(seed)
    raster = rng.integers(0, 256, size=w * h * channels, dtype=np.uint8).tobytes()
    stride, bpp = w * channels, channels

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    prev, raw = bytes(stride), bytearray()
    for y in range(h):
        line = raster[y * stride : (y + 1) * stride]
        ft = ftypes[y % len(ftypes)]
        enc = bytearray(line)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif ft == 2:
                enc[i] = (line[i] - prev[i]) & 0xFF
            elif ft == 3:
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
            elif ft == 4:
                enc[i] = (line[i] - paeth(a, prev[i], c)) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line
    assert _png_unfilter(bytes(raw), h, stride, bpp) == raster
