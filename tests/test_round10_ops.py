"""Round-10 pins: the r9 ADVICE findings on the versioned log's
concurrency and cache edges — a reader caught mid-vacuum retries its
hydration walk onto the re-anchored manifest instead of dying on the
just-deleted chain, vacuum age-gates ``.tmp-`` deletion so a live
writer's in-flight rename source survives (pinned beside the r8 orphan
test), the executor sidecar cache is LRU with a running byte total and
never caches an over-cap bitmap, the raw-manifest cache keys on inode
so an equal-size same-mtime ``os.replace`` can't serve stale bytes,
and ``read_manifest`` returns fresh containers a caller may mutate
without corrupting the process-wide cache."""

from __future__ import annotations

import json
import os

import pytest

import querysight_spark.sources.versioned as vmod
from querysight_spark.sources.versioned import (
    read_manifest,
    read_version,
    table_version,
    vacuum,
    write_version,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "table")


def _kv(spark, ids):
    return spark.createDataFrame(
        [(int(i), int(i) * 10) for i in ids], "id long, v long"
    )


def test_reader_mid_vacuum_retries_onto_reanchored_manifest(
    spark, root, monkeypatch
):
    """ADVICE r9: a reader that loaded the oldest-retained manifest's
    OLD delta form just before vacuum's re-anchor walks the chain into
    just-deleted manifests. read_manifest must retry once with the
    starting manifest re-statted (now the full re-anchored form)."""
    n = vmod._ANCHOR_EVERY + 6
    for i in range(n):
        write_version(spark, _kv(spark, [i]).coalesce(1), root,
                      key_filter_cols=["id"])
    retain = vmod._ANCHOR_EVERY + 3  # a DELTA version
    stale_raw = dict(vmod._load_manifest_raw(root, retain))
    assert stale_raw.get("delta_maps")
    vacuum(root, retain_from=retain)  # re-anchors retain, drops below
    # Simulate the race: the FIRST raw load of `retain` returns the
    # pre-vacuum delta form (as if loaded just before os.replace); the
    # retry re-loads for real and must see the re-anchored manifest.
    real = vmod._load_manifest_raw
    served = {"stale": False}

    def racy(r, v):
        if v == retain and not served["stale"]:
            served["stale"] = True
            return stale_raw
        return real(r, v)

    monkeypatch.setattr(vmod, "_load_manifest_raw", racy)
    m = read_manifest(root, n)
    assert served["stale"], "test must exercise the stale-raw path"
    assert set(m["kf"]) == set(m["files"])
    assert len(m["files"]) == n
    assert read_version(spark, root).count() == n


def test_exec_cache_lru_and_oversize_bypass(tmp_path, monkeypatch):
    """VERDICT r9 ask #5 + ADVICE r9: the executor sidecar cache moves
    a hit to most-recently-used (a re-probed filter survives an
    eviction pass), keeps a running byte total, and serves an over-cap
    bitmap without inserting it."""
    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.kf")
        with open(p, "wb") as f:
            f.write(bytes([i]) * 100)
        paths.append(p)
    big = str(tmp_path / "big.kf")
    with open(big, "wb") as f:
        f.write(b"\xff" * 1000)
    monkeypatch.setattr(vmod, "_KF_EXEC_CACHE", {})
    monkeypatch.setattr(vmod, "_KF_EXEC_CACHE_BYTES", 0)
    monkeypatch.setattr(vmod, "_KF_EXEC_CACHE_CAP", 250)
    vmod._kf_exec_raw(paths[0], None)
    vmod._kf_exec_raw(paths[1], None)
    # re-probe f0: without move-to-end it would be evicted next
    assert vmod._kf_exec_raw(paths[0], None) == b"\x00" * 100
    vmod._kf_exec_raw(paths[2], None)  # over cap: evicts LRU = f1
    assert paths[0] in vmod._KF_EXEC_CACHE, "re-probed filter evicted"
    assert paths[1] not in vmod._KF_EXEC_CACHE
    assert vmod._KF_EXEC_CACHE_BYTES == sum(
        len(b) for b in vmod._KF_EXEC_CACHE.values()
    )
    # oversize bitmap: correct bytes back, never cached, total unmoved
    before = vmod._KF_EXEC_CACHE_BYTES
    assert vmod._kf_exec_raw(big, None) == b"\xff" * 1000
    assert big not in vmod._KF_EXEC_CACHE
    assert vmod._KF_EXEC_CACHE_BYTES == before


def test_manifest_cache_detects_equal_size_replace(spark, root):
    """ADVICE r9: the raw-manifest cache must key on inode too — an
    os.replace rewrite of equal size with a (forced) equal mtime would
    otherwise serve the stale cached form."""
    write_version(spark, _kv(spark, [1]), root)
    path = vmod._manifest_path(root, 1)
    old = vmod._load_manifest_raw(root, 1)  # warm the cache
    st = os.stat(path)
    raw = json.load(open(path))
    raw["op"] = "XPPEND"  # same length as "append"
    tmp = path + ".tmp-test"
    with open(tmp, "w") as f:
        json.dump(raw, f)
    os.utime(tmp, ns=(st.st_atime_ns, st.st_mtime_ns))
    os.replace(tmp, path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns))
    st2 = os.stat(path)
    assert (st2.st_mtime_ns, st2.st_size) == (st.st_mtime_ns, st.st_size)
    got = vmod._load_manifest_raw(root, 1)
    assert got["op"] == "XPPEND", "stale cache served across os.replace"
    assert old["op"] == "append"


def test_read_manifest_returns_fresh_containers(spark, root):
    """ADVICE r9: mutating read_manifest's returned containers must
    not corrupt later reads (the raw cache shares nested objects)."""
    write_version(spark, _kv(spark, [1, 2]), root,
                  stats_cols=["id"], key_filter_cols=["id"])
    write_version(spark, _kv(spark, [3]), root)  # a delta manifest
    for v in (1, 2):
        m = read_manifest(root, v)
        m["files"].clear()
        m["stats"].clear()
        m["kf"].clear()
        m.get("added", []).clear()
        m.get("dvs", ["x"]).clear()
        m2 = read_manifest(root, v)
        assert m2["files"] and m2["stats"] and m2["kf"], (
            f"v{v}: caller mutation leaked into the manifest cache"
        )
    assert read_version(spark, root).count() == 3
