"""The large-T cache builders must work STANDALONE on a fresh cache.

Round-4 regression: bench.py's 524k extra calls build_uniform_db()
without build_db() first; before the prepare_ks() refactor that died
with "no _info.tsv in .../ks" on a fresh container and the round's
524k field silently vanished.  Each builder now self-prepares the
shared genome+compute stage and stays idempotent.
"""

import os

import pytest

import tools.bench_large_t as blt


@pytest.fixture()
def tiny_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(blt, "CACHE", str(tmp_path))
    return str(tmp_path)


def test_build_uniform_db_standalone(tiny_cache):
    # 256 targets = 4 synthetic genomes: small enough for the suite
    db = blt.build_uniform_db(256)
    assert os.path.isfile(os.path.join(db, "db.json"))
    # the shared compute stage was self-prepared
    assert os.path.isfile(
        os.path.join(tiny_cache, "large_t-256", "ks", "_info.tsv")
    )
    # idempotent: second call returns without rebuilding (same mtime)
    mt = os.path.getmtime(os.path.join(db, "db.json"))
    assert blt.build_uniform_db(256) == db
    assert os.path.getmtime(os.path.join(db, "db.json")) == mt


def test_build_wide_db_reuses_ks(tiny_cache):
    blt.build_uniform_db(256)
    info = os.path.join(tiny_cache, "large_t-256", "ks", "_info.tsv")
    mt = os.path.getmtime(info)
    db = blt.build_wide_db(256)
    assert os.path.isfile(os.path.join(db, "db.json"))
    # compute stage was NOT redone for the second layout
    assert os.path.getmtime(info) == mt
