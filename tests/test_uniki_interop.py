"""Reference-format interop (.uniki / __db.yml, index/uniki.py).

KNOWN LIMITATION — the oracle is self-referential: the reference repo
ships no reference-built .uniki binary anywhere (verified round 2), and
there is no Go toolchain in this image, so these tests round-trip OUR
writer through OUR reader.  A shared bug in both (e.g. a mirrored bit
order) would pass.  What anchors the layout to reality: the byte layout
is transcribed field-by-field from serialization.go:32-348, and the
round-tripped DB must reproduce the demo-searching FracMinHash golden
table bit-for-bit — the same numbers a reference-built database yields.
Revisit if a reference-built binary fixture ever becomes available.
"""

import os

import numpy as np
import pytest

from .conftest import REFERENCE_DIR, reference_available
from .test_golden_search import GOLDEN_MINHASH, run_cli

REFS = os.path.join(REFERENCE_DIR, "demo-searching", "refs")


def test_bit_layout_round_trip():
    """MSB-first reference byte columns <-> LSB-first uint32 words."""
    from kmcp_tpu.index.uniki import ref_bytes_to_words, words_to_ref_bytes

    rng = np.random.default_rng(3)
    for num_targets in (1, 7, 8, 9, 31, 32, 33, 100):
        rb = (num_targets + 7) // 8
        ref = rng.integers(0, 256, size=(50, rb), dtype=np.uint8)
        # zero bits beyond the real targets (writer invariant)
        tail_bits = rb * 8 - num_targets
        if tail_bits:
            # MSB-first: real targets occupy the top bits of the last byte
            ref[:, -1] &= np.uint8((0xFF << tail_bits) & 0xFF)
        words = ref_bytes_to_words(ref)
        # target t of word t//32 bit t%32 == reference byte t//8 bit 7-t%8
        for t in (0, num_targets - 1, num_targets // 2):
            col_w = (words[:, t >> 5] >> np.uint32(t & 31)) & np.uint32(1)
            col_r = (ref[:, t >> 3] >> np.uint8(7 - (t & 7))) & np.uint8(1)
            assert np.array_equal(col_w.astype(np.uint8), col_r), t
        back = words_to_ref_bytes(words, num_targets)
        assert np.array_equal(back, ref)


def test_db_yml_round_trip(tmp_path):
    from kmcp_tpu.index.uniki import read_db_yml, write_db_yml

    fields = {
        "version": 4, "unikiVersion": 4, "alias": "demo", "k": 21,
        "ks": [21, 31], "hashed": True, "canonical": True,
        "scaled": False, "scale": 1, "minimizer": False,
        "minimizer-w": 0, "syncmer": False, "syncmer-s": 0,
        "split-seq": True, "split-size": 0, "split-num": 10,
        "split-overlap": 150, "compact-size": True, "hashes": 1,
        "fpr": 0.3, "numNameGroups": 15, "blocksize": 8,
        "totalKmers": 123456789,
        "files": ["_block001.uniki", "_block002.uniki"],
    }
    p = tmp_path / "__db.yml"
    write_db_yml(str(p), fields)
    got = read_db_yml(str(p))
    assert got == fields


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
def test_ref_layout_round_trip_golden(tmp_path):
    """Export our compat-layout demo DB to the reference layout, load it
    back through the .uniki reader, and reproduce the FracMinHash golden
    table bit-for-bit (demo-searching/README.md:102-109)."""
    kdir = tmp_path / "k31-minhash"
    db = tmp_path / "k31-minhash.db"
    run_cli(
        "compute", "--in-dir", REFS, "-B", "plasmid", "-k", "31",
        "-D", "1000", "-O", str(kdir), "--force",
    )
    run_cli(
        "-j", "40", "index", "-I", str(kdir), "-O", str(db),
        "-n", "3", "-f", "0.01", "--force",
    )
    refdb = tmp_path / "ref-layout"
    run_cli(
        "utils", "export-ref-db", str(db), "-O", str(refdb), "-a", "demo"
    )
    assert (refdb / "R001" / "__db.yml").is_file()
    assert (refdb / "R001" / "__name_mapping.tsv").is_file()
    unikis = sorted((refdb / "R001").glob("_block*.uniki"))
    assert unikis

    query = os.path.join(REFS, "NC_018658.1.fasta.gz")
    out_ref = run_cli(
        "-q", "search", "-d", str(refdb), "-g", "-t", "0.5", "-s", "jacc",
        query,
    )
    rows = [
        l.split("\t") for l in out_ref.splitlines()
        if l and not l.startswith("#")
    ]
    assert len(rows) == len(GOLDEN_MINHASH)
    for row, (target, qcov, tcov, jacc) in zip(rows, GOLDEN_MINHASH):
        assert row[5] == target
        assert (row[11], row[12], row[13]) == (qcov, tcov, jacc)

    # byte-identical to searching the native-layout DB
    out_native = run_cli(
        "-q", "search", "-d", str(db), "-g", "-t", "0.5", "-s", "jacc",
        query,
    )
    assert out_ref == out_native

    # passing the R-dir directly also works (reference accepts both)
    out_rdir = run_cli(
        "-q", "search", "-d", str(refdb / "R001"), "-g", "-t", "0.5",
        "-s", "jacc", query,
    )
    assert out_rdir == out_native


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
def test_uniki_header_and_utils(tmp_path):
    """Header fields survive the round trip; utils index-info / ref-info
    read the reference layout (index-info.go:72-114, util-db-info.go)."""
    from kmcp_tpu.index.uniki import load_ref_db, read_uniki

    kdir = tmp_path / "ks"
    db = tmp_path / "db"
    run_cli(
        "compute", "--in-dir", REFS, "-B", "plasmid", "-k", "21",
        "-n", "2", "-O", str(kdir), "--force",
    )
    run_cli(
        "index", "-I", str(kdir), "-O", str(db), "-n", "2", "-f", "0.1",
        "--force",
    )
    refdb = tmp_path / "ref"
    run_cli("utils", "export-ref-db", str(db), "-O", str(refdb))

    uniki = sorted((refdb / "R001").glob("_block*.uniki"))[0]
    h, body = read_uniki(str(uniki))
    assert h.version == 4 and h.k == 21 and h.num_hashes == 2
    assert h.canonical
    assert body.shape == (h.num_sigs, h.num_row_bytes)
    assert len(h.names) == len(h.sizes) == len(h.indices)

    info, blocks = load_ref_db(str(refdb / "R001"))
    assert info.ks == [21] and info.num_hashes == 2
    from kmcp_tpu.index.format import read_block_meta

    meta0 = read_block_meta(str(db), 0)
    rmeta0 = blocks[0][0]
    assert rmeta0.names[: meta0.num_targets] == meta0.names[: meta0.num_targets]
    assert rmeta0.sizes[: meta0.num_targets] == meta0.sizes[: meta0.num_targets]

    out = run_cli("utils", "index-info", str(uniki))
    assert ".uniki" in out and "\t21\t" in out
    out = run_cli("utils", "index-info", str(refdb))
    assert "_block001.uniki" in out
    out = run_cli("utils", "ref-info", str(refdb))
    assert "chunkIdx" in out and len(out.splitlines()) > 2
