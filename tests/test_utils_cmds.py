"""Exercise every ``utils`` subcommand end-to-end through the CLI."""

import gzip
import os

import numpy as np
import pytest

from .conftest import REFERENCE_DIR, reference_available
from .test_golden_search import run_cli
from .test_profile_e2e import TAXDUMP, demo_db, taxid_map  # noqa: F401

REFS = os.path.join(REFERENCE_DIR, "demo-searching", "refs")


def test_cov2simi():
    out = run_cli("utils", "cov2simi", "-t", "0.55")
    q, s = out.strip().split("\t")
    # reference cubic at qcov=0.55 (profile.go:3183-3187)
    assert q == "0.550000"
    assert abs(float(s) - (87.456 + 26.410 * 0.55 - 22.008 * 0.55**2 + 7.325 * 0.55**3)) < 1e-6


def test_query_fpr():
    out = run_cli("utils", "query-fpr", "-f", "0.3", "-m", "35", "-n", "70",
                  "-a", "-H")
    lines = out.strip().splitlines()
    assert lines[0] == "fpr\tcbound\tfpr0\tnKmers\tmKmers"
    fpr, cbound = lines[1].split("\t")[:2]
    assert 0 < float(fpr) < 1
    assert 0 < float(cbound) <= 1


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
def test_kset_index_ref_info_density(demo_db, tmp_path):  # noqa: F811
    # index-info
    out = run_cli("utils", "index-info", demo_db)
    lines = out.strip().splitlines()
    assert lines[0].startswith("file\tversion")
    assert len(lines) >= 2

    # ref-info: 150 targets with sane FPR
    out = run_cli("utils", "ref-info", demo_db)
    rows = [l.split("\t") for l in out.strip().splitlines()[1:]]
    assert len(rows) == 150
    fprs = [float(r[6]) for r in rows]
    assert all(0 < f <= 0.3 + 1e-9 for f in fprs)

    # index-density
    png = tmp_path / "density"
    run_cli("utils", "index-density", demo_db, "-o", str(png), "--bins", "64")
    pgm = str(png) + ".pgm"
    with open(pgm, "rb") as f:
        assert f.read(2) == b"P5"
    # JPEG output (the reference's format, index-density.go:44-69)
    jpg = tmp_path / "density.jpg"
    run_cli("utils", "index-density", demo_db, "-o", str(jpg), "--bins", "64")
    with open(jpg, "rb") as f:
        assert f.read(2) == b"\xff\xd8"  # JFIF magic


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
def test_filter_and_merge_regions(demo_db, taxid_map, tmp_path):  # noqa: F811
    # make sliding windows of a genome (seqkit sliding equivalent)
    from kmcp_tpu.seqio.fastx import read_fastx

    ref = os.path.join(
        REFERENCE_DIR, "demo-profiling", "refs", "GCF_000017205.1.fa.gz"
    )
    seq = b"".join(r.seq for r in read_fastx(ref))[:20000]
    fq = tmp_path / "win.fa"
    with open(fq, "w") as f:
        for start in range(0, len(seq) - 100, 10):
            f.write(
                f">GCF_000017205.1_sliding:{start + 1}-{start + 100}\n"
                f"{seq[start:start + 100].decode()}\n"
            )
    tsv = tmp_path / "win.tsv"
    run_cli("-q", "search", "-d", demo_db, str(fq), "-o", str(tsv))

    filtered = tmp_path / "win.uniq.tsv"
    run_cli(
        "utils", "filter", str(tsv), "-o", str(filtered),
        "-T", taxid_map, "-X", TAXDUMP,
    )
    with open(filtered) as f:
        flines = [l for l in f if l.strip()]
    assert flines, "filter kept nothing"
    # all kept rows are specific to Pseudomonas aeruginosa
    assert all(l.split("\t")[5] == "GCF_000017205.1" for l in flines)

    bed = tmp_path / "win.bed"
    run_cli(
        "utils", "merge-regions", str(filtered), "-o", str(bed),
        "-l", "20",
    )
    with open(bed) as f:
        regions = [l.split("\t") for l in f if l.strip()]
    assert regions
    for r in regions:
        assert len(r) == 6
        assert int(r[1]) < int(r[2])
        assert r[3] in ("species-specific", "assembly-specific")
        assert 0 <= int(r[4]) <= 1000
    # windows from one contiguous region should merge into few regions
    assert len(regions) < 50


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
def test_split_genomes(tmp_path):
    refs = [
        os.path.join(REFS, "NC_000913.3.fasta.gz"),
        os.path.join(REFS, "NC_012971.2.fasta.gz"),
    ]
    out_dir = tmp_path / "chunks"
    run_cli(
        "utils", "split-genomes", *refs, "-O", str(out_dir), "-k", "21",
        "-n", "4", "--force",
    )
    files = sorted(os.listdir(out_dir))
    assert len(files) == 4
    # each chunk file holds the ref chunk plus assigned fragments
    from kmcp_tpu.seqio.fastx import read_fastx

    recs = list(read_fastx(out_dir / files[0]))
    assert recs[0].id.startswith("NC_000913.3")
    assert len(recs) > 1  # fragments of the other genome were assigned


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
def test_metaphlan_report_formats(demo_db, taxid_map, tmp_path):  # noqa: F811
    from .test_profile_e2e import simulate_reads

    fq, _ = simulate_reads(tmp_path)
    tsv = tmp_path / "m.tsv.gz"
    run_cli("-q", "search", "-d", demo_db, str(fq), "-o", str(tsv))
    for version in ("2", "3"):
        rep = tmp_path / f"m.v{version}"
        run_cli(
            "-q", "profile", "-T", taxid_map, "-X", TAXDUMP, "-m", "1",
            str(tsv), "-o", os.devnull,
            "-M", str(rep), "--metaphlan-report-version", version,
            "-s", "sampleX",
        )
        lines = open(f"{rep}.profile").read().splitlines()
        assert lines[0] == "#SampleID\tsampleX"
        if version == "3":
            assert lines[1].startswith("#clade_name\tNCBI_tax_id")
            data = lines[2:]
        else:
            data = lines[1:]
        assert data
        # clade rows use rank prefixes and percentages <= 100
        top = data[0].split("\t")
        assert top[0].startswith("k__")
        pct = float(top[2] if version == "3" else top[1])
        assert 0 < pct <= 100.0001
        # species rows present with full prefixed lineage
        assert any("|s__" in l.split("\t")[0] for l in data)


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
def test_cli_paired_search_and_dry_run(demo_db, tmp_path):  # noqa: F811
    """CLI-level paired (-1/-2) streaming search and index --dry-run."""
    from kmcp_tpu.seqio.fastx import read_fastx

    ref = os.path.join(
        REFERENCE_DIR, "demo-profiling", "refs", "GCF_002949675.1.fa.gz"
    )
    g = b"".join(r.seq for r in read_fastx(ref))
    rc = bytes.maketrans(b"ACGT", b"TGCA")
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(50):
            p = 1000 + i * 500
            a = g[p : p + 150].decode()
            b = g[p + 200 : p + 350].translate(rc)[::-1].decode()
            f1.write(f"@q{i}/1\n{a}\n+\n{'I' * len(a)}\n")
            f2.write(f"@q{i}/2\n{b}\n+\n{'I' * len(b)}\n")
    out = tmp_path / "p.tsv"
    run_cli("-q", "search", "-d", demo_db, "-1", str(r1), "-2", str(r2),
            "-o", str(out), "--backend", "host")
    rows = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert rows
    # paired qLen = len1 + len2 and the right target tops every read
    assert all(r[1] == "300" for r in rows)
    byq = {}
    for r in rows:
        byq.setdefault(r[0], r)
    assert all(r[5] == "GCF_002949675.1" for r in byq.values())

    # index --dry-run prints the block plan without writing
    kdir = tmp_path / "ks"
    run_cli("-q", "compute", ref, "-k", "21", "-n", "4", "-O", str(kdir),
            "--force")
    out_dir = tmp_path / "noidx"
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    res = subprocess.run(
        [_sys.executable, "-m", "kmcp_tpu", "index", "-I", str(kdir),
         "-O", str(out_dir), "--dry-run"],
        capture_output=True, text=True, env=env,
    )
    assert res.returncode == 0, res.stderr
    assert "block" in res.stderr.lower()  # plan is logged to stderr
    assert not os.path.isdir(out_dir)


def test_compute_hashed_tree_output(tmp_path):
    """--by-seq (and >1000 inputs) nests outputs in the hashed 3-level
    directory tree (compute.go:498,554-561,844-849); _info.tsv carries
    relative paths so index/kset-info work unchanged."""
    import numpy as np

    from kmcp_tpu.commands.compute import ComputeOptions, run_compute
    from kmcp_tpu.index.build import run_index
    from kmcp_tpu.kmer import kset as ksetmod

    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "multi.fa"
    with open(fa, "w") as f:
        for i in range(3):
            f.write(f">s{i}\n{rng.choice(bases, size=5000).tobytes().decode()}\n")
    out = tmp_path / "ks"
    infos = run_compute(
        out_dir=str(out), files=[str(fa)],
        opt=ComputeOptions(ks=[21], by_seq=True), force=True,
    )
    assert len(infos) == 3
    import os as _os

    for i in infos:
        rel = _os.path.relpath(i.path, str(out))
        parts = rel.split(_os.sep)
        assert len(parts) == 4, rel  # NNN/MMM/NNN/file.kset
        assert all(len(p) == 3 and p.isdigit() for p in parts[:3]), rel
        assert _os.path.isfile(i.path)
    # round-trips through _info.tsv and the index builder
    infos2 = ksetmod.read_info(str(out))
    assert sorted(i.path for i in infos2) == sorted(i.path for i in infos)
    run_index(in_dir=str(out), out_dir=str(tmp_path / "db"), force=True)


def test_progress_bar_plain_stream():
    """Non-TTY streams get rate-limited plain lines with counter,
    percentage, throughput and ETA (the reference's mpb decorators,
    compute.go:461-491); --quiet disables everything."""
    import io

    from kmcp_tpu.utils.progress import ProgressBar

    buf = io.StringIO()
    with ProgressBar(
        4, "compute", unit="files", stream=buf, min_interval=0.0
    ) as bar:
        for _ in range(4):
            bar.advance()
    out = buf.getvalue()
    lines = [l for l in out.splitlines() if l]
    assert lines, out
    assert "[compute] 4/4 files" in lines[-1]
    assert "100%" in lines[-1] and "ETA" in lines[-1]

    quiet = io.StringIO()
    with ProgressBar(4, "x", stream=quiet, enabled=False) as bar:
        bar.advance(4)
    assert quiet.getvalue() == ""


def test_autocompletion_scripts(tmp_path):
    """autocompletion emits a syntactically valid bash script generated
    from the live argparse tree (autocomplete.go:33-88), plus fish."""
    import subprocess
    import sys as _sys

    from kmcp_tpu.cli import main

    out = tmp_path / "comp.bash"
    assert main(["autocompletion", "-o", str(out)]) == 0
    script = out.read_text()
    for word in ("compute", "index", "search", "profile", "merge",
                 "--tpu-native", "--backend", "split-genomes"):
        assert word in script, word
    r = subprocess.run(["bash", "-n", str(out)], capture_output=True)
    assert r.returncode == 0, r.stderr

    fish = tmp_path / "comp.fish"
    assert main(["autocompletion", "--shell", "fish", "-o", str(fish)]) == 0
    assert "__fish_use_subcommand" in fish.read_text()
