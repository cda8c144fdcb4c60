"""``search`` command: stream reads against one or more databases.

Producer/consumer layout of the reference command
(/root/reference/kmcp/cmd/search.go) recast as batch processing: reads are
accumulated into fixed-size batches, searched with the vectorized engine,
and written in input order (order is inherent — no reorder buffer needed).
"""

from __future__ import annotations

import sys
import time

from ..index.format import find_db_dirs
from ..search.engine import SearchEngine, SearchOptions
from ..search.tsv import HEADER, write_results, write_stats
from ..seqio.fastx import read_fastx, xopen


def iter_queries(
    files: list[str],
    read1: str | None,
    read2: str | None,
    whole_file: bool,
    use_filename: bool,
    query_id: str,
    k_max: int,
):
    """Yield (id, seq, seq2|None) queries (search.go:793-1000)."""
    if read1 and read2:
        it1, it2 = read_fastx(read1), read_fastx(read2)
        for r1, r2 in zip(it1, it2):
            yield r1.id, r1.seq, r2.seq
        leftover = next(it1, None) or next(it2, None)
        if leftover is not None:
            print(
                "[search] WARNING: -1/-2 files have unequal record counts; "
                f"extra records from '{leftover.id}' on were ignored",
                file=sys.stderr,
            )
        return
    if read1:
        files = [read1] + files
    if read2:
        files = [read2] + files
    for file in files:
        if whole_file:
            seqs, rid = [], None
            for rec in read_fastx(file):
                if rid is None:
                    if use_filename:
                        import os

                        rid = os.path.basename(file)
                        for ext in (".gz",):
                            if rid.endswith(ext):
                                rid = rid[: -len(ext)]
                        root = rid.rsplit(".", 1)
                        rid = root[0] if len(root) == 2 else rid
                    elif query_id:
                        rid = query_id
                    else:
                        rid = rec.id
                seqs.append(rec.seq)
            if not seqs:
                continue
            big = (b"N" * (k_max - 1)).join(seqs)
            yield rid, big, None
        else:
            for rec in read_fastx(file):
                yield rec.id, rec.seq, None


def run_search(
    db_dir: str,
    files: list[str] | None = None,
    read1: str | None = None,
    read2: str | None = None,
    out_file: str = "-",
    opt: SearchOptions | None = None,
    whole_file: bool = False,
    use_filename: bool = False,
    query_id: str = "",
    no_header_row: bool = False,
    batch_queries: int = 8192,
    verbose: bool = True,
) -> tuple[int, int]:
    opt = opt or SearchOptions()
    paired = bool(read1 and read2)
    opt.paired_fpr_buf = paired

    db_dirs = find_db_dirs(db_dir)
    if not db_dirs:
        raise SystemExit(f"kmcp-tpu search: invalid database: {db_dir}")
    engine = SearchEngine(db_dirs, opt)
    if opt.load_default_name_map and not opt.name_map:
        import os

        nm_path = os.path.join(db_dirs[0], "name_mapping.tsv")
        if os.path.isfile(nm_path):
            with open(nm_path) as f:
                opt.name_map = dict(
                    line.rstrip("\n").split("\t", 1) for line in f if line.strip()
                )

    k_max = max(engine.dbs[0].info.ks)
    if verbose:
        # the reference's "[main parameters]" block (search.go:412-420)
        print(
            "[search] main parameters:\n"
            f"  database: {db_dir}\n"
            f"  backend: {opt.backend}, paired: {paired}, "
            f"whole-file: {whole_file}\n"
            f"  min-query-len: {opt.min_query_len}, "
            f"min-kmers: {opt.min_kmers}, "
            f"query-cov: {opt.min_query_cov}, "
            f"target-cov: {opt.min_target_cov}, "
            f"max-fpr: {opt.max_fpr}\n"
            f"  sort-by: {opt.sort_by}, "
            f"keep-top-scores: {opt.keep_top_scores}, "
            f"keep-unmatched: {opt.keep_unmatched}, "
            f"try-se: {opt.try_se}",
            file=sys.stderr,
        )
    t0 = time.time()

    if out_file == "-":
        out = sys.stdout
        close = False
    else:
        out = xopen(out_file, "wt")
        close = True
    try:
        if not no_header_row:
            out.write(HEADER)

        # fast streaming path: single-end or paired reads vs a plain
        # single-group DB (paired mates stream on host AND on the
        # single-block device backend; multi-block paired is host-only)
        if not whole_file:
            from ..search.stream import StreamSearcher

            if StreamSearcher.usable(engine, paired=paired):
                streamer = StreamSearcher(engine)
                progress = None
                if verbose:
                    # live throughput line per drained batch, the
                    # reference's every-8192-queries log (search.go:740-744)
                    def progress(done, _t0=t0):
                        el = time.time() - _t0
                        if el > 0:
                            print(
                                f"[search] {done} queries done at "
                                f"{done / 1e6 / (el / 60):.3f} M queries/min",
                                file=sys.stderr,
                            )

                total, matched = streamer.run(
                    iter_queries(
                        files or [], read1, read2, False, use_filename,
                        query_id, k_max,
                    ),
                    out,
                    paired=paired,
                    progress=progress,
                )
                if verbose:
                    el = time.time() - t0
                    speed = total / 1e6 / (el / 60) if el > 0 else 0
                    pct = matched / total * 100 if total else 0.0
                    print(
                        f"[search] processed {total} queries at "
                        f"{speed:.3f} M queries/min (streaming); "
                        f"{pct:.4f}% matched",
                        file=sys.stderr,
                    )
                write_stats(out, total, matched)
                return total, matched

        total = matched = 0
        batch: list[tuple[str, bytes, bytes | None]] = []

        def flush():
            nonlocal total, matched
            if not batch:
                return
            results = engine.search_batch(batch, start_idx=total)
            t, m = write_results(out, results, opt.keep_unmatched)
            total += t
            matched += m
            if verbose:
                el = time.time() - t0
                speed = total / 1e6 / (el / 60) if el > 0 else 0
                print(
                    f"\rprocessed queries: {total}, speed: {speed:.3f} "
                    "million queries per minute",
                    end="",
                    file=sys.stderr,
                )
            batch.clear()

        for q in iter_queries(
            files or [], read1, read2, whole_file, use_filename, query_id, k_max
        ):
            batch.append(q)
            if len(batch) >= batch_queries:
                flush()
        flush()
        if verbose:
            print(file=sys.stderr)
            pct = matched / total * 100 if total else 0.0
            print(
                f"[search] {pct:.4f}% ({matched}/{total}) queries matched",
                file=sys.stderr,
            )
        write_stats(out, total, matched)
    finally:
        if close:
            out.close()
    return total, matched
