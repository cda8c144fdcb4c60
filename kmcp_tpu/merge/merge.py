"""``merge`` — k-way merge of search results from multiple databases.

Behavioral equivalent of /root/reference/kmcp/cmd/merge.go: results of the
same query (matched by the trailing ``queryIdx`` column) are merged across
files, re-sorted by score descending (qcov/tcov/jacc column), the ``hits``
column is rewritten, query-ID consistency and per-file query counts are
verified, and the '#' stat lines are regenerated.

This is the offline "reduce" of the reference's cluster sharding story;
the multi-host TPU path does the same reduction with on-ICI collectives
(kmcp_tpu/parallel/sharding.py), but the file-level merge remains for
pipeline compatibility.
"""

from __future__ import annotations

import heapq
import sys

import numpy as np

from ..seqio.fastx import xopen

HEADER = (
    "#query\tqLen\tqKmers\tFPR\thits\ttarget\tchunkIdx\tchunks\ttLen\t"
    "kSize\tmKmers\tqCov\ttCov\tjacc\tqueryIdx\n"
)

SCORE_FIELD = {"qcov": 11, "tcov": 12, "jacc": 13}


def _iter_results(path: str, score_field: int):
    """Yield (query_idx, query_id, [(score, fields)...]) groups plus a final
    ('stats', dict)."""
    stats: dict[str, str] = {}
    cur_idx = None
    cur_id = None
    rows: list[tuple[float, list[str]]] = []
    with xopen(path, "rt") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line[0] == "#":
                if ":" in line and line.startswith("# "):
                    key, _, val = line[2:].partition(": ")
                    stats[key] = val
                continue
            fields = line.split("\t")
            qidx = int(fields[-1])
            if cur_idx is not None and qidx != cur_idx:
                yield cur_idx, cur_id, rows
                rows = []
            cur_idx = qidx
            cur_id = fields[0]
            rows.append((float(fields[score_field]), fields))
    if cur_idx is not None:
        yield cur_idx, cur_id, rows
    yield None, None, stats


def _run_merge_native(files: list[str], out, score_field: int) -> None:
    """Columnar merge: one C++ scan per file (row spans + queryIdx +
    score), a global lexsort (queryIdx asc, score desc, stream order for
    ties — the heap merge's exact ordering for queryIdx-sorted inputs),
    then one C++ emit pass that splices the rewritten hits column."""
    from ..kmer import native

    bufs = []
    scans = []
    off = 0
    for path in files:
        with xopen(path, "rb") as f:
            b = f.read()
        try:
            d = native.merge_scan(b, score_field)
        except ValueError:
            raise SystemExit("invalid kmcp search result format")
        d["row_off"] = d["row_off"] + off
        d["hits_off"] = d["hits_off"] + off
        off += len(b)
        bufs.append(b)
        scans.append(d)
    buf = b"".join(bufs)
    qidx = np.concatenate([d["qidx"] for d in scans])
    score = np.concatenate([d["score"] for d in scans])
    n = len(qidx)
    order = np.lexsort((np.arange(n), -score, qidx))
    qs = qidx[order]
    if n:
        new_group = np.concatenate(([True], qs[1:] != qs[:-1]))
        group_id = np.cumsum(new_group) - 1
        counts = np.bincount(group_id).astype(np.int32)
        hits = counts[group_id]
        matched = len(counts)
    else:
        hits = np.empty(0, dtype=np.int32)
        matched = 0
    data = native.merge_emit(
        buf, order,
        np.concatenate([d["row_off"] for d in scans]),
        np.concatenate([d["row_len"] for d in scans]),
        np.concatenate([d["hits_off"] for d in scans]),
        np.concatenate([d["hits_len"] for d in scans]),
        np.concatenate([d["qid_len"] for d in scans]),
        qidx, hits,
    )
    out.write(data.decode("utf-8", "surrogateescape"))

    totals = [d["total_queries"] for d in scans]
    nonzero = [t for t in totals if t != 0]
    total = nonzero[0] if nonzero else 0
    for t in nonzero[1:]:
        if t != total:
            raise SystemExit(
                f"different numbers of queries across input files "
                f"({total} vs {t}) — please make sure they come from "
                "the same input query"
            )
    out.write(f"# input queries: {total}\n")
    out.write(f"# matched queries: {matched}\n")
    pct = matched / total * 100 if total else 0.0
    out.write(f"# matched percentage: {pct:.4f}%\n")


def run_merge(
    files: list[str],
    out_file: str = "-",
    keep_top_scores: int = 0,
    sort_by: str = "qcov",
    do_not_sort: bool = False,
    no_header_row: bool = False,
) -> None:
    score_field = SCORE_FIELD[sort_by]
    out = sys.stdout if out_file == "-" else xopen(out_file, "wt")
    try:
        if not no_header_row:
            out.write(HEADER)

        if len(files) == 1:
            print("[merge] only one file given, copying", file=sys.stderr)
            with xopen(files[0], "rt") as f:
                for line in f:
                    if line.startswith("#query") or line.startswith("# "):
                        continue
                    out.write(line)
            return

        from ..kmer import native

        if native.get_lib() is not None:
            _run_merge_native(files, out, score_field)
            return

        iters = [_iter_results(f, score_field) for f in files]
        heap = []
        stats_list: list[dict] = [None] * len(files)

        def push(i):
            try:
                qidx, qid, rows = next(iters[i])
            except StopIteration:
                return
            if qidx is None:
                stats_list[i] = rows  # the stats dict
                return
            heapq.heappush(heap, (qidx, i, qid, rows))

        for i in range(len(files)):
            push(i)

        matched = 0
        while heap:
            qidx, i, qid, rows = heapq.heappop(heap)
            group = list(rows)
            gid = qid
            push(i)
            while heap and heap[0][0] == qidx:
                _, j, qid2, rows2 = heapq.heappop(heap)
                if qid2 != gid:
                    raise SystemExit(
                        f"[queryIdx: {qidx}] unmatched sequence Ids: "
                        f"'{qid2}' != '{gid}' — results must come from the "
                        "same query file"
                    )
                group.extend(rows2)
                push(j)
            matched += 1
            group.sort(key=lambda r: -r[0])
            hits = str(len(group))
            for _score, fields in group:
                fields[4] = hits
                out.write("\t".join(fields))
                out.write("\n")

        # verify + regenerate stats (merge.go:290-330,374-376)
        totals = [
            int(s.get("input queries", "0")) if s else 0 for s in stats_list
        ]
        nonzero = [t for t in totals if t != 0]
        total = nonzero[0] if nonzero else 0
        for i, t in enumerate(nonzero[1:], 1):
            if t != total:
                raise SystemExit(
                    f"different numbers of queries across input files "
                    f"({total} vs {t}) — please make sure they come from "
                    "the same input query"
                )
        out.write(f"# input queries: {total}\n")
        out.write(f"# matched queries: {matched}\n")
        pct = matched / total * 100 if total else 0.0
        out.write(f"# matched percentage: {pct:.4f}%\n")
    finally:
        if out is not sys.stdout:
            out.close()
