"""Measure recall@10 of every ANN rung against the exact cosine
top-k — the reproducible source of every recall number quoted in
docs/SCALE.md and the similarity docstrings.

Usage::

    python scripts/ann_recall.py [sf_dir ...]

Defaults to sf0.001, sf0.01 and sf0.1. Also reprints the
numpy-replicated trained-RESIDUAL evaluation (the variant the repo
deliberately does NOT ship as a Spark rung because this measurement
shows it loses to raw codes on unclustered data): an exact mirror of
``trained_pq_codebook``'s integer Lloyd semantics applied to
residual subvectors, run in numpy because a one-off evaluation does
not justify a full oracle-checked rung.

Finally prints the COARSE-TRAINING matrix — {seeded, Lloyd-trained}
coarse quantizer × {raw, residual} trained PQ codes, all in the
rungs' exact-integer semantics — the measurement behind the decision
NOT to ship a trained-coarse IVFPQ rung either (r10): on the
isotropic fixture, training the coarse cells leaves raw-code recall
flat (0.38 at sf0.1, same as seeded) and lifts residual codes from
broken (0.12) only to 0.30, still below the shipped raw-code rung.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_RUNGS = [
    "sim_search_ivfpq",
    "sim_search_pq",
    "sim_search_ivfadc_residual",
    "sim_search_ivfpq_trained",
]


def _topk_sets(df):
    rows = df.select("query_id", "neighbor_id").collect()
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def spark_recalls(sf_dirs):
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.session import get_spark

    registry.load_all()
    spark = get_spark("dps-ann-recall")
    for sf_dir in sf_dirs:
        exact = _topk_sets(registry.QUERIES["sim_search"](spark, sf_dir))
        total = sum(len(v) for v in exact.values())
        for name in _RUNGS:
            approx = _topk_sets(registry.QUERIES[name](spark, sf_dir))
            hits = sum(
                len(exact[q] & approx.get(q, set())) for q in exact
            )
            print(f"{sf_dir} {name}: recall@10 = {hits / total:.2f}")


def _rhu(x):
    """Round half AWAY FROM ZERO, matching Spark ``F.round`` /
    DuckDB ``round`` at digit 0 — np.rint is half-to-EVEN, which
    diverges on every exact .5 (sum=5,count=2 → rint 2, Spark 3),
    so a rint-based mirror measures a different algorithm than the
    one it claims to replicate (r10 review)."""
    import numpy as np

    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def residual_trained_recall(sf_dir, iters=2):
    """Numpy mirror of the integer Lloyd scheme on RESIDUAL
    subvectors (vector − its coarse cell centroid, micro-units) —
    per-cell ADC tables, same tie-breaks, same rounded-mean updates.
    Mirrors the Spark rungs' exact arithmetic: HALF_UP quantization
    and centroid updates (``_rhu``), and coarse assignment as
    per-subspace DOUBLE squared distances rounded to micro-units
    then summed (``_ivfpq_coarse``'s cdist_u), not full-vector
    integer distance on pre-quantized vectors."""
    import numpy as np

    from data_pipeline_spark_spark.operators.similarity import (
        _IVFPQ_CELLS,
        _IVFPQ_NPROBE,
        _N_QUERIES,
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        _TOP_K,
    )

    import duckdb

    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchnumpy()
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    n = len(X)
    Xu = _rhu(X * 1e6)
    C = Xu[:_IVFPQ_CELLS]
    # coarse distance exactly as _ivfpq_coarse computes cdist_u:
    # per-subspace double squared distance, rounded to micro-units,
    # summed over subspaces
    Cd = X[:_IVFPQ_CELLS]
    cd = np.zeros((n, _IVFPQ_CELLS), dtype=np.int64)
    for m in range(_PQ_M):
        s = slice(m * _PQ_SUB, (m + 1) * _PQ_SUB)
        cd += _rhu(
            ((X[:, None, s] - Cd[None, :, s]) ** 2).sum(axis=2) * 1e6
        )
    assign = cd.argmin(axis=1)
    probes = {
        q: list(np.lexsort((np.arange(_IVFPQ_CELLS), cd[q]))[:_IVFPQ_NPROBE])
        for q in range(_N_QUERIES)
    }
    R = Xu - C[assign]
    cents = np.stack(
        [R[:_PQ_K, m * _PQ_SUB : (m + 1) * _PQ_SUB] for m in range(_PQ_M)]
    )
    for _ in range(iters):
        for m in range(_PQ_M):
            S = R[:, m * _PQ_SUB : (m + 1) * _PQ_SUB]
            a = ((S[:, None, :] - cents[m][None, :, :]) ** 2).sum(2).argmin(1)
            for c in range(_PQ_K):
                if (a == c).any():
                    cents[m, c] = _rhu(
                        S[a == c].sum(0) / (a == c).sum()
                    )
    codes = np.stack(
        [
            ((R[:, m * _PQ_SUB : (m + 1) * _PQ_SUB][:, None, :]
              - cents[m][None, :, :]) ** 2).sum(2).argmin(1)
            for m in range(_PQ_M)
        ],
        axis=1,
    )
    norms = np.linalg.norm(X, axis=1)
    hits = 0
    for q in range(_N_QUERIES):
        cos = np.round((X @ X[q]) / (norms * norms[q]), 4)
        idx = sorted(
            (i for i in range(n) if i != q), key=lambda i: (-cos[i], i)
        )
        exact = set(idx[:_TOP_K])
        cands = []
        for cell in probes[q]:
            qr = Xu[q] - C[cell]
            terms = np.stack(
                [
                    ((cents[m] - qr[m * _PQ_SUB : (m + 1) * _PQ_SUB]) ** 2
                     ).sum(1)
                    for m in range(_PQ_M)
                ]
            )
            for v in np.where(assign == cell)[0]:
                if v != q:
                    cands.append(
                        (sum(terms[m, codes[v, m]] for m in range(_PQ_M)), v)
                    )
        cands.sort()
        hits += len({v for _, v in cands[:_TOP_K]} & exact)
    print(
        f"{sf_dir} residual+trained (numpy mirror): "
        f"recall@10 = {hits / (_N_QUERIES * _TOP_K):.2f}"
    )


def coarse_training_matrix(sf_dir, iters=2):
    """{seeded, trained} coarse × {raw, residual} trained PQ, all
    exact-integer (micro-unit subvectors, integer distances, HALF_UP
    centroid updates, (dist, id) tie-breaks). Coarse assignment here
    is the INTEGER subspace-sum distance a trained-coarse Spark rung
    would use (the shipped seeded rung rounds per-subspace double
    distances instead — same cells on this fixture)."""
    import numpy as np

    from data_pipeline_spark_spark.operators.similarity import (
        _IVFPQ_CELLS,
        _IVFPQ_NPROBE,
        _N_QUERIES,
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        _TOP_K,
    )

    import duckdb

    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchnumpy()
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    n = len(X)
    Xu = _rhu(X * 1e6)
    S = Xu.reshape(n, _PQ_M, _PQ_SUB)

    def coarse_dist(C):
        return ((S[:, None, :, :] - C[None, :, :, :]) ** 2).sum(axis=(2, 3))

    def train_coarse():
        C = S[:_IVFPQ_CELLS].copy()
        for _ in range(iters):
            a = coarse_dist(C).argmin(axis=1)
            for c in range(_IVFPQ_CELLS):
                m = a == c
                if m.any():
                    C[c] = _rhu(S[m].sum(0) / m.sum()).reshape(
                        _PQ_M, _PQ_SUB
                    )
        return C

    def train_pq(R):
        cents = np.stack(
            [R[:_PQ_K, m * _PQ_SUB:(m + 1) * _PQ_SUB]
             for m in range(_PQ_M)]
        )
        for _ in range(iters):
            for m in range(_PQ_M):
                Sm = R[:, m * _PQ_SUB:(m + 1) * _PQ_SUB]
                a = ((Sm[:, None, :] - cents[m][None, :, :]) ** 2
                     ).sum(2).argmin(1)
                for c in range(_PQ_K):
                    if (a == c).any():
                        cents[m, c] = _rhu(
                            Sm[a == c].sum(0) / (a == c).sum()
                        )
        codes = np.stack(
            [
                ((R[:, m * _PQ_SUB:(m + 1) * _PQ_SUB][:, None, :]
                  - cents[m][None, :, :]) ** 2).sum(2).argmin(1)
                for m in range(_PQ_M)
            ],
            axis=1,
        )
        return cents, codes

    norms = np.linalg.norm(X, axis=1)
    exact = {}
    for q in range(_N_QUERIES):
        cos = np.round((X @ X[q]) / (norms * norms[q]), 4)
        idx = sorted(
            (i for i in range(n) if i != q), key=lambda i: (-cos[i], i)
        )
        exact[q] = set(idx[:_TOP_K])

    def recall(C, cents, codes, residual):
        cd = coarse_dist(C)
        assign = cd.argmin(axis=1)
        Cflat = C.reshape(_IVFPQ_CELLS, -1)
        hits = 0
        for q in range(_N_QUERIES):
            cells = np.lexsort(
                (np.arange(_IVFPQ_CELLS), cd[q])
            )[:_IVFPQ_NPROBE]
            cands = []
            for cell in cells:
                qv = Xu[q] - Cflat[cell] if residual else Xu[q]
                terms = np.stack(
                    [
                        ((cents[m] - qv[m * _PQ_SUB:(m + 1) * _PQ_SUB])
                         ** 2).sum(1)
                        for m in range(_PQ_M)
                    ]
                )
                for v in np.where(assign == cell)[0]:
                    if v != q:
                        cands.append(
                            (sum(terms[m, codes[v, m]]
                                 for m in range(_PQ_M)), v)
                        )
            cands.sort()
            hits += len({v for _, v in cands[:_TOP_K]} & exact[q])
        return hits / (_N_QUERIES * _TOP_K)

    seedC = S[:_IVFPQ_CELLS].copy()
    trC = train_coarse()
    cents, codes = train_pq(Xu)
    aT = coarse_dist(trC).argmin(axis=1)
    rcents, rcodes = train_pq(Xu - trC.reshape(_IVFPQ_CELLS, -1)[aT])
    print(
        f"{sf_dir} coarse matrix: seeded+rawPQ="
        f"{recall(seedC, cents, codes, False):.2f} trained+rawPQ="
        f"{recall(trC, cents, codes, False):.2f} trained+residPQ="
        f"{recall(trC, rcents, rcodes, True):.2f}"
    )


def nprobe_sweep(sf_dir, iters=2):
    """Recall@10 vs candidate fraction as nprobe sweeps 1→16 (=all
    cells), for the seeded and the trained raw-code rungs — the
    production tuning curve the r10 VERDICT asked for (ask #8). Same
    exact-integer semantics as the rungs (micro-unit subvectors,
    integer distances, HALF_UP updates, (dist, id) tie-breaks);
    coarse is the shipped seeded quantizer in both rows, so the only
    axis besides nprobe is whether the PQ codebook is Lloyd-trained."""
    import numpy as np

    from data_pipeline_spark_spark.operators.similarity import (
        _IVFPQ_CELLS,
        _N_QUERIES,
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        _TOP_K,
    )

    import duckdb

    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchnumpy()
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    n = len(X)
    Xu = _rhu(X * 1e6)
    S3 = Xu.reshape(n, _PQ_M, _PQ_SUB)
    C = S3[:_IVFPQ_CELLS].copy()
    cd = ((S3[:, None, :, :] - C[None, :, :, :]) ** 2).sum(axis=(2, 3))
    assign = cd.argmin(axis=1)

    def codebook(trained):
        cents = np.stack(
            [Xu[:_PQ_K, m * _PQ_SUB:(m + 1) * _PQ_SUB]
             for m in range(_PQ_M)]
        )
        if trained:
            for _ in range(iters):
                for m in range(_PQ_M):
                    Sm = Xu[:, m * _PQ_SUB:(m + 1) * _PQ_SUB]
                    a = ((Sm[:, None, :] - cents[m][None, :, :]) ** 2
                         ).sum(2).argmin(1)
                    for c in range(_PQ_K):
                        if (a == c).any():
                            cents[m, c] = _rhu(
                                Sm[a == c].sum(0) / (a == c).sum()
                            )
        codes = np.stack(
            [
                ((Xu[:, m * _PQ_SUB:(m + 1) * _PQ_SUB][:, None, :]
                  - cents[m][None, :, :]) ** 2).sum(2).argmin(1)
                for m in range(_PQ_M)
            ],
            axis=1,
        )
        return cents, codes

    norms = np.linalg.norm(X, axis=1)
    exact = {}
    for q in range(_N_QUERIES):
        cos = np.round((X @ X[q]) / (norms * norms[q]), 4)
        idx = sorted(
            (i for i in range(n) if i != q), key=lambda i: (-cos[i], i)
        )
        exact[q] = set(idx[:_TOP_K])

    for label, (cents, codes) in (
        ("seeded", codebook(False)),
        ("trained", codebook(True)),
    ):
        row = []
        for nprobe in (1, 2, 4, 8, 16):
            hits = n_cand = 0
            for q in range(_N_QUERIES):
                cells = np.lexsort(
                    (np.arange(_IVFPQ_CELLS), cd[q])
                )[:nprobe]
                cands = []
                for cell in cells:
                    terms = np.stack(
                        [
                            ((cents[m]
                              - Xu[q, m * _PQ_SUB:(m + 1) * _PQ_SUB])
                             ** 2).sum(1)
                            for m in range(_PQ_M)
                        ]
                    )
                    for v in np.where(assign == cell)[0]:
                        if v != q:
                            cands.append(
                                (sum(terms[m, codes[v, m]]
                                     for m in range(_PQ_M)), v)
                            )
                cands.sort()
                n_cand += len(cands)
                hits += len({v for _, v in cands[:_TOP_K]} & exact[q])
            row.append(
                f"nprobe={nprobe}: "
                f"{hits / (_N_QUERIES * _TOP_K):.2f}"
                f"@{n_cand / (_N_QUERIES * (n - 1)):.2f}"
            )
        print(f"{sf_dir} {label} recall@cand_frac  " + "  ".join(row))


if __name__ == "__main__":
    sweep_only = "--sweep" in sys.argv
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    if sweep_only:
        for d in dirs:
            nprobe_sweep(d)
        sys.exit(0)
    spark_recalls(dirs)
    for d in dirs:
        residual_trained_recall(d)
    for d in dirs:
        coarse_training_matrix(d)
    for d in dirs:
        nprobe_sweep(d)
