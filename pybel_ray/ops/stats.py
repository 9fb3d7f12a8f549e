"""Distributed second-moment statistics over an embedding column.

:func:`gram_matrix_e12` computes the Gram matrix ``Xᵀ X`` (the input to
covariance / PCA / whitening) in ONE streaming pass: each batch
quantizes its vectors to integer micro-units and multiplies out a local
``dim × dim`` int64 matrix; the driver folds the per-batch partials in
arbitrary-precision Python ints, so the merge can never overflow and
the result is EXACT — layout-independent, float-free, and reproducible
in DuckDB by the same quantize-then-multiply integer arithmetic (the
oracle for ``emb_gram_matrix``).  Merge traffic is ``dim·(dim+1)/2``
rows per batch; nothing shuffles.

Per-batch bound: |v| ≤ 2³¹ micros and batch ≤ 2 M rows keeps every
int64 cell within range (raises otherwise).  The final cells must fit
int64 to surface as an Arrow column; at corpus scales beyond that,
re-scale the quantization (the driver fold itself is unbounded).

Reference scope note: the reference engine has no vector statistics;
this is the beyond-reference training-data surface (SURVEY.md §2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .similarity import _matrix

__all__ = [
    "gram_matrix_e12", "quantize_micros", "pca_project",
    "standardize_stats", "standardize_apply", "centroid_by",
    "select_kth_e6", "exact_median_e6", "select_quantiles_e6",
    "median_by_selection",
    "mad_e6",
    "mad_by_selection",
    "quantile_by_selection",
    "winsorize_by",
    "robust_outliers_by",
]

_INT64_MAX = (1 << 63) - 1


def quantize_micros(mat: np.ndarray) -> np.ndarray:
    """float matrix → int64 micro-units, round-half-up
    (``floor(v·1e6 + 0.5)`` — the repo's shared quantization, identical
    to the SQL expression)."""
    return np.floor(mat * 1e6 + 0.5).astype(np.int64)


def gram_matrix_e12(ds, vec_col: str = "embedding"):
    """Upper-triangle Gram matrix rows ``(i, j, gram_e12, n_rows)`` with
    1-based dim indices (matching SQL's 1-based list indexing),
    ``gram_e12 = Σ_rows v_i·v_j`` in squared micro-units."""

    def _partial(t: pa.Table) -> pa.Table:
        m = _matrix(t, vec_col)
        if not len(m):
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 2
                + [pa.array([], pa.binary()), pa.array([], pa.int64())],
                names=["dim", "n", "gram", "rows"],
            )
        q = quantize_micros(m)
        if np.abs(q).max(initial=0) >= (1 << 31) or len(q) > 2_000_000:
            raise ValueError(
                "per-batch int64 bound exceeded: re-scale quantization "
                "or lower batch_size",
            )
        g = q.T @ q  # exact int64 within the documented bound
        # one row per batch: dim + row count + the raw int64 cells
        return pa.Table.from_arrays(
            [
                pa.array([g.shape[0]], pa.int64()),
                pa.array([len(q)], pa.int64()),
                pa.array([g.tobytes()], pa.binary()),
                pa.array([len(q)], pa.int64()),
            ],
            names=["dim", "n", "gram", "rows"],
        )

    parts = ds.select_columns([vec_col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    total = None
    n_rows = 0
    dim = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        for k in range(b.num_rows):
            dim = int(b.column("dim")[k].as_py())
            g = np.frombuffer(
                b.column("gram")[k].as_py(), dtype=np.int64,
            ).reshape(dim, dim)
            # arbitrary-precision fold: Python ints never overflow
            obj = g.astype(object)
            total = obj if total is None else total + obj
            n_rows += int(b.column("rows")[k].as_py())
    if total is None:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["i", "j", "gram_e12", "n_rows"],
        )
    iu, ju = np.triu_indices(dim)
    vals = [int(total[a, b_]) for a, b_ in zip(iu, ju)]
    if any(abs(v) > _INT64_MAX for v in vals):
        raise ValueError(
            "gram cell exceeds int64: re-scale the quantization",
        )
    return pa.Table.from_arrays(
        [
            pa.array((iu + 1).astype(np.int64), pa.int64()),
            pa.array((ju + 1).astype(np.int64), pa.int64()),
            pa.array(vals, pa.int64()),
            pa.array([n_rows] * len(vals), pa.int64()),
        ],
        names=["i", "j", "gram_e12", "n_rows"],
    )


def pca_project(
    ds, k: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
):
    """Distributed PCA projection: exact integer second moments
    (:func:`gram_matrix_e12` plus an exact column-sum pass) build the
    covariance on the driver, ``np.linalg.eigh`` takes the top-``k``
    components (sign fixed: largest-|loading| coordinate positive, so
    the basis is deterministic), and one broadcast ``map_batches``
    matmul emits the scores — the dimensionality-reduction step before
    clustering/visualization.

    Scale: two streaming passes over the vectors (dim×dim partials and
    a dim-length sum per batch; nothing shuffles), a dim×dim driver
    eigendecomposition, then a zero-shuffle projection pass.  No SQL
    oracle (eigendecomposition is not SQL); pinned by a numpy-reference
    pytest.  Returns long rows ``(id, component, score)``.
    """
    gram = gram_matrix_e12(ds, vec_col)
    n = int(gram.column("n_rows")[0].as_py()) if gram.num_rows else 0
    if n == 0:
        raise ValueError("empty input")
    ii = np.asarray(gram.column("i").to_numpy(zero_copy_only=False)) - 1
    jj = np.asarray(gram.column("j").to_numpy(zero_copy_only=False)) - 1
    vv = np.asarray(
        gram.column("gram_e12").to_numpy(zero_copy_only=False), np.float64,
    )
    dim = int(jj.max()) + 1
    g = np.zeros((dim, dim), np.float64)
    g[ii, jj] = vv
    g[jj, ii] = vv

    # exact int64 column sums of the quantized vectors (micros)
    def _sums(t: pa.Table) -> pa.Table:
        m = _matrix(t, vec_col)
        q = quantize_micros(m) if len(m) else np.zeros((0, dim), np.int64)
        return pa.Table.from_arrays(
            [pa.array([q.sum(axis=0).tobytes()], pa.binary())],
            names=["s"],
        )

    sums = np.zeros(dim, dtype=object)
    for b in ds.select_columns([vec_col]).map_batches(
        _sums, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for raw in b.column("s").to_pylist():
            sums = sums + np.frombuffer(raw, np.int64).astype(object)
    mean = sums.astype(np.float64) / n

    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :k]  # descending eigenvalue order
    # deterministic sign: the largest-|loading| coordinate is positive
    for c in range(comps.shape[1]):
        a = int(np.abs(comps[:, c]).argmax())
        if comps[a, c] < 0:
            comps[:, c] = -comps[:, c]
    comps_f = np.ascontiguousarray(comps)

    def _project(t: pa.Table) -> pa.Table:
        m = _matrix(t, vec_col)
        q = quantize_micros(m).astype(np.float64)
        centered = q - mean.astype(np.float64)
        scores = centered @ comps_f  # n × k float64
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        nrow = len(m)
        idv = np.repeat(
            np.asarray(ids.to_numpy(zero_copy_only=False), np.int64),
            comps_f.shape[1],
        )
        jv = np.tile(np.arange(comps_f.shape[1], dtype=np.int64), nrow)
        return pa.Table.from_arrays(
            [pa.array(idv), pa.array(jv),
             pa.array(scores.reshape(-1), pa.float64())],
            names=[id_col, "component", "score"],
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        _project, batch_format="pyarrow",
    )


def standardize_stats(ds, vec_col: str = "embedding") -> pa.Table:
    """Per-dimension mean/std of an embedding column, quantized ONCE to
    int64 micros: ``(dim0, mean_e6, std_e6)`` with 0-based ``dim0``.

    Exact integer first/second moments in ONE streaming pass (per batch:
    a dim-length int64 sum + sum-of-squares; the driver folds in
    arbitrary-precision Python ints), then ``var = (n·Σx² − (Σx)²)/n²``
    as an exact rational and one float sqrt per dimension quantized to
    micros.  The quantized table is the snapshot contract: scoring with
    it is pure int64 arithmetic any engine reproduces bit-for-bit.
    """

    def _moments(t: pa.Table) -> pa.Table:
        m = _matrix(t, vec_col)
        if not len(m):
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.binary()),
                 pa.array([], pa.binary())],
                names=["n", "s", "ss"],
            )
        q = quantize_micros(m)
        if np.abs(q).max(initial=0) >= (1 << 31) or len(q) > 2_000_000:
            raise ValueError(
                "per-batch int64 bound exceeded: re-scale quantization "
                "or lower batch_size",
            )
        return pa.Table.from_arrays(
            [pa.array([len(q)], pa.int64()),
             pa.array([q.sum(axis=0).tobytes()], pa.binary()),
             pa.array([(q.astype(np.int64) ** 2).sum(axis=0).tobytes()],
                      pa.binary())],
            names=["n", "s", "ss"],
        )

    n = 0
    s = ss = None
    for b in ds.select_columns([vec_col]).map_batches(
        _moments, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for k in range(b.num_rows):
            n += int(b.column("n")[k].as_py())
            sv = np.frombuffer(b.column("s")[k].as_py(), np.int64)
            ssv = np.frombuffer(b.column("ss")[k].as_py(), np.int64)
            s = sv.astype(object) if s is None else s + sv.astype(object)
            ss = ssv.astype(object) if ss is None else ss + ssv.astype(object)
    if not n:
        raise ValueError("empty input")
    dim = len(s)
    mean_e6 = np.array(
        [(int(v) * 2 + n) // (2 * n) if v >= 0
         else -((-int(v) * 2 + n) // (2 * n)) for v in s],
        np.int64,
    )  # round-half-away on the exact rational Σx/n
    std_e6 = np.empty(dim, np.int64)
    for d in range(dim):
        var_num = n * int(ss[d]) - int(s[d]) ** 2  # exact, in e12·n²
        std = (var_num / (n * n)) ** 0.5
        std_e6[d] = int(np.floor(std + 0.5))
    return pa.Table.from_arrays(
        [pa.array(np.arange(dim, dtype=np.int64)),
         pa.array(mean_e6), pa.array(std_e6)],
        names=["dim0", "mean_e6", "std_e6"],
    )


def standardize_apply(ds, stats: pa.Table, vec_col: str = "embedding",
                      id_col: str = "vec_id"):
    """Z-score standardization against a :func:`standardize_stats`
    snapshot: long rows ``(id, dim0, z_e6)`` with
    ``z_e6 = ((x_e6 − mean_e6) · 1e6) // std_e6`` — int64 arithmetic
    with TRUNCATING division (DuckDB ``//`` semantics, so the snapshot
    oracle reproduces every cell); ``std_e6 = 0`` yields null.

    Zero shuffle: the tiny stats table ships in the closure, each batch
    is one vectorized subtract/divide.
    """
    mean = stats.column("mean_e6").to_numpy(zero_copy_only=False)
    std = stats.column("std_e6").to_numpy(zero_copy_only=False)

    def _apply(t: pa.Table) -> pa.Table:
        m = _matrix(t, vec_col)
        q = quantize_micros(m)
        numer = (q - mean[None, :]) * 1_000_000
        denom = np.where(std == 0, 1, std)[None, :]
        z = np.sign(numer) * (np.abs(numer) // denom)
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        nrow, dim = q.shape
        idv = np.repeat(
            np.asarray(ids.to_numpy(zero_copy_only=False), np.int64), dim,
        )
        dv = np.tile(np.arange(dim, dtype=np.int64), nrow)
        zmask = np.broadcast_to(std == 0, z.shape).reshape(-1)
        return pa.Table.from_arrays(
            [pa.array(idv), pa.array(dv),
             pa.array(z.reshape(-1).astype(np.int64), pa.int64(),
                      mask=zmask)],
            names=[id_col, "dim0", "z_e6"],
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        _apply, batch_format="pyarrow",
    )


def corr_stats(ds, x_col: str, y_col: str, scale: int = 100) -> pa.Table:
    """Exact correlation/regression sufficient statistics for two
    numeric columns: one row ``(n, sum_x, sum_y, sum_xx, sum_yy,
    sum_xy)`` with both columns quantized to integers
    (``floor(v*scale+0.5)``) so every sum is exact int64-free Python-int
    arithmetic on the driver fold (per-batch partials are int64;
    cross-products of quantized values can exceed int64, so partials
    accumulate as Python ints via per-batch object sums).

    Rows where either side is null are dropped (SQL ``corr`` pairwise
    semantics).  Pearson r / OLS slope derive downstream as
    ``(n*sxy - sx*sy) / sqrt(...)`` — the float step happens once, on
    the six exact integers, never inside the distributed pass.
    """

    def _partial(t: pa.Table) -> pa.Table:
        x = t.column(x_col).combine_chunks()
        y = t.column(y_col).combine_chunks()
        keep = pc.and_kleene(pc.is_valid(x), pc.is_valid(y))
        x = x.filter(keep)
        y = y.filter(keep)
        xv = np.floor(
            x.to_numpy(zero_copy_only=False).astype(np.float64) * scale + 0.5,
        ).astype(np.int64).astype(object)
        yv = np.floor(
            y.to_numpy(zero_copy_only=False).astype(np.float64) * scale + 0.5,
        ).astype(np.int64).astype(object)
        vals = [
            len(xv), int(xv.sum()), int(yv.sum()),
            int((xv * xv).sum()), int((yv * yv).sum()),
            int((xv * yv).sum()),
        ] if len(xv) else [0, 0, 0, 0, 0, 0]
        return pa.Table.from_arrays(
            [pa.array([str(v)], pa.string()) for v in vals],
            names=["n", "sx", "sy", "sxx", "syy", "sxy"],
        )

    totals = [0] * 6
    names = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    for row in ds.select_columns([x_col, y_col]).map_batches(
        _partial, batch_format="pyarrow",
    ).take_all():  # one row per block
        for i, k in enumerate(names):
            totals[i] += int(row[k])
    return pa.Table.from_arrays(
        [pa.array([totals[0]], pa.int64())]
        + [pa.array([str(v)], pa.string()) for v in totals[1:]],
        names=["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"],
    )


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — SQL ``//`` semantics
    (DuckDB truncates; Python ``//`` floors, so -7//2 differs)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def corr_stats_by(
    ds,
    group_col: str,
    x_col: str,
    y_col: str,
    x_scale: int = 1,
    y_scale: int = 10**6,
) -> pa.Table:
    """Per-group exact OLS/correlation sufficient statistics + exact
    integer-micros slope/intercept: one output row per group with
    ``(n, sum_x, sum_y, sum_xx, sum_yy, sum_xy, slope_e6,
    intercept_e6)``.

    Both columns quantize to integers (``floor(v*scale+0.5)``; an
    INTEGER column at ``scale=1`` bypasses the float step and keeps its
    exact ints — the float path rounds magnitudes >= 2^53, so pass
    pre-scaled integer columns for epoch-nano-grade values); every
    partial is a Python-int (arbitrary precision) string so no
    cross-product can overflow.  Each BLOCK emits one partial row per
    group it sees — the driver folds ``blocks x groups`` rows, so group
    cardinality must be small (segments/types, not user ids); the rows
    themselves never leave the cluster.  Null x or y rows drop
    (pairwise semantics); null group keys drop.

    ``slope_e6 = (n*sxy - sx*sy) * 1e6 // (n*sxx - sx^2)`` and
    ``intercept_e6 = (sy*1e6 - slope_e6*sx) // n`` with TRUNCATING
    division (:func:`_tdiv`) so a DuckDB HUGEINT ``//`` oracle
    reproduces both bit-for-bit.  The intercept deliberately derives
    from the already-truncated ``slope_e6`` — the exact rational form
    ``(sy*den - num*sx)*1e6 // (n*den)`` needs >128-bit intermediates
    on epoch-scale x values, which the SQL mirror cannot hold.
    Degenerate groups (n == 0 or zero x-variance) emit null
    slope/intercept.
    """

    def _quant(col: pa.Array, scale: int) -> np.ndarray:
        # integer column at scale 1: take the exact ints — routing them
        # through float64 would round values >= 2^53 (e.g. epoch-nanos)
        # and silently break the bit-for-bit HUGEINT-oracle contract
        if scale == 1 and pa.types.is_integer(col.type):
            return col.to_numpy(zero_copy_only=False).astype(
                np.int64,
            ).astype(object)
        return np.floor(
            col.to_numpy(zero_copy_only=False).astype(np.float64)
            * scale + 0.5,
        ).astype(np.int64).astype(object)

    def _partials(t: pa.Table) -> pa.Table:
        g = t.column(group_col).combine_chunks()
        x = t.column(x_col).combine_chunks()
        y = t.column(y_col).combine_chunks()
        keep = pc.and_kleene(
            pc.is_valid(g),
            pc.and_kleene(pc.is_valid(x), pc.is_valid(y)),
        )
        g = g.filter(keep)
        xv = _quant(x.filter(keep), x_scale)
        yv = _quant(y.filter(keep), y_scale)
        gv = np.asarray(g.to_pylist(), dtype=object)
        rows = {k: [] for k in
                ("g", "n", "sx", "sy", "sxx", "syy", "sxy")}
        for key in sorted(set(gv.tolist())):  # small by contract
            m = gv == key
            xs, ys = xv[m], yv[m]
            rows["g"].append(key)
            rows["n"].append(str(len(xs)))
            rows["sx"].append(str(int(xs.sum())))
            rows["sy"].append(str(int(ys.sum())))
            rows["sxx"].append(str(int((xs * xs).sum())))
            rows["syy"].append(str(int((ys * ys).sum())))
            rows["sxy"].append(str(int((xs * ys).sum())))
        return pa.Table.from_arrays(
            [pa.array(rows["g"])] + [
                pa.array(rows[k], pa.string())
                for k in ("n", "sx", "sy", "sxx", "syy", "sxy")
            ],
            names=["g", "n", "sx", "sy", "sxx", "syy", "sxy"],
        )

    folded: dict = {}
    for row in ds.select_columns([group_col, x_col, y_col]).map_batches(
        _partials, batch_format="pyarrow",
    ).take_all():  # blocks x groups rows, bounded by contract
        acc = folded.setdefault(row["g"], [0] * 6)
        for i, k in enumerate(("n", "sx", "sy", "sxx", "syy", "sxy")):
            acc[i] += int(row[k])

    out = {k: [] for k in
           (group_col, "n", "sum_x", "sum_y", "sum_xx", "sum_yy",
            "sum_xy", "slope_e6", "intercept_e6")}
    for key in sorted(folded):
        n, sx, sy, sxx, syy, sxy = folded[key]
        out[group_col].append(key)
        out["n"].append(n)
        for name, v in (("sum_x", sx), ("sum_y", sy), ("sum_xx", sxx),
                        ("sum_yy", syy), ("sum_xy", sxy)):
            out[name].append(str(v))
        den = n * sxx - sx * sx
        if n == 0 or den == 0:
            out["slope_e6"].append(None)
            out["intercept_e6"].append(None)
        else:
            num = n * sxy - sx * sy
            slope = _tdiv(num * 10**6, den)
            out["slope_e6"].append(str(slope))
            out["intercept_e6"].append(
                str(_tdiv(sy * 10**6 - slope * sx, n)),
            )
    return pa.Table.from_arrays(
        [pa.array(out[group_col]),
         pa.array(out["n"], pa.int64())] + [
            pa.array(out[k], pa.string())
            for k in ("sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy",
                      "slope_e6", "intercept_e6")
        ],
        names=[group_col, "n", "sum_x", "sum_y", "sum_xx", "sum_yy",
               "sum_xy", "slope_e6", "intercept_e6"],
    )


def centroid_by(ds, label_col: str, vec_col: str = "embedding"):
    """Per-label embedding centroid in exact integer micros — one output
    row per ``(label, dim)``: ``(label, dim, n, centroid_e6)`` with
    1-based dims (matching SQL ``unnest .. WITH ORDINALITY``) and
    ``centroid_e6 = Σ floor(v·1e6 + 0.5) // n`` (truncating division —
    DuckDB ``//`` semantics via :func:`_tdiv`).

    Each batch quantizes its vectors and emits ``labels·dim`` partial
    sum rows (a label-indexed ``np.add.at`` scatter — no Python loop
    over rows); ONE ``groupby((label, dim))`` exchange folds them, so
    the vectors themselves never shuffle and no label group has to fit
    one worker.  Null labels are dropped (SQL GROUP BY emits a null
    group; callers wanting it should fill upstream).  int64-safe while
    ``rows_per_label · 1e6 · max|v|`` stays under 2⁶³ (~9.2e12 unit-norm
    vectors per label).

    Reference scope note: no reference analog; this is the
    beyond-reference training-data surface (cluster prototypes /
    class means for SemDeDup-style pipelines, SURVEY.md §2).
    """

    def _partials(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], t.schema.field(label_col).type),
             pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=[label_col, "dim", "s", "n"],
        )
        lab = t.column(label_col)
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        keep = pc.is_valid(lab)
        if not pc.all(keep).as_py():
            t = t.filter(keep)
            lab = t.column(label_col)
            if isinstance(lab, pa.ChunkedArray):
                lab = lab.combine_chunks()
        if t.num_rows == 0:
            return empty
        q = quantize_micros(_matrix(t, vec_col))
        dim = q.shape[1]
        labv = lab.to_numpy(zero_copy_only=False)
        uniq, inv, counts = np.unique(
            labv, return_inverse=True, return_counts=True,
        )
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        k = len(uniq)
        return pa.Table.from_arrays(
            [pa.array(np.repeat(uniq, dim), type=lab.type),
             pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), k)),
             pa.array(sums.reshape(-1)),
             pa.array(np.repeat(counts.astype(np.int64), dim))],
            names=[label_col, "dim", "s", "n"],
        )

    agg = ds.map_batches(_partials, batch_format="pyarrow") \
        .groupby([label_col, "dim"]).sum(["s", "n"])

    def _finish(t: pa.Table) -> pa.Table:
        s = t.column("sum(s)").to_numpy(zero_copy_only=False)
        n = t.column("sum(n)").to_numpy(zero_copy_only=False)
        cent = np.array(
            [_tdiv(int(a), int(b)) for a, b in zip(s, n)], dtype=np.int64,
        ) if len(s) else np.zeros(0, np.int64)
        return pa.Table.from_arrays(
            [t.column(label_col), t.column("dim"),
             pa.array(n.astype(np.int64)), pa.array(cent)],
            names=[label_col, "dim", "n", "centroid_e6"],
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def select_kth_e6(ds, col: str, k: int) -> int:
    """EXACT k-th smallest (1-based, among non-null rows) of
    ``floor(col·1e6 + 0.5)`` — distributed selection WITHOUT a global
    sort: iterative 256-ary histogram narrowing.  Each pass streams the
    (materialized, single-int64-column) dataset once and ships 256
    counts per block to the driver; the candidate range shrinks 256×
    per pass, so ≤ ⌈bits/8⌉ ≈ 7 passes cover any micro-quantized double
    domain.  This is the scale path for exact medians/percentiles when
    a full sort exchange is not worth it and a DDSketch bound is not
    exact enough.

    int64-safe while ``|v_e6| ≤ 2^54`` (the in-pass arithmetic computes
    ``(v − lo)·256`` which then stays under 2^63).

    Reference scope note: no reference analog; beyond-reference
    training-data surface (SURVEY.md §2).
    """
    qs = _quantized_column(ds, col)
    return _select_kth_from(qs, k)


def _quantized_column(ds, col: str):
    """Materialized single-column dataset ``q = floor(col·1e6 + 0.5)``
    with nulls dropped — the shared input of the selection passes."""

    def _quant(t: pa.Table) -> pa.Table:
        v = t.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v = v.drop_null()
        q = np.floor(
            v.to_numpy(zero_copy_only=False).astype(np.float64)
            * 1e6 + 0.5,
        ).astype(np.int64)
        return pa.Table.from_arrays([pa.array(q)], names=["q"])

    return ds.select_columns([col]).map_batches(
        _quant, batch_format="pyarrow",
    ).materialize()


def _select_kth_from(qs, k: int) -> int:
    return _select_kths_from(qs, [k])[0]


def _select_kths_from(qs, ks) -> list:
    """All ``ks`` (1-based ranks) resolved together: every pass runs ONE
    ``map_batches`` over the quantized column that histograms EVERY
    still-open rank's candidate range, so the pass count stays ≤ ~7
    regardless of how many quantiles are requested."""
    for k in ks:
        if k < 1:
            raise ValueError("k is 1-based")
    n = qs.count()
    for k in ks:
        if k > n:
            raise ValueError(
                "k={} exceeds the {} non-null rows".format(k, n),
            )
    glo = int(qs.min("q"))
    ghi = int(qs.max("q"))
    if abs(glo) >= 1 << 54 or abs(ghi) >= 1 << 54:
        raise ValueError("|v_e6| exceeds 2^54-1; rescale upstream")

    # per rank: (remaining rank within [lo, hi], lo, hi); values below
    # lo are accounted for by shrinking the rank as the range narrows
    states = {i: (k, glo, ghi) for i, k in enumerate(ks)}
    resolved: dict = {}
    while states:
        open_spec = [
            (sid, lo, hi, hi - lo + 1)
            for sid, (k, lo, hi) in states.items() if lo < hi
        ]
        for sid, (k, lo, hi) in list(states.items()):
            if lo == hi:
                resolved[sid] = lo
                del states[sid]
        if not open_spec:
            break

        def _hist(t: pa.Table, _spec=tuple(open_spec)) -> pa.Table:
            v = t.column("q").to_numpy(zero_copy_only=False)
            sids, counts = [], []
            for sid, lo, hi, w in _spec:
                m = v[(v >= lo) & (v <= hi)]
                b = ((m - lo) * 256) // w
                sids.append(np.full(256, sid, np.int64))
                counts.append(np.bincount(b, minlength=256)
                              .astype(np.int64))
            return pa.Table.from_arrays(
                [pa.array(np.concatenate(sids)),
                 pa.array(np.tile(np.arange(256, dtype=np.int64),
                                  len(_spec))),
                 pa.array(np.concatenate(counts))],
                names=["sid", "bucket", "c"],
            )

        agg = {sid: np.zeros(256, dtype=np.int64)
               for sid, _, _, _ in open_spec}
        for blk in qs.map_batches(
            _hist, batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            sv = blk.column("sid").to_numpy(zero_copy_only=False)
            bv = blk.column("bucket").to_numpy(zero_copy_only=False)
            cv = blk.column("c").to_numpy(zero_copy_only=False)
            for sid in np.unique(sv):
                sel = sv == sid
                np.add.at(agg[int(sid)], bv[sel], cv[sel])
        for sid, lo, hi, width in open_spec:
            k = states[sid][0]
            cum = np.cumsum(agg[sid])
            b = int(np.searchsorted(cum, k))
            if b:
                k -= int(cum[b - 1])
            # bucket b covers [lo + ceil(b*w/256), lo+ceil((b+1)*w/256)-1]
            new_lo = lo + -((-b * width) // 256)
            new_hi = lo + -((-(b + 1) * width) // 256) - 1
            if (new_lo, new_hi) == (lo, hi):  # width < 256: exact buckets
                resolved[sid] = new_lo
                del states[sid]
            else:
                states[sid] = (k, new_lo, new_hi)
    return [resolved[i] for i in range(len(ks))]


def select_quantiles_e6(ds, col: str, q_bps) -> pa.Table:
    """Exact (lower) quantile VECTOR without a sort: one row
    ``(q_bp, value_e6, n)`` per requested basis-point quantile (2500 =
    p25), ``value_e6`` = the element at 0-based offset
    ``(n−1)·q_bp // 10000`` of the ascending non-null quantized values
    — every quantile shares the same ≤ ~7 histogram passes via
    :func:`_select_kths_from`."""
    q_bps = list(q_bps)
    for bp in q_bps:
        if not 0 <= bp <= 10000:
            raise ValueError("quantiles are basis points in [0, 10000]")
    qs = _quantized_column(ds, col)
    n = qs.count()
    if n == 0:
        raise ValueError("no non-null rows")
    ks = [(n - 1) * bp // 10000 + 1 for bp in q_bps]
    vals = _select_kths_from(qs, ks)
    return pa.table({
        "q_bp": pa.array(q_bps, pa.int64()),
        "value_e6": pa.array(vals, pa.int64()),
        "n": pa.array([n] * len(q_bps), pa.int64()),
    })


def exact_median_e6(ds, col: str) -> pa.Table:
    """One-row table ``(n, median_e6)`` — the LOWER median (the element
    at 0-based offset ``(n−1)//2`` of the ascending non-null quantized
    values, i.e. ``ORDER BY q LIMIT 1 OFFSET (n−1)//2``), found by
    the :func:`select_kth_e6` machinery in ≤ 7 histogram passes with no
    sort; the quantized column materializes ONCE and both the count and
    the selection ride it."""
    qs = _quantized_column(ds, col)
    n = qs.count()
    if n == 0:
        return pa.table({"n": pa.array([0], pa.int64()),
                         "median_e6": pa.array([None], pa.int64())})
    med = _select_kth_from(qs, (n - 1) // 2 + 1)
    return pa.table({"n": pa.array([n], pa.int64()),
                     "median_e6": pa.array([med], pa.int64())})


def median_by_selection(ds, group_col: str, value_col: str,
                        group_budget: int = 65536) -> pa.Table:
    """EXACT per-group lower median ``(group, n, median_e6)`` WITHOUT
    co-locating any group: the histogram-narrowing selection runs for
    EVERY group simultaneously — each pass is ONE vectorized
    ``map_batches`` over the (group, quantized-value) column pair that
    bins each row into its own group's candidate range (a gather
    against the broadcast per-group (lo, width) state), emitting only
    the non-empty ``(group, bucket)`` count pairs.  ≤ ~7 passes total
    regardless of group count; driver state is O(groups) and gated by
    ``group_budget`` (raise it deliberately for wider group domains).

    This is the skew-proof alternative to
    :func:`~pybel_ray.ops.relational.groupby_quantiles` (which needs
    each key group to fit one worker): a degenerate hot group costs no
    more than its share of the streaming passes.  Null groups and null
    values are dropped (SQL GROUP BY + aggregate-ignores-null
    semantics).
    """
    qs = _quantized_group_column(ds, group_col, value_col)
    return _median_by_from(qs, group_col, group_budget)


def _quantized_group_column(ds, group_col: str, value_col: str):
    """Materialized ``(g, q)`` dataset — null groups/values dropped,
    values quantized ``floor(v*1e6 + 0.5)``; the shared input of the
    per-group selection passes."""

    def _quant(t: pa.Table) -> pa.Table:
        g = t.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        v = t.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        keep = pc.and_(pc.is_valid(g), pc.is_valid(v))
        g = g.filter(keep)
        v = v.filter(keep)
        q = np.floor(
            v.to_numpy(zero_copy_only=False).astype(np.float64)
            * 1e6 + 0.5,
        ).astype(np.int64)
        return pa.Table.from_arrays([g, pa.array(q)], names=["g", "q"])

    return ds.select_columns([group_col, value_col]).map_batches(
        _quant, batch_format="pyarrow",
    ).materialize()


def _median_by_from(qs, group_col: str, group_budget: int,
                    q_bp: int | None = None,
                    out_name: str = "median_e6") -> pa.Table:
    """Shared per-group selection core over a materialized ``(g, q)``
    dataset (q already int64 micros): used by
    :func:`median_by_selection`, :func:`mad_by_selection` and
    :func:`quantile_by_selection`.  ``q_bp`` (basis points) selects the
    rank ``(n - 1) * q_bp // 10000 + 1`` — SQL ``ORDER BY q LIMIT 1
    OFFSET (n-1)*q_bp//10000``; ``None`` keeps the lower-median rank."""
    import ray

    # one tiny aggregate: per-group n / lo / hi
    bounds = qs.groupby("g").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Min("q"),
        ray.data.aggregate.Max("q"),
    ).take_all()
    if len(bounds) > group_budget:
        raise ValueError(
            "median_by_selection: {} groups exceed group_budget={}; "
            "raise it deliberately (driver state is O(groups))".format(
                len(bounds), group_budget,
            ),
        )
    groups = sorted(r["g"] for r in bounds)
    gidx = {g: i for i, g in enumerate(groups)}
    n_arr = np.zeros(len(groups), np.int64)
    lo_arr = np.zeros(len(groups), np.int64)
    hi_arr = np.zeros(len(groups), np.int64)
    for r in bounds:
        i = gidx[r["g"]]
        n_arr[i] = r["count()"]
        lo_arr[i] = r["min(q)"]
        hi_arr[i] = r["max(q)"]
    if len(groups) and (np.abs(lo_arr).max() >= 1 << 54
                        or np.abs(hi_arr).max() >= 1 << 54):
        raise ValueError("|v_e6| exceeds 2^54-1; rescale upstream")
    if q_bp is None:
        k_arr = (n_arr - 1) // 2 + 1  # lower-median rank per group
    else:
        k_arr = (n_arr - 1) * q_bp // 10000 + 1
    group_keys = pa.array(groups)

    while True:
        open_mask = lo_arr < hi_arr
        if not open_mask.any():
            break
        w_arr = np.where(open_mask, hi_arr - lo_arr + 1, 1)
        st = ray.put((group_keys, lo_arr.copy(), hi_arr.copy(),
                      w_arr.copy(), open_mask.copy()))

        def _hist(t: pa.Table, _st=st) -> pa.Table:
            keys, lo, hi, w, op = ray.get(_st)
            gid = pc.index_in(
                t.column("g").combine_chunks(), value_set=keys,
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            q = t.column("q").to_numpy(zero_copy_only=False)
            ok = op[gid] & (q >= lo[gid]) & (q <= hi[gid])
            gid, q = gid[ok], q[ok]
            b = ((q - lo[gid]) * 256) // w[gid]
            code = gid * 256 + b
            uniq, cnt = np.unique(code, return_counts=True)
            return pa.Table.from_arrays(
                [pa.array(uniq), pa.array(cnt.astype(np.int64))],
                names=["code", "c"],
            )

        agg: dict = {}
        for blk in qs.map_batches(
            _hist, batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            for code, c in zip(blk.column("code").to_numpy(zero_copy_only=False),
                               blk.column("c").to_numpy(zero_copy_only=False)):
                agg[int(code)] = agg.get(int(code), 0) + int(c)

        for i in np.flatnonzero(open_mask):
            counts = np.zeros(256, np.int64)
            for b in range(256):
                counts[b] = agg.get(int(i) * 256 + b, 0)
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, k_arr[i]))
            if b:
                k_arr[i] -= int(cum[b - 1])
            width = int(w_arr[i])
            new_lo = lo_arr[i] + -((-b * width) // 256)
            new_hi = lo_arr[i] + -((-(b + 1) * width) // 256) - 1
            if (new_lo, new_hi) == (lo_arr[i], hi_arr[i]):
                hi_arr[i] = lo_arr[i] = new_lo  # width < 256: exact
            else:
                lo_arr[i], hi_arr[i] = new_lo, new_hi

    return pa.Table.from_arrays(
        [group_keys, pa.array(n_arr), pa.array(lo_arr)],
        names=[group_col, "n", out_name],
    )


def mad_e6(ds, col: str) -> pa.Table:
    """One-row table ``(n, median_e6, mad_e6)``: the EXACT lower median
    of ``floor(col·1e6 + 0.5)`` and the exact lower median of the
    absolute deviations ``|q − median|`` — the robust scale estimate
    (median absolute deviation) behind outlier gates that trimmed means
    and stddevs get wrong on heavy-tailed data.

    Runs entirely on the :func:`select_kth_e6` histogram-narrowing
    machinery: the quantized column materializes once, the deviation
    column once, and each selection costs ≤ ~7 streaming passes of 256
    counts per block — no sort exchange at any point.
    """
    qs = _quantized_column(ds, col)
    n = qs.count()
    if n == 0:
        return pa.Table.from_arrays(
            [pa.array([0], pa.int64()),
             pa.array([None], pa.int64()),
             pa.array([None], pa.int64())],
            names=["n", "median_e6", "mad_e6"],
        )
    k = (n - 1) // 2 + 1
    med = _select_kth_from(qs, k)

    def _dev(t: pa.Table) -> pa.Table:
        q = np.asarray(
            t.column("q").to_numpy(zero_copy_only=False), np.int64,
        )
        return pa.Table.from_arrays(
            [pa.array(np.abs(q - med))], names=["q"],
        )

    dev = qs.map_batches(_dev, batch_format="pyarrow").materialize()
    mad = _select_kth_from(dev, k)
    return pa.Table.from_arrays(
        [pa.array([n], pa.int64()),
         pa.array([med], pa.int64()),
         pa.array([mad], pa.int64())],
        names=["n", "median_e6", "mad_e6"],
    )


def mad_by_selection(ds, group_col: str, value_col: str,
                     group_budget: int = 65536) -> pa.Table:
    """EXACT per-group robust location+scale ``(group, n, median_e6,
    mad_e6)``: the lower median and the lower median of absolute
    deviations, both in integer micros — :func:`mad_e6` per group,
    WITHOUT co-locating any group.  Values must satisfy
    ``|v_e6| <= 2^53`` so the deviations (up to twice the value range)
    stay inside the selection core's ±2^54 bound.

    Two rounds of the :func:`median_by_selection` histogram-narrowing
    core (≤ ~14 streaming passes total): the per-group medians broadcast
    via one ``ray.put`` and a stateless pass rewrites each row to its
    absolute deviation IN INTEGER SPACE (no float round trip), then
    the second selection runs on the deviation column.  Driver state stays O(groups), gated by
    ``group_budget``; a degenerate hot group costs only its share of the
    streaming passes.
    """
    import ray

    qs = _quantized_group_column(ds, group_col, value_col)
    med_tbl = _median_by_from(qs, group_col, group_budget)
    if med_tbl.num_rows == 0:
        return pa.Table.from_arrays(
            [med_tbl.column(group_col),
             pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=[group_col, "n", "median_e6", "mad_e6"],
        )
    keys = med_tbl.column(group_col).combine_chunks()
    meds = np.asarray(
        med_tbl.column("median_e6").to_numpy(zero_copy_only=False),
        np.int64,
    )
    st = ray.put((keys, meds))

    def _dev(t: pa.Table, _st=st) -> pa.Table:
        import ray as _ray

        k_, m_ = _ray.get(_st)
        gid = pc.index_in(
            t.column("g").combine_chunks(), value_set=k_,
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.asarray(
            t.column("q").to_numpy(zero_copy_only=False), np.int64,
        )
        return pa.Table.from_arrays(
            [t.column("g"), pa.array(np.abs(q - m_[gid]))],
            names=["g", "q"],
        )

    dev_qs = qs.map_batches(_dev, batch_format="pyarrow").materialize()
    mad_tbl = _median_by_from(dev_qs, group_col, group_budget)
    # both rounds enumerate the same sorted group keys by construction;
    # verify (an explicit raise — survives python -O, unlike assert)
    if not mad_tbl.column(group_col).combine_chunks().equals(keys):
        raise RuntimeError(
            "mad_by_selection: group key order diverged between the"
            " median and deviation rounds",
        )
    return pa.Table.from_arrays(
        [keys, med_tbl.column("n"), med_tbl.column("median_e6"),
         mad_tbl.column("median_e6")],
        names=[group_col, "n", "median_e6", "mad_e6"],
    )


def quantile_by_selection(ds, group_col: str, value_col: str,
                          q_bp: int,
                          group_budget: int = 65536) -> pa.Table:
    """EXACT per-group discrete quantile ``(group, n, q_e6)`` at ``q_bp``
    basis points (``q_bp=9000`` → p90: the order statistic at rank
    ``(n-1)*q_bp//10000 + 1``, i.e. SQL ``ORDER BY v LIMIT 1 OFFSET
    (n-1)*q_bp//10000``) — the same skew-proof histogram-narrowing
    machinery as :func:`median_by_selection` (≤ ~7 streaming passes, no
    group co-location, O(groups) driver state), generalized to any
    rank.  Completes the family: median → arbitrary percentile.
    """
    if not 0 <= q_bp <= 10000:
        raise ValueError("q_bp must be in [0, 10000]")
    qs = _quantized_group_column(ds, group_col, value_col)
    return _median_by_from(
        qs, group_col, group_budget, q_bp=q_bp, out_name="q_e6",
    )


def winsorize_by(ds, group_col: str, value_col: str,
                 lo_bp: int = 500, hi_bp: int = 9500,
                 out_col: str | None = None,
                 group_budget: int = 65536):
    """Per-group winsorization: clamp ``value_col`` to its group's exact
    discrete [``lo_bp``, ``hi_bp``] basis-point quantiles (default
    p05/p95) — the robust tail-clipping step before averaging noisy
    metrics.  Returns the input rows with ``out_col`` (default
    ``<value>_wins_e6``) = the clamped value in integer micros.

    Both cut points come from ONE run of the skew-proof per-group
    selection core each (:func:`quantile_by_selection`); the tiny
    (group, lo, hi) table broadcasts via ``ray.put`` and a stateless
    vectorized pass clamps — no group ever co-locates, null
    groups/values pass through with a null output.
    """
    import ray

    out_col = out_col or value_col + "_wins_e6"
    # quantize once; both cut points ride the same materialized (g, q)
    qs = _quantized_group_column(ds, group_col, value_col)
    lo_t = _median_by_from(qs, group_col, group_budget, q_bp=lo_bp,
                           out_name="q_e6")
    hi_t = _median_by_from(qs, group_col, group_budget, q_bp=hi_bp,
                           out_name="q_e6")
    keys = lo_t.column(group_col).combine_chunks()
    lo_v = np.asarray(lo_t.column("q_e6").to_numpy(zero_copy_only=False),
                      np.int64)
    hi_v = np.asarray(hi_t.column("q_e6").to_numpy(zero_copy_only=False),
                      np.int64)
    st = ray.put((keys, lo_v, hi_v))

    def _clamp(t: pa.Table, _st=st) -> pa.Table:
        import ray as _ray

        k_, lo_, hi_ = _ray.get(_st)
        g = t.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        v = t.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        gid = pc.index_in(g, value_set=k_).to_numpy(zero_copy_only=False)
        vf = v.to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(vf * 1e6 + 0.5)
        ok = ~(np.isnan(q) | np.isnan(gid.astype(np.float64)))
        gi = np.where(ok, gid, 0).astype(np.int64)
        clamped = np.clip(q, lo_[gi], hi_[gi])
        out = pa.array(
            np.where(ok, clamped, 0).astype(np.int64), pa.int64(),
        )
        out = pc.if_else(pa.array(ok), out, pa.nulls(t.num_rows, pa.int64()))
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, out)

    return ds.map_batches(_clamp, batch_format="pyarrow")


def robust_outliers_by(ds, group_col: str, value_col: str,
                       k_e6: int = 3_000_000,
                       group_budget: int = 65536) -> pa.Table:
    """Per-group robust outlier counts ``(group, n, n_outliers)``: a row
    is an outlier when ``|q - median| * 1e6 > k_e6 * mad`` (default
    ``k_e6=3e6`` — the classic 3-MAD gate) — the heavy-tail-safe
    anomaly count that stddev gates get wrong.  All integer arithmetic
    (the comparison cross-multiplies, no division), so the DuckDB
    oracle matches bit-for-bit; groups whose MAD is 0 count any
    deviation as an outlier (strict > 0 comparison).

    One :func:`mad_by_selection` run (≤ ~14 streaming passes) + one
    broadcast counting pass; only (group, counters) rows reach the
    driver.
    """
    import ray

    mt = mad_by_selection(ds, group_col, value_col,
                          group_budget=group_budget)
    keys = mt.column(group_col).combine_chunks()
    med = np.asarray(mt.column("median_e6").to_numpy(zero_copy_only=False),
                     np.int64)
    mad = np.asarray(mt.column("mad_e6").to_numpy(zero_copy_only=False),
                     np.int64)
    st = ray.put((keys, med, mad))

    def _partial(t: pa.Table, _st=st) -> pa.Table:
        import ray as _ray

        k_, m_, d_ = _ray.get(_st)
        g = t.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        v = t.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        keep = pc.and_(pc.is_valid(g), pc.is_valid(v))
        g = g.filter(keep)
        v = v.filter(keep)
        gid = np.asarray(
            pc.index_in(g, value_set=k_).to_numpy(zero_copy_only=False),
            np.int64,
        )
        q = np.floor(
            v.to_numpy(zero_copy_only=False).astype(np.float64) * 1e6 + 0.5,
        ).astype(np.int64)
        dev = np.abs(q - m_[gid]).astype(object) * 1_000_000
        thresh = d_[gid].astype(object) * int(k_e6)
        flags = (dev > thresh).astype(np.int64)
        counts = np.zeros(len(k_), np.int64)
        totals = np.zeros(len(k_), np.int64)
        np.add.at(counts, gid, flags)
        np.add.at(totals, gid, 1)
        nz = np.flatnonzero(totals)
        return pa.Table.from_arrays(
            [pc.take(k_, pa.array(nz, pa.int64())),
             pa.array(totals[nz]), pa.array(counts[nz])],
            names=[group_col, "n", "n_outliers"],
        )

    agg: dict = {}
    for b in ds.select_columns([group_col, value_col]).map_batches(
        _partial, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for g_, n_, c_ in zip(
            b.column(group_col).to_pylist(), b.column("n").to_pylist(),
            b.column("n_outliers").to_pylist(),
        ):
            cur = agg.setdefault(g_, [0, 0])
            cur[0] += int(n_)
            cur[1] += int(c_)
    ks = sorted(agg)
    return pa.Table.from_arrays(
        [pa.array(ks),
         pa.array([agg[g][0] for g in ks], pa.int64()),
         pa.array([agg[g][1] for g in ks], pa.int64())],
        names=[group_col, "n", "n_outliers"],
    )
