"""Similarity search over embedding columns.

brute_force_topk — exact cosine top-k, one scan + TakeOrdered; the
correctness baseline and still the right plan when the query side is a
handful of vectors (broadcast, no shuffle of the corpus).

lsh_ann_topk — random-hyperplane LSH: deterministic seeded planes →
sign-bit signature → candidates share a signature prefix bucket →
exact re-rank within candidates.  At 100 TB the bucket join replaces
the full scan; recall is tunable via (n_planes, prefix_bits, n_probes).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_analytics_spark.functions.vectors import cosine_similarity


def _query_lit(query_vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    df: DataFrame, vec_col: str, id_col: str, query_vec, k: int = 10
) -> DataFrame:
    """Exact cosine top-k for one query vector.

    Output: (id_col, sim) rounded to 6, ordered by (sim desc, id) —
    fully deterministic including ties.  Plan: scan + per-row fold +
    TakeOrderedAndProject (no shuffle).
    """
    sim = F.round(cosine_similarity(vec_col, _query_lit(query_vec)), 6)
    return (
        df.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def int8_adc_rerank_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    mns: list,
    mxs: list,
    shortlist: int = 50,
    k: int = 10,
) -> DataFrame:
    """Two-stage ANN over a SCALAR-QUANTIZED corpus (the FAISS-SQ8
    pattern): coarse top-``shortlist`` by ASYMMETRIC-DISTANCE dot over
    DEQUANTIZED values — each value snapped to its per-dimension
    255-step [min,max] grid, reconstructed as ``mn + code/255·(mx−mn)``
    and folded against the equally-reconstructed query — then exact fp
    cosine re-rank of the shortlist to top-``k``.  (A raw
    integer-code dot would rank by an AFFINE transform of the data —
    the per-dimension offsets add Σv cross-terms that swamp the true
    dot on near-isotropic corpora; reconstruction-ADC is the
    formulation that preserves ranking.)  This is the memory-bandwidth
    pattern SCALE.md's int8 row points at: at 100 TB the int8 codes
    (4× smaller) are the column the probe scans; the fp column is
    read only for the shortlist.  Here both stages read the same
    relation — the plan shape (scan → codegen fold → TakeOrdered →
    tiny re-rank) is the one that transfers.

    Output: (id, coarse:double rounded to 6, sim) ordered
    (sim desc, id).  The coarse fold is a sequential left fold over
    literal codebook/query arrays — the same op sequence in both
    engines, so it is value-exact under the gate (the mse_q8
    convention).  Degenerate dimensions (min = max) reconstruct to
    the constant mn on both sides.
    """
    arr = lambda vals: "array(" + ", ".join(f"{float(v)!r}D" for v in vals) + ")"
    z4 = (
        f"zip_with(zip_with(zip_with(transform({vec_col}, v -> cast(v AS double)), "
        f"{arr(mns)}, (v, mn) -> struct(v AS ev, mn AS mns)), "
        f"{arr(mxs)}, (s, mx) -> struct(s.ev AS ev, s.mns AS mns, mx AS mxs)), "
        f"{arr(query_vec)}, (s, qv) -> struct(s.ev AS ev, s.mns AS mns, "
        "s.mxs AS mxs, qv AS qv))"
    )
    deq = (
        "(CASE WHEN x.mxs = x.mns THEN x.mns ELSE "
        "x.mns + round(({v} - x.mns) / (x.mxs - x.mns) * 255) / 255.0D "
        "* (x.mxs - x.mns) END)"
    )
    coarse = (
        f"round(aggregate({z4}, 0.0D, (acc, x) -> acc + "
        + deq.format(v="x.ev")
        + " * "
        + deq.format(v="x.qv")
        + "), 6)"
    )
    short = (
        df.select(
            F.col(id_col), F.col(vec_col), F.expr(coarse).alias("coarse")
        )
        .orderBy(F.desc("coarse"), F.asc(id_col))
        .limit(shortlist)
    )
    sim = F.round(cosine_similarity(vec_col, _query_lit(query_vec)), 6)
    return (
        short.select(F.col(id_col), "coarse", sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-bit LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def signature_col(vec_col: str, planes: np.ndarray) -> F.Column:
    """Sign-bit signature as a long (bit p set ⇔ dot(vec, plane_p) >= 0).

    Built as ONE SQL string, not nested Column objects: each plane is
    64 literal weights, and py4j Column-tree construction costs ~10ms
    per nested call (PLAN.md invariant) — the expr form cuts plan BUILD
    from seconds to milliseconds at identical semantics (sequential
    left-to-right fold, double literals via the D suffix)."""
    terms = []
    for p, plane in enumerate(planes):
        weights = ", ".join(f"{float(w)!r}D" for w in plane)
        dot = (
            f"aggregate(zip_with({vec_col}, array({weights}), "
            "(x, w) -> cast(x AS double) * w), 0.0D, (acc, x) -> acc + x)"
        )
        terms.append(
            f"(CASE WHEN {dot} >= 0.0D THEN {1 << p}L ELSE 0L END)"
        )
    return F.expr("(" + " + ".join(terms) + ")")


def _probe_buckets(
    query_vec, planes: np.ndarray, prefix_bits: int, probe_radius: int
) -> set[int]:
    """The query's prefix bucket plus every bucket within Hamming
    distance <= probe_radius — shared by the scan-time filter
    (lsh_ann_topk) and the layout probe (lsh_ann_topk_pruned).

    Sequential left-to-right fold, NOT np.dot: BLAS may reorder the
    summation, and a near-zero dot whose sign flips in the last bit
    would put the query in a different bucket than the engines' own
    sequential folds (Spark F.aggregate / DuckDB list_sum) compute."""
    q = [float(x) for x in query_vec]
    q_sig = 0
    for p, plane in enumerate(planes):
        acc = 0.0
        for x, w in zip(q, plane):
            acc += x * float(w)
        if acc >= 0.0:
            q_sig |= 1 << p
    mask = (1 << prefix_bits) - 1
    q_bucket = q_sig & mask
    probe = {q_bucket}
    if probe_radius >= 1:
        for i in range(prefix_bits):
            probe.add(q_bucket ^ (1 << i))
    if probe_radius >= 2:
        for i in range(prefix_bits):
            for j in range(i + 1, prefix_bits):
                probe.add(q_bucket ^ (1 << i) ^ (1 << j))
    if probe_radius >= 3:
        raise ValueError("probe_radius > 2 not supported; lower prefix_bits")
    return probe


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    k: int = 10,
    n_planes: int = 16,
    prefix_bits: int = 8,
    seed: int = 42,
    probe_radius: int = 0,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket the corpus, rank only the
    query's bucket (prefix of the signature).  Same output shape as
    brute_force_topk; approximate (recall asserted in tests, not vs the
    SQL oracle).

    ``probe_radius`` enables MULTI-PROBE: buckets within Hamming
    distance <= r of the query's prefix are also ranked (a near-miss
    neighbor differs from the query in one or two marginal sign bits
    far more often than in many).  This is the recall dial that works
    at 100 TB: the bucket is a PARTITION/bucketing column whose layout
    is fixed on disk, so recall tunes per query by probing more
    partitions — no re-bucketing, and candidates stay
    |corpus| * probed/2^prefix_bits.  Measured on the sf0.1 corpus
    (tools/recall_probe.py): r=0 0.13, r=1 0.24, r=2 0.45 recall@10 at
    prefix_bits=8 — same layout, query-time choice.  (This corpus is
    near-random 64-dim noise — the recall CEILING is low for any
    bucketing method; what the probe demonstrates is the monotone
    recall/candidates dial, which is layout-independent.)
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    probe = _probe_buckets(query_vec, planes, prefix_bits, probe_radius)
    mask = (1 << prefix_bits) - 1
    bucket = signature_col(vec_col, planes).bitwiseAND(F.lit(mask).cast("long"))
    sim = F.round(cosine_similarity(vec_col, _query_lit(query_vec)), 6)
    return (
        df.withColumn("_bucket", bucket)
        .filter(F.col("_bucket").isin(sorted(probe)))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_centroids(dim: int, n_cells: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic spherical centroids (seeded Gaussian directions,
    L2-normalized).  A trained k-means codebook drops in here at
    production time; seeded directions keep the operator deterministic
    and oracle-checkable without an iterative training job."""
    rng = np.random.RandomState(seed)
    c = rng.randn(n_cells, dim)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _cell_col(vec_col: str, centroids: np.ndarray) -> F.Column:
    """1-based index of the best (max-dot) centroid — ties to the first,
    via array_position(scores, array_max(scores)), which both engines
    resolve identically.  One SQL expr over a 2-D centroid literal
    (data-driven transform → small codegen, cheap plan build — see
    signature_col)."""
    rows = ", ".join(
        "array(" + ", ".join(f"{float(w)!r}D" for w in c) + ")"
        for c in centroids
    )
    scores = (
        f"transform(array({rows}), c -> "
        f"aggregate(zip_with({vec_col}, c, (x, w) -> cast(x AS double) * w), "
        "0.0D, (acc, x) -> acc + x))"
    )
    # single-pass argmax fold (strict > keeps the FIRST max, identical
    # to array_position(scores, array_max(scores)) — but scores is
    # evaluated once, not twice)
    return F.expr(
        f"aggregate({scores}, "
        "named_struct('i', 0L, 'best', cast('-Infinity' AS double), 'pos', 0L), "
        "(acc, s) -> named_struct("
        "'i', acc.i + 1L, "
        "'best', IF(s > acc.best, s, acc.best), "
        "'pos', IF(s > acc.best, acc.i + 1L, acc.pos))"
        ").pos"
    )


def cell_assignments(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids,
) -> DataFrame:
    """(id, vec, cell) assignment of every vector to its argmax-dot
    centroid, choosing the plan by codebook size:

    * small codebooks (≤16 cells): the literal `_cell_col` fold — zero
      shuffle, replicable in oracle SQL.
    * large codebooks: centroids become a BROADCAST relation and the
      argmax is a `max_by` aggregate with map-side partial combine —
      one narrow shuffle of |corpus| rows.  This is the shape that
      scales: a literal fold over hundreds of centroids exceeds
      whole-stage-codegen method limits and silently drops to
      interpreted evaluation (measured: 80-cell literal fold was 1.6×
      SLOWER than 8 cells at 10× corpus despite 10× smaller cells —
      the probe's fixed-vs-scaled rows in SCALE.md).

    Tie rule matches `_cell_col`: equal scores resolve to the LOWEST
    cell index in both plans.
    """
    import numpy as np

    cents = np.asarray(centroids)
    if len(cents) <= 16:
        return df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            _cell_col(vec_col, cents).alias("cell"),
        )
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(i + 1, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell long, _cvec array<double>",
    )
    scored = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).join(F.broadcast(cent_df)).select(
        "_id",
        "_v",
        "cell",
        F.expr(
            "aggregate(zip_with(_v, _cvec, (x, w) -> cast(x AS double) * w), "
            "0.0D, (acc, x) -> acc + x)"
        ).alias("_score"),
    )
    # max_by on (score, -cell): highest score, ties to the lowest cell —
    # map-side combinable, so the shuffle carries one row per (id,
    # partition), not |corpus| × n_cells
    return (
        scored.groupBy("_id")
        .agg(
            F.expr(
                "max_by(struct(cell, _v), struct(_score, -cell))"
            ).alias("_best")
        )
        .select("_id", F.col("_best._v").alias("_v"), F.col("_best.cell").alias("cell"))
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_cells: int = 8,
    n_iters: int = 3,
    seed: int = 7,
    id_col: str | None = None,
) -> np.ndarray:
    """Distributed Lloyd's iterations that turn the seeded spherical
    codebook into a TRAINED one: assignment is the same codegen argmax
    fold the query path uses (`_cell_col`, centroids broadcast as a
    literal), and the update is one shuffle of (cell, dim_pos) partial
    sums — the driver only ever sees the n_cells×dim centroid matrix,
    never a corpus vector.  Aligning cells with the corpus' real
    clusters moves a given recall target to fewer probes
    (SCALE.md's measured GMM table).

    Empty cells keep their previous centroid.  Deterministic for a
    fixed (corpus, seed, n_iters).
    """
    cents = ivf_centroids(dim, n_cells, seed)
    for _ in range(n_iters):
        if id_col is not None and n_cells > 16:
            # join-based argmax past codegen's literal-fold limit
            # (see cell_assignments — requires a unique row id)
            assigned = cell_assignments(df, vec_col, id_col, cents).select(
                F.col("cell").alias("_cell"), "_v"
            )
        else:
            assigned = df.select(
                _cell_col(vec_col, cents).alias("_cell"),
                F.col(vec_col).alias("_v"),
            )
        sums = (
            assigned.select(
                "_cell", F.posexplode("_v").alias("_pos", "_x")
            )
            .groupBy("_cell", "_pos")
            .agg(F.sum(F.col("_x").cast("double")).alias("_s"), F.count("*").alias("_n"))
            .collect()
        )
        new = cents.copy()
        counts = np.zeros(n_cells)
        acc = np.zeros_like(cents)
        for r in sums:
            acc[r["_cell"] - 1, r["_pos"]] = r["_s"]
            counts[r["_cell"] - 1] = r["_n"]
        for i in range(n_cells):
            if counts[i] > 0:
                v = acc[i] / counts[i]
                norm = np.linalg.norm(v)
                if norm > 0:
                    new[i] = v / norm
        cents = new
    return cents


def ivf_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    k: int = 10,
    n_cells: int = 8,
    n_probes: int = 2,
    seed: int = 7,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus vectors assigned to their best centroid
    cell; the query probes its n_probes best cells and re-ranks exactly
    within them.  At 100 TB the cell id is a partition/bucketing column
    so probing prunes files; recall grows with n_probes (n_probes =
    n_cells degrades to exact brute force).

    Query-side cell scores use the same sequential fold as the engines
    (see lsh_ann_topk for why np.dot is not acceptable here).

    ``centroids`` overrides the seeded codebook with a trained one
    (:func:`train_ivf_centroids`) — same plan, better cell/cluster
    alignment.
    """
    dim = len(query_vec)
    cents = centroids if centroids is not None else ivf_centroids(dim, n_cells, seed)
    probe_cells = _probe_cell_ids(query_vec, cents, n_probes)
    sim = F.round(cosine_similarity(vec_col, _query_lit(query_vec)), 6)
    return (
        df.withColumn("_cell", _cell_col(vec_col, cents))
        .filter(F.col("_cell").isin(probe_cells))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def _probe_cell_ids(query_vec, cents: np.ndarray, n_probes: int) -> list[int]:
    """1-based ids of the query's n_probes best cells, ties to the
    lowest id — the same sequential fold the corpus assignment uses
    (see _probe_buckets for why np.dot is not acceptable)."""
    q = [float(x) for x in query_vec]
    q_scores = []
    for c in cents:
        acc = 0.0
        for x, w in zip(q, c):
            acc += x * float(w)
        q_scores.append(acc)
    n_cells = len(cents)
    return [
        i + 1 for i in sorted(range(n_cells), key=lambda i: -q_scores[i])[:n_probes]
    ]


# ------------------------------------------------------------------ #
# Write-time layout: the 100 TB story made literal.  The claims above
# ("at scale the cell/bucket id is a partition column so probes prune
# files") are executed here: materialize the corpus hive-partitioned
# by its IVF cell (or LSH bucket), and the probe becomes a partition
# filter — the scan never opens non-probed cells' files.  Plan-asserted
# in tests/test_partitioning.py (PartitionFilters + numFiles drop
# ~ n_probes/n_cells).  Reference analog: partition-pruned parquet
# scans, /root/reference/src/duckdb/parquet.rs:82-92.
# ------------------------------------------------------------------ #


def ivf_layout(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_path: str,
    centroids=None,
    n_cells: int = 8,
    seed: int = 7,
) -> None:
    """Materialize (id, vec, cell) hive-partitioned by cell.

    One shuffle (repartition by cell) so each cell directory is written
    by one task → one file per cell here; at 100 TB drop the
    repartition or widen it (repartition(n, "cell")) so each cell gets
    ~file-sized splits — pruning works per-directory either way."""
    cents = (
        np.asarray(centroids)
        if centroids is not None
        else ivf_centroids(_vec_dim(df, vec_col), n_cells, seed)
    )
    cells = cell_assignments(df, vec_col, id_col, cents)
    (
        cells.select(
            F.col("_id").alias(id_col), F.col("_v").alias(vec_col), "cell"
        )
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(out_path)
    )


def ivf_ann_topk_pruned(
    spark,
    layout_path: str,
    vec_col: str,
    id_col: str,
    query_vec,
    k: int = 10,
    n_probes: int = 2,
    centroids=None,
    n_cells: int = 8,
    seed: int = 7,
) -> DataFrame:
    """IVF probe over an :func:`ivf_layout` table: `cell` is a hive
    PARTITION column, so the isin filter prunes files before the scan —
    identical results to :func:`ivf_ann_topk`, but the corpus bytes
    read shrink by ~n_probes/n_cells."""
    cents = (
        np.asarray(centroids)
        if centroids is not None
        else ivf_centroids(len(query_vec), n_cells, seed)
    )
    probe_cells = _probe_cell_ids(query_vec, cents, n_probes)
    df = _open_layout(spark, layout_path)
    sim = F.round(cosine_similarity(vec_col, _query_lit(query_vec)), 6)
    return (
        df.filter(F.col("cell").isin(probe_cells))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


#: layout dir → (listing fingerprint, opened DataFrame).  A hive
#: layout with 2^prefix_bits partition dirs pays a parallel
#: partition-discovery LISTING JOB (253 tasks at sf0.1, round-7 job
#: probe) on EVERY spark.read.parquet — the dominant fixed cost of a
#: pruned probe.  A layout is write-once by contract (the lakehouse
#: cost model: materialize once, probe many), so the opened relation
#: is reused while the dir's log-ish fingerprint (top-level dir count
#: + mtime) is unchanged; a rebuilt layout re-opens.
_LAYOUT_DF_CACHE: dict = {}


def _open_layout(spark, layout_path: str) -> DataFrame:
    import os as _os

    try:
        st = _os.stat(layout_path)
        entries = sorted(_os.listdir(layout_path))
        # fold IMMEDIATE subdirectory mtimes in: a rebuild that swaps
        # parquet files inside existing partition dirs changes those
        # dirs' mtimes but not the top-level listing (r7 ADVICE) —
        # one stat per partition dir, trivially cheap vs the listing
        # job this cache exists to avoid
        sub_mtimes = []
        for name in entries:
            p = _os.path.join(layout_path, name)
            try:
                s2 = _os.stat(p)
            except OSError:
                continue
            if _os.path.isdir(p):
                sub_mtimes.append(s2.st_mtime_ns)
        fp = (st.st_mtime_ns, len(entries), tuple(sub_mtimes))
    except OSError:
        fp = None
    # a DataFrame dies with its SparkSession — key by application id
    # (unique per context, unlike id() which can be GC-reused) so a
    # second session in the same process re-opens instead of probing a
    # dead plan (the multi-session smoke test shape)
    key = (spark.sparkContext.applicationId, layout_path)
    hit = _LAYOUT_DF_CACHE.get(key)
    if hit is not None and fp is not None and hit[0] == fp:
        return hit[1]
    df = spark.read.parquet(layout_path)
    if fp is not None:
        for k in [k for k in _LAYOUT_DF_CACHE if k[1] == layout_path]:
            del _LAYOUT_DF_CACHE[k]
        _LAYOUT_DF_CACHE[key] = (fp, df)
    return df


def lsh_layout(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_path: str,
    n_planes: int = 16,
    prefix_bits: int = 8,
    seed: int = 42,
) -> None:
    """Materialize (id, vec, bucket) hive-partitioned by the LSH prefix
    bucket — multi-probe then reads only the probed buckets' files."""
    dim = _vec_dim(df, vec_col)
    planes = hyperplanes(dim, n_planes, seed)
    mask = (1 << prefix_bits) - 1
    bucket = signature_col(vec_col, planes).bitwiseAND(F.lit(mask).cast("long"))
    (
        df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_path)
    )


def lsh_ann_topk_pruned(
    spark,
    layout_path: str,
    vec_col: str,
    id_col: str,
    query_vec,
    k: int = 10,
    n_planes: int = 16,
    prefix_bits: int = 8,
    seed: int = 42,
    probe_radius: int = 0,
) -> DataFrame:
    """Multi-probe LSH over an :func:`lsh_layout` table: recall tunes
    per query by probing more PARTITIONS — no re-bucketing, and the
    scan opens only probed buckets' files."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    probe = _probe_buckets(query_vec, planes, prefix_bits, probe_radius)
    df = _open_layout(spark, layout_path)
    sim = F.round(cosine_similarity(vec_col, _query_lit(query_vec)), 6)
    return (
        df.filter(F.col("bucket").isin(sorted(probe)))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Vector width from one row (layout build time only, not a
    per-query cost)."""
    row = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not row:
        raise ValueError(f"cannot infer dim of empty {vec_col}")
    return int(row[0]["d"])


# --------------------------------------------------------------------- #
# Product quantization — compressed ANN (ADC scan)
# --------------------------------------------------------------------- #


def pq_seed_codebooks(
    dim: int, m_subs: int = 4, n_codes: int = 8, seed: int = 11
) -> np.ndarray:
    """Deterministic Gaussian PQ codebooks, shape (m_subs, n_codes,
    dim/m_subs).  Component scale 0.35 ≈ the per-dimension std of this
    corpus' embeddings, so the UNtrained books already tile the data
    region (the oracle-gated query uses these; training refines them).
    """
    if dim % m_subs:
        raise ValueError(f"dim {dim} not divisible by m_subs {m_subs}")
    rng = np.random.RandomState(seed)
    return rng.randn(m_subs, n_codes, dim // m_subs) * 0.35


def _sub_slice(vec_col: str, m: int, sub_dim: int) -> str:
    """SQL slice of subspace m (0-based): elements [m·sub_dim+1 ..]."""
    return f"slice({vec_col}, {m * sub_dim + 1}, {sub_dim})"


def _argmin_dist_sql(sub_expr: str, book: np.ndarray) -> str:
    """1-based argmin-L2 codeword index of one subvector against one
    subspace's codebook — a literal fold like _cell_col's argmax, ties
    to the LOWEST code.  dist² per code is a sequential zip_with fold
    (both engines' convention)."""
    dists = []
    for c in book:
        ws = ", ".join(f"{float(w)!r}D" for w in c)
        dists.append(
            f"aggregate(zip_with({sub_expr}, array({ws}), "
            "(x, w) -> (cast(x AS double) - w) * (cast(x AS double) - w)), "
            "0.0D, (acc, x) -> acc + x)"
        )
    arr = f"array({', '.join(dists)})"
    return (
        f"CAST(aggregate({arr}, "
        "named_struct('i', 0L, 'best', cast('Infinity' AS double), 'pos', 0L), "
        "(acc, s) -> named_struct("
        "'i', acc.i + 1L, "
        "'best', IF(s < acc.best, s, acc.best), "
        "'pos', IF(s < acc.best, acc.i + 1L, acc.pos))"
        ").pos AS INT)"
    )


def pq_codes_col(vec_col: str, codebooks: np.ndarray) -> F.Column:
    """array<int> of 1-based PQ codes, one per subspace — a pure
    codegen map (literal codebook folds), no shuffle.  The 100 TB
    story: codes are m_subs bytes/vector vs dim·4 for fp32 — the
    compressed corpus (id, codes) shuffles and caches ~32× smaller."""
    m_subs, _, sub_dim = codebooks.shape
    parts = ", ".join(
        _argmin_dist_sql(_sub_slice(vec_col, m, sub_dim), codebooks[m])
        for m in range(m_subs)
    )
    return F.expr(f"array({parts})")


def pq_encode(
    df: DataFrame, vec_col: str, id_col: str, codebooks: np.ndarray
) -> DataFrame:
    """(id, codes) PQ encoding of the corpus."""
    return df.select(
        F.col(id_col), pq_codes_col(vec_col, codebooks).alias("codes")
    )


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    dim: int,
    m_subs: int = 4,
    n_codes: int = 8,
    n_iters: int = 3,
    seed: int = 11,
) -> np.ndarray:
    """Distributed Lloyd's refinement of the seeded PQ codebooks: ALL
    subspaces train in the same pass — assignment is the codegen
    argmin fold per subspace, the update is ONE shuffle of
    (sub, code, dim_pos) partial sums (m_subs·n_codes·sub_dim groups,
    map-side combined).  The driver only ever sees the codebook
    matrix, never a corpus vector — the same contract as
    train_ivf_centroids.  Empty codes keep their previous codeword.
    """
    books = pq_seed_codebooks(dim, m_subs, n_codes, seed)
    sub_dim = dim // m_subs
    for _ in range(n_iters):
        subs = ", ".join(
            f"struct({m} AS sub, "
            f"{_argmin_dist_sql(_sub_slice(vec_col, m, sub_dim), books[m])} AS code, "
            f"{_sub_slice(vec_col, m, sub_dim)} AS sv)"
            for m in range(m_subs)
        )
        exploded = df.selectExpr(f"explode(array({subs})) AS s").selectExpr(
            "s.sub AS sub", "s.code AS code", "posexplode(s.sv) AS (pos, x)"
        )
        sums = (
            exploded.groupBy("sub", "code", "pos")
            .agg(
                F.sum(F.col("x").cast("double")).alias("_s"),
                F.count("*").alias("_n"),
            )
            .collect()
        )
        new = books.copy()
        acc = np.zeros_like(books)
        cnt = np.zeros((m_subs, n_codes))
        for r in sums:
            acc[r["sub"], r["code"] - 1, r["pos"]] = r["_s"]
            cnt[r["sub"], r["code"] - 1] = r["_n"]
        for m in range(m_subs):
            for c in range(n_codes):
                if cnt[m, c] > 0:
                    new[m, c] = acc[m, c] / cnt[m, c]
        books = new
    return books


def pq_luts(query_vec, codebooks: np.ndarray) -> list[list[float]]:
    """Per-subspace inner-product lookup tables for one query vector:
    lut[m][c] = dot(q_m, codebooks[m][c]), computed with the engines'
    sequential left-to-right fold (NOT np.dot — BLAS may reorder and
    drift the last bit; see _probe_buckets)."""
    m_subs, n_codes, sub_dim = codebooks.shape
    q = [float(x) for x in query_vec]
    luts = []
    for m in range(m_subs):
        row = []
        for c in range(n_codes):
            acc = 0.0
            for x, w in zip(q[m * sub_dim : (m + 1) * sub_dim], codebooks[m][c]):
                acc += x * float(w)
            row.append(acc)
        luts.append(row)
    return luts


def _pq_adc_sql(vec_col: str, codebooks: np.ndarray, luts) -> str:
    """The ADC score expression shared by pq_adc_topk and ivfpq_topk:
    per subspace, a codegen argmin fold picks the code and a literal
    LUT lookup scores it; the m_subs terms sum left-to-right (fixed
    association — deterministic and oracle-replicable)."""
    m_subs, _, sub_dim = codebooks.shape
    terms = []
    for m in range(m_subs):
        arr = ", ".join(f"{v!r}D" for v in luts[m])
        code = _argmin_dist_sql(_sub_slice(vec_col, m, sub_dim), codebooks[m])
        terms.append(f"element_at(array({arr}), {code})")
    return "(" + " + ".join(f"({t})" for t in terms) + ")"


def _exact_dot_topk(
    df: DataFrame, cand: DataFrame, vec_col: str, id_col: str, query_vec, k: int
) -> DataFrame:
    """Exact inner-product re-rank of `cand` (an id relation) — the
    final stage shared by pq_topk_rerank and ivfpq_topk."""
    q = _query_lit(query_vec)
    dot = F.expr(
        f"aggregate(zip_with({vec_col}, __q, "
        "(x, w) -> cast(x AS double) * w), 0.0D, (acc, x) -> acc + x)"
    )
    return (
        df.join(cand, id_col)
        .withColumn("__q", q)
        .select(F.col(id_col), F.round(dot, 6).alias("dot"))
        .orderBy(F.desc("dot"), F.asc(id_col))
        .limit(k)
    )


def pq_adc_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    codebooks: np.ndarray,
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: approx dot(q, x) = Σ_m
    lut[m][code_m(x)] — the corpus side touches only its PQ codes, the
    exact query-side dots live in the tiny broadcast LUT.  Output
    (id, adc) rounded to 6, ordered (adc desc, id).

    Scale: scoring reads m_subs BYTES per vector instead of dim·4 —
    the scan is memory-bandwidth-bound at ~32× less traffic, which is
    why PQ is the standard 100 TB ANN first pass (re-rank the top
    candidates exactly afterwards, `tests/test_pq.py` measures the
    recall).  The sum is a fixed left-to-right chain of m_subs
    additions — deterministic and oracle-replicable.
    """
    adc = _pq_adc_sql(vec_col, codebooks, pq_luts(query_vec, codebooks))
    return (
        df.select(F.col(id_col), F.expr(f"round({adc}, 6)").alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(k)
    )


def pq_topk_rerank(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    codebooks: np.ndarray,
    k: int = 10,
    n_candidates: int = 100,
) -> DataFrame:
    """The production PQ shape: ADC scan over the compressed codes
    picks n_candidates, an exact inner-product re-rank over just those
    rows returns the final top-k (id, dot).  The expensive full-width
    scan shrinks to n_candidates rows; recall@10 on the pure-noise
    worst-case corpus: 0.6 at C=50, 0.8 at C=100, 0.9 at C=200 of a
    500-vector corpus (tests/test_pq.py) — the C dial trades exact-scan
    volume for recall at a fixed layout, like IVF's n_probes."""
    cand = pq_adc_topk(
        df, vec_col, id_col, query_vec, codebooks, k=n_candidates
    ).select(id_col)
    return _exact_dot_topk(df, cand, vec_col, id_col, query_vec, k)


def ivfpq_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    *,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probes: int = 2,
    n_candidates: int = 100,
) -> DataFrame:
    """IVF+PQ — the production composition for corpora where even one
    compressed full pass is too much: probe the query's ``n_probes``
    best IVF cells (trained `centroids`), ADC-rank the probed rows'
    PQ codes (trained `codebooks`), exactly re-rank the top
    ``n_candidates``.  Output (id, dot) like pq_topk_rerank.

    Cost at 100 TB: the cell filter prunes to n_probes/n_cells of the
    corpus (a PARTITION filter under an ivf_layout), the ADC pass
    reads m_subs bytes/vector of THAT slice, and the exact pass
    touches n_candidates rows.  Recall dials: n_probes (coverage) ×
    n_candidates (fine re-rank) — measured in tests/test_pq.py;
    tools/recall_probe.py --gmm --pq has the component tables.
    """
    probe_cells = _probe_cell_ids(query_vec, np.asarray(centroids), n_probes)
    adc = _pq_adc_sql(vec_col, codebooks, pq_luts(query_vec, codebooks))
    probed = df.withColumn(
        "_cell", _cell_col(vec_col, np.asarray(centroids))
    ).filter(F.col("_cell").isin(probe_cells))
    cand = (
        probed.select(F.col(id_col), F.expr(f"round({adc}, 6)").alias("_adc"))
        .orderBy(F.desc("_adc"), F.asc(id_col))
        .limit(n_candidates)
        .select(id_col)
    )
    return _exact_dot_topk(df, cand, vec_col, id_col, query_vec, k)


def maxsim_score_sql(
    vec_col: str, query_vecs, n_sub: int = 4
) -> str:
    """Late-interaction MaxSim (the ColBERT retrieval score) as ONE
    SQL expression: the document vector splits into ``n_sub``
    contiguous sub-vectors (multi-vector document representation) and
    each query token vector contributes ``max_s dot(sub_s, q_j)``;
    the score is the sum over query tokens.

    score(d) = Σ_j max_{s<n_sub} ⟨d[s·w : (s+1)·w], q_j⟩

    Built as one SQL string (py4j column-tree cost — PLAN.md
    invariant).  Every dot is the standard sequential zip_with fold,
    so the whole score — maxes, then a fixed-order sum — reproduces
    bit-for-bit in DuckDB (greatest + list_sum), keeping MaxSim under
    the value-exact gate.  Plan shape: pure scan→project→TakeOrdered,
    no shuffle, no join.
    """
    qs = np.asarray(query_vecs, dtype=float)
    width = qs.shape[1]
    per_q = []
    for q in qs:
        weights = ", ".join(f"{float(w)!r}D" for w in q)
        dots = []
        for s in range(n_sub):
            sub = f"slice({vec_col}, {1 + s * width}, {width})"
            dots.append(
                f"aggregate(zip_with({sub}, array({weights}), "
                "(x, w) -> cast(x AS double) * w), 0.0D, "
                "(acc, x) -> acc + x)"
            )
        per_q.append("greatest(" + ", ".join(dots) + ")")
    return "(" + " + ".join(per_q) + ")"


def maxsim_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vecs,
    n_sub: int = 4,
    k: int = 10,
) -> DataFrame:
    """Exact MaxSim top-k: scan + per-row score + TakeOrdered."""
    score = F.expr(f"round({maxsim_score_sql(vec_col, query_vecs, n_sub)}, 6)")
    return (
        df.select(F.col(id_col), score.alias("maxsim"))
        .orderBy(F.desc("maxsim"), F.asc(id_col))
        .limit(k)
    )
