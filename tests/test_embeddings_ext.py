"""Invariants for embeddings_ext.py + q_mm_embed. Exact values are
pinned by the DuckDB oracles; these pin semantics."""

import math

from data_wrangler_spark.registry import REGISTRY


def test_centroid_matches_brute_force(spark, sf_dir):
    from data_wrangler_spark.catalog import load_table

    rows = REGISTRY["q_embed_centroid"].run(spark, sf_dir).collect()
    assert rows
    raw = load_table(spark, sf_dir, "embeddings").collect()
    by_label = {}
    for r in raw:
        by_label.setdefault(r.label, []).append(r.embedding)
    for r in rows:
        vecs = by_label[r.label]
        assert r.n_vecs == len(vecs)
        dim = len(vecs[0])
        # centroid is a fixed-point micro-unit CSV (harness-safe form)
        micro = [int(v) for v in r.centroid.split(",")]
        assert len(micro) == dim
        for j in range(dim):
            expect = sum(v[j] for v in vecs) / len(vecs)
            assert abs(micro[j] / 1e6 - expect) < 2e-6


def test_knn_votes_bounded_by_k(spark, sf_dir):
    from data_wrangler_spark.operators.embeddings_ext import KNN_K, KNN_N_QUERIES

    rows = REGISTRY["q_knn_classify"].run(spark, sf_dir).collect()
    assert len(rows) == KNN_N_QUERIES
    for r in rows:
        assert 1 <= r.votes <= KNN_K
        # majority plurality: votes strictly more than k/|labels| floor
        assert r.pred_label is not None


def test_embed_norm_is_unit_scale(spark, sf_dir):
    rows = REGISTRY["q_embed_norm"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.l2_norm > 0
        assert abs(r.first_component) <= 1.0 + 1e-12


def test_mm_embed_fixed_dim_unit_interval(spark, sf_dir):
    from data_wrangler_spark.operators.multimodal import MM_EMBED_DIM

    rows = REGISTRY["q_mm_embed"].run(spark, sf_dir).collect()
    assert rows
    # features is a fixed-point micro-unit CSV (harness-safe form)
    for r in rows:
        micro = [int(v) for v in r.features.split(",")]
        assert len(micro) == MM_EMBED_DIM
        assert all(0 <= m <= 1_000_000 for m in micro)
    # deterministic: same text → same features
    import hashlib
    import math

    from data_wrangler_spark.catalog import load_table

    doc = load_table(spark, sf_dir, "documents").limit(1).collect()[0]
    expect = ",".join(
        str(math.floor(b / 255.0 * 1e6 + 0.5))
        for b in hashlib.sha256(doc.text.encode()).digest()[:MM_EMBED_DIM]
    )
    got = next(r.features for r in rows if r.doc_id == doc.doc_id)
    assert got == expect


def test_kmeans_exact_invariants(spark, sf_dir):
    """Every vector gets exactly one cluster in [1, K]; several
    clusters are populated; re-running reproduces assignments
    bit-for-bit (the op's whole point)."""
    from data_wrangler_spark.operators.embeddings_ext import KM_K

    rows = REGISTRY["q_kmeans_exact"].run(spark, sf_dir).collect()
    from data_wrangler_spark.catalog import load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    used = {r.cluster for r in rows}
    assert used <= set(range(1, KM_K + 1))
    assert len(used) >= 3
    assert all(r.dist >= 0 for r in rows)
    again = {
        (r.vec_id, r.cluster, r.dist)
        for r in REGISTRY["q_kmeans_exact"].run(spark, sf_dir).collect()
    }
    assert again == {(r.vec_id, r.cluster, r.dist) for r in rows}


def test_ivf_exact_recall_against_brute_force(spark, sf_dir):
    """The exact-oracle IVF probes 4/8 cells, so its top-10 must
    overlap heavily with the brute-force top-10 (and every returned
    pair must carry the same cosine the brute-force path computes)."""
    brute = {
        r.vec_id: r.cos_sim
        for r in REGISTRY["q_sim_search"].run(spark, sf_dir).collect()
    }
    ivf = {
        r.vec_id: r.cos_sim
        for r in REGISTRY["q_sim_search_ivf"].run(spark, sf_dir).collect()
    }
    assert len(ivf) == 10
    hits = set(ivf) & set(brute)
    assert len(hits) >= 5, f"recall {len(hits)}/10 too low"
    for vid in hits:
        assert ivf[vid] == brute[vid]


def test_pca_direction_matches_numpy_eigenvector(spark, sf_dir):
    """The integer power iteration must materially concentrate
    variance: its Rayleigh quotient beats the starting vector's and
    reaches ≥0.85 of numpy's λ1; the rescale contract holds."""
    import numpy as np

    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.operators.embeddings_ext import PCA_VSCALE
    from data_wrangler_spark.registry import REGISTRY

    rows = REGISTRY["q_embed_pca"].run(spark, sf_dir).collect()
    v = np.array([r.v_scaled for r in sorted(rows, key=lambda r: r.dim)], dtype=float)
    assert int(np.abs(v).max()) == PCA_VSCALE

    X = np.stack(
        [
            np.array(r.embedding, dtype=np.float64)
            for r in load_table(spark, sf_dir, "embeddings").collect()
        ]
    )
    G = X.T @ X
    evals, _ = np.linalg.eigh(G)
    lam1 = float(evals[-1])
    rayleigh = float(v @ G @ v) / float(v @ v)
    ones = np.ones_like(v)
    r0 = float(ones @ G @ ones) / float(ones @ ones)
    # power iteration monotonically lifts the Rayleigh quotient; on
    # the fixture's near-flat spectrum full eigenvector convergence
    # is not reachable in 8 rounds, but ≥0.85·λ1 is
    assert rayleigh > r0
    assert rayleigh >= 0.85 * lam1, f"R/λ1 = {rayleigh/lam1:.3f}"


def test_label_similarity_matches_numpy_centroid_cosine(spark, sf_dir):
    """Micro cosines equal numpy centroid cosines at 1e-5, all label
    pairs present exactly once (a < b)."""
    import itertools

    import numpy as np

    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.registry import REGISTRY

    rows = REGISTRY["q_label_similarity"].run(spark, sf_dir).collect()
    by_label = {}
    for r in load_table(spark, sf_dir, "embeddings").collect():
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    cents = {k: np.mean(np.stack(v), axis=0) for k, v in by_label.items()}
    expect_pairs = {
        (a, b) for a, b in itertools.combinations(sorted(cents), 2)
    }
    assert {(r.label_a, r.label_b) for r in rows} == expect_pairs
    for r in rows:
        a, b = cents[r.label_a], cents[r.label_b]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cos_micro / 1e6 - cos) < 1e-5


def test_kcenter_greedy_invariants(spark, sf_dir):
    """Farthest-point selection: K distinct picks, rank 0 is the
    lowest vec_id, and the selected max-min distance is
    NON-INCREASING (adding a center can only shrink every min
    distance — the 2-approximation's monotonicity)."""
    from data_wrangler_spark.operators.embeddings_ext import KCENTER_K
    from data_wrangler_spark.registry import REGISTRY
    from data_wrangler_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = REGISTRY["q_select_kcenter"].run(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(KCENTER_K))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == KCENTER_K
    min_id = load_table(spark, sf_dir, "embeddings").agg(
        F.min("vec_id")
    ).first()[0]
    assert ids[0] == min_id and rows[0].sq_dist is None
    dists = [r.sq_dist for r in rows[1:]]
    assert all(d > 0 for d in dists)
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_select_kcenter_empty_table(spark, tmp_path):
    """An empty embeddings table yields an empty coreset, not an
    IndexError on the seed collect (ADVICE r7 — mirrors
    test_dedup_embed_empty_table)."""
    from data_wrangler_spark.registry import REGISTRY

    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    empty_dir = str(tmp_path / "empty_sf")
    src.limit(0).write.parquet(f"{empty_dir}/embeddings.parquet")
    out = REGISTRY["q_select_kcenter"].run(spark, empty_dir)
    assert out.count() == 0
    assert out.columns == ["rank", "vec_id", "sq_dist"]


def test_kmeans_local_and_distributed_fits_are_identical(spark, sf_dir, monkeypatch):
    """VERDICT r15 #3: the driver-numpy local fast path (fit sets ≤
    KM_FIT_LOCAL_MAX) and the distributed partials loop must land on
    the IDENTICAL centroid fixpoint — same md5 seed order, same
    first-minimum assignment, same int64 sums and truncating means.
    Forcing the bound to 0 exercises the distributed path on the same
    fixture; matrices must match element-for-element."""
    import numpy as np

    from data_wrangler_spark.operators import embeddings_ext as E

    _, ids_local, cmat_local = E.kmeans_fit_mat(spark, sf_dir)
    monkeypatch.setattr(E, "KM_FIT_LOCAL_MAX", 0)
    _, ids_dist, cmat_dist = E.kmeans_fit_mat(spark, sf_dir)
    assert np.array_equal(ids_local, ids_dist)
    assert np.array_equal(cmat_local, cmat_dist)


def test_kmeans_distributed_route_never_collects_vectors(
    spark, sf_dir, monkeypatch
):
    """VERDICT r16 #3: the local-path probe must route on a COUNT —
    when the fit set exceeds KM_FIT_LOCAL_MAX the driver must NOT
    fetch the vectors at all (the old limit(MAX+1).collect() probe
    pulled ~130 MB before discarding it). Spy on DataFrame.collect:
    on the forced-distributed route every collect must stay within
    the seed's k rows."""
    from data_wrangler_spark.operators import embeddings_ext as E

    # patch the CONCRETE class (Spark 4's pyspark.sql.DataFrame is an
    # abstract base; classic sessions run the subclass's collect)
    DataFrame = type(spark.range(1))

    monkeypatch.setattr(E, "KM_FIT_LOCAL_MAX", 0)
    xs_sizes: list[int] = []
    n_collects = 0
    real_collect = DataFrame.collect

    def spy(self):
        nonlocal n_collects
        rows = real_collect(self)
        n_collects += 1
        if "xs" in self.columns:
            xs_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    E.kmeans_fit_mat(spark, sf_dir)
    assert n_collects, "distributed fit ran no collect at all?"
    # only the k seed rows may carry vectors; the per-iteration
    # partials are (cl, count, sum) grid rows, never xs
    assert max(xs_sizes, default=0) <= E.KM_K, (
        f"distributed route collected {max(xs_sizes)} vector rows — "
        f"the probe is fetching fit data to the driver again"
    )
