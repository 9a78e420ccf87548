"""heavy_hitters: exactness under aggressive sketch truncation (distinct
cardinality >> counters) + DuckDB oracle equality of the driver query."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from north_cloud_ray.stages.sketch import heavy_hitters

SF = "/root/testdata/sf0.001"


def test_heavy_hitters_exact_under_truncation(ray_session):
    """50k rows, ~10k distinct values, 8 planted heavies; counters forced
    far below cardinality so every batch truncates — output must still
    equal the exact pandas answer (MG no-false-negative + exact recount)."""
    rng = np.random.default_rng(3)
    tail = rng.integers(0, 10_000, size=50_000)
    heavies = np.repeat(np.arange(8) + 1_000_000, 900)
    vals = np.concatenate([tail, heavies])
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    ds = rd.from_pandas(df).repartition(16)

    min_count = 500
    got = heavy_hitters(ds, "v", min_count=min_count, num_counters=64)
    want = (df["v"].value_counts().loc[lambda s: s >= min_count]
            .sort_index())
    assert got["v"].tolist() == want.index.tolist()
    assert got["n"].tolist() == want.to_numpy().tolist()


def test_heavy_hitters_empty_result(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"v": np.arange(100)})).repartition(4)
    out = heavy_hitters(ds, "v", min_count=2)
    assert len(out) == 0
    assert list(out.columns) == ["v", "n"]


def test_exact_quantiles_forced_narrowing(ray_session):
    """max_pull far below n forces the pivot-count-narrow path; result
    must still equal the exact numpy answer at every rank rule edge."""
    from north_cloud_ray.stages.sketch import _rank_of, exact_quantiles

    rng = np.random.default_rng(5)
    vals = np.concatenate([rng.standard_normal(40_000) * 100,
                           np.repeat(7.5, 5_000)])  # heavy duplicate run
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    qs = (0.0, 0.1, 0.5, 0.9, 0.999, 1.0)
    got = exact_quantiles(ds, "x", qs, max_pull=2_000, sample_size=2_000)
    sv = np.sort(vals)
    for q, v in zip(got["q"], got["value"]):
        assert v == sv[_rank_of(q, len(sv)) - 1], q


def test_quantiles_oracle_equality(ray_session):
    from north_cloud_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES["lineitem_price_quantiles"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    got = got.sort_values("q").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    want = (con.execute(ORACLE_SQL["lineitem_price_quantiles"])
            .df()[got.columns].sort_values("q").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(float), want.astype(float),
                                  check_dtype=False)
    assert len(got) == 4


def test_heavy_users_oracle_equality(ray_session):
    from north_cloud_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES["events_heavy_users"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    got = got.sort_values("user_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = (con.execute(ORACLE_SQL["events_heavy_users"]).df()[got.columns]
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hll_accuracy_and_partition_independence(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from north_cloud_ray.stages.sketch import hll_distinct

    n_distinct = 50_000
    vals = pd.Series(np.arange(n_distinct).repeat(3)).sample(
        frac=1.0, random_state=7).astype(str)
    df = pd.DataFrame({"v": vals.to_numpy()})
    res3 = hll_distinct(ray.data.from_pandas(df).repartition(3), "v")
    res7 = hll_distinct(ray.data.from_pandas(df).repartition(7), "v")
    # register merge is associative+commutative: byte-identical across
    # partitionings
    assert np.array_equal(res3["registers"], res7["registers"])
    err = abs(res3["estimate"] - n_distinct) / n_distinct
    assert err < 0.05, err  # 3 sigma at p=12 is ~4.9%


def test_hll_small_range_linear_counting(ray_session):
    import pandas as pd
    import ray.data

    from north_cloud_ray.stages.sketch import hll_distinct

    df = pd.DataFrame({"v": [f"u{i}" for i in range(100)] * 5})
    res = hll_distinct(ray.data.from_pandas(df).repartition(2), "v")
    err = abs(res["estimate"] - 100) / 100
    assert err < 0.05, err  # linear-counting regime is near-exact


def test_kll_sketch_rank_error_and_merge():
    """Single-process KLL: rank error <= 1% at k=256 on a skewed
    distribution; merging two half sketches stays within the bound;
    serialization round-trips; total weight stays within one
    compaction's drift of n."""
    from north_cloud_ray.stages.sketch import KLLSketch

    rng = np.random.default_rng(11)
    data = rng.lognormal(3.0, 1.2, 150_000)
    sv = np.sort(data)

    def rank_err(sk, qs=(0.01, 0.25, 0.5, 0.75, 0.99)):
        est = sk.quantiles(qs)
        return max(abs(np.searchsorted(sv, e) / len(sv) - q)
                   for q, e in zip(qs, est))

    one = KLLSketch(256)
    for i in range(0, len(data), 4096):
        one.update(data[i:i + 4096])
    assert rank_err(one) <= 0.01
    assert sum(len(lv) for lv in one.levels) < 1_500  # sketch-sized state

    a, b = KLLSketch(256), KLLSketch(256)
    a.update(data[:75_000])
    b.update(data[75_000:])
    a.merge(b)
    assert rank_err(a) <= 0.01
    assert abs(a.n - len(data)) == 0  # n is counted exactly

    rt = KLLSketch.from_bytes(one.to_bytes())
    assert np.allclose(rt.quantiles((0.1, 0.5, 0.9)),
                       one.quantiles((0.1, 0.5, 0.9)))
    assert rt.n == one.n


def test_kll_small_input_exact():
    """Below one level's capacity nothing compacts: quantiles are exact
    (quantile_disc rank rule)."""
    from north_cloud_ray.stages.sketch import KLLSketch, _rank_of

    vals = np.arange(100, dtype=np.float64)
    sk = KLLSketch(256)
    sk.update(vals)
    for q in (0.0, 0.25, 0.5, 1.0):
        assert sk.quantiles((q,))[0] == vals[_rank_of(q, 100) - 1]


def test_kll_quantiles_query_vs_exact(ray_session):
    """One-pass KLL over l_extendedprice within 1% normalized rank
    error of the DuckDB exact quantile at sf0.001; the driver query
    returns the exact quantiles plus the sketch-within-bound flag."""
    import ray.data

    from north_cloud_ray.pipelines.queries import QUERIES
    from north_cloud_ray.stages.sketch import kll_quantiles

    exact = duckdb.sql(
        f"SELECT l_extendedprice FROM '{SF}/lineitem.parquet'"
    ).df()["l_extendedprice"].to_numpy()
    sv = np.sort(exact)
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_extendedprice"])
    sk = kll_quantiles(li, "l_extendedprice",
                       qs=(0.01, 0.25, 0.5, 0.75, 0.99), k=256)
    for q, v in zip(sk["q"], sk["value"]):
        assert abs(np.searchsorted(sv, v) / len(sv) - q) <= 0.01, q

    got = QUERIES["lineitem_price_quantiles_kll"](SF)
    assert list(got.columns) == ["q", "value", "kll_ok"]
    assert len(got) == 5
    assert got["kll_ok"].all()
    for q, v in zip(got["q"], got["value"]):
        rank = max(1, int(np.ceil(q * len(sv))))
        assert v == sv[rank - 1], q  # exact quantile_disc


def test_grouped_hll_accuracy_and_partition_independence(ray_session):
    """Per-group estimates within 5% of exact on planted cardinalities;
    byte-identical output across different partitionings (register max
    is associative+commutative)."""
    import ray.data

    from north_cloud_ray.stages.sketch import grouped_hll_distinct

    rng = np.random.default_rng(13)
    frames = []
    truth = {"a": 20_000, "b": 3_000, "c": 150}
    for g, nd in truth.items():
        ids = rng.integers(0, nd, size=nd * 3)  # ~nd distinct w/ repeats
        ids = np.concatenate([ids, np.arange(nd)])  # ensure all present
        frames.append(pd.DataFrame({"g": g, "u": ids}))
    df = pd.concat(frames).sample(frac=1.0, random_state=5) \
           .reset_index(drop=True)

    r4 = grouped_hll_distinct(
        ray.data.from_pandas(df).repartition(4), "g", "u").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    r9 = grouped_hll_distinct(
        ray.data.from_pandas(df).repartition(9), "g", "u").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(r4, r9)
    for g, nd in truth.items():
        est = r4.loc[r4["g"] == g, "n_distinct_est"].iloc[0]
        assert abs(est - nd) / nd < 0.05, (g, est, nd)


def test_events_type_distinct_hll_query(ray_session):
    from north_cloud_ray.pipelines.queries import QUERIES

    got = QUERIES["events_type_distinct_hll"](SF)
    want = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n "
        f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1").df()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n_exact"].tolist() == want["n"].tolist()  # exact twin
    assert got["hll_ok"].all()  # sketch within 5% of exact per group


def test_kmv_set_cardinalities_accuracy(ray_session):
    """Planted overlap: |A|=30k, |B|=12k, |A∩B|=6k. KMV at k=1024 must
    land within ~3/sqrt(k) of each exact cardinality, and be
    partitioning-independent (bottom-k merge is assoc+comm)."""
    import ray.data

    from north_cloud_ray.stages.sketch import kmv_set_cardinalities

    rng = np.random.default_rng(17)
    a_ids = np.arange(30_000)
    b_ids = np.arange(24_000, 36_000)  # overlap = 24k..30k -> 6k
    da = pd.DataFrame({"u": rng.permutation(np.repeat(a_ids, 2))})
    db = pd.DataFrame({"u": rng.permutation(np.repeat(b_ids, 3))})

    def run(pa_, pb_):
        return kmv_set_cardinalities(
            ray.data.from_pandas(da).repartition(pa_),
            ray.data.from_pandas(db).repartition(pb_), "u", k=1024)

    est = run(4, 7)
    est2 = run(9, 3)
    assert est == est2  # partitioning-independent
    tol = 3.0 / np.sqrt(1024)  # ~9.4% (3 sigma)
    for key, truth in (("n_a", 30_000), ("n_b", 12_000),
                       ("n_union", 36_000), ("n_intersect", 6_000)):
        assert abs(est[key] - truth) / truth < tol, (key, est[key])


def test_kmv_below_k_exact(ray_session):
    """Sides smaller than k: every estimate is exact (sketch holds all
    distinct hashes)."""
    import ray.data

    from north_cloud_ray.stages.sketch import kmv_set_cardinalities

    da = pd.DataFrame({"u": np.arange(300)})
    db = pd.DataFrame({"u": np.arange(200, 500)})
    est = kmv_set_cardinalities(ray.data.from_pandas(da).repartition(3),
                                ray.data.from_pandas(db).repartition(2),
                                "u", k=1024)
    assert est["n_a"] == 300 and est["n_b"] == 300
    assert est["n_union"] == 500 and round(est["n_intersect"]) == 100


def test_events_cohort_overlap_kmv_query(ray_session):
    from north_cloud_ray.pipelines.queries import QUERIES

    got = QUERIES["events_cohort_overlap_kmv"](SF)
    want = duckdb.sql(f"""
        WITH f AS (
          SELECT user_id,
                 MAX(event_type = 'click')    AS a,
                 MAX(event_type = 'purchase') AS b
          FROM '{SF}/events.parquet' GROUP BY 1)
        SELECT SUM(a::INT) n_a, SUM(b::INT) n_b,
               SUM((a OR b)::INT) n_union, SUM((a AND b)::INT) n_int
        FROM f""").df().iloc[0]
    m = dict(zip(got["measure"], got["n_exact"]))
    assert m == {"n_a": int(want["n_a"]), "n_b": int(want["n_b"]),
                 "n_union": int(want["n_union"]),
                 "n_intersect": int(want["n_int"])}
    # at sf0.001 all cohorts are below k -> estimates near-exact
    assert got["kmv_ok"].all()


def test_grouped_kll_query_rank_error(ray_session):
    """Per-group one-pass KLL quantiles within 1% normalized rank error
    of the per-group exact values at sf0.001; the driver query returns
    the exact per-group quantiles plus the sketch-within-bound flag."""
    import ray.data

    from north_cloud_ray.pipelines.queries import QUERIES
    from north_cloud_ray.stages.sketch import grouped_kll_quantiles

    li = duckdb.sql(
        f"SELECT l_returnflag, l_extendedprice "
        f"FROM '{SF}/lineitem.parquet'").df()
    flags = sorted(li["l_returnflag"].unique())
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_returnflag", "l_extendedprice"])
    sk = grouped_kll_quantiles(ds, "l_returnflag", "l_extendedprice",
                               qs=(0.25, 0.5, 0.75), k=256).to_pandas()
    for flag, sub in li.groupby("l_returnflag"):
        sv = np.sort(sub["l_extendedprice"].to_numpy())
        g = sk[sk["l_returnflag"] == flag]
        assert len(g) == 3
        for q, v in zip(g["q"], g["value"]):
            err = abs(np.searchsorted(sv, v) / len(sv) - q)
            assert err <= 0.01, (flag, q, err)

    got = QUERIES["lineitem_flag_price_quantiles_kll"](SF)
    assert sorted(got["l_returnflag"].unique()) == flags
    assert got["kll_ok"].all()
    for flag, sub in li.groupby("l_returnflag"):
        sv = np.sort(sub["l_extendedprice"].to_numpy())
        g = got[got["l_returnflag"] == flag]
        for q, v in zip(g["q"], g["value"]):
            rank = max(1, int(np.ceil(q * len(sv))))
            assert v == sv[rank - 1], (flag, q)  # exact quantile_disc


def test_kmv_empty_side(ray_session):
    """An empty side yields estimate 0 everywhere it should, not a
    KeyError on the schema-less empty frame."""
    import ray.data

    from north_cloud_ray.stages.sketch import kmv_set_cardinalities

    da = pd.DataFrame({"u": np.arange(100)})
    db = pd.DataFrame({"u": np.arange(0)})
    est = kmv_set_cardinalities(ray.data.from_pandas(da).repartition(2),
                                ray.data.from_pandas(db).repartition(1),
                                "u", k=256)
    assert est["n_a"] == 100 and est["n_b"] == 0
    assert est["n_union"] == 100 and est["n_intersect"] == 0
