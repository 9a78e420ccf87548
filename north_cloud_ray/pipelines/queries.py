"""Driver-facing query catalog: one entry per operator family from
SURVEY.md §2, each as a Ray Data pipeline over the testdata parquet
tables, with (where SQL-expressible) a DuckDB oracle in ORACLE_SQL.

Float discipline for oracle equality: SQL-checked aggregates return only
integers (counts, integer-cents sums via FLOOR(x*100+0.5), order-
independent MIN/MAX) or per-row float arithmetic — never float SUM/AVG,
whose summation-order nondeterminism would break value-hash comparison.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..stages.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from ..stages.similarity import brute_force_topk, ivf_topk
from ..stages.textstats import text_stats


def _read(sf_dir: str, table: str, columns=None, blocks: int | None = None) -> "rd.Dataset":
    """Pruned parquet read. ``blocks`` overrides the block count — a single
    parquet file reads as ONE block, which caps map_batches parallelism at
    1; heavy per-row stages (shingling, simhash, embeddings) must split."""
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns,
                           override_num_blocks=blocks)


def _cpus() -> int:
    from ..stages.agg import cluster_cpus

    return cluster_cpus()


def _cents(x):
    """floor(x*100+0.5) — the shared float->integer-cents convention."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


# ---------------- TPC-H-style engine proof ----------------

def q1_pricing_summary(sf_dir: str):
    """Q1-style grouped aggregate with partial pre-aggregation inside
    map_batches before the (small) groupby shuffle (G1-style)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["l_shipdate"] < pd.Timestamp("1998-09-01")]
        df["sum_qty_cents"] = _cents(df["l_quantity"].to_numpy())
        df["sum_base_cents"] = _cents(df["l_extendedprice"].to_numpy())
        df["sum_disc_cents"] = _cents(
            (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(sum_qty_cents=("sum_qty_cents", "sum"),
                 sum_base_cents=("sum_base_cents", "sum"),
                 sum_disc_cents=("sum_disc_cents", "sum"),
                 n=("l_quantity", "size"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_cents", alias_name="sum_qty_cents"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_cents", alias_name="sum_disc_cents"),
        Sum("n", alias_name="n"),
    )
    return out


def q3_top_orders(sf_dir: str):
    """Broadcast semi-join (small customer side) + grouped revenue + top-k
    (J3/T1-style)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    keys = np.sort(
        cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy()
    )
    keys_ref = ray.put(keys)  # numpy -> zero-copy plasma reads in every task

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(keys_ref)
        mask = np.isin(batch["o_custkey"].to_numpy(), k, assume_unique=False)
        return batch[mask]

    orders_b = orders.map_batches(filt, batch_format="pandas")
    # broadcast ONLY the sorted key array (int64 column), never the
    # qualifying-order rows: the mid-state stays O(keys) not O(rows)
    okey_arr = np.sort(
        orders_b.map_batches(
            lambda b: b[["o_orderkey"]], batch_format="pandas"
        ).to_pandas()["o_orderkey"].to_numpy()
    )
    okey_ref = ray.put(okey_arr)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(batch: pd.DataFrame) -> pd.DataFrame:
        ok = ray.get(okey_ref)
        mask = np.isin(batch["l_orderkey"].to_numpy(), ok)
        batch = batch[mask].copy()
        batch["revenue_cents"] = _cents(
            (batch["l_extendedprice"] * (1 - batch["l_discount"])).to_numpy()
        )
        return batch[["l_orderkey", "revenue_cents"]]

    from ..stages.agg import grouped_sum_topk

    df = grouped_sum_topk(
        li.map_batches(rev, batch_format="pandas"),
        key="l_orderkey", value_col="revenue_cents", k=10,
    )
    # o_orderdate only for the k winners: one pushdown-pruned point read
    import pyarrow.parquet as _pq

    dates = _pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"],
        filters=[("o_orderkey", "in", [int(k) for k in df["l_orderkey"]])],
    ).to_pandas()
    df = df.merge(dates, left_on="l_orderkey", right_on="o_orderkey") \
           .drop(columns=["o_orderkey"])
    return df.rename(columns={"l_orderkey": "o_orderkey"})


def region_revenue(sf_dir: str):
    """Broadcast dimension-chain join customer->nation->region (J3)."""
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    c2r = {c: r2name[n2r[n]] for c, n in zip(cust["c_custkey"], cust["c_nationkey"])}
    ref = ray.put(c2r)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        batch = batch.copy()
        batch["r_name"] = batch["o_custkey"].map(m)
        batch["total_cents"] = _cents(batch["o_totalprice"].to_numpy())
        return batch[["r_name", "total_cents"]]

    from ..stages.agg import hash_grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("r_name", as_index=False).agg(
            n_orders=("total_cents", "size"), revenue_cents=("total_cents", "sum")
        )

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("r_name", as_index=False).agg(
            n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum")
        )

    return hash_grouped_agg(
        orders.map_batches(tag, batch_format="pandas"),
        ["r_name"], partial, combine, num_partitions=4,
    )


def top_parts_by_revenue(sf_dir: str):
    """Top-20 parts by revenue cents: broadcast dim semi-join + grouped sum-topk (at most k rows per key per batch ride the shuffle)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    pref = ray.put(dict(zip(part["p_partkey"], part["p_name"])))
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def rev(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["revenue_cents"] = _cents(
            (batch["l_extendedprice"] * (1 - batch["l_discount"])).to_numpy()
        )
        return batch[["l_partkey", "revenue_cents"]]

    from ..stages.agg import grouped_sum_topk

    top = grouped_sum_topk(
        li.map_batches(rev, batch_format="pandas"),
        key="l_partkey", value_col="revenue_cents", k=20,
    )
    top["p_name"] = top["l_partkey"].map(ray.get(pref))
    return top.rename(columns={"l_partkey": "p_partkey"})


def supplier_nation_stats(sf_dir: str):
    """Broadcast dim join supplier->nation: per-nation supplier counts and
    exact balance extrema (order-independent MIN/MAX floats)."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put(n2name)
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        b = b.copy()
        b["n_name"] = b["s_nationkey"].map(m)
        return b[["n_name", "s_acctbal"]]

    from ..stages.agg import hash_grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("n_name", as_index=False).agg(
            n_suppliers=("s_acctbal", "size"), min_bal=("s_acctbal", "min"),
            max_bal=("s_acctbal", "max"),
        )

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("n_name", as_index=False).agg(
            n_suppliers=("n_suppliers", "sum"), min_bal=("min_bal", "min"),
            max_bal=("max_bal", "max"),
        )

    return hash_grouped_agg(
        sup.map_batches(tag, batch_format="pandas"), ["n_name"],
        partial, combine, num_partitions=4,
    )


def q5_local_supplier_volume(sf_dir: str,
                             order_broadcast_threshold: int = 2_000_000):
    """TPC-H Q5-style local-supplier volume (J3/J1-style multi-join):
    revenue by nation for one region and one year where the line's
    supplier and the order's customer share a nation. Dim chains
    (region->nation, supplier->nation, customer->nation) broadcast as
    flat numpy lookups. The qualifying-order map is SIZE-GATED (it
    scales with the FACT table, orders/7, not a dimension): at or
    under ``order_broadcast_threshold`` keys it rides the object store
    as two aligned sorted arrays (int64 keys + int8 nation codes, one
    ``ray.put``) and the lineitem pass is one streaming searchsorted
    semi-join; above the gate it NEVER lands on the driver — lineitem
    (orderkey, snat, cents) partials and order (orderkey, cnat) marker
    rows meet in one tagged-union orderkey exchange (the
    ``customer_order_totals`` machinery) whose combine applies the
    snat==cnat locality filter, so only per-nation partials leave the
    partitions. Both paths sum exact int64 cents — bit-equal
    (forced-path test)."""
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkey = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    in_region = np.zeros(int(nation["n_nationkey"].max()) + 1, dtype=bool)
    in_region[nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"]] = True

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[in_region[cust["c_nationkey"].to_numpy()]]
    ckeys = cust["c_custkey"].to_numpy()
    order_c = np.argsort(ckeys, kind="stable")
    c_ref = ray.put((ckeys[order_c],
                     cust["c_nationkey"].to_numpy().astype(np.int8)[order_c]))

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def qualify(b: pd.DataFrame) -> pd.DataFrame:
        ck, cn = ray.get(c_ref)
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        if len(ck) == 0 or len(b) == 0:
            return pd.DataFrame({"o_orderkey": np.array([], dtype=np.int64),
                                 "cnat": np.array([], dtype=np.int8)})
        oc = b["o_custkey"].to_numpy()
        idx = np.searchsorted(ck, oc)
        idx[idx >= len(ck)] = 0
        hit = ck[idx] == oc
        out = pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy()[hit],
                            "cnat": cn[idx[hit]]})
        return out

    qual = orders.map_batches(qualify, batch_format="pandas").materialize()
    n_qual = qual.count()

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    skeys = sup["s_suppkey"].to_numpy()
    order_s = np.argsort(skeys, kind="stable")
    s_ref = ray.put((skeys[order_s],
                     sup["s_nationkey"].to_numpy().astype(np.int8)[order_s]))
    names = np.array([""] * (int(nation["n_nationkey"].max()) + 1), dtype=object)
    names[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()
    names_ref = ray.put(names)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    from ..stages.agg import hash_grouped_agg

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("n_name", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"))

    if n_qual <= order_broadcast_threshold:
        om = qual.to_pandas()
        order_o = np.argsort(om["o_orderkey"].to_numpy(), kind="stable")
        o_ref = ray.put((om["o_orderkey"].to_numpy()[order_o],
                         om["cnat"].to_numpy()[order_o]))

        def local_rev(b: pd.DataFrame) -> pd.DataFrame:
            ok, onat = ray.get(o_ref)
            sk, snat = ray.get(s_ref)
            nm = ray.get(names_ref)
            if len(ok) == 0 or len(b) == 0:
                return pd.DataFrame(
                    {"n_name": np.array([], dtype=object),
                     "revenue_cents": np.array([], dtype=np.int64)})
            lo_k = b["l_orderkey"].to_numpy()
            idx = np.searchsorted(ok, lo_k)
            idx[idx >= len(ok)] = 0
            hit = ok[idx] == lo_k
            sup_k = b["l_suppkey"].to_numpy()
            sidx = np.searchsorted(sk, sup_k)
            sidx[sidx >= len(sk)] = 0
            local = hit & (sk[sidx] == sup_k) & (snat[sidx] == onat[idx])
            b = b[local]
            cents = _cents(
                (b["l_extendedprice"] * (1 - b["l_discount"])).to_numpy())
            return (pd.DataFrame({"n_name": nm[snat[sidx[local]]],
                                  "revenue_cents": cents})
                    .groupby("n_name", as_index=False)
                    .agg(revenue_cents=("revenue_cents", "sum")))

        return hash_grouped_agg(
            li.map_batches(local_rev, batch_format="pandas"),
            ["n_name"], lambda b: b, combine, num_partitions=4,
        )

    # distributed path: tagged-union orderkey exchange; the fact-scaled
    # qualifying-order map never leaves the object store
    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        sk, snat = ray.get(s_ref)
        sup_k = b["l_suppkey"].to_numpy()
        sidx = np.searchsorted(sk, sup_k)
        sidx[sidx >= len(sk)] = 0
        ok_sup = sk[sidx] == sup_k
        cents = _cents(
            (b["l_extendedprice"] * (1 - b["l_discount"])).to_numpy())
        p = pd.DataFrame({"o_orderkey": b["l_orderkey"].to_numpy("int64"),
                          "nat": snat[sidx].astype(np.int8),
                          "cents": cents,
                          "is_ord": np.int8(0)})[ok_sup]
        return p.groupby(["o_orderkey", "nat", "is_ord"],
                         as_index=False)["cents"].sum()

    def ord_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy("int64"),
                             "nat": b["cnat"].to_numpy().astype(np.int8),
                             "is_ord": np.int8(1),
                             "cents": np.int64(0)})

    tagged = (li.map_batches(li_partial, batch_format="pandas")
              .union(qual.map_batches(ord_rows, batch_format="pandas")))

    def local_combine(part: pd.DataFrame) -> pd.DataFrame:
        nm = ray.get(names_ref)
        mk = part[part["is_ord"] == 1]
        cmap = pd.Series(mk["nat"].to_numpy("int64"),
                         index=mk["o_orderkey"].to_numpy("int64"))
        g = part[part["is_ord"] == 0]
        if len(g) == 0:
            return pd.DataFrame(
                {"n_name": np.array([], dtype=object),
                 "revenue_cents": np.array([], dtype=np.int64)})
        cn = g["o_orderkey"].map(cmap)
        local = cn.notna().to_numpy() & (
            cn.fillna(-1).to_numpy("int64") == g["nat"].to_numpy("int64"))
        g = g[local]
        return (pd.DataFrame({"n_name": nm[g["nat"].to_numpy("int64")],
                              "revenue_cents": g["cents"].to_numpy("int64")})
                .groupby("n_name", as_index=False)
                .agg(revenue_cents=("revenue_cents", "sum")))

    partials = hash_grouped_agg(tagged, ["o_orderkey"], lambda b: b,
                                local_combine)
    return hash_grouped_agg(partials, ["n_name"], lambda b: b, combine,
                            num_partitions=4)


def orders_lineitem_join(sf_dir: str):
    """Hash-partitioned large-side join via Dataset.join (both sides large —
    no broadcast join): per-order line counts + revenue for high-value
    orders. The high-value order KEYS are broadcast as a semi-join
    pre-filter so only qualifying line items enter the aggregation shuffle
    (~20% of the table); the row join itself stays a hash join."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    keys = np.sort(
        orders.map_batches(
            lambda b: b.loc[b["o_totalprice"] >= 400000.0, ["o_orderkey"]],
            batch_format="pandas",
        ).to_pandas()["o_orderkey"].to_numpy()
    )
    keys_ref = ray.put(keys)

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(keys_ref)
        b = b[np.isin(b["l_orderkey"].to_numpy(), k)].copy()
        b["revenue_cents"] = _cents(
            (b["l_extendedprice"] * (1 - b["l_discount"])).to_numpy()
        )
        return b[["l_orderkey", "revenue_cents"]]

    from ..stages.agg import hash_grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("l_orderkey", as_index=False).agg(
            n_lines=("revenue_cents", "size"), revenue_cents=("revenue_cents", "sum")
        )

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("l_orderkey", as_index=False).agg(
            n_lines=("n_lines", "sum"), revenue_cents=("revenue_cents", "sum")
        )

    per_order = hash_grouped_agg(
        li.map_batches(rev, batch_format="pandas"), ["l_orderkey"],
        partial, combine,
    )
    big = orders.map_batches(
        lambda b: b[b["o_totalprice"] >= 400000.0], batch_format="pandas"
    )
    joined = big.join(
        per_order, join_type="inner", num_partitions=8,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["total_cents"] = _cents(b["o_totalprice"].to_numpy())
        return b[["o_orderkey", "total_cents", "n_lines", "revenue_cents"]]

    return joined.map_batches(project, batch_format="pandas")


def events_type_topk(sf_dir: str):
    """Per-group top-k (T-family): each user's top-3 event types by count
    (ties by event_type asc) — partial counts per batch, per-user combine
    with a local head(3), SQL-checked."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("event_type", "size"))

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("n", "sum"))
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        out = g.groupby("user_id", as_index=False).head(3).copy()
        out["rnk"] = out.groupby("user_id").cumcount() + 1
        return out

    return hash_grouped_agg(ev, ["user_id"], partial, combine)


def events_type_pairs(sf_dir: str):
    """Market-basket pair support (frequent-itemset mining at the pairs
    level): for every unordered event-type pair, how many users did
    BOTH. Per-batch (user, type) dedup caps the user-keyed exchange;
    each complete user group expands to at most C(T,2) light pair rows
    (T = type vocabulary), which fold through a tiny pair-keyed count.
    The SQL oracle is the distinct (user, type) self-join."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    dedup = lambda b: b.drop_duplicates(["user_id", "event_type"])  # noqa: E731

    def pair_counts(part: pd.DataFrame) -> pd.DataFrame:
        part = dedup(part)  # complete user groups live in this partition
        m = part.merge(part, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        return (m.groupby(["event_type_x", "event_type_y"], as_index=False)
                .agg(n_users=("user_id", "size"))
                .rename(columns={"event_type_x": "type_a",
                                 "event_type_y": "type_b"}))

    partials = hash_grouped_agg(ev, ["user_id"], dedup, pair_counts)

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b

    def count_combine(p: pd.DataFrame) -> pd.DataFrame:
        out = p.groupby(["type_a", "type_b"], as_index=False).agg(
            n_users=("n_users", "sum"))
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return hash_grouped_agg(partials, ["type_a", "type_b"],
                            count_partial, count_combine)


def events_sliding_window(sf_dir: str):
    """Sliding 2h windows advancing hourly, per event_type: each event
    contributes to the window containing it and the previous one (overlap
    via explode, then the salted grouped aggregate)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    keys = ["event_type", "window_start"]

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["ts"].dt.floor("h")
        a = pd.DataFrame({"event_type": batch["event_type"], "window_start": h})
        b = pd.DataFrame(
            {"event_type": batch["event_type"],
             "window_start": h - pd.Timedelta(hours=1)}
        )
        return pd.concat([a, b], ignore_index=True)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, as_index=False).agg(n=("window_start", "size"))

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(keys, as_index=False).agg(n=("n", "sum"))

    exploded = ev.map_batches(explode, batch_format="pandas")
    return hash_grouped_agg(exploded, keys, partial, combine)


# ---------------- frontier semantics over relational data ----------------

def frontier_submit_merge(sf_dir: str):
    """S1 upsert-merge semantics: per key keep GREATEST(priority),
    LEAST(first-seen), count submissions (events.user_id as the key)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "value", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", as_index=False).agg(
            max_priority=("value", "max"), first_seen=("ts", "min"),
            n_submits=("value", "size"),
        )

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("user_id", as_index=False).agg(
            max_priority=("max_priority", "max"),
            first_seen=("first_seen", "min"),
            n_submits=("n_submits", "sum"),
        )

    return hash_grouped_agg(ev, ["user_id"], partial, combine)


def claim_ordering(sf_dir: str):
    """T1 claim-queue ordering: priority, then time, then key tiebreak."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"])
    return orders.sort(["o_orderpriority", "o_orderdate", "o_orderkey"]).limit(100)


def politeness_budget(sf_dir: str):
    """A2-style per-host window budget: events per (user, hour) + over-budget
    flag (token-bucket accounting as data)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["window_start"] = batch["ts"].dt.floor("h")
        return batch.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("ts", "size")
        )

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("n_events", "sum")
        )
        g["over_budget"] = g["n_events"] > 5
        return g

    return hash_grouped_agg(ev, ["user_id", "window_start"], partial, combine)


# ---------------- streaming-shaped ----------------

def events_tumbling_window(sf_dir: str):
    """Tumbling 1h windows per event_type (§2.9 streaming semantics as
    batch-over-log)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    keys = ["event_type", "window_start"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["window_start"] = batch["ts"].dt.floor("h")
        batch["value_cents"] = _cents(batch["value"].to_numpy())
        return batch.groupby(keys, as_index=False).agg(
            n=("value", "size"), sum_value_cents=("value_cents", "sum"),
            min_value=("value", "min"), max_value=("value", "max"),
        )

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(keys, as_index=False).agg(
            n=("n", "sum"), sum_value_cents=("sum_value_cents", "sum"),
            min_value=("min_value", "min"), max_value=("max_value", "max"),
        )

    return hash_grouped_agg(ev, keys, partial, combine)


def events_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user. Events hash-route
    by user so each partition holds its users' FULL event streams; the
    session count is then one vectorized sort + shifted-diff over the
    whole partition (ordering: (ts, event_id) within user) — no per-user
    Python dispatch."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def sessions_part(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            # typed to the REAL output dtypes: an object-dtype user_id here
            # would be genuine schema drift vs non-empty partitions
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n_sessions": pd.Series(dtype="int64"),
                                 "n_events": pd.Series(dtype="int64")})
        p = part.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = p["user_id"].ne(p["user_id"].shift())
        gap = (p["ts"].diff() > pd.Timedelta(minutes=30)) & ~new_user
        p = p.assign(_start=(new_user | gap).astype("int64"))
        return p.groupby("user_id", as_index=False).agg(
            n_sessions=("_start", "sum"), n_events=("_start", "size"))

    return hash_grouped_agg(ev, ["user_id"], lambda b: b, sessions_part)


# ---------------- text / documents ----------------

def doc_stratified_sample(sf_dir: str):
    """Deterministic per-stratum k-sample: within each language, keep the
    25 docs ranked smallest by a Knuth multiplicative hash of doc_id
    (overflow-free: (doc_id % 2^31) * 2654435761 % 2^32, exactly
    reproducible in SQL) — the reproducible way to subsample a corpus
    without a shuffle-heavy random_shuffle. Distributed as per-batch
    local top-k -> key-hashed exact top-k (stages/agg.grouped_topk_rows:
    at most k rows per stratum per batch ride the shuffle)."""
    from ..stages.agg import grouped_topk_rows

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def hashed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["hv"] = ((b["doc_id"].to_numpy() % np.int64(2**31))
                   * np.int64(2654435761)) % np.int64(2**32)
        return b

    return grouped_topk_rows(
        docs.map_batches(hashed, batch_format="pandas"),
        key="lang", order_cols=["lang", "hv", "doc_id"], k=25)


def events_asof_join(sf_dir: str):
    """Backward as-of join over the events stream: each purchase gets the
    latest prior-or-simultaneous view by the same user (inclusive ts,
    max-event_id tie-break, unmatched purchases dropped). One user-keyed
    shuffle, per-partition vectorized resolve — the custom operator Ray
    Data lacks, SQL-oracle-checked against a window-function rewrite of
    DuckDB's ASOF JOIN."""
    from ..stages.asof import asof_join_backward_tagged

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    # both sides come from the SAME table: tag in one scan instead of
    # unioning two filtered re-reads of events.parquet
    def tag(b: pd.DataFrame) -> pd.DataFrame:
        et = b["event_type"].to_numpy()
        m = (et == "purchase") | (et == "view")
        b = b[m]
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(),
            "ts": b["ts"].to_numpy(),
            "_side": (b["event_type"].to_numpy() == "purchase").astype(np.int8),
            "_v": b["event_id"].to_numpy(),
        })

    mixed = ev.map_batches(tag, batch_format="pandas")
    out = asof_join_backward_tagged(mixed, key="user_id", ts="ts",
                                    left_id="event_id", out_val="view_id")
    return out.map_batches(
        lambda b: b.rename(columns={"event_id": "purchase_id"}),
        batch_format="pandas")


def events_range_join(sf_dir: str):
    """Backward RANGE join: every (purchase, view) pair by the same user
    with the view inside the hour ending at the purchase (both ends
    inclusive) — the banded custom join, SQL-oracle-checked against a
    DuckDB interval join. Single scan of events, one user-keyed shuffle,
    vectorized interval expansion per partition."""
    from ..stages.asof import range_join_backward_tagged

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        et = b["event_type"].to_numpy()
        m = (et == "purchase") | (et == "view")
        b = b[m]
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(),
            "ts": b["ts"].to_numpy(),
            "_side": (b["event_type"].to_numpy() == "purchase").astype(np.int8),
            "_v": b["event_id"].to_numpy(),
        })

    mixed = ev.map_batches(tag, batch_format="pandas")
    out = range_join_backward_tagged(
        mixed, key="user_id", ts="ts", left_id="event_id",
        delta=pd.Timedelta(hours=1), out_val="view_id")
    return out.map_batches(
        lambda b: b.rename(columns={"event_id": "purchase_id"}),
        batch_format="pandas")


def events_heavy_users(sf_dir: str):
    """EXACT frequent-user detection at sketch shuffle cost: a mergeable
    Misra-Gries pass (<= k light rows per batch regardless of user
    cardinality) finds candidates with a no-false-negative bound, an
    exact recount of the broadcast candidate set finalizes — equivalent
    to GROUP BY user_id HAVING COUNT(*) >= 80 (stages/sketch.py)."""
    from ..stages.sketch import heavy_hitters

    ev = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters(ev, "user_id", min_count=80)


def lineitem_price_quantiles(sf_dir: str):
    """Exact discrete quantiles of l_extendedprice WITHOUT a global sort
    (distributed selection: seeded pivots + counting passes + bounded
    pull; stages/sketch.py). Matches quantile_disc exactly; the small-sf
    corpus resolves in the first bounded pull, the narrowing loop is the
    100-TB path (forced in tests via max_pull)."""
    from ..stages.sketch import exact_quantiles

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return exact_quantiles(li, "l_extendedprice",
                           qs=(0.25, 0.5, 0.75, 0.95))


def lineitem_price_quantiles_kll(sf_dir: str):
    """One-pass mergeable KLL quantile sketch over l_extendedprice
    (stages/sketch.py KLLSketch): every batch emits one ~5 KB blob, a
    64-way combine tree folds them, the driver reads all five quantiles
    from O(k log n) floats — the single-pass telemetry companion to the
    exact multi-pass lineitem_price_quantiles. Returns (q, value,
    kll_ok) where value is the EXACT quantile_disc (distributed
    selection) and kll_ok asserts the sketch estimate's realized
    normalized rank error <= 2% (one extra counting pass ranks each
    estimate). The sketch itself isn't SQL-expressible but this shape
    is SQL-hash oracled: the oracle recomputes the exact quantiles and
    pins kll_ok=TRUE, so a drifting sketch fails the driver gate.
    Tighter 1% error additionally asserted in tests/test_sketch.py."""
    from ..stages.sketch import exact_quantiles, kll_quantiles

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    est = kll_quantiles(li, "l_extendedprice", qs=qs, k=256)
    exact = exact_quantiles(li, "l_extendedprice", qs=qs)
    thr = est["value"].to_numpy("float64")

    def rank_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["l_extendedprice"].to_numpy("float64")
        return pd.DataFrame({
            "i": np.arange(len(thr), dtype=np.int64),
            "n_le": np.searchsorted(np.sort(v), thr, side="right")
            .astype(np.int64),
            "n": np.int64(len(v)),
        })

    ranks = (li.map_batches(rank_partial, batch_format="pandas")
             .to_pandas().groupby("i").sum())
    rel = np.abs(ranks["n_le"].to_numpy("float64")
                 / max(int(ranks["n"].iloc[0]), 1)
                 - np.asarray(qs, dtype=np.float64))
    out = exact.copy()
    out["kll_ok"] = (rel <= 0.02).astype(bool)
    return out


def doc_compacted_roundtrip(sf_dir: str):
    """Small-file compaction round trip (stages/compact.py): the
    documents table is written as 48 tiny part files (the shape a
    long crawl's fused sink leaves behind), compacted with the
    crash-safe two-phase operator (marker -> atomic write -> member
    delete, one Ray task per bin-packed group), and read back. Row
    content is untouched by construction, so the result is SQL-hash
    oracled: (doc_id, n_chars) straight from the compacted files —
    and the query asserts the file count actually collapsed."""
    import tempfile

    import ray.data

    from ..stages.compact import compact_dir, live_files

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tmp = tempfile.mkdtemp(prefix="compact_docs_", dir="/tmp")
    docs.repartition(48).write_parquet(tmp)
    before = len(live_files(tmp))
    stats = compact_dir(tmp, target_bytes=64 * 1024 * 1024)
    assert stats["files_after"] < before, stats

    out = ray.data.read_parquet(live_files(tmp))

    def select(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "n_chars": b["text"].str.len().astype("int64")})

    return out.map_batches(select, batch_format="pandas")


def doc_erasure_roundtrip(sf_dir: str):
    """Targeted-erasure maintenance operator (stages/compact.py
    delete_rows): the documents table is written as 24 part files, all
    EVEN doc_ids are erased (containment probe per file reads one
    column; only files that hit are rewritten via atomic replace, with
    a parquet audit trail), and the survivors are read back. SQL-hash
    oracled: (doc_id, n_chars) WHERE doc_id % 2 = 1 — plus in-query
    asserts that the deletion is idempotent and audited."""
    import tempfile

    import ray.data

    from ..stages.compact import delete_rows, live_files, read_audit

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tmp = tempfile.mkdtemp(prefix="erase_docs_", dir="/tmp")
    docs.repartition(24).write_parquet(tmp)
    ids = docs.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["doc_id"][b["doc_id"] % 2 == 0]}),
        batch_format="pandas").to_pandas()["doc_id"].tolist()
    audit = f"{tmp}/_audit"
    stats = delete_rows(tmp, "doc_id", ids, audit_path=audit)
    assert stats["rows_deleted"] == len(ids), stats
    again = delete_rows(tmp, "doc_id", ids, audit_path=audit)
    assert again["rows_deleted"] == 0 and again["files_rewritten"] == 0
    assert read_audit(audit).num_rows == len(ids)

    out = ray.data.read_parquet(live_files(tmp))

    def select(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "n_chars": b["text"].str.len().astype("int64")})

    return out.map_batches(select, batch_format="pandas")


def events_late_data(sf_dir: str):
    """Watermark / late-data semantics (§2.9 streaming-as-batch): each
    event arrives with a deterministic hash-jittered delay (0-2 h,
    mirrored exactly in the oracle), the watermark is the running max
    event-time over everything that arrived EARLIER, and an event is
    late when its own time trails the watermark by more than the 1 h
    allowed lateness. The global ordered prefix-max is mega-key-safe:
    arrival-time-bucketed local prefix-maxes + a 64-row cross-bucket
    offset table — the same two-exchange shape as the salted running
    totals; no partition ever holds the whole stream. Returns per-type
    (n_total, n_late); SQL-hash oracled against the window-function
    form."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    NB = 64
    LATE_US = 3600 * 1_000_000
    I64MIN = np.iinfo(np.int64).min

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        ts_us = b["ts"].astype("datetime64[us]").astype("int64")
        # event_id is reduced mod 1e5 BEFORE the Knuth multiplier so the
        # product stays far inside int64 at any corpus scale — numpy
        # would wrap silently while DuckDB errors, and the two sides
        # must stay bit-identical
        jitter = (b["event_id"] % 100_000) * 2654435761 % 7200 * 1_000_000
        return pd.DataFrame({
            "event_id": b["event_id"].astype("int64"),
            "ts_us": ts_us,
            "arrival_us": ts_us + jitter.astype("int64"),
            "event_type": b["event_type"],
        })

    rows = ev.map_batches(prep, batch_format="pandas")
    mm = rows.map_batches(
        lambda b: pd.DataFrame({"mn": [b["arrival_us"].min()],
                                "mx": [b["arrival_us"].max()]}),
        batch_format="pandas").to_pandas()
    mn, mx = int(mm["mn"].min()), int(mm["mx"].max())

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = ((b["arrival_us"] - mn) * NB
                       // (mx - mn + 1)).astype("int64")
        return b

    rows = rows.map_batches(bucketize, batch_format="pandas")

    def local_wm(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, sub in part.groupby("bucket", sort=False):
            s = sub.sort_values(["arrival_us", "event_id"],
                                kind="mergesort")
            ts = s["ts_us"].to_numpy()
            wm = np.empty(len(ts), dtype=np.int64)
            wm[0] = I64MIN
            if len(ts) > 1:
                np.maximum.accumulate(ts[:-1], out=wm[1:])
            out.append(s.assign(local_wm=wm))
        return pd.concat(out) if out else part.assign(
            local_wm=pd.Series(dtype="int64"))

    with_wm = hash_grouped_agg(rows, ["bucket"], lambda b: b, local_wm)

    # 64-row cross-bucket offset table: exclusive prefix-max of each
    # bucket's max event-time, in bucket (= arrival) order
    bmax = hash_grouped_agg(
        rows, ["bucket"],
        lambda b: b.groupby("bucket", as_index=False)["ts_us"].max(),
        lambda p: p.groupby("bucket", as_index=False)["ts_us"].max(),
    ).to_pandas().sort_values("bucket")
    offs = np.full(NB, I64MIN, dtype=np.int64)
    run = I64MIN
    for bkt, m in zip(bmax["bucket"], bmax["ts_us"]):
        offs[int(bkt)] = run
        run = max(run, int(m))
    offs_list = offs.tolist()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        wm = np.maximum(b["local_wm"].to_numpy(),
                        np.asarray(offs_list, dtype=np.int64)[
                            b["bucket"].to_numpy()])
        seen = wm != I64MIN
        late = seen & (b["ts_us"].to_numpy() < wm - LATE_US)
        g = pd.DataFrame({"event_type": b["event_type"],
                          "late": late.astype("int64")}) \
            .groupby("event_type", as_index=False) \
            .agg(n_total=("late", "size"), n_late=("late", "sum"))
        g["n_total"] = g["n_total"].astype("int64")
        return g

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("event_type", as_index=False)[["n_total", "n_late"]] \
             .sum()
        return g.astype({"n_total": "int64", "n_late": "int64"})

    staged = with_wm.map_batches(finalize, batch_format="pandas")
    return hash_grouped_agg(staged, ["event_type"],
                            lambda b: b, combine)


def events_pruned_read(sf_dir: str):
    """Zone-map pruned range read (sources/pruned.py): the events table
    is written time-clustered (sorted by ts -> range-partitioned
    blocks -> disjoint per-file min/max), then a middle-third time
    range is answered by opening ONLY the files whose footer [min,max]
    intersects it (distributed metadata pass, no data pages) with the
    row filter pushed down for edge exactness. The query asserts real
    pruning happened (files_read < files_total) and returns per-type
    counts — SQL-hash oracled with the same integer-us bound
    arithmetic."""
    import tempfile

    from ..sources.pruned import pruned_read

    ev = _read(sf_dir, "events", ["ts", "event_type"], blocks=16)

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
            "event_type": b["event_type"],
        })

    ev_us = ev.map_batches(to_us, batch_format="pandas")
    tmp = tempfile.mkdtemp(prefix="pruned_events_", dir="/tmp")
    ev_us.sort("ts_us").write_parquet(tmp)

    mm = ev_us.map_batches(
        lambda b: pd.DataFrame({"mn": [b["ts_us"].min()],
                                "mx": [b["ts_us"].max()]}),
        batch_format="pandas").to_pandas()
    mn, mx = int(mm["mn"].min()), int(mm["mx"].max())
    lo = mn + (mx - mn) // 3
    hi = mn + 2 * ((mx - mn) // 3)
    ds, stats = pruned_read(tmp, "ts_us", lo, hi)
    # the sorted write may land in few files on tiny inputs / odd CPU
    # counts; only a real multi-file layout must demonstrate pruning
    if stats["files_total"] >= 8:
        assert stats["files_read"] < stats["files_total"], stats

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", as_index=False).size() \
             .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("event_type", as_index=False)["n"].sum()
        g["n"] = g["n"].astype("int64")
        return g

    from ..stages.agg import hash_grouped_agg

    return hash_grouped_agg(ds, ["event_type"], partial, combine)


def events_zorder_pruned(sf_dir: str):
    """Z-order (Morton) clustered layout (sources/pruned.py
    write_zordered): events are written sorted by the interleaved
    (user_id, ts_us) key, so zone-map pruning works on EITHER
    dimension — the query proves both (files_read < files_total for a
    user range AND for a time range; a single-column sort can only
    prune its own key), then answers the user-range per-type counts
    from the pruned read. SQL-hash oracled with the same integer bound
    arithmetic; layout affects IO only, the pushed-down row filter
    keeps edges exact."""
    import tempfile

    from ..sources.pruned import pruned_read, write_zordered

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"],
               blocks=16)

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
            "user_id": b["user_id"],
            "event_type": b["event_type"],
        })

    ev_us = ev.map_batches(to_us, batch_format="pandas")
    tmp = tempfile.mkdtemp(prefix="zorder_events_", dir="/tmp")
    # the write's own stats pass doubles as the bound source — no
    # second scan of the events table
    bounds = write_zordered(ev_us, "user_id", "ts_us", tmp)
    umn, umx = int(bounds["a_min"]), int(bounds["a_max"])
    tmn, tmx = int(bounds["b_min"]), int(bounds["b_max"])
    ulo = umn + (umx - umn) // 3
    uhi = umn + 2 * ((umx - umn) // 3)
    # both dimensions must prune under the one layout
    _, tstats = pruned_read(tmp, "ts_us",
                            tmn + (tmx - tmn) // 3,
                            tmn + 2 * ((tmx - tmn) // 3))
    ds, ustats = pruned_read(tmp, "user_id", ulo, uhi,
                             columns=["user_id", "event_type"])
    if ustats["files_total"] >= 8:
        assert ustats["files_read"] < ustats["files_total"], ustats
        assert tstats["files_read"] < tstats["files_total"], tstats

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", as_index=False).size() \
             .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("event_type", as_index=False)["n"].sum()
        g["n"] = g["n"].astype("int64")
        return g

    from ..stages.agg import hash_grouped_agg

    return hash_grouped_agg(ds, ["event_type"], partial, combine)


def doc_evolved_read(sf_dir: str):
    """Schema-evolution read (sources/pruned.py read_evolved): half the
    documents are written in the OLD sink schema (no lang column), half
    in the new one, into the same directory; read_evolved harmonizes
    every file to the target schema (missing lang -> typed nulls) and
    the query rolls up per-lang counts with NULL -> 'unknown'. SQL-hash
    oracled via the same doc_id%2 rule."""
    import tempfile

    from ..sources.pruned import read_evolved

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    tmp = tempfile.mkdtemp(prefix="evolved_docs_", dir="/tmp")
    docs.map_batches(
        lambda b: b.loc[b["doc_id"] % 2 == 0, ["doc_id"]],
        batch_format="pandas").write_parquet(f"{tmp}/v1")
    docs.map_batches(
        lambda b: b.loc[b["doc_id"] % 2 != 0],
        batch_format="pandas").write_parquet(f"{tmp}/v2")
    import glob as _glob

    files = sorted(_glob.glob(f"{tmp}/v1/*.parquet")
                   + _glob.glob(f"{tmp}/v2/*.parquet"))
    target = pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
    ds = read_evolved(files, target)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lang = b["lang"].fillna("unknown")
        g = pd.DataFrame({"lang": lang}).groupby(
            "lang", as_index=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("lang", as_index=False)["n"].sum()
        g["n"] = g["n"].astype("int64")
        return g

    from ..stages.agg import hash_grouped_agg

    return hash_grouped_agg(ds, ["lang"], partial, combine)


def lineitem_flag_price_quantiles_kll(sf_dir: str):
    """Grouped KLL: per-l_returnflag price quantiles of the continuous
    l_extendedprice column in ONE pass (stages/sketch.py
    grouped_kll_quantiles) — per-group ~5 KB sketch blobs ride the
    group-hash exchange instead of the values. Returns (l_returnflag,
    q, value, kll_ok): value is the EXACT per-group quantile_disc (the
    count-map grouped quantiles work here because 2-decimal prices are
    a bounded-multiplicity domain — distinct (flag, price) pairs, not
    the row multiset, ride the exchange) and kll_ok asserts the
    per-group sketch estimate's realized normalized rank error <= 2%
    via one extra counting pass. SQL-hash oracled: the oracle
    recomputes the grouped exact quantiles, pins kll_ok=TRUE. Tighter
    1% error additionally asserted in tests/test_sketch.py."""
    from ..stages.agg import hash_grouped_agg
    from ..stages.sketch import grouped_kll_quantiles, grouped_value_quantiles

    qs = (0.25, 0.5, 0.75)
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    est = grouped_kll_quantiles(li, "l_returnflag", "l_extendedprice",
                                qs=qs, k=256).to_pandas()
    exact = grouped_value_quantiles(li, "l_returnflag", "l_extendedprice",
                                    qs=qs).to_pandas()
    # per-(flag, q) rank check: tiny thresholds dict broadcast into one
    # counting pass; per-batch partial rows are (flag, i, n_le, n)
    est = est.sort_values(["l_returnflag", "q"]).reset_index(drop=True)
    thr = {f: g["value"].to_numpy("float64")
           for f, g in est.groupby("l_returnflag", sort=False)}
    thr_ref = ray.put(thr)

    def rank_partial(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        rows = []
        for f, sub in b.groupby("l_returnflag", sort=False):
            v = np.sort(sub["l_extendedprice"].to_numpy("float64"))
            n_le = np.searchsorted(v, t[f], side="right")
            for i, nl in enumerate(n_le):
                rows.append((f, np.int64(i), np.int64(nl),
                             np.int64(len(v))))
        return pd.DataFrame(rows, columns=["l_returnflag", "i", "n_le", "n"])

    ranks = hash_grouped_agg(
        li.map_batches(rank_partial, batch_format="pandas"),
        ["l_returnflag", "i"],
        lambda b: b,
        lambda p: p.groupby(["l_returnflag", "i"], as_index=False)
        [["n_le", "n"]].sum(),
    ).to_pandas()
    qarr = np.asarray(qs, dtype=np.float64)
    ranks["rel"] = np.abs(
        ranks["n_le"].to_numpy("float64")
        / np.maximum(ranks["n"].to_numpy("float64"), 1)
        - qarr[ranks["i"].to_numpy("int64")])
    ok = {(f, int(i)): bool(r <= 0.02)
          for f, i, r in zip(ranks["l_returnflag"], ranks["i"],
                             ranks["rel"])}
    out = exact.sort_values(["l_returnflag", "q"]).reset_index(drop=True)
    qidx = {float(q): i for i, q in enumerate(qs)}
    out["kll_ok"] = [ok[(f, qidx[float(q)])]
                     for f, q in zip(out["l_returnflag"], out["q"])]
    return out


def doc_token_stats(sf_dir: str):
    """Per-doc token/char/stopword stats through the TextStats actor pool (vectorized pandas-str kernels, stateful setup once per actor)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = text_stats(docs, concurrency=2, fingerprint=False, langid=False)

    def select(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id", "lang", "n_chars", "n_words"]]

    return out.map_batches(select, batch_format="pandas")


def doc_quality_gate(sf_dir: str):
    """M16/G7-style quality gate as a vectorized filter."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(batch["text"])
        digits = pc.count_substring_regex(batch["text"], "[0-9]")
        keep = pc.and_(
            pc.greater_equal(n_chars, 200),
            pc.less(pc.cast(digits, pa.float64()),
                    pc.multiply(pc.cast(n_chars, pa.float64()), 0.2)),
        )
        out = batch.filter(keep)
        return pa.Table.from_arrays(
            [out["doc_id"], pc.utf8_length(out["text"])], names=["doc_id", "n_chars"]
        )

    return docs.map_batches(gate, batch_format="pyarrow")


def exact_dedup_docs(sf_dir: str):
    """Exact content dedup: sha of text, min-doc-id winner per sha via associative partial+combine drop_duplicates."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(docs)

    def select(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id", "text_sha"]]

    return out.map_batches(select, batch_format="pandas")


def ngram_jaccard_docs(sf_dir: str):
    """EXACT word-3-gram Jaccard similarity join at J >= 0.5 over the
    documents table (All-Pairs/PPJoin prefix filtering; the exact operator
    that minhash_dedup_docs approximates). SQL-oracle-checked: jaccard is
    one float64 division of exact intersection/size counts, so the value
    is bit-identical to DuckDB's."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return ngram_jaccard_pairs(docs, threshold=0.5)


def doc_repetition_stats(sf_dir: str):
    """Gopher-style per-doc repetition signals (top-2/3-gram fraction,
    within-doc duplicated-5-gram token coverage, keep flag) — pure
    map_batches, no shuffle. The raw corpus has no within-doc repeats, so
    docs with ``doc_id % 7 == 3`` (and >= 12 tokens) get their first 12
    tokens appended — deterministic, mirrored in the oracle CTE — to
    exercise the duplicate-5-gram path. Fractions are single float64
    divisions of exact integer counts (bit-identical to DuckDB)."""
    from ..stages.repetition import repetition_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())

    def augment(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split()
        m = ((b["doc_id"] % 7 == 3)
             & (toks.str.len().fillna(0) >= 12)).to_numpy()
        if m.any():
            first12 = toks.str[:12].str.join(" ")
            b = b.copy()
            b["text"] = np.where(m, b["text"] + " " + first12, b["text"])
        return b

    return repetition_stats(docs.map_batches(augment, batch_format="pandas"))


def dup_span_docs(sf_dir: str):
    """Exact cross-document duplicate 8-gram spans (Lee et al. 2022
    style): per doc, the number of 8-token windows whose text occurs more
    than once in the corpus and the fraction of token positions covered
    by a duplicate window. Hash-prefiltered + string-verified — exact, so
    SQL-oracle-checked."""
    from ..stages.repetition import dup_span_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return dup_span_stats(docs, k=8)


def lang_stats(sf_dir: str):
    """Per-language doc counts + token mass (map-side partials, one lang-keyed combine)."""
    from ray.data.aggregate import Count, Sum

    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    return docs.groupby("lang").aggregate(
        Count(alias_name="n"), Sum("n_chars", alias_name="total_chars")
    )


def doc_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3 App. C-style word-k-gram overlap,
    k=5 for the short synthetic docs): every corpus doc sharing any
    distinct 5-gram with the held-out eval slice (doc_id % 19 == 0) is
    flagged. Exact — hit counts are distinct-gram set intersections, the
    frac one float64 division — so SQL-oracle-checked."""
    from ..stages.corpus import decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    corpus = docs.map_batches(lambda b: b[b["doc_id"] % 19 != 0],
                              batch_format="pandas")
    bench = docs.map_batches(lambda b: b[b["doc_id"] % 19 == 0],
                             batch_format="pandas")
    return decontaminate(corpus, bench, k=5)


def doc_pack_windows(sf_dir: str):
    """GPT-style sequence packing: concatenate docs in doc_id order and
    chunk into 256-token windows via a DISTRIBUTED PREFIX SUM (per-bucket
    token sums -> driver exclusive prefix over the tiny bucket table ->
    per-bucket cumsum). Integer-only — SQL-oracle-checked against a
    window-function cumsum."""
    from ..stages.corpus import pack_windows

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return pack_windows(docs, window=256, bucket_width=64)


def lang_balanced_sample(sf_dir: str):
    """Deterministic language-balanced downsample: each language kept at
    the smallest language's size in expectation via the multiplicative
    doc-hash threshold (exact integer math; hv*cnt < min_cnt*2^32).
    SQL-oracle-checked."""
    from ..stages.corpus import balanced_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return balanced_sample(docs, group_col="lang")


def training_export(sf_dir: str):
    """End-to-end training-export pipeline, every stage exact so the WHOLE
    chain is SQL-hash-checked: token-length gate (>= 30 ws tokens) ->
    exact text dedup (min doc_id per identical text) -> benchmark
    decontamination (drop the doc_id % 19 eval slice and every doc
    sharing a word-5-gram with it) -> language-balanced sampling (exact
    hash threshold) -> sequence packing into 256-token windows
    (distributed prefix sum) -> deterministic shuffle positions. One row
    per exported doc with its window interval and shuffle position —
    the full corpus-prep shape a 100 TB training run needs. ZERO joins:
    text is tokenized/shingled once up front, and every later stage
    passes the light (doc_id, lang, n_tokens) metadata through via
    ``keep_cols`` instead of joining back to the corpus."""
    from ..stages.corpus import (balanced_sample, decontaminate,
                                 pack_windows, shuffle_positions,
                                 _ws_token_counts)
    from ..stages.dedup import exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"],
                 blocks=_cpus())

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_tokens"] = _ws_token_counts(b["text"])
        return b[b["n_tokens"] >= 30]

    gated = docs.map_batches(gate, batch_format="pandas")
    deduped = exact_dedup(gated)

    bench = docs.map_batches(lambda b: b[b["doc_id"] % 19 == 0],
                             batch_format="pandas")
    corpus = deduped.map_batches(
        lambda b: b.loc[b["doc_id"] % 19 != 0,
                        ["doc_id", "text", "lang", "n_tokens"]],
        batch_format="pandas")
    dec = decontaminate(corpus, bench, k=5, keep_cols=("lang", "n_tokens"))
    # materialized HERE, where text is already gone (light (doc_id, lang,
    # n_tokens) rows): every downstream stage is two-pass (count/prefix
    # aggregate + map), so an unmaterialized `clean` would re-execute the
    # heavy gate -> exact-dedup -> decontaminate text chain ~5x.
    clean = dec.map_batches(
        lambda b: b.loc[b["n_hit"] == 0, ["doc_id", "lang", "n_tokens"]],
        batch_format="pandas").materialize()

    sampled = balanced_sample(clean, group_col="lang",
                              keep_cols=("n_tokens",))
    packed = pack_windows(sampled, tokens_col="n_tokens",
                          keep_cols=("lang",), window=256, bucket_width=64)
    out = shuffle_positions(
        packed, keep_cols=("lang", "n_tokens", "offset", "first_window",
                           "last_window", "n_windows"))
    return out.map_batches(
        lambda b: b[["doc_id", "lang", "n_tokens", "offset", "first_window",
                     "last_window", "n_windows", "hv", "pos"]],
        batch_format="pandas")


def doc_shuffle_positions(sf_dir: str):
    """Deterministic global shuffle for training export: stable position
    = rank under (multiplicative doc hash, doc_id), computed as a
    distributed prefix sum over hash-range buckets. SQL-oracle-checked
    against a window-function row_number."""
    from ..stages.corpus import shuffle_positions

    docs = _read(sf_dir, "documents", ["doc_id"])
    return shuffle_positions(docs)


def source_token_mixture(sf_dir: str):
    """Token-budget mixture sampling: each source downsampled so its
    EXPECTED kept token mass equals the smallest source's total tokens
    (hv * source_tokens < min_tokens * 2^32, exact integer math).
    SQL-oracle-checked."""
    from ..stages.corpus import token_budget_sample

    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    return token_budget_sample(docs, group_col="source")


def doc_unigram_lm(sf_dir: str):
    """CCNet-style unigram-LM quality signal: each doc's OOV rate and
    mean reference-token frequency against the reference slice's
    (doc_id % 7 == 0) unigram counts. Integer numerators + two single
    float64 divisions — SQL-oracle-checked."""
    from ..stages.corpus import unigram_lm_score

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    ref = docs.map_batches(lambda b: b[b["doc_id"] % 7 == 0],
                           batch_format="pandas")
    return unigram_lm_score(docs, ref)


# ---------------- embeddings ----------------

def knn_bruteforce(sf_dir: str):
    """ANN baseline: exact cosine top-10 for the first 3 vectors (float64
    so ranking matches the float64 SQL oracle)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet")
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = brute_force_topk(ds, queries, k=10, concurrency=2, dtype=np.float64)
    out["query_id"] = out["query_id"].map(dict(enumerate(qdf["vec_id"])))
    return out[["query_id", "vec_id", "rank"]]


def embedding_label_stats(sf_dir: str):
    """Per-label vector counts + exact fixed-point mean-norm stats over the embeddings table."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "embeddings", ["vec_id", "label"])
    return ds.groupby("label").aggregate(
        Count(alias_name="n"), Min("vec_id", alias_name="min_vec_id")
    )


# ---------------- non-SQL operators (rows-only driver check) ----------------

def minhash_dedup_docs(sf_dir: str):
    """MinHash-LSH near-dup clustering (shingle -> minhash -> band buckets -> verify -> CC); checked against the exact brute-force Jaccard twin in tests."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return minhash_lsh_dedup(docs, jaccard_threshold=0.8)


def simhash_docs(sf_dir: str):
    """SimHash near-dup flags via pigeonhole band blocking + exact Hamming verify; sub-banded hot buckets."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return simhash_dedup(docs)


def _augmented_embeddings(sf_dir: str) -> pd.DataFrame:
    """Deterministic near-dup-bearing corpus derived from the embeddings
    table (the raw table contains no pairs above cos 0.5): exact copies of
    vec_id<60 at id+1_000_000, and near-copies of 60<=vec_id<120 (first
    coordinate scaled x3 -> cosines spread across the 0.98 threshold,
    margin >=5e-4 so float64 summation order can't flip a decision) at
    id+2_000_000. Mirrored EXACTLY by the SQL CTE in the oracles."""
    df = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    V = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ids = df["vec_id"].to_numpy()
    exact_sel = ids < 60
    near_sel = (ids >= 60) & (ids < 120)
    near = V[near_sel].copy()
    near[:, 0] = near[:, 0] * 3.0
    aug = pd.DataFrame({
        "vec_id": np.concatenate(
            [ids, ids[exact_sel] + 1_000_000, ids[near_sel] + 2_000_000]),
        "embedding": list(V) + list(V[exact_sel]) + list(near),
    })
    return aug


_AUG_SQL = """
        WITH aug AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
            FROM embeddings
            UNION ALL
            SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[])
            FROM embeddings WHERE vec_id < 60
            UNION ALL
            SELECT vec_id + 2000000,
                   list_prepend(CAST(embedding[1] AS DOUBLE) * 3.0,
                                CAST(embedding[2:] AS DOUBLE[]))
            FROM embeddings WHERE vec_id >= 60 AND vec_id < 120
        )
"""


def embedding_near_dup_q(sf_dir: str):
    """Embedding cosine near-dup via multi-table hyperplane LSH;
    measured pair recall vs the exact SQL-checked pair oracle."""
    aug = _augmented_embeddings(sf_dir)
    ds = rd.from_pandas(aug).repartition(8)
    return embedding_near_dup(ds, cosine_threshold=0.98)


def semdedup_exact(sf_dir: str):
    """SemDeDup degenerate setting n_clusters=1 == EXACT all-pairs cosine
    dedup over the augmented embeddings — SQL-oracle-checked against a
    recursive connected-components CTE, so the whole cluster_assign
    machinery (pairs -> CC -> min-id labels) is hash-verified."""
    from ..stages.dedup import semdedup

    aug = _augmented_embeddings(sf_dir)
    ds = rd.from_pandas(aug).repartition(8)
    return semdedup(ds, n_clusters=1, cosine_threshold=0.98)


def semdedup_docs(sf_dir: str):
    """SemDeDup proper (k-means partition + within-cluster exact cosine
    dedup, n_clusters=8) beside its exact twin, SQL-hash oracled via a
    containment invariant: a within-kcluster cosine component is a subset
    of the global component, so min(within) >= min(global) and every doc
    the EXACT dedup keeps (min-id rule) must also be kept at n_clusters=8.
    Returns per doc (vec_id, kept_exact, containment_ok); the oracle
    recomputes kept_exact with the recursive-CC CTE and pins
    containment_ok=TRUE — a drifting cluster assign/verify fails the
    driver gate. Recall of the approximate setting (its only remaining
    free behavior) stays measured in test_dedup_quality."""
    from ..stages.dedup import semdedup

    aug = _augmented_embeddings(sf_dir)
    approx = semdedup(rd.from_pandas(aug).repartition(8),
                      n_clusters=8, cosine_threshold=0.98)
    exact = semdedup(rd.from_pandas(aug).repartition(8),
                     n_clusters=1, cosine_threshold=0.98)
    a = approx.to_pandas() if not isinstance(approx, pd.DataFrame) else approx
    e = exact.to_pandas() if not isinstance(exact, pd.DataFrame) else exact
    kept8 = set(a.loc[(a["cluster_id"] == a["vec_id"]), "vec_id"])
    ke = (e["cluster_id"] == e["vec_id"]).to_numpy()
    out = pd.DataFrame({
        "vec_id": e["vec_id"].to_numpy("int64"),
        "kept_exact": ke,
        "containment_ok": ~ke | e["vec_id"].isin(kept8).to_numpy(),
    })
    return out.sort_values("vec_id").reset_index(drop=True)


def embedding_dup_pairs(sf_dir: str):
    """Exact near-dup pairs at cos>=0.98 via broadcast matmul — the
    oracle-checked baseline the LSH near-dup path is measured against."""
    from ..stages.dedup import embedding_dup_pairs_exact

    aug = _augmented_embeddings(sf_dir)
    ds = rd.from_pandas(aug).repartition(8)
    return embedding_dup_pairs_exact(
        ds, aug["vec_id"].to_numpy(),
        np.stack(aug["embedding"].to_numpy()), cosine_threshold=0.98,
    )


def knn_ivf(sf_dir: str):
    """IVF approximate k-NN: sampled k-means index written partition_cols=[bucket], probe reads only probed buckets; recall measured vs exact."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet")
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack(qdf["embedding"].to_numpy())
    # synthetic embeddings are near-uniform on the sphere, so a useful
    # recall needs a high probe fraction: 16 clusters / 8 probed halves the
    # scan at measured recall@10 = 0.967 (re-measured r2, BASELINE.md)
    out = ivf_topk(ds, queries, k=10, n_clusters=16, nprobe=8, concurrency=2)
    out["query_id"] = out["query_id"].map(dict(enumerate(qdf["vec_id"])))
    return out[["query_id", "vec_id", "rank"]]


def knn_ivf_exact(sf_dir: str):
    """IVF with nprobe = n_clusters: every bucket is probed, so the
    result is EXACT — this SQL-hash-checks the whole IVF machinery
    (seeded k-means train, bucket-partitioned index write, per-bucket
    pruned probe reads, k-per-block reduce) against the brute-force
    cosine oracle. float64 scoring so ranking matches the SQL."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet")
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = ivf_topk(ds, queries, k=10, n_clusters=16, nprobe=16,
                   concurrency=2, dtype=np.float64)
    out["query_id"] = out["query_id"].map(dict(enumerate(qdf["vec_id"])))
    return out[["query_id", "vec_id", "rank"]]


def knn_lsh(sf_dir: str):
    """Single-table multi-probe hyperplane LSH over the near-dup-bearing
    augmented corpus (each query has an exact copy at +1M): the
    data-independent ANN scale path. Deterministic (seeded planes)."""
    from ..stages.similarity import lsh_topk

    aug = _augmented_embeddings(sf_dir)
    ds = rd.from_pandas(aug).repartition(8)
    qdf = aug[aug["vec_id"] < 3].sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy())
    out = lsh_topk(ds, queries, k=10, n_planes=12, hamming_probe=3,
                   concurrency=2)
    out["query_id"] = out["query_id"].map(dict(enumerate(qdf["vec_id"])))
    return out[["query_id", "vec_id", "rank"]]


def doc_fingerprints(sf_dir: str):
    """Rolling Rabin-Karp document fingerprint + stopword-voting language
    ID per doc. SQL-oracle-checked end to end: the per-word hash is
    DuckDB's md5_number_upper and the fold is mod 2^61-1, so both columns
    are reproduced exactly by the oracle SQL."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = text_stats(docs, concurrency=2)

    def select(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id", "fingerprint", "lang_pred"]]

    return out.map_batches(select, batch_format="pandas")


# crawl pipeline queries share one small run per process
_CRAWL_CACHE: dict = {}


def _crawl(tag: str):
    from ..config import CrawlConfig, SyntheticWebConfig
    from .crawl import CrawlRunner

    if "runner" not in _CRAWL_CACHE:
        import tempfile

        out = tempfile.mkdtemp(prefix="ncray-crawl-")
        from ..config import US_PER_SEC

        runner = CrawlRunner(
            out,
            CrawlConfig(num_shards=4, fetch_concurrency=2, fetch_batch_size=128,
                        use_feeds=True, use_sitemaps=True,
                        archive_html=True,  # S10 blobs feed crawl_warc_export
                        # A4: adaptive recrawl on — fetched rows re-enter the
                        # claim set one baseline (doubling per unchanged
                        # fetch) after their last fetch
                        recrawl_baseline_us=60 * US_PER_SEC,
                        state_keep_last=2),
            SyntheticWebConfig(n_hosts=8, frac_render=0.25,
                           frac_cloudflare=0.4,  # selects host 7 at seed 42
                           frac_changing=0.2),
        )
        runner.run(max_rounds=4)
        _CRAWL_CACHE["runner"] = runner
    return _CRAWL_CACHE["runner"]


def crawl_frontier(sf_dir: str):
    """Flagship crawl (t1 scale): final frontier state (rows-only check;
    exact semantics are pytest-verified against the sequential oracle)."""
    runner = _crawl("frontier")
    return runner.frontier_dataset().drop_columns(["host_hash"])


def crawl_documents(sf_dir: str):
    """The flagship crawl's deduplicated span documents (first-writer-wins), from real generation-loop output."""
    runner = _crawl("docs")
    ds = runner.documents_dataset()

    def flatten(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["n_spans"] = batch["spans"].map(len)
        batch["n_media"] = batch["spans"].map(
            lambda ss: sum(1 for s in ss if s["kind"] == "media")
        )
        return batch[["doc_id", "url", "host", "title", "word_count",
                      "content_hash", "n_spans", "n_media"]]

    return ds.map_batches(flatten, batch_format="pandas")


def crawl_classified(sf_dir: str):
    """Classified crawl documents (content type, quality, topics) from the real classify stage over crawl output."""
    from ..stages.classify import classify_documents

    runner = _crawl("classified")
    out = classify_documents(runner.documents_dataset(), concurrency=2)

    def select(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["topics"] = batch["topics"].map(lambda t: ",".join(t))
        return batch[["doc_id", "content_type", "confidence", "quality_score",
                      "topics"]]

    return out.map_batches(select, batch_format="pandas")


def publisher_cursor_scan(sf_dir: str):
    """S11/T2: incremental search_after cursor scan — resume reading an
    ordered log strictly after a persisted (ts, id) position."""
    cur_ts = pd.Timestamp("2024-01-15")
    cur_id = 0
    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def after(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[
            (batch["ts"] > cur_ts)
            | ((batch["ts"] == cur_ts) & (batch["event_id"] > cur_id))
        ]

    return (
        ev.map_batches(after, batch_format="pandas")
        .sort(["ts", "event_id"])
        .limit(100)
    )


def publisher_routing(sf_dir: str):
    """J5-J7: channel routing + per-channel dedup over classified crawl
    docs (rows-only: inputs come from the crawl, not the SQL views)."""
    from ..stages.classify import classify_documents
    from ..stages.publish import publish

    runner = _crawl("publish")
    classified = classify_documents(runner.documents_dataset(), concurrency=2)
    pubs = publish(classified)

    def dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["channel", "doc_id"])

    return pubs.map_batches(dedup, batch_format="pandas")


_ROUTE_CUR_AT = 1704844800000000  # 2024-01-10 00:00:00 UTC in epoch-us


def publisher_routing_events(sf_dir: str):
    """J5/J6/J7 + S11 through the REAL publish() operator (include AND
    exclude topic matching, min-quality, content-type gate, cursor skip,
    publish-history anti-join), fed a deterministic classified stream
    derived from the events table so the whole route is
    SQL-oracle-checked. The crawl-docs variant stays `publisher_routing`."""
    from ..stages.publish import Channel, publish

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    topic_map = {"click": "crime", "view": "business", "purchase": "sports",
                 "signup": "mining", "error": "politics"}

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy()
        prim = b["event_type"].map(topic_map)
        topics = pd.Series(
            np.where(eid % 4 == 0, prim + ",sports", prim), dtype=object)
        return pd.DataFrame({
            "doc_id": eid,
            "content_type": np.select(
                [eid % 3 == 0, eid % 3 == 1], ["page", "article"], "other"),
            "quality_score": (eid * 37) % 101,
            "topics": topics,
            "crawled_at": b["ts"].astype("datetime64[us]").astype("int64"),
        })

    channels = (
        Channel("content:crime", include_topics=("crime",), min_quality=40),
        Channel("content:business", include_topics=("business", "mining"),
                min_quality=40),
        Channel("content:no-sports", exclude_topics=("sports",),
                min_quality=60),
        Channel("content:high-quality", min_quality=80,
                content_types=("article", "page")),
    )
    history = pd.DataFrame({
        "channel": "content:crime",
        "doc_id": np.arange(0, 2000, 10, dtype=np.int64),
    })
    return publish(ev.map_batches(derive, batch_format="pandas"),
                   channels=channels, history=history,
                   cursor=(_ROUTE_CUR_AT, 0))


def source_reputation_events(sf_dir: str):
    """A8 through the REAL source_reputation aggregate (the full
    source_reputation.go formula: avg quality, spam-ratio penalty, trust
    boost, rank tiers) on a deterministic events-derived stream —
    SQL-oracle-checked; the crawl-docs variant stays `source_reputation`."""
    from ..stages.publish import source_reputation

    ev = _read(sf_dir, "events", ["event_id", "user_id"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source_id": b["user_id"].to_numpy() % 50,
            "quality_score": (b["event_id"].to_numpy() * 37) % 101,
        })

    return source_reputation(ev.map_batches(derive, batch_format="pandas"))


def source_reputation_q(sf_dir: str):
    """A8: per-source running quality aggregate over classified docs."""
    from ..stages.classify import classify_documents
    from ..stages.publish import source_reputation

    runner = _crawl("rep")
    classified = classify_documents(runner.documents_dataset(), concurrency=2)
    return source_reputation(classified)


def crawl_claim_log(sf_dir: str):
    """SURVEY §7.3 crawl-order verification output: the global claim
    sequence, deterministically ordered by (round, claim_at, priority DESC,
    next_fetch_at, url_hash) — byte-stable across runs (rows-only).

    Fully a Dataset pipeline: the per-round claims parquet is read
    distributed (round derived from the file path), the dense claim_seq is
    a per-round rank plus a per-round offset — the only driver-side state
    is the #rounds-sized offset table, never the claim rows themselves."""
    import glob as _glob
    import os as _os

    import ray.data as rd

    runner = _crawl("claimlog")
    paths = sorted(_glob.glob(_os.path.join(
        runner.store.root, "rounds", "round-*", "claims", "*.parquet")))
    ds = rd.read_parquet(paths, include_paths=True)

    def add_round(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["round"] = (
            b["path"].str.extract(r"round-(\d+)")[0].astype("int64")
        )
        return b.drop(columns=["path"])

    ds = ds.map_batches(add_round, batch_format="pandas")
    # per-round claim counts: bounded by the number of rounds
    counts = {
        int(r["round"]): int(r["count()"])
        for r in ds.groupby("round").count().take_all()
    }
    offsets, acc = {}, 0
    for r in sorted(counts):
        offsets[r] = acc
        acc += counts[r]

    def seq_one_round(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["claim_at", "priority", "next_fetch_at", "url_hash"],
            ascending=[True, False, True, True], kind="mergesort",
        ).reset_index(drop=True)
        g["claim_seq"] = offsets[int(g["round"].iloc[0])] + np.arange(
            len(g), dtype=np.int64)
        return g[["claim_seq", "round", "claim_at", "url_hash", "url",
                  "host", "priority"]]

    return (
        ds.groupby("round")
        .map_groups(seq_one_round, batch_format="pandas")
        .sort("claim_seq")
    )


def round_metrics(sf_dir: str):
    """Per-round lineage: claims, per-shard status counts, phase timings."""
    import glob as _glob
    import json as _json
    import os as _os

    runner = _crawl("metrics")
    rows = []
    for mf in sorted(_glob.glob(_os.path.join(runner.store.root, "rounds", "*",
                                              "metrics.json"))):
        with open(mf) as f:
            m = _json.load(f)
        for s in m["shards"]:
            rows.append(
                {"round": m["round"], "shard": s["shard"],
                 "claims_total": m["claims"],
                 "frontier_size": s.get("frontier_size", 0),
                 "claimed": s.get("claimed", 0),
                 "new_urls": s.get("new_urls", 0),
                 "pending": s.get("status_pending", 0),
                 "fetched": s.get("status_fetched", 0),
                 "dead": s.get("status_dead", 0)}
            )
    return pd.DataFrame(rows)


def crawl_stats(sf_dir: str):
    """G1: frontier counts by status + dead reasons (rows-only)."""
    from ray.data.aggregate import Count

    runner = _crawl("stats")
    fr = runner.frontier_dataset()
    return fr.groupby("status").aggregate(Count(alias_name="n"))


def corpus_prep(sf_dir: str):
    """Composite training-data preparation pipeline: quality filter
    (length + digit ratio + stopword ratio) -> exact dedup -> MinHash-LSH
    near-dup removal. One row per surviving document plus the counts of
    what each stage dropped (the shape of a 100 TB corpus-prep run)."""
    from ..stages.dedup import exact_dedup, minhash_lsh_dedup
    from ..stages.textstats import text_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    scored = text_stats(docs, concurrency=2, fingerprint=False, langid=False)

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        keep = (
            (b["n_chars"] >= 100)
            & (b["digit_ratio"] < 0.3)
            & (b["stopword_ratio"] > 0.0)
        )
        return b.loc[keep, ["doc_id", "text", "lang", "n_chars"]]

    gated = scored.map_batches(gate, batch_format="pandas")
    # materialize the bounded post-exact-dedup corpus so the LSH stage's
    # actor pool doesn't contend for CPUs with the whole upstream chain
    exact = exact_dedup(gated).materialize()
    clusters = minhash_lsh_dedup(
        exact.select_columns(["doc_id", "text"]), jaccard_threshold=0.8,
    )
    # keep only cluster representatives (min doc_id per near-dup cluster)
    # via a distributed hash semi-join — the representative set stays a
    # Dataset, never an O(corpus) driver-side id set
    reps = clusters.map_batches(
        lambda b: b.loc[b["cluster_id"] == b["doc_id"], ["doc_id"]]
        .rename(columns={"doc_id": "_rep_id"}),
        batch_format="pandas",
    )
    joined = exact.join(
        reps, join_type="inner", num_partitions=8,
        on=("doc_id",), right_on=("_rep_id",),
    )

    def final(b: pd.DataFrame) -> pd.DataFrame:
        return b[["doc_id", "lang", "n_chars", "text_sha"]]

    return joined.map_batches(final, batch_format="pandas")


def f1_span_stats(sf_dir: str):
    """Vectorized per-doc stats over the F1 interleaved (doc_id, spans)
    input shape (BASELINE.json input_hint), synthesized deterministically."""
    from ..sources.f1 import span_stats, synthesize_f1

    ds = rd.from_arrow(synthesize_f1(n_hosts=16))
    return ds.map_batches(span_stats, batch_format="pyarrow")


def f1_span_validation(sf_dir: str):
    """Span-sequence invariant flags (kind/text/media_ref/offset contract)
    over the F1 table."""
    from ..sources.f1 import synthesize_f1, validate_span_order

    ds = rd.from_arrow(synthesize_f1(n_hosts=16))
    return ds.map_batches(validate_span_order, batch_format="pyarrow")


_F1_DOCS_CHUNK_W = 20  # words per synthesized text span


def _docs_to_spans(b: pd.DataFrame, ref_fn=None) -> pa.Table:
    """Deterministic interleaved-span synthesis from documents.text (the
    F1 input_hint shape, derivable in SQL): text spans of 20 words each, a
    media span after every 2nd text span with
    media_ref='media://{doc_id}/{j}' (override via ``ref_fn(doc_id, j)``),
    sequential offsets. Docs with doc_id%97==0 get their FIRST media ref
    blanked so the span validator has real negatives to catch."""
    if ref_fn is None:
        def ref_fn(doc_id, j):
            return f"media://{doc_id}/{j}"
    from ..frontier.schema import SPAN_TYPE

    ids = b["doc_id"].to_numpy()
    span_lists = []
    for doc_id, text in zip(ids, b["text"].fillna("")):
        ws = text.split()
        spans: list[dict] = []
        off = j = n_text = 0
        for i in range(0, len(ws), _F1_DOCS_CHUNK_W):
            spans.append({"kind": "text",
                          "text": " ".join(ws[i:i + _F1_DOCS_CHUNK_W]),
                          "media_ref": "", "offset": off})
            off += 1
            n_text += 1
            if n_text % 2 == 0:
                ref = ("" if (doc_id % 97 == 0 and j == 0)
                       else ref_fn(doc_id, j))
                spans.append({"kind": "media", "text": "",
                              "media_ref": ref, "offset": off})
                off += 1
                j += 1
        span_lists.append(spans)
    return pa.Table.from_arrays(
        [pa.array(ids), pa.array(span_lists, type=pa.list_(SPAN_TYPE))],
        names=["doc_id", "spans"])


def f1_span_stats_docs(sf_dir: str):
    """The F1 interleaved-span operators (span_stats + validate_span_order,
    the input_hint's core kernels) through the REAL pyarrow list kernels,
    over spans synthesized arithmetically from the documents table so the
    whole chain is SQL-oracle-checked (the synthetic-web-driven variants
    stay `f1_span_stats` / `f1_span_validation`, whose span contract is
    checked against the crawl output by pytest instead)."""
    from ..sources.f1 import span_stats, validate_span_order

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pd.DataFrame) -> pa.Table:
        spans_tbl = _docs_to_spans(b)
        st = span_stats(spans_tbl)
        va = validate_span_order(spans_tbl)
        return st.append_column("spans_valid", va["spans_valid"])

    return docs.map_batches(stats, batch_format="pandas")


def f1_reassemble_docs(sf_dir: str):
    """Flatten -> distributed reassemble -> stats round-trip of the F1
    interleaved shape: span ROWS ride a hash exchange keyed by doc_id and
    are re-packed into list<struct> per doc (``reassemble_spans``), then
    the same span_stats/validator kernels run on the REBUILT docs. Shares
    `f1_span_stats_docs`' SQL oracle — a hash mismatch means the
    round-trip corrupted a span, an offset, or a doc boundary."""
    from ..sources.f1 import (
        flatten_spans,
        reassemble_spans,
        span_stats,
        validate_span_order,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    flat = docs.map_batches(lambda b: flatten_spans(_docs_to_spans(b)),
                            batch_format="pandas")
    rebuilt = reassemble_spans(flat)

    def stats(b: pa.Table) -> pa.Table:
        st = span_stats(b)
        va = validate_span_order(b)
        return st.append_column("spans_valid", va["spans_valid"])

    return rebuilt.map_batches(stats, batch_format="pyarrow")


def f1_media_dedup(sf_dir: str):
    """Corpus-wide media dedup over interleaved docs (the span-level
    twin of line_dedup): every non-blank media_ref survives only at its
    globally first (doc_id, offset) occurrence, blanks and text pass
    through, and the survivors re-pack with offsets renumbered 0..n-1.
    Refs are derived to REPEAT across docs ((doc_id*31 + j*17) % 50) so
    the dedup has real cross-doc work; output is span_stats + the
    span-sequence validator over the rebuilt docs, so a hash match also
    proves the renumbering preserved the invariant."""
    from ..sources.f1 import media_dedup, span_stats, validate_span_order

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    f1 = docs.map_batches(
        lambda b: _docs_to_spans(
            b, ref_fn=lambda d, j: f"media://{(d * 31 + j * 17) % 50}"),
        batch_format="pandas")

    def stats(b: pa.Table) -> pa.Table:
        st = span_stats(b)
        va = validate_span_order(b)
        return st.append_column("spans_valid", va["spans_valid"])

    return media_dedup(f1).map_batches(stats, batch_format="pyarrow")


def f1_caption_pairs(sf_dir: str):
    """Caption candidates for every non-blank media span: the nearest
    preceding text span within the doc, resolved by one doc-keyed
    exchange + vectorized grouped forward-fill (no per-doc Python).
    SQL-hash-checked against the arithmetic chunk derivation."""
    from ..sources.f1 import caption_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    f1 = docs.map_batches(lambda b: _docs_to_spans(b),
                          batch_format="pandas")
    return caption_pairs(f1)


def f1_redact_spans(sf_dir: str):
    """The curation layer running INSIDE interleaved docs: PII redaction
    applied to text spans only via map_text_spans (flatten -> vectorized
    regex kernel on text spans -> reassemble), media alignment and
    offsets untouched; output is span_stats over the redacted docs, so
    the hash check covers the full flatten/transform/re-pack loop."""
    from ..sources.f1 import map_text_spans, span_stats
    from ..stages.curation import EMAIL_RE, IPV4_RE, PHONE_RE

    f1 = _pii_augmented_docs(sf_dir).map_batches(
        lambda b: _docs_to_spans(b), batch_format="pandas")

    def red(t: pd.Series) -> pd.Series:
        t = t.str.replace(EMAIL_RE, "<EMAIL>", regex=True, flags=re.ASCII)
        t = t.str.replace(PHONE_RE, "<PHONE>", regex=True, flags=re.ASCII)
        return t.str.replace(IPV4_RE, "<IP>", regex=True, flags=re.ASCII)

    return map_text_spans(f1, red).map_batches(span_stats,
                                               batch_format="pyarrow")


def f1_truncate_docs(sf_dir: str):
    """Token-budget prefix truncation of interleaved docs (budget 96,
    media span cost 16, text span cost = its whitespace tokens, first
    span always kept): one doc-keyed exchange + vectorized grouped
    cumsum, rebuilt through reassemble_spans; output is span_stats over
    the truncated docs, hash-checked against a SQL window cumsum."""
    from ..sources.f1 import span_stats, truncate_spans

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    f1 = docs.map_batches(lambda b: _docs_to_spans(b),
                          batch_format="pandas")
    return truncate_spans(f1, budget=96, media_tokens=16).map_batches(
        span_stats, batch_format="pyarrow")


def f1_render_text(sf_dir: str):
    """Interleaved docs rendered to the dataloader-facing token stream:
    spans joined in offset order, media spans replaced by the
    <|media|> sentinel; SQL-hash-checked against a string_agg window
    derivation."""
    from ..sources.f1 import render_text

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    f1 = docs.map_batches(lambda b: _docs_to_spans(b),
                          batch_format="pandas")
    return render_text(f1)


def f1_pack_windows(sf_dir: str):
    """Interleaved-aware sequence packing (axes A x B): each doc's token
    cost = its whitespace text tokens + 16 per media span (the fixed
    media-token budget a multimodal training run reserves), packed into
    256-token windows by the distributed-prefix-sum pack_windows. Span
    costs come from the REAL f1 kernels (span_stats over
    _docs_to_spans); SQL-hash-checked end to end."""
    from ..sources.f1 import span_stats
    from ..stages.corpus import _ws_token_counts, pack_windows

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())

    def cost(b: pd.DataFrame) -> pd.DataFrame:
        st = span_stats(_docs_to_spans(b)).to_pandas()
        toks = _ws_token_counts(b["text"])
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy("int64"),
            "cost": toks + 16 * st["n_media"].to_numpy("int64"),
        })

    return pack_windows(docs.map_batches(cost, batch_format="pandas"),
                        tokens_col="cost", window=256, bucket_width=64)


def multimodal_features_docs(sf_dir: str):
    """The multimodal decode chain (synthesis -> binary payload column ->
    REAL ImageDecodeActor pool) over media refs derived from the documents
    table with the same n_media rule as `f1_span_stats_docs`. Payloads are
    ASCII-hex bytes (sha256 hexdigest repeated to the 64+h[0]*4 size rule)
    so DuckDB's VARCHAR-only sha256 reproduces every digest the actor
    computes — width/height/thumb are SQL-oracle-checked end to end. The
    crawl/f1-driven variant stays `multimodal_features`."""
    import hashlib

    from ..stages.multimodal import MEDIA_SCHEMA, decode_images

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def refs(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        nw = (b["text"].fillna("").str.split().str.len()
              .to_numpy().astype(np.int64))
        n_media = np.where(nw == 0, 0, (nw + 19) // 20) // 2
        rep_ids = np.repeat(ids, n_media)
        total = int(n_media.sum())
        j = (np.arange(total)
             - np.repeat(np.cumsum(n_media) - n_media, n_media))
        return pd.DataFrame({
            "doc_id": rep_ids,
            "media_ref": [f"media://{d}/{k}" for d, k in zip(rep_ids, j)],
        })

    def synth(b: pd.DataFrame) -> pa.Table:
        ids, docs_, types, payloads, lens = [], [], [], [], []
        for doc_id, ref in zip(b["doc_id"], b["media_ref"]):
            hhex = hashlib.sha256(f"42:{ref}".encode()).hexdigest()
            size = 64 + int(hhex[:2], 16) * 4
            payload = (hhex * (size // 64 + 1))[:size].encode()
            ids.append(hashlib.sha256(ref.encode()).hexdigest()[:16])
            docs_.append(str(doc_id))
            types.append("image")
            payloads.append(payload)
            lens.append(len(payload))
        return pa.Table.from_arrays(
            [pa.array(ids, type=pa.string()),
             pa.array(docs_, type=pa.string()),
             pa.array(types, type=pa.string()),
             pa.array(payloads, type=pa.binary()),
             pa.array(lens, type=pa.int64())],
            schema=MEDIA_SCHEMA)

    media = (docs.map_batches(refs, batch_format="pandas")
             .map_batches(synth, batch_format="pandas"))
    out = decode_images(media, concurrency=2)

    def select(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "media_id": batch["media_id"],
            "doc_id": batch["doc_id"],
            "byte_len": batch["byte_len"].astype("int64"),
            "width": batch["width"].astype("int64"),
            "height": batch["height"].astype("int64"),
            "thumb_hex": batch["thumb_digest"].map(bytes.hex),
        })

    return out.map_batches(select, batch_format="pandas")


def _dup_media_pairs(sf_dir: str):
    """(doc_id, media_ref) pairs with CROSS-DOC duplicate refs (the
    f1_media_dedup rule, blanks excluded) — the input shape for
    decode-once composition."""
    from ..sources.f1 import media_refs

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        # ONE derivation: the same span synthesis f1_media_dedup uses
        # (incl. the %97 blank rule), through the real media_refs kernel;
        # blanks are the undecodable rows and drop here
        t = media_refs(_docs_to_spans(
            b, ref_fn=lambda d, j: f"media://{(d * 31 + j * 17) % 50}"))
        df = t.to_pandas()
        return df[df["media_ref"] != ""]

    return docs.map_batches(pairs, batch_format="pandas")


def media_features_dedup_join(sf_dir: str):
    """Decode-once multimodal composition — WHY media dedup exists: the
    duplicate-ref pair table dedups to one payload per DISTINCT ref,
    the decode actor pool runs once per ref (not once per occurrence),
    and the light feature rows join back to every referencing
    (doc_id, media_ref) pair through ONE media_id-keyed tagged-union
    exchange (no broadcast of feature payloads, no driver state).
    SQL-hash-checked end to end: the synthetic payload/feature chain is
    ref-deterministic."""
    import hashlib

    from ..stages.agg import hash_grouped_agg
    from ..stages.multimodal import MEDIA_SCHEMA, decode_images

    pair_ds = _dup_media_pairs(sf_dir)

    def keep_first(b: pd.DataFrame) -> pd.DataFrame:
        return (b.sort_values(["media_ref", "doc_id"], kind="mergesort")
                 .drop_duplicates("media_ref", keep="first"))

    uniq = hash_grouped_agg(pair_ds, ["media_ref"], keep_first, keep_first)

    def synth(b: pd.DataFrame) -> pa.Table:
        ids, docs_, types, payloads, lens = [], [], [], [], []
        for ref in b["media_ref"]:
            hhex = hashlib.sha256(f"42:{ref}".encode()).hexdigest()
            size = 64 + int(hhex[:2], 16) * 4
            payload = (hhex * (size // 64 + 1))[:size].encode()
            ids.append(hashlib.sha256(ref.encode()).hexdigest()[:16])
            docs_.append("")  # decode-once: no single owning doc
            types.append("image")
            payloads.append(payload)
            lens.append(len(payload))
        return pa.Table.from_arrays(
            [pa.array(ids, type=pa.string()),
             pa.array(docs_, type=pa.string()),
             pa.array(types, type=pa.string()),
             pa.array(payloads, type=pa.binary()),
             pa.array(lens, type=pa.int64())],
            schema=MEDIA_SCHEMA)

    feats = decode_images(uniq.map_batches(synth, batch_format="pandas"),
                          concurrency=2)

    def feat_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "media_id": b["media_id"].astype(str),
            "_tag": np.int8(0), "doc_id": np.int64(0), "media_ref": "",
            "byte_len": b["byte_len"].astype("int64"),
            "width": b["width"].astype("int64"),
            "height": b["height"].astype("int64"),
            "thumb_hex": b["thumb_digest"].map(bytes.hex),
        })

    def pair_rows(b: pd.DataFrame) -> pd.DataFrame:
        mid = b["media_ref"].map(
            lambda r: hashlib.sha256(r.encode()).hexdigest()[:16])
        return pd.DataFrame({
            "media_id": mid, "_tag": np.int8(1),
            "doc_id": b["doc_id"].to_numpy("int64"),
            "media_ref": b["media_ref"].astype(str),
            "byte_len": np.int64(0), "width": np.int64(0),
            "height": np.int64(0), "thumb_hex": "",
        })

    tagged = feats.map_batches(feat_rows, batch_format="pandas").union(
        pair_ds.map_batches(pair_rows, batch_format="pandas"))

    def join(part: pd.DataFrame) -> pd.DataFrame:
        f = part[part["_tag"] == 0][["media_id", "byte_len", "width",
                                     "height", "thumb_hex"]]
        p = part[part["_tag"] == 1][["media_id", "doc_id", "media_ref"]]
        m = p.merge(f, on="media_id", how="inner")
        return m[["doc_id", "media_ref", "byte_len", "width", "height",
                  "thumb_hex"]]

    return hash_grouped_agg(tagged, ["media_id"], lambda b: b, join)


def sidecar_scores(sf_dir: str):
    """A6: hybrid rules+ML sidecar scoring with the review_required merge
    matrix over classified crawl docs (rows-only)."""
    from ..stages.classify import classify_documents
    from ..stages.scorer import score_documents

    runner = _crawl("scores")
    classified = classify_documents(runner.documents_dataset())
    return score_documents(classified)


# sidecar_scores_docs deterministic title cycle: core / peripheral /
# excluded / international / neutral shapes across all five domains
_SIDECAR_TITLES = (
    "Police respond to downtown shooting",            # crime core
    "Gold mining exploration expands in the north",   # mining core
    "New film premieres at the festival",             # entertainment core
    "First Nations leaders meet",                     # indigenous core
    "Startup open source sdk launch announced",       # coforge core
    "Mineral exploration continues",                  # mining peripheral
    "Streaming on netflix tonight",                   # ent. peripheral
    "Reconciliation efforts continue",                # ind. peripheral
    "The company completed an ipo",                   # coforge peripheral
    "Weather forecast: sunny skies",                  # neutral
    "Full-Time Position Available",                   # crime exclusion
    "U.S. police investigate murder in Minneapolis",  # crime intl downgrade
)


def sidecar_scores_docs(sf_dir: str):
    """A6 hybrid rules+ML matrix through the REAL score_documents stage
    (all five sidecar domains with their faithful ported rule engines,
    J5 routing gate, decision-path matrix) over the documents table with
    deterministic domain titles — fully SQL-oracle-checked: the oracle
    SQL is GENERATED from the same engine pattern tables (no drift), the
    stub-ML score is sha256-hex-byte arithmetic DuckDB reproduces
    exactly. The crawl-docs variant stays `sidecar_scores`."""
    from ..stages.scorer import score_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = len(_SIDECAR_TITLES)

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        return pd.DataFrame({
            "doc_id": ids,
            # index by doc_id//4 so the title cycle is independent of
            # the %4 page gate (otherwise the slots at 0/4/8 only ever
            # land on non-routed pages)
            "title": [_SIDECAR_TITLES[(int(d) // 4) % n] for d in ids],
            "body": b["text"].fillna(""),
            "content_type": np.where(ids % 4 == 0, "page", "article"),
        })

    return score_documents(docs.map_batches(derive, batch_format="pandas"))


_CTD_TITLES = ("ingredients instructions preheat",
               "apply now qualifications salary",
               "request for proposal submission deadline",
               "website redesign funding announcement",
               "")
_CTD_SEGMENTS = ("/press/", "/events/", "/recipes/", "/jobs/", "/tenders/",
                 "/obituaries/")


# content_type_cascade_docs url variants: v -> (url template, excluded?)
_CASCADE_URLS = (
    "https://ex.test/news/item-{d}",      # article within section
    "https://ex.test/news",               # section index -> excluded
    "https://ex.test/account/settings",   # excluded prefix
    "https://ex.test/stories?offset=20",  # pagination -> excluded
    "https://ex.test/",                   # homepage -> excluded
    "https://ex.test/story/item-{d}",
    "https://ex.test/blog/post-{d}",
    "https://ex.test/login",              # excluded prefix
    "https://ex.test/category/sports",    # excluded prefix
    "https://ex.test/posts/update-{d}",
)
_CASCADE_EXCLUDED_V = (1, 2, 3, 4, 7, 8)
_CASCADE_OGS = ("article", "website", "video", "", "image", "news", "")


def content_type_cascade_docs(sf_dir: str):
    """The reference's FULL content-type cascade (content_type.go
    Classify: URL exclusions -> listing content patterns -> keyword
    heuristics -> OG metadata -> article/relaxed heuristics -> page
    default) through classify_content_type_full, over deterministically
    derived url/og/date/description signals on the documents table —
    SQL-oracle-checked."""
    from ..stages.structured import classify_content_type_full

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def run(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            d = int(doc_id)
            ctype, sub, conf, method = classify_content_type_full(
                _CASCADE_URLS[d % 10].format(d=d),
                title=f"Doc {d}" if d % 11 else "",
                raw_text=text or "",
                og_type=_CASCADE_OGS[d % 7],
                word_count=100 + (d % 5) * 100,
                meta_description="" if d % 4 == 0 else "desc",
                has_published_date=(d % 3 == 0),
            )
            rows.append({"doc_id": d, "ctype": ctype, "subtype": sub,
                         "confidence": conf, "method": method})
        return pd.DataFrame(rows)

    return docs.map_batches(run, batch_format="pandas")


def _cascade_oracle_sql() -> str:
    """Oracle for content_type_cascade_docs, generated from the live
    keyword/pattern tables (no drift). The url-exclusion branch is
    derived independently from the deterministic v -> url mapping, so a
    URL-logic regression on the Ray side mismatches here."""
    from ..stages.structured import (
        _LISTING_DATE_PREFIXES,
        _LISTING_DATELINES,
        _READ_MORE_PATTERNS,
        EVENT_KEYWORDS,
        EVENT_REPORT_PHRASES,
        JOB_KEYWORDS,
        NEED_SIGNAL_KEYWORDS,
        OBITUARY_CRIME_SUPPRESSORS,
        OBITUARY_KEYWORDS,
        RECIPE_KEYWORDS,
        RFP_KEYWORDS,
    )

    def hits(kws) -> str:
        return " + ".join(
            f"(CASE WHEN strpos(combined, '{kw}') > 0 THEN 1 ELSE 0 END)"
            for kw in kws)

    def any_of(kws) -> str:
        return " OR ".join(f"strpos(combined, '{kw}') > 0" for kw in kws)

    def occurrences(col: str, pats) -> str:
        return " + ".join(
            f"((length({col}) - length(replace({col}, '{p}', '')))"
            f" // {len(p)})"
            for p in pats)

    qty_re = (r"\b\d+\s?(?:cups?|tbsp|tablespoons?|tsp|teaspoons?|ml|g|"
              r"grams|kg|oz|ounces?)\b")
    date_re = (r"\b(january|february|march|april|may|june|july|august|"
               r"september|october|november|december)\s+\d{1,2},?\s+\d{4}\b")
    addr_re = (r"\d+\s+\w+\s+(street|st|avenue|ave|road|rd|drive|dr|"
               r"boulevard|blvd)\b")
    excluded = ", ".join(str(v) for v in _CASCADE_EXCLUDED_V)
    ogs = " ".join(f"WHEN {i} THEN '{o}'"
                   for i, o in enumerate(_CASCADE_OGS) if o)
    return rf"""
    WITH d AS (
      SELECT doc_id, doc_id % 10 AS v,
        (CASE doc_id % 7 {ogs} ELSE '' END) AS og,
        100 + (doc_id % 5) * 100 AS wc,
        (doc_id % 3 = 0) AS has_date,
        (doc_id % 4 <> 0) AS has_desc,
        (doc_id % 11 <> 0) AS has_title,
        lower(coalesce(text, '')) AS lt,
        lower((CASE WHEN doc_id % 11 <> 0 THEN 'doc ' || doc_id
               ELSE '' END) || ' ' || coalesce(text, '')) AS combined
      FROM documents
    ),
    kw AS (
      SELECT *,
        (({occurrences('lt', _READ_MORE_PATTERNS)}) >= 3
         OR ({occurrences('lt', _LISTING_DATE_PREFIXES)}) >= 5
         OR ({occurrences('lt', _LISTING_DATELINES)}) >= 3) AS listing,
        ({hits(RECIPE_KEYWORDS)}) AS rh0,
        ({hits(JOB_KEYWORDS)}) AS jh,
        ({hits(EVENT_KEYWORDS)}) AS eh,
        (regexp_matches(combined, '{date_re}')
         AND (strpos(combined, 'at the') > 0
              OR strpos(combined, 'venue:') > 0
              OR regexp_matches(combined, '{addr_re}'))) AS ev_dateloc,
        ({any_of(EVENT_REPORT_PHRASES)}) AS ev_report,
        ({hits(OBITUARY_KEYWORDS)}) AS oh,
        ({any_of(OBITUARY_CRIME_SUPPRESSORS)}) AS ob_sup,
        ({hits(RFP_KEYWORDS)}) AS fh,
        ({hits(NEED_SIGNAL_KEYWORDS)}) AS sh
      FROM d
    ),
    adj AS (
      SELECT *,
        rh0 + (CASE WHEN rh0 < 2
                     AND regexp_matches(combined, '{qty_re}', 'i')
                    THEN 1 ELSE 0 END) AS rh
      FROM kw
    ),
    steps AS (
      SELECT doc_id,
        CASE
          WHEN v IN ({excluded}) THEN 1     -- url_exclusion
          WHEN listing THEN 2               -- content_pattern
          WHEN rh >= 2 THEN 3
          WHEN jh >= 2 THEN 4
          WHEN eh >= 2 OR ev_dateloc THEN 5
          WHEN ev_report THEN 6
          WHEN oh >= 2 AND NOT ob_sup THEN 7
          WHEN fh >= 2 THEN 8
          WHEN sh >= 2 THEN 9
          WHEN og IN ('article', 'news') THEN 10
          WHEN og = 'video' THEN 11
          WHEN og = 'image' THEN 12
          WHEN wc >= 200 AND has_title AND has_date AND has_desc THEN 13
          WHEN NOT has_date AND wc >= 300 AND has_title AND has_desc THEN 14
          ELSE 15
        END AS step
      FROM adj
    )
    SELECT doc_id,
      CASE step WHEN 1 THEN 'page' WHEN 2 THEN 'page'
                WHEN 3 THEN 'recipe' WHEN 4 THEN 'job' WHEN 5 THEN 'event'
                WHEN 6 THEN 'article' WHEN 7 THEN 'obituary'
                WHEN 8 THEN 'rfp' WHEN 9 THEN 'need_signal'
                WHEN 10 THEN 'article' WHEN 11 THEN 'video'
                WHEN 12 THEN 'image' WHEN 13 THEN 'article'
                WHEN 14 THEN 'article' ELSE 'page' END AS ctype,
      CASE step WHEN 6 THEN 'event_report' ELSE '' END AS subtype,
      CASE step WHEN 1 THEN 0.9 WHEN 2 THEN 0.85
                WHEN 10 THEN 0.78 WHEN 11 THEN 0.78 WHEN 12 THEN 0.78
                WHEN 13 THEN 0.75 WHEN 14 THEN 0.65 WHEN 15 THEN 0.6
                ELSE 0.80 END AS confidence,
      CASE step WHEN 1 THEN 'url_exclusion' WHEN 2 THEN 'content_pattern'
                WHEN 6 THEN 'event_report_heuristic'
                WHEN 10 THEN 'og_metadata' WHEN 11 THEN 'og_metadata'
                WHEN 12 THEN 'og_metadata' WHEN 13 THEN 'heuristic'
                WHEN 14 THEN 'heuristic_relaxed' WHEN 15 THEN 'default'
                ELSE 'keyword_heuristic' END AS method
    FROM steps
    """


def quality_scores_docs(sf_dir: str):
    """The reference's full four-component quality scorer
    (quality.go Score: word-count, metadata completeness, richness,
    readability — each 0-25) over deterministically derived metadata
    signals on the documents table — SQL-oracle-checked. The crawl
    path keeps the span-model adaptation in `doc_quality_gate`."""
    from ..stages.classify import quality_score_full

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def run(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            d = int(doc_id)
            wc = len((text or "").split())
            score = quality_score_full(
                wc,
                title="" if d % 7 == 0 else f"Doc {d}",
                meta_description="" if d % 3 == 0 else "desc",
                has_published_date=(d % 2 == 0),
                og_title="" if d % 5 == 0 else "og title",
                og_image="" if d % 4 == 0 else "https://x.test/i.jpg",
                meta_keywords="" if d % 6 == 0 else "k1, k2",
                canonical_url="" if d % 8 == 0 else "https://x.test/c",
                og_type="" if d % 9 == 0 else "article",
                og_url="" if d % 10 == 0 else "https://x.test/o",
            )
            rows.append({"doc_id": d, "word_count": wc,
                         "quality_score": score})
        return pd.DataFrame(rows)

    return docs.map_batches(run, batch_format="pandas")


_QUALITY_DOCS_ORACLE = """
    WITH d AS (
      SELECT doc_id,
        CASE WHEN coalesce(text, '') = '' THEN 0
             ELSE len(regexp_split_to_array(trim(coalesce(text, '')),
                                            '\\s+')) END AS wc,
        (doc_id % 7 <> 0) AS has_title,
        (doc_id % 3 <> 0) AS has_desc,
        (doc_id % 2 = 0) AS has_date,
        (doc_id % 5 <> 0) AS has_ogtitle,
        (doc_id % 4 <> 0) AS has_ogimage,
        (doc_id % 6 <> 0) AS has_kw,
        (doc_id % 8 <> 0) AS has_canon,
        (doc_id % 9 <> 0) AS has_ogtype,
        (doc_id % 10 <> 0) AS has_ogurl
      FROM documents
    )
    SELECT doc_id, CAST(wc AS BIGINT) AS word_count,
      CAST(LEAST(100, GREATEST(0,
        (CASE WHEN wc < 100 THEN 0 WHEN wc < 300 THEN 10
              WHEN wc < 500 THEN 15 WHEN wc < 1000 THEN 20
              ELSE 25 END)
        + (CASE WHEN has_title THEN 5 ELSE 0 END)
        + (CASE WHEN has_desc THEN 5 ELSE 0 END)
        + (CASE WHEN has_date THEN 5 ELSE 0 END)
        + (CASE WHEN has_ogtitle OR has_ogimage THEN 5 ELSE 0 END)
        + (CASE WHEN has_kw THEN 5 ELSE 0 END)
        + (CASE WHEN has_ogimage THEN 10 ELSE 0 END)
        + (CASE WHEN has_kw THEN 5 ELSE 0 END)
        + (CASE WHEN has_canon THEN 5 ELSE 0 END)
        + (CASE WHEN has_ogtype AND has_ogurl THEN 5 ELSE 0 END)
        + (CASE WHEN wc >= 200 THEN 20 WHEN wc >= 100 THEN 15
                ELSE 10 END)
      )) AS BIGINT) AS quality_score
    FROM d
"""


# mining_drill_docs deterministic drill-paragraph cycle (shapes from the
# ported drill_extractor_test.go parity vectors)
_DRILL_PARAS = (
    "Drill hole DDH-24-001 returned 12.5m @ 3.2 g/t Au from 45.0m.",
    "DDH-24-002: 8.0m @ 1.5% Cu",
    "Hole BH-001 intersected gold mineralization from 45.0m to 57.5m "
    "grading 2.1 g/t Au",
    "Drill holes DDH-24-001 and DDH-24-002 were completed. "
    "Results are pending.",
    "The company announced a new mining project in northern Ontario.",
    "DDH-24-003 returned 20.0m @ 1.8% Cu including 5.0m @ 3.2% Cu",
)


def mining_drill_docs(sf_dir: str):
    """The mining sidecar's drill-result extraction chain
    (drill_extractor.go regex strategies + drill_normalizer.go
    normalization/dedup) over deterministic drill paragraphs prepended
    to document text — SQL-oracle-checked against a pinned golden table
    (any extractor drift hash-mismatches loudly)."""
    from ..stages.drill import extract_drill_regex, normalize_drill_results

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = len(_DRILL_PARAS)

    def run(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            d = int(doc_id)
            # word-salad doc text cannot contain drill patterns; the
            # prepended paragraph fully determines the extraction
            body = _DRILL_PARAS[d % n] + " " + (text or "")
            res, conf = extract_drill_regex(body)
            norm = normalize_drill_results(res)
            first = norm[0] if norm else {
                "hole_id": "", "commodity": "", "intercept_m": 0.0,
                "grade": 0.0, "unit": ""}
            rows.append({"doc_id": d, "confidence": conf,
                         "n_results": len(norm), **first})
        return pd.DataFrame(rows)

    return docs.map_batches(run, batch_format="pandas")


# golden expectations per paragraph index, pinned from the engine
_MINING_DRILL_ORACLE = """
    WITH g(v, confidence, n_results, hole_id, commodity,
           intercept_m, grade, unit) AS (VALUES
      (0, 'complete', 1, 'DDH-24-001', 'gold', 12.5, 3.2, 'g/t'),
      (1, 'complete', 1, 'DDH-24-002', 'copper', 8.0, 1.5, '%'),
      (2, 'complete', 2, 'BH-001', 'gold', 57.5, 2.1, 'g/t'),
      (3, 'partial', 0, '', '', 0.0, 0.0, ''),
      (4, 'none', 0, '', '', 0.0, 0.0, ''),
      (5, 'complete', 2, 'DDH-24-003', 'copper', 20.0, 1.8, '%'))
    SELECT d.doc_id, g.confidence, CAST(g.n_results AS BIGINT) AS n_results,
           g.hole_id, g.commodity,
           CAST(g.intercept_m AS DOUBLE) AS intercept_m,
           CAST(g.grade AS DOUBLE) AS grade, g.unit
    FROM documents d JOIN g ON d.doc_id % 6 = g.v
"""


# publisher_domain_routing deterministic item fixtures — one per routing
# domain shape (ported router test scenarios; fixture 6 exercises the
# indigenous confidence gate and routes nowhere)
_ROUTE_FIXTURES: tuple[dict, ...] = (
    {"topics": ["local_news", "sports"], "quality_score": 60,
     "content_type": "article"},
    {"topics": ["crime"], "quality_score": 55, "content_type": "article",
     "crime_relevance": "core_street_crime", "homepage_eligible": True,
     "category_pages": ["violent-crime"], "location_country": "canada",
     "location_city": "sudbury", "location_province": "ON",
     "location_specificity": "city"},
    {"quality_score": 45, "content_type": "article",
     "crime_relevance": "peripheral_crime",
     "crime_sub_label": "criminal_justice"},
    {"quality_score": 50, "content_type": "article",
     "mining": {"relevance": "core_mining",
                "commodities": ["gold", "iron_ore"],
                "mining_stage": "exploration", "location": "local_canada"}},
    {"quality_score": 65, "content_type": "article",
     "entertainment": {"relevance": "core_entertainment",
                       "homepage_eligible": True, "categories": ["Film"]},
     "location_country": "usa"},
    {"quality_score": 70, "content_type": "article",
     "indigenous": {"relevance": "core_indigenous",
                    "final_confidence": 0.8, "categories": ["culture"],
                    "region": "latin-america"}},
    {"quality_score": 40, "content_type": "article",
     "indigenous": {"relevance": "core_indigenous",
                    "final_confidence": 0.2}},
    {"quality_score": 60, "content_type": "article",
     "coforge": {"relevance": "core_coforge",
                 "audience": "startup founders", "topics": ["dev_tools"],
                 "industries": ["fintech"]}},
    {"quality_score": 55, "content_type": "article",
     "recipe": {"category": "Dessert", "cuisine": "Italian"}},
    {"quality_score": 55, "content_type": "article",
     "job": {"employment_type": "full_time", "industry": "Technology"}},
    {"quality_score": 55, "content_type": "article",
     "rfp": {"country": "Canada", "province": "ON",
             "categories": ["Road Work"],
             "procurement_type": "request for proposal"}},
    {"quality_score": 55, "content_type": "article",
     "need_signal": {"signal_type": "funding_win", "province": "ON",
                     "sector": "municipal"}},
)


def publisher_domain_routing(sf_dir: str):
    """The publisher's fixed-order 12-domain channel router
    (router/service.go:216-259 + the per-domain files) through
    route_item over deterministic classified-item fixtures cycled
    across the documents table — SQL-oracle-checked: the oracle VALUES
    table is GENERATED by running the same kernel over the fixtures at
    SQL-build time, so router edits can't drift from the SQL."""
    from ..stages.publish import default_channels
    from ..stages.route_domains import route_item

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = len(_ROUTE_FIXTURES)
    channels = default_channels()

    def run(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id in b["doc_id"]:
            d = int(doc_id)
            for ordinal, ch in enumerate(
                    route_item(_ROUTE_FIXTURES[d % n], channels)):
                rows.append({"doc_id": d, "ord": ordinal, "channel": ch})
        return pd.DataFrame(rows, columns=["doc_id", "ord", "channel"])

    return docs.map_batches(run, batch_format="pandas")


def publisher_full_routing(sf_dir: str):
    """End-to-end publisher routing over REAL crawl output: classify the
    crawl docs (topics/quality/content-type), run the five sidecar rule
    engines through the hybrid scorer, pivot the per-domain relevances
    back onto each doc with a distributed hash join, assemble the
    ContentItem fields and route through the fixed-order 12-domain
    router. Rows-only (every stage above is individually
    oracle-checked)."""
    from ..stages.classify import classify_documents
    from ..stages.publish import default_channels
    from ..stages.route_domains import route_item
    from ..stages.scorer import score_documents

    # scorer short classes -> each domain's relevance labels
    rel_map = {
        "crime": {"core": "core_street_crime",
                  "peripheral": "peripheral_crime", "not": "not_crime"},
        "mining": {"core": "core_mining", "peripheral": "peripheral_mining",
                   "not": "not_mining"},
        "entertainment": {"core": "core_entertainment",
                          "peripheral": "peripheral_entertainment",
                          "not": "not_entertainment"},
        "indigenous": {"core": "core_indigenous",
                       "peripheral": "peripheral_indigenous",
                       "not": "not_indigenous"},
        "coforge": {"core": "core_coforge", "peripheral": "peripheral",
                    "not": "not_relevant"},
    }

    runner = _crawl("pubroute")
    docs = runner.documents_dataset().drop_columns(["spans"])
    classified = classify_documents(docs, concurrency=2)
    def _keep(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["doc_id", "title", "body", "content_type",
                 "quality_score"]].copy()
        # flatten the list column: object-dtype lists don't survive the
        # hash-shuffle join's Arrow conversion
        out["topics"] = b["topics"].map(
            lambda t: ",".join(t) if t is not None else "")
        return out

    # ``keep`` feeds BOTH join sides below. Without this materialize, Ray
    # Data (no common-subexpression reuse) would execute the classify
    # ACTOR-POOL chain twice inside ONE plan — two 2-actor pools grab
    # every CPU of a 4-CPU session and the plan's own read tasks starve:
    # an intermittent full-suite deadlock (observed twice, 27+ min
    # wedges). Materializing at this light-row boundary runs classify
    # once and hands both branches object-store blocks.
    keep = classified.map_batches(_keep, batch_format="pandas").materialize()
    scores = score_documents(keep.map_batches(
        lambda b: b[["doc_id", "title", "body", "content_type"]],
        batch_format="pandas",
    ))

    def pivot(b: pd.DataFrame) -> pd.DataFrame:
        # (doc_id, domain) rows -> one row per doc with rel_/conf_ cols;
        # runs inside groupby(doc_id).map_groups so each doc is whole
        rows = []
        for doc_id, g in b.groupby("doc_id", sort=False):
            row = {"doc_id": doc_id}
            for _, r in g.iterrows():
                row[f"rel_{r['domain']}"] = r["relevance"]
                row[f"conf_{r['domain']}"] = float(r["final_confidence"])
            rows.append(row)
        cols = ["doc_id"] + [f"rel_{d}" for d in rel_map] + \
            [f"conf_{d}" for d in rel_map]
        return pd.DataFrame(rows).reindex(columns=cols)

    pivoted = scores.groupby("doc_id").map_groups(
        pivot, batch_format="pandas")
    # left outer: docs the scorer's routing gate skipped (page/listing)
    # still route through the topic and DB-channel layers
    joined = keep.join(pivoted, join_type="left_outer", on=("doc_id",),
                       num_partitions=8)
    channels = default_channels()

    def route(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in b.iterrows():
            topics = r["topics"]
            if isinstance(topics, str):
                topics = [t for t in topics.split(",") if t]
            item = {
                "topics": list(topics) if topics is not None else [],
                "quality_score": int(r["quality_score"]),
                "content_type": r["content_type"],
                "crime_relevance": rel_map["crime"].get(
                    r.get("rel_crime"), ""),
            }
            for dom in ("mining", "entertainment", "indigenous", "coforge"):
                rel = rel_map[dom].get(r.get(f"rel_{dom}"), "")
                if rel:
                    item[dom] = {"relevance": rel,
                                 "final_confidence":
                                     float(r.get(f"conf_{dom}") or 0.0)}
            for ordinal, ch in enumerate(route_item(item, channels)):
                rows.append({"doc_id": r["doc_id"], "ord": ordinal,
                             "channel": ch})
        return pd.DataFrame(rows, columns=["doc_id", "ord", "channel"])

    return joined.map_batches(route, batch_format="pandas")


def _publisher_routing_oracle_sql() -> str:
    from ..stages.publish import default_channels
    from ..stages.route_domains import route_item

    channels = default_channels()
    values = []
    for v, fixture in enumerate(_ROUTE_FIXTURES):
        for ordinal, ch in enumerate(route_item(fixture, channels)):
            values.append(f"({v}, {ordinal}, '{ch}')")
    return rf"""
    WITH g(v, ord, channel) AS (VALUES {", ".join(values)})
    SELECT d.doc_id, CAST(g.ord AS BIGINT) AS ord, g.channel
    FROM documents d JOIN g ON d.doc_id % {len(_ROUTE_FIXTURES)} = g.v
    """


# crime_rules_docs deterministic title cycle (vectors from the ported
# crime_rules_test.go parity suite: core / excluded / international /
# neutral shapes)
_CRIME_TITLES = (
    "Man charged with murder after stabbing",
    "Police respond to downtown shooting",
    "Full-Time Position Available",
    "New restaurant opens downtown",
    "Opinion: Crime rates are a political tool",
    "Suspect arrested for assault in park",
    "RCMP investigating bank robbery in Sudbury",
    "U.S. police investigate murder in Minneapolis",
    "Jury convicts accused in deadly shooting case",
    "Mississaugas of the Credit First Nation resident faces drug, "
    "weapon, assault charges",
    "Police make arrest in weapons case",
    "Police drug bust seizes fentanyl in Vancouver",
    "Best contractors in the Vancouver area",
    "Hockey team wins championship",
    "Woman found dead, police launch investigation",
    "Shooting for the stars: local athlete's journey",
)


def crime_rules_docs(sf_dir: str):
    """The crime sidecar's full rule engine (crime_rules.go: exclusions,
    authority-gated violent/property/drug patterns, court outcomes,
    accusation charges, weapon+authority, international downgrade,
    justice append) over deterministic titles + document-text bodies —
    SQL-oracle-checked (every regex re-runs verbatim under DuckDB)."""
    from ..stages.crime_rules import classify_crime_rules

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_titles = len(_CRIME_TITLES)

    def run(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            d = int(doc_id)
            rel, conf, types = classify_crime_rules(
                _CRIME_TITLES[d % n_titles], text or "")
            rows.append({"doc_id": d, "relevance": rel,
                         "confidence": conf,
                         "crime_types": ",".join(types)})
        return pd.DataFrame(rows)

    return docs.map_batches(run, batch_format="pandas")


def _crime_rules_oracle_sql() -> str:
    """Oracle for crime_rules_docs, generated from the live pattern
    tables in stages/crime_rules.py (regexes run verbatim in DuckDB)."""
    from ..stages import crime_rules as cr

    def fired(col, pats) -> str:
        return " OR ".join(
            f"regexp_matches({col}, '{p}')" for p, _c in pats)

    def group_conf(col, pats) -> str:
        return "GREATEST(" + ", ".join(
            f"CASE WHEN regexp_matches({col}, '{p}') "
            f"THEN CAST({c} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
            for p, c in pats) + ")"

    excl = " OR ".join(f"regexp_matches(title, '{p}')"
                       for p in cr.EXCLUDE_PATTERNS)
    intl = " OR ".join(f"regexp_matches(title, '{p}')"
                       for p in cr.INTERNATIONAL_PATTERNS)
    titles = " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(
            s.replace("'", "''") for s in _CRIME_TITLES))
    return rf"""
    WITH d AS (
      SELECT doc_id,
        (CASE doc_id % {len(_CRIME_TITLES)} {titles} END) AS title,
        coalesce(text, '') AS body
      FROM documents
    ),
    t AS (
      SELECT doc_id, title,
        title || ' ' || substring(body, 1, {cr.TRUNCATE_BODY_MAX_CHARS})
          AS txt
      FROM d
    ),
    f AS (
      SELECT doc_id, title, txt,
        ({excl}) AS excluded,
        ({fired('txt', cr.VIOLENT_CRIME_PATTERNS)}) AS v_f,
        ({fired('txt', cr.PROPERTY_CRIME_PATTERNS)}) AS p_f,
        ({fired('txt', cr.DRUG_CRIME_PATTERNS)}) AS d_f,
        ({fired('txt', cr.COURT_OUTCOME_PATTERNS)}) AS c_f,
        ({fired('txt', cr.ACCUSATION_CHARGES_PATTERNS)}) AS a_f,
        ({fired('txt', cr.WEAPON_AUTHORITY_PATTERNS)}) AS w_f,
        {group_conf('txt', cr.VIOLENT_CRIME_PATTERNS)} AS v_c,
        {group_conf('txt', cr.PROPERTY_CRIME_PATTERNS)} AS p_c,
        {group_conf('txt', cr.DRUG_CRIME_PATTERNS)} AS d_c,
        {group_conf('txt', cr.COURT_OUTCOME_PATTERNS)} AS c_c,
        {group_conf('txt', cr.ACCUSATION_CHARGES_PATTERNS)} AS a_c,
        {group_conf('txt', cr.WEAPON_AUTHORITY_PATTERNS)} AS w_c,
        ({intl}) AS intl,
        regexp_matches(txt, '{cr.JUSTICE_PATTERN}') AS justice,
        (strpos(lower(txt), 'assault') > 0
         OR strpos(lower(txt), 'weapon') > 0
         OR strpos(lower(txt), 'robbery') > 0) AS acc_vw,
        (strpos(lower(txt), 'drug') > 0) AS acc_d,
        (strpos(lower(txt), 'theft') > 0) AS acc_p
      FROM t
    ),
    segs AS (
      SELECT doc_id, excluded, intl, justice,
        (v_f OR p_f OR d_f OR c_f OR a_f OR w_f) AS any_core,
        GREATEST(CAST({cr.CONFIDENCE_DEFAULT} AS DOUBLE),
                 v_c, p_c, d_c, c_c, a_c, w_c)
          AS core_conf,
        -- crime_types segments in the reference's append order
        [x FOR x IN [
          CASE WHEN v_f THEN 'violent_crime' END,
          CASE WHEN p_f THEN 'property_crime' END,
          CASE WHEN d_f THEN 'drug_crime' END,
          CASE WHEN c_f THEN 'criminal_justice' END,
          CASE WHEN a_f AND acc_vw AND NOT v_f THEN 'violent_crime' END,
          CASE WHEN a_f AND acc_d AND NOT d_f THEN 'drug_crime' END,
          CASE WHEN a_f AND acc_p AND NOT p_f THEN 'property_crime' END,
          CASE WHEN w_f AND NOT v_f AND NOT (a_f AND acc_vw)
               THEN 'violent_crime' END
        ] IF x IS NOT NULL] AS base_types
      FROM f
    )
    SELECT doc_id,
      CASE WHEN excluded THEN 'not_crime'
           WHEN any_core AND intl THEN 'peripheral_crime'
           WHEN any_core THEN 'core_street_crime'
           ELSE 'not_crime' END AS relevance,
      CASE WHEN excluded THEN CAST({cr.CONFIDENCE_EXCLUSION} AS DOUBLE)
           WHEN any_core AND intl
             THEN core_conf
                  * CAST({cr.INTERNATIONAL_DOWNGRADE_RATIO} AS DOUBLE)
           WHEN any_core THEN core_conf
           ELSE CAST({cr.CONFIDENCE_DEFAULT} AS DOUBLE)
      END AS confidence,
      CASE WHEN excluded THEN ''
           ELSE coalesce(list_aggregate(
             CASE WHEN len(base_types) > 0 AND justice
                  THEN list_append(base_types, 'criminal_justice')
                  ELSE base_types END, 'string_agg', ','), '')
      END AS crime_types
    FROM segs
    """


# indigenous_rules_docs deterministic multilingual title cycle (from the
# ported indigenous_rules_test.go parity vectors)
_INDIGENOUS_TITLES = (
    "Anishinaabe community gathers",
    "First Nations leaders meet",
    "Inuit hunters adapt to climate change",
    "Treaty rights affirmed by court",
    "Pueblos indigenas exigen derechos",
    "Les peuples autochtones manifestent",
    "Samefolket kampar for rattigheter",
    "Indigenous art exhibit opens",
    "Reconciliation efforts continue",
    "Weather forecast: sunny skies",
    "Stock market report for today",
    "First Nations and Metis nation leaders discuss treaty rights",
)


def indigenous_rules_docs(sf_dir: str):
    """The indigenous sidecar's multilingual rule engine
    (indigenous_rules.go: core/peripheral pattern sets, 10-category
    bonus, capped confidence formula) over deterministic titles +
    document-text bodies — SQL-oracle-checked (patterns re-run verbatim
    under DuckDB)."""
    from ..stages.indigenous_rules import classify_indigenous_rules

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = len(_INDIGENOUS_TITLES)

    def run(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            d = int(doc_id)
            rel, conf = classify_indigenous_rules(
                _INDIGENOUS_TITLES[d % n], text or "")
            rows.append({"doc_id": d, "relevance": rel, "confidence": conf})
        return pd.DataFrame(rows)

    return docs.map_batches(run, batch_format="pandas")


def _indigenous_rules_oracle_sql() -> str:
    """Oracle for indigenous_rules_docs, generated from the live
    pattern/keyword tables in stages/indigenous_rules.py."""
    from ..stages import indigenous_rules as ir

    core_hits = " + ".join(
        f"(CASE WHEN regexp_matches(lt, '{p}') THEN 1 ELSE 0 END)"
        for p in ir.INDIGENOUS_CORE_PATTERNS)
    periph = " OR ".join(
        f"regexp_matches(lt, '{p}')"
        for p in ir.INDIGENOUS_PERIPHERAL_PATTERNS)
    cats = " + ".join(
        "(CASE WHEN "
        + " OR ".join(f"strpos(lt, '{kw}') > 0" for kw in kws)
        + " THEN 1 ELSE 0 END)"
        for kws in ir.INDIGENOUS_CATEGORY_KEYWORDS.values())
    titles = " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(
            s.replace("'", "''") for s in _INDIGENOUS_TITLES))
    return rf"""
    WITH d AS (
      SELECT doc_id,
        lower((CASE doc_id % {len(_INDIGENOUS_TITLES)} {titles} END)
              || ' '
              || substring(coalesce(text, ''), 1,
                           {ir.RULE_MAX_BODY_CHARS})) AS lt
      FROM documents
    ),
    f AS (
      SELECT doc_id,
        ({core_hits}) AS core_hits,
        ({periph}) AS periph,
        LEAST(CAST({ir.CONFIDENCE_CAT_BONUS_MAX} AS DOUBLE),
              LEAST(({cats}), {ir.MAX_CATEGORY_EXTRACT})
              * CAST({ir.CONFIDENCE_CAT_BONUS_PER} AS DOUBLE)) AS bonus
      FROM d
    )
    SELECT doc_id,
      CASE WHEN core_hits >= 1 THEN 'core_indigenous'
           WHEN periph THEN 'peripheral_indigenous'
           ELSE 'not_indigenous' END AS relevance,
      CASE WHEN core_hits >= 1 THEN
             LEAST(CAST({ir.CONFIDENCE_CORE_MAX} AS DOUBLE),
                   CAST({ir.CONFIDENCE_CORE_BASE} AS DOUBLE)
                   + CAST({ir.CONFIDENCE_CORE_PER_HIT} AS DOUBLE)
                     * core_hits + bonus)
           WHEN periph THEN
             CAST({ir.CONFIDENCE_PERIPH_BASE} AS DOUBLE) + bonus
           ELSE CAST({ir.CONFIDENCE_NOT_INDIGENOUS} AS DOUBLE)
      END AS confidence
    FROM f
    """


def content_type_detection_docs(sf_dir: str):
    """M8 content-type detection through the REAL detection functions
    (URL-pattern table incl. the .pdf/query-string rules, then the
    keyword-heuristic subtype fallback) over deterministically derived
    URLs/titles on the documents table — SQL-oracle-checked; the full
    extraction chain stays `structured_extraction`."""
    from ..stages.structured import (
        classify_subtype_from_text,
        detect_content_type_from_url,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def detect(b: pd.DataFrame) -> pd.DataFrame:
        subs, methods = [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            v = doc_id % 8
            if v == 7:
                url = f"https://ex.test/files/item-{doc_id}.pdf?utm=x"
            elif v == 6:
                url = f"https://ex.test/notes/item-{doc_id}"
            else:
                url = f"https://ex.test{_CTD_SEGMENTS[v]}item-{doc_id}"
            title = _CTD_TITLES[(doc_id // 8) % 5] if v == 6 else ""
            sub = detect_content_type_from_url(url)
            method = "url_pattern" if sub else ""
            if not sub:
                sub, _, method = classify_subtype_from_text(title, text or "")
            subs.append(sub)
            methods.append(method)
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                             "subtype": subs, "method": methods})

    return docs.map_batches(detect, batch_format="pandas")


def _ctd_oracle_sql() -> str:
    """Oracle for content_type_detection_docs, generated from the live
    keyword tables (no drift)."""
    from ..stages.structured import (
        EVENT_KEYWORDS,
        EVENT_REPORT_PHRASES,
        JOB_KEYWORDS,
        NEED_SIGNAL_KEYWORDS,
        OBITUARY_CRIME_SUPPRESSORS,
        OBITUARY_KEYWORDS,
        RECIPE_KEYWORDS,
        RFP_KEYWORDS,
    )

    def hits(kws) -> str:
        return " + ".join(
            f"(CASE WHEN strpos(combined, '{kw}') > 0 THEN 1 ELSE 0 END)"
            for kw in kws)

    def any_of(kws) -> str:
        return " OR ".join(f"strpos(combined, '{kw}') > 0" for kw in kws)

    qty_re = (r"\b\d+\s?(?:cups?|tbsp|tablespoons?|tsp|teaspoons?|ml|g|"
              r"grams|kg|oz|ounces?)\b")
    # event date-location path (content_type_event_heuristic.go);
    # combined is lowercased, so month names match in lowercase
    date_re = (r"\b(january|february|march|april|may|june|july|august|"
               r"september|october|november|december)\s+\d{1,2},?\s+\d{4}\b")
    addr_re = (r"\d+\s+\w+\s+(street|st|avenue|ave|road|rd|drive|dr|"
               r"boulevard|blvd)\b")
    titles = " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(_CTD_TITLES) if t)
    return rf"""
    WITH d AS (
      SELECT doc_id, doc_id % 8 AS v,
        lower((CASE WHEN doc_id % 8 = 6 THEN
                 (CASE (doc_id // 8) % 5 {titles} ELSE '' END)
               ELSE '' END) || ' ' || coalesce(text, '')) AS combined
      FROM documents
    ),
    kw AS (
      SELECT doc_id, v, combined,
        ({hits(RECIPE_KEYWORDS)}) AS rh0,
        ({hits(JOB_KEYWORDS)}) AS jh,
        ({hits(EVENT_KEYWORDS)}) AS eh,
        (regexp_matches(combined, '{date_re}')
         AND (strpos(combined, 'at the') > 0
              OR strpos(combined, 'venue:') > 0
              OR regexp_matches(combined, '{addr_re}'))) AS ev_dateloc,
        ({any_of(EVENT_REPORT_PHRASES)}) AS ev_report,
        ({hits(OBITUARY_KEYWORDS)}) AS oh,
        ({any_of(OBITUARY_CRIME_SUPPRESSORS)}) AS ob_suppressed,
        ({hits(RFP_KEYWORDS)}) AS fh,
        ({hits(NEED_SIGNAL_KEYWORDS)}) AS sh,
        CASE v WHEN 0 THEN 'press_release' WHEN 1 THEN 'event'
               WHEN 2 THEN 'recipe' WHEN 3 THEN 'job' WHEN 4 THEN 'rfp'
               WHEN 5 THEN 'obituary' WHEN 7 THEN 'report'
               ELSE '' END AS usub
      FROM d
    ),
    adj AS (
      SELECT doc_id, usub,
        rh0 + (CASE WHEN rh0 < 2
                     AND regexp_matches(combined, '{qty_re}', 'i')
                    THEN 1 ELSE 0 END) AS rh,
        jh, eh, ev_dateloc, ev_report,
        oh, ob_suppressed, fh, sh
      FROM kw
    )
    SELECT doc_id,
      CASE WHEN usub <> '' THEN usub
           WHEN rh >= 2 THEN 'recipe'
           WHEN jh >= 2 THEN 'job'
           WHEN eh >= 2 OR ev_dateloc THEN 'event'
           WHEN ev_report THEN 'event_report'
           WHEN oh >= 2 AND NOT ob_suppressed THEN 'obituary'
           WHEN fh >= 2 THEN 'rfp'
           WHEN sh >= 2 THEN 'need_signal'
           ELSE '' END AS subtype,
      CASE WHEN usub <> '' THEN 'url_pattern'
           WHEN rh >= 2 OR jh >= 2 OR eh >= 2 OR ev_dateloc
             THEN 'keyword_heuristic'
           WHEN ev_report THEN 'event_report_heuristic'
           WHEN (oh >= 2 AND NOT ob_suppressed) OR fh >= 2 OR sh >= 2
             THEN 'keyword_heuristic'
           ELSE '' END AS method
    FROM adj
    """


def _sidecar_oracle_sql() -> str:
    """Oracle for sidecar_scores_docs, generated from the live faithful
    rule engines (crime_rules.py / indigenous_rules.py / domain_rules.py
    pattern tables run verbatim under DuckDB) so engine edits can't
    drift from the SQL. Stub-ML scores are sha256-hex-byte arithmetic
    DuckDB reproduces exactly."""
    from ..stages import crime_rules as cr
    from ..stages import indigenous_rules as ir
    from ..stages.domain_rules import SIMPLE_DOMAIN_PATTERNS

    def fired(col, pats) -> str:
        return " OR ".join(
            f"regexp_matches({col}, '{p}')" for p, *_ in
            (pats if isinstance(pats[0], tuple) else [(x,) for x in pats]))

    def group_conf(col, pats) -> str:
        return "GREATEST(" + ", ".join(
            f"CASE WHEN regexp_matches({col}, '{p}') "
            f"THEN CAST({c} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
            for p, c in pats) + ")"

    def ml(d: str) -> str:
        sha = f"sha256('42:{d}:' || CAST(doc_id AS VARCHAR))"
        return (f"('0x' || substr({sha}, 1, 2))::INTEGER / 255.0 AS mscore,\n"
                f"             0.5 + (('0x' || substr({sha}, 3, 2))::INTEGER"
                f" / 255.0) / 2.0 AS m_conf")

    crime_excl = " OR ".join(f"regexp_matches(title, '{p}')"
                             for p in cr.EXCLUDE_PATTERNS)
    crime_intl = " OR ".join(f"regexp_matches(title, '{p}')"
                             for p in cr.INTERNATIONAL_PATTERNS)
    crime_any = " OR ".join([
        fired("txt", cr.VIOLENT_CRIME_PATTERNS),
        fired("txt", cr.PROPERTY_CRIME_PATTERNS),
        fired("txt", cr.DRUG_CRIME_PATTERNS),
        fired("txt", cr.COURT_OUTCOME_PATTERNS),
        fired("txt", cr.ACCUSATION_CHARGES_PATTERNS),
        fired("txt", cr.WEAPON_AUTHORITY_PATTERNS),
    ])
    crime_conf = ("GREATEST(CAST(" + str(cr.CONFIDENCE_DEFAULT)
                  + " AS DOUBLE), "
                  + ", ".join(group_conf("txt", g) for g in (
                      cr.VIOLENT_CRIME_PATTERNS, cr.PROPERTY_CRIME_PATTERNS,
                      cr.DRUG_CRIME_PATTERNS, cr.COURT_OUTCOME_PATTERNS,
                      cr.ACCUSATION_CHARGES_PATTERNS,
                      cr.WEAPON_AUTHORITY_PATTERNS)) + ")")
    ind_core_hits = " + ".join(
        f"(CASE WHEN regexp_matches(lt, '{p}') THEN 1 ELSE 0 END)"
        for p in ir.INDIGENOUS_CORE_PATTERNS)
    ind_periph = " OR ".join(
        f"regexp_matches(lt, '{p}')"
        for p in ir.INDIGENOUS_PERIPHERAL_PATTERNS)
    ind_cats = " + ".join(
        "(CASE WHEN "
        + " OR ".join(f"strpos(lt, '{kw}') > 0" for kw in kws)
        + " THEN 1 ELSE 0 END)"
        for kws in ir.INDIGENOUS_CATEGORY_KEYWORDS.values())
    ind_bonus = (f"LEAST(CAST({ir.CONFIDENCE_CAT_BONUS_MAX} AS DOUBLE), "
                 f"LEAST(({ind_cats}), {ir.MAX_CATEGORY_EXTRACT}) "
                 f"* CAST({ir.CONFIDENCE_CAT_BONUS_PER} AS DOUBLE))")
    titles = " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(
            x.replace("'", "''") for x in _SIDECAR_TITLES))

    selects = [f"""
          SELECT doc_id, 'crime' AS domain,
             CASE WHEN {crime_excl} THEN 'not'
                  WHEN ({crime_any}) AND ({crime_intl}) THEN 'peripheral'
                  WHEN {crime_any} THEN 'core'
                  ELSE 'not' END AS r_rel,
             CASE WHEN {crime_excl}
                    THEN CAST({cr.CONFIDENCE_EXCLUSION} AS DOUBLE)
                  WHEN ({crime_any}) AND ({crime_intl}) THEN {crime_conf}
                    * CAST({cr.INTERNATIONAL_DOWNGRADE_RATIO} AS DOUBLE)
                  WHEN {crime_any} THEN {crime_conf}
                  ELSE CAST({cr.CONFIDENCE_DEFAULT} AS DOUBLE)
             END AS r_conf,
             {ml('crime')}
          FROM d""", f"""
          SELECT doc_id, 'indigenous' AS domain,
             CASE WHEN ({ind_core_hits}) >= 1 THEN 'core'
                  WHEN {ind_periph} THEN 'peripheral'
                  ELSE 'not' END AS r_rel,
             CASE WHEN ({ind_core_hits}) >= 1 THEN
                    LEAST(CAST({ir.CONFIDENCE_CORE_MAX} AS DOUBLE),
                          CAST({ir.CONFIDENCE_CORE_BASE} AS DOUBLE)
                          + CAST({ir.CONFIDENCE_CORE_PER_HIT} AS DOUBLE)
                            * ({ind_core_hits}) + {ind_bonus})
                  WHEN {ind_periph} THEN
                    CAST({ir.CONFIDENCE_PERIPH_BASE} AS DOUBLE) + {ind_bonus}
                  ELSE CAST({ir.CONFIDENCE_NOT_INDIGENOUS} AS DOUBLE)
             END AS r_conf,
             {ml('indigenous')}
          FROM d"""]
    for dom, groups in SIMPLE_DOMAIN_PATTERNS.items():
        core = " OR ".join(f"regexp_matches(lt, '{p}')"
                           for p in groups["core"])
        periph = " OR ".join(f"regexp_matches(lt, '{p}')"
                             for p in groups["peripheral"])
        selects.append(f"""
          SELECT doc_id, '{dom}' AS domain,
             CASE WHEN {core} THEN 'core'
                  WHEN {periph} THEN 'peripheral'
                  ELSE 'not' END AS r_rel,
             CASE WHEN {core} THEN CAST(0.90 AS DOUBLE)
                  WHEN {periph} THEN CAST(0.70 AS DOUBLE)
                  ELSE CAST(0.5 AS DOUBLE) END AS r_conf,
             {ml(dom)}
          FROM d""")
    body = " UNION ALL ".join(selects)
    return rf"""
    WITH d0 AS (
      SELECT doc_id,
        (CASE (doc_id // 4) % {len(_SIDECAR_TITLES)} {titles} END) AS title,
        coalesce(text, '') AS body
      FROM documents WHERE doc_id % 4 <> 0
    ),
    d AS (
      SELECT doc_id, title,
        title || ' ' || substring(body, 1, 500) AS txt,
        lower(title || ' ' || substring(body, 1, 500)) AS lt
      FROM d0
    ),
    m AS (
      SELECT doc_id, domain, r_rel, r_conf, m_conf,
        CASE WHEN mscore >= 0.7 THEN 'core'
             WHEN mscore >= 0.3 THEN 'peripheral' ELSE 'not' END AS m_rel
      FROM ({body})
    )
    SELECT doc_id, domain,
      CASE WHEN r_rel = 'core' THEN 'core'
           WHEN m_rel = 'core' AND m_conf >= 0.90 THEN 'peripheral'
           WHEN r_rel = 'peripheral' AND m_rel = 'core' THEN 'core'
           ELSE r_rel END AS relevance,
      round(CASE
           WHEN r_rel = 'core' AND m_rel = 'core' THEN (r_conf + m_conf) / 2.0
           WHEN r_rel = 'core' AND m_rel = 'not' THEN r_conf * 0.7
           WHEN r_rel = 'core' THEN r_conf
           WHEN m_rel = 'core' AND m_conf >= 0.90 THEN m_conf * 0.8
           WHEN r_rel = 'peripheral' AND m_rel = 'core' THEN m_conf
           ELSE r_conf END, 6) AS final_confidence,
      r_rel AS rule_relevance, m_rel AS ml_relevance,
      ((r_rel = 'core' AND m_rel = 'not')
        OR (r_rel <> 'core' AND m_rel = 'core' AND m_conf >= 0.90))
        AS review_required,
      CASE WHEN r_rel = 'core' AND m_rel = 'core' THEN 'both_agree'
           WHEN r_rel = 'core' AND m_rel = 'not' THEN 'rule_override_ml'
           WHEN r_rel = 'core' THEN 'rules_only'
           WHEN m_rel = 'core' AND m_conf >= 0.90 THEN 'ml_override'
           WHEN r_rel = 'peripheral' AND m_rel = 'core' THEN 'ml_upgrade'
           ELSE 'default' END AS decision_path
    FROM m
    """


def _location_oracle_sql() -> str:
    """Oracle for location_scores, generated from the live gazetteer.

    The query's bodies are location-free (verified: classify_location
    over (headline, text) equals classify_location over (headline, "")
    for every sf0.01 doc), so each doc's result is a pure function of
    its ord-sum-keyed headline city. The SQL recomputes the ord-sum mod
    over CAST(doc_id AS VARCHAR) and joins a VALUES table holding the
    per-city ground truth — one row per gazetteer city, evaluated at
    SQL-authoring time from the live table so gazetteer edits can't
    drift from the oracle."""
    from ..stages.structured import CANADIAN_CITIES, classify_location

    cities = sorted(CANADIAN_CITIES)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = []
    for i, c in enumerate(cities):
        r = classify_location(f"{c.title()} update", "")
        rows.append(
            f"({i}, {q(r['city'])}, {q(r['province'])}, {q(r['country'])}, "
            f"{q(r['specificity'])}, {r['confidence']!r})")
    values = ",\n      ".join(rows)
    return f"""
    WITH d AS (
      SELECT doc_id,
        list_sum(list_transform(
          range(1, length(CAST(doc_id AS VARCHAR)) + 1),
          i -> ascii(substr(CAST(doc_id AS VARCHAR), i, 1))
        )) % {len(cities)} AS idx
      FROM documents
    ),
    m(idx, city, province, country, specificity, confidence) AS (
      VALUES {values}
    )
    SELECT d.doc_id, m.city, m.province, m.country, m.specificity,
           m.confidence
    FROM d JOIN m ON d.idx = m.idx
    """


def _minhash_oracle_sql(threshold: float = 0.8) -> str:
    """EXACT oracle for minhash_dedup_docs: brute-force word-3-gram
    Jaccard >= threshold, then connected components via a recursive CTE,
    cluster_id = min doc_id of the component.

    Valid because (a) the pipeline's shingle equality classes match
    string-level 3-grams exactly (dedup.shingle_hashes_batch docstring),
    (b) the verify step makes LSH precision exact, and (c) LSH recall is
    verified complete on this corpus (brute-force comparison: all 25
    true pairs found, 0 cluster mismatches at sf0.01) — deterministic
    seed + deterministic data, so the equality is stable."""
    return f"""
    WITH RECURSIVE {_jaccard_cc_ctes('documents', threshold)}
    SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
    """


def _jaccard_cc_ctes(src: str, threshold: float) -> str:
    """Shared CTE chain: word-3-gram Jaccard >= threshold edges over
    ``src`` (needs doc_id, text), transitive closure in ``reach(id, r)``
    — cluster id is min(r) per id. Emitted INSIDE a WITH RECURSIVE."""
    return f"""w AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                    x -> x <> '') AS words
      FROM {src}
    ),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(
          CASE WHEN len(words) >= 3 THEN
            list_transform(range(1, len(words) - 1),
              i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
          WHEN len(words) > 0 THEN [array_to_string(words, ' ')]
          ELSE [] END) AS g
        FROM w)
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS ic
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    e0 AS (
      SELECT ia, ib FROM inter
      JOIN sizes sa ON sa.doc_id = ia
      JOIN sizes sb ON sb.doc_id = ib
      WHERE ic::DOUBLE / (sa.sz + sb.sz - ic) >= {threshold}
    ),
    edges AS (SELECT ia AS a, ib AS b FROM e0
              UNION ALL SELECT ib, ia FROM e0),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM {src}
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    )"""


def _corpus_prep_oracle_sql() -> str:
    """Oracle for corpus_prep: the composite quality gate -> exact sha
    dedup -> MinHash rep selection, each stage re-expressed in SQL.

    The gate mirrors quality_signals/token_stats exactly (LENGTH chars,
    digit regexp ratio, any-en-stopword for stopword_ratio > 0); exact
    dedup is min-doc_id-per-sha256; near-dup reps reuse the verified
    Jaccard+CC CTE chain over the gated+deduped subset. LSH recall
    completeness carries over to any subset of the corpus: band
    collisions are pairwise, so a pair found on the full corpus is found
    on every subset containing it."""
    stop_en = sorted({"the", "and", "of", "to", "a", "in", "is", "that",
                      "for", "it", "with", "was", "on", "as", "are", "at",
                      "be", "this", "have"})
    stops = ", ".join(f"'{s}'" for s in stop_en)
    return f"""
    WITH RECURSIVE gated AS (
      SELECT doc_id, text, lang, LENGTH(text) AS n_chars
      FROM documents
      WHERE LENGTH(text) >= 100
        AND (LENGTH(text) -
             LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')))::DOUBLE
            / GREATEST(LENGTH(text), 1) < 0.3
        AND len(list_intersect(
              regexp_extract_all(lower(text), '[a-z0-9_]+'),
              [{stops}])) > 0
    ),
    exact AS (
      SELECT doc_id, text, lang, n_chars, text_sha FROM (
        SELECT *, sha256(text) AS text_sha,
               ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                  ORDER BY doc_id) AS rn
        FROM gated) WHERE rn = 1
    ),
    {_jaccard_cc_ctes('exact', 0.8)},
    clus AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
    SELECT e.doc_id, e.lang, e.n_chars, e.text_sha
    FROM exact e JOIN clus c ON c.id = e.doc_id
    WHERE c.cluster_id = e.doc_id
    """


def publisher_telemetry_q(sf_dir: str):
    """G8: per-channel delivery counters through the REAL
    publisher_telemetry aggregate, fed a deterministic publishes stream
    derived from the events log (channel := event_type, published_at :=
    ts) so the result is SQL-oracle-checkable. The crawl-docs routing
    variant stays covered by `publisher_routing` + unit tests."""
    from ..stages.publish import publisher_telemetry

    ev = _read(sf_dir, "events", ["event_id", "event_type", "ts"])

    def as_publishes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["event_id"].to_numpy(),
            "channel": b["event_type"].to_numpy(),
            "published_at": b["ts"].to_numpy(),
        })

    tel = publisher_telemetry(ev.map_batches(as_publishes,
                                             batch_format="pandas"))
    # history_total is the cumulative-delivery counter (no history feed
    # here); the oracle-checked surface is the per-channel batch counters
    return tel[["channel", "published", "first_at", "last_at"]]


def origin_budget(sf_dir: str):
    """G2 discovery-budget counts (frontier_repository.go:81-91 COUNT
    WHERE origin AND discovered_at >= since), expressed over the events
    log (origin := event_type, discovered_at := ts, since := 2024-01-15):
    a pushdown-filtered read + small grouped count, SQL-oracle-checked.
    The crawl-side variant (pruned partitioned-frontier reads) is
    count_by_origin_since, pytest-covered."""
    since = pd.Timestamp("2024-01-15")
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["ts"] >= since]
        return keep.groupby("event_type", as_index=False).agg(
            n=("event_type", "size"))

    from ..stages.agg import hash_grouped_agg

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("event_type", as_index=False).agg(n=("n", "sum"))

    out = hash_grouped_agg(ev, ["event_type"], count, combine,
                           num_partitions=4)
    return out.map_batches(
        lambda b: b.rename(columns={"event_type": "origin"}),
        batch_format="pandas")


def extraction_quality(sf_dir: str):
    """G5 ExtractionQualityMetrics shape (quality_metrics.go:23-36):
    pages by type, extraction by method, word-count histogram buckets —
    grouped counts over the extraction stage's output."""
    from ..sources.html_fixtures import FIXTURES
    from ..stages.extract_html import ExtractHtmlStage

    names = sorted(FIXTURES)
    df = pd.DataFrame({
        "url": [f"https://{n}.fixture.test/page" for n in names],
        "html": [FIXTURES[n] for n in names],
    })
    ds = rd.from_pandas(df).repartition(4)
    out = ds.map_batches(ExtractHtmlStage(), batch_format="pandas")

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        bounds = [0, 50, 200, 500, 1000, 2000]
        b["wc_bucket"] = pd.cut(
            b["word_count"], bounds + [np.inf],
            labels=[f"{lo}+" for lo in bounds], right=False,
        ).astype(str)
        return b.groupby(["page_type", "extraction_method", "wc_bucket"],
                         as_index=False).agg(n=("url", "size"))

    from ..stages.agg import hash_grouped_agg

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby(["page_type", "extraction_method", "wc_bucket"],
                         as_index=False).agg(n=("n", "sum"))

    return hash_grouped_agg(
        out, ["page_type", "extraction_method", "wc_bucket"],
        bucketize, combine, num_partitions=4)


def structured_extraction(sf_dir: str):
    """M8 12-type detection + structured sidecar extractors (recipe/job/
    rfp/need_signal/location) routed per the ResolveSidecars table over
    classified crawl docs; nested results as JSON-string columns."""
    from ..stages.classify import classify_documents
    from ..stages.structured import StructuredExtractStage

    runner = _crawl("structured")
    classified = classify_documents(runner.documents_dataset(), concurrency=2)
    keep = classified.map_batches(
        lambda b: b[["doc_id", "url", "title", "body", "content_type",
                     "source_id", "topics"]],
        batch_format="pandas",
    )
    # plain tasks, not an actor pool: the stage is stateless, and chaining
    # a second reserved pool behind the classify actors can starve the
    # upstream read tasks on small sessions (2+2 actors == 4 CPUs)
    return keep.map_batches(StructuredExtractStage(), batch_format="pandas")


def location_scores(sf_dir: str):
    """Gazetteer location scoring (headline/lede/body zones, dominance
    rule) over the documents table — deterministic city mentions are
    injected per doc so the scorer has entities to rank (raw testdata text
    is location-free)."""
    from ..stages.structured import CANADIAN_CITIES, classify_location

    cities = sorted(CANADIAN_CITIES)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            # deterministic synthetic headline naming a city (doc-id keyed)
            c = cities[sum(ord(ch) for ch in str(doc_id)) % len(cities)]
            headline = f"{c.title()} update"
            r = classify_location(headline, text or "")
            rows.append({"doc_id": doc_id, **r})
        return pd.DataFrame(rows)

    return docs.map_batches(score, batch_format="pandas")


def jsonld_structured_extraction(sf_dir: str):
    """Two-tier Schema.org JSON-LD structured extraction (tier-1
    schema_org from raw HTML, tier-2 text heuristics) over the fixture
    corpus, as a distributed map_batches stage. Mirrors
    recipe_extractor.go:47-123 / job_extractor.go:50-160; the golden
    field values live in tests/test_jsonld.py."""
    import json as _json

    from ..sources.html_fixtures import FIXTURES
    from ..stages.structured import extract_job, extract_recipe

    names = sorted(FIXTURES)
    df = pd.DataFrame({
        "fixture": names,
        "url": [f"https://{n}.fixture.test/page" for n in names],
        "html": [FIXTURES[n] for n in names],
    })
    ds = rd.from_pandas(df).repartition(4)

    def run(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for fixture, html in zip(b["fixture"], b["html"]):
            recipe = extract_recipe("", "", html=html)
            job = extract_job("", "", html=html)
            # heuristic-tier hits over empty text are not real
            # extractions here — only the schema_org tier applies
            recipe = recipe if recipe and recipe[
                "extraction_method"] == "schema_org" else None
            job = job if job and job[
                "extraction_method"] == "schema_org" else None
            rows.append({
                "fixture": fixture,
                "recipe_name": recipe["name"] if recipe else "",
                "recipe_total_minutes": (
                    recipe.get("total_time_minutes") or 0) if recipe else 0,
                "recipe_json": _json.dumps(recipe) if recipe else "null",
                "job_title": job["title"] if job else "",
                "job_company": job["company"] if job else "",
                "job_employment_type": (
                    job["employment_type"] if job else ""),
                "job_json": _json.dumps(job) if job else "null",
            })
        return pd.DataFrame(rows)

    return ds.map_batches(run, batch_format="pandas")


def html_extraction(sf_dir: str):
    """M11-M15 extraction chain over the realistic-HTML fixture corpus:
    selector -> CMS template -> density heuristic -> readability fallback +
    metadata/JSON-LD + page-type tagging, as a distributed map_batches
    stage (rows-only check; the golden values live in
    tests/test_extract_html.py)."""
    from ..sources.html_fixtures import FIXTURES
    from ..stages.extract_html import ExtractHtmlStage

    names = sorted(FIXTURES)
    df = pd.DataFrame({
        "url": [f"https://{n}.fixture.test/page" for n in names],
        "html": [FIXTURES[n] for n in names],
    })
    ds = rd.from_pandas(df).repartition(4)
    out = ds.map_batches(ExtractHtmlStage(), batch_format="pandas")
    return out.map_batches(
        lambda b: b[["url", "title", "word_count", "extraction_method",
                     "template_name", "page_type", "author",
                     "published_date", "jsonld_schema_type"]],
        batch_format="pandas",
    )


def multimodal_features(sf_dir: str):
    """Media spans -> synthetic binary payloads -> decode/feature actor.

    Fully streaming: the vectorized f1.media_refs span kernel runs inside
    map_batches (no driver-side span iteration), payload synthesis is a
    per-batch stage, and only the decode output leaves the pipeline.
    SQL-hash oracled: returns a one-row summary (n_media, n_docs,
    width_sum, height_sum, dims_positive) whose counts and sha-derived
    decode sums are golden constants of the seeded t1 crawl, pinned in
    the oracle exactly like extraction_quality's fixture counters;
    per-row decode arithmetic is additionally pinned by
    tests/test_f1.py / test_stages.py vectors, and the docs-table
    variant (multimodal_features_docs) stays fully SQL-recomputed."""
    from ..sources.f1 import media_refs
    from ..stages.multimodal import decode_images, synth_media_table

    runner = _crawl("mm")
    docs = runner.documents_dataset().select_columns(["doc_id", "spans"])
    refs = docs.map_batches(media_refs, batch_format="pyarrow").limit(2000)

    def synth(batch: pa.Table) -> pa.Table:
        return synth_media_table(
            list(zip(batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist()))
        )

    media = refs.map_batches(synth, batch_format="pyarrow")
    out = decode_images(media, concurrency=2)

    def select(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["media_id", "doc_id", "width", "height"]]

    df = out.map_batches(select, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n_media": np.array([len(df)], dtype="int64"),
        "n_docs": np.array([df["doc_id"].nunique()], dtype="int64"),
        "width_sum": np.array([int(df["width"].sum())], dtype="int64"),
        "height_sum": np.array([int(df["height"].sum())], dtype="int64"),
        "dims_positive": [bool(((df["width"] > 0) & (df["height"] > 0)).all())],
    })


# ---------------- curation layer (stages/curation.py) ----------------


def _pii_augmented_docs(sf_dir: str):
    """documents with deterministic PII appended (mirrored in the oracle
    CTE): the raw corpus is plain words, so emails / phones / IPv4s are
    injected by doc_id residue to exercise every redaction path."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())

    def augment(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        s = b["doc_id"].astype("int64")
        email = np.where(
            s % 5 == 0,
            " contact user" + s.astype(str) + "@example.com now", "")
        phone = np.where(
            s % 7 == 0,
            " call 416-555-" + (s % 10000).astype(str).str.zfill(4), "")
        ip = np.where(
            s % 3 == 0,
            " from 10." + (s % 256).astype(str) + ".0."
            + ((s * 7) % 256).astype(str), "")
        b["text"] = b["text"].fillna("") + email + phone + ip
        return b

    return docs.map_batches(augment, batch_format="pandas")


def pii_redacted_docs(sf_dir: str):
    """Vectorized PII redaction (emails / NANP phones / IPv4) with per-doc
    match counts — pure map_batches, RE2-compatible patterns so the SQL
    oracle runs byte-identical regexes."""
    from ..stages.curation import pii_redact

    return pii_redact(_pii_augmented_docs(sf_dir))


def incremental_dedup_docs(sf_dir: str):
    """Streaming-corpus incremental dedup: even-doc_id docs stand in for
    the accumulated prior-run sha index; survivors are the min-id rows per
    sha among docs whose content the prior runs never saw. Exercises the
    broadcast anti-join path (the distributed tagged-union path is forced
    equal in tests via a tiny threshold)."""
    from ..stages.curation import incremental_dedup
    from ..stages.dedup import add_text_sha

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    prior = (
        docs.map_batches(lambda b: b[b["doc_id"] % 2 == 0],
                         batch_format="pandas")
        .map_batches(lambda b: add_text_sha(b), batch_format="pyarrow")
        .map_batches(lambda b: b[["text_sha"]], batch_format="pandas")
    )
    return incremental_dedup(docs, prior)


def source_quality_rollup_q(sf_dir: str):
    """Per-source curation rollup (doc/distinct-content counts, dup
    fraction, mean words, keep gate) via cascaded partial/combine."""
    from ..stages.curation import source_quality_rollup

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"],
                 blocks=_cpus())
    return source_quality_rollup(docs)


def doc_quality_filter(sf_dir: str):
    """Percentile-gated corpus filter: drop every doc below the corpus's
    exact 25th-percentile word count — composes the distributed-selection
    quantile (tiny count rows per pass) with a broadcast-threshold gate;
    the corpus itself is never sorted or shuffled."""
    from ..stages.curation import quantile_gate

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())

    def words(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].fillna("").str.split().str.len().fillna(0)
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy("int64"),
                             "n_words": n.to_numpy("int64")})

    return quantile_gate(docs.map_batches(words, batch_format="pandas"),
                         "n_words", q=0.25)


def crawl_snapshot_diff(sf_dir: str):
    """Snapshot diff between two derived crawl states: docs with
    doc_id%11==0 are new in B (added), doc_id%13==0 are dropped from B
    (removed), doc_id%7==0 get ' updated' appended in B (changed);
    unchanged keys never leave their partition. Mirrored in the oracle's
    FULL OUTER JOIN."""
    from ..stages.curation import snapshot_diff
    from ..stages.dedup import add_text_sha

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())

    def hashed(ds):
        return ds.map_batches(
            lambda b: add_text_sha(b, out_col="content_hash"),
            batch_format="pyarrow",
        ).map_batches(lambda b: b[["doc_id", "content_hash"]],
                      batch_format="pandas")

    # sha the full corpus ONCE (materialized light rows); the new side
    # re-hashes ONLY the ~1/7 updated rows instead of a second full
    # text pass (old cost: 2x read + 2x sha of every byte)
    base = hashed(docs).materialize()

    def upd_text(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["doc_id"] % 7 == 0) & (b["doc_id"] % 13 != 0)].copy()
        b["text"] = b["text"].fillna("") + " updated"
        return b

    upd = hashed(docs.map_batches(upd_text, batch_format="pandas"))

    old = base.map_batches(lambda b: b[b["doc_id"] % 11 != 0],
                           batch_format="pandas")
    new = base.map_batches(
        lambda b: b[(b["doc_id"] % 13 != 0) & (b["doc_id"] % 7 != 0)],
        batch_format="pandas").union(upd)
    return snapshot_diff(old, new, key_col="doc_id")


def _multiline_docs(sf_dir: str):
    """Deterministic multi-line corpus for line-level operators: the
    word-soup text is chunked into 4-word lines (regex: every 4th space
    becomes a newline — RE2-compatible, mirrored verbatim in the oracle)
    and shared boilerplate footer lines are appended (all docs get the
    subscribe line, doc_id%2==0 a follow line, doc_id%3==0 a rights
    line) — the cross-document duplicates a boilerplate stripper must
    remove everywhere but their first occurrence. Carries ``source`` so
    the per-source boilerplate operator can run over the same corpus."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"],
                 blocks=_cpus())

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("").str.replace(
            r"((?:\S+ ){3}\S+) ", "\\1\n", regex=True, flags=re.ASCII)
        ids = b["doc_id"].to_numpy()
        ml = (t + "\nsubscribe to our newsletter"
              + np.where(ids % 2 == 0, "\nfollow us for more updates", "")
              + np.where(ids % 3 == 0, "\nall rights reserved worldwide",
                         ""))
        return pd.DataFrame({"doc_id": ids, "text": ml,
                             "source": b["source"].to_numpy()})

    return docs.map_batches(derive, batch_format="pandas")


def line_dedup_docs(sf_dir: str):
    """C4-style corpus-wide exact line dedup over the derived multi-line
    corpus: each line survives only at its globally first (doc_id,
    line_no) occurrence — one line-keyed light-row exchange picks the
    winners, one doc-keyed exchange rebuilds the surviving docs."""
    from ..stages.curation import line_dedup

    return line_dedup(_multiline_docs(sf_dir))


def doc_boilerplate_strip(sf_dir: str):
    """CCNet-style PER-SOURCE boilerplate removal over the derived
    multi-line corpus: a line appearing in >= 2 docs and >= half of a
    source's docs is stripped from EVERY doc of that source (unlike
    line_dedup's global keep-first); surviving lines re-join in order.
    One light (source, line, n) exchange finds the boiler set, which
    broadcasts once so the strip+rebuild is a pure map over the corpus."""
    from ..stages.curation import boilerplate_strip

    return boilerplate_strip(_multiline_docs(sf_dir))


def corpus_two_gen(sf_dir: str):
    """End-to-end CorpusBuilder semantics, SQL-hash-checked: generation 0
    ingests the even-doc_id docs, generation 1 ingests ALL docs; the
    committed corpus must hold exactly one row per distinct text sha —
    min doc_id within gen 0 where gen 0 saw the sha, else min doc_id of
    gen 1 — with the gen that admitted it. Exercises gate->redact->
    incremental-dedup->atomic-commit end to end (the raw corpus carries
    no PII, so redaction is the identity here; its regexes are separately
    oracle-checked by `pii_redacted_docs`)."""
    import tempfile

    from .corpus_builder import CorpusBuilder

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    root = tempfile.mkdtemp(prefix="ncray-corpus-")
    b = CorpusBuilder(root, min_words=0, redact=True)
    b.ingest(docs.map_batches(lambda x: x[x["doc_id"] % 2 == 0],
                              batch_format="pandas"), gen=0)
    b.ingest(docs, gen=1)
    out = b.corpus_dataset(columns=["doc_id", "text_sha", "gen"]).to_pandas()
    import shutil as _sh

    _sh.rmtree(root, ignore_errors=True)
    return out


def crawl_corpus_increment(sf_dir: str):
    """CorpusBuilder over REAL crawl output, one generation per crawl
    round: each round's (first-writer-wins deduped) docs are gated,
    redacted and incrementally deduped against the sha index accumulated
    from every earlier round — recrawled/unchanged content never re-enters
    the corpus. Rows-only (the crawl loop is not SQL-expressible; the
    cross-generation sha-uniqueness invariant is asserted in
    tests/test_corpus_builder.py)."""
    import shutil as _sh
    import tempfile

    from .corpus_builder import CorpusBuilder

    runner = _crawl("corpusinc")
    root = tempfile.mkdtemp(prefix="ncray-crawlcorpus-")
    b = CorpusBuilder(root, min_words=0, redact=True)
    stats = []
    for r in range(runner.store.latest_committed_round() + 1):
        docs_r = runner.documents_dataset(round_filter=r)
        stats.append(b.ingest(docs_r, gen=r, id_col="doc_id",
                              text_col="body"))
    _sh.rmtree(root, ignore_errors=True)
    return pd.DataFrame(stats)


def corpus_report(sf_dir: str):
    """Per-language corpus health report: doc count, exact distinct-content
    count, duplicate-doc count, total whitespace tokens, and mean chars
    (single division of exact integers). The same cascaded partial/combine
    shape as source_quality_rollup, keyed by lang — the periodic corpus
    dashboard a curation team reads."""
    from ..stages.agg import hash_grouped_agg
    from ..stages.dedup import add_text_sha

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"],
                 blocks=_cpus())
    sha_ds = docs.map_batches(lambda b: add_text_sha(b),
                              batch_format="pyarrow")

    def l1_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split().str.len().fillna(0)
        return (pd.DataFrame({"lang": b["lang"].to_numpy(),
                              "text_sha": b["text_sha"].to_numpy(),
                              "n": np.int64(1),
                              "tokens": toks.to_numpy("int64"),
                              "chars": b["n_chars"].to_numpy("int64")})
                .groupby(["lang", "text_sha"], as_index=False).sum())

    def l1_combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(["lang", "text_sha"], as_index=False).sum()

    per_sha = hash_grouped_agg(sha_ds, ["lang", "text_sha"],
                               l1_partial, l1_combine)

    def l2_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n_unique=np.int64(1))
        return b.groupby("lang", as_index=False).agg(
            n_docs=("n", "sum"), n_unique=("n_unique", "sum"),
            tokens=("tokens", "sum"), chars=("chars", "sum"))

    def l2_combine(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("lang", as_index=False).sum()
        n_docs = g["n_docs"].to_numpy("int64")
        g["n_dup_docs"] = n_docs - g["n_unique"].to_numpy("int64")
        g["mean_chars"] = g["chars"].to_numpy("int64") / n_docs
        return g.rename(columns={"tokens": "total_tokens"}) \
                .drop(columns=["chars"])

    return hash_grouped_agg(per_sha, ["lang"], l2_partial, l2_combine)


def best_doc_per_group(sf_dir: str):
    """Keep-best-representative selection (the dedup keep policy that
    retains the highest-quality member instead of min-id): one row per
    (source, lang) — the doc with MAX n_chars, ties to the smallest
    doc_id. Runs as grouped_topk_rows k=1 (per-batch local argmax caps
    the shuffle at one row/group/batch, key-hashed exact combine)."""
    from ..stages.agg import grouped_topk_rows

    docs = _read(sf_dir, "documents",
                 ["doc_id", "source", "lang", "n_chars"], blocks=_cpus())

    def key_order(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["neg_chars"] = -b["n_chars"].to_numpy("int64")
        return b

    keyed = docs.map_batches(key_order, batch_format="pandas")
    out = grouped_topk_rows(keyed, key=["source", "lang"],
                            order_cols=["neg_chars", "doc_id"], k=1)
    return out.map_batches(
        lambda b: b[["source", "lang", "doc_id", "n_chars"]],
        batch_format="pandas")


def _crawl_page_edges():
    """Page-level link graph from the crawl's persisted outlink records:
    one (src=parent page URL, dst=target URL) edge per distinct pair,
    self-links dropped. (The M6 spider pre-filter keeps outlinks
    on-domain, so the page graph — not a host graph — is what the crawl
    actually records.) Pruned-column distributed read of the light shard
    parquet."""
    import glob as _glob
    import os as _os

    import ray.data as rdm

    runner = _crawl("linkgraph")
    paths = sorted(_glob.glob(_os.path.join(
        runner.store.root, "rounds", "*", "results", "light", "*", "*.parquet")))
    light = rdm.read_parquet(
        paths, filter=pc.field("rec") == "outlink",
        columns=["rec", "url", "parent_url"])

    def edges(b: pa.Table) -> pd.DataFrame:
        out = pd.DataFrame({"src": b["parent_url"].to_pandas().to_numpy(),
                            "dst": b["url"].to_pandas().to_numpy()})
        out = out[out["src"] != out["dst"]]
        return out.drop_duplicates()

    ds = light.map_batches(edges, batch_format="pyarrow")
    # exact global edge dedup (per-batch drop_duplicates is only local)
    from ..stages.agg import hash_grouped_agg

    return hash_grouped_agg(ds, ["src", "dst"],
                            lambda b: b.drop_duplicates(["src", "dst"]),
                            lambda p: p.drop_duplicates(["src", "dst"]))


def link_pagerank(sf_dir: str):
    """PageRank over the crawl's page link graph (10 power iterations,
    d=0.85, uniform dangling redistribution) — the graph-derived authority
    signal a frontier prioritizer consumes. Rows-only (iterative float
    fixpoint; equality vs a dense numpy reference is pinned to 1e-9 in
    tests/test_graph.py)."""
    from ..stages.graph import pagerank

    return pagerank(_crawl_page_edges(), n_iters=10)


def link_indegree(sf_dir: str):
    """Distinct-source indegree per page over the same crawl link graph."""
    from ..stages.graph import indegree

    return indegree(_crawl_page_edges())


def doc_normalized(sf_dir: str):
    """Canonical text normalization (lowercase, ASCII-alnum only,
    whitespace collapse) — the pre-dedup canonicalization pass."""
    from ..stages.curation import normalize_text

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())

    def mess(b: pd.DataFrame) -> pd.DataFrame:
        # deterministic noise so the normalizer has real work (mirrored
        # in the oracle): mixed case + punctuation + double spaces
        b = b.copy()
        s = b["doc_id"].astype("int64")
        b["text"] = np.where(
            s % 2 == 0,
            "  The, QUICK (brown) fox!! " + b["text"].fillna("").str.upper(),
            b["text"].fillna(""))
        return b

    return normalize_text(docs.map_batches(mess, batch_format="pandas"))


def doc_graph_indegree(sf_dir: str):
    """SQL-checked twin for the graph module's indegree: edges derived
    arithmetically from the documents table (src=doc_id,
    dst=(doc_id*7+3) mod N — deterministic, reproducible in SQL), counted
    by the REAL partial/combine indegree operator."""
    from ..stages.graph import indegree

    docs = _read(sf_dir, "documents", ["doc_id"], blocks=_cpus())
    n = docs.count()

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["doc_id"].to_numpy("int64")
        return pd.DataFrame({"src": src, "dst": (src * 7 + 3) % n})

    out = indegree(docs.map_batches(edges, batch_format="pandas"))
    return out.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].to_numpy("int64"),
                                "indegree": b["indegree"].to_numpy("int64")}),
        batch_format="pandas")


def doc_graph_components(sf_dir: str):
    """SQL-checked twin for the distributed connected-components
    machinery (the min-label propagation behind every near-dup
    clusterer, exposed as a first-class graph op): edges derived
    arithmetically (doc_id -> its decade head, 10-node star components,
    diameter 2) and labeled by the REAL cluster_labels_distributed;
    the oracle is a recursive reachability CTE."""
    from ..stages.dedup import cluster_labels_distributed

    docs = _read(sf_dir, "documents", ["doc_id"], blocks=_cpus())

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        src = b["doc_id"].to_numpy("int64")
        return pd.DataFrame({"a": src, "b": src - (src % 10)})

    return cluster_labels_distributed(
        docs.map_batches(pairs, batch_format="pandas"))


def doc_vocab_coverage(sf_dir: str):
    """Per-doc coverage of the corpus top-30 vocabulary (tokenizer
    compression proxy): n_tokens, n_in_vocab, and their exact-int
    division. The vocab is the exact distributed top-k (one driver-held
    k-row table, broadcast to the probe pass)."""
    import ray as _ray

    from ..stages.curation import vocab_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    vocab = vocab_topk(docs, k=30)
    vref = _ray.put(np.sort(vocab["token"].to_numpy(dtype=object)))

    def cover(b: pd.DataFrame) -> pd.DataFrame:
        v = _ray.get(vref)
        toks = b["text"].fillna("").str.split(" ")
        n_tok = toks.str.len().fillna(0).to_numpy("int64")
        n_in = np.array([int(np.sum(np.isin(np.array(t, dtype=object), v)))
                         if t else 0 for t in toks], dtype=np.int64)
        cov = np.where(n_tok > 0, n_in / np.maximum(n_tok, 1), 0.0)
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy("int64"),
                             "n_tokens": n_tok, "n_in_vocab": n_in,
                             "coverage": cov})

    return docs.map_batches(cover, batch_format="pandas")


def _file_roundtrip(sf_dir: str, fmt: str):
    """documents -> distributed {fmt} write -> distributed read ->
    normalize: the output must hash-match the original table (the SQL
    oracle is simply the documents table), proving the reader/writer
    pair loses nothing — dtypes, NULL handling, column order."""
    import shutil as _sh
    import tempfile

    from ..sources import files as F

    docs = _read(sf_dir, "documents", blocks=_cpus())
    out = tempfile.mkdtemp(prefix=f"ncray-{fmt}-")
    try:
        if fmt == "jsonl":
            F.write_jsonl(docs, out)
            back = F.read_jsonl_docs(out)
        elif fmt == "feather":
            F.write_feather(docs, out)
            back = F.read_feather_docs(out)
        else:
            F.write_csv(docs, out)
            back = F.read_csv_docs(out)
        return back.to_pandas()
    finally:
        _sh.rmtree(out, ignore_errors=True)


def jsonl_roundtrip_docs(sf_dir: str):
    """JSONL writer -> reader round trip of the documents table; the oracle hash proves byte-faithful field round-tripping."""
    return _file_roundtrip(sf_dir, "jsonl")


def csv_roundtrip_docs(sf_dir: str):
    """CSV writer -> reader round trip of the documents table with quoting/escaping; oracle hash proves fidelity."""
    return _file_roundtrip(sf_dir, "csv")


def feather_roundtrip_docs(sf_dir: str):
    """documents -> distributed Arrow-IPC (Feather v2) export, one file
    per block -> file-per-task re-ingest -> normalize; hash-matches the
    original table (the fourth interchange format beside parquet/JSONL/
    CSV/WARC)."""
    return _file_roundtrip(sf_dir, "feather")


def warc_roundtrip_docs(sf_dir: str):
    """documents -> distributed WARC export (one ISO-28500 member per
    block, exact Content-Length framing, metadata as WARC-NC headers)
    -> distributed file-per-task re-ingest -> normalize; must hash-match
    the original table. The crawl-interchange surface (CommonCrawl's
    format) round-trips losslessly."""
    import shutil as _sh
    import tempfile

    from ..sources.warc import read_warc_docs, write_warc

    docs = _read(sf_dir, "documents", blocks=_cpus())
    out = tempfile.mkdtemp(prefix="ncray-warc-")
    try:
        write_warc(docs, out)
        return read_warc_docs(out).to_pandas()
    finally:
        _sh.rmtree(out, ignore_errors=True)


def doc_vocabulary(sf_dir: str):
    """Exact top-100 corpus vocabulary with counts (tokenizer prep):
    per-batch value_counts partials, exact combine, deterministic
    (n DESC, token ASC) tie-break."""
    from ..stages.curation import vocab_topk

    docs = _read(sf_dir, "documents", ["text"], blocks=_cpus())
    return vocab_topk(docs, k=100)


def crawl_warc_export(sf_dir: str):
    """REAL crawl output -> WARC interchange: the S10 blob archive is
    exported as WARC ``response`` members (one per block, deterministic
    url_hash-range stems, crawl-timestamp WARC-Dates) and re-read
    through the distributed parser. SQL-hash oracled: returns a one-row
    summary (n_records, n_unique_targets, bytes_total, all_sha_match)
    where all_sha_match is the payload-sha TABLE COMPARE — the sha256
    multiset of every round-tripped WARC payload must equal the blob
    archive's — and the counts are golden constants of the seeded t1
    crawl, pinned in the oracle exactly like extraction_quality's
    fixture-corpus counters (per-record sha equality additionally
    asserted in tests/test_structured.py)."""
    import hashlib as _hashlib
    import shutil as _sh
    import tempfile

    from ..sources.warc import read_warc_records, write_warc_responses

    runner = _crawl("warc")
    out = tempfile.mkdtemp(prefix="ncray-warcx-")
    try:
        write_warc_responses(runner.blobs_dataset(), out)
        recs = read_warc_records(out)

        def digest(b: pd.DataFrame) -> pd.DataFrame:
            pay = b["payload"].map(bytes)
            return pd.DataFrame({
                "url_hash": b["url_hash"].astype(str),
                "target_uri": b["target_uri"].astype(str),
                "n_bytes": pay.str.len().astype("int64"),
                "sha": pay.map(
                    lambda x: _hashlib.sha256(x).hexdigest()),
            })

        rdf = recs.map_batches(digest, batch_format="pandas").to_pandas()

        def blob_digest(b: pd.DataFrame) -> pd.DataFrame:
            pay = b["html"].map(bytes)
            return pd.DataFrame({
                "url_hash": b["url_hash"].astype(str),
                "sha": pay.map(lambda x: _hashlib.sha256(x).hexdigest()),
            })

        bdf = (runner.blobs_dataset()
               .map_batches(blob_digest, batch_format="pandas").to_pandas())
        # payload-sha table compare: the sha multiset of the WARC round
        # trip must equal the blob archive's exactly (order-free)
        sha_match = (sorted(zip(rdf["url_hash"], rdf["sha"]))
                     == sorted(zip(bdf["url_hash"], bdf["sha"])))
        return pd.DataFrame({
            "n_records": np.array([len(rdf)], dtype="int64"),
            "n_unique_targets": np.array(
                [rdf["url_hash"].nunique()], dtype="int64"),
            "bytes_total": np.array(
                [int(rdf["n_bytes"].sum())], dtype="int64"),
            "all_sha_match": [bool(sha_match)],
        })
    finally:
        _sh.rmtree(out, ignore_errors=True)


def lang_word_quantiles(sf_dir: str):
    """Exact per-language word-count quartiles at count-map cost: one
    light (lang, n_words, n) exchange — the value multiset never
    shuffles — resolved to quantile_disc rank semantics per group;
    hash-checked against DuckDB's grouped quantile_disc."""
    from ..stages.sketch import grouped_value_quantiles

    docs = _read(sf_dir, "documents", ["lang", "text"], blocks=_cpus())

    def words(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].fillna("").str.split().str.len().fillna(0)
        return pd.DataFrame({"lang": b["lang"].to_numpy(),
                             "n_words": n.to_numpy("int64")})

    return grouped_value_quantiles(
        docs.map_batches(words, batch_format="pandas"), "lang", "n_words")


def events_distinct_users_hll(sf_dir: str):
    """HyperLogLog distinct-user telemetry beside its exact twin: one
    sketch pass (4 KB of driver state) plus the exact distributed
    distinct count; returns (n_exact, hll_ok) where hll_ok asserts the sketch
    estimate landed within 5% relative error of the exact count. The
    register hash itself isn't SQL-expressible, but this shape IS
    SQL-hash oracled: the oracle recomputes n_exact and pins
    hll_ok=TRUE, so a drifting sketch fails the driver gate. Accuracy
    + partitioning-independence additionally pinned in
    tests/test_sketch.py."""
    from ..stages.agg import hash_grouped_agg
    from ..stages.sketch import hll_distinct

    ev = _read(sf_dir, "events", ["user_id"], blocks=_cpus())
    est = hll_distinct(ev, "user_id")["estimate"]

    def uniq(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("user_id")

    n_exact = hash_grouped_agg(ev, ["user_id"], uniq, uniq).count()
    return pd.DataFrame({
        "n_exact": np.array([n_exact], dtype="int64"),
        "hll_ok": [bool(abs(est - n_exact) / max(n_exact, 1) <= 0.05)],
    })


def events_type_distinct_hll(sf_dir: str):
    """Grouped HyperLogLog: approximate distinct users PER event_type
    beside the exact grouped twin (stages/sketch.py
    grouped_hll_distinct) — each batch ships one 4 KB register row per
    type instead of every (type, user) pair, the group-hashed combine
    maxes registers. Returns (event_type, n_exact, hll_ok) with hll_ok
    asserting the per-group sketch estimate within 5% of exact — the
    register hash isn't SQL-expressible but this shape is SQL-hash
    oracled (oracle recomputes grouped exact counts, pins
    hll_ok=TRUE). Per-group error and partitioning-independence
    additionally pinned in tests/test_sketch.py."""
    from ..stages.agg import hash_grouped_agg
    from ..stages.sketch import grouped_hll_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"], blocks=_cpus())
    est = grouped_hll_distinct(ev, "event_type", "user_id").to_pandas()

    def uniq(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["event_type", "user_id"])

    def count_users(part: pd.DataFrame) -> pd.DataFrame:
        g = part.drop_duplicates(["event_type", "user_id"]) \
                .groupby("event_type", as_index=False)["user_id"].size() \
                .rename(columns={"size": "n_exact"})
        g["n_exact"] = g["n_exact"].astype("int64")
        return g

    exact = hash_grouped_agg(ev, ["event_type"], uniq,
                             count_users).to_pandas()
    out = exact.merge(est, on="event_type")
    rel_err = (out["n_distinct_est"] - out["n_exact"]).abs() \
        / out["n_exact"].clip(lower=1)
    out["hll_ok"] = (rel_err <= 0.05).astype(bool)
    out = out[["event_type", "n_exact", "hll_ok"]]
    return out.sort_values("event_type").reset_index(drop=True)


def events_cohort_overlap_kmv(sf_dir: str):
    """KMV (bottom-k) sketch set operations: distinct click-users vs
    purchase-users, their union AND intersection estimated from two
    one-pass k*8-byte sketches (stages/sketch.py
    kmv_set_cardinalities) beside the exact distributed twin (per-user
    has-a/has-b flags through one group-hashed exchange). HLL can only
    union; the bottom-k Jaccard gives "did both" telemetry without
    shuffling (user, type) pairs. Returns one row per measure with the
    exact count and kmv_ok asserting the sketch estimate within 5% —
    the bottom-k hash isn't SQL-expressible but this shape is SQL-hash
    oracled (oracle recomputes the four exact cardinalities via
    grouped boolean flags, pins kmv_ok=TRUE). Error bounds
    additionally pinned in tests/test_sketch.py."""
    from ..stages.agg import hash_grouped_agg
    from ..stages.sketch import kmv_set_cardinalities

    ev = _read(sf_dir, "events", ["event_type", "user_id"], blocks=_cpus())
    a = ev.filter(expr="event_type == 'click'")
    b = ev.filter(expr="event_type == 'purchase'")
    est = kmv_set_cardinalities(a, b, "user_id", k=1024)

    def flags(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.assign(
            has_a=(batch["event_type"] == "click"),
            has_b=(batch["event_type"] == "purchase"),
        ).groupby("user_id", as_index=False)[["has_a", "has_b"]].max()
        return g

    def reduce_counts(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("user_id", as_index=False)[["has_a", "has_b"]] \
                .max()
        return pd.DataFrame({
            "n_a": [np.int64(g["has_a"].sum())],
            "n_b": [np.int64(g["has_b"].sum())],
            "n_union": [np.int64((g["has_a"] | g["has_b"]).sum())],
            "n_intersect": [np.int64((g["has_a"] & g["has_b"]).sum())],
        })

    parts = hash_grouped_agg(ev, ["user_id"], flags,
                             reduce_counts).to_pandas()
    exact = parts[["n_a", "n_b", "n_union", "n_intersect"]].sum()
    rows = []
    for m in ("n_a", "n_b", "n_union", "n_intersect"):
        e, s = int(exact[m]), float(est[m])
        rows.append((m, e, bool(abs(s - e) / max(e, 1) <= 0.05)))
    out = pd.DataFrame(rows, columns=["measure", "n_exact", "kmv_ok"])
    out["n_exact"] = out["n_exact"].astype("int64")
    return out


def embedding_pca(sf_dir: str):
    """Distributed PCA over the embeddings table: streaming (d x d)
    covariance partials -> driver eigh (microseconds at d=64) ->
    broadcast projection. Rows-only (eigendecomposition is not
    SQL-expressible); pinned to the full-batch numpy reference in
    tests/test_stages.py."""
    from ..stages.similarity import pca_fit, pca_project

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                blocks=_cpus())
    mean, comps = pca_fit(emb, n_components=8)
    return pca_project(emb, mean, comps)


def doc_collocations(sf_dir: str):
    """Top-50 corpus collocations by exact bigram LIFT (the PMI argument
    without the log, so the float hashes identically in SQL), min
    count 5: one bigram-keyed exchange of per-batch counted pairs,
    vocab-bounded unigram broadcast, per-partition top-k."""
    from ..stages.textstats import collocations_topk

    docs = _read(sf_dir, "documents", ["text"], blocks=_cpus())
    return collocations_topk(docs, k=50, min_count=5)


def embedding_quantize_int8(sf_dir: str):
    """Scalar int8 quantization of the embeddings table (per-vector
    symmetric scale, floor-only arithmetic — every quantized value and
    scale is bit-identical in the DuckDB oracle), exploded to one row
    per component for scalar hash comparison."""
    from ..stages.similarity import quantize_int8

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                blocks=_cpus())
    q = quantize_int8(emb)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        dims = b["qvec"].str.len().to_numpy("int64")
        ids = np.repeat(b["vec_id"].to_numpy("int64"), dims)
        scales = np.repeat(b["scale"].to_numpy("float64"), dims)
        comp = (np.arange(int(dims.sum()))
                - np.repeat(np.cumsum(dims) - dims, dims))
        flat = np.concatenate(b["qvec"].to_list()) if len(b) else \
            np.array([], dtype=np.int8)
        return pd.DataFrame({"vec_id": ids, "i": comp.astype("int64"),
                             "q": flat.astype("int64"),
                             "scale": scales})

    return q.map_batches(explode, batch_format="pandas")


def doc_chunk_windows(sf_dir: str):
    """Sliding-window chunking with overlap (window 64, stride 48) —
    the RAG/embedding prep pass; hash-checked against a DuckDB
    list-slice derivation."""
    from ..stages.corpus import chunk_windows

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return chunk_windows(docs, window=64, stride=48)


def doc_tfidf_terms(sf_dir: str):
    """Per-doc top-3 TF-IDF keywords with the exactly-hashable
    score = tf*N/df: one term-keyed exchange computes df in place (no
    df table, no join-back), grouped_topk_rows resolves the per-doc
    top-k."""
    from ..stages.textstats import tfidf_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return tfidf_topk(docs, k=3)


def _bpe_merges_table(sf_dir: str):
    from ..stages.bpe import train_bpe

    docs = _read(sf_dir, "documents", ["text"], blocks=_cpus())
    return train_bpe(docs, n_merges=16)


def bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training: 16 merges learned over the
    corpus word-frequency table (the corpus is scanned once; every
    iteration runs over the bounded word table). Iterative argmax is
    not SQL-expressible — pinned merge-for-merge to a sequential
    textbook implementation in tests/test_bpe.py instead."""
    return _bpe_merges_table(sf_dir)


def bpe_token_counts(sf_dir: str):
    """Per-doc BPE token counts under the learned merge table (greedy
    lowest-rank encoding with per-batch distinct-word caching)."""
    from ..stages.bpe import apply_bpe

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return apply_bpe(docs, _bpe_merges_table(sf_dir))


def doc_dsir_weights(sf_dir: str):
    """DSIR-style hashed importance weights vs the English slice as the
    target domain (Xie et al. 2023). Per-doc weight = one IEEE division
    of two exact int64 sums over md5-hashed unigram buckets (B=1024),
    so the float hashes identically in SQL; the bucket-count fit is ONE
    corpus scan whose partials are B-bounded and whose result is
    broadcast into the map-side scoring actor pool — no shuffle."""
    from ..stages.selection import dsir_weights

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"],
                 blocks=_cpus())
    return dsir_weights(docs, lambda b: (b["lang"] == "en").to_numpy(),
                        n_buckets=1024, concurrency=_cpus() // 2 or 1)


def doc_bm25_topk(sf_dir: str):
    """Okapi BM25 top-25 retrieval for the fixed query {merge, stream,
    window} with the log-free raw-odds idf: corpus stats (N, avgdl, df)
    collected in one Q-bounded partial pass and broadcast; scoring is
    pure map-side with a fixed-order float chain the SQL oracle mirrors
    bit-for-bit; per-batch local top-k caps the final exchange."""
    from ..stages.selection import bm25_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return bm25_topk(docs, ["merge", "stream", "window"], k=25,
                     concurrency=_cpus() // 2 or 1)


def events_running_totals(sf_dir: str):
    """Per-user running event count + running value-cents total in
    (ts, event_id) order — the per-key ordered cumulative aggregate
    (ROWS UNBOUNDED PRECEDING window). Events hash-route by user so a
    partition holds its users' FULL streams; the cumsum is one
    vectorized sort + groupby-cumsum over the whole partition."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def running_part(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "event_id": pd.Series(dtype="int64"),
                "running_n": pd.Series(dtype="int64"),
                "running_value_cents": pd.Series(dtype="int64")})
        p = part.sort_values(["user_id", "ts", "event_id"],
                             kind="mergesort")
        p = p.assign(_cents=_cents(p["value"].to_numpy()))
        g = p.groupby("user_id")
        return pd.DataFrame({
            "user_id": p["user_id"].to_numpy(),
            "event_id": p["event_id"].to_numpy(),
            "running_n": g.cumcount().to_numpy("int64") + 1,
            "running_value_cents": g["_cents"].cumsum().to_numpy("int64"),
        })

    return hash_grouped_agg(ev, ["user_id"], lambda b: b, running_part)


def doc_inverted_postings(sf_dir: str):
    """Inverted-index postings for the corpus top-50 df terms: exact df
    via light (term, count) partials + top-k combine; the posting rows
    (term, df, doc_id, tf, first_pos) are emitted purely map-side against
    the broadcast term table — nothing per-posting ever shuffles."""
    from ..stages.selection import inverted_postings

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return inverted_postings(docs, n_terms=50,
                             concurrency=_cpus() // 2 or 1)


def doc_weighted_sample(sf_dir: str):
    """PPS systematic sampling of 40 docs proportional to token mass via
    a DISTRIBUTED EXCLUSIVE PREFIX SUM over the doc-id line (bucket sums
    -> tiny driver scan -> per-bucket searchsorted). Integer-only — the
    SQL oracle is a window cumsum joined to generate_series positions."""
    from ..stages.selection import pps_sample

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return pps_sample(docs, k=40, bucket_width=64)


def doc_phrase_search(sf_dir: str):
    """Exact positional phrase search for "data stream" (adjacent-token
    AND): one purely map-side vectorized pass over flat (token, doc,
    pos) arrays — no shuffle; SQL oracle is the token-position
    self-join."""
    from ..stages.selection import phrase_search

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return phrase_search(docs, ["data", "stream"],
                         concurrency=_cpus() // 2 or 1)


def doc_skyline(sf_dir: str):
    """Pareto-frontier (skyline) doc selection over two competing
    quality metrics — total whitespace tokens vs distinct tokens: keep
    every doc no other doc beats-or-ties on BOTH (one strictly). The
    associative local-skyline partial runs map-side; one tiny
    single-partition pass over the surviving light rows finishes. The
    SQL oracle is the NOT EXISTS domination anti-join."""
    from ..stages.selection import skyline

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())

    def metrics(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        toks = b["text"].fillna("").str.split()
        e = toks.explode().dropna()
        nd = (e.groupby(level=0).nunique()
              .reindex(b.index, fill_value=0).astype("int64"))
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "n_tokens": toks.str.len().astype("int64"),
            "n_distinct": nd,
        })

    return skyline(docs.map_batches(metrics, batch_format="pandas"),
                   "n_tokens", "n_distinct")


def embedding_kmeans(sf_dir: str):
    """Full-corpus distributed Lloyd k-means (k=8) in int64 FIXED-POINT
    arithmetic — byte-identical at any partitioning and pinned to the
    sequential twin in tests (no SQL oracle: iterative). Per iteration
    only cluster-bounded (cluster, n, sumvec) partials reach the driver;
    the quantized stream materializes once and feeds every pass."""
    from ..stages.similarity import kmeans_fit

    vecs = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                 blocks=_cpus())
    summary, _, _ = kmeans_fit(vecs, n_clusters=8)
    return summary


def doc_bigram_stats(sf_dir: str):
    """CCNet-style bigram-LM sufficient statistics (integer familiarity
    mass + hapax novelty) via ONE bigram-hash exchange in which each
    partition owns all postings of its bigrams; SQL oracle is the
    token-position self-join + corpus-count join."""
    from ..stages.selection import bigram_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return bigram_stats(docs)


def _type_day_fine(sf_dir: str) -> pd.DataFrame:
    """Shared finest-level (event_type, day) aggregate behind ROLLUP and
    CUBE: one distributed exchange; the result is types x days rows
    (time-range-bounded, NOT row-bounded), so every grouping level is a
    driver-side O(groups) fold over this table."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "day": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64"),
                                 "value_cents": pd.Series(dtype="int64")})
        p = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                          "day": b["ts"].dt.strftime("%Y-%m-%d"),
                          "_c": _cents(b["value"].to_numpy())})
        return p.groupby(["event_type", "day"], as_index=False).agg(
            n=("_c", "size"), value_cents=("_c", "sum"))

    return hash_grouped_agg(
        ev, ["event_type", "day"], partial,
        lambda p: p.groupby(["event_type", "day"], as_index=False)
        [["n", "value_cents"]].sum(),
    ).to_pandas()


def events_rollup(sf_dir: str):
    """OLAP ROLLUP over (event_type, day): counts + exact value cents at
    all three grouping levels with 'ALL' sentinels (no NULL-vs-NaN hash
    ambiguity), folded from the shared _type_day_fine exchange."""
    fine = _type_day_fine(sf_dir)

    mid = (fine.groupby("event_type", as_index=False)
           [["n", "value_cents"]].sum().assign(day="ALL", lvl=np.int64(1)))
    top = pd.DataFrame({"event_type": ["ALL"], "day": ["ALL"],
                        "n": [fine["n"].sum()],
                        "value_cents": [fine["value_cents"].sum()],
                        "lvl": np.int64(3)})
    fine = fine.assign(lvl=np.int64(0))
    cols = ["event_type", "day", "n", "value_cents", "lvl"]
    out = pd.concat([fine[cols], mid[cols], top[cols]], ignore_index=True)
    return out.astype({"n": "int64", "value_cents": "int64",
                       "lvl": "int64"})

def events_user_gaps(sf_dir: str):
    """Per-user inter-event gap statistics (the LAG window family):
    microsecond-exact min/max/sum of consecutive-event gaps in
    (ts, event_id) order. Events hash-route by user so one partition
    holds each user's full stream; the diff is one vectorized sort +
    per-group shift over the partition."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def gaps_part(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "n_gaps": pd.Series(dtype="int64"),
            "min_gap_us": pd.Series(dtype="int64"),
            "max_gap_us": pd.Series(dtype="int64"),
            "sum_gap_us": pd.Series(dtype="int64")})
        if not len(part):
            return empty
        p = part.assign(
            _us=part["ts"].to_numpy("datetime64[us]").astype("int64")
        ).sort_values(["user_id", "_us", "event_id"], kind="mergesort")
        g = p.groupby("user_id")
        gap = (p["_us"] - g["_us"].shift()).to_numpy()
        p = p.assign(_gap=gap)
        agg = p.groupby("user_id", as_index=False).agg(
            n_events=("_us", "size"), n_gaps=("_gap", "count"),
            min_gap_us=("_gap", "min"), max_gap_us=("_gap", "max"),
            sum_gap_us=("_gap", "sum"))
        agg = agg[agg["n_gaps"] >= 1]
        if not len(agg):
            return empty
        return agg.astype({c: "int64" for c in agg.columns})

    return hash_grouped_agg(ev, ["user_id"], lambda b: b, gaps_part)


def doc_rank_ntile(sf_dir: str):
    """Distributed per-language row_number + NTILE(4) over
    (n_tokens, doc_id) — quality-quantile bucketing via the count-map
    exchange (agg.grouped_rank_ntile); SQL oracle is the window pair."""
    from ..stages.agg import grouped_rank_ntile

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"],
                 blocks=_cpus())

    def with_tokens(b: pd.DataFrame) -> pd.DataFrame:
        from ..stages.selection import _tokenize

        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy("int64"),
            "lang": b["lang"].to_numpy(),
            "n_tokens": _tokenize(b["text"]).str.len().to_numpy("int64")})

    toks = docs.map_batches(with_tokens, batch_format="pandas")
    return grouped_rank_ntile(toks, "lang", "n_tokens", "doc_id",
                              n_tiles=4)


def lang_token_char_corr(sf_dir: str):
    """Per-language Pearson correlation of token count vs char length
    from EXACT int64 sufficient statistics (one map-side partial + a
    lang-keyed combine); the final corr mirrors the SQL's DOUBLE
    expression token-for-token (sqrt is IEEE correctly-rounded, unlike
    log — so the float hash-matches)."""
    from ..stages.agg import hash_grouped_agg

    docs = _read(sf_dir, "documents", ["text", "lang"], blocks=_cpus())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from ..stages.selection import _tokenize

        t = b["text"].fillna("")
        x = _tokenize(b["text"]).str.len().to_numpy("int64")
        y = t.str.len().to_numpy("int64")
        p = pd.DataFrame({"lang": b["lang"].to_numpy(), "n": np.int64(1),
                          "sum_x": x, "sum_y": y, "sum_xy": x * y,
                          "sum_x2": x * x, "sum_y2": y * y})
        return p.groupby("lang", as_index=False).sum()

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        s = p.groupby("lang", as_index=False).sum()
        # vectorized float mirror: elementwise float64 ops are the same
        # IEEE operations as the scalar SQL expression, so the hash
        # match is preserved at none of the per-row Python cost
        n = s["n"].to_numpy("int64").astype("float64")
        sx = s["sum_x"].to_numpy("int64").astype("float64")
        sy = s["sum_y"].to_numpy("int64").astype("float64")
        den = (np.sqrt(n * s["sum_x2"].to_numpy("int64").astype("float64")
                       - sx * sx)
               * np.sqrt(n * s["sum_y2"].to_numpy("int64").astype("float64")
                         - sy * sy))
        # zero-variance groups (single doc, or identical x or y across
        # the group) have den == 0 — drop them (the SQL mirrors with a
        # HAVING) instead of dividing by zero where SQL would emit NULL
        keep = den != 0.0
        num = (n * s["sum_xy"].to_numpy("int64").astype("float64")
               - sx * sy)
        s = s[keep].reset_index(drop=True)
        s["corr"] = (num[keep] / den[keep]).astype(np.float64)
        return s

    return hash_grouped_agg(docs, ["lang"], partial, combine)


def customer_order_totals(sf_dir: str):
    """LEFT OUTER join semantics without a row join: every customer with
    order count + exact spend cents, zero-filled for customers with no
    orders. Order partials pre-aggregate per batch; the tagged union
    with customer marker rows combines in ONE custkey exchange (the
    large side never ships raw rows)."""
    from ..stages.agg import hash_grouped_agg

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"c_custkey": b["c_custkey"].to_numpy("int64"),
                             "n_orders": np.int64(0),
                             "total_cents": np.int64(0),
                             "is_cust": np.int64(1)})

    def order_partial(b: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame({"c_custkey": b["o_custkey"].to_numpy("int64"),
                          "n_orders": np.int64(1),
                          "total_cents": _cents(
                              b["o_totalprice"].to_numpy()),
                          "is_cust": np.int64(0)})
        return p.groupby("c_custkey", as_index=False).sum()

    tagged = (cust.map_batches(cust_rows, batch_format="pandas")
              .union(orders.map_batches(order_partial,
                                        batch_format="pandas")))

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        s = p.groupby("c_custkey", as_index=False).sum()
        s = s[s["is_cust"] >= 1]  # left semantics: orphan orders drop
        return s[["c_custkey", "n_orders", "total_cents"]].astype("int64")

    return hash_grouped_agg(tagged, ["c_custkey"], lambda b: b, combine)


def events_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the top-level integer field
    ``k`` out of the JSON ``props`` column and aggregate exact per-type
    stats. The fast path is one VECTORIZED regex, applied ONLY to rows
    whose whole payload fullmatches a strict flat-object grammar
    (primitive values, no escapes/arrays/nesting) — such rows are VALID
    flat JSON by construction, so regex extraction provably equals
    json-parse on them; every other row, including malformed JSON that
    merely LOOKS flat, routes to the real parser (json.loads on the
    anomaly subset only). Oracle uses DuckDB's native JSON operator, so
    the test proves the split extraction == json-parse."""
    import json

    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["event_type", "props"])

    # strict flat JSON object: {"key": prim, ...} with string/number/
    # bool/null primitives and NO escapes — rows matching this are
    # valid JSON with only top-level keys, the precondition the regex
    # fast path needs (a mere single-brace heuristic would also accept
    # MALFORMED payloads like 'garbage "k": 3 {' and diverge from the
    # parser)
    _PRIM = r'(?:-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?|"[^"\\]*"|true|false|null)'
    _PAIR = r'"[^"\\]*"\s*:\s*' + _PRIM
    FLAT_RE = (r'\s*\{\s*(?:' + _PAIR + r'(?:\s*,\s*' + _PAIR
               + r')*\s*)?\}\s*')

    def _k_of(s):
        try:
            v = json.loads(s).get("k")
        except (TypeError, ValueError):
            return np.nan
        return float(v) if isinstance(v, int) and not isinstance(
            v, bool) else np.nan

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        props = b["props"].fillna("")
        flat = props.str.fullmatch(FLAT_RE).to_numpy()
        # trailing lookahead: a float like 5.5 or 5e3 must NOT yield its
        # integer prefix (int-typed-only contract, same as the oracle's
        # json_type gate)
        k = (props.str.extract(r'"k"\s*:\s*(-?\d+)(?![\d.eE])',
                               expand=False).astype("float64"))
        if not flat.all():
            k[~flat] = props[~flat].map(_k_of)
        p = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                          "has_k": k.notna().to_numpy(),
                          "k": k.fillna(0).to_numpy("int64")})
        g = p.groupby("event_type", as_index=False)
        out = g.agg(n=("k", "size"), n_with_k=("has_k", "sum"),
                    sum_k=("k", "sum"), min_k=("k", "min"),
                    max_k=("k", "max"))
        out["n_with_k"] = out["n_with_k"].astype("int64")
        return out

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), n_with_k=("n_with_k", "sum"),
            sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
            max_k=("max_k", "max"))

    return hash_grouped_agg(ev, ["event_type"], partial, combine)


def events_funnel(sf_dir: str):
    """Greedy funnel sequence match (view -> click -> purchase): per
    user, the earliest view, then the earliest click strictly after it,
    then the earliest purchase strictly after that; users completing
    all three steps, timestamps as epoch microseconds. Events prune to
    the three step types at the read-side map, hash-route by user, and
    each partition resolves its users' funnels with three vectorized
    groupby-min passes (no per-event Python)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    STEPS = ["view", "click", "purchase"]

    def light(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].isin(STEPS).to_numpy()
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64")[m],
            "event_type": b["event_type"].to_numpy()[m],
            "_us": b["ts"].to_numpy("datetime64[us]").astype("int64")[m]})

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "t_view_us": pd.Series(dtype="int64"),
                              "t_click_us": pd.Series(dtype="int64"),
                              "t_purchase_us": pd.Series(dtype="int64")})
        if not len(p):
            return empty
        t = (p[p["event_type"] == "view"]
             .groupby("user_id", as_index=False)["_us"].min()
             .rename(columns={"_us": "t_view_us"}))
        for step, col, prev in (("click", "t_click_us", "t_view_us"),
                                ("purchase", "t_purchase_us",
                                 "t_click_us")):
            s = p[p["event_type"] == step].merge(t, on="user_id")
            s = s[s["_us"] > s[prev]]
            nxt = (s.groupby("user_id", as_index=False)["_us"].min()
                   .rename(columns={"_us": col}))
            t = t.merge(nxt, on="user_id")
        if not len(t):
            return empty
        return t.astype("int64")

    return hash_grouped_agg(ev.map_batches(light, batch_format="pandas"),
                            ["user_id"], lambda b: b, combine)


def events_cohort_retention(sf_dir: str):
    """Cohort retention triangle: users bucket into their first-active
    day (cohort), and each (cohort_day, day_offset) cell counts the
    DISTINCT users of that cohort active on cohort+offset. One
    user-keyed exchange resolves each user's cohort and per-user
    distinct active days; cell counts combine in a second
    (cohort, offset)-keyed exchange of light count rows."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].to_numpy("datetime64[us]").astype("int64")
               // 86_400_000_000)
        return (pd.DataFrame({"user_id": b["user_id"].to_numpy("int64"),
                              "day": day})
                .drop_duplicates())

    def per_user(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({"cohort_day": pd.Series(dtype="int64"),
                                 "day_offset": pd.Series(dtype="int64"),
                                 "n_users": pd.Series(dtype="int64")})
        p = p.drop_duplicates()
        cohort = p.groupby("user_id")["day"].transform("min")
        cells = pd.DataFrame({"cohort_day": cohort.to_numpy("int64"),
                              "day_offset": (p["day"] - cohort)
                              .to_numpy("int64")})
        return (cells.groupby(["cohort_day", "day_offset"],
                              as_index=False).size()
                .rename(columns={"size": "n_users"})
                .astype({"n_users": "int64"}))

    cells = hash_grouped_agg(
        ev.map_batches(light, batch_format="pandas"),
        ["user_id"], lambda b: b, per_user)

    return hash_grouped_agg(
        cells, ["cohort_day", "day_offset"], lambda b: b,
        lambda p: p.groupby(["cohort_day", "day_offset"],
                            as_index=False)["n_users"].sum())


def user_type_pivot(sf_dir: str):
    """Pivot (crosstab) events into per-user counts of each of the five
    event types as COLUMNS — pure map-side partial crosstabs with a
    declared column set, combined in one user-keyed exchange."""
    from ..stages.agg import hash_grouped_agg

    TYPES = ["click", "error", "purchase", "signup", "view"]
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["user_id", "event_type"]).size()
             .unstack(fill_value=0))
        g = g.reindex(columns=TYPES, fill_value=0).astype("int64")
        g.columns = [f"n_{t}" for t in TYPES]
        return g.reset_index().astype({"user_id": "int64"})

    return hash_grouped_agg(
        ev, ["user_id"], partial,
        lambda p: p.groupby("user_id", as_index=False).sum())


def lineitem_price_histogram(sf_dir: str):
    """Equal-width histogram of l_extendedprice in 100-dollar bins from
    exact integer cents (bin = cents // 10000): one map-side bincount
    partial per batch, one tiny bin-keyed combine — the bin table, not
    the row count, bounds every exchange."""
    from ..stages.agg import hash_grouped_agg

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bins = _cents(b["l_extendedprice"].to_numpy()) // 10_000
        vc = pd.Series(bins).value_counts()
        return pd.DataFrame({"bin": vc.index.to_numpy("int64"),
                             "n": vc.to_numpy("int64")})

    return hash_grouped_agg(
        li, ["bin"], partial,
        lambda p: p.groupby("bin", as_index=False)["n"].sum())


def lineitem_depth_histogram(sf_dir: str):
    """Equi-DEPTH histogram (4 bins, the equal-width twin's complement):
    bin edges are the exact quantile_disc quartiles of integer price
    cents via the distributed-selection quantile (no global sort); bin
    assignment is a broadcast searchsorted map, counts fold through a
    tiny bin-keyed combine. The light cents column materializes once
    because the selection quantile re-scans it (count + sample +
    counting passes) before the counting map."""
    from ..stages.agg import hash_grouped_agg
    from ..stages.sketch import exact_quantiles

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    cents_ds = li.map_batches(
        lambda b: pd.DataFrame(
            {"cents": _cents(b["l_extendedprice"].to_numpy())}),
        batch_format="pandas").materialize()
    qdf = exact_quantiles(cents_ds, "cents", qs=(0.25, 0.5, 0.75))
    edges = qdf.sort_values("q")["value"].to_numpy("int64")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b["cents"].to_numpy("int64")
        vc = pd.Series(np.searchsorted(edges, c, side="left")).value_counts()
        return pd.DataFrame({"bin": vc.index.to_numpy("int64"),
                             "n": vc.to_numpy("int64")})

    return hash_grouped_agg(
        cents_ds, ["bin"], partial,
        lambda p: p.groupby("bin", as_index=False)["n"].sum())


def user_event_signature(sf_dir: str):
    """Ordered collect per key (SQL string_agg ... ORDER BY): each
    user's full behavioral signature as 'type>type>...' in
    (ts, event_id) order, plus its length. One user-keyed exchange; the
    concat is a vectorized per-partition sort + groupby-join."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "event_id": b["event_id"].to_numpy("int64"),
            "_us": b["ts"].to_numpy("datetime64[us]").astype("int64"),
            "event_type": b["event_type"].to_numpy()})

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n_events": pd.Series(dtype="int64"),
                                 "signature": pd.Series(dtype=object)})
        p = p.sort_values(["user_id", "_us", "event_id"],
                          kind="mergesort")
        g = p.groupby("user_id")
        out = g.agg(n_events=("event_type", "size"),
                    signature=("event_type", ">".join))
        return out.reset_index().astype({"user_id": "int64",
                                         "n_events": "int64"})

    return hash_grouped_agg(ev.map_batches(light, batch_format="pandas"),
                            ["user_id"], lambda b: b, combine)


def doc_graph_triangles(sf_dir: str):
    """SQL-checked twin for the distributed triangle counter: edges
    derived arithmetically (ring with step-1 and step-2 chords — every
    consecutive id triple closes a triangle), counted by the REAL
    wedge-check operator (graph.triangle_counts)."""
    from ..stages.graph import triangle_counts

    docs = _read(sf_dir, "documents", ["doc_id"], blocks=_cpus())
    n = docs.count()

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["doc_id"].to_numpy("int64")
        return pd.DataFrame({
            "src": np.concatenate([src, src]),
            "dst": np.concatenate([(src + 1) % n, (src + 2) % n])})

    return triangle_counts(docs.map_batches(edges, batch_format="pandas"))


def events_cube(sf_dir: str):
    """OLAP CUBE over (event_type, day): the rollup's three levels plus
    the day-marginal, all folded from the shared _type_day_fine
    exchange with 'ALL' sentinels."""
    fine = _type_day_fine(sf_dir)

    mid_t = (fine.groupby("event_type", as_index=False)
             [["n", "value_cents"]].sum()
             .assign(day="ALL", lvl=np.int64(1)))
    mid_d = (fine.groupby("day", as_index=False)
             [["n", "value_cents"]].sum()
             .assign(event_type="ALL", lvl=np.int64(2)))
    top = pd.DataFrame({"event_type": ["ALL"], "day": ["ALL"],
                        "n": [fine["n"].sum()],
                        "value_cents": [fine["value_cents"].sum()],
                        "lvl": np.int64(3)})
    fine = fine.assign(lvl=np.int64(0))
    cols = ["event_type", "day", "n", "value_cents", "lvl"]
    out = pd.concat([fine[cols], mid_t[cols], mid_d[cols], top[cols]],
                    ignore_index=True)
    return out.astype({"n": "int64", "value_cents": "int64",
                       "lvl": "int64"})

def events_running_totals_salted(sf_dir: str):
    """The MEGA-KEY-SAFE variant of events_running_totals: same output
    (per-user ordered row_number + cumulative cents), but no partition
    ever holds a user's FULL stream. The stream salts into (user, day)
    time-range buckets; per-bucket sums route by USER for a tiny
    in-partition exclusive prefix (each user's per-day offsets), which
    rejoins the salted buckets via a tagged union so every bucket
    resolves its rows with a LOCAL sort + cumsum + broadcast-free
    offset. A 10^9-event user costs max(bucket) rows per task instead
    of the whole stream — the salted two-phase window aggregate the
    as-of/dedup docstrings reference. Oracle: identical SQL to the
    unsalted query (the implementations must agree bit-for-bit)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    OUT = ["user_id", "event_id", "running_n", "running_value_cents"]

    def light(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy("datetime64[us]").astype("int64")
        eids = b["event_id"].to_numpy("int64")
        if len(eids) and eids.min() < 0:
            raise ValueError("events_running_totals_salted needs "
                             "non-negative event ids (-1 is the "
                             "offset-row sentinel)")
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "event_id": eids,
            "_us": us,
            "_c": _cents(b["value"].to_numpy()),
            "bucket": us // 86_400_000_000})

    lt = ev.map_batches(light, batch_format="pandas").materialize()

    def bucket_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["user_id", "bucket"], as_index=False).agg(
            bn=("_c", "size"), bc=("_c", "sum"))

    def user_offsets(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "bucket": pd.Series(dtype="int64"),
                                 "off_n": pd.Series(dtype="int64"),
                                 "off_c": pd.Series(dtype="int64")})
        s = (p.groupby(["user_id", "bucket"], as_index=False)
             [["bn", "bc"]].sum()
             .sort_values(["user_id", "bucket"], kind="mergesort"))
        g = s.groupby("user_id")
        return pd.DataFrame({
            "user_id": s["user_id"].to_numpy("int64"),
            "bucket": s["bucket"].to_numpy("int64"),
            "off_n": (g["bn"].cumsum() - s["bn"]).to_numpy("int64"),
            "off_c": (g["bc"].cumsum() - s["bc"]).to_numpy("int64")})

    offsets = hash_grouped_agg(
        lt.map_batches(bucket_partial, batch_format="pandas"),
        ["user_id"], lambda b: b, user_offsets)

    # tagged union: offset rows carry event_id = -1 (event ids are >= 0)
    off_rows = offsets.map_batches(
        lambda b: pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "event_id": np.int64(-1),
            "_us": np.int64(0),
            "_c": np.int64(0),
            "bucket": b["bucket"].to_numpy("int64"),
            "off_n": b["off_n"].to_numpy("int64"),
            "off_c": b["off_c"].to_numpy("int64")}),
        batch_format="pandas")
    tagged = lt.map_batches(
        lambda b: b.assign(off_n=np.int64(0), off_c=np.int64(0)),
        batch_format="pandas").union(off_rows)

    def resolve(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in OUT})
        off = (p[p["event_id"] < 0]
               [["user_id", "bucket", "off_n", "off_c"]])
        rows = p[p["event_id"] >= 0].drop(columns=["off_n", "off_c"])
        if not len(rows):
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in OUT})
        m = (rows.merge(off, on=["user_id", "bucket"])
             .sort_values(["user_id", "bucket", "_us", "event_id"],
                          kind="mergesort"))
        g = m.groupby(["user_id", "bucket"])
        return pd.DataFrame({
            "user_id": m["user_id"].to_numpy("int64"),
            "event_id": m["event_id"].to_numpy("int64"),
            "running_n": (m["off_n"] + g.cumcount() + 1)
            .to_numpy("int64"),
            "running_value_cents": (m["off_c"]
                                    + g["_c"].cumsum()).to_numpy("int64"),
        })

    return hash_grouped_agg(tagged, ["user_id", "bucket"],
                            lambda b: b, resolve)


def events_since_purchase(sf_dir: str):
    """Windowed-reset counter: per event, how many events have elapsed
    for this user since their last 'purchase' (NULL-free: events before
    any purchase count from stream start, flagged had_purchase=0). The
    reset segments come from a per-user cumulative purchase count — one
    user-keyed exchange, one vectorized sort + two groupby-cumulatives.
    SQL oracle expresses the same via a window cumsum segment id."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "event_id": b["event_id"].to_numpy("int64"),
            "_us": b["ts"].to_numpy("datetime64[us]").astype("int64"),
            "is_p": (b["event_type"] == "purchase").to_numpy()})

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "event_id": pd.Series(dtype="int64"),
                "since_purchase": pd.Series(dtype="int64"),
                "had_purchase": pd.Series(dtype="int64")})
        p = p.sort_values(["user_id", "_us", "event_id"],
                          kind="mergesort")
        # segment id = cumulative count of purchases INCLUDING this row:
        # a purchase row closes its segment and starts the count over,
        # so its own since_purchase is 0
        seg = p.groupby("user_id")["is_p"].cumsum()
        p = p.assign(_seg=seg)
        since = p.groupby(["user_id", "_seg"]).cumcount().to_numpy("int64")
        # rows in segment > 0 follow at least one purchase... except the
        # purchase row itself, whose segment is its own
        is_p = p["is_p"].to_numpy()
        had = ((p["_seg"].to_numpy("int64") - is_p.astype("int64")) > 0)
        since = np.where(is_p, 0, since)
        return pd.DataFrame({
            "user_id": p["user_id"].to_numpy("int64"),
            "event_id": p["event_id"].to_numpy("int64"),
            "since_purchase": since,
            "had_purchase": had.astype("int64")})

    return hash_grouped_agg(ev.map_batches(light, batch_format="pandas"),
                            ["user_id"], lambda b: b, combine)


def doc_tile_mixture(sf_dir: str):
    """Quality-stratified mixture sample — the curation composite: rank
    docs into per-language NTILE(4) token-count tiles (the count-map
    window exchange), then keep up to 8 docs per (lang, tile) stratum
    by the shared Knuth multiplicative hash (grouped_topk_rows: at most
    k rows per stratum per batch ride the shuffle). One pipeline, both
    new primitives composed; the SQL oracle is the two windows chained."""
    from ..stages.agg import grouped_topk_rows

    tiles = doc_rank_ntile(sf_dir)

    def hashed(b: pd.DataFrame) -> pd.DataFrame:
        from ..stages.corpus import _doc_hash

        b = b[["doc_id", "lang", "tile"]].copy()
        b["hv"] = _doc_hash(b["doc_id"].to_numpy()).astype("int64")
        return b

    return grouped_topk_rows(
        tiles.map_batches(hashed, batch_format="pandas"),
        key=["lang", "tile"], order_cols=["lang", "tile", "hv", "doc_id"],
        k=8)


def lineitem_bloom_semijoin(sf_dir: str):
    """Large-large semijoin with CONSTANT driver state: high-value order
    keys build a Bloom filter as per-batch partial bitmaps (OR-combined
    — commutative, so exactly reproducible at any partitioning; driver
    holds m/8 bytes, never the key set), lineitem prefilters map-side
    against the broadcast bitmap (no false negatives), and one tagged
    key exchange removes the false positives EXACTLY. Same answer as a
    plain semijoin (the SQL oracle) — this is the shape for joins whose
    build side outgrows a broadcastable key array."""
    import ray

    from ..stages.agg import hash_grouped_agg
    from ..state.bloom import bloom_build_bits, bloom_probe_bits

    M_BITS, K = 1 << 22, 4
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    hv = orders.map_batches(
        lambda b: b.loc[b["o_totalprice"] >= 300_000.0, ["o_orderkey"]],
        batch_format="pandas").materialize()

    def bits_partial(b: pd.DataFrame) -> pd.DataFrame:
        w = bloom_build_bits(b["o_orderkey"].to_numpy("int64"), M_BITS, K)
        return pd.DataFrame({"words": [w]})

    def or_fold(b: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(M_BITS // 64, dtype=np.uint64)
        for w in b["words"]:
            acc |= np.asarray(w, dtype=np.uint64)
        return pd.DataFrame({"words": [acc]})

    # per-block partial bitmaps OR-fold DISTRIBUTEDLY down to a handful
    # of rows before the driver touches them — driver memory stays
    # O(m/8), not O(num_batches * m/8)
    parts = (hv.map_batches(bits_partial, batch_format="pandas",
                            batch_size=None)
             .repartition(4)
             .map_batches(or_fold, batch_format="pandas",
                          batch_size=None)
             .to_pandas())
    # final driver fold reuses the same or_fold definition (<= 4 rows)
    words = np.asarray(or_fold(parts)["words"].iloc[0], dtype=np.uint64)
    bits_ref = ray.put(words)

    def prefilter(b: pd.DataFrame) -> pd.DataFrame:
        keys = b["l_orderkey"].to_numpy("int64")
        hit = bloom_probe_bits(keys, ray.get(bits_ref), K)
        b = b[hit]
        p = pd.DataFrame({
            "key": b["l_orderkey"].to_numpy("int64"),
            "n_items": np.int64(1),
            "rev_cents": _cents((b["l_extendedprice"]
                                 * (1 - b["l_discount"])).to_numpy()),
            "is_key": np.int64(0)})
        return p.groupby("key", as_index=False).sum()

    markers = hv.map_batches(
        lambda b: pd.DataFrame({"key": b["o_orderkey"].to_numpy("int64"),
                                "n_items": np.int64(0),
                                "rev_cents": np.int64(0),
                                "is_key": np.int64(1)}),
        batch_format="pandas")

    def verify(p: pd.DataFrame) -> pd.DataFrame:
        s = p.groupby("key", as_index=False).sum()
        s = s[(s["is_key"] >= 1) & (s["n_items"] >= 1)]  # exact: fps die
        return (s[["key", "n_items", "rev_cents"]]
                .rename(columns={"key": "o_orderkey"}).astype("int64"))

    return hash_grouped_agg(
        li.map_batches(prefilter, batch_format="pandas").union(markers),
        ["key"], lambda b: b, verify)


def events_daily_top_users(sf_dir: str):
    """Trending top-k per window: each day's 5 most active users
    (count DESC, user ASC tie-break). Per-batch partial (day, user)
    counts combine exactly in one exchange; only each partition's local
    top rows would need to ship at the next level — here the per-day
    winner selection happens in the same combine because the exchange
    is keyed by DAY, so a partition owns its days outright."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame({"day": b["ts"].dt.strftime("%Y-%m-%d"),
                          "user_id": b["user_id"].to_numpy("int64")})
        return (p.groupby(["day", "user_id"], as_index=False).size()
                .rename(columns={"size": "n_events"}))

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        s = p.groupby(["day", "user_id"], as_index=False)["n_events"].sum()
        s = s.sort_values(["day", "n_events", "user_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        top = s.groupby("day").head(5).copy()
        top["rnk"] = top.groupby("day").cumcount().to_numpy("int64") + 1
        return top.astype({"n_events": "int64", "rnk": "int64"})

    return hash_grouped_agg(ev, ["day"], partial, combine)


def doc_split_assignment(sf_dir: str):
    """Deterministic train/val/test split — the reproducible way every
    training pipeline partitions a corpus: bucket = Knuth hash % 100,
    train <90, val <95, test otherwise; returns per (lang, split)
    counts + token mass so mixture ratios are auditable. Pure map-side
    partials + one tiny exchange; the same doc lands in the same split
    at any partitioning (asserted by the SQL oracle)."""
    from ..stages.agg import hash_grouped_agg
    from ..stages.selection import _tokenize

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"],
                 blocks=_cpus())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from ..stages.corpus import _doc_hash

        bucket = _doc_hash(b["doc_id"].to_numpy()).astype("int64") % 100
        split = np.where(bucket < 90, "train",
                         np.where(bucket < 95, "val", "test"))
        p = pd.DataFrame({
            "lang": b["lang"].to_numpy(), "split": split,
            "n_tokens": _tokenize(b["text"]).str.len().to_numpy("int64")})
        return p.groupby(["lang", "split"], as_index=False).agg(
            n_docs=("n_tokens", "size"), total_tokens=("n_tokens", "sum"))

    return hash_grouped_agg(
        docs, ["lang", "split"], partial,
        lambda p: p.groupby(["lang", "split"], as_index=False)
        [["n_docs", "total_tokens"]].sum())


def events_daily_deltas(sf_dir: str):
    """Day-over-day time-series deltas: per day, event count + exact
    value cents and their changes vs the previous CALENDAR day (gaps
    break the chain — prev must be day-1, as LAG over a dense series).
    The heavy pass is one distributed day-keyed sum; the delta fold
    runs on the time-range-bounded series (days, not rows)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].to_numpy("datetime64[us]").astype("int64")
               // 86_400_000_000)
        p = pd.DataFrame({"day": day, "_c": _cents(b["value"].to_numpy())})
        return p.groupby("day", as_index=False).agg(
            n=("_c", "size"), value_cents=("_c", "sum"))

    s = hash_grouped_agg(
        ev, ["day"], partial,
        lambda p: p.groupby("day", as_index=False)
        [["n", "value_cents"]].sum(),
    ).to_pandas().sort_values("day").reset_index(drop=True)

    prev_day = s["day"].shift(1)
    contiguous = (s["day"] - prev_day) == 1
    s["delta_n"] = np.where(contiguous, s["n"] - s["n"].shift(1), 0)
    s["delta_cents"] = np.where(
        contiguous, s["value_cents"] - s["value_cents"].shift(1), 0)
    s["has_prev"] = contiguous.fillna(False).astype("int64")
    return s.astype({"day": "int64", "n": "int64", "value_cents": "int64",
                     "delta_n": "int64", "delta_cents": "int64",
                     "has_prev": "int64"})


def f1_media_budget_take(sf_dir: str):
    """Interleaved media-budget corpus cut: walk the F1 doc line in id
    order and keep docs while the EXCLUSIVE running media-span count
    stays under 400 — the deterministic "fill the media budget" slice a
    multimodal dataloader takes per epoch. Per-doc media counts come
    from the same arithmetic span synthesis the other f1_*_docs oracles
    use (n_media = ceil(words/20) // 2); the cut is the distributed
    prefix-sum primitive (selection.prefix_take — bucket sums ride the
    only exchange, the cut is map-side)."""
    from ..stages.selection import prefix_take

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())

    def media_counts(b: pd.DataFrame) -> pd.DataFrame:
        nw = (b["text"].fillna("").str.split().str.len()
              .to_numpy("int64"))
        n_text = (nw + 19) // 20
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy("int64"),
                             "n_media": n_text // 2})

    out = prefix_take(docs.map_batches(media_counts,
                                       batch_format="pandas"),
                      budget=400, weight_col="n_media", bucket_width=64)
    return out.map_batches(
        lambda b: b.rename(columns={"prefix_w": "media_off"}),
        batch_format="pandas")


def user_value_trend(sf_dir: str):
    """Per-user least-squares trend of event value over time (is this
    user's spend rising?): slope from EXACT int64 sufficient statistics
    (x = seconds since 2024-01-01, y = value cents), one map-side
    partial + one user-keyed combine; the slope mirrors the SQL DOUBLE
    expression token-for-token. The 2024 epoch offset is load-bearing
    for the bit-match: with x ~ 2.6e6 every sufficient statistic stays
    under 2^53 (exactly double-representable, so int->double conversion
    rounds nothing), whereas epoch-seconds sums exceed int64 and
    DuckDB's HUGEINT->DOUBLE cast is NOT correctly rounded (measured:
    differs from Python's exact-int conversion in the 10th digit)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = ((b["ts"].to_numpy("datetime64[us]").astype("int64")
              - EPOCH_2024_US) // 1_000_000)
        y = _cents(b["value"].to_numpy())
        p = pd.DataFrame({"user_id": b["user_id"].to_numpy("int64"),
                          "n": np.int64(1), "sx": x, "sy": y,
                          # plain int64 is safe: the 2^53 double-
                          # exactness bound the ORACLE needs (see
                          # docstring) is ~1000x TIGHTER than int64, so
                          # any input this query is correct on at all
                          # (rebased x^2 sums < 2^53) is far inside
                          # int64 — no object-dtype arithmetic needed
                          "sxy": x * y,
                          "sxx": x * x})
        return p.groupby("user_id", as_index=False).sum()

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        s = p.groupby("user_id", as_index=False).sum()
        # vectorized float mirror (same IEEE ops as the SQL expression)
        n = s["n"].to_numpy("int64").astype("float64")
        sx = s["sx"].to_numpy("int64").astype("float64")
        den = n * s["sxx"].to_numpy("int64").astype("float64") - sx * sx
        num = (n * s["sxy"].to_numpy("int64").astype("float64")
               - sx * s["sy"].to_numpy("int64").astype("float64"))
        keep = den != 0.0
        s = s[keep].reset_index(drop=True)
        return pd.DataFrame({
            "user_id": s["user_id"].to_numpy("int64"),
            "n": s["n"].to_numpy("int64"),
            "slope_cents_per_sec": (num[keep] / den[keep])
            .astype(np.float64)})

    return hash_grouped_agg(ev, ["user_id"], partial, combine)


def event_value_mad(sf_dir: str):
    """Robust per-type outlier scale: median absolute deviation of
    value cents (quantile_disc rank semantics, exact ints). Two passes
    of the count-map grouped-quantile exchange — medians first, then
    |x - median| medians with the per-type medians broadcast — so the
    value multiset never rides an exchange and the driver only ever
    sees the (type, median) table."""
    import ray

    from ..stages.sketch import grouped_value_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                             "c": _cents(b["value"].to_numpy())})

    lt = ev.map_batches(cents, batch_format="pandas").materialize()

    med = grouped_value_quantiles(lt, "event_type", "c", qs=(0.5,)) \
        .to_pandas()
    med_ref = ray.put(pd.Series(med["value"].to_numpy("int64"),
                                index=med["event_type"]))

    def absdev(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].map(ray.get(med_ref)).to_numpy("int64")
        return pd.DataFrame({
            "event_type": b["event_type"].to_numpy(),
            "d": np.abs(b["c"].to_numpy("int64") - m)})

    mad = (grouped_value_quantiles(
        lt.map_batches(absdev, batch_format="pandas"),
        "event_type", "d", qs=(0.5,))
        .to_pandas().rename(columns={"value": "mad_cents"}))
    out = med.rename(columns={"value": "median_cents"}) \
        .merge(mad[["event_type", "mad_cents"]], on="event_type")
    return out[["event_type", "median_cents", "mad_cents"]].astype(
        {"median_cents": "int64", "mad_cents": "int64"})


def doc_fuzzy_title_pairs(sf_dir: str):
    """Fuzzy title join: doc pairs whose 16-char lowercased text prefix
    is within Levenshtein distance 1, via recall-complete FastSS
    deletion-neighborhood candidates + exact banded verify
    (dedup.edit1_pairs); oracle is DuckDB's native levenshtein over the
    self-join."""
    from ..stages.dedup import edit1_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"], blocks=_cpus())
    return edit1_pairs(docs, prefix_len=16)


def events_rolling_sum(sf_dir: str):
    """BOUNDED window frame (ROWS 2 PRECEDING .. CURRENT): per event,
    the rolling count and exact cents sum of the user's last <= 3
    events in (ts, event_id) order — the moving-average frame family,
    complementing the unbounded running totals. One user-keyed
    exchange; the frame resolves as a vectorized cumsum difference
    (cs[i] - cs[i-3]) per partition, never a per-row loop."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def rolling_part(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "event_id": pd.Series(dtype="int64"),
            "w_n": pd.Series(dtype="int64"),
            "w_cents": pd.Series(dtype="int64")})
        if not len(part):
            return empty
        p = part.sort_values(["user_id", "ts", "event_id"],
                             kind="mergesort")
        c = _cents(p["value"].to_numpy())
        g = p.groupby("user_id")
        rank = g.cumcount().to_numpy("int64")
        # per-user cumsum, then frame sum = cs[i] - cs[i-3]; rows of one
        # user are contiguous after the sort, so rank >= 3 guarantees
        # index i-3 is the same user's row
        csum = (pd.Series(c).groupby(p["user_id"].to_numpy())
                .cumsum().to_numpy("int64"))
        lag3 = np.zeros(len(p), dtype=np.int64)
        m = rank >= 3
        lag3[m] = csum[np.flatnonzero(m) - 3]
        return pd.DataFrame({
            "user_id": p["user_id"].to_numpy("int64"),
            "event_id": p["event_id"].to_numpy("int64"),
            "w_n": np.minimum(rank + 1, 3),
            "w_cents": csum - lag3})

    return hash_grouped_agg(ev, ["user_id"], lambda b: b, rolling_part)


def events_table_profile(sf_dir: str):
    """Schema-agnostic dataset profiler: per-column row / null / EXACT
    distinct counts over events (reference admin stats telemetry,
    crawler/internal/api/stats.go, generalized to any table). Null/row
    counts ride as one count row per column per batch; exact distincts
    ship locally-deduped (col, value) string rows through one hash
    exchange — the COUNT(DISTINCT) lower bound — and the driver sees
    only (#columns x #partitions) count rows."""
    from ..stages.profile import profile_table

    ev = _read(sf_dir, "events")
    return profile_table(
        ev, ["event_id", "ts", "user_id", "event_type", "value", "props"])


def events_interval_islands(sf_dir: str):
    """Gaps-and-islands interval merge: each event opens a 30-minute
    activity interval; per user, overlapping-or-touching intervals merge
    into islands. Output (user_id, n_islands, covered_us) — island count
    and total covered microseconds as exact ints. One user-keyed
    exchange; island detection is a vectorized running-max break scan
    per partition (no per-row loop), the same shape the tumbling/
    sessionize family uses (§2.9 streaming semantics as batch-over-log)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    span_us = np.int64(30 * 60 * 1_000_000)

    def islands(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "n_islands": pd.Series(dtype="int64"),
            "covered_us": pd.Series(dtype="int64")})
        if not len(part):
            return empty
        p = part.sort_values(["user_id", "ts"], kind="mergesort")
        uid = p["user_id"].to_numpy("int64")
        s = p["ts"].to_numpy("datetime64[us]").astype("int64")
        e = s + span_us
        # per-user running max of interval ends: rows of one user are
        # contiguous after the sort, so a groupwise cummax cannot leak
        # a previous user's open interval across the boundary
        seg_id = np.cumsum(np.concatenate([[0], uid[1:] != uid[:-1]]))
        cme = pd.Series(e).groupby(seg_id).cummax().to_numpy()
        brk = np.ones(len(s), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (s[1:] > cme[:-1])
        island = np.cumsum(brk) - 1
        isl = pd.DataFrame({"user_id": uid, "island": island,
                            "s": s, "e": e}) \
            .groupby(["user_id", "island"], as_index=False) \
            .agg(s0=("s", "min"), e1=("e", "max"))
        out = isl.assign(dur=isl["e1"] - isl["s0"]) \
            .groupby("user_id", as_index=False) \
            .agg(n_islands=("dur", "size"), covered_us=("dur", "sum"))
        out["n_islands"] = out["n_islands"].astype("int64")
        out["covered_us"] = out["covered_us"].astype("int64")
        return out

    return hash_grouped_agg(ev, ["user_id"], lambda b: b, islands)


def events_iqr_outliers(sf_dir: str):
    """Tukey-fence outlier screen per event type: exact per-type
    Q1/Q3 of value cents via the count-map grouped-quantile exchange
    (quantile_disc rank semantics), then one streaming count pass with
    the tiny (type, q1, q3) table broadcast. All-integer fences (2v vs
    2q -/+ 3*IQR) keep the oracle hash exact. The data-quality
    anomaly-screen family: what a curation pipeline runs before
    trusting a value column at 100 TB."""
    from ..stages.agg import hash_grouped_agg
    from ..stages.sketch import grouped_value_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def cents_col(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"],
                             "v": _cents(b["value"].to_numpy())})

    cv = ev.map_batches(cents_col, batch_format="pandas")
    qt = grouped_value_quantiles(cv, "event_type", "v",
                                 qs=(0.25, 0.75)).to_pandas()
    piv = qt.pivot(index="event_type", columns="q", values="value")
    fences = {t: (int(r[0.25]), int(r[0.75]))
              for t, r in piv.iterrows()}
    fref = ray.put(fences)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(fref)
        b = cents_col(b)
        q1 = b["event_type"].map(lambda t: f[t][0]).to_numpy("int64")
        q3 = b["event_type"].map(lambda t: f[t][1]).to_numpy("int64")
        iqr3 = 3 * (q3 - q1)
        v2 = 2 * b["v"].to_numpy("int64")
        out = (v2 < 2 * q1 - iqr3) | (v2 > 2 * q3 + iqr3)
        return pd.DataFrame({"event_type": b["event_type"],
                             "n": np.int64(1),
                             "n_outliers": out.astype(np.int64)}) \
            .groupby("event_type", as_index=False).sum()

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("event_type", as_index=False)[
            ["n", "n_outliers"]].sum()

    res = hash_grouped_agg(ev, ["event_type"], partial, combine,
                           num_partitions=4).to_pandas()
    res["q1"] = res["event_type"].map(lambda t: fences[t][0]).astype("int64")
    res["q3"] = res["event_type"].map(lambda t: fences[t][1]).astype("int64")
    res["n"] = res["n"].astype("int64")
    res["n_outliers"] = res["n_outliers"].astype("int64")
    return res.sort_values("event_type").reset_index(drop=True)


def doc_graph_bfs(sf_dir: str):
    """SQL-checked twin for the distributed bounded-BFS operator
    (crawl-radius / reachability family): edges derived arithmetically
    from documents (two out-edges per node, (id*7+3) % N and
    (id*3+11) % N — branching, reproducible in SQL), seeds = ids
    divisible by 97, min hop <= 4 per reached node via the two-
    exchange-per-hop frontier expansion; oracle is a bounded recursive
    CTE."""
    from ..stages.graph import bfs_hops

    docs = _read(sf_dir, "documents", ["doc_id"], blocks=_cpus())
    n = docs.count()

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = np.repeat(b["doc_id"].to_numpy("int64"), 2)
        dst = src.copy()
        dst[0::2] = (dst[0::2] * 7 + 3) % n
        dst[1::2] = (dst[1::2] * 3 + 11) % n
        return pd.DataFrame({"src": src, "dst": dst})

    def seed_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy("int64")
        return pd.DataFrame({"node": ids[ids % 97 == 0]})

    seeds = docs.map_batches(seed_rows, batch_format="pandas")
    out = bfs_hops(docs.map_batches(edges, batch_format="pandas"),
                   seeds, max_hops=4)
    return out.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].to_numpy("int64"),
                                "hop": b["hop"].to_numpy("int64")}),
        batch_format="pandas")


def events_cdc_state(sf_dir: str):
    """Change-data-capture merge with tombstones: the events log is a
    changelog keyed by user_id — cents divisible by 10 is a DELETE, any
    other value an UPSERT; last writer wins by (ts, event_id). Output
    is the merged final state (user_id, last_cents), deleted keys
    absent. The §2.7 upsert-merge family extended with deletes: the
    per-batch partial keeps ONE newest row per key (last-writer-wins is
    associative), so only |keys-per-batch| rows ride the exchange and
    the tombstone filter runs after the per-key combine."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def newest(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        b = b.drop_duplicates("user_id", keep="last")
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "ts": b["ts"],
            "event_id": b["event_id"].to_numpy("int64"),
            "c": _cents(b["value"].to_numpy())})

    def merge_filter(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        p = p.drop_duplicates("user_id", keep="last")
        live = p[p["c"] % 10 != 0]
        return pd.DataFrame({
            "user_id": live["user_id"].to_numpy("int64"),
            "last_cents": live["c"].to_numpy("int64")})

    return hash_grouped_agg(
        ev.map_batches(newest, batch_format="pandas"),
        ["user_id"], lambda b: b, merge_filter)


def events_winsorized_sum(sf_dir: str):
    """Winsorized (clipped-tail) robust aggregate per event type: exact
    P10/P90 of value cents via the count-map grouped-quantile exchange,
    then one streaming pass clips each value into [p10, p90] and sums —
    the robust-mean path a reward/score column gets before mixture
    weighting, where a single corrupt value would otherwise dominate
    the sum. All-integer output (clipped sum, clipped-row count, n)."""
    from ..stages.agg import hash_grouped_agg
    from ..stages.sketch import grouped_value_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def cents_col(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"],
                             "v": _cents(b["value"].to_numpy())})

    cv = ev.map_batches(cents_col, batch_format="pandas")
    qt = grouped_value_quantiles(cv, "event_type", "v",
                                 qs=(0.10, 0.90)).to_pandas()
    piv = qt.pivot(index="event_type", columns="q", values="value")
    bounds = {t: (int(r[0.10]), int(r[0.90])) for t, r in piv.iterrows()}
    bref = ray.put(bounds)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(bref)
        b = cents_col(b)
        lo = b["event_type"].map(lambda t: f[t][0]).to_numpy("int64")
        hi = b["event_type"].map(lambda t: f[t][1]).to_numpy("int64")
        v = b["v"].to_numpy("int64")
        clip = np.clip(v, lo, hi)
        return pd.DataFrame({
            "event_type": b["event_type"],
            "winsorized_cents": clip,
            "n_clipped": (v != clip).astype(np.int64),
            "n": np.int64(1)}) \
            .groupby("event_type", as_index=False).sum()

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("event_type", as_index=False)[
            ["winsorized_cents", "n_clipped", "n"]].sum()

    res = hash_grouped_agg(ev, ["event_type"], partial, combine,
                           num_partitions=4).to_pandas()
    for c in ("winsorized_cents", "n_clipped", "n"):
        res[c] = res[c].astype("int64")
    return res.sort_values("event_type").reset_index(drop=True)


def events_segment_venn(sf_dir: str):
    """Audience-overlap Venn counts: per user a 3-bit membership mask
    over (view, click, purchase), then exact user counts per non-empty
    mask — the segment-overlap report (which dedup/routing segments
    intersect and by how much). The per-batch partial ORs one mask row
    per user (associative), so the user exchange carries <= 1 tiny int
    row per user per batch and the 7-row mask rollup is a second,
    trivially small combine."""
    from ..stages.agg import hash_grouped_agg

    SEGS = ("view", "click", "purchase")
    cutoff = pd.Timestamp("2024-01-02")  # day-1 cohort: sparse masks
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def mask_partial(b: pd.DataFrame) -> pd.DataFrame:
        # OR == per-bit max, so the per-user OR is one vectorized
        # groupby-max over 3 indicator columns (no per-group lambda)
        b = b[b["ts"] < cutoff]
        et = b["event_type"].to_numpy()
        d = pd.DataFrame({"user_id": b["user_id"].to_numpy("int64")})
        for i, s in enumerate(SEGS):
            d[f"b{i}"] = (et == s).astype(np.int64)
        return d.groupby("user_id", as_index=False).max()

    def mask_combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("user_id", as_index=False).max()
        mask = (g["b0"].to_numpy("int64")
                | (g["b1"].to_numpy("int64") << 1)
                | (g["b2"].to_numpy("int64") << 2))
        vc = pd.Series(mask[mask > 0]).value_counts()
        return pd.DataFrame({"mask": vc.index.to_numpy("int64"),
                             "n_users": vc.to_numpy("int64")})

    masks = hash_grouped_agg(ev, ["user_id"], mask_partial,
                             mask_combine).to_pandas()
    out = masks.groupby("mask", as_index=False)["n_users"].sum()
    m = out["mask"].to_numpy("int64")
    return pd.DataFrame({
        "has_view": (m & 1).astype("int64"),
        "has_click": ((m >> 1) & 1).astype("int64"),
        "has_purchase": ((m >> 2) & 1).astype("int64"),
        "n_users": out["n_users"].to_numpy("int64"),
    }).sort_values(["has_view", "has_click", "has_purchase"]) \
      .reset_index(drop=True)


def events_markov_transitions(sf_dir: str):
    """Ordered event-sequence transition counts (first-order Markov
    mining — the user-journey matrix behind next-action models): per
    user, each event pairs with that user's NEXT event by (ts,
    event_id); output is the exact count per (prev_type, next_type)
    plus the per-prev row total n_from (the transition-probability
    denominator, kept as exact ints so the hash compare is bit-stable).
    One user-keyed exchange resolves every adjacency (a user's events
    may span read batches, so adjacency is only decidable once the
    whole user is co-located), emitting at most T^2 light count rows
    per partition; those fold through a tiny prev-keyed second exchange
    where the denominator is a vectorized transform-sum."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "event_id": b["event_id"].to_numpy("int64"),
            "_us": b["ts"].to_numpy("datetime64[us]").astype("int64"),
            "event_type": b["event_type"].to_numpy()})

    def adjacency(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({"prev_type": pd.Series(dtype=object),
                                 "next_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        p = p.sort_values(["user_id", "_us", "event_id"],
                          kind="mergesort")
        uid = p["user_id"].to_numpy("int64")
        et = p["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]  # adjacent rows of the SAME user
        out = (pd.DataFrame({"prev_type": et[:-1][same],
                             "next_type": et[1:][same]})
               .groupby(["prev_type", "next_type"]).size()
               .reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    pairs = hash_grouped_agg(
        ev.map_batches(light, batch_format="pandas"),
        ["user_id"], lambda b: b, adjacency)

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({
                "prev_type": pd.Series(dtype=object),
                "next_type": pd.Series(dtype=object),
                "n_transitions": pd.Series(dtype="int64"),
                "n_from": pd.Series(dtype="int64")})
        g = p.groupby(["prev_type", "next_type"], as_index=False)["n"] \
             .sum()
        g["n_transitions"] = g["n"].astype("int64")
        g["n_from"] = g.groupby("prev_type")["n_transitions"] \
                       .transform("sum").astype("int64")
        return g[["prev_type", "next_type", "n_transitions", "n_from"]]

    return hash_grouped_agg(pairs, ["prev_type"], lambda b: b, fold,
                            num_partitions=4)


def events_value_mode(sf_dir: str):
    """Exact grouped MODE (most frequent integer-cents value per event
    type, smallest-value tie-break) via the count-map exchange: the
    per-batch partial pre-counts (type, cents, n) rows — the shuffle
    carries the type x distinct-cents map, never raw rows — and the
    per-type combine sums the maps and argmaxes (n DESC, cents ASC).
    The exact sibling of the Misra-Gries heavy-hitter sketch."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                          "cents": _cents(b["value"].to_numpy())})
        out = d.groupby(["event_type", "cents"]).size() \
               .reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "mode_cents": pd.Series(dtype="int64"),
                                 "n_mode": pd.Series(dtype="int64")})
        g = p.groupby(["event_type", "cents"], as_index=False)["n"].sum()
        g = g.sort_values(["event_type", "n", "cents"],
                          ascending=[True, False, True],
                          kind="mergesort")
        top = g.drop_duplicates("event_type", keep="first")
        return pd.DataFrame({
            "event_type": top["event_type"].to_numpy(),
            "mode_cents": top["cents"].to_numpy("int64"),
            "n_mode": top["n"].to_numpy("int64")})

    return hash_grouped_agg(ev, ["event_type"], partial, combine,
                            num_partitions=4)


def events_rolling_active(sf_dir: str):
    """Rolling 7-day distinct active users per observed day (the
    WAU-style engagement series). Distinct-over-a-sliding-window does
    NOT pre-aggregate like sums do, so the exchange plan is: (1) a
    user-keyed exchange dedups (user, day) exactly (per-batch dedup
    caps what rides the shuffle at one row per user-day per batch),
    (2) each user-day expands to the 7 trailing windows it belongs to
    — light (window_day, user) rows — unioned with one marker row per
    OBSERVED day so windows landing in calendar gaps are dropped, and
    (3) a window-keyed exchange dedups (window, user) and counts.
    Nothing wider than user-day rows is ever shuffled."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].to_numpy("datetime64[us]").astype("int64")
               // 86_400_000_000)
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "day": day}).drop_duplicates()

    user_days = hash_grouped_agg(
        ev.map_batches(light, batch_format="pandas"),
        ["user_id"], lambda b: b, lambda p: p.drop_duplicates())

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"wday": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "is_obs": pd.Series(dtype="int64")})
        day = b["day"].to_numpy("int64")
        uid = b["user_id"].to_numpy("int64")
        # membership rows: user-day (d, u) is inside windows d..d+6
        wday = np.repeat(day, 7) + np.tile(np.arange(7, dtype=np.int64),
                                           len(day))
        ex = pd.DataFrame({"wday": wday, "user_id": np.repeat(uid, 7),
                           "is_obs": np.int64(0)})
        # marker rows: these days were actually observed
        obs = pd.DataFrame({"wday": np.unique(day),
                            "user_id": np.int64(-1),
                            "is_obs": np.int64(1)})
        return pd.concat([ex, obs], ignore_index=True)

    expanded = user_days.map_batches(expand, batch_format="pandas")

    def count_windows(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({"day": pd.Series(dtype="int64"),
                                 "n_users_7d": pd.Series(dtype="int64")})
        obs_days = p.loc[p["is_obs"] == 1, "wday"].unique()
        m = p[(p["is_obs"] == 0) & p["wday"].isin(obs_days)]
        cnt = (m.drop_duplicates(["wday", "user_id"])
                .groupby("wday").size())
        return pd.DataFrame({"day": cnt.index.to_numpy("int64"),
                             "n_users_7d": cnt.to_numpy("int64")})

    return hash_grouped_agg(expanded, ["wday"], lambda b: b,
                            count_windows)


def events_first_touch(sf_dir: str):
    """First-touch attribution: each view converts to that user's NEXT
    purchase within 7 days (forward as-of with tolerance), and each
    converting purchase is credited to its EARLIEST attributed view
    plus the touch count — the marketing-attribution join. Purchases
    are keyed by (user, purchase time) so timestamp ties collapse
    identically in pipeline and oracle. One user-keyed exchange of
    light (user, ts, kind) rows; the per-partition resolve is a single
    sorted pandas merge_asof (vectorized, no per-user loop) followed by
    a groupby min/count."""
    from ..stages.agg import hash_grouped_agg

    TOL_US = 7 * 86_400_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].isin(["view", "purchase"])
        b = b[m]
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "tsu": b["ts"].to_numpy("datetime64[us]").astype("int64"),
            "is_p": (b["event_type"] == "purchase").to_numpy()})

    def resolve(p: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "purchase_us": pd.Series(dtype="int64"),
            "first_touch_us": pd.Series(dtype="int64"),
            "n_touches": pd.Series(dtype="int64")})
        if not len(p):
            return empty
        views = p[~p["is_p"]].sort_values("tsu", kind="mergesort")
        buys = (p[p["is_p"]][["user_id", "tsu"]]
                .drop_duplicates()  # tie purchases collapse to one row
                .sort_values("tsu", kind="mergesort")
                .rename(columns={"tsu": "purchase_us"}))
        if not len(views) or not len(buys):
            return empty
        att = pd.merge_asof(
            views[["user_id", "tsu"]], buys,
            left_on="tsu", right_on="purchase_us", by="user_id",
            direction="forward", tolerance=TOL_US)
        att = att.dropna(subset=["purchase_us"])
        if not len(att):
            return empty
        g = att.groupby(["user_id", "purchase_us"], as_index=False).agg(
            first_touch_us=("tsu", "min"), n_touches=("tsu", "size"))
        for c in ("user_id", "purchase_us", "first_touch_us",
                  "n_touches"):
            g[c] = g[c].astype("int64")
        return g

    return hash_grouped_agg(
        ev.map_batches(light, batch_format="pandas"),
        ["user_id"], lambda b: b, resolve)


def _moments_combine(p: pd.DataFrame, key: str = "event_type",
                     suffix: str = "_hour") -> pd.DataFrame:
    """Population mean/std/skewness/excess-kurtosis per key from exact
    int64 raw-moment partials (n, s1..s4). Pure (property-tested vs a
    direct numpy reference); the float expressions mirror the SQL oracle
    token-for-token."""
    s = p.groupby(key, as_index=False).sum()
    n = s["n"].to_numpy("int64").astype("float64")
    m1 = s["s1"].to_numpy("int64").astype("float64") / n
    r2 = s["s2"].to_numpy("int64").astype("float64") / n
    r3 = s["s3"].to_numpy("int64").astype("float64") / n
    r4 = s["s4"].to_numpy("int64").astype("float64") / n
    m2 = r2 - m1 * m1
    # zero-variance groups divide by zero where SQL HAVING drops them
    keep = m2 > 0.0
    s, n, m1, r2, r3, r4, m2 = (x[keep] for x in
                                (s.reset_index(drop=True), n, m1,
                                 r2, r3, r4, m2))
    skew = (r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1) / (m2 * np.sqrt(m2))
    kurt = ((r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
             - 3.0 * m1 * m1 * m1 * m1) / (m2 * m2) - 3.0)
    return pd.DataFrame({
        key: s[key].to_numpy(dtype=object),
        "n": s["n"].to_numpy("int64"),
        f"mean{suffix}": m1, f"std{suffix}": np.sqrt(m2),
        f"skew{suffix}": skew, f"kurt{suffix}": kurt})


def events_hour_moments(sf_dir: str):
    """Per-event-type diurnal shape: population mean/std/skewness/excess
    kurtosis of the event's hour-of-day from EXACT int64 raw-moment sums
    (h..h^4 with h in 0..23, so every sufficient statistic stays far
    under 2^53 and the int->DOUBLE casts round nothing on either side).
    One map-side partial + one type-keyed combine; the float expressions
    mirror the SQL token-for-token (x^1.5 is spelled x*sqrt(x) on both
    sides — sqrt is IEEE correctly-rounded, pow is not)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy("datetime64[us]").astype("int64")
        h = (us % 86_400_000_000) // 3_600_000_000
        p = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                          "n": np.int64(1), "s1": h, "s2": h * h,
                          "s3": h * h * h, "s4": h * h * h * h})
        return p.groupby("event_type", as_index=False).sum()

    return hash_grouped_agg(ev, ["event_type"], partial, _moments_combine)


def _streaks_combine(p: pd.DataFrame) -> pd.DataFrame:
    """Gaps-and-islands over (user_id, day) rows (dups allowed): longest
    consecutive-day run + distinct active days per user. Pure
    (property-tested vs a per-user python reference)."""
    d = p.drop_duplicates().sort_values(["user_id", "day"],
                                        kind="mergesort")
    if not len(d):
        return pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "n_active_days": pd.Series(dtype="int64"),
            "max_streak": pd.Series(dtype="int64")})
    rank = d.groupby("user_id").cumcount().to_numpy("int64")
    runs = pd.DataFrame({
        "user_id": d["user_id"].to_numpy("int64"),
        "anchor": d["day"].to_numpy("int64") - rank,
        "c": np.int64(1),
    }).groupby(["user_id", "anchor"], as_index=False)["c"].sum()
    out = (runs.groupby("user_id")
           .agg(n_active_days=("c", "sum"), max_streak=("c", "max"))
           .reset_index())
    return out.astype({"user_id": "int64", "n_active_days": "int64",
                       "max_streak": "int64"})


def events_user_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user (gaps-and-islands
    over the distinct user-day grid): per-batch dedup bounds the exchange
    at one light (user, day) row per batch, a user-keyed combine dedups
    exactly, and the classic day-minus-rank anchor groups consecutive
    runs — one vectorized cumcount over the sorted partition, no per-user
    loop. Integer-only output."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].to_numpy("datetime64[us]").astype("int64")
               // 86_400_000_000)
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "day": day}).drop_duplicates()

    return hash_grouped_agg(
        ev.map_batches(light, batch_format="pandas"),
        ["user_id"], lambda b: b, _streaks_combine)


def events_type_gini(sf_dir: str):
    """Per-user behavioral diversity: Gini impurity 1 - sum((c_t/n)^2) of
    the user's event-type mix, plus the type count. Gini rather than
    Shannon entropy because impurity needs only exact-int sums and one
    correctly-rounded division (the DOUBLE hash-matches the oracle);
    entropy's log is not correctly rounded across engines. Per-batch
    (user, type) count partials + one user-keyed combine."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame({"user_id": b["user_id"].to_numpy("int64"),
                          "event_type": b["event_type"].to_numpy(),
                          "c": np.int64(1)})
        return p.groupby(["user_id", "event_type"], as_index=False)["c"].sum()

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        ct = p.groupby(["user_id", "event_type"], as_index=False)["c"].sum()
        c = ct["c"].to_numpy("int64")
        g = (ct.assign(cc=c * c)
             .groupby("user_id", as_index=False)
             .agg(n_events=("c", "sum"), n_types=("c", "size"),
                  ss=("cc", "sum")))
        nf = g["n_events"].to_numpy("int64").astype("float64")
        gini = 1.0 - g["ss"].to_numpy("int64").astype("float64") / (nf * nf)
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy("int64"),
            "n_events": g["n_events"].to_numpy("int64"),
            "n_types": g["n_types"].to_numpy("int64"),
            "gini": gini})

    return hash_grouped_agg(ev, ["user_id"], partial, combine)


def source_vocab_jaccard(sf_dir: str):
    """Pairwise vocabulary Jaccard between source corpora (the corpus-
    mixing diagnostic: which sources publish the same language?). Token-
    keyed exchange of distinct (source, token) light rows; each token
    contributes its source-pair intersections map-side, so nothing wider
    than per-pair counters reaches the tiny final resolve."""
    from ..stages.curation import vocab_pair_jaccard

    docs = _read(sf_dir, "documents", ["text", "source"], blocks=_cpus())
    return vocab_pair_jaccard(docs, group_col="source", text_col="text")


def events_daily_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of each event type's daily-count series (is
    today's volume predictive of tomorrow's?). Exchange plan: (type, day)
    count partials -> keyed combine produces the daily series; each
    (day, c) row re-keys as the x-side of pair day and the y-side of pair
    day-1, so consecutive-day pairs meet in a second (type, day)-keyed
    combine that emits per-type Pearson sufficient-stat partials; the
    final type-keyed combine evaluates the SQL DOUBLE expression
    token-for-token. Days missing a neighbor drop (inner-join
    semantics, mirrored by the oracle's self-join on day + 1)."""
    from ..stages.agg import hash_grouped_agg

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def cpart(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].to_numpy("datetime64[us]").astype("int64")
               // 86_400_000_000)
        p = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                          "day": day, "c": np.int64(1)})
        return p.groupby(["event_type", "day"], as_index=False)["c"].sum()

    daily = hash_grouped_agg(
        ev, ["event_type", "day"], cpart,
        lambda p: p.groupby(["event_type", "day"], as_index=False)["c"].sum())

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "event_type": pd.Series(dtype=object),
                "pday": pd.Series(dtype="int64"),
                "x": pd.Series(dtype="int64"),
                "y": pd.Series(dtype="int64"),
                "has_x": pd.Series(dtype="int64"),
                "has_y": pd.Series(dtype="int64")})
        et = b["event_type"].to_numpy(dtype=object)
        day = b["day"].to_numpy("int64")
        c = b["c"].to_numpy("int64")
        xs = pd.DataFrame({"event_type": et, "pday": day, "x": c,
                           "y": np.int64(0), "has_x": np.int64(1),
                           "has_y": np.int64(0)})
        ys = pd.DataFrame({"event_type": et, "pday": day - 1,
                           "x": np.int64(0), "y": c,
                           "has_x": np.int64(0), "has_y": np.int64(1)})
        return pd.concat([xs, ys], ignore_index=True)

    def pair_stats(p: pd.DataFrame) -> pd.DataFrame:
        s = p.groupby(["event_type", "pday"], as_index=False).sum()
        s = s[(s["has_x"] == 1) & (s["has_y"] == 1)]
        x = s["x"].to_numpy("int64")
        y = s["y"].to_numpy("int64")
        out = pd.DataFrame({
            "event_type": s["event_type"].to_numpy(dtype=object),
            "n": np.int64(1), "sx": x, "sy": y, "sxy": x * y,
            "sxx": x * x, "syy": y * y})
        return out.groupby("event_type", as_index=False).sum()

    pstats = hash_grouped_agg(
        daily.map_batches(tag, batch_format="pandas"),
        ["event_type", "pday"], lambda b: b, pair_stats)

    def corr(p: pd.DataFrame) -> pd.DataFrame:
        s = p.groupby("event_type", as_index=False).sum()
        n = s["n"].to_numpy("int64").astype("float64")
        sx = s["sx"].to_numpy("int64").astype("float64")
        sy = s["sy"].to_numpy("int64").astype("float64")
        den = (np.sqrt(n * s["sxx"].to_numpy("int64").astype("float64")
                       - sx * sx)
               * np.sqrt(n * s["syy"].to_numpy("int64").astype("float64")
                         - sy * sy))
        num = (n * s["sxy"].to_numpy("int64").astype("float64")
               - sx * sy)
        keep = den != 0.0
        s = s[keep].reset_index(drop=True)
        return pd.DataFrame({
            "event_type": s["event_type"].to_numpy(dtype=object),
            "n_pairs": s["n"].to_numpy("int64"),
            "autocorr": (num[keep] / den[keep]).astype("float64")})

    return hash_grouped_agg(pstats, ["event_type"], lambda b: b, corr)


def parts_no_bulk_orders(sf_dir: str):
    """Slow movers by distributed ANTI-join without a row join: parts
    that never shipped a bulk line (l_quantity >= 48). Part marker rows
    union with per-batch-deduped bulk-partkey hit rows into ONE
    partkey-keyed exchange; a key survives with a marker and zero hits —
    the big side ships at most one light row per distinct partkey per
    batch and the anti-semantics stay associative."""
    from ..stages.agg import hash_grouped_agg

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def pmark(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_partkey": b["p_partkey"].to_numpy("int64"),
            "p_brand": b["p_brand"].to_numpy(dtype=object),
            "hit": np.int64(0), "is_part": np.int64(1)})

    def lhit(b: pd.DataFrame) -> pd.DataFrame:
        bulk = b.loc[b["l_quantity"].to_numpy() >= 48, "l_partkey"]
        k = np.unique(bulk.to_numpy("int64"))
        return pd.DataFrame({"p_partkey": k, "p_brand": "",
                             "hit": np.int64(1), "is_part": np.int64(0)})

    tagged = (part.map_batches(pmark, batch_format="pandas")
              .union(li.map_batches(lhit, batch_format="pandas")))

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("p_partkey", as_index=False).agg(
            hit=("hit", "sum"), is_part=("is_part", "sum"),
            p_brand=("p_brand", "max"))  # brand > "" sentinel
        keep = g[(g["is_part"] >= 1) & (g["hit"] == 0)]
        return pd.DataFrame({
            "p_partkey": keep["p_partkey"].to_numpy("int64"),
            "p_brand": keep["p_brand"].to_numpy(dtype=object)})

    return hash_grouped_agg(tagged, ["p_partkey"], lambda b: b, combine)


def events_user_gap_median(sf_dir: str):
    """Per-user MEDIAN inter-event gap (the robust sibling of
    events_user_gaps' min/max/sum): users hash-route so one partition
    holds each user's full stream; gaps are one vectorized sort + shift,
    the median one grouped quantile. Bit-exact vs SQL: both engines
    interpolate even-count medians as exact-double midpoints of int64
    microsecond gaps (every quantity < 2^53, nothing rounds)."""
    from ..stages.agg import hash_grouped_map

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "event_id": b["event_id"].to_numpy("int64"),
            "tsu": b["ts"].to_numpy("datetime64[us]").astype("int64")})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_gaps": pd.Series(dtype="int64"),
                "median_gap_us": pd.Series(dtype="float64")})
        g = g.sort_values(["tsu", "event_id"], kind="mergesort")
        gaps = np.diff(g["tsu"].to_numpy("int64"))
        if not len(gaps):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_gaps": pd.Series(dtype="int64"),
                "median_gap_us": pd.Series(dtype="float64")})
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n_gaps": [np.int64(len(gaps))],
            "median_gap_us": [np.float64(np.median(gaps))]})

    return hash_grouped_map(
        ev.map_batches(light, batch_format="pandas"),
        ["user_id"], per_user)


def events_trailing_24h_sum(sf_dir: str):
    """Time-RANGE-framed windowed aggregate (the frame type the ROWS
    family can't express): per event, the count and exact cents sum of
    the same user's events in the trailing 24 h INCLUDING all timestamp
    peers (SQL RANGE ... AND CURRENT ROW semantics). Users hash-route so
    one partition holds each user's stream; the resolve is fully
    vectorized — no per-user loop — via monotone composite keys
    (user_rank * span + rebased_time is globally sorted, so one
    np.searchsorted pair finds every row's [t-24h, t-peers] window; the
    window start clamps at the user's own rebased 0, never crossing into
    the previous user's segment) and a prefix-sum difference."""
    from ..stages.agg import hash_grouped_agg

    W_US = 86_400_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "ts_us": b["ts"].to_numpy("datetime64[us]").astype("int64"),
            "cents": _cents(b["value"].to_numpy())})

    def resolve(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "ts_us": pd.Series(dtype="int64"),
                "n_24h": pd.Series(dtype="int64"),
                "sum_cents_24h": pd.Series(dtype="int64")})
        p = p.sort_values(["user_id", "ts_us"], kind="mergesort")
        uid = p["user_id"].to_numpy("int64")
        tsu = p["ts_us"].to_numpy("int64")
        cents = p["cents"].to_numpy("int64")
        # rebase times to this partition's min so composite keys fit
        # int64 for any user_id: rank(user) * span + (t - t0)
        t0 = tsu.min()
        rt = tsu - t0
        span = np.int64(rt.max()) + W_US + 2
        urank = np.unique(uid, return_inverse=True)[1].astype("int64")
        key = urank * span + rt
        lo = np.searchsorted(key, urank * span + np.maximum(rt - W_US, 0),
                             side="left")
        hi = np.searchsorted(key, key, side="right")  # include peers
        cum = np.concatenate(([0], np.cumsum(cents)))
        cnt = np.concatenate(([0], np.cumsum(np.ones_like(cents))))
        return pd.DataFrame({
            "user_id": uid, "ts_us": tsu,
            "n_24h": (cnt[hi] - cnt[lo]).astype("int64"),
            "sum_cents_24h": (cum[hi] - cum[lo]).astype("int64")})

    return hash_grouped_agg(
        ev.map_batches(light, batch_format="pandas"),
        ["user_id"], lambda b: b, resolve)


def events_top_sequences(sf_dir: str):
    """Contiguous sequential-pattern mining: the 20 most common
    consecutive event-type TRIGRAMS ranked by distinct-user support
    (which 3-step behaviors are universal?). Users hash-route so one
    partition holds each stream; trigrams come from two vectorized
    within-user shifts, dedup to one (user, trigram) row, and the
    support count + top-k ride the grouped_sum_topk machinery
    (n DESC, trigram ASC tiebreak — vocab_topk's exact shape)."""
    from ..stages.agg import grouped_sum_topk, hash_grouped_map

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                  "event_type"])

    def light(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy("int64"),
            "event_id": b["event_id"].to_numpy("int64"),
            "tsu": b["ts"].to_numpy("datetime64[us]").astype("int64"),
            "event_type": b["event_type"].to_numpy(dtype=object)})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tsu", "event_id"], kind="mergesort")
        t1 = g["event_type"]
        t2 = t1.shift(-1)
        t3 = t1.shift(-2)
        tri = (t1 + ">" + t2 + ">" + t3).dropna().drop_duplicates()
        return pd.DataFrame({"trigram": tri.to_numpy(dtype=object),
                             "n": np.int64(1)})

    per_user_tris = hash_grouped_map(
        ev.map_batches(light, batch_format="pandas"),
        ["user_id"], per_user)
    return grouped_sum_topk(per_user_tris, key="trigram", value_col="n",
                            k=20)


# ---------------- catalogs ----------------

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "region_revenue": region_revenue,
    "orders_lineitem_join": orders_lineitem_join,
    "supplier_nation_stats": supplier_nation_stats,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "events_sliding_window": events_sliding_window,
    "events_type_topk": events_type_topk,
    "events_type_pairs": events_type_pairs,
    "top_parts_by_revenue": top_parts_by_revenue,
    "frontier_submit_merge": frontier_submit_merge,
    "claim_ordering": claim_ordering,
    "politeness_budget": politeness_budget,
    "events_tumbling_window": events_tumbling_window,
    "events_sessionize": events_sessionize,
    "doc_token_stats": doc_token_stats,
    "doc_quality_gate": doc_quality_gate,
    "exact_dedup_docs": exact_dedup_docs,
    "lang_stats": lang_stats,
    "ngram_jaccard_docs": ngram_jaccard_docs,
    "doc_repetition_stats": doc_repetition_stats,
    "dup_span_docs": dup_span_docs,
    "semdedup_exact": semdedup_exact,
    "semdedup_docs": semdedup_docs,
    "pii_redacted_docs": pii_redacted_docs,
    "incremental_dedup_docs": incremental_dedup_docs,
    "source_quality_rollup": source_quality_rollup_q,
    "doc_vocabulary": doc_vocabulary,
    "doc_quality_filter": doc_quality_filter,
    "crawl_snapshot_diff": crawl_snapshot_diff,
    "line_dedup_docs": line_dedup_docs,
    "doc_boilerplate_strip": doc_boilerplate_strip,
    "corpus_two_gen": corpus_two_gen,
    "best_doc_per_group": best_doc_per_group,
    "corpus_report": corpus_report,
    "doc_normalized": doc_normalized,
    "doc_graph_indegree": doc_graph_indegree,
    "doc_vocab_coverage": doc_vocab_coverage,
    "jsonl_roundtrip_docs": jsonl_roundtrip_docs,
    "csv_roundtrip_docs": csv_roundtrip_docs,
    "warc_roundtrip_docs": warc_roundtrip_docs,
    "feather_roundtrip_docs": feather_roundtrip_docs,
    "bpe_merges": bpe_merges,
    "bpe_token_counts": bpe_token_counts,
    "doc_tfidf_terms": doc_tfidf_terms,
    "embedding_pca": embedding_pca,
    "events_distinct_users_hll": events_distinct_users_hll,
    "lang_word_quantiles": lang_word_quantiles,
    "crawl_warc_export": crawl_warc_export,
    "media_features_dedup_join": media_features_dedup_join,
    "doc_chunk_windows": doc_chunk_windows,
    "embedding_quantize_int8": embedding_quantize_int8,
    "doc_collocations": doc_collocations,
    "doc_graph_components": doc_graph_components,
    "doc_decontaminate": doc_decontaminate,
    "doc_pack_windows": doc_pack_windows,
    "lang_balanced_sample": lang_balanced_sample,
    "doc_shuffle_positions": doc_shuffle_positions,
    "training_export": training_export,
    "source_token_mixture": source_token_mixture,
    "doc_unigram_lm": doc_unigram_lm,
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
    "events_heavy_users": events_heavy_users,
    "lineitem_price_quantiles": lineitem_price_quantiles,
    "lineitem_price_quantiles_kll": lineitem_price_quantiles_kll,
    "events_type_distinct_hll": events_type_distinct_hll,
    "events_cohort_overlap_kmv": events_cohort_overlap_kmv,
    "lineitem_flag_price_quantiles_kll": lineitem_flag_price_quantiles_kll,
    "doc_compacted_roundtrip": doc_compacted_roundtrip,
    "doc_erasure_roundtrip": doc_erasure_roundtrip,
    "events_pruned_read": events_pruned_read,
    "events_zorder_pruned": events_zorder_pruned,
    "events_late_data": events_late_data,
    "doc_evolved_read": doc_evolved_read,
    "doc_stratified_sample": doc_stratified_sample,
    "knn_bruteforce": knn_bruteforce,
    "embedding_label_stats": embedding_label_stats,
    # non-SQL operators
    "minhash_dedup_docs": minhash_dedup_docs,
    "simhash_docs": simhash_docs,
    "embedding_near_dup": embedding_near_dup_q,
    "embedding_dup_pairs": embedding_dup_pairs,
    "knn_ivf": knn_ivf,
    "knn_ivf_exact": knn_ivf_exact,
    "knn_lsh": knn_lsh,
    "doc_fingerprints": doc_fingerprints,
    "crawl_frontier": crawl_frontier,
    "crawl_documents": crawl_documents,
    "crawl_classified": crawl_classified,
    "crawl_stats": crawl_stats,
    "crawl_claim_log": crawl_claim_log,
    "crawl_corpus_increment": crawl_corpus_increment,
    "link_pagerank": link_pagerank,
    "link_indegree": link_indegree,
    "round_metrics": round_metrics,
    "publisher_cursor_scan": publisher_cursor_scan,
    "publisher_routing": publisher_routing,
    "publisher_routing_events": publisher_routing_events,
    "source_reputation_events": source_reputation_events,
    "source_reputation": source_reputation_q,
    "sidecar_scores_docs": sidecar_scores_docs,
    "sidecar_scores": sidecar_scores,
    "corpus_prep": corpus_prep,
    "f1_span_stats": f1_span_stats,
    "f1_span_stats_docs": f1_span_stats_docs,
    "f1_reassemble_docs": f1_reassemble_docs,
    "f1_media_dedup": f1_media_dedup,
    "f1_caption_pairs": f1_caption_pairs,
    "f1_redact_spans": f1_redact_spans,
    "f1_truncate_docs": f1_truncate_docs,
    "f1_render_text": f1_render_text,
    "f1_pack_windows": f1_pack_windows,
    "f1_span_validation": f1_span_validation,
    "multimodal_features": multimodal_features,
    "multimodal_features_docs": multimodal_features_docs,
    "html_extraction": html_extraction,
    "jsonld_structured_extraction": jsonld_structured_extraction,
    "content_type_detection_docs": content_type_detection_docs,
    "content_type_cascade_docs": content_type_cascade_docs,
    "crime_rules_docs": crime_rules_docs,
    "indigenous_rules_docs": indigenous_rules_docs,
    "quality_scores_docs": quality_scores_docs,
    "mining_drill_docs": mining_drill_docs,
    "publisher_domain_routing": publisher_domain_routing,
    "publisher_full_routing": publisher_full_routing,
    "structured_extraction": structured_extraction,
    "location_scores": location_scores,
    "origin_budget": origin_budget,
    "publisher_telemetry": publisher_telemetry_q,
    "extraction_quality": extraction_quality,
    "doc_dsir_weights": doc_dsir_weights,
    "doc_bm25_topk": doc_bm25_topk,
    "events_running_totals": events_running_totals,
    "doc_inverted_postings": doc_inverted_postings,
    "doc_weighted_sample": doc_weighted_sample,
    "doc_phrase_search": doc_phrase_search,
    "doc_skyline": doc_skyline,
    "embedding_kmeans": embedding_kmeans,
    "doc_bigram_stats": doc_bigram_stats,
    "events_rollup": events_rollup,
    "events_user_gaps": events_user_gaps,
    "doc_rank_ntile": doc_rank_ntile,
    "lang_token_char_corr": lang_token_char_corr,
    "customer_order_totals": customer_order_totals,
    "events_props_stats": events_props_stats,
    "events_funnel": events_funnel,
    "events_cohort_retention": events_cohort_retention,
    "user_type_pivot": user_type_pivot,
    "lineitem_price_histogram": lineitem_price_histogram,
    "lineitem_depth_histogram": lineitem_depth_histogram,
    "user_event_signature": user_event_signature,
    "doc_graph_triangles": doc_graph_triangles,
    "events_cube": events_cube,
    "events_running_totals_salted": events_running_totals_salted,
    "events_since_purchase": events_since_purchase,
    "doc_tile_mixture": doc_tile_mixture,
    "lineitem_bloom_semijoin": lineitem_bloom_semijoin,
    "events_daily_top_users": events_daily_top_users,
    "doc_split_assignment": doc_split_assignment,
    "events_daily_deltas": events_daily_deltas,
    "f1_media_budget_take": f1_media_budget_take,
    "user_value_trend": user_value_trend,
    "event_value_mad": event_value_mad,
    "doc_fuzzy_title_pairs": doc_fuzzy_title_pairs,
    "events_rolling_sum": events_rolling_sum,
    "events_table_profile": events_table_profile,
    "events_interval_islands": events_interval_islands,
    "events_iqr_outliers": events_iqr_outliers,
    "doc_graph_bfs": doc_graph_bfs,
    "events_cdc_state": events_cdc_state,
    "events_markov_transitions": events_markov_transitions,
    "events_value_mode": events_value_mode,
    "events_rolling_active": events_rolling_active,
    "events_first_touch": events_first_touch,
    "events_winsorized_sum": events_winsorized_sum,
    "events_segment_venn": events_segment_venn,
    "events_hour_moments": events_hour_moments,
    "events_user_streaks": events_user_streaks,
    "events_type_gini": events_type_gini,
    "source_vocab_jaccard": source_vocab_jaccard,
    "events_daily_autocorr": events_daily_autocorr,
    "parts_no_bulk_orders": parts_no_bulk_orders,
    "events_user_gap_median": events_user_gap_median,
    "events_trailing_24h_sum": events_trailing_24h_sum,
    "events_top_sequences": events_top_sequences,
}

ORACLE_SQL = {
    "events_distinct_users_hll": """
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS hll_ok
        FROM events
    """,
    "events_type_distinct_hll": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS hll_ok
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "events_cohort_overlap_kmv": """
        WITH f AS (
            SELECT user_id,
                   MAX(event_type = 'click')    AS ha,
                   MAX(event_type = 'purchase') AS hb
            FROM events GROUP BY user_id)
        SELECT 'n_a' AS measure,
               CAST(SUM(CASE WHEN ha THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
               TRUE AS kmv_ok FROM f
        UNION ALL
        SELECT 'n_b',
               CAST(SUM(CASE WHEN hb THEN 1 ELSE 0 END) AS BIGINT),
               TRUE FROM f
        UNION ALL
        SELECT 'n_union',
               CAST(SUM(CASE WHEN ha OR hb THEN 1 ELSE 0 END) AS BIGINT),
               TRUE FROM f
        UNION ALL
        SELECT 'n_intersect',
               CAST(SUM(CASE WHEN ha AND hb THEN 1 ELSE 0 END) AS BIGINT),
               TRUE FROM f
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
               CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_orders": """
        SELECT o.o_orderkey,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
               o.o_orderdate
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue_cents DESC, o.o_orderkey
        LIMIT 10
    """,
    "region_revenue": """
        SELECT r.r_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name
    """,
    "top_parts_by_revenue": """
        SELECT l.l_partkey AS p_partkey,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
               ANY_VALUE(p.p_name) AS p_name
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY l.l_partkey
        ORDER BY revenue_cents DESC, l.l_partkey
        LIMIT 20
    """,
    "supplier_nation_stats": """
        SELECT n.n_name, COUNT(*) AS n_suppliers,
               MIN(s.s_acctbal) AS min_bal, MAX(s.s_acctbal) AS max_bal
        FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name
    """,
    "events_segment_venn": """
        WITH m AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'view'
                            THEN 1 ELSE 0 END) AS has_view,
                   MAX(CASE WHEN event_type = 'click'
                            THEN 1 ELSE 0 END) AS has_click,
                   MAX(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS has_purchase
            FROM events
            WHERE ts < TIMESTAMP '2024-01-02'
            GROUP BY user_id
        )
        SELECT has_view, has_click, has_purchase, COUNT(*) AS n_users
        FROM m
        WHERE has_view + has_click + has_purchase > 0
        GROUP BY has_view, has_click, has_purchase
    """,
    "events_winsorized_sum": """
        WITH c AS (
            SELECT event_type,
                   CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v
            FROM events
        ), q AS (
            SELECT event_type,
                   quantile_disc(v, 0.10) AS lo,
                   quantile_disc(v, 0.90) AS hi
            FROM c GROUP BY event_type
        )
        SELECT c.event_type,
               CAST(SUM(GREATEST(q.lo, LEAST(q.hi, c.v))) AS BIGINT)
                   AS winsorized_cents,
               CAST(SUM(CASE WHEN c.v < q.lo OR c.v > q.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
               COUNT(*) AS n
        FROM c JOIN q USING (event_type)
        GROUP BY c.event_type
    """,
    "events_cdc_state": """
        WITH ops AS (
            SELECT user_id, ts, event_id,
                   CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c
            FROM events
        ), ranked AS (
            SELECT user_id, c,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn
            FROM ops
        )
        SELECT user_id, c AS last_cents
        FROM ranked WHERE rn = 1 AND c % 10 <> 0
    """,
    "doc_graph_bfs": """
        WITH RECURSIVE nn AS (
            SELECT COUNT(*) AS n FROM documents
        ), e0 AS (
            SELECT doc_id AS a, (doc_id * 7 + 3) % nn.n AS b
            FROM documents, nn
            UNION ALL
            SELECT doc_id, (doc_id * 3 + 11) % nn.n FROM documents, nn
        ), reach(id, hop) AS (
            SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
            UNION
            SELECT e0.b, reach.hop + 1
            FROM reach JOIN e0 ON e0.a = reach.id
            WHERE reach.hop < 4
        )
        SELECT id AS node, MIN(hop) AS hop FROM reach GROUP BY id
    """,
    "events_iqr_outliers": """
        WITH c AS (
            SELECT event_type,
                   CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v
            FROM events
        ), q AS (
            SELECT event_type,
                   quantile_disc(v, 0.25) AS q1,
                   quantile_disc(v, 0.75) AS q3
            FROM c GROUP BY event_type
        )
        SELECT c.event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN 2*c.v < 2*q.q1 - 3*(q.q3 - q.q1)
                               OR 2*c.v > 2*q.q3 + 3*(q.q3 - q.q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               q.q1, q.q3
        FROM c JOIN q USING (event_type)
        GROUP BY c.event_type, q.q1, q.q3
    """,
    "events_interval_islands": """
        WITH iv AS (
            SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
            FROM events
        ), brks AS (
            SELECT user_id, s, e,
                   CASE WHEN s <= MAX(e) OVER (
                            PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                        THEN 0 ELSE 1 END AS brk
            FROM iv
        ), grp AS (
            SELECT user_id, s, e,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM brks
        ), isl AS (
            SELECT user_id, island, MIN(s) AS s0, MAX(e) AS e1
            FROM grp GROUP BY user_id, island
        )
        SELECT user_id, COUNT(*) AS n_islands,
               CAST(SUM(epoch_us(e1) - epoch_us(s0)) AS BIGINT)
                   AS covered_us
        FROM isl GROUP BY user_id
    """,
    "events_table_profile": """
        SELECT 'event_id' AS col, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(event_id) AS n_nulls,
               COUNT(DISTINCT event_id) AS n_distinct FROM events
        UNION ALL
        SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts),
               COUNT(DISTINCT ts) FROM events
        UNION ALL
        SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
               COUNT(DISTINCT user_id) FROM events
        UNION ALL
        SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
               COUNT(DISTINCT event_type) FROM events
        UNION ALL
        SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
               COUNT(DISTINCT value) FROM events
        UNION ALL
        SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
               COUNT(DISTINCT props) FROM events
    """,
    "q5_local_supplier_volume": """
        SELECT n.n_name,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
          AND c.c_nationkey = s.s_nationkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """,
    "orders_lineitem_join": """
        SELECT o.o_orderkey,
               CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT) AS total_cents,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice >= 400000.0
        GROUP BY o.o_orderkey, o.o_totalprice
    """,
    "events_sliding_window": """
        WITH x AS (
            SELECT event_type, date_trunc('hour', ts) AS w FROM events
            UNION ALL
            SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events
        )
        SELECT event_type, w AS window_start, COUNT(*) AS n
        FROM x GROUP BY event_type, w
    """,
    "frontier_submit_merge": """
        SELECT user_id, MAX(value) AS max_priority, MIN(ts) AS first_seen,
               COUNT(*) AS n_submits
        FROM events GROUP BY user_id
    """,
    "claim_ordering": """
        SELECT o_orderkey, o_orderpriority, o_orderdate
        FROM orders
        ORDER BY o_orderpriority, o_orderdate, o_orderkey
        LIMIT 100
    """,
    "politeness_budget": """
        SELECT user_id, date_trunc('hour', ts) AS window_start,
               COUNT(*) AS n_events, COUNT(*) > 5 AS over_budget
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    "events_tumbling_window": """
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    "events_type_pairs": """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_users
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
    "events_type_topk": """
        SELECT user_id, event_type, n, rnk FROM (
            SELECT user_id, event_type, COUNT(*) AS n,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY COUNT(*) DESC, event_type
                   ) AS rnk
            FROM events GROUP BY user_id, event_type
        ) WHERE rnk <= 3
    """,
    "events_sessionize": """
        WITH x AS (
            SELECT user_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
        SELECT user_id,
               COUNT(*) FILTER (WHERE prev IS NULL OR ts - prev > INTERVAL 30 MINUTE) AS n_sessions,
               COUNT(*) AS n_events
        FROM x GROUP BY user_id
    """,
    "doc_compacted_roundtrip": """
        SELECT doc_id, LENGTH(text) AS n_chars FROM documents
    """,
    "doc_erasure_roundtrip": """
        SELECT doc_id, LENGTH(text) AS n_chars FROM documents
        WHERE doc_id % 2 = 1
    """,
    "events_pruned_read": """
        WITH b AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
                   FROM events),
             r AS (SELECT mn + (mx - mn) // 3 AS lo,
                          mn + 2 * ((mx - mn) // 3) AS hi FROM b)
        SELECT event_type, COUNT(*) AS n
        FROM events, r
        WHERE epoch_us(ts) >= lo AND epoch_us(ts) <= hi
        GROUP BY event_type
    """,
    "doc_evolved_read": """
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'unknown' ELSE lang END AS lang,
               COUNT(*) AS n
        FROM documents GROUP BY 1
    """,
    "events_late_data": """
        WITH a AS (
          SELECT event_id, event_type, ts,
                 epoch_us(ts)
                 + (((event_id % 100000) * 2654435761) % 7200) * 1000000
                   AS arrival_us
          FROM events),
        w AS (
          SELECT event_type, ts,
                 MAX(epoch_us(ts)) OVER (
                   ORDER BY arrival_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
          FROM a)
        SELECT event_type,
               COUNT(*) AS n_total,
               SUM(CASE WHEN wm IS NOT NULL
                         AND epoch_us(ts) < wm - 3600000000
                        THEN 1 ELSE 0 END) AS n_late
        FROM w GROUP BY event_type
    """,
    "events_zorder_pruned": """
        WITH b AS (SELECT MIN(user_id) AS mn, MAX(user_id) AS mx
                   FROM events),
             r AS (SELECT mn + (mx - mn) // 3 AS lo,
                          mn + 2 * ((mx - mn) // 3) AS hi FROM b)
        SELECT event_type, COUNT(*) AS n
        FROM events, r
        WHERE user_id >= lo AND user_id <= hi
        GROUP BY event_type
    """,
    "doc_token_stats": """
        SELECT doc_id, lang, LENGTH(text) AS n_chars,
               LEN(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_words
        FROM documents
    """,
    "doc_quality_gate": """
        SELECT doc_id, LENGTH(text) AS n_chars
        FROM documents
        WHERE LENGTH(text) >= 200
          AND LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g'))
              < LENGTH(text) * 0.2
    """,
    "exact_dedup_docs": """
        SELECT doc_id, text_sha FROM (
            SELECT doc_id, sha256(text) AS text_sha,
                   ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    "lang_stats": """
        SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang
    """,
    "content_type_detection_docs": _ctd_oracle_sql(),
    "content_type_cascade_docs": _cascade_oracle_sql(),
    "crime_rules_docs": _crime_rules_oracle_sql(),
    "indigenous_rules_docs": _indigenous_rules_oracle_sql(),
    "quality_scores_docs": _QUALITY_DOCS_ORACLE,
    "mining_drill_docs": _MINING_DRILL_ORACLE,
    "publisher_domain_routing": _publisher_routing_oracle_sql(),
    "f1_span_stats_docs": r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        s AS (
          SELECT doc_id, len(ws) AS nw,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE (len(ws) + 19) // 20 END AS nt,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE list_sum(list_transform(ws, w -> length(w)))
                      END AS sumlen
          FROM d
        )
        SELECT doc_id,
          CAST(nt + nt // 2 AS BIGINT) AS n_spans,
          CAST(nt // 2 AS BIGINT) AS n_media,
          CAST(nt AS BIGINT) AS n_text,
          CAST(CASE WHEN nw = 0 THEN 0
                    ELSE sumlen + nw - nt END AS BIGINT) AS total_text_chars,
          NOT (doc_id % 97 = 0 AND nt >= 2) AS spans_valid
        FROM s
    """,
    "f1_reassemble_docs": r"""
        SELECT * FROM (
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        s AS (
          SELECT doc_id, len(ws) AS nw,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE (len(ws) + 19) // 20 END AS nt,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE list_sum(list_transform(ws, w -> length(w)))
                      END AS sumlen
          FROM d
        )
        SELECT doc_id,
          CAST(nt + nt // 2 AS BIGINT) AS n_spans,
          CAST(nt // 2 AS BIGINT) AS n_media,
          CAST(nt AS BIGINT) AS n_text,
          CAST(CASE WHEN nw = 0 THEN 0
                    ELSE sumlen + nw - nt END AS BIGINT) AS total_text_chars,
          NOT (doc_id % 97 = 0 AND nt >= 2) AS spans_valid
        FROM s
    ) WHERE n_spans > 0
    """,
    "f1_media_dedup": r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        s AS (
          SELECT doc_id, len(ws) AS nw,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE (len(ws) + 19) // 20 END AS nt,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE list_sum(list_transform(ws, w -> length(w)))
                      END AS sumlen
          FROM d
        ),
        refs AS (
          SELECT doc_id, j, 3 * j + 2 AS off,
                 CASE WHEN doc_id % 97 = 0 AND j = 0 THEN ''
                      ELSE 'media://'
                           || CAST((doc_id * 31 + j * 17) % 50 AS VARCHAR)
                      END AS ref
          FROM s, unnest(range(0, nt // 2)) AS t(j)
        ),
        keptm AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_media_kept FROM (
            SELECT doc_id, ref,
                   CASE WHEN ref = '' THEN 1
                        ELSE ROW_NUMBER() OVER (
                            PARTITION BY ref ORDER BY doc_id, off)
                        END AS rn
            FROM refs) WHERE rn = 1 GROUP BY doc_id
        )
        SELECT s.doc_id,
               CAST(s.nt + coalesce(k.n_media_kept, 0) AS BIGINT)
                   AS n_spans,
               CAST(coalesce(k.n_media_kept, 0) AS BIGINT) AS n_media,
               CAST(s.nt AS BIGINT) AS n_text,
               CAST(CASE WHEN s.nw = 0 THEN 0
                         ELSE s.sumlen + s.nw - s.nt END AS BIGINT)
                   AS total_text_chars,
               NOT (s.doc_id % 97 = 0 AND s.nt >= 2) AS spans_valid
        FROM s LEFT JOIN keptm k USING (doc_id)
        WHERE s.nt + coalesce(k.n_media_kept, 0) > 0
    """,
    "f1_caption_pairs": r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        s AS (
          SELECT doc_id, ws,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE (len(ws) + 19) // 20 END AS nt
          FROM d
        ),
        chunks AS (
          SELECT doc_id, i,
                 array_to_string(ws[20 * i + 1 : 20 * i + 20], ' ')
                     AS chunk
          FROM s, unnest(range(0, nt)) AS t(i)
        ),
        refs AS (
          SELECT doc_id, j, 3 * j + 2 AS off,
                 CASE WHEN doc_id % 97 = 0 AND j = 0 THEN ''
                      ELSE 'media://' || CAST(doc_id AS VARCHAR) || '/'
                           || CAST(j AS VARCHAR) END AS ref
          FROM s, unnest(range(0, nt // 2)) AS t(j)
        )
        SELECT r.doc_id, r.ref AS media_ref,
               CAST(r.off AS INTEGER) AS offset, c.chunk AS caption
        FROM refs r
        JOIN chunks c ON c.doc_id = r.doc_id AND c.i = 2 * r.j + 1
        WHERE r.ref <> ''
    """,
    "f1_render_text": r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        s AS (
          SELECT doc_id, ws,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE (len(ws) + 19) // 20 END AS nt
          FROM d
        ),
        spans AS (
          SELECT doc_id, i + i // 2 AS off,
                 array_to_string(ws[20 * i + 1 : 20 * i + 20], ' ')
                     AS piece
          FROM s, unnest(range(0, nt)) AS t(i)
          UNION ALL
          SELECT doc_id, 3 * j + 2, '<|media|>'
          FROM s, unnest(range(0, nt // 2)) AS t(j)
        )
        SELECT doc_id,
               string_agg(piece, ' ' ORDER BY off) AS text,
               CAST(count(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id
    """,
    "f1_redact_spans": r"""
        WITH aug AS (
          SELECT doc_id,
                 coalesce(text, '')
                 || CASE WHEN doc_id % 5 = 0
                    THEN ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com now' ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                    THEN ' call 416-555-'
                         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
                 || CASE WHEN doc_id % 3 = 0
                    THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                         || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                    ELSE '' END AS text
          FROM documents
        ),
        d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '') AS ws
          FROM aug
        ),
        s AS (
          SELECT doc_id, ws,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE (len(ws) + 19) // 20 END AS nt
          FROM d
        ),
        red AS (
          SELECT doc_id,
                 length(regexp_replace(regexp_replace(regexp_replace(
                     array_to_string(ws[20 * i + 1 : 20 * i + 20], ' '),
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>',
                     'g')) AS chars
          FROM s, unnest(range(0, nt)) AS t(i)
        ),
        tot AS (SELECT doc_id, CAST(sum(chars) AS BIGINT)
                    AS total_text_chars
                FROM red GROUP BY doc_id)
        SELECT s.doc_id,
               CAST(s.nt + s.nt // 2 AS BIGINT) AS n_spans,
               CAST(s.nt // 2 AS BIGINT) AS n_media,
               CAST(s.nt AS BIGINT) AS n_text,
               t.total_text_chars
        FROM s JOIN tot t USING (doc_id)
        WHERE s.nt > 0
    """,
    "f1_truncate_docs": r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        s AS (
          SELECT doc_id, ws, len(ws) AS nw,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE (len(ws) + 19) // 20 END AS nt
          FROM d
        ),
        spans AS (
          SELECT doc_id, i + i // 2 AS off, FALSE AS is_media,
                 array_to_string(ws[20 * i + 1 : 20 * i + 20], ' ')
                     AS chunk,
                 CASE WHEN 20 * i + 20 <= nw THEN 20
                      ELSE nw - 20 * i END AS cost
          FROM s, unnest(range(0, nt)) AS t(i)
          UNION ALL
          SELECT doc_id, 3 * j + 2, TRUE, '', 16
          FROM s, unnest(range(0, nt // 2)) AS t(j)
        ),
        cum AS (
          SELECT *, SUM(cost) OVER (PARTITION BY doc_id ORDER BY off
                                    ROWS UNBOUNDED PRECEDING) AS c
          FROM spans
        ),
        kept AS (SELECT * FROM cum WHERE c <= 96 OR off = 0)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN is_media THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_media,
               CAST(sum(CASE WHEN is_media THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_text,
               CAST(sum(length(chunk)) AS BIGINT) AS total_text_chars
        FROM kept GROUP BY doc_id
    """,
    "media_features_dedup_join": r"""
        WITH d AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(coalesce(text, ''),
                                                    '\s+'),
                                 x -> x <> '')) AS nw
          FROM documents
        ),
        s AS (
          SELECT doc_id,
                 (CASE WHEN nw = 0 THEN 0
                       ELSE (nw + 19) // 20 END) // 2 AS nm
          FROM d
        ),
        refs AS (
          SELECT doc_id,
                 'media://' || CAST((doc_id * 31 + j * 17) % 50
                                    AS VARCHAR) AS ref
          FROM s, unnest(range(0, nm)) AS t(j)
          WHERE NOT (doc_id % 97 = 0 AND j = 0)
        ),
        feat AS (SELECT DISTINCT ref FROM refs),
        p AS (
          SELECT ref, sha256('42:' || ref) AS hhex,
                 64 + ('0x' || substr(sha256('42:' || ref), 1, 2))::INTEGER
                   * 4 AS size
          FROM feat
        ),
        pay AS (
          SELECT ref, size,
                 substr(repeat(hhex, size // 64 + 1), 1, size) AS pstr
          FROM p
        )
        SELECT r.doc_id, r.ref AS media_ref,
               CAST(y.size AS BIGINT) AS byte_len,
               CAST(160 + ('0x' || substr(sha256(y.pstr), 3, 2))::INTEGER
                    * 8 AS BIGINT) AS width,
               CAST(120 + ('0x' || substr(sha256(y.pstr), 5, 2))::INTEGER
                    * 8 AS BIGINT) AS height,
               substr(sha256(y.pstr || '|thumb'), 1, 32) AS thumb_hex
        FROM refs r JOIN pay y ON y.ref = r.ref
    """,
    "multimodal_features_docs": r"""
        WITH d AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(coalesce(text, ''),
                                                    '\s+'),
                                 x -> x <> '')) AS nw
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 (CASE WHEN nw = 0 THEN 0
                       ELSE (nw + 19) // 20 END) // 2 AS n_media
          FROM d
        ),
        refs AS (
          SELECT doc_id,
                 'media://' || CAST(doc_id AS VARCHAR) || '/'
                   || CAST(j AS VARCHAR) AS ref
          FROM m, unnest(range(0, n_media)) AS t(j)
        ),
        p AS (
          SELECT doc_id, ref, sha256('42:' || ref) AS hhex,
                 64 + ('0x' || substr(sha256('42:' || ref), 1, 2))::INTEGER
                   * 4 AS size
          FROM refs
        ),
        pay AS (
          SELECT doc_id, ref, size,
                 substr(repeat(hhex, size // 64 + 1), 1, size) AS pstr
          FROM p
        )
        SELECT substr(sha256(ref), 1, 16) AS media_id,
               CAST(doc_id AS VARCHAR) AS doc_id,
               CAST(size AS BIGINT) AS byte_len,
               CAST(160 + ('0x' || substr(sha256(pstr), 3, 2))::INTEGER * 8
                    AS BIGINT) AS width,
               CAST(120 + ('0x' || substr(sha256(pstr), 5, 2))::INTEGER * 8
                    AS BIGINT) AS height,
               substr(sha256(pstr || '|thumb'), 1, 32) AS thumb_hex
        FROM pay
    """,
    "sidecar_scores_docs": _sidecar_oracle_sql(),
    "location_scores": _location_oracle_sql(),
    "minhash_dedup_docs": _minhash_oracle_sql(),
    "corpus_prep": _corpus_prep_oracle_sql(),
    "publisher_routing_events": """
        WITH base AS (
          SELECT event_id AS doc_id,
                 epoch_us(ts) AS crawled_at,
                 (event_id * 37) % 101 AS q,
                 CASE WHEN event_id % 3 = 0 THEN 'page'
                      WHEN event_id % 3 = 1 THEN 'article'
                      ELSE 'other' END AS ct,
                 CASE event_type WHEN 'click' THEN 'crime'
                      WHEN 'view' THEN 'business'
                      WHEN 'purchase' THEN 'sports'
                      WHEN 'signup' THEN 'mining'
                      ELSE 'politics' END AS prim,
                 (event_type = 'purchase' OR event_id % 4 = 0) AS has_sports
          FROM events
          WHERE epoch_us(ts) > 1704844800000000
             OR (epoch_us(ts) = 1704844800000000 AND event_id > 0)
        ),
        routed AS (
          SELECT 'content:crime' AS channel, doc_id,
                 crawled_at AS published_at
          FROM base WHERE prim = 'crime' AND ct = 'article' AND q >= 40
          UNION ALL
          SELECT 'content:business', doc_id, crawled_at
          FROM base WHERE prim IN ('business', 'mining')
                      AND ct = 'article' AND q >= 40
          UNION ALL
          SELECT 'content:no-sports', doc_id, crawled_at
          FROM base WHERE NOT has_sports AND ct = 'article' AND q >= 60
          UNION ALL
          SELECT 'content:high-quality', doc_id, crawled_at
          FROM base WHERE ct IN ('article', 'page') AND q >= 80
        )
        SELECT channel, doc_id, published_at FROM routed
        WHERE NOT (channel = 'content:crime' AND doc_id % 10 = 0
                   AND doc_id < 2000)
    """,
    # full source_reputation.go formula: avg quality x (1 - spamRatio*0.1),
    # 10% trust boost (n>=10, avg>=70, ratio<0.05), clamp + truncate, rank
    # tiers; all arithmetic in DOUBLE to match the Python kernel bit-for-bit
    "source_reputation_events": """
        WITH g AS (
          SELECT user_id % 50 AS source_id,
                 COUNT(*) AS n_docs,
                 SUM(CASE WHEN (event_id * 37) % 101 < 30
                          THEN 1 ELSE 0 END) AS spam_count,
                 CAST(SUM((event_id * 37) % 101) AS DOUBLE)
                   / COUNT(*) AS avg_q
          FROM events GROUP BY user_id % 50
        ),
        s AS (
          SELECT source_id, n_docs, spam_count,
            avg_q * (CAST(1 AS DOUBLE)
                     - (CAST(spam_count AS DOUBLE) / n_docs)
                       * CAST(0.1 AS DOUBLE))
            * (CASE WHEN n_docs >= 10 AND avg_q >= CAST(70 AS DOUBLE)
                     AND CAST(spam_count AS DOUBLE) / n_docs
                         < CAST(0.05 AS DOUBLE)
                    THEN CAST(1.1 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END)
              AS raw_score
          FROM g
        )
        SELECT source_id, n_docs, CAST(spam_count AS BIGINT) AS spam_count,
          CAST(FLOOR(LEAST(CAST(100 AS DOUBLE),
                           GREATEST(CAST(0 AS DOUBLE), raw_score)))
               AS BIGINT) AS reputation,
          CASE WHEN FLOOR(LEAST(CAST(100 AS DOUBLE),
                    GREATEST(CAST(0 AS DOUBLE), raw_score))) >= 75
                    AND n_docs >= 10 THEN 'trusted'
               WHEN FLOOR(LEAST(CAST(100 AS DOUBLE),
                    GREATEST(CAST(0 AS DOUBLE), raw_score))) >= 50
                    THEN 'moderate'
               WHEN FLOOR(LEAST(CAST(100 AS DOUBLE),
                    GREATEST(CAST(0 AS DOUBLE), raw_score))) >= 30
                    THEN 'low'
               ELSE 'spam' END AS rank
        FROM s
    """,
    "doc_fingerprints": r"""
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z0-9_]+') AS tw
          FROM documents
        ),
        feats AS (
          SELECT doc_id,
            list_transform(tw, w -> CAST(md5_number_upper(w) AS HUGEINT)) AS hl,
            list_distinct(list_slice(tw, 1, 400)) AS w400
          FROM toks
        ),
        votes AS (
          SELECT doc_id, hl,
            len(list_intersect(w400, ['der','die','das','und','ist','von',
              'den','mit','auf','für','des','ein','eine','im','nicht',
              'sich'])) AS c_de,
            len(list_intersect(w400, ['the','and','of','to','a','in','is',
              'that','for','it','with','was','on','as','are','at','be',
              'this','have'])) AS c_en,
            len(list_intersect(w400, ['el','la','los','las','de','y','en',
              'que','es','un','una','del','por','con','para','no',
              'se'])) AS c_es,
            len(list_intersect(w400, ['le','la','les','de','des','et','un',
              'une','du','en','est','que','pour','dans','qui','au','pas',
              'sur'])) AS c_fr
          FROM feats
        )
        SELECT doc_id,
          CAST(CASE
            WHEN len(hl) = 0 THEN 0
            WHEN len(hl) < 8 THEN
              list_reduce(hl, (a, b) -> (a * 1000003 + b)
                          % 2305843009213693951) % 2305843009213693951
            ELSE list_min(list_transform(range(1, len(hl) - 6), i ->
              list_reduce(list_slice(hl, i, i + 7), (a, b) ->
                (a * 1000003 + b) % 2305843009213693951)
              % 2305843009213693951))
          END AS BIGINT) AS fingerprint,
          CASE
            WHEN greatest(c_de, c_en, c_es, c_fr) < 2 THEN 'und'
            WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
            WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
            WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
            ELSE 'fr'
          END AS lang_pred
        FROM votes
    """,
    "ngram_jaccard_docs": r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
          FROM toks, unnest(range(1, greatest(len(ws)-2, 0)+1)) AS t(i)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        ov AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT ov.doc_a, ov.doc_b,
               CAST(ov.c AS DOUBLE) / (sa.n + sb.n - ov.c) AS jaccard
        FROM ov
        JOIN sizes sa ON sa.doc_id = ov.doc_a
        JOIN sizes sb ON sb.doc_id = ov.doc_b
        WHERE CAST(ov.c AS DOUBLE) / (sa.n + sb.n - ov.c) >= 0.5
        ORDER BY doc_a, doc_b
    """,
    "doc_stratified_sample": """
        SELECT lang, doc_id, hv FROM (
          SELECT lang, doc_id,
                 (doc_id % 2147483648) * 2654435761 % 4294967296 AS hv,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id % 2147483648) * 2654435761 % 4294967296,
                            doc_id) AS rn
          FROM documents)
        WHERE rn <= 25
        ORDER BY lang, hv, doc_id
    """,
    "events_asof_join": """
        WITH u AS (
          SELECT user_id, ts, event_id, 1 AS is_l
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, event_id, 0
          FROM events WHERE event_type = 'view'
        ),
        o AS (
          SELECT user_id, ts, event_id, is_l,
                 last_value(CASE WHEN is_l = 0 THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, is_l, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS view_id
          FROM u
        )
        SELECT event_id AS purchase_id, user_id, ts, view_id
        FROM o WHERE is_l = 1 AND view_id IS NOT NULL
        ORDER BY purchase_id
    """,
    "events_range_join": """
        SELECT p.event_id AS purchase_id, p.user_id, p.ts,
               v.event_id AS view_id, v.ts AS ts_right
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        ORDER BY purchase_id, view_id
    """,
    "events_heavy_users": """
        SELECT user_id, COUNT(*) AS n
        FROM events GROUP BY user_id HAVING COUNT(*) >= 80
        ORDER BY user_id
    """,
    "lineitem_price_quantiles": """
        SELECT 0.25 AS q, quantile_disc(l_extendedprice, 0.25) AS value
        FROM lineitem
        UNION ALL SELECT 0.5, quantile_disc(l_extendedprice, 0.5)
        FROM lineitem
        UNION ALL SELECT 0.75, quantile_disc(l_extendedprice, 0.75)
        FROM lineitem
        UNION ALL SELECT 0.95, quantile_disc(l_extendedprice, 0.95)
        FROM lineitem
        ORDER BY q
    """,
    "lineitem_flag_price_quantiles_kll": """
        SELECT l_returnflag, CAST(0.25 AS DOUBLE) AS q,
               quantile_disc(l_extendedprice, 0.25) AS value, TRUE AS kll_ok
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 0.5, quantile_disc(l_extendedprice, 0.5), TRUE
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 0.75, quantile_disc(l_extendedprice, 0.75), TRUE
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag, q
    """,
    "lineitem_price_quantiles_kll": """
        SELECT CAST(0.01 AS DOUBLE) AS q,
               quantile_disc(l_extendedprice, 0.01) AS value,
               TRUE AS kll_ok
        FROM lineitem
        UNION ALL SELECT 0.25, quantile_disc(l_extendedprice, 0.25), TRUE
        FROM lineitem
        UNION ALL SELECT 0.5, quantile_disc(l_extendedprice, 0.5), TRUE
        FROM lineitem
        UNION ALL SELECT 0.75, quantile_disc(l_extendedprice, 0.75), TRUE
        FROM lineitem
        UNION ALL SELECT 0.99, quantile_disc(l_extendedprice, 0.99), TRUE
        FROM lineitem
        ORDER BY q
    """,
    "doc_repetition_stats": r"""
        WITH tk AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS ws0
          FROM documents
        ),
        -- deterministic augmentation mirrored from the Ray query: docs
        -- with doc_id % 7 = 3 and >= 12 tokens repeat their first 12
        toks AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 3 AND len(ws0) >= 12
                      THEN list_concat(ws0, ws0[1:12]) ELSE ws0 END AS ws
          FROM tk
        ),
        g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
               FROM toks, unnest(range(1, greatest(len(ws)-1, 0)+1)) AS t(i)),
        c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        f2 AS (SELECT doc_id,
                      CAST(max(c) AS DOUBLE)/CAST(sum(c) AS DOUBLE) AS f
               FROM c2 GROUP BY doc_id),
        g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
               FROM toks, unnest(range(1, greatest(len(ws)-2, 0)+1)) AS t(i)),
        c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        f3 AS (SELECT doc_id,
                      CAST(max(c) AS DOUBLE)/CAST(sum(c) AS DOUBLE) AS f
               FROM c3 GROUP BY doc_id),
        g5 AS (SELECT doc_id, i, array_to_string(ws[i:i+4], ' ') AS g
               FROM toks, unnest(range(1, greatest(len(ws)-4, 0)+1)) AS t(i)),
        d5 AS (SELECT doc_id, i FROM (
                 SELECT doc_id, i,
                        count(*) OVER (PARTITION BY doc_id, g) AS c FROM g5)
               WHERE c > 1),
        cov AS (SELECT doc_id, count(DISTINCT p) AS cv
                FROM d5, unnest(range(i, i+5)) AS u(p) GROUP BY doc_id),
        base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM toks)
        SELECT base.doc_id, n_tokens,
          coalesce(f2.f, 0.0) AS top_2gram_frac,
          coalesce(f3.f, 0.0) AS top_3gram_frac,
          coalesce(CAST(cov.cv AS DOUBLE)/CAST(n_tokens AS DOUBLE), 0.0)
              AS dup_5gram_token_frac,
          (coalesce(f2.f, 0.0) <= 0.18 AND coalesce(f3.f, 0.0) <= 0.16
           AND coalesce(CAST(cov.cv AS DOUBLE)/CAST(n_tokens AS DOUBLE), 0.0)
               <= 0.15) AS keep
        FROM base LEFT JOIN f2 USING (doc_id) LEFT JOIN f3 USING (doc_id)
        LEFT JOIN cov USING (doc_id)
        ORDER BY doc_id
    """,
    "dup_span_docs": r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        w AS (SELECT doc_id, i, array_to_string(ws[i:i+7], ' ') AS g
              FROM toks, unnest(range(1, greatest(len(ws)-7, 0)+1)) AS t(i)),
        gc AS (SELECT g, count(*) AS c FROM w GROUP BY g),
        dw AS (SELECT doc_id, i FROM w JOIN gc USING (g) WHERE gc.c > 1),
        ndw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
                FROM dw GROUP BY doc_id),
        cov AS (SELECT doc_id, count(DISTINCT p) AS covered
                FROM dw, unnest(range(i, i+8)) AS u(p) GROUP BY doc_id),
        base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                        CAST(greatest(len(ws)-7, 0) AS BIGINT) AS n_windows
                 FROM toks)
        SELECT base.doc_id, n_tokens, n_windows,
          coalesce(ndw.n_dup_windows, 0) AS n_dup_windows,
          CASE WHEN n_tokens > 0
               THEN CAST(coalesce(cov.covered, 0) AS DOUBLE)
                    / CAST(n_tokens AS DOUBLE)
               ELSE 0.0 END AS dup_token_frac
        FROM base LEFT JOIN ndw USING (doc_id) LEFT JOIN cov USING (doc_id)
        ORDER BY doc_id
    """,
    "doc_decontaminate": r"""
        WITH cw AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> x <> '') AS ws
          FROM documents WHERE doc_id % 19 <> 0
        ),
        bw AS (
          SELECT list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS ws
          FROM documents WHERE doc_id % 19 = 0
        ),
        cg AS (SELECT DISTINCT doc_id,
                      ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                      ws[i+3] || ' ' || ws[i+4] AS g
               FROM cw, unnest(range(1, greatest(len(ws)-4, 0)+1)) AS t(i)),
        bg AS (SELECT DISTINCT
                      ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                      ws[i+3] || ' ' || ws[i+4] AS g
               FROM bw, unnest(range(1, greatest(len(ws)-4, 0)+1)) AS t(i)),
        tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
                FROM cg GROUP BY doc_id),
        hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
                 FROM cg WHERE g IN (SELECT g FROM bg) GROUP BY doc_id)
        SELECT c.doc_id,
               coalesce(t.n_grams, 0) AS n_grams,
               coalesce(h.n_hit, 0) AS n_hit,
               coalesce(h.n_hit, 0) > 0 AS contaminated,
               CASE WHEN coalesce(t.n_grams, 0) > 0
                    THEN CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_grams
                    ELSE 0.0 END AS contamination_frac
        FROM cw c LEFT JOIN tot t USING (doc_id)
        LEFT JOIN hits h USING (doc_id)
    """,
    "f1_pack_windows": r"""
        WITH w AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(coalesce(text, ''),
                      '\s+'), x -> x <> '')) AS BIGINT) AS nw
          FROM documents
        ),
        t AS (
          SELECT doc_id,
                 nw + 16 * (CASE WHEN nw = 0 THEN 0
                            ELSE (nw + 19) // 20 END // 2) AS n_tokens
          FROM w
        ),
        o AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS off
          FROM t
        )
        SELECT doc_id, n_tokens, off AS "offset",
               off // 256 AS first_window,
               (off + greatest(n_tokens, 1) - 1) // 256 AS last_window,
               (off + greatest(n_tokens, 1) - 1) // 256 - off // 256 + 1
                 AS n_windows
        FROM o
    """,
    "doc_pack_windows": r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        o AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS off
          FROM t
        )
        SELECT doc_id, n_tokens, off AS "offset",
               off // 256 AS first_window,
               (off + greatest(n_tokens, 1) - 1) // 256 AS last_window,
               (off + greatest(n_tokens, 1) - 1) // 256 - off // 256 + 1
                 AS n_windows
        FROM o
    """,
    "lang_balanced_sample": """
        WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        m AS (SELECT min(cnt) AS m FROM c)
        SELECT d.doc_id, d.lang,
               CAST((d.doc_id % 2147483648) * 2654435761 % 4294967296
                    AS BIGINT) AS hv
        FROM documents d JOIN c USING (lang) CROSS JOIN m
        WHERE CAST((d.doc_id % 2147483648) * 2654435761 % 4294967296
                   AS HUGEINT) * c.cnt
              < CAST(m.m AS HUGEINT) * 4294967296
    """,
    "training_export": r"""
        WITH t AS (
          SELECT doc_id, text, lang,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        gated AS (SELECT * FROM t WHERE n_tokens >= 30),
        ded AS (
          SELECT doc_id, text, lang, n_tokens FROM (
            SELECT *, row_number() OVER (PARTITION BY text
                                         ORDER BY doc_id) AS rn
            FROM gated) WHERE rn = 1
        ),
        corpus AS (SELECT * FROM ded WHERE doc_id % 19 <> 0),
        cw AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '') AS ws
               FROM corpus),
        bw AS (SELECT list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '') AS ws
               FROM documents WHERE doc_id % 19 = 0),
        cg AS (SELECT DISTINCT doc_id,
                      ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                      ws[i+3] || ' ' || ws[i+4] AS g
               FROM cw, unnest(range(1, greatest(len(ws)-4, 0)+1)) AS u(i)),
        bg AS (SELECT DISTINCT
                      ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                      ws[i+3] || ' ' || ws[i+4] AS g
               FROM bw, unnest(range(1, greatest(len(ws)-4, 0)+1)) AS u(i)),
        dirty AS (SELECT DISTINCT doc_id FROM cg
                  WHERE g IN (SELECT g FROM bg)),
        clean AS (SELECT c.* FROM corpus c
                  WHERE c.doc_id NOT IN (SELECT doc_id FROM dirty)),
        cnt AS (SELECT lang, count(*) AS cnt FROM clean GROUP BY lang),
        mn AS (SELECT min(cnt) AS m FROM cnt),
        samp AS (
          SELECT cl.doc_id, cl.lang, cl.n_tokens,
                 CAST((cl.doc_id % 2147483648) * 2654435761 % 4294967296
                      AS BIGINT) AS hv
          FROM clean cl JOIN cnt USING (lang) CROSS JOIN mn
          WHERE CAST((cl.doc_id % 2147483648) * 2654435761 % 4294967296
                     AS HUGEINT) * cnt.cnt
                < CAST(mn.m AS HUGEINT) * 4294967296
        ),
        o AS (
          SELECT doc_id, lang, n_tokens, hv,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS off,
                 CAST(ROW_NUMBER() OVER (ORDER BY hv, doc_id) - 1
                      AS BIGINT) AS pos
          FROM samp
        )
        SELECT doc_id, lang, n_tokens, off AS "offset",
               off // 256 AS first_window,
               (off + greatest(n_tokens, 1) - 1) // 256 AS last_window,
               (off + greatest(n_tokens, 1) - 1) // 256 - off // 256 + 1
                 AS n_windows,
               hv, pos
        FROM o
    """,
    "doc_shuffle_positions": """
        SELECT doc_id,
               CAST((doc_id % 2147483648) * 2654435761 % 4294967296
                    AS BIGINT) AS hv,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY (doc_id % 2147483648) * 2654435761 % 4294967296,
                          doc_id) - 1 AS BIGINT) AS pos
        FROM documents
    """,
    "source_token_mixture": r"""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        c AS (SELECT source, SUM(n_tokens) AS tok FROM t GROUP BY source),
        m AS (SELECT min(tok) AS m FROM c)
        SELECT d.doc_id, d.source, d.n_tokens,
               CAST((d.doc_id % 2147483648) * 2654435761 % 4294967296
                    AS BIGINT) AS hv
        FROM t d JOIN c USING (source) CROSS JOIN m
        WHERE CAST((d.doc_id % 2147483648) * 2654435761 % 4294967296
                   AS HUGEINT) * c.tok
              < CAST(m.m AS HUGEINT) * 4294967296
           OR c.tok = 0
    """,
    "doc_unigram_lm": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                    x -> x <> '')) AS tok
          FROM documents
        ),
        ref AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
                FROM toks WHERE doc_id % 7 = 0 GROUP BY tok),
        per AS (
          SELECT t.doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(coalesce(SUM(CASE WHEN r.cnt IS NULL THEN 1 ELSE 0 END),
                               0) AS BIGINT) AS n_oov,
                 CAST(coalesce(SUM(r.cnt), 0) AS BIGINT) AS sum_ref_freq
          FROM toks t LEFT JOIN ref r USING (tok) GROUP BY t.doc_id)
        SELECT d.doc_id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(p.n_oov, 0) AS n_oov,
               coalesce(p.sum_ref_freq, 0) AS sum_ref_freq,
               CASE WHEN coalesce(p.n_tokens, 0) > 0
                    THEN CAST(p.n_oov AS DOUBLE) / p.n_tokens
                    ELSE 0.0 END AS oov_rate,
               CASE WHEN coalesce(p.n_tokens, 0) > 0
                    THEN CAST(p.sum_ref_freq AS DOUBLE) / p.n_tokens
                    ELSE 0.0 END AS mean_ref_freq
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "pii_redacted_docs": r"""
        WITH aug AS (
          SELECT doc_id,
                 coalesce(text, '')
                 || CASE WHEN doc_id % 5 = 0
                    THEN ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com now' ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                    THEN ' call 416-555-'
                         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
                 || CASE WHEN doc_id % 3 = 0
                    THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                         || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                    ELSE '' END AS text
          FROM documents
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
                   AS text_redacted,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                   AS n_emails,
               len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))
                   AS n_phones,
               len(regexp_extract_all(text,
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips
        FROM aug
    """,
    "incremental_dedup_docs": """
        WITH prior AS (
          SELECT DISTINCT sha256(text) AS text_sha
          FROM documents WHERE doc_id % 2 = 0
        )
        SELECT doc_id, text_sha FROM (
          SELECT doc_id, sha256(text) AS text_sha,
                 ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                    ORDER BY doc_id) AS rn
          FROM documents
          WHERE sha256(text) NOT IN (SELECT text_sha FROM prior)
        ) WHERE rn = 1
    """,
    "source_quality_rollup": r"""
        WITH per AS (
          SELECT source, sha256(text) AS sha,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(len(list_filter(
                     string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> ''))) AS BIGINT) AS words
          FROM documents GROUP BY source, sha256(text)
        ),
        agg AS (
          SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
                 CAST(COUNT(*) AS BIGINT) AS n_unique,
                 CAST(SUM(words) AS BIGINT) AS words
          FROM per GROUP BY source
        )
        SELECT source, n_docs, n_unique,
               n_docs - n_unique AS n_dup_docs,
               CAST(n_docs - n_unique AS DOUBLE) / n_docs AS dup_frac,
               CAST(words AS DOUBLE) / n_docs AS mean_words,
               (CAST(n_docs - n_unique AS DOUBLE) / n_docs <= 0.5
                AND CAST(words AS DOUBLE) / n_docs >= 10.0) AS keep
        FROM agg
    """,
    "doc_quality_filter": r"""
        WITH w AS (
          SELECT doc_id,
                 CAST(len(list_filter(
                     string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '')) AS BIGINT) AS n_words
          FROM documents
        ),
        t AS (SELECT quantile_disc(n_words, 0.25) AS v FROM w)
        SELECT doc_id, n_words FROM w, t WHERE n_words >= v
    """,
    "crawl_snapshot_diff": """
        WITH old AS (
          SELECT doc_id, sha256(coalesce(text, '')) AS h
          FROM documents WHERE doc_id % 11 <> 0
        ),
        nw AS (
          SELECT doc_id,
                 sha256(CASE WHEN doc_id % 7 = 0
                             THEN coalesce(text, '') || ' updated'
                             ELSE coalesce(text, '') END) AS h
          FROM documents WHERE doc_id % 13 <> 0
        )
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS status,
               COALESCE(o.h, '') AS old_hash,
               COALESCE(n.h, '') AS new_hash
        FROM old o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id
        WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h <> n.h
    """,
    "line_dedup_docs": r"""
        WITH ml AS (
          SELECT doc_id,
                 regexp_replace(coalesce(text, ''),
                                '((?:\S+ ){3}\S+) ', '\1' || chr(10), 'g')
                 || chr(10) || 'subscribe to our newsletter'
                 || CASE WHEN doc_id % 2 = 0
                         THEN chr(10) || 'follow us for more updates'
                         ELSE '' END
                 || CASE WHEN doc_id % 3 = 0
                         THEN chr(10) || 'all rights reserved worldwide'
                         ELSE '' END AS text
          FROM documents
        ),
        lines AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS line,
                 unnest(range(len(string_split(text, chr(10)))))
                     AS line_no
          FROM ml
        ),
        ne AS (SELECT * FROM lines WHERE line <> ''),
        tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
                FROM ne GROUP BY doc_id),
        kept AS (
          SELECT doc_id, line_no, line FROM (
            SELECT ne.*, ROW_NUMBER() OVER (
                PARTITION BY line ORDER BY doc_id, line_no) AS rn
            FROM ne) WHERE rn = 1
        )
        SELECT k.doc_id,
               string_agg(k.line, chr(10) ORDER BY k.line_no)
                   AS text_dedup,
               min(t.n_lines) AS n_lines,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept k JOIN tot t USING (doc_id)
        GROUP BY k.doc_id
    """,
    "doc_boilerplate_strip": r"""
        WITH ml AS (
          SELECT doc_id, source,
                 regexp_replace(coalesce(text, ''),
                                '((?:\S+ ){3}\S+) ', '\1' || chr(10), 'g')
                 || chr(10) || 'subscribe to our newsletter'
                 || CASE WHEN doc_id % 2 = 0
                         THEN chr(10) || 'follow us for more updates'
                         ELSE '' END
                 || CASE WHEN doc_id % 3 = 0
                         THEN chr(10) || 'all rights reserved worldwide'
                         ELSE '' END AS text
          FROM documents
        ),
        lines AS (
          SELECT doc_id, source,
                 unnest(string_split(text, chr(10))) AS line,
                 unnest(range(len(string_split(text, chr(10)))))
                     AS line_no
          FROM ml
        ),
        ne AS (SELECT * FROM lines WHERE line <> ''),
        tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
                FROM ne GROUP BY doc_id),
        src AS (SELECT source, count(DISTINCT doc_id) AS n_src
                FROM ne GROUP BY source),
        cnt AS (SELECT source, line, count(DISTINCT doc_id) AS n_docs
                FROM ne GROUP BY source, line),
        boiler AS (
          SELECT source, line FROM cnt JOIN src USING (source)
          WHERE n_docs >= 2 AND 2 * n_docs >= n_src
        ),
        kept AS (
          SELECT ne.* FROM ne
          ANTI JOIN boiler USING (source, line)
        )
        SELECT k.doc_id,
               string_agg(k.line, chr(10) ORDER BY k.line_no)
                   AS text_clean,
               min(t.n_lines) AS n_lines,
               CAST(min(t.n_lines) - count(*) AS BIGINT) AS n_removed
        FROM kept k JOIN tot t USING (doc_id)
        GROUP BY k.doc_id
    """,
    "jsonl_roundtrip_docs": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    "csv_roundtrip_docs": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    "warc_roundtrip_docs": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    "crawl_warc_export": """
        -- golden constants of the seeded t1 crawl's WARC round trip
        -- (extraction_quality precedent); all_sha_match is the pipeline's
        -- payload-sha table compare vs the blob archive, pinned TRUE
        SELECT CAST(392 AS BIGINT) AS n_records,
               CAST(287 AS BIGINT) AS n_unique_targets,
               CAST(621091 AS BIGINT) AS bytes_total,
               TRUE AS all_sha_match
    """,
    "multimodal_features": """
        -- golden constants of the seeded t1 crawl's media decode pass
        -- (sha-derived fake decode arithmetic is deterministic); the
        -- docs-table variant multimodal_features_docs is fully
        -- SQL-recomputed
        SELECT CAST(640 AS BIGINT) AS n_media,
               CAST(218 AS BIGINT) AS n_docs,
               CAST(779560 AS BIGINT) AS width_sum,
               CAST(726584 AS BIGINT) AS height_sum,
               TRUE AS dims_positive
    """,
    "feather_roundtrip_docs": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    "doc_graph_components": """
        WITH RECURSIVE e0 AS (
          SELECT doc_id AS ia, doc_id - doc_id % 10 AS ib FROM documents
        ),
        edges AS (SELECT ia AS a, ib AS b FROM e0
                  UNION ALL SELECT ib, ia FROM e0),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
        )
        SELECT id AS node, CAST(min(r) AS BIGINT) AS label
        FROM reach GROUP BY id
    """,
    "doc_collocations": r"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        toks AS (
          SELECT doc_id, unnest(ws) AS t,
                 unnest(range(len(ws))) AS i
          FROM w
        ),
        uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c
                FROM toks GROUP BY t),
        total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
        bc AS (
          SELECT a.t AS l, b.t AS r, CAST(count(*) AS BIGINT) AS c_xy
          FROM toks a JOIN toks b
            ON b.doc_id = a.doc_id AND b.i = a.i + 1
          GROUP BY a.t, b.t
        )
        SELECT bc.l AS "left", bc.r AS "right", bc.c_xy,
               CAST(bc.c_xy AS DOUBLE) * (SELECT CAST(n AS DOUBLE)
                                          FROM total)
                 / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        FROM bc
        JOIN uni u1 ON u1.t = bc.l
        JOIN uni u2 ON u2.t = bc.r
        WHERE bc.c_xy >= 5
        ORDER BY lift DESC, "left", "right"
        LIMIT 50
    """,
    "embedding_quantize_int8": """
        WITH s AS (
          SELECT vec_id,
                 list_transform(embedding,
                                x -> CAST(x AS DOUBLE)) AS v,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          FROM embeddings
        )
        SELECT vec_id,
               unnest(range(len(v))) AS i,
               unnest(list_transform(v, x ->
                   CASE WHEN scale = 0 THEN 0
                        ELSE CAST(floor(x / scale) AS BIGINT) END)) AS q,
               scale
        FROM s
    """,
    "doc_chunk_windows": r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        s AS (
          SELECT doc_id, ws, len(ws) AS nw,
                 CASE WHEN len(ws) = 0 THEN 0
                      ELSE (greatest(len(ws) - 64, 0) + 47) // 48 + 1
                      END AS nc
          FROM d
        )
        SELECT doc_id, k AS chunk_id,
               array_to_string(ws[48 * k + 1 : 48 * k + 64], ' ')
                   AS text_chunk,
               CAST(least(64, nw - 48 * k) AS BIGINT) AS n_tokens
        FROM s, unnest(range(0, nc)) AS t(k)
    """,
    "lang_word_quantiles": r"""
        WITH w AS (
          SELECT lang,
                 CAST(len(list_filter(
                     string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '')) AS BIGINT) AS n_words
          FROM documents
        )
        SELECT lang, 0.25 AS q, quantile_disc(n_words, 0.25) AS value
        FROM w GROUP BY lang
        UNION ALL
        SELECT lang, 0.5, quantile_disc(n_words, 0.5) FROM w GROUP BY lang
        UNION ALL
        SELECT lang, 0.75, quantile_disc(n_words, 0.75) FROM w GROUP BY lang
    """,
    "doc_tfidf_terms": """
        WITH tf AS (
          SELECT doc_id, token AS term, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id,
                       unnest(string_split(coalesce(text, ''), ' '))
                           AS token
                FROM documents)
          WHERE token <> '' GROUP BY doc_id, token
        ),
        df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
               FROM tf GROUP BY term),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        sc AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 CAST(tf.tf * n.n AS DOUBLE) / df.df AS score
          FROM tf JOIN df USING (term), n
        )
        SELECT doc_id, term, tf, df, score FROM (
          SELECT sc.*, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY score DESC, term) AS rn
          FROM sc) WHERE rn <= 3
    """,
    "doc_vocab_coverage": """
        WITH v AS (
          SELECT token FROM (
            SELECT token, COUNT(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents WHERE text IS NOT NULL)
            WHERE token <> '' GROUP BY token
            ORDER BY n DESC, token ASC LIMIT 30)
        ),
        tok AS (
          SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS t
          FROM documents
        ),
        per AS (
          SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(CASE WHEN t IN (SELECT token FROM v)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab
          FROM tok GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_tokens, 0) AS n_tokens,
               COALESCE(p.n_in_vocab, 0) AS n_in_vocab,
               CASE WHEN COALESCE(p.n_tokens, 0) > 0
                    THEN CAST(p.n_in_vocab AS DOUBLE) / p.n_tokens
                    ELSE 0.0 END AS coverage
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "doc_graph_indegree": """
        WITH n AS (SELECT COUNT(*) AS n FROM documents),
        e AS (SELECT (doc_id * 7 + 3) % (SELECT n FROM n) AS dst
              FROM documents)
        SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS indegree
        FROM e GROUP BY dst
    """,
    "doc_normalized": """
        WITH messy AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0
                      THEN '  The, QUICK (brown) fox!! '
                           || upper(coalesce(text, ''))
                      ELSE coalesce(text, '') END AS text
          FROM documents
        ),
        n AS (
          SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text),
                      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS text_norm
          FROM messy
        )
        SELECT doc_id, text_norm,
               CAST(LENGTH(text_norm) AS BIGINT) AS n_chars_norm
        FROM n
    """,
    "corpus_report": r"""
        WITH per AS (
          SELECT lang, sha256(text) AS sha,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(len(list_filter(
                     string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> ''))) AS BIGINT) AS tokens,
                 CAST(SUM(n_chars) AS BIGINT) AS chars
          FROM documents GROUP BY lang, sha256(text)
        )
        SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_unique,
               CAST(SUM(tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_docs,
               CAST(SUM(chars) AS DOUBLE) / SUM(n) AS mean_chars
        FROM per GROUP BY lang
    """,
    "best_doc_per_group": """
        SELECT source, lang, doc_id, n_chars FROM (
          SELECT source, lang, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source, lang
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents
        ) WHERE rn = 1
    """,
    "corpus_two_gen": """
        WITH g0 AS (
          SELECT sha256(text) AS text_sha, CAST(0 AS BIGINT) AS gen,
                 MIN(doc_id) AS doc_id
          FROM documents WHERE doc_id % 2 = 0 GROUP BY sha256(text)
        ),
        g1 AS (
          SELECT sha256(text) AS text_sha, CAST(1 AS BIGINT) AS gen,
                 MIN(doc_id) AS doc_id
          FROM documents
          WHERE sha256(text) NOT IN (SELECT text_sha FROM g0)
          GROUP BY sha256(text)
        )
        SELECT doc_id, text_sha, gen FROM g0
        UNION ALL
        SELECT doc_id, text_sha, gen FROM g1
    """,
    "doc_vocabulary": """
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token
              FROM documents WHERE text IS NOT NULL)
        WHERE token <> ''
        GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 100
    """,
    "semdedup_exact": _AUG_SQL.replace("WITH aug", "WITH RECURSIVE aug") + """
        , e0 AS (
          SELECT a.vec_id AS ia, b.vec_id AS ib
          FROM aug a JOIN aug b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.98
        ),
        edges AS (SELECT ia AS a, ib AS b FROM e0
                  UNION ALL SELECT ib, ia FROM e0),
        reach(id, r) AS (
          SELECT vec_id, vec_id FROM aug
          UNION
          SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
        )
        SELECT id AS vec_id, CAST(0 AS BIGINT) AS kcluster,
               CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id
    """,
    # semdedup_docs: kept_exact from the same recursive-CC CTE; the
    # n_clusters=8 containment invariant (exact-kept => approx-kept) is
    # pinned TRUE (see the query docstring for the subset argument)
    "semdedup_docs": _AUG_SQL.replace("WITH aug", "WITH RECURSIVE aug") + """
        , e0 AS (
          SELECT a.vec_id AS ia, b.vec_id AS ib
          FROM aug a JOIN aug b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.98
        ),
        edges AS (SELECT ia AS a, ib AS b FROM e0
                  UNION ALL SELECT ib, ia FROM e0),
        reach(id, r) AS (
          SELECT vec_id, vec_id FROM aug
          UNION
          SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
        )
        SELECT id AS vec_id, (min(r) = id) AS kept_exact,
               TRUE AS containment_ok
        FROM reach GROUP BY id
        ORDER BY vec_id
    """,
    "embedding_dup_pairs": _AUG_SQL + """
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM aug a CROSS JOIN aug b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding, b.embedding) >= 0.98
    """,
    "knn_bruteforce": """
        SELECT q.vec_id AS query_id, v.vec_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding, v.embedding) DESC,
                            v.vec_id
               ) - 1 AS BIGINT) AS "rank"
        FROM embeddings q CROSS JOIN embeddings v
        WHERE q.vec_id < 3
        QUALIFY "rank" < 10
    """,
    "knn_ivf_exact": """
        SELECT q.vec_id AS query_id, v.vec_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding, v.embedding) DESC,
                            v.vec_id
               ) - 1 AS BIGINT) AS "rank"
        FROM embeddings q CROSS JOIN embeddings v
        WHERE q.vec_id < 3
        QUALIFY "rank" < 10
    """,
    "embedding_label_stats": """
        SELECT label, COUNT(*) AS n, MIN(vec_id) AS min_vec_id
        FROM embeddings GROUP BY label
    """,
    "publisher_cursor_scan": """
        SELECT event_id, ts, event_type
        FROM events
        WHERE ts > TIMESTAMP '2024-01-15'
           OR (ts = TIMESTAMP '2024-01-15' AND event_id > 0)
        ORDER BY ts, event_id
        LIMIT 100
    """,
    # crawl_stats / round_metrics summarize the SEEDED t1 crawl
    # (sf-independent, deterministic — the oracle-equality pytest pins the
    # underlying state): their outputs are fixed golden tables, pinned
    # like extraction_quality's
    "crawl_stats": """
        SELECT * FROM (VALUES
            ('dead',    CAST(46 AS BIGINT)),
            ('fetched', CAST(284 AS BIGINT)),
            ('pending', CAST(10 AS BIGINT))
        ) AS t(status, n)
    """,
    "round_metrics": """
        SELECT * FROM (VALUES
            (CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(186 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
            (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(186 AS BIGINT), CAST(21 AS BIGINT), CAST(21 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(20 AS BIGINT), CAST(0 AS BIGINT)),
            (CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(186 AS BIGINT), CAST(198 AS BIGINT), CAST(61 AS BIGINT), CAST(4 AS BIGINT), CAST(138 AS BIGINT), CAST(57 AS BIGINT), CAST(3 AS BIGINT)),
            (CAST(0 AS BIGINT), CAST(3 AS BIGINT), CAST(186 AS BIGINT), CAST(111 AS BIGINT), CAST(104 AS BIGINT), CAST(7 AS BIGINT), CAST(37 AS BIGINT), CAST(71 AS BIGINT), CAST(3 AS BIGINT)),
            (CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(194 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
            (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(194 AS BIGINT), CAST(21 AS BIGINT), CAST(21 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(20 AS BIGINT), CAST(0 AS BIGINT)),
            (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(194 AS BIGINT), CAST(201 AS BIGINT), CAST(65 AS BIGINT), CAST(3 AS BIGINT), CAST(84 AS BIGINT), CAST(111 AS BIGINT), CAST(6 AS BIGINT)),
            (CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(194 AS BIGINT), CAST(115 AS BIGINT), CAST(108 AS BIGINT), CAST(4 AS BIGINT), CAST(34 AS BIGINT), CAST(77 AS BIGINT), CAST(4 AS BIGINT)),
            (CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(75 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
            (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(75 AS BIGINT), CAST(21 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(20 AS BIGINT), CAST(0 AS BIGINT)),
            (CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(75 AS BIGINT), CAST(204 AS BIGINT), CAST(65 AS BIGINT), CAST(3 AS BIGINT), CAST(31 AS BIGINT), CAST(163 AS BIGINT), CAST(10 AS BIGINT)),
            (CAST(2 AS BIGINT), CAST(3 AS BIGINT), CAST(75 AS BIGINT), CAST(115 AS BIGINT), CAST(10 AS BIGINT), CAST(0 AS BIGINT), CAST(30 AS BIGINT), CAST(80 AS BIGINT), CAST(5 AS BIGINT)),
            (CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(193 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
            (CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(193 AS BIGINT), CAST(21 AS BIGINT), CAST(21 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(20 AS BIGINT), CAST(1 AS BIGINT)),
            (CAST(3 AS BIGINT), CAST(2 AS BIGINT), CAST(193 AS BIGINT), CAST(204 AS BIGINT), CAST(68 AS BIGINT), CAST(0 AS BIGINT), CAST(10 AS BIGINT), CAST(184 AS BIGINT), CAST(10 AS BIGINT)),
            (CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(193 AS BIGINT), CAST(115 AS BIGINT), CAST(104 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(80 AS BIGINT), CAST(35 AS BIGINT))
        ) AS t("round", shard, claims_total, frontier_size, claimed,
               new_urls, pending, fetched, dead)
    """,
    "origin_budget": """
        SELECT event_type AS origin, COUNT(*) AS n
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15'
        GROUP BY event_type
    """,
    "publisher_telemetry": """
        SELECT event_type AS channel, COUNT(*) AS published,
               MIN(ts) AS first_at, MAX(ts) AS last_at
        FROM events GROUP BY event_type
    """,
    # html_extraction / jsonld_structured_extraction run extraction
    # over the STATIC 48-fixture golden corpus (sf-independent, fully
    # deterministic), so their expected outputs ARE fixed golden
    # tables — pinned VALUES oracles, same rationale as
    # extraction_quality below; any extractor or fixture drift
    # hash-mismatches loudly at the driver gate.
    "html_extraction": """
        SELECT * FROM (VALUES
            ('https://black_press.fixture.test/page', 'Bulletin', CAST(59 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://br_paragraphs.fixture.test/page', 'BR Article', CAST(55 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://byline.fixture.test/page', 'Bylined', CAST(62 AS BIGINT), 'heuristic', '', 'other', 'By Alex Reporter', '', ''),
            ('https://comments_in_body.fixture.test/page', 'Commented', CAST(55 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://date_fallback.fixture.test/page', 'Dated', CAST(64 AS BIGINT), 'heuristic', '', 'other', '', '2024-05-05T08:00:00Z', ''),
            ('https://declared_cp1252.fixture.test/page', 'Legacy Charset', CAST(57 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://density_sidebar.fixture.test/page', 'Sidebar Trap', CAST(59 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://density_too_short.fixture.test/page', 'Thin Page', CAST(2 AS BIGINT), 'heuristic', '', 'stub', '', '', ''),
            ('https://drupal.fixture.test/page', 'Council Meeting Notes', CAST(57 AS BIGINT), 'template', 'drupal', 'other', '', '', ''),
            ('https://duplicate_og.fixture.test/page', 'First OG Title', CAST(54 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://excludes.fixture.test/page', 'With Junk', CAST(60 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://figure_caption.fixture.test/page', 'Figures', CAST(66 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://french_entities.fixture.test/page', 'L''actualité régionale & plus', CAST(54 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://generic_og.fixture.test/page', 'Generic OG Headline', CAST(56 AS BIGINT), 'template', 'generic_og_article', 'article', '', '', ''),
            ('https://h1_title.fixture.test/page', 'The H1 Fallback Headline', CAST(59 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://jsonld_cdata.fixture.test/page', 'OG CDATA Headline', CAST(58 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://jsonld_event.fixture.test/page', 'Fall Fair', CAST(14 AS BIGINT), 'readability', '', 'stub', '', '2024-09-01T09:00:00Z', 'Event'),
            ('https://jsonld_image_array.fixture.test/page', 'Array Image Headline', CAST(57 AS BIGINT), 'heuristic', '', 'article', 'First Author', '2024-06-02T12:00:00Z', 'NewsArticle'),
            ('https://jsonld_job.fixture.test/page', 'Heavy Equipment Operator - North Mining Co', CAST(58 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://jsonld_list_blog.fixture.test/page', 'Blog Post Headline', CAST(54 AS BIGINT), 'heuristic', '', 'article', 'Solo Blogger', '2024-04-04T09:30:00Z', 'BlogPosting'),
            ('https://jsonld_malformed.fixture.test/page', 'OG Wins Here', CAST(57 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://jsonld_nested_cdata.fixture.test/page', 'OG Nested Headline', CAST(57 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://jsonld_news.fixture.test/page', 'JSON-LD Headline', CAST(61 AS BIGINT), 'heuristic', '', 'article', 'Jane Writer', '2024-03-01T10:00:00Z', 'NewsArticle'),
            ('https://jsonld_object_context.fixture.test/page', 'Object Context Headline', CAST(54 AS BIGINT), 'heuristic', '', 'article', 'Objectful Author', '2024-08-08T11:00:00Z', 'Article'),
            ('https://jsonld_press_release.fixture.test/page', 'Press Release Headline', CAST(54 AS BIGINT), 'heuristic', '', 'other', '', '2024-07-07T08:00:00Z', 'PressRelease'),
            ('https://jsonld_recipe.fixture.test/page', 'Maple Oat Cookies | Kitchen Site', CAST(59 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://listing.fixture.test/page', 'Section Index', CAST(80 AS BIGINT), 'heuristic', '', 'listing', '', '', ''),
            ('https://malformed_entities.fixture.test/page', 'Entity Soup', CAST(63 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://meta_published_time.fixture.test/page', 'Meta Date Headline', CAST(57 AS BIGINT), 'heuristic', '', 'article', '', '2024-01-15T06:00:00Z', 'NewsArticle'),
            ('https://misnested_tags.fixture.test/page', 'Misnested', CAST(68 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://mixed_template.fixture.test/page', 'Migrated Story Headline', CAST(67 AS BIGINT), 'template', 'wordpress', 'other', '', '', ''),
            ('https://nav_heavy.fixture.test/page', 'Nav Heavy', CAST(45 AS BIGINT), 'readability', '', 'listing', '', '', ''),
            ('https://og_article.fixture.test/page', 'OG Titled Piece', CAST(57 AS BIGINT), 'template', 'generic_og_article', 'article', '', '', ''),
            ('https://og_type_video.fixture.test/page', 'Video OG Title', CAST(52 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://postmedia.fixture.test/page', 'Herald', CAST(60 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://readability_only.fixture.test/page', 'Odd Layout', CAST(25 AS BIGINT), 'readability', '', 'stub', '', '', ''),
            ('https://rel_author.fixture.test/page', 'Rel Author Page', CAST(52 AS BIGINT), 'heuristic', '', 'other', 'Pat Journalist', '', ''),
            ('https://script_style_in_body.fixture.test/page', 'Inline Junk', CAST(55 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://signin.fixture.test/page', 'Members', CAST(10 AS BIGINT), 'readability', '', 'other', '', '', ''),
            ('https://stub.fixture.test/page', 'Stubby', CAST(6 AS BIGINT), 'readability', '', 'stub', '', '', ''),
            ('https://table_layout.fixture.test/page', 'Table Era', CAST(57 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://template_body_missing.fixture.test/page', 'No Entry Content', CAST(57 AS BIGINT), 'heuristic', 'wordpress', 'other', '', '', ''),
            ('https://torstar.fixture.test/page', 'Star Page Title', CAST(57 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://two_scripts.fixture.test/page', 'Second Script Headline', CAST(57 AS BIGINT), 'heuristic', '', 'article', 'Script Author', '2024-02-02T10:00:00Z', 'NewsArticle'),
            ('https://unquoted_attrs.fixture.test/page', 'Unquoted', CAST(57 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://uppercase_tags.fixture.test/page', 'Shouted Markup', CAST(57 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://village_media.fixture.test/page', 'Village', CAST(56 AS BIGINT), 'heuristic', '', 'other', '', '', ''),
            ('https://wordpress.fixture.test/page', 'A WordPress Story', CAST(60 AS BIGINT), 'template', 'wordpress', 'other', '', '', '')
        ) AS t(url, title, word_count, extraction_method,
               template_name, page_type, author, published_date,
               jsonld_schema_type)
    """,
    "jsonld_structured_extraction": """
        SELECT * FROM (VALUES
            ('black_press', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('br_paragraphs', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('byline', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('comments_in_body', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('date_fallback', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('declared_cp1252', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('density_sidebar', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('density_too_short', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('drupal', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('duplicate_og', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('excludes', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('figure_caption', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('french_entities', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('generic_og', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('h1_title', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_cdata', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_event', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_image_array', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_job', '', CAST(0 AS BIGINT), 'null', 'Heavy Equipment Operator', 'North Mining Co', 'full_time', '{"extraction_method": "schema_org", "title": "Heavy Equipment Operator", "company": "North Mining Co", "location": "Sudbury, ON", "employment_type": "full_time", "posted_date": "2024-04-02", "expires_date": "2024-05-02", "description": "Operate haul trucks and loaders at the open pit site.", "industry": "Mining", "qualifications": "Class DZ licence and two years experience.", "benefits": "Extended health and dental.", "salary_currency": "CAD", "salary_min": 62000.0, "salary_max": 78000.0}'),
            ('jsonld_list_blog', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_malformed', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_nested_cdata', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_news', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_object_context', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_press_release', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('jsonld_recipe', 'Maple Oat Cookies', CAST(27 AS BIGINT), '{"extraction_method": "schema_org", "name": "Maple Oat Cookies", "ingredients": ["2 cups rolled oats", "1 cup flour", "1/2 cup maple syrup"], "instructions": "Mix the dry ingredients. Fold in the maple syrup. Bake at 350F for 12 minutes.", "prep_time_minutes": 15, "cook_time_minutes": 12, "total_time_minutes": 27, "servings": "24 cookies", "category": "Dessert", "cuisine": "Canadian", "calories": "110 calories", "image_url": "https://kitchen.test/maple-oat.jpg", "rating": 4.6, "rating_count": 87}', '', '', '', 'null'),
            ('listing', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('malformed_entities', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('meta_published_time', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('misnested_tags', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('mixed_template', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('nav_heavy', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('og_article', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('og_type_video', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('postmedia', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('readability_only', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('rel_author', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('script_style_in_body', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('signin', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('stub', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('table_layout', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('template_body_missing', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('torstar', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('two_scripts', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('unquoted_attrs', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('uppercase_tags', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('village_media', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null'),
            ('wordpress', '', CAST(0 AS BIGINT), 'null', '', '', '', 'null')
        ) AS t(fixture, recipe_name, recipe_total_minutes,
               recipe_json, job_title, job_company,
               job_employment_type, job_json)
    """,
    # extraction_quality runs the DOM-extraction chain over the
    # deterministic 48-page fixture corpus — not computable in SQL, but the
    # expected output IS a fixed golden table; the oracle pins the pipeline
    # to it (any extractor/fixture drift hash-mismatches loudly). The two
    # Schema.org recipe/job fixtures land in ('other','heuristic','50+').
    "extraction_quality": """
        -- pinned over the 48-fixture golden corpus (fixture URLs are
        -- name.fixture.test, so only DETECT-based templates resolve;
        -- domain-routed ones exercise 'template' in their own tests)
        SELECT * FROM (VALUES
            ('article', 'heuristic',   '50+', CAST(6 AS BIGINT)),
            ('article', 'template',    '50+', CAST(2 AS BIGINT)),
            ('listing', 'heuristic',   '50+', CAST(1 AS BIGINT)),
            ('listing', 'readability', '0+',  CAST(1 AS BIGINT)),
            ('other',   'heuristic',   '50+', CAST(30 AS BIGINT)),
            ('other',   'readability', '0+',  CAST(1 AS BIGINT)),
            ('other',   'template',    '50+', CAST(3 AS BIGINT)),
            ('stub',    'heuristic',   '0+',  CAST(1 AS BIGINT)),
            ('stub',    'readability', '0+',  CAST(3 AS BIGINT))
        ) AS t(page_type, extraction_method, wc_bucket, n)
    """,
    "doc_dsir_weights": r"""
        WITH toks AS (
          SELECT doc_id, lang,
                 unnest(regexp_extract_all(lower(coalesce(text, '')),
                                           '[a-z0-9_]+')) AS w
          FROM documents
        ),
        bk AS (
          SELECT doc_id, lang,
                 CAST(CAST(md5_number_upper(w) AS HUGEINT) % 1024
                      AS BIGINT) AS b
          FROM toks
        ),
        t AS (SELECT b, count(*) AS tc FROM bk WHERE lang = 'en'
              GROUP BY b),
        r AS (SELECT b, count(*) AS rc FROM bk GROUP BY b)
        SELECT bk.doc_id,
               CAST(sum(coalesce(t.tc, 0) + 1) AS BIGINT) AS num,
               CAST(sum(coalesce(r.rc, 0) + 1) AS BIGINT) AS den,
               CAST(sum(coalesce(t.tc, 0) + 1) AS DOUBLE)
                   / sum(coalesce(r.rc, 0) + 1) AS weight
        FROM bk LEFT JOIN t ON bk.b = t.b LEFT JOIN r ON bk.b = r.b
        GROUP BY bk.doc_id
    """,
    "doc_bm25_topk": r"""
        WITH d AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')),
                                    '[a-z0-9_]+') AS tw
          FROM documents
        ),
        st AS (
          SELECT doc_id, CAST(len(tw) AS DOUBLE) AS dl,
                 CAST(len(list_filter(tw, x -> x = 'merge'))
                      AS DOUBLE) AS tf1,
                 CAST(len(list_filter(tw, x -> x = 'stream'))
                      AS DOUBLE) AS tf2,
                 CAST(len(list_filter(tw, x -> x = 'window'))
                      AS DOUBLE) AS tf3
          FROM d
        ),
        g AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS BIGINT) AS total,
                 CAST(count(*) FILTER (tf1 > 0) AS BIGINT) AS df1,
                 CAST(count(*) FILTER (tf2 > 0) AS BIGINT) AS df2,
                 CAST(count(*) FILTER (tf3 > 0) AS BIGINT) AS df3
          FROM st
        ),
        sc AS (
          SELECT st.doc_id,
                 ((1.0 - 0.75) + (0.75 * (st.dl
                     / (CAST(g.total AS DOUBLE) / g.n)))) AS norm,
                 st.tf1, st.tf2, st.tf3, g.n, g.df1, g.df2, g.df3
          FROM st, g
        ),
        co AS (
          SELECT doc_id,
            CASE WHEN tf1 > 0 THEN
              ((CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)
               * (tf1 * (1.2 + 1.0))) / (tf1 + (1.2 * norm))
            ELSE 0.0 END AS c1,
            CASE WHEN tf2 > 0 THEN
              ((CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)
               * (tf2 * (1.2 + 1.0))) / (tf2 + (1.2 * norm))
            ELSE 0.0 END AS c2,
            CASE WHEN tf3 > 0 THEN
              ((CAST(n - df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5)
               * (tf3 * (1.2 + 1.0))) / (tf3 + (1.2 * norm))
            ELSE 0.0 END AS c3,
            (tf1 > 0 OR tf2 > 0 OR tf3 > 0) AS anym
          FROM sc
        )
        SELECT doc_id, ((c1 + c2) + c3) AS score
        FROM co WHERE anym ORDER BY score DESC, doc_id LIMIT 25
    """,
    "doc_inverted_postings": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text, '')),
                                           '[a-z0-9_]+')) AS w,
                 unnest(range(len(regexp_extract_all(lower(coalesce(text,
                     '')), '[a-z0-9_]+')))) AS pos
          FROM documents
        ),
        dfs AS (
          SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM toks GROUP BY w
        ),
        top AS (SELECT w, df FROM dfs ORDER BY df DESC, w LIMIT 50)
        SELECT t.w AS term, top.df, t.doc_id,
               CAST(count(*) AS BIGINT) AS tf,
               CAST(min(t.pos) AS BIGINT) AS first_pos
        FROM toks t JOIN top ON t.w = top.w
        GROUP BY t.w, top.df, t.doc_id
    """,
    "events_running_totals": """
        SELECT user_id, event_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_n,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER w
                    AS BIGINT) AS running_value_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """,
    "doc_weighted_sample": r"""
        WITH w AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                          '[a-z0-9_]+')) AS BIGINT) AS weight
          FROM documents
        ),
        c AS (
          SELECT doc_id, weight,
                 CAST(coalesce(SUM(weight) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS off,
                 CAST(SUM(weight) OVER () AS BIGINT) AS total
          FROM w
        ),
        p AS (
          SELECT CAST(((2 * j + 1) * (SELECT max(total) FROM c))
                      // (2 * 40) AS BIGINT) AS pos
          FROM generate_series(0, 39) AS t(j)
        )
        SELECT c.doc_id, c.weight, CAST(count(*) AS BIGINT) AS n_hits
        FROM c JOIN p ON p.pos >= c.off AND p.pos < c.off + c.weight
        GROUP BY c.doc_id, c.weight
    """,
    "doc_skyline": r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''),
                                                '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 CAST(len(ws) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
          FROM d
        )
        SELECT a.doc_id, a.n_tokens, a.n_distinct
        FROM m a
        WHERE NOT EXISTS (
          SELECT 1 FROM m b
          WHERE b.n_tokens >= a.n_tokens
            AND b.n_distinct >= a.n_distinct
            AND (b.n_tokens > a.n_tokens
                 OR b.n_distinct > a.n_distinct))
    """,
    "doc_phrase_search": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text, '')),
                                           '[a-z0-9_]+')) AS w,
                 unnest(range(len(regexp_extract_all(lower(coalesce(text,
                     '')), '[a-z0-9_]+')))) AS pos
          FROM documents
        )
        SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(min(a.pos) AS BIGINT) AS first_pos
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         AND a.w = 'data' AND b.w = 'stream'
        GROUP BY a.doc_id
    """,
    "doc_bigram_stats": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text, '')),
                                           '[a-z0-9_]+')) AS w,
                 unnest(range(len(regexp_extract_all(lower(coalesce(text,
                     '')), '[a-z0-9_]+')))) AS pos
          FROM documents
        ),
        bg AS (
          SELECT a.doc_id, a.w || ' ' || b.w AS bigram
          FROM toks a JOIN toks b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        corpus AS (
          SELECT bigram, CAST(count(*) AS BIGINT) AS c
          FROM bg GROUP BY bigram
        )
        SELECT bg.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(count(DISTINCT bg.bigram) AS BIGINT)
                 AS distinct_bigrams,
               CAST(sum(corpus.c) AS BIGINT) AS familiarity_mass,
               CAST(sum(CASE WHEN corpus.c = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS hapax_bigrams
        FROM bg JOIN corpus USING (bigram)
        GROUP BY bg.doc_id
    """,
    "events_rollup": r"""
        SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
                    ELSE event_type END AS event_type,
               CASE WHEN GROUPING(day) = 1 THEN 'ALL' ELSE day END AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               CAST(GROUPING(event_type, day) AS BIGINT) AS lvl
        FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value
              FROM events)
        GROUP BY ROLLUP(event_type, day)
    """,
    "events_user_gaps": r"""
        WITH o AS (
          SELECT user_id,
                 date_diff('microsecond',
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id),
                           ts) AS gap
          FROM events
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(gap) AS BIGINT) AS n_gaps,
               CAST(min(gap) AS BIGINT) AS min_gap_us,
               CAST(max(gap) AS BIGINT) AS max_gap_us,
               CAST(sum(gap) AS BIGINT) AS sum_gap_us
        FROM o GROUP BY user_id
        HAVING count(gap) >= 1
    """,
    "doc_rank_ntile": r"""
        WITH t AS (
          SELECT doc_id, lang,
                 CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                          '[a-z0-9_]+')) AS BIGINT) AS n_tokens
          FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               CAST(row_number() OVER w AS BIGINT) AS rnk,
               CAST(ntile(4) OVER w AS BIGINT) AS tile
        FROM t WINDOW w AS (PARTITION BY lang ORDER BY n_tokens, doc_id)
    """,
    "lang_token_char_corr": r"""
        WITH t AS (
          SELECT lang,
                 CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                          '[a-z0-9_]+')) AS BIGINT) AS x,
                 CAST(length(coalesce(text, '')) AS BIGINT) AS y
          FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sum_x,
               CAST(sum(y) AS BIGINT) AS sum_y,
               CAST(sum(x*y) AS BIGINT) AS sum_xy,
               CAST(sum(x*x) AS BIGINT) AS sum_x2,
               CAST(sum(y*y) AS BIGINT) AS sum_y2,
               ((CAST(count(*) AS DOUBLE) * CAST(sum(x*y) AS DOUBLE))
                - (CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
               / (sqrt((CAST(count(*) AS DOUBLE)
                        * CAST(sum(x*x) AS DOUBLE))
                       - (CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)))
                  * sqrt((CAST(count(*) AS DOUBLE)
                          * CAST(sum(y*y) AS DOUBLE))
                         - (CAST(sum(y) AS DOUBLE)
                            * CAST(sum(y) AS DOUBLE)))) AS corr
        FROM t GROUP BY lang
        HAVING (sqrt((CAST(count(*) AS DOUBLE)
                      * CAST(sum(x*x) AS DOUBLE))
                     - (CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)))
                * sqrt((CAST(count(*) AS DOUBLE)
                        * CAST(sum(y*y) AS DOUBLE))
                       - (CAST(sum(y) AS DOUBLE)
                          * CAST(sum(y) AS DOUBLE)))) <> 0
    """,
    "customer_order_totals": r"""
        SELECT c.c_custkey,
               CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(coalesce(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5)
                                      AS BIGINT)), 0) AS BIGINT)
                 AS total_cents
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    "events_props_stats": r"""
        WITH t AS (
          SELECT event_type,
                 CAST(CASE WHEN json_type(props, '$.k')
                             IN ('BIGINT', 'UBIGINT')
                      THEN props->>'$.k' END AS BIGINT) AS k
          FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(k) AS BIGINT) AS n_with_k,
               CAST(sum(coalesce(k, 0)) AS BIGINT) AS sum_k,
               CAST(min(coalesce(k, 0)) AS BIGINT) AS min_k,
               CAST(max(coalesce(k, 0)) AS BIGINT) AS max_k
        FROM t GROUP BY event_type
    """,
    "events_funnel": r"""
        WITH s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1
          GROUP BY e.user_id
        ),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          GROUP BY e.user_id
        )
        SELECT s1.user_id,
               CAST(epoch_us(t1) AS BIGINT) AS t_view_us,
               CAST(epoch_us(t2) AS BIGINT) AS t_click_us,
               CAST(epoch_us(t3) AS BIGINT) AS t_purchase_us
        FROM s1 JOIN s2 ON s1.user_id = s2.user_id
                JOIN s3 ON s1.user_id = s3.user_id
    """,
    "events_cohort_retention": r"""
        WITH d AS (
          SELECT DISTINCT user_id,
                 CAST(date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS BIGINT) AS day
          FROM events
        ),
        c AS (
          SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id
        )
        SELECT c.cohort AS cohort_day,
               CAST(d.day - c.cohort AS BIGINT) AS day_offset,
               CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
        FROM d JOIN c ON d.user_id = c.user_id
        GROUP BY c.cohort, d.day - c.cohort
    """,
    "user_type_pivot": r"""
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
                 AS n_click,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
                 AS n_error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                 AS n_purchase,
               CAST(count(*) FILTER (event_type = 'signup') AS BIGINT)
                 AS n_signup,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
                 AS n_view
        FROM events GROUP BY user_id
    """,
    "lineitem_depth_histogram": r"""
        WITH c AS (
          SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                 AS cents
          FROM lineitem
        ),
        e AS (
          SELECT quantile_disc(cents, 0.25) AS q1,
                 quantile_disc(cents, 0.50) AS q2,
                 quantile_disc(cents, 0.75) AS q3
          FROM c
        )
        SELECT CASE WHEN cents <= q1 THEN 0
                    WHEN cents <= q2 THEN 1
                    WHEN cents <= q3 THEN 2
                    ELSE 3 END AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM c, e
        GROUP BY 1
    """,
    "lineitem_price_histogram": r"""
        SELECT CAST(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                    // 10000 AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1
    """,
    "user_event_signature": r"""
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id)
                 AS signature
        FROM events GROUP BY user_id
    """,
    "doc_graph_triangles": r"""
        WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        raw AS (
          SELECT doc_id AS s, (doc_id + 1) % (SELECT n FROM nn) AS d
          FROM documents
          UNION ALL
          SELECT doc_id, (doc_id + 2) % (SELECT n FROM nn)
          FROM documents
        ),
        e AS (
          SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
          FROM raw WHERE s <> d
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        corners AS (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        )
        SELECT CAST(node AS BIGINT) AS node,
               CAST(count(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY node
    """,
    "events_cube": r"""
        SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
                    ELSE event_type END AS event_type,
               CASE WHEN GROUPING(day) = 1 THEN 'ALL' ELSE day END AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               CAST(GROUPING(event_type, day) AS BIGINT) AS lvl
        FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value
              FROM events)
        GROUP BY CUBE(event_type, day)
    """,
    "events_running_totals_salted": """
        SELECT user_id, event_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_n,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER w
                    AS BIGINT) AS running_value_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """,
    "events_since_purchase": r"""
        WITH o AS (
          SELECT user_id, event_id, ts,
                 CAST(event_type = 'purchase' AS INT) AS is_p,
                 SUM(CAST(event_type = 'purchase' AS INT)) OVER w AS seg
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING)
        )
        SELECT user_id, event_id,
               CAST(CASE WHEN is_p = 1 THEN 0
                    ELSE ROW_NUMBER() OVER (PARTITION BY user_id, seg
                                            ORDER BY ts, event_id) - 1
                    END AS BIGINT) AS since_purchase,
               CAST(CASE WHEN seg - is_p > 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS had_purchase
        FROM o
    """,
    "doc_tile_mixture": r"""
        WITH t AS (
          SELECT doc_id, lang,
                 CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                          '[a-z0-9_]+')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        tiles AS (
          SELECT doc_id, lang,
                 CAST(ntile(4) OVER (PARTITION BY lang
                                     ORDER BY n_tokens, doc_id)
                      AS BIGINT) AS tile
          FROM t
        ),
        h AS (
          SELECT doc_id, lang, tile,
                 CAST((doc_id % 2147483648) * 2654435761 % 4294967296
                      AS BIGINT) AS hv
          FROM tiles
        )
        SELECT doc_id, lang, tile, hv FROM (
          SELECT h.*, row_number() OVER (PARTITION BY lang, tile
                                         ORDER BY hv, doc_id) AS rn
          FROM h)
        WHERE rn <= 8
    """,
    "lineitem_bloom_semijoin": r"""
        SELECT l.l_orderkey AS o_orderkey,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100
                                   + 0.5) AS BIGINT)) AS BIGINT)
                 AS rev_cents
        FROM lineitem l
        WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
                               WHERE o_totalprice >= 300000.0)
        GROUP BY l.l_orderkey
    """,
    "events_daily_top_users": r"""
        WITH c AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1, 2
        )
        SELECT day, user_id, n_events, CAST(rn AS BIGINT) AS rnk FROM (
          SELECT c.*, row_number() OVER (PARTITION BY day
                                         ORDER BY n_events DESC,
                                                  user_id) AS rn
          FROM c)
        WHERE rn <= 5
    """,
    "doc_split_assignment": r"""
        WITH t AS (
          SELECT lang,
                 CASE WHEN (doc_id % 2147483648) * 2654435761
                           % 4294967296 % 100 < 90 THEN 'train'
                      WHEN (doc_id % 2147483648) * 2654435761
                           % 4294967296 % 100 < 95 THEN 'val'
                      ELSE 'test' END AS split,
                 CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                          '[a-z0-9_]+')) AS BIGINT) AS n_tokens
          FROM documents
        )
        SELECT lang, split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM t GROUP BY lang, split
    """,
    "events_daily_deltas": r"""
        WITH d AS (
          SELECT CAST(date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS BIGINT) AS day,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
                      AS BIGINT) AS value_cents
          FROM events GROUP BY 1
        ),
        l AS (
          SELECT day, n, value_cents,
                 lag(day) OVER w AS pday,
                 lag(n) OVER w AS pn,
                 lag(value_cents) OVER w AS pc
          FROM d WINDOW w AS (ORDER BY day)
        )
        SELECT day, n, value_cents,
               CAST(CASE WHEN day - pday = 1 THEN n - pn ELSE 0 END
                    AS BIGINT) AS delta_n,
               CAST(CASE WHEN day - pday = 1 THEN value_cents - pc
                    ELSE 0 END AS BIGINT) AS delta_cents,
               CAST(CASE WHEN day - pday = 1 THEN 1 ELSE 0 END
                    AS BIGINT) AS has_prev
        FROM l
    """,
    "f1_media_budget_take": r"""
        WITH d AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(coalesce(text, ''),
                                                    '\s+'),
                                 x -> x <> '')) AS nw
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 CAST(((nw + 19) // 20) // 2 AS BIGINT) AS n_media
          FROM d
        ),
        c AS (
          SELECT doc_id, n_media,
                 CAST(coalesce(SUM(n_media) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS media_off
          FROM m
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, n_media, media_off
        FROM c WHERE media_off < 400
    """,
    "user_value_trend": r"""
        WITH t AS (
          SELECT user_id,
                 CAST(date_diff('second', TIMESTAMP '2024-01-01',
                                ts) AS BIGINT) AS x,
                 CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS y
          FROM events
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               ((CAST(count(*) AS DOUBLE) * CAST(sum(x*y) AS DOUBLE))
                - (CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
               / ((CAST(count(*) AS DOUBLE) * CAST(sum(x*x) AS DOUBLE))
                  - (CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)))
                 AS slope_cents_per_sec
        FROM t GROUP BY user_id
        HAVING ((CAST(count(*) AS DOUBLE) * CAST(sum(x*x) AS DOUBLE))
                - (CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)))
               <> 0
    """,
    "event_value_mad": r"""
        WITH t AS (
          SELECT event_type,
                 CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c
          FROM events
        ),
        m AS (
          SELECT event_type,
                 CAST(quantile_disc(c, 0.5) AS BIGINT) AS median_cents
          FROM t GROUP BY event_type
        )
        SELECT t.event_type, m.median_cents,
               CAST(quantile_disc(abs(t.c - m.median_cents), 0.5)
                    AS BIGINT) AS mad_cents
        FROM t JOIN m ON t.event_type = m.event_type
        GROUP BY t.event_type, m.median_cents
    """,
    "doc_fuzzy_title_pairs": r"""
        WITH t AS (
          SELECT doc_id,
                 lower(substr(coalesce(text, ''), 1, 16)) AS title
          FROM documents
        )
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
        FROM t a JOIN t b ON a.doc_id < b.doc_id
         AND levenshtein(a.title, b.title) <= 1
    """,
    "events_rolling_sum": r"""
        SELECT user_id, event_id,
               CAST(count(*) OVER w AS BIGINT) AS w_n,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER w
                    AS BIGINT) AS w_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "events_markov_transitions": r"""
        WITH o AS (
          SELECT user_id, event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     AS next_type
          FROM events
        )
        SELECT event_type AS prev_type, next_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type)
                    AS BIGINT) AS n_from
        FROM o WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
    "events_value_mode": r"""
        SELECT event_type, mode_cents, n_mode FROM (
          SELECT event_type,
                 CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS mode_cents,
                 CAST(COUNT(*) AS BIGINT) AS n_mode,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY COUNT(*) DESC,
                            CAST(FLOOR(value*100 + 0.5) AS BIGINT) ASC)
                     AS rn
          FROM events
          GROUP BY event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT)
        ) WHERE rn = 1
    """,
    "events_rolling_active": r"""
        WITH du AS (
          SELECT DISTINCT
                 CAST(date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS BIGINT) AS day,
                 user_id
          FROM events
        ),
        days AS (SELECT DISTINCT day FROM du)
        SELECT days.day,
               CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS n_users_7d
        FROM days JOIN du ON du.day BETWEEN days.day - 6 AND days.day
        GROUP BY days.day
    """,
    "events_first_touch": r"""
        WITH v AS (
          SELECT user_id,
                 CAST(epoch_us(ts) AS BIGINT) AS vts
          FROM events WHERE event_type = 'view'
        ),
        p AS (
          SELECT DISTINCT user_id,
                 CAST(epoch_us(ts) AS BIGINT) AS pts
          FROM events WHERE event_type = 'purchase'
        ),
        a AS (
          SELECT v.user_id, v.vts,
                 (SELECT MIN(p.pts) FROM p
                  WHERE p.user_id = v.user_id AND p.pts >= v.vts
                    AND p.pts <= v.vts + 7*86400000000) AS apts
          FROM v
        )
        SELECT user_id, apts AS purchase_us,
               CAST(MIN(vts) AS BIGINT) AS first_touch_us,
               CAST(COUNT(*) AS BIGINT) AS n_touches
        FROM a WHERE apts IS NOT NULL
        GROUP BY user_id, apts
    """,
    "events_hour_moments": r"""
        WITH s AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(h) AS s1, SUM(h*h) AS s2,
                 SUM(h*h*h) AS s3, SUM(h*h*h*h) AS s4
          FROM (SELECT event_type,
                       CAST(extract('hour' FROM ts) AS BIGINT) AS h
                FROM events)
          GROUP BY event_type
        ),
        m AS (
          SELECT event_type, n,
                 CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                 CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                 CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                 CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
          FROM s
        ),
        c AS (SELECT event_type, n, m1, r2, r3, r4,
                     r2 - m1 * m1 AS m2 FROM m)
        SELECT event_type, n, m1 AS mean_hour, sqrt(m2) AS std_hour,
               (r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1)
                 / (m2 * sqrt(m2)) AS skew_hour,
               (r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
                - 3.0 * m1 * m1 * m1 * m1) / (m2 * m2) - 3.0 AS kurt_hour
        FROM c WHERE m2 > 0.0
    """,
    "events_user_streaks": r"""
        WITH du AS (
          SELECT DISTINCT user_id,
                 CAST(date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS BIGINT) AS day
          FROM events
        ),
        r AS (
          SELECT user_id, day,
                 day - ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY day) AS anchor
          FROM du
        ),
        runs AS (SELECT user_id, anchor, COUNT(*) AS c
                 FROM r GROUP BY user_id, anchor)
        SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_active_days,
               CAST(MAX(c) AS BIGINT) AS max_streak
        FROM runs GROUP BY user_id
    """,
    "events_type_gini": r"""
        WITH ct AS (SELECT user_id, event_type, COUNT(*) AS c
                    FROM events GROUP BY user_id, event_type)
        SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               1.0 - CAST(SUM(c*c) AS DOUBLE)
                     / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
                 AS gini
        FROM ct GROUP BY user_id
    """,
    "source_vocab_jaccard": r"""
        WITH st AS (
          SELECT DISTINCT source, token FROM (
            SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE text IS NOT NULL)
          WHERE token <> ''
        ),
        sz AS (SELECT source, COUNT(*) AS v FROM st GROUP BY source),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 COUNT(*) AS n_inter
          FROM st a JOIN st b
            ON a.token = b.token AND a.source < b.source
          GROUP BY a.source, b.source
        )
        SELECT i.src_a, i.src_b, CAST(i.n_inter AS BIGINT) AS n_inter,
               CAST(sa.v + sb.v - i.n_inter AS BIGINT) AS n_union,
               CAST(i.n_inter AS DOUBLE)
                 / CAST(sa.v + sb.v - i.n_inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sz sa ON sa.source = i.src_a
        JOIN sz sb ON sb.source = i.src_b
    """,
    "events_daily_autocorr": r"""
        WITH ct AS (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, day
        ),
        pr AS (
          SELECT a.event_type, a.c AS x, b.c AS y
          FROM ct a JOIN ct b
            ON b.event_type = a.event_type AND b.day = a.day + 1
        )
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*y) AS DOUBLE))
                - (CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE)))
               / (sqrt((CAST(COUNT(*) AS DOUBLE)
                        * CAST(SUM(x*x) AS DOUBLE))
                       - (CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)))
                  * sqrt((CAST(COUNT(*) AS DOUBLE)
                          * CAST(SUM(y*y) AS DOUBLE))
                         - (CAST(SUM(y) AS DOUBLE)
                            * CAST(SUM(y) AS DOUBLE)))) AS autocorr
        FROM pr GROUP BY event_type
        HAVING (sqrt((CAST(COUNT(*) AS DOUBLE)
                      * CAST(SUM(x*x) AS DOUBLE))
                     - (CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)))
                * sqrt((CAST(COUNT(*) AS DOUBLE)
                        * CAST(SUM(y*y) AS DOUBLE))
                       - (CAST(SUM(y) AS DOUBLE)
                          * CAST(SUM(y) AS DOUBLE)))) <> 0
    """,
    "parts_no_bulk_orders": r"""
        SELECT p_partkey, p_brand FROM part
        WHERE p_partkey NOT IN
          (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
    """,
    "events_user_gap_median": r"""
        WITH g AS (
          SELECT user_id,
                 CAST(epoch_us(ts) AS BIGINT)
                 - LAG(CAST(epoch_us(ts) AS BIGINT))
                     OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS gap
          FROM events
        )
        SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               median(gap) AS median_gap_us
        FROM g WHERE gap IS NOT NULL GROUP BY user_id
    """,
    "events_trailing_24h_sum": r"""
        SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
               CAST(SUM(cents) OVER w AS BIGINT) AS sum_cents_24h
        FROM (SELECT user_id, ts,
                     CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
              FROM events)
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(epoch_us(ts) AS BIGINT)
                     RANGE BETWEEN 86400000000 PRECEDING
                           AND CURRENT ROW)
    """,
    "events_top_sequences": r"""
        WITH s AS (
          SELECT user_id, event_type,
                 LEAD(event_type, 1) OVER w AS t2,
                 LEAD(event_type, 2) OVER w AS t3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tri AS (
          SELECT DISTINCT user_id,
                 event_type || '>' || t2 || '>' || t3 AS trigram
          FROM s WHERE t3 IS NOT NULL AND t2 IS NOT NULL
        )
        SELECT trigram, CAST(COUNT(*) AS BIGINT) AS n
        FROM tri GROUP BY trigram
        ORDER BY n DESC, trigram ASC
        LIMIT 20
    """,
}
