"""Relational analytics over the warehouse-shaped side tables
(lineitem / orders / customer) — the engine is not text-only.

Both operators follow the engine's shuffle discipline:

* ``pricing_summary`` (TPC-H Q1 shape) — ALL money math in integer
  cents (``floor(x*100 + 0.5)``, the explicit half-up rule numpy and
  SQL share), per-batch partial aggregation into ≤ 6 group rows, then
  one tiny groupby. Averages divide the exact integer sums at the end,
  so float summation order can never differ from the oracle.
* ``ship_priority`` (TPC-H Q3 shape) — the small side (filtered
  customer keys, then filtered order rows) broadcasts via ``ray.put``
  into a lineitem ``map_batches`` filter-join; revenue accumulates in
  integer cents per order with per-batch combining. The broadcast is
  gated on ``DRIVER_FASTPATH_ROWS``; above it the same semantics run
  as a ``sized_join`` hash exchange.

int64 cent products: price_cents(≤~10^7) × (100−disc) × (100+tax)
≤ ~10^11 per row; a single group would overflow int64 only past ~10^7
rows per partial batch — partials are batch-sized, and the final fold
uses Python ints (arbitrary precision) on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..stages.grouping import sized_join


def _cents(x: np.ndarray) -> np.ndarray:
    """floor(x*100 + 0.5) → int64 — matches SQL FLOOR(x*100 + 0.5)
    exactly (no banker's rounding ambiguity)."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def pricing_summary(lineitem: rd.Dataset, *, cutoff_iso: str) -> pd.DataFrame:
    """TPC-H Q1 pricing summary: per (l_returnflag, l_linestatus) over
    rows with ``l_shipdate <= cutoff``, exact-integer sums of quantity /
    base price / discounted price / charged price plus averages and row
    count. Money sums are computed in cents and divided by 100 at the
    very end; disc_price = price·(1−disc) and charge =
    price·(1−disc)·(1+tax) are integer products of cent quantities
    (divided by 10^4 / 10^6 once at the end).

    Scale shape: column-pruned read, the filter and the cents partial
    aggregation happen per batch, the exchange carries ≤ (6 groups ×
    n_batches) rows; final fold is group-count-sized on the driver with
    Python-int accumulators (overflow-proof)."""
    cutoff = np.datetime64(cutoff_iso, "us")

    cols = [
        "l_returnflag", "l_linestatus", "l_shipdate",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    ]

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = ship.astype("datetime64[us]") <= cutoff
        if not keep.any():
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "sum_qty": pa.array([], pa.int64()),
                    "sum_base_c": pa.array([], pa.int64()),
                    "sum_disc_c4": pa.array([], pa.int64()),
                    "sum_charge_c6": pa.array([], pa.int64()),
                    "sum_disc_pct": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        sub = batch.filter(pa.array(keep))
        flag = sub.column("l_returnflag").to_pandas().to_numpy()
        stat = sub.column("l_linestatus").to_pandas().to_numpy()
        qty = sub.column("l_quantity").to_numpy(zero_copy_only=False)
        price_c = _cents(sub.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc_pct = _cents(sub.column("l_discount").to_numpy(zero_copy_only=False))
        tax_pct = _cents(sub.column("l_tax").to_numpy(zero_copy_only=False))
        disc_c4 = price_c * (100 - disc_pct)          # cents ×10^2
        charge_c6 = disc_c4 * (100 + tax_pct)         # cents ×10^4
        keys = pd.MultiIndex.from_arrays([flag, stat])
        df = pd.DataFrame(
            {
                "sum_qty": qty.astype(np.int64),
                "sum_base_c": price_c,
                "sum_disc_c4": disc_c4,
                "sum_charge_c6": charge_c6,
                "sum_disc_pct": disc_pct,
                "n": np.ones(len(qty), np.int64),
            },
            index=keys,
        )
        agg = df.groupby(level=[0, 1], sort=False).sum()
        return pa.table(
            {
                "l_returnflag": pa.array([k[0] for k in agg.index], pa.string()),
                "l_linestatus": pa.array([k[1] for k in agg.index], pa.string()),
                **{c: pa.array(agg[c].to_numpy(), pa.int64()) for c in agg.columns},
            }
        )

    partials = lineitem.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=16384
    )
    # group-count × batch-count rows — bounded driver fold in Python ints
    acc: dict[tuple[str, str], list[int]] = {}
    for ref in partials.to_arrow_refs():
        t = ray.get(ref)
        d = t.to_pydict()
        for i in range(len(t)):
            key = (d["l_returnflag"][i], d["l_linestatus"][i])
            row = acc.setdefault(key, [0, 0, 0, 0, 0, 0])
            row[0] += d["sum_qty"][i]
            row[1] += d["sum_base_c"][i]
            row[2] += d["sum_disc_c4"][i]
            row[3] += d["sum_charge_c6"][i]
            row[4] += d["sum_disc_pct"][i]
            row[5] += d["n"][i]

    rows = []
    for (flag, stat) in sorted(acc):
        sq, sb, sd4, sc6, sdp, n = acc[(flag, stat)]
        rows.append(
            {
                "l_returnflag": flag,
                "l_linestatus": stat,
                # float(int) FIRST, divide after — the same int→double
                # cast order as the oracle's CAST(SUM(..) AS DOUBLE)/k,
                # so a >2^53 sum rounds identically on both sides
                "sum_qty": sq,
                "sum_base_price": round(float(sb) / 100.0, 6),
                "sum_disc_price": round(float(sd4) / 10_000.0, 6),
                "sum_charge": round(float(sc6) / 1_000_000.0, 6),
                "avg_qty": round(float(sq) / n, 6),
                "avg_price": round(float(sb) / 100.0 / n, 6),
                "avg_disc": round(float(sdp) / 100.0 / n, 6),
                "count_order": n,
            }
        )
    return pd.DataFrame(rows)


def ship_priority(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    *,
    segment: str,
    date_iso: str,
    k: int = 10,
) -> pd.DataFrame:
    """TPC-H Q3 shipping priority: top-k orders by revenue
    (Σ price·(1−disc), integer cents) over customers in ``segment``,
    orders placed before ``date`` with lineitems shipped after it.
    → (l_orderkey, revenue, o_orderdate[us]) ranked by (revenue desc,
    l_orderkey).

    Scale shape: customer keys (segment-filtered, key-only) broadcast
    into an orders filter; the surviving (orderkey → orderdate) map
    broadcasts into a lineitem filter-join when it fits
    ``DRIVER_FASTPATH_ROWS``, else the same per-order partials run
    through a ``sized_join`` hash exchange. Revenue partials combine
    per batch, so the final exchange is order-count-, not
    lineitem-count-, sized."""
    date = np.datetime64(date_iso, "us")

    cust_keys = set()
    ckeys = customer.select_columns(["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), segment)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    for ref in ckeys.to_arrow_refs():
        cust_keys.update(ray.get(ref).column("c_custkey").to_pylist())
    ck_ref = [ray.put(np.array(sorted(cust_keys), np.int64))]

    def order_filter(batch: pa.Table) -> pa.Table:
        ck = ray.get(ck_ref[0])
        keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (od.astype("datetime64[us]") < date) & np.isin(keys, ck)
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").filter(pa.array(keep)),
                "o_orderdate": batch.column("o_orderdate").filter(pa.array(keep)),
            }
        )

    sel_orders = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_filter, batch_format="pyarrow")

    def li_partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = ship.astype("datetime64[us]") > date
        sub = batch.filter(pa.array(keep))
        okey = sub.column("l_orderkey").to_numpy(zero_copy_only=False)
        price_c = _cents(sub.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc_pct = _cents(sub.column("l_discount").to_numpy(zero_copy_only=False))
        rev_c4 = price_c * (100 - disc_pct)
        uk, inv = np.unique(okey, return_inverse=True)
        sums = np.bincount(inv, weights=rev_c4.astype(np.float64))
        # exact: rev_c4 ≤ ~10^11, batch sums ≤ 2^53 — integer-exact in
        # float64; re-cast and fold as int64
        return pa.table(
            {
                "l_orderkey": pa.array(uk, pa.int64()),
                "rev_c4": pa.array(sums.astype(np.int64)),
            }
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow", batch_size=16384)

    # function-local import so tests can monkeypatch config (the gated
    # dual-path convention shared with pipelines/dedup.py)
    from ..config import DRIVER_FASTPATH_ROWS

    n_orders = sel_orders.count()
    if n_orders <= DRIVER_FASTPATH_ROWS:
        # driver fastpath: order map is small — fold per-order revenue
        # locally, join in memory
        omap: dict[int, object] = {}
        for ref in sel_orders.to_arrow_refs():
            t = ray.get(ref)
            for okey, od in zip(
                t.column("o_orderkey").to_pylist(),
                t.column("o_orderdate").to_pylist(),
            ):
                omap[okey] = od
        rev: dict[int, int] = {}
        for ref in li.to_arrow_refs():
            t = ray.get(ref)
            for okey, rc in zip(
                t.column("l_orderkey").to_pylist(), t.column("rev_c4").to_pylist()
            ):
                if okey in omap:
                    rev[okey] = rev.get(okey, 0) + rc
        top = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return pd.DataFrame(
            {
                "l_orderkey": [t[0] for t in top],
                "revenue": [round(float(t[1]) / 10_000.0, 6) for t in top],
                "o_orderdate": [omap[t[0]] for t in top],
            }
        )

    # distributed path: per-order revenue via groupby, hash join to the
    # filtered orders, distributed sort for the top-k
    rev_ds = li.groupby("l_orderkey").sum("rev_c4")
    joined = sized_join(
        rev_ds,
        sel_orders.map_batches(
            lambda t: t.rename_columns(["l_orderkey", "o_orderdate"]),
            batch_format="pyarrow",
        ),
        ("l_orderkey",),
    )
    out = (
        joined.sort(["sum(rev_c4)", "l_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["revenue"] = (out["sum(rev_c4)"].astype(np.float64) / 10_000.0).round(6)
    return out[["l_orderkey", "revenue", "o_orderdate"]]


def region_revenue(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    nation,
    region,
    *,
    region_name: str,
    date_from_iso: str,
    date_to_iso: str,
) -> pd.DataFrame:
    """TPC-H Q5-shaped revenue per nation: Σ price·(1−disc) (integer
    cents) of lineitems belonging to orders placed in [date_from,
    date_to) by customers of ``region_name``. → (n_name, revenue).

    Join chain and scale shape: nation⨝region are DIMENSIONS (tens of
    rows) — read whole and broadcast; customer projects to a
    custkey→nation_name map restricted to the region (broadcast, the
    classic replicated-dimension star join); orders filter+project to
    orderkey→custkey per batch against the broadcast customer keys;
    lineitem revenue partials combine per batch on orderkey. The only
    fact-fact edge (lineitem⨝orders) resolves against the filtered
    order map — gated on ``DRIVER_FASTPATH_ROWS`` with a ``sized_join``
    fallback, same dual-path discipline as ``ship_priority``."""
    d0 = np.datetime64(date_from_iso, "us")
    d1 = np.datetime64(date_to_iso, "us")

    # dimensions: tens of rows by definition — driver-side collect
    nat = pa.concat_tables(ray.get(nation.to_arrow_refs()))
    reg = pa.concat_tables(ray.get(region.to_arrow_refs()))
    rkeys = {
        rk
        for rk, rn in zip(
            reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist()
        )
        if rn == region_name
    }
    nat_name = {
        nk: nn
        for nk, nn, nr in zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist(),
            nat.column("n_regionkey").to_pylist(),
        )
        if nr in rkeys
    }
    nat_ref = [ray.put(nat_name)]

    def cust_map(batch: pa.Table) -> pa.Table:
        nm = ray.get(nat_ref[0])
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = np.isin(nk, np.array(sorted(nm), np.int64))
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey").filter(pa.array(keep)),
                "c_nationkey": batch.column("c_nationkey").filter(pa.array(keep)),
            }
        )

    cust = customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        cust_map, batch_format="pyarrow"
    )
    # region customers: broadcast custkey→nationkey (a fifth of the
    # customer dimension; at cluster scale flip to sized_join like the
    # order map below — same gate)
    c2n: dict[int, int] = {}
    for ref in cust.to_arrow_refs():
        t = ray.get(ref)
        c2n.update(
            zip(t.column("c_custkey").to_pylist(), t.column("c_nationkey").to_pylist())
        )
    c2n_ref = [ray.put(c2n)]

    def order_map(batch: pa.Table) -> pa.Table:
        m = ray.get(c2n_ref[0])
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        ckeys = np.array(sorted(m), np.int64)
        keep = (
            (od.astype("datetime64[us]") >= d0)
            & (od.astype("datetime64[us]") < d1)
            & np.isin(ck, ckeys)
        )
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)[keep]
        nk = np.array([m[c] for c in ck[keep]], np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "nationkey": pa.array(nk, pa.int64()),
            }
        )

    sel_orders = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_map, batch_format="pyarrow")

    def li_partial(batch: pa.Table) -> pa.Table:
        okey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        price_c = _cents(batch.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc_pct = _cents(batch.column("l_discount").to_numpy(zero_copy_only=False))
        rev_c4 = price_c * (100 - disc_pct)
        uk, inv = np.unique(okey, return_inverse=True)
        sums = np.bincount(inv, weights=rev_c4.astype(np.float64))
        return pa.table(
            {
                "l_orderkey": pa.array(uk, pa.int64()),
                "rev_c4": pa.array(sums.astype(np.int64)),
            }
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow", batch_size=16384)

    from ..config import DRIVER_FASTPATH_ROWS

    rev_by_nation: dict[int, int] = {}
    if sel_orders.count() <= DRIVER_FASTPATH_ROWS:
        o2n: dict[int, int] = {}
        for ref in sel_orders.to_arrow_refs():
            t = ray.get(ref)
            o2n.update(
                zip(t.column("o_orderkey").to_pylist(), t.column("nationkey").to_pylist())
            )
        for ref in li.to_arrow_refs():
            t = ray.get(ref)
            for okey, rc in zip(
                t.column("l_orderkey").to_pylist(), t.column("rev_c4").to_pylist()
            ):
                nk = o2n.get(okey)
                if nk is not None:
                    rev_by_nation[nk] = rev_by_nation.get(nk, 0) + rc
    else:
        rev_ds = li.groupby("l_orderkey").sum("rev_c4")
        joined = sized_join(
            rev_ds,
            sel_orders.map_batches(
                lambda t: t.rename_columns(["l_orderkey", "nationkey"]),
                batch_format="pyarrow",
            ),
            ("l_orderkey",),
        )
        agg = joined.groupby("nationkey").sum("sum(rev_c4)").to_pandas()
        rev_by_nation = dict(
            zip(agg["nationkey"].astype(int), agg["sum(sum(rev_c4))"].astype(int))
        )

    rows = sorted(
        (nat_name[nk], round(float(rc) / 10_000.0, 6))
        for nk, rc in rev_by_nation.items()
    )
    return pd.DataFrame({"n_name": [r[0] for r in rows],
                         "revenue": [r[1] for r in rows]})


def order_priority_counts(
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    *,
    date_from_iso: str,
    date_to_iso: str,
    late_days: int = 90,
) -> pd.DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join: per order priority, how many
    orders in [date_from, date_to) have at least one lineitem shipped
    more than ``late_days`` after the order date.
    → (o_orderpriority, order_count).

    Scale shape: below the driver gate the filtered orders broadcast
    ONCE (``ray.put`` of sorted orderkey/orderdate arrays) and the
    lineitem scan emits only the DISTINCT late orderkeys it saw — a
    shuffle-free semi-join whose exchange is the late-hit set, not a
    per-order groupby (the 4-lineitems-per-order combiner compresses
    nothing, so the old groupby-max shuffled at fact-row grain).
    Above the gate the EXISTS collapses to max(l_shipdate) per order
    resolved through a ``sized_join`` hash exchange."""
    d0 = np.datetime64(date_from_iso, "us")
    d1 = np.datetime64(date_to_iso, "us")
    late_us = np.int64(late_days) * 86_400_000_000

    def o_filter(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        )
        keep = (od >= d0) & (od < d1)
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").filter(pa.array(keep)),
                "o_orderpriority": batch.column("o_orderpriority").filter(
                    pa.array(keep)
                ),
                "odate_us": pa.array(od.astype(np.int64)[keep], pa.int64()),
            }
        )

    sel = orders.select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(o_filter, batch_format="pyarrow").materialize()

    from ..config import DRIVER_FASTPATH_ROWS

    counts: dict[str, int] = {}
    if sel.count() <= DRIVER_FASTPATH_ROWS:
        # Driver fastpath: broadcast the (sorted orderkey, orderdate)
        # arrays of the selected window once; each lineitem batch emits
        # only the DISTINCT orderkeys whose shipdate is late. No shuffle.
        parts = [p for p in (ray.get(r) for r in sel.to_arrow_refs()) if p.num_rows]
        if not parts:
            return pd.DataFrame({"o_orderpriority": [], "order_count": []})
        st = pa.concat_tables(parts)
        okeys = st.column("o_orderkey").to_numpy(zero_copy_only=False)
        odates = st.column("odate_us").to_numpy(zero_copy_only=False)
        prios = st.column("o_orderpriority").to_numpy(zero_copy_only=False)
        order = np.argsort(okeys, kind="stable")
        okeys, odates, prios = okeys[order], odates[order], prios[order]
        sel_ref = ray.put((okeys, odates))

        def li_late(batch: pa.Table) -> pa.Table:
            sk, sd = ray.get(sel_ref)
            lk = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            ship = batch.column("l_shipdate").to_numpy(
                zero_copy_only=False
            ).astype("datetime64[us]").astype(np.int64)
            pos = np.searchsorted(sk, lk)
            pos[pos == len(sk)] = 0
            hit = (sk[pos] == lk) & (ship > sd[pos] + late_us)
            return pa.table(
                {"late_key": pa.array(np.unique(lk[hit]), pa.int64())}
            )

        late_parts = [
            ray.get(r)
            for r in lineitem.select_columns(["l_orderkey", "l_shipdate"])
            .map_batches(li_late, batch_format="pyarrow", batch_size=65536)
            .to_arrow_refs()
        ]
        lk_all = np.unique(
            np.concatenate(
                [
                    p.column("late_key").to_numpy(zero_copy_only=False)
                    for p in late_parts
                    if p.num_rows
                ]
                or [np.empty(0, np.int64)]
            )
        )
        pos = np.searchsorted(okeys, lk_all)
        late_prios = prios[pos]
        for pr, c in zip(*np.unique(late_prios, return_counts=True)):
            counts[str(pr)] = int(c)
    else:
        def li_max(batch: pa.Table) -> pa.Table:
            okey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            ship = batch.column("l_shipdate").to_numpy(
                zero_copy_only=False
            ).astype("datetime64[us]").astype(np.int64)
            uk, inv = np.unique(okey, return_inverse=True)
            mx = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
            np.maximum.at(mx, inv, ship)
            return pa.table(
                {
                    "l_orderkey": pa.array(uk, pa.int64()),
                    "max_ship_us": pa.array(mx, pa.int64()),
                }
            )

        li = lineitem.select_columns(["l_orderkey", "l_shipdate"]).map_batches(
            li_max, batch_format="pyarrow", batch_size=16384
        ).groupby("l_orderkey").max("max_ship_us")
        joined = sized_join(
            sel,
            li.map_batches(
                lambda t: t.rename_columns(["o_orderkey", "max(max_ship_us)"]),
                batch_format="pyarrow",
            ),
            ("o_orderkey",),
        )
        def late(batch: pa.Table) -> pa.Table:
            ms = batch.column("max(max_ship_us)").to_numpy(zero_copy_only=False)
            od = batch.column("odate_us").to_numpy(zero_copy_only=False)
            keep = ms > od + late_us
            return pa.table(
                {"o_orderpriority": batch.column("o_orderpriority").filter(pa.array(keep))}
            )
        agg = (
            joined.map_batches(late, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .count()
            .to_pandas()
        )
        counts = dict(zip(agg["o_orderpriority"], agg["count()"].astype(int)))

    rows = sorted(counts.items())
    return pd.DataFrame(
        {"o_orderpriority": [r[0] for r in rows],
         "order_count": [r[1] for r in rows]}
    )


def rollup_pricing(lineitem: rd.Dataset) -> pd.DataFrame:
    """GROUP BY ROLLUP (l_returnflag, l_linestatus) over the whole
    lineitem table → exact sums at THREE levels: (flag, status) detail,
    per-flag subtotals, and the grand total — rolled-up key columns
    carry the literal marker ``'ALL'`` (the flag/status domains are
    single letters, no collision) so every level lands in one table
    with a stable hashable schema.

    → (l_returnflag, l_linestatus, sum_qty, sum_base_price, count_order)

    Scale shape: ONE pass builds the finest level with the same
    integer-cents per-batch combiners as :func:`pricing_summary`
    (exchange ≤ 6 groups × n_batches rows); the two coarser levels are
    derived by re-aggregating the 6-row detail result on the driver —
    exact integer folds, no second scan, no extra shuffle. This is the
    textbook rollup plan: compute the finest grouping set once, derive
    ancestors from it."""

    def partial(batch: pa.Table) -> pa.Table:
        flag = batch.column("l_returnflag").to_pandas().to_numpy()
        stat = batch.column("l_linestatus").to_pandas().to_numpy()
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        price_c = _cents(batch.column("l_extendedprice").to_numpy(zero_copy_only=False))
        keys = pd.MultiIndex.from_arrays([flag, stat])
        df = pd.DataFrame(
            {
                "sum_qty": qty.astype(np.int64),
                "sum_base_c": price_c,
                "n": np.ones(len(qty), np.int64),
            },
            index=keys,
        )
        agg = df.groupby(level=[0, 1], sort=False).sum()
        return pa.table(
            {
                "l_returnflag": pa.array([k[0] for k in agg.index], pa.string()),
                "l_linestatus": pa.array([k[1] for k in agg.index], pa.string()),
                **{c: pa.array(agg[c].to_numpy(), pa.int64()) for c in agg.columns},
            }
        )

    partials = lineitem.select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]
    ).map_batches(partial, batch_format="pyarrow", batch_size=16384)

    # detail fold: ≤ 6 groups, Python-int accumulators
    acc: dict[tuple[str, str], list[int]] = {}
    for ref in partials.to_arrow_refs():
        t = ray.get(ref)
        d = t.to_pydict()
        for i in range(len(t)):
            key = (d["l_returnflag"][i], d["l_linestatus"][i])
            row = acc.setdefault(key, [0, 0, 0])
            row[0] += d["sum_qty"][i]
            row[1] += d["sum_base_c"][i]
            row[2] += d["n"][i]

    # derive the ancestor grouping sets from the detail level
    by_flag: dict[str, list[int]] = {}
    total = [0, 0, 0]
    for (flag, _stat), row in acc.items():
        frow = by_flag.setdefault(flag, [0, 0, 0])
        for j in range(3):
            frow[j] += row[j]
            total[j] += row[j]

    def emit(flag: str, stat: str, row: list[int]) -> dict:
        return {
            "l_returnflag": flag,
            "l_linestatus": stat,
            "sum_qty": row[0],
            "sum_base_price": round(float(row[1]) / 100.0, 6),
            "count_order": row[2],
        }

    rows = [emit(f, s, acc[(f, s)]) for (f, s) in sorted(acc)]
    rows += [emit(f, "ALL", by_flag[f]) for f in sorted(by_flag)]
    rows.append(emit("ALL", "ALL", total))
    return pd.DataFrame(rows)


def revenue_filter(
    lineitem: rd.Dataset,
    *,
    date_from_iso: str,
    date_to_iso: str,
    disc_lo: float,
    disc_hi: float,
    qty_max: float,
) -> pd.DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change scan —

        SELECT sum(l_extendedprice · l_discount) WHERE shipdate ∈
        [from, to) AND discount ∈ [lo, hi] AND quantity < qty_max

    Money math in integer cent·pct units (price_c × disc_pct, ×10⁴),
    summed as int64 per batch and Python ints on the driver; the one
    double division happens at the very end, so the oracle's
    CAST(SUM(...) AS DOUBLE)/1e4 rounds identically.

    → one row (revenue, n_rows). Scale shape: pure column-pruned
    streaming scan, per-batch partial sums, batch-count-sized fold —
    the cheapest possible plan for a predicate-aggregate."""
    lo_c = int(np.floor(disc_lo * 100 + 0.5))
    hi_c = int(np.floor(disc_hi * 100 + 0.5))
    d_from = np.datetime64(date_from_iso, "us")
    d_to = np.datetime64(date_to_iso, "us")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        )
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        disc_pct = _cents(batch.column("l_discount").to_numpy(zero_copy_only=False))
        keep = (
            (ship >= d_from)
            & (ship < d_to)
            & (disc_pct >= lo_c)
            & (disc_pct <= hi_c)
            & (qty < qty_max)
        )
        price_c = _cents(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        )[keep]
        rev_c4 = int((price_c * disc_pct[keep]).sum())
        return pa.table(
            {
                "rev_c4": pa.array([rev_c4], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    partials = lineitem.select_columns(
        ["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(partial, batch_format="pyarrow", batch_size=16384)
    rev, n = 0, 0
    for ref in partials.to_arrow_refs():
        t = ray.get(ref)
        for i in range(len(t)):
            rev += t.column("rev_c4")[i].as_py()
            n += t.column("n")[i].as_py()
    return pd.DataFrame(
        [{"revenue": round(float(rev) / 10_000.0, 6), "n_rows": n}]
    )


def enrich_orders(
    orders: rd.Dataset,
    customer: rd.Dataset,
    nation: rd.Dataset,
    region: rd.Dataset,
) -> rd.Dataset:
    """Denormalization ETL: orders hydrated through the dimension chain
    customer → nation → region →
    (o_orderkey, o_totalprice, c_name, c_mktsegment, n_name, r_name).
    The "wide fact table" prep every BI export / feature join runs.

    Scale shape: nation/region are constant-sized and always broadcast;
    the customer attribute map broadcasts under ``DRIVER_FASTPATH_ROWS``
    (dimension-sized, the Q5 pattern), else the one genuinely large
    edge runs as a ``sized_join`` hash exchange and ONLY the nation/
    region hydration stays broadcast. Output streams — no driver
    materialization of the fact side."""
    from ..config import DRIVER_FASTPATH_ROWS

    nat = pa.concat_tables(ray.get(nation.to_arrow_refs()))
    reg = pa.concat_tables(ray.get(region.to_arrow_refs()))
    n_key = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    n_name = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    n_reg = nat.column("n_regionkey").to_numpy(zero_copy_only=False).astype(np.int64)
    r_key = reg.column("r_regionkey").to_numpy(zero_copy_only=False).astype(np.int64)
    r_name = np.asarray(reg.column("r_name").to_pylist(), dtype=object)
    r_order = np.argsort(r_key)
    n_order = np.argsort(n_key)
    n_key, n_name, n_reg = n_key[n_order], n_name[n_order], n_reg[n_order]
    r_key, r_name = r_key[r_order], r_name[r_order]
    # nation → (name, region name) resolved once on the driver
    n_rname = r_name[np.searchsorted(r_key, n_reg)]
    dim_ref = [ray.put((n_key, n_name, n_rname))]

    def hydrate_nation(batch: pa.Table, nk_col: str) -> pa.Table:
        nk, nn, nr = ray.get(dim_ref[0])
        keys = batch.column(nk_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(nk, keys)
        out = batch.drop_columns([nk_col])
        out = out.append_column("n_name", pa.array(nn[pos], pa.string()))
        return out.append_column("r_name", pa.array(nr[pos], pa.string()))

    n_cust = customer.count()
    if n_cust <= DRIVER_FASTPATH_ROWS:
        ct = pa.concat_tables(
            ray.get(
                customer.select_columns(
                    ["c_custkey", "c_name", "c_mktsegment", "c_nationkey"]
                ).to_arrow_refs()
            )
        )
        ckey = ct.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        corder = np.argsort(ckey)
        cust_ref = [
            ray.put(
                (
                    ckey[corder],
                    np.asarray(ct.column("c_name").to_pylist(), dtype=object)[corder],
                    np.asarray(ct.column("c_mktsegment").to_pylist(), dtype=object)[
                        corder
                    ],
                    ct.column("c_nationkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[corder],
                )
            )
        ]

        def hydrate(batch: pa.Table) -> pa.Table:
            ck, cn, cm, cnat = ray.get(cust_ref[0])
            keys = (
                batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
            )
            pos = np.searchsorted(ck, keys)
            mid = pa.table(
                {
                    "o_orderkey": batch.column("o_orderkey"),
                    "o_totalprice": batch.column("o_totalprice"),
                    "c_name": pa.array(cn[pos], pa.string()),
                    "c_mktsegment": pa.array(cm[pos], pa.string()),
                    "c_nationkey": pa.array(cnat[pos], pa.int64()),
                }
            )
            return hydrate_nation(mid, "c_nationkey")

        return orders.select_columns(
            ["o_orderkey", "o_custkey", "o_totalprice"]
        ).map_batches(hydrate, batch_format="pyarrow")

    # above the gate: hash-exchange the one large edge, broadcast the rest
    from ..stages.grouping import sized_join

    slim_cust = customer.select_columns(
        ["c_custkey", "c_name", "c_mktsegment", "c_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("c_custkey"),
                "c_name": t.column("c_name"),
                "c_mktsegment": t.column("c_mktsegment"),
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = sized_join(
        orders.select_columns(["o_orderkey", "o_custkey", "o_totalprice"]),
        slim_cust,
        on=("o_custkey",),
    )
    return joined.map_batches(
        lambda t: hydrate_nation(
            t.select(
                ["o_orderkey", "o_totalprice", "c_name", "c_mktsegment", "c_nationkey"]
            ),
            "c_nationkey",
        ),
        batch_format="pyarrow",
    )


def top_parts_by_revenue(
    lineitem: rd.Dataset,
    part: rd.Dataset,
    *,
    k: int = 10,
) -> pd.DataFrame:
    """→ top-``k`` parts by discounted revenue, hydrated with the part
    name/brand and the number of DISTINCT suppliers that shipped them —
    (p_partkey, p_name, p_brand, revenue, n_suppliers, n_rows), ranked
    (revenue desc, p_partkey).

    Scale shape: revenue accumulates in integer cents×pct per
    (partkey) with per-batch combiners — the exchange is partkey-sized
    partials, and because every combiner emits ≤ distinct-parts rows,
    the driver fold is (parts × batches)-bounded. Distinct suppliers
    per part fold as per-batch (part, supplier) unique pairs — pair
    cardinality is bounded by the real assignment (TPC-H ships each
    part from ≤ a handful of suppliers). Part names broadcast
    (dimension-sized). Ranking picks k on the driver from the
    parts-sized aggregate — no global sort."""

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        price_c = _cents(batch.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc_pct = _cents(batch.column("l_discount").to_numpy(zero_copy_only=False))
        rev_c4 = price_c * (100 - disc_pct)
        uniq, inv = np.unique(pk, return_inverse=True)
        rev = np.bincount(inv, weights=rev_c4.astype(np.float64), minlength=len(uniq))
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # distinct (part, supplier) pairs this batch
        pair = np.unique(pk * np.int64(1 << 20) + sk)
        pad = max(len(uniq), len(pair))
        def _pad(a, fill=0):
            out = np.full(pad, fill, np.int64)
            out[: len(a)] = a
            return out
        return pa.table(
            {
                "p_partkey": pa.array(_pad(uniq, -1)),
                "rev_c4": pa.array(_pad(rev.astype(np.int64))),
                "n_rows": pa.array(_pad(n)),
                "pair": pa.array(_pad(pair, -1)),
            }
        )

    acc_rev: dict[int, int] = {}
    acc_n: dict[int, int] = {}
    pairs: set = set()
    parts_stream = lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(partial, batch_format="pyarrow", batch_size=16384)
    for ref in parts_stream.to_arrow_refs():
        t = ray.get(ref)
        if not len(t):
            continue
        d = t.to_pydict()
        for pk_, rv, n_ in zip(d["p_partkey"], d["rev_c4"], d["n_rows"]):
            if pk_ >= 0:
                acc_rev[pk_] = acc_rev.get(pk_, 0) + rv
                acc_n[pk_] = acc_n.get(pk_, 0) + n_
        pairs.update(p for p in d["pair"] if p >= 0)

    sup_per_part: dict[int, int] = {}
    for p in pairs:
        key = p >> 20
        sup_per_part[key] = sup_per_part.get(key, 0) + 1

    top = sorted(acc_rev, key=lambda x: (-acc_rev[x], x))[:k]
    pt = pa.concat_tables(
        ray.get(part.select_columns(["p_partkey", "p_name", "p_brand"]).to_arrow_refs())
    )
    pkeys = pt.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pkeys)
    pkeys = pkeys[order]
    pname = np.asarray(pt.column("p_name").to_pylist(), dtype=object)[order]
    pbrand = np.asarray(pt.column("p_brand").to_pylist(), dtype=object)[order]
    rows = []
    for pk_ in top:
        pos = int(np.searchsorted(pkeys, pk_))
        rows.append(
            {
                "p_partkey": pk_,
                "p_name": pname[pos] if pos < len(pkeys) and pkeys[pos] == pk_ else "",
                "p_brand": (
                    pbrand[pos] if pos < len(pkeys) and pkeys[pos] == pk_ else ""
                ),
                "revenue": round(float(acc_rev[pk_]) / 10_000.0, 6),
                "n_suppliers": sup_per_part.get(pk_, 0),
                "n_rows": acc_n[pk_],
            }
        )
    return pd.DataFrame(rows)


def supplier_nation_profile(
    supplier: rd.Dataset,
    nation: rd.Dataset,
    region: rd.Dataset,
) -> pd.DataFrame:
    """→ (n_name, r_name, n_suppliers, total_acctbal): per-nation
    supplier census with region rollup context — the remaining star
    dimension (supplier) wired through nation→region.

    Scale shape: supplier streams with per-batch (nationkey → count,
    balance-cents) combiners; nation/region resolve on the driver
    (constant-sized). Balance sums in integer cents, divided once."""
    nat = pa.concat_tables(ray.get(nation.to_arrow_refs()))
    reg = pa.concat_tables(ray.get(region.to_arrow_refs()))
    n_key = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    n_name = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    n_reg = nat.column("n_regionkey").to_numpy(zero_copy_only=False).astype(np.int64)
    r_key = reg.column("r_regionkey").to_numpy(zero_copy_only=False).astype(np.int64)
    r_name = np.asarray(reg.column("r_name").to_pylist(), dtype=object)
    ro = np.argsort(r_key)
    no = np.argsort(n_key)
    n_key, n_name, n_reg = n_key[no], n_name[no], n_reg[no]
    r_name_for_n = r_name[ro][np.searchsorted(r_key[ro], n_reg)]

    def partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("s_nationkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bal_c = _cents(batch.column("s_acctbal").to_numpy(zero_copy_only=False))
        uniq, inv = np.unique(nk, return_inverse=True)
        return pa.table(
            {
                "nk": pa.array(uniq),
                "n": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
                "bal_c": pa.array(
                    np.bincount(
                        inv, weights=bal_c.astype(np.float64), minlength=len(uniq)
                    ).astype(np.int64)
                ),
            }
        )

    acc: dict[int, list[int]] = {}
    for ref in (
        supplier.select_columns(["s_nationkey", "s_acctbal"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        t = ray.get(ref)
        if not len(t):
            continue
        d = t.to_pydict()
        for nk_, n_, b_ in zip(d["nk"], d["n"], d["bal_c"]):
            row = acc.setdefault(nk_, [0, 0])
            row[0] += n_
            row[1] += b_
    rows = []
    for nk_ in sorted(acc):
        pos = int(np.searchsorted(n_key, nk_))
        rows.append(
            {
                "n_name": n_name[pos],
                "r_name": r_name_for_n[pos],
                "n_suppliers": acc[nk_][0],
                "total_acctbal": round(float(acc[nk_][1]) / 100.0, 6),
            }
        )
    return pd.DataFrame(rows).sort_values("n_name").reset_index(drop=True)


def customer_order_distribution(
    customer: rd.Dataset,
    orders: rd.Dataset,
    *,
    exclude_priority: str = "5-LOW",
) -> pd.DataFrame:
    """TPC-H Q13-shaped aggregate-of-aggregate: distribution of
    customers by how many (non-``exclude_priority``) orders they
    placed, INCLUDING the zero-order bucket (the LEFT JOIN semantics).
    → (c_count, custdist).

    Scale shape: orders filter + per-batch custkey-count combiner →
    one customer-grain exchange (orders-per-customer compresses ~10×);
    the count histogram is another combiner whose exchange is at most
    (distinct order counts × batches) rows; the zero bucket falls out
    of two scalar counts (total customers − customers with ≥1 order) —
    the customer table itself never shuffles."""

    def o_partial(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("o_orderpriority"), exclude_priority)
        ck = batch.column("o_custkey").filter(keep).to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "c_custkey": pa.array(uk, pa.int64()),
                "n_orders": pa.array(cnt.astype(np.int64)),
            }
        )

    per_cust = (
        orders.select_columns(["o_custkey", "o_orderpriority"])
        .map_batches(o_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("c_custkey")
        .sum("n_orders")
    )

    # histogram combiner: (order-count value → #customers) per block,
    # then a bounded driver fold (distinct count values ≪ customers)
    def h_partial(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n_orders)").to_numpy(zero_copy_only=False)
        uv, cnt = np.unique(n, return_counts=True)
        return pa.table(
            {
                "c_count": pa.array(uv.astype(np.int64)),
                "custdist": pa.array(cnt.astype(np.int64)),
            }
        )

    hist: dict[int, int] = {}
    n_with_orders = 0
    for ref in per_cust.map_batches(
        h_partial, batch_format="pyarrow"
    ).to_arrow_refs():
        t = ray.get(ref)
        if not len(t):
            continue
        d = t.to_pydict()
        for v, c in zip(d["c_count"], d["custdist"]):
            hist[v] = hist.get(v, 0) + c
            n_with_orders += c

    n_customers = customer.count()
    zero = n_customers - n_with_orders
    if zero:
        hist[0] = hist.get(0, 0) + zero

    rows = sorted(hist.items(), key=lambda kv: (-kv[1], -kv[0]))
    return pd.DataFrame(
        {
            "c_count": [r[0] for r in rows],
            "custdist": [r[1] for r in rows],
        }
    )


def important_parts(
    lineitem: rd.Dataset,
    *,
    fraction_num: int = 12,
    fraction_den: int = 10_000,
) -> pd.DataFrame:
    """TPC-H Q11-shaped global-scalar HAVING: parts whose discounted
    revenue exceeds ``fraction_num/fraction_den`` of the WHOLE table's
    revenue. → (l_partkey, value) with value = revenue in dollars.

    The revenue unit is the exact integer cent·pct product
    (floor(price·100+0.5) × (100−floor(disc·100+0.5))), so both the
    per-part sums and the global total are exact integers and the
    HAVING compares ``value·den > total·num`` in arbitrary-precision
    ints — no float threshold can disagree with the oracle.

    Scale shape: ONE pass of per-batch (partkey → cent·pct) combiners →
    a part-grain exchange (line-items-per-part compresses well); the
    global total folds from the same partials; the HAVING filters the
    part-grain table with two broadcast ints."""

    def p_partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        price_c = _cents(batch.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc_pct = _cents(batch.column("l_discount").to_numpy(zero_copy_only=False))
        val = price_c * (100 - disc_pct)
        uk, inv = np.unique(pk, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, val)
        return pa.table(
            {
                "l_partkey": pa.array(uk, pa.int64()),
                "val_c4": pa.array(sums),
            }
        )

    per_part = (
        lineitem.select_columns(["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(p_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_partkey")
        .sum("val_c4")
        .materialize()
    )

    # global total from the part-grain table (part-count-sized scan)
    total = 0
    parts: list[pa.Table] = []
    for ref in per_part.to_arrow_refs():
        t = ray.get(ref)
        if not len(t):
            continue
        parts.append(t)
        total += int(
            np.sum(t.column("sum(val_c4)").to_numpy(zero_copy_only=False), dtype=object)
        )

    rows = []
    for t in parts:
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        v = t.column("sum(val_c4)").to_numpy(zero_copy_only=False)
        keep = v.astype(object) * fraction_den > total * fraction_num
        for k_, v_ in zip(pk[keep], v[keep]):
            rows.append((int(k_), round(float(int(v_)) / 10_000.0, 6)))
    rows.sort()
    return pd.DataFrame(
        {
            "l_partkey": [r[0] for r in rows],
            "value": [r[1] for r in rows],
        }
    )


def idle_customers(
    customer: rd.Dataset,
    orders: rd.Dataset,
    *,
    nationkeys: tuple[int, ...] = (1, 3, 5, 7, 9, 11, 13),
    since_iso: str = "2001-01-01",
) -> pd.DataFrame:
    """TPC-H Q22-shaped anti-join + exact scalar-average HAVING:
    customers from ``nationkeys`` whose account balance exceeds the
    average POSITIVE balance of that nation set AND who placed no order
    on/after ``since_iso`` (dormant accounts), grouped per nation.
    → (c_nationkey, numcust, totacctbal).

    The average is never materialized as a float: balances are integer
    cents, and the predicate ``bal_c · n > sum_c`` multiplies through
    by the count, so both sides compare exact integers.

    Scale shape: pass 1 over customer folds two scalars (Σ positive
    cents, count) from per-batch partials; the distinct order custkeys
    come from a per-batch unique combiner → one customer-grain
    exchange; the anti-join resolves below ``DRIVER_FASTPATH_ROWS`` via
    a broadcast sorted key array (``ray.put`` once), else through a
    LEFT ``sized_join`` null-probe. Customer rows never shuffle."""
    nk_arr = np.asarray(sorted(nationkeys), np.int64)

    def c_partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        bal_c = _cents(batch.column("c_acctbal").to_numpy(zero_copy_only=False))
        pos = np.searchsorted(nk_arr, nk)
        pos[pos == len(nk_arr)] = 0
        in_set = nk_arr[pos] == nk
        keep = in_set & (bal_c > 0)
        return pa.table(
            {
                "sum_c": pa.array([int(bal_c[keep].sum())], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    sum_c, n_pos = 0, 0
    for ref in (
        customer.select_columns(["c_nationkey", "c_acctbal"])
        .map_batches(c_partial, batch_format="pyarrow", batch_size=65536)
        .to_arrow_refs()
    ):
        t = ray.get(ref)
        d = t.to_pydict()
        sum_c += sum(d["sum_c"])
        n_pos += sum(d["n"])
    if n_pos == 0:
        return pd.DataFrame(
            {
                "c_nationkey": pd.Series([], dtype=np.int64),
                "numcust": pd.Series([], dtype=np.int64),
                "totacctbal": pd.Series([], dtype=np.float64),
            }
        )

    since = np.datetime64(since_iso, "us")

    def o_keys(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        )
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)[od >= since]
        return pa.table({"c_custkey": pa.array(np.unique(ck), pa.int64())})

    has_order = (
        orders.select_columns(["o_custkey", "o_orderdate"])
        .map_batches(o_keys, batch_format="pyarrow", batch_size=65536)
        .groupby("c_custkey")
        .count()
        .materialize()
    )

    from ..config import DRIVER_FASTPATH_ROWS

    acc: dict[int, list[int]] = {}

    def fold(nk: np.ndarray, bal_c: np.ndarray) -> None:
        for nk_, b_ in zip(nk, bal_c):
            row = acc.setdefault(int(nk_), [0, 0])
            row[0] += 1
            row[1] += int(b_)

    if has_order.count() <= DRIVER_FASTPATH_ROWS:
        keys = np.sort(
            np.concatenate(
                [
                    ray.get(r).column("c_custkey").to_numpy(zero_copy_only=False)
                    for r in has_order.to_arrow_refs()
                ]
                or [np.empty(0, np.int64)]
            )
        )
        keys_ref = ray.put(keys)

        def c_anti(batch: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
            nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
            bal_c = _cents(batch.column("c_acctbal").to_numpy(zero_copy_only=False))
            pos = np.searchsorted(nk_arr, nk)
            pos[pos == len(nk_arr)] = 0
            in_set = nk_arr[pos] == nk
            # bal·n > sum compares exact ints (python ints via object)
            rich = bal_c.astype(object) * n_pos > sum_c
            kp = np.searchsorted(ks, ck)
            kp[kp == len(ks)] = 0
            no_order = ~(ks[kp] == ck) if len(ks) else np.ones(len(ck), bool)
            keep = in_set & rich.astype(bool) & no_order
            return pa.table(
                {
                    "nk": pa.array(nk[keep], pa.int64()),
                    "bal_c": pa.array(bal_c[keep], pa.int64()),
                }
            )

        for ref in (
            customer.select_columns(["c_custkey", "c_nationkey", "c_acctbal"])
            .map_batches(c_anti, batch_format="pyarrow", batch_size=65536)
            .to_arrow_refs()
        ):
            t = ray.get(ref)
            if len(t):
                d = t.to_pydict()
                fold(np.asarray(d["nk"]), np.asarray(d["bal_c"]))
    else:
        def c_pred(batch: pa.Table) -> pa.Table:
            ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
            nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
            bal_c = _cents(batch.column("c_acctbal").to_numpy(zero_copy_only=False))
            pos = np.searchsorted(nk_arr, nk)
            pos[pos == len(nk_arr)] = 0
            in_set = nk_arr[pos] == nk
            rich = (bal_c.astype(object) * n_pos > sum_c).astype(bool)
            keep = in_set & rich
            return pa.table(
                {
                    "c_custkey": pa.array(ck[keep], pa.int64()),
                    "nk": pa.array(nk[keep], pa.int64()),
                    "bal_c": pa.array(bal_c[keep], pa.int64()),
                }
            )

        cand = customer.select_columns(
            ["c_custkey", "c_nationkey", "c_acctbal"]
        ).map_batches(c_pred, batch_format="pyarrow", batch_size=65536)
        joined = sized_join(
            cand, has_order, ("c_custkey",), join_type="left_outer"
        )
        def anti(batch: pa.Table) -> pa.Table:
            miss = pc.is_null(batch.column("count()"))
            sub = batch.filter(miss)
            return pa.table(
                {"nk": sub.column("nk"), "bal_c": sub.column("bal_c")}
            )
        for ref in joined.map_batches(
            anti, batch_format="pyarrow"
        ).to_arrow_refs():
            t = ray.get(ref)
            if len(t):
                d = t.to_pydict()
                fold(np.asarray(d["nk"]), np.asarray(d["bal_c"]))

    rows = sorted(acc.items())
    return pd.DataFrame(
        {
            "c_nationkey": [r[0] for r in rows],
            "numcust": [r[1][0] for r in rows],
            "totacctbal": [round(float(r[1][1]) / 100.0, 6) for r in rows],
        }
    )
