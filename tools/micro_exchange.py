"""Micro-benchmark: Ray Data sort-based groupby(__part) vs a hand-rolled
two-stage hash exchange (map-side partition split, reduce-side concat+kernel)
over a 12M-row 16-byte table.

    python tools/micro_exchange.py 8
    python tools/micro_exchange.py 32
"""
import json
import sys
import time

import numpy as np
import pyarrow as pa
import ray


def hash_exchange(ds, P, kernel):
    """Two-stage hash shuffle on the low 63 bits of band_key % P."""

    @ray.remote(num_returns=P)
    def _split(*tables):
        t = pa.concat_tables(tables)
        part = (t.column("band_key").to_numpy() % P).astype(np.int64)
        order = np.argsort(part, kind="stable")
        t = t.take(order)
        part = part[order]
        bounds = np.searchsorted(part, np.arange(P + 1))
        return tuple(t.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(P))

    @ray.remote
    def _reduce(kern, *parts):
        return kern(pa.concat_tables([p for p in parts if p.num_rows]))

    blocks = ds.to_arrow_refs()
    # group input blocks so we run ~2 map tasks per CPU
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    gsz = max(1, len(blocks) // (2 * ncpu))
    groups = [blocks[i: i + gsz] for i in range(0, len(blocks), gsz)]
    map_out = [_split.remote(*g) for g in groups]
    if P == 1:
        map_out = [[r] for r in map_out]
    red = [
        _reduce.remote(kernel, *[map_out[m][p] for m in range(len(map_out))])
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(red)


def main(ncpu: int) -> None:
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    n = 12_000_000
    rng = np.random.default_rng(0)
    keys = rng.integers(0, n, n, dtype=np.int64)
    nodes = rng.integers(0, 1 << 62, n, dtype=np.int64)
    t = pa.table({"band_key": keys, "node": nodes})
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=200_000
    ).materialize()
    out = {"ncpu": ncpu, "blocks": ds.num_blocks()}

    def kern(tbl: pa.Table) -> pa.Table:
        # representative per-partition work: lexsort + segment stats
        k = tbl.column("band_key").to_numpy()
        v = tbl.column("node").to_numpy()
        o = np.lexsort((v, k))
        return pa.table({"band_key": k[o][:1], "node": v[o][:1]})

    for P in (8, 32):
        t0 = time.time()
        hash_exchange(ds, P, kern).materialize()
        out[f"exchange{P}"] = round(time.time() - t0, 2)

    t0 = time.time()
    ds.map_batches(
        lambda b: b.append_column(
            "__part", pa.array((b.column("band_key").to_numpy() % 32))),
        batch_format="pyarrow",
    ).groupby("__part").map_groups(
        lambda b: kern(b.drop_columns(["__part"])), batch_format="pyarrow"
    ).materialize()
    out["groupby32"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
