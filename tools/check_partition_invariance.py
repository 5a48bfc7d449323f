"""Partition-invariance sweep: rerun the oracle mirror with `_ds` forced to
repartition every table read into an adversarial block count.

Ray's streaming executor neither preserves block order nor guarantees any
particular block split, and the driver may read the same parquet with a
different effective split than our local runs — a gate whose result depends
on block boundaries or block ORDER would flake there while passing here
(exactly the class of the PQ-sampler bug caught in session 3). Every
EXACT-ORACLE gate must produce identical results under any partitioning;
rows-only gates that are documented order-dependent (T-Digest) are skipped.

Usage: python tools/check_partition_invariance.py [sf_dir] [blocks] [only,..]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_correctness import normalize, to_pandas  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as E
    from elasticsearch_ray.pipelines import ops as OPS

    original_ds = OPS._ds

    def repartitioned_ds(sf, table, columns=None, flt=None):
        return original_ds(sf, table, columns=columns,
                           flt=flt).repartition(blocks)

    OPS._ds = repartitioned_ds

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n_skip += 1  # rows-only: order-dependence documented per gate
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name}: raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        want = normalize(con.execute(oracles[name]).df())
        ok = (len(got) == len(want)
              and list(got.columns) == list(want.columns)
              and got.equals(want))
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name}: differs under repartition({blocks}) "
                  f"({len(got)} vs {len(want)} rows)")
        if (n_pass + n_fail) % 50 == 0:
            print(f"... {n_pass + n_fail} checked, {n_fail} failed "
                  f"({time.time() - t0:.1f}s last)")
    print(f"{n_pass} pass, {n_fail} fail, {n_skip} rows-only skipped "
          f"[repartition={blocks}]")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
