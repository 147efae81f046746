"""Driver-contract surface pins for ``__spark_entry__``: the three
functions' shapes, oracle-key subset property, and the deterministic
never-driver-checked-first ordering of ``queries()`` (the lever that
drains DRIVER_GAP.md fastest under any order-sensitive sampling).
No Spark session needed — these are pure-shape checks.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_queries_cover_registry_and_oracles_are_a_subset():
    from qudo_etl_pipeline_spark.catalog import registry

    e = _entry_module()
    q = e.queries()
    o = e.oracle_sql()
    assert set(q) == set(registry())
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper()
               for sql in o.values())


def test_queries_order_leads_with_never_driver_checked():
    e = _entry_module()
    names = list(e.queries())
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        seen.update(json.loads(open(path).read()))
    in_records = [n in seen for n in names]
    # one clean boundary: every never-checked name precedes every
    # checked one, both blocks sorted (deterministic given records)
    assert in_records == sorted(in_records)
    boundary = in_records.index(True) if True in in_records else len(names)
    assert names[:boundary] == sorted(names[:boundary])
    assert names[boundary:] == sorted(names[boundary:])
