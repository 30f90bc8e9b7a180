"""Registry-wide scale-killer audit: every gated query's physical plan.

The family table (tests/test_family_plan_audit.py) pins the intended
plan shape of one representative per family; this file sweeps the WHOLE
registry for the two regressions that are never acceptable anywhere:

- ``CartesianProduct`` — an O(n·m) non-broadcast cross product.  The one
  sanctioned appearance is ``dedup_embedding_cosine``, the designated
  exact O(n²) verification companion of the LSH scale path
  (operators/dedup.py::embedding_near_dup_pairs, documented as such).
- ``BatchEvalPython`` — a row-at-a-time Python UDF.  The engine's
  contract is Arrow-only Python (``ArrowEvalPython`` /
  ``FlatMapGroupsInPandas`` / ``MapInPandas`` / ``...WithState``), which
  this does NOT flag.

Plans are compiled, not executed (``executedPlan().toString()`` on the
un-acted frame), so the sweep costs seconds beyond whatever eager work a
query's builder itself does.  ``BroadcastNestedLoopJoin`` is NOT banned
here: the scalar-total broadcast crossJoins (naive Bayes priors, idf
N-doc totals, sampling quotas) legitimately compile to single-row BNL
joins — the family table bounds those queries' shuffles instead.
"""

from __future__ import annotations

from eventbridge_etl_spark.plans.audit import plan_string
from eventbridge_etl_spark.queries import QUERIES, load_all

from .conftest import SF_DIR

load_all()

#: gates whose plan is allowed a CartesianProduct: the documented exact
#: verification companions of an LSH/banded scale path — never the
#: scale path itself.
CARTESIAN_SANCTIONED = {"dedup_embedding_cosine"}


def test_no_unsanctioned_cartesian_or_row_udf_anywhere(spark):
    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        p = plan_string(fn(spark, SF_DIR))
        hits = []
        if "CartesianProduct" in p and name not in CARTESIAN_SANCTIONED:
            hits.append("CartesianProduct")
        if "BatchEvalPython" in p:
            hits.append("BatchEvalPython(row-UDF)")
        if hits:
            offenders[name] = hits
    assert not offenders, f"scale-killers in registry plans: {offenders}"


def test_sanctioned_cartesian_still_present(spark):
    """The whitelist stays honest: if the exact verifier stops being a
    true cross product (e.g. someone 'optimizes' it into the LSH path),
    the sanction entry must be removed rather than silently unused.

    Checked on the LOGICAL plan (``Join Cross``): at suite scale the
    physical strategy is a BroadcastNestedLoopJoin (small side fits the
    broadcast threshold), at scale it is a CartesianProduct — the
    sanction is about the O(n²) join shape, not the picked strategy."""
    for name in CARTESIAN_SANCTIONED:
        df = QUERIES[name](spark, SF_DIR)
        lp = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Join Cross" in lp, (
            f"{name} no longer cross-products; drop it from CARTESIAN_SANCTIONED"
        )
