"""Plan audit: programmatic answers to "is this the plan I'd want at
100 TB?" — the checks this repo's own test suite applies to every
operator (tests/test_plans.py), packaged as an API so users can gate
THEIR pipelines the same way (e.g. `assert plan_audit(df)["shuffles"]
<= 2` in a CI test next to a new query).

Reads the EXECUTED physical plan string — the post-AQE truth, not the
logical intent.
"""

from __future__ import annotations

import re
from typing import TypedDict

from pyspark.sql import DataFrame


class PlanAudit(TypedDict):
    shuffles: int
    broadcasts: int
    has_cartesian: bool
    has_bnl_join: bool
    whole_stage_codegen_spans: int
    pushed_filters: list[str]
    partition_filters: list[str]
    read_schemas: list[str]
    top_k_pushed: bool
    window_group_limit: bool


def plan_string(df: DataFrame) -> str:
    """The executed physical plan as text (post-AQE).

    A finalized adaptive plan appends an "== Initial Plan ==" section
    repeating every node — truncated here so nothing double-counts.
    """
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def plan_audit(df: DataFrame) -> PlanAudit:
    """Summarize the scale-relevant facts of a DataFrame's physical plan.

    - ``shuffles``: `Exchange` count — each is a full network/disk
      round-trip of its input at scale; the first number to minimize.
    - ``broadcasts``: `BroadcastExchange` count (these are the GOOD
      joins for small dimensions).
    - ``has_cartesian`` / ``has_bnl_join``: cross products and
      broadcast-nested-loop joins — almost always a missing join key
      (the repo's own tests assert these are absent outside designated
      exact verifiers).
    - ``whole_stage_codegen_spans``: fused JVM codegen regions — wider
      is better; a span break in a hot path usually means a Python/UDF
      boundary or an exotic expression.
    - ``pushed_filters`` / ``partition_filters`` / ``read_schemas``:
      what actually reached the scans — empty pushed filters under a
      selective query, or a ReadSchema listing every column for a
      2-column projection, mean the scan reads too much.
    - ``top_k_pushed`` / ``window_group_limit``: ORDER BY+LIMIT became
      `TakeOrderedAndProject`, rank-filters became `WindowGroupLimit`
      partial top-k — the difference between sorting a table and
      sorting a page.

    AQE note: before the first action an adaptive plan prints
    ``isFinalPlan=false`` with no codegen markers, so
    ``whole_stage_codegen_spans`` reads 0.  Run the action first (or
    audit a re-used DataFrame) to see the finalized stages; the
    shuffle/scan facts are accurate either way.
    """
    p = plan_string(df)
    # a shuffle prints as bare "Exchange hashpartitioning(...)"; the
    # non-letter guard excludes BroadcastExchange, and ReusedExchange
    # LINES are skipped entirely — ReusedExchangeExec embeds the reused
    # child's "..., Exchange hashpartitioning(...)" description in its
    # own line, which the token guard alone cannot see (probed: a
    # self-joined aggregate read shuffles=2 for one physical exchange;
    # review finding, round 8).  A reused exchange is the optimal plan,
    # not a second shuffle.
    return PlanAudit(
        shuffles=sum(
            len(re.findall(r"[^A-Za-z]Exchange ", " " + line))
            for line in p.splitlines()
            if "ReusedExchange" not in line
        ),
        broadcasts=p.count("BroadcastExchange"),
        has_cartesian="CartesianProduct" in p,
        has_bnl_join="BroadcastNestedLoopJoin" in p,
        # executedPlan().toString() marks codegen regions as "*(n) Op";
        # explain("formatted") spells "WholeStageCodegen (n)" — accept both
        whole_stage_codegen_spans=len(
            set(re.findall(r"\*\((\d+)\)", p))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", p))
        ),
        # lazy capture with a next-metadata-field lookahead: greedy ran
        # through to the LAST ']' on the FileScan line, so
        # partition_filters swallowed the PushedFilters block whenever a
        # scan had both (probed; review finding, round 8).  The
        # lookahead is anchored to the KNOWN FileScan metadata-field
        # names (round-9 review: the earlier any-Capitalized-word form
        # could still truncate a capture if a string-literal filter
        # value itself contained '], Xxx: '), so only a genuine next
        # metadata block or end-of-line terminates the capture; inner
        # In(k, [1, 2, 3])-style brackets stay intact.
        pushed_filters=re.findall(
            r"PushedFilters: \[(.*?)\]"
            r"(?=, (?:Output|Batched|DataFilters|Format|Location"
            r"|PartitionFilters|PushedFilters|ReadSchema): |\s*$)",
            p,
            re.M,
        ),
        partition_filters=re.findall(
            r"PartitionFilters: \[(.*?)\]"
            r"(?=, (?:Output|Batched|DataFilters|Format|Location"
            r"|PartitionFilters|PushedFilters|ReadSchema): |\s*$)",
            p,
            re.M,
        ),
        read_schemas=re.findall(r"ReadSchema: (\S+)", p),
        top_k_pushed="TakeOrderedAndProject" in p,
        window_group_limit="WindowGroupLimit" in p,
    )
