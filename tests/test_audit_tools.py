"""The plan-audit gates are load-bearing (they are what keeps scale
hazards out of the engine) — so the gates themselves get tests."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "explain_audit",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "explain_audit.py"),
)
ea = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ea)


def test_broadcast_gate_clean_on_real_tree():
    assert ea.audit_broadcast_sites() == []


def test_broadcast_gate_rejects_sf_scaling_names(monkeypatch):
    # an allowlist review naming an SF-scaling relation is invalid even if
    # the grain claims 'constant' — the r5 failure mode
    bad = dict(ea.BROADCAST_ALLOW)
    bad[("queries_relational.py", "n")] = ("constant", "the customer dim")
    monkeypatch.setattr(ea, "BROADCAST_ALLOW", bad)
    problems = ea.audit_broadcast_sites()
    assert any("SF-scaling" in p and "customer" in p for p in problems)


def test_broadcast_gate_rejects_bad_grain_and_stale(monkeypatch):
    bad = dict(ea.BROADCAST_ALLOW)
    bad[("llm/text.py", "freqs")] = ("huge", "capped vocab")
    bad[("llm/text.py", "ghost")] = ("constant", "no such site")
    monkeypatch.setattr(ea, "BROADCAST_ALLOW", bad)
    problems = ea.audit_broadcast_sites()
    assert any("grain 'huge'" in p for p in problems)
    assert any("matches no F.broadcast site" in p for p in problems)


def test_broadcast_gate_flags_unreviewed_scaling_site(tmp_path, monkeypatch):
    # a NEW F.broadcast of an SF-scaling expression is rejected even before
    # anyone writes an allowlist entry
    pkg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "sarpro_spark")
    probe = os.path.join(pkg, "_gate_probe_tmp.py")
    with open(probe, "w") as fh:
        fh.write('df.join(F.broadcast(t["customer"]), "k")\n')
    try:
        problems = ea.audit_broadcast_sites()
    finally:
        os.remove(probe)
    assert any("_gate_probe_tmp.py" in p and "unbroadcastable by construction" in p
               for p in problems)


_BAD_PLAN = """AdaptiveSparkPlan isFinalPlan=false
+- Project [a]
   +- Filter (rnk <= 10)
      +- Window [row_number() ...], [revenue DESC]
         +- Sort [revenue DESC], false, 0
            +- Exchange SinglePartition, ENSURE_REQUIREMENTS
               +- HashAggregate(keys=[k], functions=[sum(v)])
                  +- Exchange hashpartitioning(k, 32)
                     +- FileScan parquet
"""

_GOOD_PLAN = """AdaptiveSparkPlan isFinalPlan=false
+- Project [a]
   +- Window [row_number() ...], [revenue DESC]
      +- Sort [revenue DESC], false, 0
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS
            +- GlobalLimit 10
               +- Exchange SinglePartition
                  +- LocalLimit 10
                     +- HashAggregate(keys=[k], functions=[sum(v)])
                        +- FileScan parquet
"""

_PARTITIONED_PLAN = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number() ...], [user], [ts ASC]
   +- Sort [user, ts], false, 0
      +- Exchange hashpartitioning(user, 32)
         +- FileScan parquet
"""


def test_singlepart_window_forbid():
    assert ea.singlepart_window_problems(_BAD_PLAN)
    assert not ea.singlepart_window_problems(_GOOD_PLAN)  # post-limit rank
    assert not ea.singlepart_window_problems(_PARTITIONED_PLAN)
