"""Fixed-seed randomized differential against the REFERENCE EXECUTABLE
(scripts/reference_differential.py): same (schema, instance) pairs through
node-run lib.parseInfo and this engine's evaluator, asserting verdict
agreement. This is the strongest parity artifact we have — it found and
fixed two real divergences in r3 (dead-constRemain const/enum-object
semantics; eager vs lazy dangling-$ref rejection, now a documented timing
class). Skipped when node or /root/reference is unavailable.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

node_available = shutil.which("node") is not None and Path("/root/reference").exists()


@pytest.mark.skipif(not node_available, reason="node or reference unavailable")
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_randomized_verdict_parity(seed):
    from scripts.reference_differential import (
        compare,
        generate_groups,
        run_engine,
        run_reference,
    )

    groups = generate_groups(120, seed)
    ref = run_reference(groups)
    eng = run_engine(groups)
    mismatches, dangling = compare(groups, ref, eng)
    assert mismatches == [], mismatches[:3]
    # generator emits only resolvable refs; timing class must stay empty
    assert dangling == 0
