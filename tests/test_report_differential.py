"""Fixed-seed error-REPORT differential vs the node-executed reference
(scripts/report_differential.py): full violation rows — message, keyword,
path, expected, actual — compared as deduplicated multisets per
(schema, instance). 15k cases across 10 seeds were clean at authoring
time; this pins three. The two documented reference quirks (item-0 path
drop, 2^k combinator-duplication) are normalized inside compare().
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

node_available = shutil.which("node") is not None and Path("/root/reference").exists()


@pytest.mark.skipif(not node_available, reason="node or reference unavailable")
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_error_report_parity(seed):
    from scripts.report_differential import compare, run_engine, run_reference
    from scripts.reference_differential import generate_groups

    groups = generate_groups(120, seed)
    mismatches = compare(groups, run_reference(groups), run_engine(groups))
    assert mismatches == [], mismatches[:3]
