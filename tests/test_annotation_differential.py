"""Fixed-seed annotation differential vs the node-executed reference
(scripts/annotation_differential.py): title/description annotation rows
(value, keyword, path) on zero-error instances, compared as multisets
with the reference's item-0 path quirk normalized. 6k+ cases across 5
seeds were clean at authoring time; this pins two.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

node_available = shutil.which("node") is not None and Path("/root/reference").exists()


@pytest.mark.skipif(not node_available, reason="node or reference unavailable")
@pytest.mark.parametrize("seed", [1, 2])
def test_annotation_parity(seed):
    from scripts.annotation_differential import (
        compare,
        generate_groups,
        run_engine,
        run_reference,
    )

    groups = generate_groups(120, seed)
    ref = run_reference(groups)
    mismatches = compare(groups, ref, run_engine(groups, ref))
    assert mismatches == [], mismatches[:3]
