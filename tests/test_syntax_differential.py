"""Fixed-seed syntax differential vs the node-executed reference
(scripts/syntax_differential.py): random valid JSON plus mutations
(truncation, insertion, deletion, replacement, tail junk) through both
parsers, asserting accept/reject agreement and value equality at double
precision (bigNumber 'default' keeps ints exact by documented design).
21k+ texts across 12 seeds were clean at authoring time; this pins three.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

node_available = shutil.which("node") is not None and Path("/root/reference").exists()


@pytest.mark.skipif(not node_available, reason="node or reference unavailable")
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_syntax_accept_reject_and_value_parity(seed):
    from scripts.syntax_differential import (
        compare,
        generate_texts,
        run_engine,
        run_reference,
    )

    texts = generate_texts(250, seed)
    mism = compare(texts, run_reference(texts), run_engine(texts))
    assert mism == [], mism[:3]
