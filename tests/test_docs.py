"""Generated doc indexes must match the code (tools/gen_docs.py)."""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))


def test_api_and_query_indexes_fresh():
    import gen_docs

    assert (ROOT / "API.md").read_text() == gen_docs.gen_api_md(), (
        "API.md stale — run python tools/gen_docs.py"
    )
    assert (ROOT / "QUERIES.md").read_text() == gen_docs.gen_queries_md(), (
        "QUERIES.md stale — run python tools/gen_docs.py"
    )
