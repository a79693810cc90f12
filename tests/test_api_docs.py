"""The generated API reference (docs/api/) must match the live
public surface: regenerate in memory and compare byte-for-byte, and
assert every symbol the reference-parity test checks appears in the
rendered pages (the reference ships a Sphinx page per module —
``/root/reference/docs/api`` — this is the equivalent coverage
check)."""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
API_DIR = os.path.join(ROOT, "docs", "api")


@pytest.fixture(scope="module")
def rendered():
    from scripts.gen_api_docs import render_all

    return render_all()


def test_api_docs_in_sync(rendered):
    on_disk = set(os.listdir(API_DIR))
    assert on_disk == set(rendered), (
        "docs/api page set drifted — run scripts/gen_api_docs.py"
    )
    for fname, content in rendered.items():
        with open(os.path.join(API_DIR, fname)) as f:
            assert f.read() == content, (
                f"docs/api/{fname} is stale — run "
                "scripts/gen_api_docs.py"
            )


def test_api_docs_cover_parity_symbols(rendered):
    from tests.test_reference_parity import (
        MODULE_MAP,
        _reference_symbols,
    )

    if not os.path.isdir("/root/reference/src/mdhelper"):
        pytest.skip("reference tree not mounted")
    blob = "\n".join(rendered.values())
    missing = []
    for rel, symbols in _reference_symbols().items():
        for sym in symbols:
            if f"`{sym}" not in blob:
                missing.append(f"{rel}:{sym}")
    assert not missing, missing
