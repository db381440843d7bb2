"""CI job for the rendered documentation site.

The reference publishes a Sphinx/readthedocs site with an autodoc API
reference (``/root/reference/docs/conf.py``, ``docs/index.rst``); the
repo's equivalent is ``docs/build.py``. Building it here keeps the site
green in CI: every guide must render and every public module must
import and produce an API page with its real symbols.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

pytest.importorskip("markdown", reason="docs extra not installed")

REPO = Path(__file__).resolve().parent.parent


def _load_build():
    spec = importlib.util.spec_from_file_location(
        "docs_build", REPO / "docs" / "build.py"
    )
    mod = importlib.util.module_from_spec(spec)
    assert spec.loader is not None
    spec.loader.exec_module(mod)
    return mod


def test_docs_site_builds(tmp_path) -> None:
    build = _load_build()
    pages = build.build(tmp_path / "site")
    names = {p.name for p in pages}

    # Every guide and every API module got a page.
    assert "index.html" in names
    for src, _ in build.GUIDES:
        assert build._guide_href(src) in names
    for mod in build.API_MODULES:
        assert build._api_href(mod) in names

    # Autodoc pages carry the real public symbols, not empty shells.
    alg = (tmp_path / "site" / "api-rl8_tpu-algorithms.html").read_text()
    for symbol in ("Algorithm", "train_steps", "collect", "validate"):
        assert symbol in alg
    top = (tmp_path / "site" / "api-rl8_tpu.html").read_text()
    for symbol in ("Trainer", "TrainConfig", "Env"):
        assert symbol in top
    nnmod = (tmp_path / "site" / "api-rl8_tpu-nn-modules.html").read_text()
    assert "MLP" in nnmod and "SelfAttention" in nnmod

    # Guides rendered markdown (headers became tags) and inter-doc
    # links were rewritten to .html.
    index = (tmp_path / "site" / "index.html").read_text()
    assert "<h1" in index and "<nav>" in index
    assert ".md)" not in index.split("<main>")[1]


def test_docs_site_nav_links_resolve(tmp_path) -> None:
    """Every sidebar link on every page points at a written page."""
    import re

    build = _load_build()
    out = tmp_path / "site"
    pages = build.build(out)
    written = {p.name for p in pages}
    for page in pages:
        nav = page.read_text().split("</nav>")[0]
        for href in re.findall(r"href='([^']+)'", nav):
            assert href in written, f"{page.name} links to missing {href}"
